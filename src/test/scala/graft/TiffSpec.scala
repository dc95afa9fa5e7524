package graft

import graft.operators.ImageHash
import graft.operators.Multimodal.TiffCodec
import org.scalatest.funsuite.AnyFunSuite

/** Baseline-TIFF decode gates (r16 — the GifSpec/PngSpec/BmpSpec
  * discipline on the last common lib-free-feasible still container):
  *
  *  - LOSSLESS ROUND-TRIP: both encoder profiles (little-endian
  *    uncompressed single-strip; BIG-endian PackBits 4-row strips
  *    with WhiteIsZero photometric inversion) decode back BIT-EXACT.
  *  - INDEPENDENT REFERENCE, BOTH DIRECTIONS: the JDK TIFF plugin
  *    decodes our streams (both byte orders, PackBits, WhiteIsZero),
  *    and our decoder reads JDK-WRITTEN TIFFs (gray, RGB, and the
  *    JDK's own strip/field layout choices).
  *  - RGB + palette photometrics via hand-checked JDK writes and a
  *    hand-built ColorMap stream (our encoder never emits them — the
  *    decoder is not gated only by what our encoder produces).
  *  - NEVER-CRASH fuzz over truncations / bit flips / crafted IFDs.
  *  - The planted q233 pair corpus is hash-invariant vs the all-PNM
  *    corpus and recovers exactly the planted siblings.
  */
class TiffSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  private def noisePixels(n: Int, seed: Long): Array[Byte] =
    lcg(seed).take(n).map(v => (v >>> 40).toByte).toArray

  // heights exercise the 4-row strip boundary residues; runs of equal
  // bytes appear in noise rarely, so also build a RUN-heavy image that
  // makes PackBits emit both encoded runs and literals
  private val shapes =
    Seq((1, 1), (1, 7), (9, 1), (3, 3), (5, 4), (7, 5), (8, 8), (16, 16),
      (33, 7), (64, 64), (16, 13))

  test("encodeGray round-trips BIT-EXACT through our decoder, both profiles") {
    for {
      (w, h) <- shapes
      profile <- 0 to 1
    } {
      val px = noisePixels(w * h, 19 + w * 31 + h + profile)
      val tif = TiffCodec.encodeGray(w, h, px, profile)
      val (dw, dh, luma) = TiffCodec.decodeLuma(tif)
        .getOrElse(fail(s"p$profile ${w}x$h: decode failed"))
      assert((dw, dh) == (w, h), s"p$profile ${w}x$h: dims")
      assert(luma.map(_.toByte).sameElements(px), s"p$profile ${w}x$h: pixels moved")
    }
    // run-heavy pixels: PackBits runs + literals + the 128 caps
    val (w, h) = (40, 9)
    val px = Array.tabulate(w * h) { i =>
      if ((i / 17) % 2 == 0) 200.toByte else (i % 251).toByte
    }
    for (profile <- 0 to 1) {
      val tif = TiffCodec.encodeGray(w, h, px, profile)
      val luma = TiffCodec.decodeLuma(tif).getOrElse(fail(s"p$profile run-heavy"))._3
      assert(luma.map(_.toByte).sameElements(px), s"p$profile run-heavy pixels")
    }
  }

  test("profiles: byte-disjoint streams, identical pixels (q233 corpus property)") {
    val px = noisePixels(18 * 16, 47)
    val s0 = TiffCodec.encodeGray(18, 16, px, 0)
    val s1 = TiffCodec.encodeGray(18, 16, px, 1)
    assert(!java.util.Arrays.equals(s0, s1))
    assert(s0(0) == 'I' && s1(0) == 'M', "profiles must differ in byte order")
    assert(TiffCodec.decodeLuma(s0).get._3.toSeq == TiffCodec.decodeLuma(s1).get._3.toSeq)
  }

  test("JDK TIFF plugin (independent reference) decodes our streams exactly") {
    for {
      (w, h) <- Seq((7, 5), (16, 16), (33, 7), (64, 64))
      profile <- 0 to 1
    } {
      val px = noisePixels(w * h, 61 + w + h * 17 + profile)
      val tif = TiffCodec.encodeGray(w, h, px, profile)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(tif))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"p$profile ${w}x$h: JDK rejected our stream")
      // raster samples: the JDK reader resolves WhiteIsZero during
      // decode, so samples equal the original v for both profiles
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == (px(y * w + x) & 0xff),
          s"p$profile ${w}x$h ($x,$y)")
    }
  }

  test("our decoder reads JDK-WRITTEN TIFFs (gray and RGB)") {
    for {
      (w, h) <- Seq((7, 5), (16, 16), (33, 7), (64, 64))
      imgType <- Seq(java.awt.image.BufferedImage.TYPE_BYTE_GRAY,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    } {
      val px = noisePixels(w * h, 73 + w * 13 + h + imgType)
      val bi = new java.awt.image.BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(y * w + x) & 0xff
        var b = 0
        while (b < bi.getRaster.getNumBands) {
          bi.getRaster.setSample(x, y, b, v); b += 1
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "tiff", bos), s"JDK refused type $imgType")
      val (dw, dh, luma) = TiffCodec.decodeLuma(bos.toByteArray)
        .getOrElse(fail(s"${w}x$h type $imgType: our decoder rejected a JDK TIFF"))
      assert((dw, dh) == (w, h))
      for (i <- 0 until w * h)
        assert(luma(i) == (px(i) & 0xff), s"${w}x$h type $imgType idx $i")
    }
  }

  test("palette photometric via a hand-built ColorMap stream") {
    // 3×2 little-endian palette image: indices 0..5, ColorMap entry j
    // = j*1000 (mod 2^16) in all three planes — the decoder must take
    // the 16-bit entry's HIGH byte
    val out2 = new java.io.ByteArrayOutputStream()
    def v16(v: Int): Unit = { out2.write(v & 0xff); out2.write((v >> 8) & 0xff) }
    def v32(v: Int): Unit = { v16(v & 0xffff); v16((v >>> 16) & 0xffff) }
    out2.write('I'); out2.write('I'); v16(42); v32(8)
    val n2 = 10
    val ifdLen2 = 2 + n2 * 12 + 4
    val dataAt2 = 8 + ifdLen2
    val mapAt2 = dataAt2 + 6
    v16(n2)
    def e2(tag: Int, typ: Int, cnt: Int, v: Int): Unit = {
      v16(tag); v16(typ); v32(cnt)
      if (typ == 3 && cnt == 1) { v16(v); v16(0) } else v32(v)
    }
    e2(256, 4, 1, 3); e2(257, 4, 1, 2); e2(258, 3, 1, 8)
    e2(259, 3, 1, 1); e2(262, 3, 1, 3); e2(273, 4, 1, dataAt2)
    e2(277, 3, 1, 1); e2(278, 4, 1, 2); e2(279, 4, 1, 6)
    e2(320, 3, 768, mapAt2)
    v32(0)
    Seq(0, 1, 2, 3, 4, 5).foreach(out2.write) // indices
    for (_ <- 0 until 3; j <- 0 until 256) v16(j * 1000 & 0xffff)
    val (w, h, ch, px) = TiffCodec.decodePixels(out2.toByteArray)
      .getOrElse(fail("palette TIFF rejected"))
    assert((w, h, ch) == (3, 2, 3))
    for (j <- 0 until 6; c <- 0 until 3)
      assert((px(j * 3 + c) & 0xff) == ((j * 1000 & 0xffff) >> 8), s"px $j ch $c")
  }

  test("never-crash fuzz: truncations, bit flips, crafted IFDs") {
    val good = TiffCodec.encodeGray(16, 16, noisePixels(256, 139), 1)
    assert(TiffCodec.decodeLuma(good).isDefined)
    // the final 4 bytes are the next-IFD pointer — not load-bearing for
    // a single-IFD file, so prefixes that cut only into them still decode
    for (n <- 0 until good.length by 7 if n < good.length - 4)
      assert(TiffCodec.decodePixels(good.take(n)).isEmpty, s"prefix $n")
    for (i <- 2 until good.length by 11) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x40).toByte
      TiffCodec.decodePixels(bad) // must not throw
    }
    // every single-byte corruption of the little-endian profile too
    val g0 = TiffCodec.encodeGray(9, 7, noisePixels(63, 149), 0)
    for (i <- 0 until g0.length) {
      val bad = g0.clone(); bad(i) = (bad(i) ^ 0xff).toByte
      TiffCodec.decodePixels(bad) // must not throw
    }
  }

  test("q233 corpus: TIFF trans-code is hash-invariant, pairs exactly planted") {
    val docs = Tables.documents(spark, sf001)
    val pnmHashes = ImageHash.imageHashes(ImageHash.syntheticPnm(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val mixed = ImageHash.syntheticTiffImages(docs)
    val tifHashes = ImageHash.imageHashes(mixed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(tifHashes === pnmHashes, "TIFF trans-code moved a hash")
    // both profiles appear among the originals (byte 0: II vs MM);
    // siblings stay PNG
    val byId = mixed.collect().map(a => a.asset_id -> a.bytes).toMap
    val origOrders = byId.filter(_._1 % 2 == 0).values.map(b => b(0).toChar).toSet
    assert(origOrders == Set('I', 'M'), s"original byte orders: $origOrders")
    assert(byId.filter(_._1 % 2 == 1).values.forall(b => (b(1) & 0xff) == 'P'))
    val pairs = ImageHash.nearDupImagePairs(ImageHash.imageHashes(mixed))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hm = tifHashes.toMap
    val exp = hm.keys.filter(id => id % 2 == 0 && hm.contains(id + 1))
      .map(id => (id, id + 1,
        java.lang.Long.bitCount(hm(id) ^ hm(id + 1)).toLong))
      .filter(_._3 <= 3).toSeq.sorted
    assert(pairs.toSeq.sorted === exp)
    assert(exp.nonEmpty, "sf0.001 must plant at least one recoverable pair")
  }
}
