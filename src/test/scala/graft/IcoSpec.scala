package graft

import graft.operators.ImageHash
import graft.operators.Multimodal.IcoCodec
import org.scalatest.funsuite.AnyFunSuite

/** Windows-icon decode gates (r16 — the container face of the stills
  * family):
  *
  *  - LOSSLESS ROUND-TRIP: both encoder profiles (PNG-payload entry;
  *    BMP-DIB-payload entry with doubled biHeight, reversed 8-bit
  *    palette, all-opaque AND mask) decode back BIT-EXACT.
  *  - INDEPENDENT REFERENCE ON THE WRAPPER: the JDK ships no ICO
  *    reader, but profile 0's payload IS a complete PNG stream — the
  *    directory's size/offset fields are gated by handing exactly
  *    that byte range to ImageIO and comparing pixels. The DIB branch
  *    is anchored by the q236 corpus (pair recovery against the
  *    ImageIO-gated PNG siblings).
  *  - HAND-BUILT streams for decode-only paths: a multi-entry
  *    directory (decode must pick the LARGEST image), a 24-bit DIB
  *    payload, and an AND mask with set bits (transparent pixels
  *    composite to black).
  *  - STRICTNESS + NEVER-CRASH: CUR files, nonzero reserved fields,
  *    entry ranges escaping the file, odd doubled heights, compressed
  *    DIBs all refuse; fuzz never throws.
  */
class IcoSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  private def noisePixels(n: Int, seed: Long): Array[Byte] =
    lcg(seed).take(n).map(v => (v >>> 40).toByte).toArray

  // 4-byte XOR-row padding residues (w mod 4) + 1-px and 256-px edges
  private val shapes =
    Seq((1, 1), (1, 7), (9, 1), (4, 4), (5, 4), (6, 3), (7, 5), (18, 16),
      (33, 7), (64, 64), (256, 2))

  test("encodeGray round-trips BIT-EXACT through our decoder, both profiles") {
    for {
      (w, h) <- shapes
      profile <- 0 to 1
    } {
      val px = noisePixels(w * h, 17 + w * 31 + h + profile)
      val ico = IcoCodec.encodeGray(w, h, px, profile)
      val (dw, dh, luma) = IcoCodec.decodeLuma(ico)
        .getOrElse(fail(s"p$profile ${w}x$h: decode failed"))
      assert((dw, dh) == (w, h), s"p$profile ${w}x$h: dims")
      assert(luma.map(_.toByte).sameElements(px), s"p$profile ${w}x$h: pixels moved")
    }
  }

  test("profiles: byte-disjoint streams, identical pixels (q236 corpus property)") {
    val px = noisePixels(18 * 16, 43)
    val s0 = IcoCodec.encodeGray(18, 16, px, 0)
    val s1 = IcoCodec.encodeGray(18, 16, px, 1)
    assert(!java.util.Arrays.equals(s0, s1))
    // payload discriminator at the entry's offset (22): PNG signature
    // vs a 40-byte BITMAPINFOHEADER
    assert((s0(22) & 0xff) == 0x89 && s0(23) == 'P', "profile 0 must embed PNG")
    assert((s1(22) & 0xff) == 40 && s1(23) == 0, "profile 1 must embed a DIB")
    assert(IcoCodec.decodeLuma(s0).get._3.toSeq == IcoCodec.decodeLuma(s1).get._3.toSeq)
  }

  test("ImageIO decodes the PNG payload our directory points at (wrapper gate)") {
    for ((w, h) <- Seq((7, 5), (18, 16), (33, 7))) {
      val px = noisePixels(w * h, 59 + w + h * 17)
      val ico = IcoCodec.encodeGray(w, h, px, 0)
      def le32(o: Int): Int = (ico(o) & 0xff) | ((ico(o + 1) & 0xff) << 8) |
        ((ico(o + 2) & 0xff) << 16) | ((ico(o + 3) & 0xff) << 24)
      val size = le32(6 + 8); val off = le32(6 + 12)
      val payload = java.util.Arrays.copyOfRange(ico, off, off + size)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"${w}x$h: ImageIO rejected the embedded PNG")
      // raster samples — getRGB would route gray through an sRGB transform
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == (px(y * w + x) & 0xff),
          s"${w}x$h ($x,$y)")
      assert(off + size == ico.length, "directory must account for every byte")
    }
  }

  test("hand-built: multi-entry directory picks the largest; 24-bit DIB; AND mask") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16((v >>> 16) & 0xffff)
    // payload A: 1×1 24-bit DIB (value 9), the SMALL entry
    def dib24(w: Int, h: Int, vals: Array[Int], mask: Array[Int]): Array[Byte] = {
      val xorStride = (w * 3 + 3) & ~3
      val andStride = ((w + 31) / 32) * 4
      val rows = new java.io.ByteArrayOutputStream()
      var row = h - 1
      while (row >= 0) { // bottom-up
        var x = 0
        while (x < w) {
          val v = vals(row * w + x)
          rows.write(v); rows.write(v); rows.write(v) // BGR
          x += 1
        }
        var pad = xorStride - w * 3
        while (pad > 0) { rows.write(0); pad -= 1 }
        row -= 1
      }
      var r = h - 1
      while (r >= 0) { // AND mask, bottom-up, MSB-first bits
        val bits = new Array[Byte](andStride)
        var x = 0
        while (x < w) {
          if (mask(r * w + x) != 0)
            bits(x >> 3) = (bits(x >> 3) | (0x80 >>> (x & 7))).toByte
          x += 1
        }
        rows.write(bits, 0, andStride)
        r -= 1
      }
      le32(40) ++ le32(w) ++ le32(2 * h) ++ le16(1) ++ le16(24) ++ le32(0) ++
        le32(rows.size()) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++
        rows.toByteArray
    }
    val small = dib24(1, 1, Array(9), Array(0))
    // payload B: 3×2 24-bit DIB, pixel (0,0) masked transparent -> 0
    val big = dib24(3, 2, Array(10, 20, 30, 40, 50, 60), Array(1, 0, 0, 0, 0, 0))
    val dir = le16(0) ++ le16(1) ++ le16(2) ++
      Array[Byte](1, 1, 0, 0) ++ le16(1) ++ le16(24) ++
      le32(small.length) ++ le32(6 + 32) ++
      Array[Byte](3, 2, 0, 0) ++ le16(1) ++ le16(24) ++
      le32(big.length) ++ le32(6 + 32 + small.length)
    val ico = dir ++ small ++ big
    val (w, h, luma) = IcoCodec.decodeLuma(ico).getOrElse(fail("hand ICO rejected"))
    assert((w, h) == (3, 2), "must pick the larger entry")
    assert(luma.toSeq == Seq(0, 20, 30, 40, 50, 60), s"got ${luma.toSeq}")
  }

  test("strictness: CUR, reserved fields, range escapes, odd heights refuse") {
    val good = IcoCodec.encodeGray(16, 16, noisePixels(256, 137), 1)
    assert(IcoCodec.decodeLuma(good).isDefined)
    def craft(mut: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mut(b); b
    }
    assert(IcoCodec.decodePixels(craft(b => b(2) = 2)).isEmpty, "CUR type")
    assert(IcoCodec.decodePixels(craft(b => b(0) = 1)).isEmpty, "reserved")
    assert(IcoCodec.decodePixels(craft(b => b(4) = 0)).isEmpty, "zero entries")
    assert(IcoCodec.decodePixels(craft { b => // entry size past file end
      b(6 + 8) = -1; b(6 + 9) = -1; b(6 + 10) = 0; b(6 + 11) = 0
    }).isEmpty, "size escape")
    assert(IcoCodec.decodePixels(craft { b => // offset into the directory
      b(6 + 12) = 3; b(6 + 13) = 0; b(6 + 14) = 0; b(6 + 15) = 0
    }).isEmpty, "offset into header")
    // odd doubled height (DIB at 22: biHeight at +8) and compression
    assert(IcoCodec.decodePixels(craft(b => b(22 + 8) = 31)).isEmpty, "odd height")
    assert(IcoCodec.decodePixels(craft(b => b(22 + 16) = 1)).isEmpty, "BI_RLE8 in icon")
  }

  test("never-crash fuzz: truncations and bit flips") {
    for (profile <- 0 to 1) {
      val good = IcoCodec.encodeGray(18, 16, noisePixels(288, 31 + profile), profile)
      for (n <- 0 until good.length by 5)
        IcoCodec.decodePixels(good.take(n)) // must not throw
      for (i <- 0 until good.length by 3) {
        val bad = good.clone(); bad(i) = (bad(i) ^ 0x81).toByte
        IcoCodec.decodePixels(bad) // must not throw
      }
    }
  }

  test("q236 corpus: ICO trans-code is hash-invariant, pairs exactly planted") {
    val docs = Tables.documents(spark, sf001)
    val pnmHashes = ImageHash.imageHashes(ImageHash.syntheticPnm(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val mixed = ImageHash.syntheticIcoImages(docs)
    val icoHashes = ImageHash.imageHashes(mixed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(icoHashes === pnmHashes, "ICO trans-code moved a hash")
    // both payload branches appear among the originals (payload head at
    // 22: PNG signature vs 40-byte DIB header); siblings are bare PNG
    val byId = mixed.collect().map(a => a.asset_id -> a.bytes).toMap
    val origHeads = byId.filter(_._1 % 2 == 0).values.map(b => b(22) & 0xff).toSet
    assert(origHeads == Set(0x89, 40), s"original payload heads: $origHeads")
    assert(byId.filter(_._1 % 2 == 1).values.forall(b =>
      (b(1) & 0xff) == 'P'), "siblings must be bare PNG")
    val pairs = ImageHash.nearDupImagePairs(ImageHash.imageHashes(mixed))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hm = icoHashes.toMap
    val exp = hm.keys.filter(id => id % 2 == 0 && hm.contains(id + 1))
      .map(id => (id, id + 1,
        java.lang.Long.bitCount(hm(id) ^ hm(id + 1)).toLong))
      .filter(_._3 <= 3).toSeq.sorted
    assert(pairs.toSeq.sorted === exp)
    assert(exp.nonEmpty, "sf0.001 must plant at least one recoverable pair")
  }
}
