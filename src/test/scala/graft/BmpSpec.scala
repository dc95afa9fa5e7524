package graft

import graft.operators.ImageHash
import graft.operators.Multimodal.BmpCodec
import org.scalatest.funsuite.AnyFunSuite

/** Windows-bitmap decode gates (r16 — the GifSpec/PngSpec discipline on
  * the remaining ubiquitous uncompressed still format):
  *
  *  - LOSSLESS ROUND-TRIP: both encoder profiles (24-bit BI_RGB
  *    bottom-up, 8-bit BI_RLE8 reversed-palette) decode back BIT-EXACT
  *    through our decoder across shapes that exercise the 4-byte row
  *    padding (w mod 4 ∈ {0,1,2,3} for both 3-byte and 1-byte pixels).
  *  - INDEPENDENT REFERENCE, BOTH DIRECTIONS: ImageIO decodes our
  *    streams (including the RLE8 profile — a mutual RLE bug cannot
  *    hide behind our own round-trip), and our decoder reads
  *    ImageIO-WRITTEN BMPs (the JDK writer emits genuine third-party
  *    24-bit and 8-bit-palette layouts).
  *  - TOP-DOWN rows (negative biHeight) and 32-bit BGRx via hand-built
  *    streams; RLE absolute mode + delta escapes via a hand-built
  *    stream (our encoder never emits them — the decoder must not be
  *    gated only by what our encoder produces).
  *  - NEVER-CRASH fuzz over truncations / bit flips / crafted headers.
  *  - The planted q232 pair corpus is hash-invariant vs the all-PNM
  *    corpus and recovers exactly the planted siblings.
  */
class BmpSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  private def noisePixels(n: Int, seed: Long): Array[Byte] =
    lcg(seed).take(n).map(v => (v >>> 40).toByte).toArray

  // widths cover every stride-padding residue for 24-bit (w*3 mod 4)
  // and 8-bit (w mod 4) rows; 1×1 and single-row/column edges included
  private val shapes =
    Seq((1, 1), (1, 7), (9, 1), (2, 2), (3, 3), (4, 4), (5, 4), (6, 3),
      (7, 5), (8, 8), (16, 16), (33, 7), (64, 64))

  test("encodeGray round-trips BIT-EXACT through our decoder, both profiles") {
    for {
      (w, h) <- shapes
      profile <- 0 to 1
    } {
      val px = noisePixels(w * h, 17 + w * 31 + h + profile)
      val bmp = BmpCodec.encodeGray(w, h, px, profile)
      val (dw, dh, luma) = BmpCodec.decodeLuma(bmp)
        .getOrElse(fail(s"p$profile ${w}x$h: decode failed"))
      assert((dw, dh) == (w, h), s"p$profile ${w}x$h: dims")
      assert(luma.map(_.toByte).sameElements(px), s"p$profile ${w}x$h: pixels moved")
    }
  }

  test("profiles: byte-disjoint streams, identical pixels (q232 corpus property)") {
    val px = noisePixels(18 * 16, 43)
    val s0 = BmpCodec.encodeGray(18, 16, px, 0)
    val s1 = BmpCodec.encodeGray(18, 16, px, 1)
    assert(!java.util.Arrays.equals(s0, s1))
    // the RLE profile's index plane is 255−v: no pixel byte of s1's data
    // section equals the luma byte it encodes (run VALUES alternate with
    // counts, so compare decoded planes instead of raw bytes)
    assert(BmpCodec.decodeLuma(s0).get._3.toSeq == BmpCodec.decodeLuma(s1).get._3.toSeq)
  }

  test("ImageIO (independent reference) decodes our streams exactly — incl. RLE8") {
    for {
      (w, h) <- Seq((7, 5), (16, 16), (33, 7), (64, 64))
      profile <- 0 to 1
    } {
      val px = noisePixels(w * h, 59 + w + h * 17 + profile)
      val bmp = BmpCodec.encodeGray(w, h, px, profile)
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
      assert(img != null && img.getWidth == w && img.getHeight == h,
        s"p$profile ${w}x$h: ImageIO rejected our stream")
      for (y <- 0 until h; x <- 0 until w) {
        val expected = px(y * w + x) & 0xff
        val rgb = img.getRGB(x, y)
        assert((rgb & 0xff) == expected && ((rgb >> 8) & 0xff) == expected &&
          ((rgb >> 16) & 0xff) == expected,
          s"p$profile ${w}x$h ($x,$y): ${rgb.toHexString} vs $expected")
      }
    }
  }

  test("our decoder reads ImageIO-WRITTEN BMPs (24-bit and 8-bit palette)") {
    for {
      (w, h) <- Seq((7, 5), (16, 16), (33, 7), (64, 64))
      imgType <- Seq(java.awt.image.BufferedImage.TYPE_3BYTE_BGR,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    } {
      val px = noisePixels(w * h, 71 + w * 13 + h + imgType)
      val bi = new java.awt.image.BufferedImage(w, h, imgType)
      // raster samples directly — setRGB on TYPE_BYTE_GRAY would pass
      // the value through an sRGB->linear colorspace conversion
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(y * w + x) & 0xff
        var b = 0
        while (b < bi.getRaster.getNumBands) {
          bi.getRaster.setSample(x, y, b, v); b += 1
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "bmp", bos), s"JDK refused type $imgType")
      val (dw, dh, luma) = BmpCodec.decodeLuma(bos.toByteArray)
        .getOrElse(fail(s"${w}x$h type $imgType: our decoder rejected a JDK BMP"))
      assert((dw, dh) == (w, h))
      for (i <- 0 until w * h)
        assert(luma(i) == (px(i) & 0xff), s"${w}x$h type $imgType idx $i")
    }
  }

  test("top-down rows (negative biHeight) and 32-bit BGRx via hand-built streams") {
    // 2×2, values laid out so row order is observable
    val vals = Array(10, 20, 30, 40) // raster order: (0,0)(1,0)(0,1)(1,1)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16((v >>> 16) & 0xffff)
    def header(bpp: Int, height: Int, dataLen: Int): Array[Byte] =
      Array('B'.toByte, 'M'.toByte) ++ le32(54 + dataLen) ++ le32(0) ++ le32(54) ++
        le32(40) ++ le32(2) ++ le32(height) ++ le16(1) ++ le16(bpp) ++ le32(0) ++
        le32(dataLen) ++ le32(2835) ++ le32(2835) ++ le32(0) ++ le32(0)
    // top-down 24-bit: height = -2, rows stored raster order, stride 8
    val td = header(24, -2, 16) ++ Array(
      10, 10, 10, 20, 20, 20, 0, 0, // row 0 + pad
      30, 30, 30, 40, 40, 40, 0, 0).map(_.toByte)
    val (tw, th, tl) = BmpCodec.decodeLuma(td).getOrElse(fail("top-down rejected"))
    assert((tw, th) == (2, 2) && tl.toSeq == vals.toSeq, s"top-down rows: ${tl.toSeq}")
    // bottom-up 32-bit BGRx: rows stored bottom-first, x byte ignored
    val b32 = header(32, 2, 16) ++ Array(
      30, 30, 30, 99, 40, 40, 40, 99, // bottom row (x = junk)
      10, 10, 10, 99, 20, 20, 20, 99).map(_.toByte)
    val (bw, bh, bl) = BmpCodec.decodeLuma(b32).getOrElse(fail("32-bit rejected"))
    assert((bw, bh) == (2, 2) && bl.toSeq == vals.toSeq, s"32-bit rows: ${bl.toSeq}")
  }

  test("RLE8 absolute mode, delta skip, and early EOB via a hand-built stream") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def le32(v: Int) = le16(v & 0xffff) ++ le16((v >>> 16) & 0xffff)
    // identity gray palette so index == luma
    val palette = (0 until 256).flatMap(j => Seq(j, j, j, 0)).map(_.toByte).toArray
    // 4×3 bottom-up: bottom row = absolute run [1,2,3] + encoded run 1×4;
    // middle row skipped entirely by a delta (0,2) from the bottom row's
    // END pushing the cursor up; actually emit delta (0,1) after EOL to
    // skip the middle row (stays index 0), top row = encoded 4×7, EOB
    val rle = Array[Byte](
      0, 3, 1, 2, 3, 0, // absolute mode 3 px (word-padded to 4)
      1, 4,             // encoded run: 1 px of index 4
      0, 0,             // EOL -> cursor at middle row
      0, 2, 0, 1,       // delta: dx 0, dy 1 -> skip middle row (zeros)
      4, 7,             // top row: 4 px of index 7
      0, 1)             // EOB
    val dataOff = 54 + 1024
    val bmp = Array('B'.toByte, 'M'.toByte) ++ le32(dataOff + rle.length) ++
      le32(0) ++ le32(dataOff) ++ le32(40) ++ le32(4) ++ le32(3) ++ le16(1) ++
      le16(8) ++ le32(1) ++ le32(rle.length) ++ le32(2835) ++ le32(2835) ++
      le32(0) ++ le32(0) ++ palette ++ rle
    val (w, h, luma) = BmpCodec.decodeLuma(bmp).getOrElse(fail("hand RLE rejected"))
    assert((w, h) == (4, 3))
    assert(luma.toSeq == Seq(
      7, 7, 7, 7, // top raster row
      0, 0, 0, 0, // delta-skipped middle row -> index 0
      1, 2, 3, 4), s"got ${luma.toSeq}") // bottom raster row
    // ImageIO agrees on the same hand-built stream — compare raster
    // samples (the palette is the identity, so index == luma); getRGB
    // would pass the identity-gray palette through an sRGB conversion
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img != null, "ImageIO rejected the hand-built RLE stream")
    for (y <- 0 until 3; x <- 0 until 4)
      assert(img.getRaster.getSample(x, y, 0) == luma(y * 4 + x), s"($x,$y)")
  }

  test("never-crash fuzz: truncations, bit flips, crafted headers") {
    val good = BmpCodec.encodeGray(16, 16, noisePixels(256, 137), 1)
    assert(BmpCodec.decodeLuma(good).isDefined)
    for (n <- 0 until good.length by 7)
      assert(BmpCodec.decodePixels(good.take(n)).isEmpty, s"prefix $n")
    for (i <- 2 until good.length by 11) {
      val bad = good.clone(); bad(i) = (bad(i) ^ 0x40).toByte
      BmpCodec.decodePixels(bad) // must not throw
    }
    def craft(mut: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mut(b); b
    }
    def putLe32(b: Array[Byte], off: Int, v: Long): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    // huge dims refuse without allocating; RLE + top-down is spec-illegal;
    // planes != 1, unsupported bpp, and BITFIELDS all reject
    assert(BmpCodec.decodePixels(craft(b => { putLe32(b, 18, 1 << 20); putLe32(b, 22, 1 << 20) })).isEmpty)
    assert(BmpCodec.decodePixels(craft(b => putLe32(b, 22, -16))).isEmpty, "top-down RLE")
    assert(BmpCodec.decodePixels(craft(b => { b(26) = 2 })).isEmpty, "planes")
    assert(BmpCodec.decodePixels(craft(b => { b(28) = 16 })).isEmpty, "bpp 16")
    assert(BmpCodec.decodePixels(craft(b => putLe32(b, 30, 3))).isEmpty, "BITFIELDS")
    // RLE cursor escapes: a run past the row end and a truncated delta
    assert(BmpCodec.decodePixels(craft { b =>
      b(54 + 1024) = -1 /* 255 > w=16 run */
    }).isEmpty, "RLE run overrun")
    // an RLE header claiming 8192x8192 (exactly the pixel cap) over a
    // tiny payload must refuse via the 128x-payload bound BEFORE any
    // canvas allocation — an RLE pair encodes at most 255 px per 2 bytes
    assert(BmpCodec.decodePixels(craft(b =>
      { putLe32(b, 18, 8192); putLe32(b, 22, 8192) })).isEmpty, "RLE dims bound")
  }

  test("q232 corpus: BMP trans-code is hash-invariant, pairs exactly planted") {
    val docs = Tables.documents(spark, sf001)
    val pnmHashes = ImageHash.imageHashes(ImageHash.syntheticPnm(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val mixed = ImageHash.syntheticBmpImages(docs)
    val bmpHashes = ImageHash.imageHashes(mixed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(bmpHashes === pnmHashes, "BMP trans-code moved a hash")
    // both BMP profiles appear among the originals (compression field at
    // offset 30: 0 = BI_RGB 24-bit, 1 = BI_RLE8); siblings stay PNG
    val byId = mixed.collect().map(a => a.asset_id -> a.bytes).toMap
    val origComp = byId.filter(_._1 % 2 == 0).values
      .map(b => (b(28) & 0xff, b(30) & 0xff)).toSet
    assert(origComp == Set((24, 0), (8, 1)), s"original profiles: $origComp")
    assert(byId.filter(_._1 % 2 == 1).values.forall(b =>
      (b(1) & 0xff) == 'P'), "siblings must be PNG")
    val pairs = ImageHash.nearDupImagePairs(ImageHash.imageHashes(mixed))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hm = bmpHashes.toMap
    val exp = hm.keys.filter(id => id % 2 == 0 && hm.contains(id + 1))
      .map(id => (id, id + 1,
        java.lang.Long.bitCount(hm(id) ^ hm(id + 1)).toLong))
      .filter(_._3 <= 3).toSeq.sorted
    assert(pairs.toSeq.sorted === exp)
    assert(exp.nonEmpty, "sf0.001 must plant at least one recoverable pair")
  }
}
