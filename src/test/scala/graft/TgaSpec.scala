package graft

import graft.operators.ImageHash
import graft.operators.Multimodal.TgaCodec
import org.scalatest.funsuite.AnyFunSuite

/** Truevision-TGA decode gates (r16 — the GifSpec/BmpSpec discipline on
  * the stills family's MAGIC-LESS member):
  *
  *  - LOSSLESS ROUND-TRIP: both encoder profiles (type 3 uncompressed
  *    gray bottom-up; type 9 RLE color-mapped reversed-palette
  *    TOP-DOWN with a non-empty image-ID field) decode back BIT-EXACT
  *    through our decoder. TGA rows have no padding, so shapes stress
  *    run boundaries instead of strides.
  *  - HAND-BUILT streams for decode-only paths the encoder never
  *    emits: a color map with a non-zero first-entry offset, 32-bit
  *    truecolor, and an RLE run that CROSSES a scan-line boundary
  *    (legal in the wild; our encoder never does it).
  *  - STRICTNESS: TGA has no magic number, so the header walk is the
  *    format detection — every reserved/unsupported encoding must
  *    refuse (interleave bits, right-to-left bit, color-map type 2,
  *    image types outside {1,2,3,9,10,11}, depth/type mismatches,
  *    hostile palettes on truecolor headers, RLE pixel counts the
  *    payload cannot carry).
  *  - NEVER-CRASH fuzz over truncations / bit flips.
  *  - The planted q235 pair corpus is hash-invariant vs the all-PNM
  *    corpus and recovers exactly the planted siblings (the
  *    independent anchor: the sibling side decodes through the
  *    ImageIO-gated PNG path — the JDK ships no TGA reader).
  */
class TgaSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  private def noisePixels(n: Int, seed: Long): Array[Byte] =
    lcg(seed).take(n).map(v => (v >>> 40).toByte).toArray

  /** Runs of repeated values interleaved with noise — exercises the RLE
    * encoder's run/raw packet switching and the 128-px packet cap. */
  private def runnyPixels(n: Int, seed: Long): Array[Byte] = {
    val out = new Array[Byte](n)
    var i = 0
    val it = lcg(seed)
    while (i < n) {
      val v = it.next()
      val len = math.min(n - i, 1 + ((v >>> 8) & 0xff).toInt) // up to 256 > cap
      java.util.Arrays.fill(out, i, i + len, (v >>> 40).toByte)
      i += len
    }
    out
  }

  private val shapes =
    Seq((1, 1), (1, 7), (9, 1), (2, 2), (5, 4), (7, 5), (18, 16), (33, 7),
      (64, 64), (129, 3)) // 129 > the 128-px packet cap in one row

  test("encodeGray round-trips BIT-EXACT through our decoder, both profiles") {
    for {
      (w, h) <- shapes
      profile <- 0 to 1
      gen <- Seq(noisePixels _, runnyPixels _)
    } {
      val px = gen(w * h, 17 + w * 31 + h + profile)
      val tga = TgaCodec.encodeGray(w, h, px, profile)
      val (dw, dh, luma) = TgaCodec.decodeLuma(tga)
        .getOrElse(fail(s"p$profile ${w}x$h: decode failed"))
      assert((dw, dh) == (w, h), s"p$profile ${w}x$h: dims")
      assert(luma.map(_.toByte).sameElements(px), s"p$profile ${w}x$h: pixels moved")
    }
  }

  test("profiles: byte-disjoint streams, identical pixels (q235 corpus property)") {
    val px = runnyPixels(18 * 16, 43)
    val s0 = TgaCodec.encodeGray(18, 16, px, 0)
    val s1 = TgaCodec.encodeGray(18, 16, px, 1)
    assert(!java.util.Arrays.equals(s0, s1))
    assert((s0(2) & 0xff) == 3 && (s1(2) & 0xff) == 9, "image types")
    assert(TgaCodec.decodeLuma(s0).get._3.toSeq == TgaCodec.decodeLuma(s1).get._3.toSeq)
  }

  test("hand-built: color map with non-zero first-entry offset (type 1)") {
    // 3×2 bottom-up, indices 100..105 resolved through a map whose
    // first stored entry is index 100 (BGR triples, value = index - 60)
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val header = Array[Byte](0, 1, 1) ++ le16(100) ++ le16(6) ++ Array[Byte](24) ++
      le16(0) ++ le16(0) ++ le16(3) ++ le16(2) ++ Array[Byte](8, 0)
    val cmap = (0 until 6).flatMap { j =>
      val v = (100 + j - 60).toByte; Seq(v, v, v)
    }.toArray
    // bottom-up: file row 0 is the raster BOTTOM row
    val idx = Array[Byte](103.toByte, 104.toByte, 105.toByte, // bottom
      100.toByte, 101.toByte, 102.toByte)                     // top
    val (w, h, luma) = TgaCodec.decodeLuma(header ++ cmap ++ idx)
      .getOrElse(fail("offset color map rejected"))
    assert((w, h) == (3, 2))
    assert(luma.toSeq == Seq(40, 41, 42, 43, 44, 45), s"got ${luma.toSeq}")
  }

  test("hand-built: 32-bit truecolor top-down; RLE run crossing a row boundary") {
    def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    // 2×2 type 2, 32-bit BGRA top-down (descriptor 0x20): alpha ignored
    val t32 = Array[Byte](0, 0, 2) ++ le16(0) ++ le16(0) ++ Array[Byte](0) ++
      le16(0) ++ le16(0) ++ le16(2) ++ le16(2) ++ Array[Byte](32, 0x20) ++
      Array(10, 10, 10, 99, 20, 20, 20, 99, 30, 30, 30, 99, 40, 40, 40, 99)
        .map(_.toByte)
    val (w32, h32, l32) = TgaCodec.decodeLuma(t32).getOrElse(fail("32-bit rejected"))
    assert((w32, h32) == (2, 2) && l32.toSeq == Seq(10, 20, 30, 40))
    // 3×2 type 11 (RLE gray) top-down: one 5-px run crossing the row
    // boundary + a 1-px raw packet
    val rle = Array[Byte](0, 0, 11) ++ le16(0) ++ le16(0) ++ Array[Byte](0) ++
      le16(0) ++ le16(0) ++ le16(3) ++ le16(2) ++ Array[Byte](8, 0x20) ++
      Array((0x80 | 4).toByte, 77.toByte, 0.toByte, 9.toByte)
    val (wr, hr, lr) = TgaCodec.decodeLuma(rle).getOrElse(fail("crossing run rejected"))
    assert((wr, hr) == (3, 2) && lr.toSeq == Seq(77, 77, 77, 77, 77, 9),
      s"got ${lr.toSeq}")
  }

  test("strictness: reserved encodings and hostile headers all refuse") {
    val good = TgaCodec.encodeGray(16, 16, noisePixels(256, 137), 1)
    assert(TgaCodec.decodeLuma(good).isDefined)
    def craft(mut: Array[Byte] => Unit): Array[Byte] = {
      val b = good.clone(); mut(b); b
    }
    assert(TgaCodec.decodePixels(craft(b => b(17) = 0x30)).isEmpty, "right-to-left")
    assert(TgaCodec.decodePixels(craft(b => b(17) = 0x60.toByte)).isEmpty, "interleave")
    assert(TgaCodec.decodePixels(craft(b => b(1) = 2)).isEmpty, "cmType 2")
    for (t <- Seq(0, 4, 8, 12, 33))
      assert(TgaCodec.decodePixels(craft(b => b(2) = t.toByte)).isEmpty, s"type $t")
    assert(TgaCodec.decodePixels(craft(b => b(16) = 24)).isEmpty, "cmapped depth 24")
    // truecolor header carrying a hostile palette: first 200 + len 100
    // would index past a 256-entry table — must refuse, not overflow
    assert(TgaCodec.decodePixels(craft { b =>
      b(2) = 2; b(16) = 24; b(3) = 200.toByte; b(4) = 0; b(5) = 100; b(6) = 0
    }).isEmpty, "hostile palette bounds")
    // RLE pixel count the payload cannot carry refuses pre-allocation
    // (8192×8192 = the pixel cap exactly, so the 128×-payload bound is
    // the check that fires, BEFORE the 192 MB canvas)
    assert(TgaCodec.decodePixels(craft { b =>
      b(12) = 0; b(13) = 0x20; b(14) = 0; b(15) = 0x20
    }).isEmpty, "RLE payload bound")
    // uncompressed truncation: type 3 with one byte short
    val plain = TgaCodec.encodeGray(16, 16, noisePixels(256, 7), 0)
    assert(TgaCodec.decodePixels(plain.dropRight(1)).isEmpty, "short payload")
  }

  test("never-crash fuzz: truncations and bit flips") {
    for (profile <- 0 to 1) {
      val good = TgaCodec.encodeGray(18, 16, runnyPixels(288, 31 + profile), profile)
      for (n <- 0 until good.length by 5)
        TgaCodec.decodePixels(good.take(n)) // must not throw
      for (i <- 0 until good.length by 3) {
        val bad = good.clone(); bad(i) = (bad(i) ^ 0x81).toByte
        TgaCodec.decodePixels(bad) // must not throw
      }
    }
  }

  test("q235 corpus: TGA trans-code is hash-invariant, pairs exactly planted") {
    val docs = Tables.documents(spark, sf001)
    val pnmHashes = ImageHash.imageHashes(ImageHash.syntheticPnm(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val mixed = ImageHash.syntheticTgaImages(docs)
    val tgaHashes = ImageHash.imageHashes(mixed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(tgaHashes === pnmHashes, "TGA trans-code moved a hash")
    // both TGA profiles appear among the originals (image type at byte
    // 2: 3 = uncompressed gray, 9 = RLE color-mapped); siblings are PNG
    val byId = mixed.collect().map(a => a.asset_id -> a.bytes).toMap
    val origTypes = byId.filter(_._1 % 2 == 0).values.map(b => b(2) & 0xff).toSet
    assert(origTypes == Set(3, 9), s"original profiles: $origTypes")
    assert(byId.filter(_._1 % 2 == 1).values.forall(b =>
      (b(1) & 0xff) == 'P'), "siblings must be PNG")
    val pairs = ImageHash.nearDupImagePairs(ImageHash.imageHashes(mixed))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hm = tgaHashes.toMap
    val exp = hm.keys.filter(id => id % 2 == 0 && hm.contains(id + 1))
      .map(id => (id, id + 1,
        java.lang.Long.bitCount(hm(id) ^ hm(id + 1)).toLong))
      .filter(_._3 <= 3).toSeq.sorted
    assert(pairs.toSeq.sorted === exp)
    assert(exp.nonEmpty, "sf0.001 must plant at least one recoverable pair")
  }
}
