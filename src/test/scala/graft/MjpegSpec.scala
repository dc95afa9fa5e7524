package graft

import graft.operators.{ImageHash, Multimodal}
import graft.operators.Multimodal.JpegCodec
import org.scalatest.funsuite.AnyFunSuite

/** MJPEG video payload decode gates (r14 — the video-codec half of the
  * multimodal seam; the container half landed as Mp4Container/q224):
  *
  *  - ENCODER PARITY: [[JpegCodec.encodeGray]] streams decode back
  *    within ±2 grey levels of the source through OUR decoder (quant
  *    all-ones — the only loss is DCT round-trip rounding) and within
  *    the house ≤3 gate through the JDK's ImageIO (the independent
  *    reference decoder; the codec under test never touches ImageIO).
  *  - PROFILE INVARIANCE: the same pixels under entropy profiles 0 and 1
  *    produce byte-disjoint streams that decode to IDENTICAL luma —
  *    the exact property the q225 corpus plants (profile 1 additionally
  *    exercises DRI restart markers through our decoder).
  *  - VIDEO DECODE: syntheticMjpeg containers yield one decoded 16×16
  *    luma per muxed frame; unedited sibling frames hash to Hamming
  *    distance 0; the planted pair query recovers exactly the siblings.
  *  - NEVER-CRASH fuzz over truncated / bit-flipped streams and
  *    containers.
  */
class MjpegSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  private def noisePixels(w: Int, h: Int, seed: Long): Array[Byte] =
    lcg(seed).take(w * h).map(v => (v >>> 40).toByte).toArray

  private def smoothPixels(w: Int, h: Int): Array[Byte] =
    Array.tabulate(w * h)(i => ((i % w) * 5 + (i / w) * 3).toByte)

  test("encodeGray: our decode recovers the source within DCT rounding (both profiles)") {
    for {
      (w, h, px, label) <- Seq(
        (16, 16, noisePixels(16, 16, 7), "noise 16x16"),
        (24, 24, noisePixels(24, 24, 11), "noise 24x24"),
        (17, 13, noisePixels(17, 13, 13), "odd 17x13 (edge padding)"),
        (32, 8, smoothPixels(32, 8), "smooth 32x8"))
      profile <- Seq(0, 1)
    } {
      val bytes = JpegCodec.encodeGray(w, h, px, profile)
      val got = JpegCodec.decodeLuma(bytes)
      assert(got.isDefined, s"$label p$profile: decode failed")
      val (gw, gh, luma) = got.get
      assert(gw == w && gh == h, s"$label p$profile dims")
      var maxDiff = 0
      for (i <- px.indices)
        maxDiff = math.max(maxDiff, math.abs((px(i) & 0xff) - luma(i)))
      assert(maxDiff <= 2, s"$label p$profile: max diff $maxDiff (quant=1 bound)")
    }
  }

  test("encodeGray: ImageIO (independent reference) decodes our streams within the house gate") {
    for {
      (w, h, px, label) <- Seq(
        (16, 16, noisePixels(16, 16, 17), "noise 16x16"),
        (24, 24, noisePixels(24, 24, 19), "noise 24x24 with restarts"))
      profile <- Seq(0, 1)
    } {
      val bytes = JpegCodec.encodeGray(w, h, px, profile)
      val ref = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"$label p$profile: ImageIO rejected the stream")
      assert(ref.getWidth == w && ref.getHeight == h)
      val (_, _, mine) = JpegCodec.decodeLuma(bytes).get
      val raster = ref.getRaster
      var maxDiff = 0
      for (y <- 0 until h; x <- 0 until w)
        maxDiff = math.max(maxDiff,
          math.abs(raster.getSample(x, y, 0) - mine(y * w + x)))
      assert(maxDiff <= 3, s"$label p$profile: max diff $maxDiff vs ImageIO")
    }
  }

  test("profile invariance: disjoint bytes, identical decoded luma") {
    val px = noisePixels(16, 16, 23)
    val a = JpegCodec.encodeGray(16, 16, px, 0)
    val b = JpegCodec.encodeGray(16, 16, px, 1)
    assert(!java.util.Arrays.equals(a, b))
    val (_, _, la) = JpegCodec.decodeLuma(a).get
    val (_, _, lb) = JpegCodec.decodeLuma(b).get
    assert(la.toSeq == lb.toSeq,
      "entropy-level profiles must decode to bit-identical pixels")
  }

  test("syntheticMjpeg: every muxed frame decodes; sibling frames hash at distance 0") {
    import spark.implicits._
    val docs = Seq((0L, "alpha doc"), (1L, "beta doc"), (10L, "gamma doc"))
      .toDF("doc_id", "text")
    val assets = ImageHash.syntheticMjpeg(docs).collect().map(a => a.asset_id -> a).toMap
    // docs 0,10 -> sibling planted (doc_id % 10 == 0); doc 1 none
    assert(assets.keySet == Set(0L, 1L, 2L, 20L, 21L))
    for ((id, a) <- assets) {
      val docId = id / 2
      val n = (3 + docId % 5).toInt
      val frames = Multimodal.decodeVideoFrameLumas(a.bytes)
      assert(frames.size == n, s"asset $id: ${frames.size} of $n frames decoded")
      assert(frames.forall { case (_, w, h, _) => w == 16 && h == 16 })
    }
    def hashes(id: Long): Map[Int, Long] =
      Multimodal.decodeVideoFrameLumas(assets(id).bytes)
        .map { case (i, w, h, l) => i -> ImageHash.dhash(w, h, l) }.toMap
    val orig = hashes(20L)
    val sib = hashes(21L)
    assert(orig.keySet == sib.keySet)
    for (i <- orig.keySet) {
      val dist = java.lang.Long.bitCount(orig(i) ^ sib(i))
      if (i == 1) assert(dist > 3, s"edited frame $i should not match (dist $dist)")
      else assert(dist == 0, s"unedited frame $i must be identical (dist $dist)")
    }
  }

  test("q225 pair query recovers exactly the planted sibling pairs") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"document number $i body")).toDF("doc_id", "text")
    val fh = ImageHash.videoFrameHashes(ImageHash.syntheticMjpeg(docs))
    val pairs = ImageHash.videoNearDupPairs(fh).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = (0L until 40L by 10L).map(d => (d * 2, d * 2 + 1)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == expected)
    for ((a1, _, nMatch) <- pairs) {
      val n = 3 + (a1 / 2) % 5
      assert(nMatch == n - 1, s"pair of asset $a1: $nMatch of ${n - 1} unedited frames")
    }
  }

  test("q227 scene cuts: boundaries recovered exactly; within-scene wobble stays under threshold") {
    import spark.implicits._
    val docs = (0L until 30L).map(i => (i, s"video doc $i text")).toDF("doc_id", "text")
    val fh = ImageHash.videoFrameHashes(ImageHash.syntheticScenes(docs))
    val cuts = ImageHash.sceneCuts(fh).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    // every cut sits on a scene boundary (frame_index % 3 == 0, > 0)
    assert(cuts.forall { case (_, f, _) => f % 3 == 0 && f > 0 })
    // every video with n = 6 + id % 5 frames has exactly its
    // ceil(n/3) - 1 boundaries recovered
    val byAsset = cuts.groupBy(_._1).view.mapValues(_.length).toMap
    for (id <- 0L until 30L) {
      val n = (6 + id % 5).toInt
      val expected = (n + 2) / 3 - 1
      assert(byAsset.getOrElse(id, 0) == expected,
        s"asset $id: ${byAsset.getOrElse(id, 0)} cuts, expected $expected")
    }
    // the within-scene wobble is 8 structural bits at most plus a few
    // JPEG-rounding near-tie flips (measured max 10 here); cross-scene
    // jumps start at ~23 — verify the bimodal gap brackets threshold 16
    val all = fh.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1).values.flatMap { fs =>
        fs.sortBy(_._2).sliding(2).collect { case Array(a, b) =>
          java.lang.Long.bitCount(a._3 ^ b._3) }
      }
    assert(all.forall(d => d <= 12 || d >= 18),
      s"distance population not bimodal: ${all.toSeq.sorted.mkString(",")}")
  }

  test("q227 threshold margins hold at the pinned benchmark scale (sf0.1, 5000 docs)") {
    // r14 ADVICE asked for the 30-doc gap assertion at benchmark scale —
    // running it EXPOSED the true population shape (35k consecutive
    // pairs): the two sides obey DIFFERENT kinds of bound, and the naive
    // "no distance in (12,18)" claim is statistically impossible at
    // scale, so this test gates the real ones.
    //  - FALSE-CUT side (within-scene) is DETERMINISTIC: one flipped
    //    even-aligned pixel-row pair = one dHash grid row = 8 structural
    //    bits; quant-1 JPEG rounding (±2 grey) can flip only near-tie
    //    gradients inside the one changed 8×8 block row — measured
    //    ceiling 9 (= 8 + 1) over all 25k within-scene pairs, gated here
    //    at ≤ 12, comfortably below threshold 16: zero false cuts ever.
    //  - MISS side (scene boundary) is BINOMIAL: a content-random
    //    regeneration lands at mean ≈ 32, σ ≈ 4.6, so the tail crosses
    //    any fixed threshold eventually (measured min 17 here — still
    //    detected; per-pair P(< 16) ≈ 4e-4 from the normal tail). Gated
    //    as a RATE: zero misses at this scale, and the within/boundary
    //    populations must not overlap.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // sf0.1 is the one benchmark-scale dependency in the unit suite (the
    // whole point is the pinned scale); skip, not fail, on checkouts
    // without the generated testdata (r15 review finding)
    assume(new java.io.File("/root/testdata/sf0.1/documents.parquet").exists(),
      "benchmark-scale testdata not present")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val fh = ImageHash.videoFrameHashes(ImageHash.syntheticScenes(docs))
    val row = fh
      .withColumn("prev", lag("dhash", 1).over(
        Window.partitionBy("asset_id").orderBy("frame_index")))
      .filter(col("prev").isNotNull)
      .select(
        bit_count(col("dhash").bitwiseXOR(col("prev"))).cast("long").as("dist"),
        (col("frame_index") % 3 === 0).as("is_boundary"))
      .agg(
        max(when(!col("is_boundary"), col("dist"))).as("max_within"),
        min(when(col("is_boundary"), col("dist"))).as("min_boundary"),
        sum(when(col("is_boundary") && col("dist") < 16, 1L).otherwise(0L)).as("missed_cuts"),
        sum(when(!col("is_boundary") && col("dist") >= 16, 1L).otherwise(0L)).as("false_cuts"),
        count(lit(1)).as("n"))
      .first()
    assert(row.getLong(0) <= 12,
      s"within-scene ceiling broke: max ${row.getLong(0)} (structural 8 + rounding)")
    assert(row.getLong(3) == 0, s"${row.getLong(3)} false cuts (within-scene >= 16)")
    assert(row.getLong(2) == 0, s"${row.getLong(2)} missed cuts (boundary < 16)")
    assert(row.getLong(1) > row.getLong(0),
      s"populations overlap: boundary min ${row.getLong(1)} <= within max ${row.getLong(0)}")
    assert(row.getLong(4) > 30000, s"population too small: ${row.getLong(4)}")
  }

  test("q230 pipeline: stage counts match an independent plain-Scala replay") {
    import spark.implicits._
    val docs = (0L until 40L).map(i => (i, s"curation doc $i")).toDF("doc_id", "text")
    val fh = ImageHash.videoFrameHashes(ImageHash.syntheticSceneSiblings(docs))
      .localCheckpoint(true)
    val rows = fh.collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byAsset = rows.groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    // independent replay of the gate: brute-force distinct-f1 matches
    // (the banded join is pigeonhole-exact at <=3 bits, so brute force
    // is the same relation), drop the higher asset of every pair
    def nMatch(a: Seq[Long], b: Seq[Long]): Long =
      a.count(h1 => b.exists(h2 => java.lang.Long.bitCount(h1 ^ h2) <= 3)).toLong
    val ids = byAsset.keys.toSeq.sorted
    val dup = (for {
      i <- ids; j <- ids if i < j && nMatch(byAsset(i), byAsset(j)) >= 2
    } yield j).toSet
    // the planted profile-1 siblings are EXACTLY the drop set (their
    // frames are bit-identical luma, so every frame matches at 0)
    assert(dup == (0L until 40L by 10L).map(_ * 2 + 1).toSet, s"drop set: $dup")
    val survivors = ids.filterNot(dup)
    val s1Frames = survivors.map(byAsset(_).size.toLong).sum
    // independent replay of the scene sampler: frame 0 + every >=16 jump
    val sampled = survivors.map { a =>
      val hs = byAsset(a)
      1L + (1 until hs.size).count(i =>
        java.lang.Long.bitCount(hs(i) ^ hs(i - 1)) >= 16)
    }.sum
    val report = ImageHash.videoCurationPipeline(fh).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(report.length == 4)
    assert(report(0) == ("0_raw", ids.size.toLong, rows.length.toLong, 0L))
    assert(report(1) == ("1_video_dedup", survivors.size.toLong, s1Frames, 0L))
    assert(report(2) == ("2_scene_sample", survivors.size.toLong, sampled, 0L))
    assert(report(3) == ("3_shards_written", survivors.size.toLong, sampled,
      (sampled + 63L) / 64L),
      "read-back shard counts must equal the rank arithmetic")
  }

  test("never-crash fuzz: truncations and bit flips of streams and containers") {
    val px = noisePixels(16, 16, 29)
    val jpeg = JpegCodec.encodeGray(16, 16, px, 1)
    for (len <- 0 until jpeg.length by 5) JpegCodec.decodeLuma(jpeg.take(len))
    for (seed <- 1 to 60) {
      val flipped = jpeg.clone()
      val pos = math.abs(lcg(seed).next().toInt) % flipped.length
      flipped(pos) = (flipped(pos) ^ (1 << (seed % 8))).toByte
      JpegCodec.decodeLuma(flipped)
    }
    val container = Multimodal.Mp4Container.mux(
      (0 until 4).map(i => JpegCodec.encodeGray(16, 16, noisePixels(16, 16, 31 + i), 0)),
      Set(0), codec = "jpeg")
    for (len <- 0 until container.length by 11)
      Multimodal.decodeVideoFrameLumas(container.take(len))
    for (seed <- 1 to 40) {
      val flipped = container.clone()
      val pos = math.abs(lcg(seed).next().toInt) % flipped.length
      flipped(pos) = (flipped(pos) ^ (1 << (seed % 8))).toByte
      Multimodal.decodeVideoFrameLumas(flipped)
    }
    succeed
  }
}
