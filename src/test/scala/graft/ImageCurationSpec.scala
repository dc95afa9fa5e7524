package graft

import graft.operators.ImageHash
import org.scalatest.funsuite.AnyFunSuite

/** q234 end-to-end still-image curation pipeline gates (r16 — the
  * MjpegSpec discipline applied to the stills twin of q230): stage
  * counts against an independent plain-Scala replay, the planted
  * structures recovered exactly, and the read-back shard count equal
  * to the rank arithmetic. */
class ImageCurationSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private lazy val docs = Tables.documents(spark, sf001)
  private lazy val corpus = ImageHash.syntheticCurationStills(docs).collect()
  private lazy val stats = ImageHash.imageHashStats(
    ImageHash.syntheticCurationStills(docs)).collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

  test("corpus: all seven lossless containers appear among originals; siblings PNG") {
    val origs = corpus.filter(_.asset_id % 2 == 0)
    def sniff(b: Array[Byte]): String =
      if (b(0) == 'P' && b(1) == '5') "p5"
      else if (b(0) == 'G') "gif"
      else if (b(0) == 'B' && b(1) == 'M') "bmp"
      else if (b(0) == 'I' || b(0) == 'M') "tiff"
      else if (b(0) == 0 && b(1) == 0 && b(2) == 1 && b(3) == 0) "ico"
      else if (b(1) == 1 && b(2) == 9) "tga" // RLE color-mapped profile
      else if ((b(1) & 0xff) == 'P') "png"
      else "?"
    assert(origs.map(a => sniff(a.bytes)).toSet ==
      Set("p5", "gif", "bmp", "tiff", "tga", "ico", "png"))
    // the PNG originals are the Adam7 profile (interlace byte set)
    assert(origs.filter(a => sniff(a.bytes) == "png")
      .forall(a => a.bytes(28) == 1), "PNG originals must be Adam7")
    assert(corpus.filter(_.asset_id % 2 == 1)
      .forall(a => (a.bytes(1) & 0xff) == 'P'), "siblings must be PNG")
  }

  test("darkened docs (id % 7 == 0) read mean_luma ~31; others ~127 — the gate band is wide") {
    val byId = stats.map(s => s._1 -> s._3).toMap
    byId.foreach { case (id, ml) =>
      if ((id / 2) % 7 == 0)
        assert(ml < 64, s"asset $id: darkened mean $ml must sit below the band")
      else
        assert(ml >= 64 && ml < 192, s"asset $id: normal mean $ml must sit inside")
    }
  }

  test("stage counts match an independent plain-Scala replay; shards = ceil(n/64)") {
    // plain-Scala replay of the whole funnel from the collected stats
    val hm = stats.map(s => s._1 -> s._2).toMap
    val ids = hm.keys.toSeq.sorted
    val drop = (for {
      i <- ids; j <- ids if i < j
      if java.lang.Long.bitCount(hm(i) ^ hm(j)) <= 3
    } yield j).toSet
    val s1 = stats.filter(s => !drop.contains(s._1))
    val s2 = s1.filter(s => s._3 >= 64 && s._3 < 192)
    val expShards = math.ceil(s2.length / 64.0).toLong
    val report = ImageHash.imageCurationPipeline(
      ImageHash.imageHashStats(ImageHash.syntheticCurationStills(docs)))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(report == Seq(
      ("0_raw", stats.length.toLong, 0L),
      ("1_image_dedup", s1.length.toLong, 0L),
      ("2_quality_sample", s2.length.toLong, 0L),
      ("3_shards_written", s2.length.toLong, expShards)), s"report: $report")
    assert(drop.nonEmpty, "sf0.001 must plant at least one recoverable pair")
    assert(s1.length > s2.length, "sf0.001 must plant at least one darkened doc")
  }

  test("format invariance holds for the un-darkened docs (the q159 pin argument)") {
    val pnm = ImageHash.imageHashes(ImageHash.syntheticPnm(docs)).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cur = stats.map(s => s._1 -> s._2).toMap
    val undark = cur.keys.filter(id => (id / 2) % 7 != 0)
    assert(undark.nonEmpty)
    undark.foreach { id =>
      assert(cur(id) == pnm(id),
        s"asset $id: container cycle moved an un-darkened hash")
    }
  }
}
