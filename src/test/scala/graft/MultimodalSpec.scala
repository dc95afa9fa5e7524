package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaAsset
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkSessionTestWrapper {
  import spark.implicits._

  private lazy val assets = Seq(
    MediaAsset(1L, "image/png", Array[Byte](1, 2, 3, 4, 5)),
    MediaAsset(2L, "image/jpeg", Array[Byte](9, 8, 7)),
    MediaAsset(3L, "video/mp4", Array.fill[Byte](20)(42))
  ).toDS()

  test("image feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.imageFeatures(assets).collect().sortBy(_.asset_id)
    val f2 = Multimodal.imageFeatures(assets).collect().sortBy(_.asset_id)
    assert(f1.map(_.feature.toSeq).toSeq == f2.map(_.feature.toSeq).toSeq,
      "stub decode is deterministic")
    assert(f1.forall(_.feature.length == 8))
    assert(f1.forall(f => f.width >= 64 && f.height >= 64))
    assert(f1.map(_.n_bytes).toSeq == Seq(5L, 3L, 20L))
  }

  test("identical bytes produce identical features; different bytes differ") {
    val dup = Seq(
      MediaAsset(10L, "image/png", Array[Byte](1, 2, 3)),
      MediaAsset(11L, "image/png", Array[Byte](1, 2, 3)),
      MediaAsset(12L, "image/png", Array[Byte](3, 2, 1))).toDS()
    val f = Multimodal.imageFeatures(dup).collect().sortBy(_.asset_id)
    assert(f(0).feature.toSeq == f(1).feature.toSeq)
    assert(f(0).feature.toSeq != f(2).feature.toSeq)
  }

  test("frame sampling emits every k-th frame with content-hash addresses") {
    val frames = Multimodal.sampleFrames(assets, everyK = 2).collect()
    assert(frames.forall(_.frame_index % 2 == 0))
    assert(frames.map(_.frame_sha).distinct.length == frames.length,
      "frame addresses are unique per (content, index)")
    val v3 = frames.filter(_.asset_id == 3L)
    assert(v3.nonEmpty)
  }
}
