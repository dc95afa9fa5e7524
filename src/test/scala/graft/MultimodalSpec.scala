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

  test("PNM codec really decodes: P6 pixels, P5 grayscale, comments, junk rejection") {
    // hand-built 2x2 P6: red, green, blue, white — known channel means
    def p6(body: Array[Byte], header: String = "P6 2 2 255\n") =
      header.getBytes("US-ASCII") ++ body
    val px = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,
      0, 0, 255.toByte,   255.toByte, 255.toByte, 255.toByte)
    val Some((w, h, f)) = Multimodal.PnmCodec.decodeImage(p6(px))
    assert(w == 2 && h == 2)
    // each channel: (255 + 0 + 0 + 255)/4/255 = 0.5
    assert(f.take(3).forall(v => math.abs(v - 0.5f) < 1e-6), f.toSeq.toString)
    // quadrant lumas (rec601 integer): r=76/255, g=149/255, b=29/255, w=255/255
    val want = Seq(76f / 255, 149f / 255, 29f / 255, 255f / 255)
    f.slice(3, 7).zip(want).foreach { case (got, exp) =>
      assert(math.abs(got - exp) < 1e-3, s"quadrant: $got vs $exp")
    }
    assert(math.abs(f(7) - 0.5f) < 1e-6, "aspect 2/(2+2)")
    // header comments parse; P5 grayscale decodes with r=g=b
    val withComment = p6(px, "P6 # a comment\n2 2 # dims\n255\n")
    assert(Multimodal.PnmCodec.decodeImage(withComment).get._3.toSeq == f.toSeq)
    val p5 = "P5 2 1 255\n".getBytes("US-ASCII") ++ Array[Byte](0, 255.toByte)
    val Some((w5, h5, f5)) = Multimodal.PnmCodec.decodeImage(p5)
    assert(w5 == 2 && h5 == 1)
    assert(f5.take(3).forall(v => math.abs(v - 0.5f) < 1e-6))
    // junk and truncated rasters are None, not garbage
    assert(Multimodal.PnmCodec.decodeImage(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10)).isEmpty)
    assert(Multimodal.PnmCodec.decodeImage(p6(px.take(5))).isEmpty)
  }

  test("default codec routes PNM to the real decoder, other formats to the stub") {
    val ppm = ("P6 1 1 255\n".getBytes("US-ASCII") ++
      Array[Byte](255.toByte, 255.toByte, 255.toByte))
    val mixed = Seq(
      MediaAsset(20L, "image/x-portable-pixmap", ppm),
      MediaAsset(21L, "image/jpeg", Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10))
    ).toDS()
    val f = Multimodal.imageFeatures(mixed).collect().sortBy(_.asset_id)
    assert(f(0).width == 1 && f(0).height == 1, "real decode: true dimensions")
    assert(f(0).feature.take(3).forall(v => math.abs(v - 1.0f) < 1e-6))
    assert(f(1).width >= 64, "stub fallback keeps the pipeline total")
    assert(f.length == 2)
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
