package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaAsset, Mp4Container}
import org.scalatest.funsuite.AnyFunSuite

/** MP4 container-parse gates (the video half of the r14 codec push):
  * frame SAMPLING needs real per-sample byte ranges / keyframe flags /
  * timestamps from the container walk — codec decode of the payload
  * stays the documented stub seam. Gates: the muxer is the independent
  * construction (it writes the spec's box layout directly), and parse
  * must recover every planted payload byte-exactly across chunk
  * layouts, stsz encodings, and offset widths; fuzz must never throw. */
class Mp4Spec extends AnyFunSuite with SparkSessionTestWrapper {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  private def payloads(n: Int, seed: Long, size: Int = 0): Seq[Array[Byte]] =
    (0 until n).map { i =>
      val len = if (size > 0) size else 5 + ((seed + i) % 23).toInt
      lcg(seed + i).take(len).map(v => (v >>> 32).toByte).toArray
    }

  private def extract(bytes: Array[Byte], f: Multimodal.Mp4Frame): Array[Byte] =
    java.util.Arrays.copyOfRange(bytes, f.offset.toInt, (f.offset + f.size).toInt)

  test("mux -> parse round-trip: payloads, keyframes, dts ladder, codec, timescale") {
    val ps = payloads(10, seed = 11)
    val keys = Set(0, 4, 8)
    val mp4 = Mp4Container.mux(ps, keys, codec = "avc1", timescale = 600,
      delta = 25, chunkSize = 3)
    val (codec, ts, frames) = Mp4Container.parse(mp4).get
    assert(codec == "avc1" && ts == 600)
    assert(frames.size == 10)
    frames.foreach { f =>
      assert(extract(mp4, f).toSeq == ps(f.index).toSeq,
        s"frame ${f.index} payload drifted")
      assert(f.isKey == keys.contains(f.index), s"keyframe flag ${f.index}")
      assert(f.dts == 25L * f.index, s"dts ${f.index}")
    }
  }

  test("chunk layouts: single chunk, ragged last chunk, uniform stsz, co64 offsets") {
    val ps = payloads(7, seed = 3)
    Seq(
      Mp4Container.mux(ps, Set(0), chunkSize = 7),             // one chunk
      Mp4Container.mux(ps, Set(0), chunkSize = 3),             // 3+3+1 ragged
      Mp4Container.mux(ps, Set(0), chunkSize = 2),             // 2*3+1 ragged
      Mp4Container.mux(payloads(7, 3, size = 16), Set(0),
        chunkSize = 3, uniformStsz = true),                    // uniform sizes
      Mp4Container.mux(ps, Set(0), chunkSize = 3, use64 = true) // co64
    ).zipWithIndex.foreach { case (mp4, which) =>
      val want = if (which == 3) payloads(7, 3, size = 16) else ps
      val (_, _, frames) = Mp4Container.parse(mp4)
        .getOrElse(fail(s"layout $which failed to parse"))
      assert(frames.size == 7, s"layout $which count")
      frames.foreach(f => assert(extract(mp4, f).toSeq == want(f.index).toSeq,
        s"layout $which frame ${f.index}"))
    }
  }

  test("absent stss means every frame is a sync sample") {
    val mp4 = Mp4Container.mux(payloads(5, seed = 9), keyframes = Set.empty)
    val (_, _, frames) = Mp4Container.parse(mp4).get
    assert(frames.forall(_.isKey), "no stss -> all keyframes")
  }

  test("sampleFrames hashes the REAL sampled payloads out of mdat") {
    import spark.implicits._
    val ps = payloads(9, seed = 21)
    val mp4 = Mp4Container.mux(ps, Set(0, 3, 6))
    val assets = Seq(MediaAsset(7L, "video/mp4", mp4)).toDS()
    val got = Multimodal.sampleFrames(assets, everyK = 2).collect()
      .map(f => f.frame_index -> f.frame_sha).toMap
    assert(got.keySet == Set(0, 2, 4, 6, 8))
    val md = java.security.MessageDigest.getInstance("SHA-256")
    got.foreach { case (i, sha) =>
      md.reset()
      val want = md.digest(ps(i)).map("%02x".format(_)).mkString
      assert(sha == want, s"frame $i must hash its actual payload")
    }
    // non-MP4 bytes keep the deterministic stub path
    val junk = Seq(MediaAsset(8L, "video/raw", Array.fill[Byte](40)(3))).toDS()
    assert(Multimodal.sampleFrames(junk, everyK = 2).collect().nonEmpty)
  }

  test("never-crash fuzz: truncations, bit flips, hostile tables") {
    val mp4 = Mp4Container.mux(payloads(8, seed = 5), Set(0, 4))
    (0 until mp4.length by 2).foreach { cut =>
      Mp4Container.parse(java.util.Arrays.copyOfRange(mp4, 0, cut))
    }
    lcg(77).take(400).foreach { r =>
      val pos = math.abs(r % mp4.length).toInt
      val bit = math.abs((r >> 32) % 8).toInt
      val mut = mp4.clone(); mut(pos) = (mut(pos) ^ (1 << bit)).toByte
      Mp4Container.parse(mut) // must not throw
    }
    // hostile stsz count: claim 2^30 samples
    val hostile = mp4.clone()
    val idx = new String(hostile, "ISO-8859-1").indexOf("stsz")
    hostile(idx + 12) = 0x40.toByte // count high byte
    assert(Mp4Container.parse(hostile).isEmpty, "hostile stsz count must reject")
  }
}
