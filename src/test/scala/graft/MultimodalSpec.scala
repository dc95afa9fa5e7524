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

  /** Canonical little-endian 16-bit PCM WAV bytes, with an optional junk
    * chunk before `data` to exercise chunk walking. */
  private def wavBytes(sampleRate: Int, channels: Int, samples: Seq[Short],
      junkChunk: Boolean = false): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = (0 until 4).foreach(i => bos.write(((v >> (8 * i)) & 0xff).toInt))
    def w16(v: Int): Unit = { bos.write(v & 0xff); bos.write((v >> 8) & 0xff) }
    val dataLen = samples.size * 2
    val junkLen = if (junkChunk) 8 + 4 else 0
    bos.write("RIFF".getBytes); w32(36 + junkLen + dataLen); bos.write("WAVE".getBytes)
    bos.write("fmt ".getBytes); w32(16); w16(1); w16(channels); w32(sampleRate)
    w32(sampleRate.toLong * channels * 2); w16(channels * 2); w16(16)
    if (junkChunk) { bos.write("LIST".getBytes); w32(4); bos.write("INFO".getBytes) }
    bos.write("data".getBytes); w32(dataLen)
    samples.foreach(s => w16(s & 0xffff))
    bos.toByteArray
  }

  test("WAV codec really decodes: square wave features are exact, junk chunks skipped") {
    // mono square wave at half amplitude: RMS = peak = 0.5 exactly,
    // every adjacent pair crosses zero (zcr = 1), all quarters equal
    val square = Seq.tabulate(64)(i => if (i % 2 == 0) 16384 else -16384).map(_.toShort)
    val Some((sr, ch, n, f)) =
      Multimodal.WavCodec.decodeAudio(wavBytes(16000, 1, square, junkChunk = true))
    assert((sr, ch, n) == (16000, 1, 64L))
    assert(f(0) == 0.5f, s"rms ${f(0)}")
    assert(f(1) == 0.5f, s"peak ${f(1)}")
    assert(f.slice(2, 6).forall(_ == 0.5f), s"quarter rms ${f.toSeq}")
    assert(f(6) == 1.0f, s"zcr ${f(6)}")
    // stereo averaging: L=+16384, R=-16384 every frame → mono 0, RMS 0
    val stereo = Seq.tabulate(32)(i => if (i % 2 == 0) 16384 else -16384).map(_.toShort)
    val Some((_, ch2, n2, f2)) = Multimodal.WavCodec.decodeAudio(wavBytes(8000, 2, stereo))
    assert(ch2 == 2 && n2 == 16L && f2(0) == 0.0f && f2(1) == 0.0f)
    // junk rejection: non-RIFF bytes are not WAV
    assert(Multimodal.WavCodec.decodeAudio("not a wav at all".getBytes).isEmpty)
    // truncated data chunk: frame count clamps to the bytes present
    val full = wavBytes(8000, 1, square)
    val truncated = full.take(full.length - 32)
    val Some((_, _, nT, _)) = Multimodal.WavCodec.decodeAudio(truncated)
    assert(nT == 48L, s"truncation must clamp frames, got $nT")
  }

  test("WAV codec never throws on adversarial or random bytes") {
    val rnd = new scala.util.Random(11)
    // random garbage of assorted sizes
    (0 until 200).foreach { i =>
      val garbage = Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt().toByte)
      Multimodal.WavCodec.decodeAudio(garbage) // must not throw
    }
    // valid RIFF/WAVE prefix with a hostile chunk size that would
    // overflow an Int offset (0xFFFFFFF8) — must return None, not crash
    val hostile = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("RIFF".getBytes); bos.write(Array[Byte](36, 0, 0, 0))
      bos.write("WAVE".getBytes)
      bos.write("JUNK".getBytes)
      bos.write(Array[Byte](0xF8.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte))
      bos.write(new Array[Byte](32))
      bos.toByteArray
    }
    assert(Multimodal.WavCodec.decodeAudio(hostile).isEmpty)
    // hostile sampleRate 0xFFFFFFFF (unsigned) must be rejected, not
    // Int-wrapped into a negative rate/duration
    val badRate = {
      val square = Seq.tabulate(8)(i => if (i % 2 == 0) 16384 else -16384).map(_.toShort)
      val ok = wavBytes(16000, 1, square)
      // sampleRate lives at offset 12 (RIFF hdr) + 8 (fmt hdr) + 4
      (0 until 4).foreach(i => ok(24 + i) = 0xFF.toByte)
      ok
    }
    assert(Multimodal.WavCodec.decodeAudio(badRate).isEmpty,
      "unsigned-overflow sample rate must yield None")
    // zero-size chunk loop (size 0 repeated) must terminate, not spin
    val zeroLoop = {
      val bos = new java.io.ByteArrayOutputStream()
      bos.write("RIFF".getBytes); bos.write(Array[Byte](36, 0, 0, 0))
      bos.write("WAVE".getBytes)
      bos.write("JUNK".getBytes); bos.write(new Array[Byte](4)) // size 0
      bos.write(new Array[Byte](24))
      bos.toByteArray
    }
    assert(Multimodal.WavCodec.decodeAudio(zeroLoop).isEmpty)
    // PNM shares the never-throw contract: random garbage and a header
    // whose dimension overflows Int (20 digits) must both yield None
    (0 until 200).foreach { i =>
      val garbage = Array.fill[Byte](rnd.nextInt(200))(rnd.nextInt().toByte)
      Multimodal.PnmCodec.decodeImage(garbage)
    }
    assert(Multimodal.PnmCodec.decodeImage(
      "P5 99999999999999999999 2 255 ....".getBytes).isEmpty)
  }

  test("audio feature extraction routes WAV to the real decoder, rest to the stub") {
    val square = Seq.tabulate(64)(i => if (i % 2 == 0) 16384 else -16384).map(_.toShort)
    val audio = Seq(
      MediaAsset(10L, "audio/wav", wavBytes(16000, 1, square)),
      MediaAsset(11L, "audio/mpeg", Array[Byte](0x49, 0x44, 0x33, 1, 2, 3))
    ).toDS()
    val got = Multimodal.audioFeatures(audio).collect().map(a => a.asset_id -> a).toMap
    assert(got(10L).sample_rate == 16000 && got(10L).n_frames == 64L &&
      got(10L).duration_sec == 64.0 / 16000 && got(10L).feature(0) == 0.5f,
      s"real WAV decode wrong: ${got(10L)}")
    // the stub is deterministic per content
    val again = Multimodal.audioFeatures(audio).collect().map(a => a.asset_id -> a).toMap
    assert(got(11L).feature.toSeq == again(11L).feature.toSeq)
    assert(got(11L).feature.toSeq != got(10L).feature.toSeq)
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
