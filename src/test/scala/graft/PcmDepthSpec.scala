package graft

import graft.operators.ImageHash
import graft.operators.Multimodal.{PcmDepthCodec, WavCodec}
import org.scalatest.funsuite.AnyFunSuite

/** PCM bit-depth family gates (r16 — the WAV variants a real corpus
  * carries beyond canonical 16-bit):
  *
  *  - 24-BIT: encode (v << 8) → decode (top 16 bits) is the identity;
  *    a hand-built stream with NON-ZERO low bytes proves decode
  *    truncates (never rounds — the deterministic narrowing contract).
  *  - FLOAT32: the symmetric ±32767 scaling is the identity on EVERY
  *    16-bit value — proven exhaustively over all 65 536; NaN
  *    canonicalizes to 0 and ±inf/out-of-range clamp.
  *  - 8-BIT UNSIGNED: on-lattice round-trip, and `javax.sound.sampled`
  *    as the independent JDK reference BOTH directions (the JDK writes
  *    8-bit unsigned WAV natively).
  *  - Depth INVARIANCE: energy windows of the 24-bit and float
  *    trans-codes equal the 16-bit original's exactly.
  *  - NEVER-CRASH fuzz; canonical 16-bit WAV stays WavCodec's (this
  *    codec returns None for it).
  *  - The planted q238 pair corpus is hash-invariant vs the all-WAV
  *    q164 corpus and recovers exactly the planted siblings.
  */
class PcmDepthSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  private def noisePcm(n: Int, seed: Long): Array[Short] =
    lcg(seed).take(n).map(v => (v >>> 32).toShort).toArray

  test("24-bit: lossless round-trip; hand-built low bytes truncate, never round") {
    for ((ch, n) <- Seq((1, 144), (2, 288), (1, 145))) {
      val pcm = noisePcm(n, 17 + ch + n)
      val wav = PcmDepthCodec.toWav(PcmDepthCodec.encode24(16000, ch, pcm))
        .getOrElse(fail(s"ch$ch n$n: 24-bit decode failed"))
      val (sr, dch, out) = WavCodec.decodePcm16(wav).get
      assert(sr == 16000 && dch == ch && out.sameElements(pcm), s"ch$ch n$n")
    }
    // hand-built: sample bytes (0xFF, 0x34, 0x12) = 0x1234FF must
    // decode 0x1234 (truncation), NOT 0x1235 (rounding)
    val enc = PcmDepthCodec.encode24(8000, 1, Array[Short](0))
    val dataOff = enc.length - 3
    enc(dataOff) = 0xff.toByte; enc(dataOff + 1) = 0x34; enc(dataOff + 2) = 0x12
    val (_, _, one) = WavCodec.decodePcm16(PcmDepthCodec.toWav(enc).get).get
    assert(one.toSeq == Seq(0x1234.toShort), s"got ${one.toSeq}")
  }

  test("float32: identity on EVERY 16-bit value; NaN/inf/out-of-range handled") {
    val all = Array.tabulate(65536)(i => (i - 32768).toShort)
    val wav = PcmDepthCodec.toWav(PcmDepthCodec.encodeFloat32(16000, 1, all))
      .getOrElse(fail("float decode failed"))
    val (_, _, out) = WavCodec.decodePcm16(wav).get
    for (i <- all.indices)
      assert(out(i) == all(i), s"value ${all(i)} came back ${out(i)}")
    // special values through a hand-built data section
    def floatWav(xs: Array[Float]): Array[Byte] = {
      val enc = PcmDepthCodec.encodeFloat32(16000, 1, new Array[Short](xs.length))
      val off = enc.length - 4 * xs.length
      for (i <- xs.indices) {
        val b = java.lang.Float.floatToRawIntBits(xs(i))
        enc(off + 4 * i) = (b & 0xff).toByte
        enc(off + 4 * i + 1) = ((b >> 8) & 0xff).toByte
        enc(off + 4 * i + 2) = ((b >> 16) & 0xff).toByte
        enc(off + 4 * i + 3) = ((b >> 24) & 0xff).toByte
      }
      enc
    }
    val (_, _, special) = WavCodec.decodePcm16(PcmDepthCodec.toWav(floatWav(
      Array(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity,
        2.0f, -2.0f, 1.0f, -1.0f, 0.0f, -0.0f))).get).get
    assert(special.toSeq == Seq[Short](0, 32767, -32768, 32767, -32768,
      32767, -32767, 0, 0), s"got ${special.toSeq}")
  }

  test("8-bit unsigned: on-lattice round-trip + AudioSystem BOTH directions") {
    import javax.sound.sampled._
    val lattice = noisePcm(144, 31).map(v => ((v >> 8) << 8).toShort)
    val ours = PcmDepthCodec.encode8(16000, 1, lattice)
    val (_, _, back) = WavCodec.decodePcm16(PcmDepthCodec.toWav(ours).get).get
    assert(back.sameElements(lattice), "8-bit lattice round-trip")
    // JDK reads ours: 8-bit unsigned, sample bytes equal
    val ais = AudioSystem.getAudioInputStream(new java.io.ByteArrayInputStream(ours))
    assert(ais.getFormat.getSampleSizeInBits == 8 &&
      ais.getFormat.getEncoding == AudioFormat.Encoding.PCM_UNSIGNED)
    val raw = ais.readAllBytes()
    for (i <- lattice.indices)
      assert((raw(i) & 0xff) == (lattice(i) >> 8) + 128, s"sample $i")
    // ours reads a JDK-written 8-bit unsigned WAV
    val u8 = lattice.map(v => ((v >> 8) + 128).toByte)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(new AudioInputStream(
      new java.io.ByteArrayInputStream(u8),
      new AudioFormat(AudioFormat.Encoding.PCM_UNSIGNED, 16000f, 8, 1, 1, 16000f, false),
      u8.length), AudioFileFormat.Type.WAVE, bos)
    val wav = PcmDepthCodec.toWav(bos.toByteArray)
      .getOrElse(fail("our decoder rejected a JDK 8-bit WAV"))
    val (_, _, fromJdk) = WavCodec.decodePcm16(wav).get
    assert(fromJdk.sameElements(lattice), "JDK-written 8-bit samples")
  }

  test("energy windows are depth-invariant; canonical 16-bit stays WavCodec's") {
    val pcm = noisePcm(288, 43)
    val wav16 = graft.operators.Multimodal.pcmWavBytes(16000, 1, pcm)
    val w16 = WavCodec.decodeEnergyWindows(wav16).get.toSeq
    assert(PcmDepthCodec.decodeEnergyWindows(
      PcmDepthCodec.encode24(16000, 1, pcm)).get.toSeq == w16, "24-bit windows")
    assert(PcmDepthCodec.decodeEnergyWindows(
      PcmDepthCodec.encodeFloat32(16000, 1, pcm)).get.toSeq == w16, "float windows")
    assert(PcmDepthCodec.toWav(wav16).isEmpty, "16-bit must stay on WavCodec's path")
  }

  test("never-crash fuzz: truncations and bit flips, all three encoders") {
    val pcm = noisePcm(144, 7)
    val lattice = pcm.map(v => ((v >> 8) << 8).toShort)
    for (good <- Seq(PcmDepthCodec.encode24(16000, 1, pcm),
      PcmDepthCodec.encodeFloat32(16000, 1, pcm),
      PcmDepthCodec.encode8(16000, 1, lattice))) {
      for (n <- 0 until good.length by 5) PcmDepthCodec.toWav(good.take(n))
      for (i <- 0 until good.length by 3) {
        val bad = good.clone(); bad(i) = (bad(i) ^ 0x81).toByte
        PcmDepthCodec.toWav(bad) // must not throw
      }
    }
  }

  test("q238 corpus: depth trans-code is hash-invariant, pairs exactly planted") {
    val docs = Tables.documents(spark, sf001)
    val wavHashes = ImageHash.audioEnergyHashes(ImageHash.syntheticWav(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val mixed = ImageHash.syntheticPcmDepth(docs)
    val mixedHashes = ImageHash.audioEnergyHashes(mixed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(mixedHashes === wavHashes, "depth trans-code moved a hash")
    // both depths appear among the originals (fmt bits at offset 34);
    // siblings stay FLAC
    val byId = mixed.collect().map(a => a.asset_id -> a.bytes).toMap
    val origBits = byId.filter(_._1 % 2 == 0).values.map(b => b(34) & 0xff).toSet
    assert(origBits == Set(24, 32), s"original depths: $origBits")
    assert(byId.filter(_._1 % 2 == 1).values.forall(b =>
      new String(b, 0, 4, "US-ASCII") == "fLaC"), "siblings must be FLAC")
    val pairs = ImageHash.nearDupImagePairs(ImageHash.audioEnergyHashes(mixed))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val hm = mixedHashes.toMap
    val exp = hm.keys.filter(id => id % 2 == 0 && hm.contains(id + 1))
      .map(id => (id, id + 1,
        java.lang.Long.bitCount(hm(id) ^ hm(id + 1)).toLong))
      .filter(_._3 <= 3).toSeq.sorted
    assert(pairs.toSeq.sorted === exp)
    assert(exp.nonEmpty, "sf0.001 must plant at least one recoverable pair")
  }
}
