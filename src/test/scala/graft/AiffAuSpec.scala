package graft

import graft.operators.ImageHash
import graft.operators.Multimodal.{AiffCodec, AuCodec, G711Codec, WavCodec}
import org.scalatest.funsuite.AnyFunSuite

/** AIFF / AIFF-C / Sun-AU decode gates (r16 — the audio twin of the
  * BMP/TIFF container work, with `javax.sound.sampled` as the
  * independent JDK reference the way ImageIO gates the image family):
  *
  *  - LOSSLESS ROUND-TRIP: both AIFF profiles (plain big-endian PCM16;
  *    AIFC `sowt` little-endian) and the AU encoder carry PCM verbatim
  *    through encode → toWav → decodePcm16, mono and stereo.
  *  - THE 80-BIT EXTENDED SAMPLE RATE (AIFF's famous wart): encoder ↔
  *    decoder round-trip across the realistic rate ladder, plus
  *    non-normalized and hostile patterns (sign bit, exp 0x7fff).
  *  - INDEPENDENT REFERENCE, BOTH DIRECTIONS: the JDK's AudioSystem
  *    reads our plain-AIFF and AU streams (format fields + sample
  *    bytes exact), and our decoders read JDK-WRITTEN AIFF (16-bit
  *    and 8-bit) and AU files. (The JDK reader predates AIFC `sowt`,
  *    so that profile is gated by round-trip + the q237 corpus.)
  *  - AU G.711 BRANCHES: μ-law/A-law AU payloads decode exactly as
  *    [[G711Codec]]'s segment formulas say, and the header's data
  *    OFFSET is honored (annotation bytes must not enter the PCM).
  *  - NEVER-CRASH fuzz + hostile headers.
  *  - The planted q237 pair corpus is hash-invariant vs the all-WAV
  *    q164 corpus and recovers exactly the planted siblings.
  */
class AiffAuSpec extends AnyFunSuite with SparkSessionTestWrapper {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  private def noisePcm(n: Int, seed: Long): Array[Short] =
    lcg(seed).take(n).map(v => (v >>> 32).toShort).toArray

  test("encode16 round-trips PCM bit-exact: AIFF p0/p1 and AU, mono + stereo") {
    for {
      (ch, n) <- Seq((1, 1), (1, 144), (2, 288), (1, 145), (2, 290))
      seed = 17L + ch * 31 + n
    } {
      val pcm = noisePcm(n, seed)
      val variants = Seq(
        "aiff-be" -> AiffCodec.encode16(16000, ch, pcm, 0),
        "aifc-le" -> AiffCodec.encode16(16000, ch, pcm, 1),
        "au" -> AuCodec.encode16(16000, ch, pcm))
      for ((label, bytes) <- variants) {
        val wav = (if (label == "au") AuCodec.toWav(bytes) else AiffCodec.toWav(bytes))
          .getOrElse(fail(s"$label ch$ch n$n: decode failed"))
        val (sr, dch, out) = WavCodec.decodePcm16(wav)
          .getOrElse(fail(s"$label ch$ch n$n: WAV re-entry failed"))
        assert(sr == 16000 && dch == ch, s"$label ch$ch n$n: format")
        assert(out.sameElements(pcm), s"$label ch$ch n$n: samples moved")
      }
    }
  }

  test("profiles byte-disjoint, identical PCM (q237 corpus property)") {
    val pcm = noisePcm(144, 43)
    val s0 = AiffCodec.encode16(16000, 1, pcm, 0)
    val s1 = AiffCodec.encode16(16000, 1, pcm, 1)
    val s2 = AuCodec.encode16(16000, 1, pcm)
    assert(new String(s0, 8, 4, "US-ASCII") == "AIFF")
    assert(new String(s1, 8, 4, "US-ASCII") == "AIFC")
    assert(new String(s2, 0, 4, "US-ASCII") == ".snd")
    val w = Seq(s0, s1, s2).map(b =>
      AiffCodec.toWav(b).orElse(AuCodec.toWav(b)).get.toSeq)
    assert(w.distinct.size == 1, "all three containers must carry identical WAV")
  }

  test("80-bit extended sample rate: round-trip + hostile patterns") {
    for (rate <- Seq(1L, 8000L, 11025L, 16000L, 22050L, 44100L, 48000L,
      96000L, 192000L, 4000000L)) {
      val ext = AiffCodec.rateToExtended(rate)
      // splice into a real COMM by encoding at 16000 then patching
      val aiff = AiffCodec.encode16(16000, 1, noisePcm(16, rate), 0)
      System.arraycopy(ext, 0, aiff, 12 + 8 + 8, 10) // FORM hdr, COMM hdr, ch+frames+size
      if (rate <= 4000000L) {
        val wav = AiffCodec.toWav(aiff).getOrElse(fail(s"rate $rate rejected"))
        val (sr, _, _) = WavCodec.decodePcm16(wav).get
        assert(sr == rate.toInt, s"rate $rate -> $sr")
      }
    }
    // hostile: sign bit set, exp 0x7fff (inf/nan), all-zero
    val base = AiffCodec.encode16(16000, 1, noisePcm(16, 7), 0)
    val rateOff = 12 + 8 + 8
    def patched(b0: Int, b1: Int): Array[Byte] = {
      val b = base.clone()
      b(rateOff) = b0.toByte; b(rateOff + 1) = b1.toByte
      b
    }
    assert(AiffCodec.toWav(patched(0x80 | base(rateOff), base(rateOff + 1) & 0xff)).isEmpty,
      "negative rate")
    assert(AiffCodec.toWav(patched(0x7f, 0xff)).isEmpty, "inf/nan exponent")
    val zeroed = base.clone()
    java.util.Arrays.fill(zeroed, rateOff, rateOff + 10, 0.toByte)
    assert(AiffCodec.toWav(zeroed).isEmpty, "zero rate")
  }

  test("AudioSystem (JDK) reads our plain-AIFF and AU streams exactly") {
    for (ch <- 1 to 2) {
      val pcm = noisePcm(144 * ch, 59 + ch)
      for ((label, bytes) <- Seq(
        "aiff" -> AiffCodec.encode16(16000, ch, pcm, 0),
        "au" -> AuCodec.encode16(16000, ch, pcm))) {
        val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val f = ais.getFormat
        assert(f.getSampleRate == 16000f && f.getChannels == ch &&
          f.getSampleSizeInBits == 16 && f.isBigEndian,
          s"$label ch$ch: JDK format $f")
        val raw = ais.readAllBytes()
        assert(raw.length == pcm.length * 2, s"$label ch$ch: JDK data length")
        for (i <- pcm.indices) {
          val v = (((raw(2 * i) & 0xff) << 8) | (raw(2 * i + 1) & 0xff)).toShort
          assert(v == pcm(i), s"$label ch$ch sample $i")
        }
      }
    }
  }

  test("our decoders read JDK-WRITTEN AIFF (16- and 8-bit) and AU files") {
    import javax.sound.sampled._
    for (ch <- 1 to 2) {
      val pcm = noisePcm(144 * ch, 71 + ch)
      val be = new Array[Byte](pcm.length * 2)
      for (i <- pcm.indices) {
        be(2 * i) = ((pcm(i) >> 8) & 0xff).toByte; be(2 * i + 1) = (pcm(i) & 0xff).toByte
      }
      val fmt16 = new AudioFormat(16000f, 16, ch, true, true)
      for (tpe <- Seq(AudioFileFormat.Type.AIFF, AudioFileFormat.Type.AU)) {
        val bos = new java.io.ByteArrayOutputStream()
        AudioSystem.write(new AudioInputStream(
          new java.io.ByteArrayInputStream(be), fmt16, pcm.length / ch), tpe, bos)
        val fileBytes = bos.toByteArray
        val wav = (if (tpe == AudioFileFormat.Type.AU) AuCodec.toWav(fileBytes)
        else AiffCodec.toWav(fileBytes))
          .getOrElse(fail(s"$tpe ch$ch: our decoder rejected a JDK file"))
        val (sr, dch, out) = WavCodec.decodePcm16(wav).get
        assert(sr == 16000 && dch == ch && out.sameElements(pcm), s"$tpe ch$ch")
      }
      // 8-bit signed AIFF: our decode widens v*256
      val b8 = pcm.map(v => (v >> 8).toByte)
      val fmt8 = new AudioFormat(16000f, 8, ch, true, true)
      val bos8 = new java.io.ByteArrayOutputStream()
      AudioSystem.write(new AudioInputStream(
        new java.io.ByteArrayInputStream(b8), fmt8, b8.length / ch),
        AudioFileFormat.Type.AIFF, bos8)
      val wav8 = AiffCodec.toWav(bos8.toByteArray)
        .getOrElse(fail(s"8-bit ch$ch: rejected"))
      val (_, _, out8) = WavCodec.decodePcm16(wav8).get
      assert(out8.sameElements(b8.map(v => (v * 256).toShort)), s"8-bit ch$ch widen")
    }
  }

  test("AU G.711 branches match the segment formulas; data offset honored") {
    val codes = Array.tabulate(256)(_.toByte)
    def auHeader(off: Int, size: Int, enc: Int): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w32(v: Long): Unit = {
        out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
        out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
      }
      out.write(".snd".getBytes("US-ASCII"))
      w32(off.toLong); w32(size.toLong); w32(enc.toLong); w32(8000L); w32(1L)
      out.toByteArray
    }
    for ((enc, decode) <- Seq(1 -> (G711Codec.ulawToLinear _), 27 -> (G711Codec.alawToLinear _))) {
      // 8 annotation bytes of junk between header and data: offset 32
      val au = auHeader(32, 256, enc) ++ Array.fill[Byte](8)(0x55) ++ codes
      val wav = AuCodec.toWav(au).getOrElse(fail(s"enc $enc rejected"))
      val (sr, ch, pcm) = WavCodec.decodePcm16(wav).get
      assert(sr == 8000 && ch == 1 && pcm.length == 256)
      for (i <- 0 until 256)
        assert(pcm(i) == decode(i).toShort, s"enc $enc code $i")
    }
    // dataSize 0xffffffff = rest of stream
    val auAll = auHeader(24, -1, 3) ++ Array[Byte](1, 2, 3, 4)
    val (_, _, p) = WavCodec.decodePcm16(AuCodec.toWav(auAll).get).get
    assert(p.toSeq == Seq(0x0102.toShort, 0x0304.toShort))
    // float encoding (6) and offset escapes refuse
    assert(AuCodec.toWav(auHeader(24, 4, 6) ++ Array[Byte](0, 0, 0, 0)).isEmpty, "float")
    assert(AuCodec.toWav(auHeader(2000, 4, 3) ++ Array[Byte](0, 0, 0, 0)).isEmpty,
      "offset escape")
    assert(AuCodec.toWav(auHeader(16, 4, 3) ++ Array[Byte](0, 0, 0, 0)).isEmpty,
      "offset into header")
  }

  test("never-crash fuzz: truncations and bit flips, all three encoders") {
    val pcm = noisePcm(144, 31)
    for ((label, good) <- Seq(
      "aiff" -> AiffCodec.encode16(16000, 1, pcm, 0),
      "aifc" -> AiffCodec.encode16(16000, 1, pcm, 1),
      "au" -> AuCodec.encode16(16000, 1, pcm))) {
      for (n <- 0 until good.length by 5) {
        AiffCodec.toWav(good.take(n)); AuCodec.toWav(good.take(n)) // no throw
      }
      for (i <- 0 until good.length by 3) {
        val bad = good.clone(); bad(i) = (bad(i) ^ 0x81).toByte
        AiffCodec.toWav(bad); AuCodec.toWav(bad) // no throw
      }
      assert(label.nonEmpty)
    }
  }

  test("q237 corpus: AIFF/AU trans-code is hash-invariant, pairs exactly planted") {
    val docs = Tables.documents(spark, sf001)
    val wavHashes = ImageHash.audioEnergyHashes(ImageHash.syntheticWav(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val mixed = ImageHash.syntheticAiffAu(docs)
    val mixedHashes = ImageHash.audioEnergyHashes(mixed)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(mixedHashes === wavHashes, "AIFF/AU trans-code moved a hash")
    // all three containers appear among the originals; siblings stay FLAC
    val byId = mixed.collect().map(a => a.asset_id -> a.bytes).toMap
    val origForms = byId.filter(_._1 % 2 == 0).values
      .map(b => new String(b, 0, 4, "US-ASCII") match {
        case "FORM" => new String(b, 8, 4, "US-ASCII")
        case m => m
      }).toSet
    assert(origForms == Set("AIFF", "AIFC", ".snd"), s"original containers: $origForms")
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
