package graft

import graft.operators.Multimodal.{AdpcmCodec, DefaultAudioCodec, G711Codec, WavCodec}
import org.scalatest.funsuite.AnyFunSuite

/** G.711 (μ-law / A-law) + IMA ADPCM codec gates (r14 — the lossy-audio
  * seam the q226 corpus routes through):
  *
  *  - EXACT ROUND-TRIP on the code domain: A-law encode∘decode is the
  *    identity on all 256 code bytes; μ-law on all codes except the
  *    negative-zero 0x7f (which canonicalizes to 0xff — the one known
  *    G.711 quirk), and value-idempotent everywhere.
  *  - ANCHOR VALUES from the G.711 segment formulas (±0, the ±32124 /
  *    ±32256 extremes, the ±8 A-law minimum) and strict monotonicity
  *    across each sign family — a transposed shift or bias breaks these.
  *  - IMA ADPCM hand-stepped vectors through the 89-entry table, table
  *    invariants, block-header restart (a tail-block edit cannot move
  *    earlier samples — the q226 locality argument), stereo word
  *    interleave, and a container decode replayed nibble-by-nibble.
  *  - NEVER-CRASH fuzz over truncations and bit flips of every container.
  */
class G711AdpcmSpec extends AnyFunSuite {

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(s => s * 6364136223846793005L + 1442695040888963407L).drop(1)

  // ---------------------------------------------------------------- G.711

  test("u-law: encode(decode(code)) == code for all codes except 0x7f") {
    for (code <- 0 until 256) {
      val v = G711Codec.ulawToLinear(code)
      val back = G711Codec.linearToUlaw(v)
      if (code == 0x7f) assert(back == 0xff, "negative zero canonicalizes")
      else assert(back == code, f"code 0x$code%02x decoded $v re-encoded 0x$back%02x")
    }
  }

  test("u-law: value idempotence and anchors") {
    for (code <- 0 until 256) {
      val v = G711Codec.ulawToLinear(code)
      assert(G711Codec.ulawToLinear(G711Codec.linearToUlaw(v)) == v)
    }
    assert(G711Codec.ulawToLinear(0xff) == 0)
    assert(G711Codec.ulawToLinear(0x7f) == 0)
    assert(G711Codec.ulawToLinear(0x80) == 32124)
    assert(G711Codec.ulawToLinear(0x00) == -32124)
  }

  test("u-law: sign symmetry and strict monotonicity per family") {
    for (code <- 0 until 256)
      assert(G711Codec.ulawToLinear(code ^ 0x80) == -G711Codec.ulawToLinear(code))
    val pos = (0x80 to 0xff).map(G711Codec.ulawToLinear)
    assert(pos.head == 32124 && pos.last == 0)
    pos.sliding(2).foreach { case Seq(a, b) => assert(a > b) }
  }

  test("a-law: encode(decode(code)) == code for ALL 256 codes") {
    for (code <- 0 until 256) {
      val v = G711Codec.alawToLinear(code)
      assert(G711Codec.linearToAlaw(v) == code,
        f"code 0x$code%02x decoded $v re-encoded 0x${G711Codec.linearToAlaw(v)}%02x")
    }
  }

  test("a-law: anchors, sign symmetry, minimum magnitude 8") {
    assert(G711Codec.alawToLinear(0xd5) == 8)
    assert(G711Codec.alawToLinear(0x55) == -8)
    assert(G711Codec.alawToLinear(0xaa) == 32256)
    assert(G711Codec.alawToLinear(0x2a) == -32256)
    for (code <- 0 until 256) {
      val v = G711Codec.alawToLinear(code)
      assert(G711Codec.alawToLinear(code ^ 0x80) == -v)
      assert(math.abs(v) >= 8, "A-law has no zero; min magnitude is 8")
    }
  }

  test("g711 container: u-law WAV decodes to its formula PCM via the canonical path") {
    val codes = lcg(7).take(300).map(v => (v >>> 24).toByte).toArray
    val wav = G711Codec.toWav(G711Codec.wrap(7, 8000, 1, codes))
    assert(wav.isDefined)
    val (sr, ch, pcm) = WavCodec.decodePcm16(wav.get).get
    assert(sr == 8000 && ch == 1 && pcm.length == 300)
    for (i <- codes.indices)
      assert(pcm(i) == G711Codec.ulawToLinear(codes(i) & 0xff))
  }

  test("g711 container: a-law stereo interleave preserved") {
    val codes = lcg(11).take(280).map(v => (v >>> 24).toByte).toArray
    val wav = G711Codec.toWav(G711Codec.wrap(6, 16000, 2, codes))
    assert(wav.isDefined)
    val (sr, ch, pcm) = WavCodec.decodePcm16(wav.get).get
    assert(sr == 16000 && ch == 2 && pcm.length == 280)
    for (i <- codes.indices)
      assert(pcm(i) == G711Codec.alawToLinear(codes(i) & 0xff))
  }

  // ------------------------------------------------------------ IMA ADPCM

  test("adpcm: step table invariants (canonical IMA profile)") {
    val t = AdpcmCodec.StepTable
    assert(t.length == 89)
    assert(t.head == 7 && t.last == 32767)
    t.sliding(2).foreach { case Array(a, b) =>
      assert(b > a, "strictly increasing")
      assert(b.toDouble / a < 1.16 && b.toDouble / a > 1.03,
        s"~1.1x geometric growth, got $a -> $b")
    }
    assert(AdpcmCodec.IndexTable.toSeq == Seq(-1, -1, -1, -1, 2, 4, 6, 8))
  }

  test("adpcm: hand-stepped nibble vectors") {
    // pred=0, idx=0 (step 7): n=0 -> diff=0, idx -1 clamps to 0
    assert(AdpcmCodec.stepNibble(0, 0, 0) == ((0, 0)))
    // n=4 -> diff = 0 + 7 = 7, idx 0+2=2
    assert(AdpcmCodec.stepNibble(0, 0, 4) == ((7, 2)))
    // n=12 (8|4): sign -> pred -= 7, idx 0+2=2
    assert(AdpcmCodec.stepNibble(0, 0, 12) == ((-7, 2)))
    // pred=100, idx=5 (step 12): n=3 -> 1 + 3 + 6 = 10 -> 110, idx 4
    assert(AdpcmCodec.stepNibble(100, 5, 3) == ((110, 4)))
    // pred=91? from (100,4): step 11: n=15 -> 1+2+5+11=19, sign -> 81, idx 12
    assert(AdpcmCodec.stepNibble(100, 4, 15) == ((81, 12)))
    // saturation both ways at the rails
    assert(AdpcmCodec.stepNibble(32760, 88, 7)._1 == 32767)
    assert(AdpcmCodec.stepNibble(-32760, 88, 15)._1 == -32768)
  }

  /** Independent in-spec replay of a mono block (header + nibbles). */
  private def replayMono(block: Array[Byte]): Array[Short] = {
    var pred = ((block(0) & 0xff) | ((block(1) & 0xff) << 8)).toShort.toInt
    var idx = math.min(88, block(2) & 0xff)
    val out = scala.collection.mutable.ArrayBuffer[Short](pred.toShort)
    for (i <- 4 until block.length; half <- 0 to 1) {
      val n = if (half == 0) block(i) & 0x0f else (block(i) >> 4) & 0x0f
      val (p, j) = AdpcmCodec.stepNibble(pred, idx, n)
      pred = p; idx = j
      out += p.toShort
    }
    out.toArray
  }

  test("adpcm container: mono decode equals the nibble-by-nibble replay") {
    val block = lcg(23).take(36).map(v => (v >>> 40).toByte).toArray // 4 hdr + 32 data
    val wav = AdpcmCodec.toWav(AdpcmCodec.wrap(8000, 1, 36, block))
    assert(wav.isDefined)
    val (sr, ch, pcm) = WavCodec.decodePcm16(wav.get).get
    assert(sr == 8000 && ch == 1 && pcm.length == 65) // 1 + 32*2
    assert(pcm.toSeq == replayMono(block).toSeq)
  }

  test("adpcm container: block headers restart prediction (tail edits stay local)") {
    val b1 = lcg(31).take(36).map(v => (v >>> 40).toByte).toArray
    val b2 = lcg(37).take(36).map(v => (v >>> 40).toByte).toArray
    val b2edit = b2.clone(); b2edit(35) = (b2edit(35) ^ 0x5a).toByte
    val pcmA = WavCodec.decodePcm16(
      AdpcmCodec.toWav(AdpcmCodec.wrap(8000, 1, 36, b1 ++ b2)).get).get._3
    val pcmB = WavCodec.decodePcm16(
      AdpcmCodec.toWav(AdpcmCodec.wrap(8000, 1, 36, b1 ++ b2edit)).get).get._3
    assert(pcmA.length == 130 && pcmB.length == 130)
    // block 1 (65 samples) and block 2's untouched prefix identical;
    // only the last data byte's two samples may move
    assert(pcmA.take(128).toSeq == pcmB.take(128).toSeq)
    assert(pcmA.drop(128).toSeq != pcmB.drop(128).toSeq)
  }

  test("adpcm container: stereo 4-byte word interleave") {
    // 2 channels, blockAlign 24: two 4-byte headers + two 4-byte data
    // words per channel (round-robin ch0,ch1,ch0,ch1) -> 1 + 16 = 17 frames
    val block = lcg(41).take(24).map(v => (v >>> 40).toByte).toArray
    val wav = AdpcmCodec.toWav(AdpcmCodec.wrap(8000, 2, 24, block))
    assert(wav.isDefined)
    val (_, ch, pcm) = WavCodec.decodePcm16(wav.get).get
    assert(ch == 2 && pcm.length == 34)
    // replay each channel independently: header at 4*c, data word w at
    // 8 + (w*2 + c)*4
    for (c <- 0 to 1) {
      var pred = ((block(4 * c) & 0xff) | ((block(4 * c + 1) & 0xff) << 8)).toShort.toInt
      var idx = math.min(88, block(4 * c + 2) & 0xff)
      assert(pcm(c) == pred.toShort)
      var frame = 1
      for (w <- 0 to 1; k <- 0 until 4; half <- 0 to 1) {
        val byte = block(8 + (w * 2 + c) * 4 + k) & 0xff
        val n = if (half == 0) byte & 0x0f else (byte >> 4) & 0x0f
        val (p, j) = AdpcmCodec.stepNibble(pred, idx, n)
        pred = p; idx = j
        assert(pcm(frame * 2 + c) == p.toShort, s"ch $c frame $frame")
        frame += 1
      }
    }
  }

  // -------------------------------------------------- routing + invariance

  test("q226 lattice invariance: original PCM == sibling decode outside the edit") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def raster(salt: String): Array[Byte] =
      (1 to 18).flatMap { i =>
        md.digest((if (i == 18 && salt.nonEmpty) s"doc-text$salt"
                   else s"doc-text%$i").getBytes("UTF-8")).toSeq
      }.toArray
    for ((wrapd, name) <- Seq(
        ((d: Array[Byte]) => G711Codec.toWav(G711Codec.wrap(7, 16000, 1, d)),
          "ulaw"),
        ((d: Array[Byte]) => G711Codec.toWav(G711Codec.wrap(6, 16000, 1, d)),
          "alaw"),
        ((d: Array[Byte]) => AdpcmCodec.toWav(AdpcmCodec.wrap(16000, 1, 144, d)),
          "adpcm"))) {
      val orig = WavCodec.decodePcm16(wrapd(raster("")).get).get._3
      val sib = WavCodec.decodePcm16(wrapd(raster("~edit")).get).get._3
      assert(orig.length == sib.length, name)
      val n = orig.length
      // the last md5 block touches at most the final 16 samples (G.711)
      // or 32 (ADPCM nibbles); everything before is IDENTICAL
      val tail = if (name == "adpcm") 32 else 16
      assert(orig.take(n - tail).toSeq == sib.take(n - tail).toSeq, name)
      assert(orig.drop(n - tail).toSeq != sib.drop(n - tail).toSeq, name)
    }
  }

  test("DefaultAudioCodec routes all four real formats") {
    val codes = lcg(53).take(200).map(v => (v >>> 24).toByte).toArray
    val blocks = lcg(59).take(144).map(v => (v >>> 40).toByte).toArray
    assert(DefaultAudioCodec.decodeEnergyWindows(
      G711Codec.wrap(7, 16000, 1, codes)).isDefined)
    assert(DefaultAudioCodec.decodeEnergyWindows(
      G711Codec.wrap(6, 16000, 1, codes)).isDefined)
    assert(DefaultAudioCodec.decodeEnergyWindows(
      AdpcmCodec.wrap(16000, 1, 144, blocks)).isDefined)
    // and the windows match the codec's own canonical-WAV path
    val viaRoute = DefaultAudioCodec.decodeEnergyWindows(
      G711Codec.wrap(7, 16000, 1, codes)).get
    val viaWav = WavCodec.decodeEnergyWindows(
      G711Codec.toWav(G711Codec.wrap(7, 16000, 1, codes)).get).get
    assert(viaRoute.toSeq == viaWav.toSeq)
  }

  test("never-crash fuzz: truncations and bit flips return None or decode") {
    val codes = lcg(61).take(300).map(v => (v >>> 24).toByte).toArray
    val blocks = lcg(67).take(288).map(v => (v >>> 40).toByte).toArray
    val containers = Seq(
      G711Codec.wrap(7, 8000, 1, codes),
      G711Codec.wrap(6, 8000, 2, codes),
      AdpcmCodec.wrap(8000, 1, 144, blocks),
      AdpcmCodec.wrap(8000, 2, 24, blocks.take(48)))
    for (c <- containers) {
      for (len <- 0 until c.length by 7) {
        G711Codec.toWav(c.take(len)); AdpcmCodec.toWav(c.take(len))
        DefaultAudioCodec.decodeAudio(c.take(len))
      }
      for (seed <- 1 to 40) {
        val flipped = c.clone()
        val pos = math.abs(lcg(seed).next().toInt) % flipped.length
        flipped(pos) = (flipped(pos) ^ (1 << (seed % 8))).toByte
        G711Codec.toWav(flipped); AdpcmCodec.toWav(flipped)
        DefaultAudioCodec.decodeAudio(flipped)
      }
    }
    succeed
  }
}
