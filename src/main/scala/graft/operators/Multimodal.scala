package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque BINARY with typed
  * metadata, processed partition-batch-wise.
  *
  * Decode is REAL for every format a lib-free decoder can cover: PNM
  * ([[PnmCodec]]), PNG ([[PngCodec]] — JDK zlib inflate + the spec's
  * unfilter), and WAV ([[WavCodec]]). Only formats that genuinely need
  * codec libraries this container lacks (JPEG, MP3/OGG, video) fall to
  * the deterministic [[StubCodec]] — the one seam to swap for
  * JavaCV/ffmpeg bindings on a real cluster; everything else (batching,
  * schema, partitioning) is production-shaped. Binary payloads never
  * shuffle: decode/feature steps are narrow mapPartitions over the scan,
  * and only the small extracted features flow onward.
  */
object Multimodal {

  /** One media asset: opaque bytes + typed metadata. */
  case class MediaAsset(asset_id: Long, mime: String, bytes: Array[Byte])

  /** Decoded image features (the stub derives them deterministically from
    * the bytes so tests are stable). */
  case class ImageFeatures(asset_id: Long, width: Int, height: Int,
      n_bytes: Long, feature: Array[Float])

  /** One sampled video frame reference. */
  case class FrameSample(asset_id: Long, frame_index: Int, frame_sha: String)

  /** The codec seam: decode bytes to (width, height, 8-dim feature), or
    * None when the payload isn't this codec's format. */
  trait Codec extends Serializable {
    def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])]
  }

  /** REAL decoder for binary PNM (P5 grayscale / P6 RGB, maxval <= 255) —
    * chosen because the format needs zero external libraries, so the
    * decode step is genuinely real in this container. Features: per-
    * channel means, 2×2 luminance-quadrant means, and aspect w/(w+h),
    * all in [0,1]. PNG decodes for real too ([[PngCodec]]); JPEG/video
    * plug in through the same [[Codec]] seam (JavaCV / TwelveMonkeys on
    * a cluster with media libs); [[StubCodec]] remains the deterministic
    * fallback for formats without a decoder here. */
  object PnmCodec extends Codec {
    def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
      if (bytes.length < 10 || bytes(0) != 'P' ||
          (bytes(1) != '5' && bytes(1) != '6')) return None
      val rgb = bytes(1) == '6'
      var pos = 2
      // header tokens: width, height, maxval — whitespace-separated,
      // '#' comments run to end-of-line
      def nextInt(): Option[Int] = {
        while (pos < bytes.length &&
          (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
          if (bytes(pos) == '#') while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          else pos += 1
        }
        val start = pos
        while (pos < bytes.length && bytes(pos).toChar.isDigit) pos += 1
        // > 9 digits cannot be a sane dimension/maxval and would throw
        // in toInt — adversarial headers must yield None, never crash
        if (pos == start || pos - start > 9) None
        else Some(new String(bytes, start, pos - start).toInt)
      }
      for {
        w <- nextInt()
        h <- nextInt()
        maxval <- nextInt()
        if w > 0 && h > 0 && maxval > 0 && maxval <= 255
        // single whitespace separates header from raster
        if pos < bytes.length && bytes(pos).toChar.isWhitespace
        raster = pos + 1
        channels = if (rgb) 3 else 1
        if bytes.length - raster >= w.toLong * h * channels
      } yield {
        var rSum = 0L; var gSum = 0L; var bSum = 0L
        val quadLuma = new Array[Long](4)
        val quadN = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val off = raster + (y.toLong * w + x).toInt * channels
            val r = bytes(off) & 0xff
            val g = if (rgb) bytes(off + 1) & 0xff else r
            val b = if (rgb) bytes(off + 2) & 0xff else r
            rSum += r; gSum += g; bSum += b
            val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
            quadLuma(q) += (r * 299L + g * 587L + b * 114L) / 1000L
            quadN(q) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val m = maxval.toFloat
        val feature = Array(
          rSum.toFloat / n / m, gSum.toFloat / n / m, bSum.toFloat / n / m,
          if (quadN(0) > 0) quadLuma(0).toFloat / quadN(0) / m else 0f,
          if (quadN(1) > 0) quadLuma(1).toFloat / quadN(1) / m else 0f,
          if (quadN(2) > 0) quadLuma(2).toFloat / quadN(2) / m else 0f,
          if (quadN(3) > 0) quadLuma(3).toFloat / quadN(3) / m else 0f,
          w.toFloat / (w + h))
        (w, h, feature)
      }
    }

    /** Pixel-level decode for the perceptual-hash family (q159): the
      * same header/raster contract as [[decodeImage]], returning the
      * full-resolution integer luminance plane (BT.601 integer weights,
      * floor division — bit-exact on any platform) instead of pooled
      * features. */
    private[graft] def decodeLuma(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] = {
      if (bytes.length < 10 || bytes(0) != 'P' ||
          (bytes(1) != '5' && bytes(1) != '6')) return None
      val rgb = bytes(1) == '6'
      var pos = 2
      def nextInt(): Option[Int] = {
        while (pos < bytes.length &&
          (bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
          if (bytes(pos) == '#') while (pos < bytes.length && bytes(pos) != '\n') pos += 1
          else pos += 1
        }
        val start = pos
        while (pos < bytes.length && bytes(pos).toChar.isDigit) pos += 1
        if (pos == start || pos - start > 9) None
        else Some(new String(bytes, start, pos - start).toInt)
      }
      for {
        w <- nextInt()
        h <- nextInt()
        maxval <- nextInt()
        if w > 0 && h > 0 && maxval > 0 && maxval <= 255
        if pos < bytes.length && bytes(pos).toChar.isWhitespace
        raster = pos + 1
        channels = if (rgb) 3 else 1
        if bytes.length - raster >= w.toLong * h * channels
      } yield {
        val luma = new Array[Int](w * h)
        var i = 0
        while (i < w * h) {
          val off = raster + i * channels
          val r = bytes(off) & 0xff
          val g = if (rgb) bytes(off + 1) & 0xff else r
          val b = if (rgb) bytes(off + 2) & 0xff else r
          luma(i) = ((r * 299L + g * 587L + b * 114L) / 1000L).toInt
          i += 1
        }
        (w, h, luma)
      }
    }
  }

  /** REAL decoder for non-interlaced 8-bit-depth PNG (color types 0
    * gray / 2 RGB / 3 palette / 4 gray+alpha / 6 RGBA) — no external
    * library: zlib inflate ships in the JDK (`java.util.zip.Inflater`),
    * and the rest is the spec's chunk walk, per-row unfiltering
    * (None/Sub/Up/Average/Paeth), and pixel conversion. Puts the most
    * common web image format on the real-decode path; JPEG/video remain
    * the [[StubCodec]]'s seam (those genuinely need codec libraries).
    *
    * Robustness contract (the PnmCodec discipline): adversarial input —
    * bad signature, truncated chunks, CRC mismatch, short IDAT, 16-bit
    * depth, interlace — yields None, never a crash; inflated output is
    * size-capped (64 MiB) so a zip-bomb IHDR cannot allocate
    * unboundedly. Alpha is ignored (features/luma read the color
    * channels as-is — the convention a dedup hash wants: the same image
    * with a different alpha block is the same image). */
  object PngCodec extends Codec {

    private val Sig: Array[Byte] =
      Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
    private val MaxRaw = 64L << 20

    /** (w, h, channels ∈ {1, 3}, channel-interleaved pixel bytes) with
      * alpha stripped and palette indices resolved. */
    private[graft] def decodePixels(bytes: Array[Byte]): Option[(Int, Int, Int, Array[Byte])] = {
      if (bytes.length < 8 + 25 || !bytes.take(8).sameElements(Sig)) return None
      def be32(off: Int): Long =
        ((bytes(off) & 0xffL) << 24) | ((bytes(off + 1) & 0xffL) << 16) |
          ((bytes(off + 2) & 0xffL) << 8) | (bytes(off + 3) & 0xffL)
      // chunk walk: IHDR first, concatenate IDATs, keep PLTE, stop at IEND
      var pos = 8
      var ihdr = -1
      var plte: Array[Byte] = null
      val idat = new java.io.ByteArrayOutputStream()
      var seenEnd = false
      while (!seenEnd) {
        if (pos + 12 > bytes.length) return None // truncated chunk header
        val len = be32(pos)
        if (len > Int.MaxValue - 12 || pos + 12 + len > bytes.length) return None
        val ctype = new String(bytes, pos + 4, 4, "US-ASCII")
        val crc = new java.util.zip.CRC32()
        crc.update(bytes, pos + 4, 4 + len.toInt)
        if (crc.getValue != be32(pos + 8 + len.toInt)) return None // corrupt
        ctype match {
          case "IHDR" => if (ihdr < 0) ihdr = pos + 8 else return None
          case "PLTE" => plte = java.util.Arrays.copyOfRange(
            bytes, pos + 8, pos + 8 + len.toInt)
          case "IDAT" => idat.write(bytes, pos + 8, len.toInt)
          case "IEND" => seenEnd = true
          case _ => // ancillary chunk — skip
        }
        pos += 12 + len.toInt
      }
      if (ihdr < 0) return None
      val w = be32(ihdr); val h = be32(ihdr + 4)
      val bitDepth = bytes(ihdr + 8) & 0xff
      val colorType = bytes(ihdr + 9) & 0xff
      val interlace = bytes(ihdr + 12) & 0xff
      // Dimension bound BEFORE any multiply: w,h are raw unsigned 32-bit
      // reads (up to 2^32-1), so stride*h can overflow Long for a crafted
      // IHDR (e.g. w=2^30, h=2^32-1, RGBA) and wrap PAST the MaxRaw cap
      // into a negative Array size. 1<<24 per side keeps every product
      // comfortably inside Long and is far above any MaxRaw-passing image.
      if (w <= 0 || h <= 0 || w > (1L << 24) || h > (1L << 24) ||
          bitDepth != 8 || interlace != 0) return None
      val bpp = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
        case _ => return None
      }
      if (colorType == 3 && plte == null) return None
      val stride = w * bpp + 1
      if (h > MaxRaw / stride) return None // division-form cap: overflow-proof
      val expected = stride * h
      if (expected > MaxRaw) return None
      val raw = new Array[Byte](expected.toInt)
      try {
        val inf = new java.util.zip.Inflater()
        try {
          inf.setInput(idat.toByteArray)
          var off = 0
          while (off < raw.length && !inf.finished()) {
            val n = inf.inflate(raw, off, raw.length - off)
            if (n == 0 && (inf.needsInput() || inf.needsDictionary())) return None
            off += n
          }
          if (off < raw.length) return None // short IDAT
        } finally inf.end()
      } catch { case _: java.util.zip.DataFormatException => return None }
      // per-row unfilter, in place (left/up neighbors are bpp-strided)
      val wi = w.toInt; val hi = h.toInt; val si = stride.toInt
      def paeth(a: Int, b: Int, c: Int): Int = {
        val p = a + b - c
        val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
        if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
      }
      var y = 0
      while (y < hi) {
        val rowOff = y * si
        val filter = raw(rowOff) & 0xff
        if (filter > 4) return None
        var i = 1
        while (i < si) {
          val x = raw(rowOff + i) & 0xff
          val a = if (i > bpp) raw(rowOff + i - bpp) & 0xff else 0
          val b = if (y > 0) raw(rowOff - si + i) & 0xff else 0
          val c = if (y > 0 && i > bpp) raw(rowOff - si + i - bpp) & 0xff else 0
          val v = filter match {
            case 0 => x
            case 1 => x + a
            case 2 => x + b
            case 3 => x + (a + b) / 2
            case 4 => x + paeth(a, b, c)
          }
          raw(rowOff + i) = (v & 0xff).toByte
          i += 1
        }
        y += 1
      }
      // convert to gray (1ch) or rgb (3ch), dropping alpha / resolving palette
      val outCh = colorType match { case 0 | 4 => 1; case _ => 3 }
      val px = new Array[Byte](wi * hi * outCh)
      var p = 0
      y = 0
      while (y < hi) {
        var x = 0
        while (x < wi) {
          val off = y * si + 1 + x * bpp
          colorType match {
            case 0 | 4 => px(p) = raw(off); p += 1
            case 2 | 6 =>
              px(p) = raw(off); px(p + 1) = raw(off + 1); px(p + 2) = raw(off + 2)
              p += 3
            case 3 =>
              val idx = (raw(off) & 0xff) * 3
              if (idx + 2 >= plte.length) return None
              px(p) = plte(idx); px(p + 1) = plte(idx + 1); px(p + 2) = plte(idx + 2)
              p += 3
          }
          x += 1
        }
        y += 1
      }
      Some((wi, hi, outCh, px))
    }

    /** Same 8-dim feature contract as [[PnmCodec.decodeImage]] (channel
      * means, 2×2 luminance quadrants, aspect), maxval 255. */
    def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
      decodePixels(bytes).map { case (w, h, ch, px) =>
        var rSum = 0L; var gSum = 0L; var bSum = 0L
        val quadLuma = new Array[Long](4)
        val quadN = new Array[Long](4)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val off = (y * w + x) * ch
            val r = px(off) & 0xff
            val g = if (ch == 3) px(off + 1) & 0xff else r
            val b = if (ch == 3) px(off + 2) & 0xff else r
            rSum += r; gSum += g; bSum += b
            val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
            quadLuma(q) += (r * 299L + g * 587L + b * 114L) / 1000L
            quadN(q) += 1
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        val m = 255f
        (w, h, Array(
          rSum.toFloat / n / m, gSum.toFloat / n / m, bSum.toFloat / n / m,
          if (quadN(0) > 0) quadLuma(0).toFloat / quadN(0) / m else 0f,
          if (quadN(1) > 0) quadLuma(1).toFloat / quadN(1) / m else 0f,
          if (quadN(2) > 0) quadLuma(2).toFloat / quadN(2) / m else 0f,
          if (quadN(3) > 0) quadLuma(3).toFloat / quadN(3) / m else 0f,
          w.toFloat / (w + h)))
      }

    /** Same integer-luminance contract as [[PnmCodec.decodeLuma]]
      * (BT.601 integer weights, floor division). */
    private[graft] def decodeLuma(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
      decodePixels(bytes).map { case (w, h, ch, px) =>
        val luma = new Array[Int](w * h)
        var i = 0
        while (i < w * h) {
          val off = i * ch
          val r = px(off) & 0xff
          val g = if (ch == 3) px(off + 1) & 0xff else r
          val b = if (ch == 3) px(off + 2) & 0xff else r
          luma(i) = ((r * 299L + g * 587L + b * 114L) / 1000L).toInt
          i += 1
        }
        (w, h, luma)
      }

    /** Minimal deterministic gray-8 encoder for fixtures and the q159
      * synthetic corpus: filter-0 scanlines in a STORED-block zlib
      * stream (no Deflater — byte-identical on every JVM forever) with
      * spec CRCs. The decoder above accepts any conformant producer;
      * this encoder exists so tests can round-trip hand-built pixels. */
    private[graft] def encodeGray(w: Int, h: Int, pixels: Array[Byte]): Array[Byte] = {
      require(pixels.length >= w * h, s"need ${w * h} pixels, got ${pixels.length}")
      val raw = new Array[Byte](h * (w + 1))
      var y = 0
      while (y < h) {
        System.arraycopy(pixels, y * w, raw, y * (w + 1) + 1, w)
        y += 1
      }
      val z = new java.io.ByteArrayOutputStream()
      z.write(0x78); z.write(0x01) // zlib header, no preset dict
      var off = 0
      while (off < raw.length || off == 0) {
        val len = math.min(65535, raw.length - off)
        val last = off + len == raw.length
        z.write(if (last) 1 else 0) // BFINAL | BTYPE=00 (stored)
        z.write(len & 0xff); z.write((len >> 8) & 0xff)
        z.write(~len & 0xff); z.write((~len >> 8) & 0xff)
        z.write(raw, off, len)
        off += len
        if (last) off = raw.length + 1 // exit (handles the empty case)
      }
      val adler = new java.util.zip.Adler32()
      adler.update(raw)
      val a = adler.getValue
      z.write(((a >> 24) & 0xff).toInt); z.write(((a >> 16) & 0xff).toInt)
      z.write(((a >> 8) & 0xff).toInt); z.write((a & 0xff).toInt)
      val out = new java.io.ByteArrayOutputStream()
      out.write(Sig, 0, Sig.length)
      def chunk(ctype: String, data: Array[Byte]): Unit = {
        def be32(v: Long): Array[Byte] = Array(
          ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
          ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
        out.write(be32(data.length.toLong), 0, 4)
        val tb = ctype.getBytes("US-ASCII")
        out.write(tb, 0, 4)
        out.write(data, 0, data.length)
        val crc = new java.util.zip.CRC32()
        crc.update(tb); crc.update(data)
        out.write(be32(crc.getValue), 0, 4)
      }
      chunk("IHDR", Array(
        ((w >> 24) & 0xff).toByte, ((w >> 16) & 0xff).toByte,
        ((w >> 8) & 0xff).toByte, (w & 0xff).toByte,
        ((h >> 24) & 0xff).toByte, ((h >> 16) & 0xff).toByte,
        ((h >> 8) & 0xff).toByte, (h & 0xff).toByte,
        8, 0, 0, 0, 0)) // depth 8, gray, deflate, adaptive, no interlace
      chunk("IDAT", z.toByteArray)
      chunk("IEND", Array.emptyByteArray)
      out.toByteArray
    }
  }

  /** Pixel-level decode across every REAL image decoder (PNM, then
    * PNG) — the perceptual-hash family's entry point; stub formats
    * yield None (a fake luminance plane must never enter a dedup hash). */
  private[graft] def decodeLumaAny(bytes: Array[Byte]): Option[(Int, Int, Array[Int])] =
    PnmCodec.decodeLuma(bytes).orElse(PngCodec.decodeLuma(bytes))

  /** Decoded audio features. */
  case class AudioFeatures(asset_id: Long, sample_rate: Int, channels: Int,
      n_frames: Long, duration_sec: Double, n_bytes: Long, feature: Array[Float])

  /** The audio codec seam: decode bytes to (sampleRate, channels,
    * nFrames, 8-dim feature), or None when the payload isn't this
    * codec's format. */
  trait AudioCodec extends Serializable {
    def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long, Array[Float])]
  }

  /** REAL decoder for canonical WAV (RIFF/WAVE, PCM format 1, 16-bit) —
    * the audio analogue of [[PnmCodec]]: zero external libraries, full
    * chunk walking (unknown chunks skipped, word-aligned, truncation-
    * safe). Features, all in [0,1]: overall RMS, peak amplitude, RMS of
    * the four temporal quarters (the audio twin of PnmCodec's 2×2 luma
    * quadrants), zero-crossing rate, and a bounded sample-rate ratio.
    * Multi-channel frames average to mono before analysis. MP3/OGG/AAC
    * plug in through the same seam on a cluster with media libs;
    * [[StubAudioCodec]] stands in for them here. */
  object WavCodec extends AudioCodec {
    def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long, Array[Float])] = {
      def str(off: Int, n: Int): String =
        if (off + n <= bytes.length) new String(bytes, off, n, "US-ASCII") else ""
      def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      def le32(off: Int): Long = (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      if (bytes.length < 44 || str(0, 4) != "RIFF" || str(8, 4) != "WAVE") return None
      var pos = 12
      var audioFormat = -1; var channels = 0; var sampleRate = 0L; var bits = 0
      var dataOff = -1; var dataLen = 0L
      var walking = true
      while (walking && pos + 8 <= bytes.length) {
        val id = str(pos, 4)
        val size = le32(pos + 4) // unsigned 32-bit as Long, always >= 0
        val body = pos + 8
        id match {
          case "fmt " if body + 16 <= bytes.length =>
            audioFormat = le16(body); channels = le16(body + 2)
            sampleRate = le32(body + 4); bits = le16(body + 14)
          case "data" =>
            dataOff = body; dataLen = math.min(size, (bytes.length - body).toLong)
          case _ => // skip LIST/INFO/etc.
        }
        // LONG arithmetic: a hostile 32-bit size would overflow an Int
        // offset into a negative position (then crash the decode instead
        // of returning None). A chunk claiming to run past the buffer
        // also ends the walk — nothing can follow it.
        val next = body.toLong + size + (size & 1L) // chunks word-aligned
        if (next <= pos || next > bytes.length) walking = false
        else pos = next.toInt
      }
      // sampleRate parses as UNSIGNED 32-bit: a hostile 0xFFFFFFFF passes
      // a <=0 check and .toInt-wraps negative downstream — cap it so the
      // never-throw-never-corrupt contract holds (192 kHz is the realistic
      // ceiling; anything above is a malformed header)
      if (audioFormat != 1 || bits != 16 || channels < 1 ||
          sampleRate <= 0 || sampleRate > 4000000L || dataOff < 0) return None
      val bytesPerFrame = 2 * channels
      val nFrames = dataLen / bytesPerFrame
      if (nFrames == 0) return None
      var sumSq = 0.0
      val quarterSq = new Array[Double](4)
      val quarterN = new Array[Long](4)
      var peak = 0
      var crossings = 0L
      var prevSign = 0
      var f = 0L
      while (f < nFrames) {
        val off = dataOff + (f * bytesPerFrame).toInt
        var acc = 0L
        var c = 0
        while (c < channels) {
          acc += le16(off + 2 * c).toShort // sign-extend
          c += 1
        }
        val mono = (acc / channels).toInt
        val a = math.abs(mono)
        if (a > peak) peak = a
        val sq = mono.toDouble * mono
        sumSq += sq
        val q = math.min(3, (f * 4 / nFrames).toInt)
        quarterSq(q) += sq; quarterN(q) += 1
        val sign = Integer.signum(mono)
        if (sign != 0) {
          if (prevSign != 0 && sign != prevSign) crossings += 1
          prevSign = sign
        }
        f += 1
      }
      val full = 32768.0
      def rms(sq: Double, n: Long): Float =
        if (n > 0) (math.sqrt(sq / n) / full).toFloat else 0f
      val feature = Array(
        rms(sumSq, nFrames),
        (peak / full).toFloat,
        rms(quarterSq(0), quarterN(0)), rms(quarterSq(1), quarterN(1)),
        rms(quarterSq(2), quarterN(2)), rms(quarterSq(3), quarterN(3)),
        if (nFrames > 1) crossings.toFloat / (nFrames - 1) else 0f,
        (sampleRate.toFloat / (sampleRate + 48000f)))
      Some((sampleRate.toInt, channels, nFrames, feature))
    }

    /** Sample-level decode for the perceptual-hash family (q164): the
      * same RIFF walk as [[decodeAudio]], returning per-temporal-window
      * INTEGER energy sums (mono-averaged squares, floor-division window
      * boundaries — bit-exact on any platform). Requires at least
      * `nWindows` frames so no window is empty. */
    private[graft] def decodeEnergyWindows(bytes: Array[Byte],
        nWindows: Int = 65): Option[Array[Long]] = {
      def str(off: Int, n: Int): String =
        if (off + n <= bytes.length) new String(bytes, off, n, "US-ASCII") else ""
      def le16(off: Int): Int = (bytes(off) & 0xff) | ((bytes(off + 1) & 0xff) << 8)
      def le32(off: Int): Long = (bytes(off) & 0xffL) | ((bytes(off + 1) & 0xffL) << 8) |
        ((bytes(off + 2) & 0xffL) << 16) | ((bytes(off + 3) & 0xffL) << 24)
      if (bytes.length < 44 || str(0, 4) != "RIFF" || str(8, 4) != "WAVE") return None
      var pos = 12
      var audioFormat = -1; var channels = 0; var sampleRate = 0L; var bits = 0
      var dataOff = -1; var dataLen = 0L
      var walking = true
      while (walking && pos + 8 <= bytes.length) {
        val id = str(pos, 4)
        val size = le32(pos + 4)
        val body = pos + 8
        id match {
          case "fmt " if body + 16 <= bytes.length =>
            audioFormat = le16(body); channels = le16(body + 2)
            sampleRate = le32(body + 4); bits = le16(body + 14)
          case "data" =>
            dataOff = body; dataLen = math.min(size, (bytes.length - body).toLong)
          case _ =>
        }
        val next = body.toLong + size + (size & 1L)
        if (next <= pos || next > bytes.length) walking = false
        else pos = next.toInt
      }
      if (audioFormat != 1 || bits != 16 || channels < 1 ||
          sampleRate <= 0 || sampleRate > 4000000L || dataOff < 0) return None
      val bytesPerFrame = 2 * channels
      val nFrames = dataLen / bytesPerFrame
      if (nFrames < nWindows) return None
      val energy = new Array[Long](nWindows)
      var f = 0L
      while (f < nFrames) {
        val off = dataOff + (f * bytesPerFrame).toInt
        var acc = 0L
        var c = 0
        while (c < channels) {
          acc += le16(off + 2 * c).toShort
          c += 1
        }
        val mono = acc / channels
        val w = math.min(nWindows - 1, (f * nWindows / nFrames).toInt)
        energy(w) += mono * mono
        f += 1
      }
      Some(energy)
    }
  }

  /** Deterministic fake audio decode for formats without a lib-free
    * decoder here (MP3/OGG/AAC) — the audio [[StubCodec]]. */
  object StubAudioCodec extends AudioCodec {
    def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long, Array[Float])] = {
      val h = java.util.Arrays.hashCode(bytes)
      val feature = Array.tabulate(8)(i =>
        (((h * 31 + i * 2654435761L) & 0xffff).toFloat) / 65535.0f)
      Some((8000 + math.abs(h % 40000), 1 + math.abs(h % 2),
        1L + bytes.length, feature))
    }
  }

  /** Production routing for audio: real WAV decode, stub elsewhere. */
  object DefaultAudioCodec extends AudioCodec {
    def decodeAudio(bytes: Array[Byte]): Option[(Int, Int, Long, Array[Float])] =
      WavCodec.decodeAudio(bytes).orElse(StubAudioCodec.decodeAudio(bytes))
  }

  /** STUB codec — deterministic fake decode keyed on content bytes, for
    * formats whose decoders need media libraries this container lacks
    * (JPEG/video). Never returns None: the deterministic fake stands
    * in so pipeline plumbing stays testable end-to-end. */
  object StubCodec extends Codec {
    def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] = {
      val h = java.util.Arrays.hashCode(bytes)
      val width = 64 + math.abs(h % 512)
      val height = 64 + math.abs((h / 512) % 512)
      val feature = Array.tabulate(8)(i =>
        (((h * 31 + i * 2654435761L) & 0xffff).toFloat) / 65535.0f)
      Some((width, height, feature))
    }
    def frameCount(bytes: Array[Byte]): Int = 1 + (bytes.length % 7)
  }

  /** Production routing: real decode where a lib-free decoder exists
    * (PNM, PNG), deterministic stub elsewhere (JPEG/video). */
  object DefaultCodec extends Codec {
    def decodeImage(bytes: Array[Byte]): Option[(Int, Int, Array[Float])] =
      PnmCodec.decodeImage(bytes)
        .orElse(PngCodec.decodeImage(bytes))
        .orElse(StubCodec.decodeImage(bytes))
  }

  /** Decode + feature-extract, batch-per-partition (the mapInPandas shape:
    * iterator-of-batches in, iterator-of-batches out — here Scala's
    * mapPartitions, which is the idiomatic JVM equivalent). */
  def imageFeatures(
      assets: Dataset[MediaAsset],
      codec: Codec = DefaultCodec): Dataset[ImageFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        codec.decodeImage(a.bytes).map { case (w, h, f) =>
          ImageFeatures(a.asset_id, w, h, a.bytes.length.toLong, f)
        }
      }
    }
  }

  /** Audio decode + feature-extract, batch-per-partition — the same
    * narrow mapPartitions shape as [[imageFeatures]]: binary payloads
    * never shuffle, only the small extracted features flow onward. */
  def audioFeatures(
      assets: Dataset[MediaAsset],
      codec: AudioCodec = DefaultAudioCodec): Dataset[AudioFeatures] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.flatMap { a =>
        codec.decodeAudio(a.bytes).map { case (sr, ch, n, f) =>
          AudioFeatures(a.asset_id, sr, ch, n, n.toDouble / sr,
            a.bytes.length.toLong, f)
        }
      }
    }
  }

  /** Frame sampling: every k-th frame of each video, frames addressed by
    * content hash (K3-compatible keys for a downstream blob store). */
  def sampleFrames(assets: Dataset[MediaAsset], everyK: Int = 2): Dataset[FrameSample] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("SHA-256")
      it.flatMap { a =>
        val n = StubCodec.frameCount(a.bytes)
        (0 until n by everyK).map { i =>
          md.reset()
          md.update(a.bytes)
          md.update(BigInt(i).toByteArray)
          FrameSample(a.asset_id, i, md.digest().map("%02x".format(_)).mkString)
        }
      }
    }
  }

  /** Oracle-checked query: binary-column plumbing over real testdata —
    * text encoded to BINARY, hashed and measured as opaque bytes (the same
    * X0/X8 path artifact bodies take). */
  def defs: Map[String, QueryDef] = Map(
    "q60_binary_columns" -> QueryDef.sql(
      """SELECT doc_id,
        |  sha256(text) AS body_sha256,
        |  octet_length(encode(text)) AS body_bytes,
        |  substring(sha256(text), 1, 2) AS blob_shard
        |FROM documents WHERE doc_id < 200 ORDER BY doc_id""") { (s, dir) =>
      Tables.documents(s, dir).filter(col("doc_id") < 200)
        .select(col("doc_id"), col("text").cast("binary").as("body"))
        .select(col("doc_id"),
          sha2(col("body"), 256).as("body_sha256"),
          octet_length(col("body")).cast("long").as("body_bytes"),
          substring(sha2(col("body"), 256), 1, 2).as("blob_shard"))
        .orderBy("doc_id")
    }
  )
}
