package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL audio feature extraction over opaque binary columns — JDK-only
  * (`javax.sound.sampled`, headless-safe: parsing an AudioInputStream
  * needs no audio device), so WAV/PCM payloads get genuine features the
  * same way PNG/JPEG get genuine decode via `javax.imageio`. Compressed
  * codecs (mp3/ogg) aren't in the JDK; those bytes take the total
  * fallback row (`valid = false`), exactly mirroring the image lane's
  * FakeDecoder story.
  *
  * Features are the standard cheap audio-curation signals: per-window RMS
  * energy (silence / clipping detection), zero-crossing rate (speech vs
  * tone vs noise heuristic), duration and format metadata (sample-rate /
  * channel filters). One decoder pass per row, per-partition stage, row
  * fan-in 1:1 — at 100 TB the cost model is identical to the image lane.
  */
object AudioFeaturesStage {

  final case class AudioFeatures(
      doc_id: Long,
      valid: Boolean,
      sample_rate: Int,
      channels: Int,
      n_frames: Long,
      duration_ms: Long,
      rms_windows: Array[Float],
      zero_cross_rate: Float)

  private def invalid(id: Long, windows: Int) =
    AudioFeatures(id, valid = false, 0, 0, 0L, 0L, new Array[Float](windows), 0f)

  /** Decode one payload. Total: any unparsable/oversized/compressed input
    * returns the invalid row rather than throwing (poison bytes must
    * never kill the job). `maxBytes` bounds the decoded PCM read per row
    * (the WAV header's declared length is untrusted — same posture as the
    * image decompression-bomb guard). */
  def decode(id: Long, bytes: Array[Byte], windows: Int,
      maxBytes: Int): AudioFeatures = {
    if (bytes == null || bytes.length < 12) return invalid(id, windows)
    try {
      import javax.sound.sampled.AudioSystem
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val channels = fmt.getChannels
        val enc = fmt.getEncoding.toString
        // WAV stores 16-bit PCM signed and 8-bit PCM UNSIGNED; anything
        // else (float WAV, a-law) takes the fallback
        val ok = channels > 0 &&
          ((bits == 16 && enc == "PCM_SIGNED") ||
            (bits == 8 && enc == "PCM_UNSIGNED"))
        if (!ok) return invalid(id, windows)
        val frameSize = fmt.getFrameSize
        // frame-ALIGNED cap + manual loop: AudioInputStream.read rounds a
        // sub-frame request down and returns 0 (not -1, even at EOF), so
        // readNBytes(maxBytes) with an unaligned remainder spins forever
        val cap = maxBytes - (maxBytes % frameSize)
        if (cap < frameSize) return invalid(id, windows)
        val pcm = new Array[Byte](cap)
        var filled = 0
        var r = 1
        while (filled < cap && r > 0) {
          r = in.read(pcm, filled, cap - filled)
          if (r > 0) filled += r
        }
        val nFrames = filled / frameSize
        if (nFrames == 0) return invalid(id, windows)

        // single pass straight off the PCM buffer: O(windows) extra memory
        // (a per-row Array[Double](nFrames) would 4x the buffer again)
        val bytesPerSample = bits / 8
        val sumSq = new Array[Double](windows)
        val cnt = new Array[Int](windows)
        var crossings = 0L
        var prevNonNeg = true
        var f = 0
        var w = 0
        var wEnd = (nFrames.toLong / windows).toInt
        while (f < nFrames) {
          while (w < windows - 1 && f >= wEnd) {
            w += 1
            wEnd = ((w + 1).toLong * nFrames / windows).toInt
          }
          var acc = 0.0
          var c = 0
          while (c < channels) {
            val off = f * frameSize + c * bytesPerSample
            val v =
              if (bits == 8) ((pcm(off) & 0xff) - 128).toDouble / 128.0
              else {
                val s = if (fmt.isBigEndian) (pcm(off) << 8) | (pcm(off + 1) & 0xff)
                        else (pcm(off + 1) << 8) | (pcm(off) & 0xff)
                // 32768 (not 32767): the conventional scale, so the
                // full-scale negative sample (-32768) maps to exactly -1.0
                // and no window RMS can exceed 1.0 — downstream clipping
                // filters assume [-1, 1]
                s.toDouble / 32768.0
              }
            acc += v
            c += 1
          }
          val s = acc / channels
          sumSq(w) += s * s
          cnt(w) += 1
          val nonNeg = s >= 0
          if (f > 0 && nonNeg != prevNonNeg) crossings += 1
          prevNonNeg = nonNeg
          f += 1
        }
        val rms = new Array[Float](windows)
        var i = 0
        while (i < windows) {
          rms(i) = if (cnt(i) == 0) 0f else math.sqrt(sumSq(i) / cnt(i)).toFloat
          i += 1
        }
        val sr = fmt.getSampleRate.toInt
        AudioFeatures(id, valid = true, sr, channels, nFrames.toLong,
          (nFrames.toLong * 1000L) / math.max(sr, 1),
          rms,
          if (nFrames > 1) crossings.toFloat / (nFrames - 1) else 0f)
      } finally in.close()
    } catch {
      case _: Exception => invalid(id, windows)
    }
  }

  /** Per-partition audio feature stage over a `media` binary column
    * (see `Multimodal.withBinaryPayload`). 1:1 row fan-in, bounded
    * per-row decode (`maxBytes`), total — non-audio rows come back with
    * `valid = false` instead of failing the task. */
  def audioFeatures(
      df: DataFrame,
      idCol: String,
      windows: Int = 8,
      maxBytes: Int = 16 * 1024 * 1024): Dataset[AudioFeatures] = {
    require(windows > 0 && maxBytes > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decode(id, bytes, windows, maxBytes)
      })
  }

  // ------------------------------------------------------------------
  // Windowed FFT spectral features (pure JDK — Cooley-Tukey radix-2)
  // ------------------------------------------------------------------

  final case class SpectralFeatures(
      doc_id: Long,
      valid: Boolean,
      sample_rate: Int,
      /** per analysis window: power-weighted mean frequency (Hz) */
      centroid_hz: Array[Float],
      /** per window: geometric/arithmetic power mean — ~0 tonal, ~1 noise */
      flatness: Array[Float],
      /** per window: frequency (Hz) of the strongest non-DC bin */
      dominant_hz: Array[Float])

  private def invalidSpectral(id: Long, windows: Int) =
    SpectralFeatures(id, valid = false, 0, new Array[Float](windows),
      new Array[Float](windows), new Array[Float](windows))

  /** In-place iterative radix-2 Cooley–Tukey FFT (length must be a power
    * of two). Textbook public algorithm — no library, executor-side pure
    * math. */
  private[graft] def fftRadix2(re: Array[Double], im: Array[Double]): Unit = {
    val n = re.length
    require(n > 0 && (n & (n - 1)) == 0, "FFT length must be a power of two")
    var j = 0
    var i = 1
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = -2.0 * math.Pi / len
      val wr = math.cos(ang)
      val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cwr = 1.0
        var cwi = 0.0
        var k = 0
        val half = len >> 1
        while (k < half) {
          val ur = re(base + k); val ui = im(base + k)
          val xr = re(base + k + half); val xi = im(base + k + half)
          val vr = xr * cwr - xi * cwi
          val vi = xr * cwi + xi * cwr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + half) = ur - vr; im(base + k + half) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr
          cwr = nwr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
  }

  /** Spectral decode of one payload: same WAV parsing/guards as [[decode]],
    * then per analysis window a Hann-windowed `fftSize`-point FFT of the
    * window's leading samples (zero-padded when short). Extra memory is
    * O(fftSize), never O(signal) — samples are mixed to mono straight off
    * the PCM byte buffer. */
  def decodeSpectral(id: Long, bytes: Array[Byte], windows: Int,
      fftSize: Int, maxBytes: Int): SpectralFeatures = {
    if (bytes == null || bytes.length < 12) return invalidSpectral(id, windows)
    try {
      import javax.sound.sampled.AudioSystem
      val in = AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        val bits = fmt.getSampleSizeInBits
        val channels = fmt.getChannels
        val enc = fmt.getEncoding.toString
        val ok = channels > 0 &&
          ((bits == 16 && enc == "PCM_SIGNED") ||
            (bits == 8 && enc == "PCM_UNSIGNED"))
        if (!ok) return invalidSpectral(id, windows)
        val frameSize = fmt.getFrameSize
        val cap = maxBytes - (maxBytes % frameSize)
        if (cap < frameSize) return invalidSpectral(id, windows)
        val pcm = new Array[Byte](cap)
        var filled = 0
        var r = 1
        while (filled < cap && r > 0) {
          r = in.read(pcm, filled, cap - filled)
          if (r > 0) filled += r
        }
        val nFrames = filled / frameSize
        if (nFrames == 0) return invalidSpectral(id, windows)

        val bytesPerSample = bits / 8
        def sampleAt(f: Int): Double = {
          var acc = 0.0
          var c = 0
          while (c < channels) {
            val off = f * frameSize + c * bytesPerSample
            val v =
              if (bits == 8) ((pcm(off) & 0xff) - 128).toDouble / 128.0
              else {
                val s = if (fmt.isBigEndian) (pcm(off) << 8) | (pcm(off + 1) & 0xff)
                        else (pcm(off + 1) << 8) | (pcm(off) & 0xff)
                s.toDouble / 32768.0
              }
            acc += v
            c += 1
          }
          acc / channels
        }

        val sr = fmt.getSampleRate.toInt
        val centroid = new Array[Float](windows)
        val flat = new Array[Float](windows)
        val dominant = new Array[Float](windows)
        val re = new Array[Double](fftSize)
        val im = new Array[Double](fftSize)
        val binHz = sr.toDouble / fftSize
        var w = 0
        while (w < windows) {
          val start = (w.toLong * nFrames / windows).toInt
          val avail = math.min(fftSize, nFrames - start)
          java.util.Arrays.fill(re, 0.0)
          java.util.Arrays.fill(im, 0.0)
          var k = 0
          while (k < avail) {
            // Hann over the actual FFT frame keeps leakage bounded
            val hann = 0.5 * (1.0 - math.cos(2.0 * math.Pi * k / (fftSize - 1)))
            re(k) = sampleAt(start + k) * hann
            k += 1
          }
          fftRadix2(re, im)
          // one-sided power spectrum, DC excluded (silence offset isn't
          // spectral content)
          val half = fftSize / 2
          var sumP = 0.0
          var sumFP = 0.0
          var sumLogP = 0.0
          var maxP = -1.0
          var maxBin = 1
          var b = 1
          while (b < half) {
            val p = re(b) * re(b) + im(b) * im(b)
            sumP += p
            sumFP += b * binHz * p
            sumLogP += math.log(p + 1e-30)
            if (p > maxP) { maxP = p; maxBin = b }
            b += 1
          }
          val nBins = half - 1
          centroid(w) = if (sumP > 0) (sumFP / sumP).toFloat else 0f
          flat(w) =
            if (sumP > 0)
              (math.exp(sumLogP / nBins) / (sumP / nBins)).toFloat
            else 0f
          dominant(w) = if (maxP > 0) (maxBin * binHz).toFloat else 0f
          w += 1
        }
        SpectralFeatures(id, valid = true, sr, centroid, flat, dominant)
      } finally in.close()
    } catch {
      case _: Exception => invalidSpectral(id, windows)
    }
  }

  /** Per-partition spectral feature stage — same contract as
    * [[audioFeatures]] (1:1 fan-in, bounded per-row work, total). The
    * per-row cost is `windows` FFTs of `fftSize` points: O(windows ·
    * fftSize · log fftSize) regardless of payload length. */
  def spectralFeatures(
      df: DataFrame,
      idCol: String,
      windows: Int = 8,
      fftSize: Int = 1024,
      maxBytes: Int = 16 * 1024 * 1024): Dataset[SpectralFeatures] = {
    require(windows > 0 && maxBytes > 0)
    require(fftSize > 1 && (fftSize & (fftSize - 1)) == 0,
      "fftSize must be a power of two")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        decodeSpectral(id, bytes, windows, fftSize, maxBytes)
      })
  }
}
