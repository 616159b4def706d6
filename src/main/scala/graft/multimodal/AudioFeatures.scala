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
                s.toDouble / 32767.0
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
}
