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
        // JDK WAV readers yield PCM_SIGNED 8/16-bit; anything else (float
        // WAV, a-law) is rare enough to take the fallback
        if ((bits != 8 && bits != 16) || channels <= 0 ||
            fmt.getEncoding.toString != "PCM_SIGNED")
          return invalid(id, windows)
        val frameSize = fmt.getFrameSize
        val pcm = in.readNBytes(maxBytes)
        val nFrames = pcm.length / frameSize
        if (nFrames == 0) return invalid(id, windows)

        // mono-fold samples in [-1, 1]
        val samples = new Array[Double](nFrames)
        val bytesPerSample = bits / 8
        var f = 0
        while (f < nFrames) {
          var acc = 0.0
          var c = 0
          while (c < channels) {
            val off = f * frameSize + c * bytesPerSample
            val v =
              if (bits == 8) pcm(off).toDouble / 127.0
              else {
                val lo = pcm(off) & 0xff
                val hi = pcm(off + 1)
                val s = if (fmt.isBigEndian) (pcm(off) << 8) | (pcm(off + 1) & 0xff)
                        else (hi << 8) | lo
                s.toDouble / 32767.0
              }
            acc += v
            c += 1
          }
          samples(f) = acc / channels
          f += 1
        }

        val rms = new Array[Float](windows)
        var w = 0
        while (w < windows) {
          val start = (w.toLong * nFrames / windows).toInt
          val end = ((w + 1).toLong * nFrames / windows).toInt
          var s = 0.0
          var i = start
          while (i < end) { s += samples(i) * samples(i); i += 1 }
          rms(w) = if (end > start) math.sqrt(s / (end - start)).toFloat else 0f
          w += 1
        }
        var crossings = 0L
        var i = 1
        while (i < nFrames) {
          if ((samples(i) >= 0) != (samples(i - 1) >= 0)) crossings += 1
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
