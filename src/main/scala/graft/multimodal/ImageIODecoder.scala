package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Real image decoder over the JDK's bundled `javax.imageio` codecs
  * (PNG, JPEG, GIF, BMP — no external dependency, zero egress): true
  * width/height and per-channel pixel means from the decoded raster.
  *
  * Falls back to [[FakeDecoder]] for bytes no installed reader
  * understands (audio/video or corrupt payloads), keeping `decode` total
  * — a poison byte string must never kill a 100 TB job.
  *
  * Executor-side notes: `ImageIO.read` is thread-safe per call and buys
  * its readers from a static registry, so one decoder instance per
  * partition ([[Multimodal.extractFeatures]]) is the right granularity;
  * disk caching is disabled (pure in-memory decode, no executor-local
  * tmp-file churn).
  */
final class ImageIODecoder extends MediaDecoder {

  private val fallback = new FakeDecoder

  override def decode(id: Long, kind: String, bytes: Array[Byte]): MediaFeatures = {
    if (bytes == null || bytes.length == 0) return fallback.decode(id, kind, bytes)
    try {
      ImageIO.setUseCache(false) // in-memory decode, no tmp files
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) return fallback.decode(id, kind, bytes) // unknown format
      val w = img.getWidth
      val h = img.getHeight
      val raster = img.getRaster
      val nBands = raster.getNumBands
      // per-channel means over the real pixels, padded/truncated to the
      // 4-slot bandMeans contract (RGBA); absent channels report -1 so
      // grayscale vs color is distinguishable downstream
      val sums = new Array[Double](nBands)
      val sample = new Array[Int](nBands)
      var checksum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.getPixel(x, y, sample)
          var b = 0
          while (b < nBands) {
            sums(b) += sample(b)
            checksum = checksum * 31 + sample(b)
            b += 1
          }
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h.toLong
      val bandMeans = (0 until 4).map { b =>
        if (b < nBands && n > 0) (sums(b) / n).toFloat else -1f
      }.toArray
      MediaFeatures(id, kind, w, h, bytes.length.toLong, checksum, bandMeans)
    } catch {
      case _: Exception => fallback.decode(id, kind, bytes)
    }
  }
}
