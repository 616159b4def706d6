package graft.multimodal

import java.io.ByteArrayInputStream

import javax.imageio.ImageIO

/** Real image decoder over the JDK's bundled `javax.imageio` codecs
  * (PNG, JPEG, GIF, BMP — no external dependency, zero egress): true
  * width/height and per-channel pixel means from the decoded raster.
  *
  * Falls back to [[FakeDecoder]] for bytes no installed reader
  * understands (audio/video or corrupt payloads), keeping `decode` total
  * — a poison byte string must never kill a 100 TB job. That contract
  * includes DECOMPRESSION BOMBS: a tiny payload declaring huge
  * dimensions would allocate the w×h raster inside the decoder (an
  * OutOfMemoryError, which no `catch Exception` sees), so the header's
  * dimensions are read FIRST via the format reader and anything above
  * `maxPixels` falls back without ever allocating the raster.
  *
  * Executor-side notes: imageio readers come from a static registry and
  * are not thread-safe across calls, so one decoder instance per
  * partition ([[Multimodal.extractFeatures]]) is the right granularity;
  * disk caching is disabled (pure in-memory decode, no executor-local
  * tmp-file churn).
  *
  * @param maxPixels decode ceiling; the default (64 MPix ≈ a 256 MiB
  *                  RGBA int raster) bounds per-task decode memory */
final class ImageIODecoder(maxPixels: Long = 64L * 1000 * 1000)
    extends MediaDecoder {

  private val fallback = new FakeDecoder

  override def decode(id: Long, kind: String, bytes: Array[Byte]): MediaFeatures = {
    if (bytes == null || bytes.length == 0) return fallback.decode(id, kind, bytes)
    try {
      ImageIO.setUseCache(false) // in-memory decode, no tmp files
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return fallback.decode(id, kind, bytes) // unknown format
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          // header-only dimension read — no pixel allocation yet
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          if (w <= 0 || h <= 0 || w.toLong * h.toLong > maxPixels)
            return fallback.decode(id, kind, bytes)
          val img = reader.read(0)
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
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch {
      case _: Exception => fallback.decode(id, kind, bytes)
    }
  }
}
