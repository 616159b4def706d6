package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns + typed metadata, with decode/feature-extraction as a
  * per-partition stage.
  *
  * The Spark-side design is real and tested: schema, partition-sized
  * batching, executor-side decoder state, feature vectors ready for the
  * similarity operators. Image decode is REAL ([[ImageIODecoder]], JDK
  * `javax.imageio` — PNG/JPEG/GIF/BMP, no external dependency); bytes no
  * reader understands (audio/video, corrupt payloads) fall back to the
  * deterministic [[FakeDecoder]] so decode stays total. A heavier codec
  * (JavaCV, TwelveMonkeys, ONNX vision encoder) implements the same
  * `MediaDecoder` trait and nothing else changes.
  */
final case class MediaMeta(kind: String, width: Int, height: Int, sizeBytes: Long)

final case class MediaFeatures(
    doc_id: Long,
    kind: String,
    width: Int,
    height: Int,
    sizeBytes: Long,
    checksum: Long,
    bandMeans: Array[Float])

trait MediaDecoder extends Serializable {
  /** Decode raw bytes → (metadata, feature vector). Must be total. */
  def decode(id: Long, kind: String, bytes: Array[Byte]): MediaFeatures
}

/** Deterministic stand-in decoder: metadata derived from a fake 16-byte
  * header, "band means" = mean byte value over 4 stripes. Stable across
  * runs/JVMs so tests can golden-check. */
final class FakeDecoder extends MediaDecoder {
  override def decode(id: Long, kind: String, bytes: Array[Byte]): MediaFeatures = {
    val w = if (bytes.length >= 2) ((bytes(0) & 0x7f) << 4 | (bytes(1) & 0x0f)) + 16 else 16
    val h = if (bytes.length >= 4) ((bytes(2) & 0x7f) << 4 | (bytes(3) & 0x0f)) + 16 else 16
    var sum = 0L
    val bands = new Array[Long](4)
    val counts = new Array[Long](4)
    var i = 0
    while (i < bytes.length) {
      val v = bytes(i) & 0xff
      sum = sum * 31 + v
      val band = (i * 4) / math.max(bytes.length, 1)
      bands(band) += v
      counts(band) += 1
      i += 1
    }
    MediaFeatures(id, kind, w, h, bytes.length.toLong, sum,
      (0 until 4).map(b =>
        if (counts(b) == 0) 0f else (bands(b).toDouble / counts(b)).toFloat).toArray)
  }
}

object Multimodal {

  /** Attach a binary payload column (here: utf-8 of a text column — the
    * test stand-in for real image bytes) plus a media kind. */
  def withBinaryPayload(df: DataFrame, textCol: String, kind: String): DataFrame =
    df.withColumn("media", col(textCol).cast("binary"))
      .withColumn("media_kind", lit(kind))

  /** Feature extraction as a partition-wise stage: one decoder instance
    * per partition (heavyweight codec/model state), rows streamed through
    * it — the Scala analog of `mapInPandas` batch processing. */
  def extractFeatures(
      df: DataFrame, idCol: String, decoder: MediaDecoder): Dataset[MediaFeatures] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media_kind"), col("media"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // decoder allocated once per partition, reused across rows
        it.map { case (id, kind, bytes) =>
          decoder.decode(id, kind, if (bytes == null) Array.empty else bytes)
        }
      }
  }

  /** Full pipeline: payload → features → similarity-ready embedding table.
    * Default decoder tries real image decode first, falls back to the
    * deterministic stub for non-image bytes. */
  def featureTable(df: DataFrame, idCol: String, textCol: String,
      kind: String, decoder: MediaDecoder = new ImageIODecoder): DataFrame =
    extractFeatures(withBinaryPayload(df, textCol, kind), idCol, decoder)
      .toDF()

  /** One resized image row: payload re-encoded as PNG when scaling was
    * needed, passed through untouched otherwise. */
  final case class ResizedMedia(
      doc_id: Long, media: Array[Byte], width: Int, height: Int,
      resized: Boolean)

  /** Bounded-dimension image RESIZE as a per-partition stage (REAL —
    * JDK `Graphics2D` bilinear scaling + PNG re-encode, no external
    * dependency): any decodable image whose longer side exceeds `maxDim`
    * is scaled down aspect-preserving; smaller images and non-image
    * bytes pass through byte-identical with `resized = false`. Never
    * upscales. The decompression-bomb guard applies — payloads declaring
    * more than `maxPixels` are passed through undecoded rather than
    * allocated. This is the normalize-before-training shape: bound the
    * pixel count per sample without losing aspect ratio. */
  def resizeImages(
      df: DataFrame,
      idCol: String,
      maxDim: Int,
      maxPixels: Long = 64L * 1000 * 1000): Dataset[ResizedMedia] = {
    require(maxDim > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
          ResizeSupport.resize(id, bytes, maxDim, maxPixels)
        }
      }
  }

  /** One sampled frame: ordinal + payload. */
  final case class SampledFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Per-document frame extraction for video payloads. The codec lives
    * behind this trait; the shipped default is the REAL
    * [[MjpegAviFrameSampler]] (MJPEG-in-AVI needs only RIFF parsing +
    * the JDK JPEG decoder — no codec jar). Other codecs (H.264/VP9)
    * implement the same trait with a real decoder and nothing else
    * changes. */
  trait FrameSampler extends Serializable {
    /** Sample up to `n` frames from one payload. Must be total. */
    def sample(id: Long, bytes: Array[Byte], n: Int): Iterator[(Int, Array[Byte])]
  }

  /** Frame sampling as a per-partition flatMap: one sampler instance per
    * partition (codec state is heavyweight), one output row per sampled
    * frame — the row fan-out is bounded by `framesPerDoc`, so output
    * size is predictable at 100 TB (n × docs rows, never unbounded). */
  def sampleFrames(
      df: DataFrame,
      idCol: String,
      framesPerDoc: Int,
      sampler: FrameSampler = new MjpegAviFrameSampler): Dataset[SampledFrame] = {
    require(framesPerDoc > 0)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
          sampler.sample(id, bytes, framesPerDoc)
            .map { case (idx, frame) => SampledFrame(id, idx, frame) }
        }
      }
  }
}

/** JDK-only image scaling, shared by [[Multimodal.resizeImages]]. */
private[multimodal] object ResizeSupport {
  import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
  import javax.imageio.ImageIO

  def resize(
      id: Long, bytes: Array[Byte], maxDim: Int, maxPixels: Long): Multimodal.ResizedMedia = {
    def passthrough(w: Int, h: Int) =
      Multimodal.ResizedMedia(id, bytes, w, h, resized = false)
    if (bytes.isEmpty) return passthrough(0, 0)
    try {
      ImageIO.setUseCache(false)
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) return passthrough(0, 0)
        val reader = readers.next()
        try {
          reader.setInput(iis, true, true)
          val w = reader.getWidth(0)
          val h = reader.getHeight(0)
          // bomb guard: never allocate a raster above the pixel ceiling
          if (w <= 0 || h <= 0 || w.toLong * h.toLong > maxPixels)
            return passthrough(w, h)
          if (math.max(w, h) <= maxDim) return passthrough(w, h) // never upscale
          val scale = maxDim.toDouble / math.max(w, h)
          val nw = math.max(1, math.round(w * scale).toInt)
          val nh = math.max(1, math.round(h * scale).toInt)
          val src = reader.read(0)
          // pick the canvas from the source: an RGB canvas would silently
          // composite RGBA/paletted transparency onto black — lossy beyond
          // the documented downscale (PNG round-trips both types)
          val dstType =
            if (src.getColorModel.hasAlpha)
              java.awt.image.BufferedImage.TYPE_INT_ARGB
            else java.awt.image.BufferedImage.TYPE_INT_RGB
          val dst = new java.awt.image.BufferedImage(nw, nh, dstType)
          val g = dst.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(src, 0, 0, nw, nh, null)
          } finally g.dispose()
          val out = new ByteArrayOutputStream()
          ImageIO.write(dst, "png", out)
          Multimodal.ResizedMedia(id, out.toByteArray, nw, nh, resized = true)
        } finally reader.dispose()
      } finally if (iis != null) iis.close()
    } catch {
      case _: Exception => passthrough(0, 0)
    }
  }
}
