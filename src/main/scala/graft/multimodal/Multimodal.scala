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
}
