package graft.enrich

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Enrichment pipeline: translation write-back (SURVEY M3/M4).
  *
  * The reference translates untranslated node properties en→he with a local
  * MarianMT model behind a 4-thread pool + LRU(1000) cache, then writes
  * `<prop>_he` back one node at a time (reference: `src/esco_translate.py:
  * 249-338, 340-364`). The Spark shape: filter the worklist (P2/P3),
  * `dropDuplicates` on the text (the distributed replacement for the LRU
  * cache — each distinct string is translated exactly once cluster-wide),
  * `mapPartitions` with one translator instance per partition, join back,
  * rewrite the column. Executor parallelism replaces the thread pool.
  */
trait Translator extends Serializable {
  /** Translate a batch; must be total (return input on failure, like the
    * reference's retry-then-fallback at `src/esco_translate.py:322-338`). */
  def translate(texts: Iterator[String]): Iterator[String]
}

/** Test/CI translator: deterministic tagging. */
final class IdentityTranslator(tag: String = "") extends Translator {
  override def translate(texts: Iterator[String]): Iterator[String] =
    texts.map(t => if (tag.isEmpty) t else s"$tag$t")
}

/** Dictionary-backed translator (word-for-word; unknown words pass through). */
final class DictionaryTranslator(dict: Map[String, String]) extends Translator {
  override def translate(texts: Iterator[String]): Iterator[String] =
    texts.map(_.split(" ").map(w => dict.getOrElse(w, w)).mkString(" "))
}

object Translate {

  /** Q5 decision (SURVEY M4): the reference CLI accepts property names
    * {prefLabel, altLabel, description} but two of them don't exist in
    * storage, so translating them silently matched 0 nodes. We keep the
    * CLI surface and FIX the mapping to the real columns. */
  val propertyMap: Map[String, String] = Map(
    "prefLabel" -> "preferredLabel",
    "altLabel" -> "altLabels",
    "description" -> "description")

  /** ASCII strip + whitespace normalize preprocessing (F7, reference
    * `src/esco_translate.py:259-261`). */
  def preprocess(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(trim(regexp_replace(c, "[^\\x00-\\x7F]", "")), "\\s+", " ")

  /** Translate `property` of `nodes` into `<property>_he`, only for rows
    * not yet translated (M4 worklist semantics). Returns the table with the
    * translated column added/updated — caller overwrites the warehouse
    * table (S6 write-back as a columnar rewrite, not N round-trips). */
  def translateProperty(
      nodes: DataFrame,
      property: String,
      translator: Translator,
      batchSize: Int = 100): DataFrame = {
    val colName = propertyMap.getOrElse(property, property)
    val outCol = s"${colName}_he"
    val hasOut = nodes.columns.contains(outCol)
    val base = if (hasOut) nodes else nodes.withColumn(outCol, lit(null).cast("string"))

    // worklist: value present, translation absent (P2 + P3)
    val worklist = base
      .filter(col(colName).isNotNull && col(outCol).isNull)
      .select(preprocess(col(colName)).as("__src"))
      .filter(length(col("__src")) > 0)
      .dropDuplicates("__src") // replaces the LRU cache, exactly-once per text

    val spark = nodes.sparkSession
    import spark.implicits._
    val translated = worklist.as[String].mapPartitions { it =>
      // grouped() mirrors the reference's batch size; one translator
      // instance worth of state per partition
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.zip(translator.translate(batch.iterator))
      }
    }.toDF("__src", "__dst")

    base
      .withColumn("__key", preprocess(col(colName)))
      .join(translated, col("__key") === translated("__src"), "left_outer")
      .withColumn(outCol, coalesce(col(outCol), col("__dst")))
      .drop("__src", "__dst", "__key")
  }
}
