package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** End-to-end corpus curation: the composed pipeline a training-data run
  * would execute over the documents table — annotate → quality/language
  * filter → exact dedup → near dedup. Each stage is one of the library's
  * lazy operators; the composition stays a single Catalyst DAG until the
  * caller acts on it.
  */
object Curation {

  /** Per-document annotations, all codegen'd Column work (one scan). */
  def annotate(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("lang_guess", langIdNgram(col(textCol)))
      .withColumn("fingerprint", md5Fingerprint(col(textCol)))

  final case class Config(
      minTokens: Long = 10L,
      minQuality: Long = 20L,
      keepLangs: Seq[String] = Seq("en"),
      minhashHashes: Int = 128,
      minhashBands: Int = 32,
      nearDupJaccard: Double = 0.8)

  /** Full pipeline. Returns the surviving documents with annotations and
    * a `drop_reason` view of what was removed (for pipeline observability
    * — silent filtering is how corpora rot). */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    val annotated = annotate(docs, idCol, textCol)

    val reasons = annotated
      .withColumn("drop_reason",
        when(col("n_tokens") < cfg.minTokens, "too_short")
          .when(col("quality") < cfg.minQuality, "low_quality")
          .when(!col("lang_guess").isin(cfg.keepLangs: _*), "language"))

    // exact dedup in ONE shuffle: rank within fingerprint groups (keeper =
    // smallest id); the ranked frame feeds both the survivors and the
    // drop-report, persisted once for the downstream branches
    val ranked = reasons
      .withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("fingerprint"), col("drop_reason").isNull)
          .orderBy(col(idCol))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val passing = ranked.filter(col("drop_reason").isNull)
    val exactDeduped = passing.filter(col("__rn") === 1)
      .drop("__rn", "drop_reason")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // near dedup: drop the larger id of any candidate pair over threshold
    val nearPairs = Dedup.minhashCandidates(
      exactDeduped, idCol, textCol,
      numHashes = cfg.minhashHashes, bands = cfg.minhashBands)
      .filter(col("est_jaccard") >= cfg.nearDupJaccard)
    val nearDropIds = nearPairs.select(col("id_b").as(idCol)).distinct()
    val curated = exactDeduped.join(nearDropIds, Seq(idCol), "left_anti")

    val dropped = ranked.filter(col("drop_reason").isNotNull)
      .select(col(idCol), col("drop_reason"))
      .unionByName(
        passing.filter(col("__rn") > 1)
          .select(col(idCol), lit("exact_duplicate").as("drop_reason")))
      .unionByName(
        nearDropIds.select(col(idCol), lit("near_duplicate").as("drop_reason")))

    (curated, dropped)
  }
}
