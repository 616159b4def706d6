package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
      nearDupJaccard: Double = 0.8,
      /** apply `TextFunctions.normalizeText` (strip controls → NFC →
        * collapse whitespace) before annotation/fingerprinting, so
        * composed vs decomposed accent encodings of the same text dedup
        * as EXACT duplicates. Off by default: it rewrites the text
        * column, and the tx-oracle documents are already clean. */
      normalize: Boolean = false,
      /** carry the md5-derived portable MinHash family
        * ([[Dedup.minhashSigColumnPortable]]) instead of murmur — every
        * stage of the pipeline then replays bit-exactly in external SQL
        * (the cu01 oracle). Murmur stays the 100 TB default (~2× cheaper
        * hashing). */
      portableSig: Boolean = false)

  /** Full pipeline. Returns the surviving documents with annotations and
    * a `drop_reason` view of what was removed (for pipeline observability
    * — silent filtering is how corpora rot).
    *
    * The text is tokenized/shingled in ONE scan: the MinHash signature
    * (`cfg.minhashHashes` ints — small enough to carry) is computed next
    * to the annotation columns, so the near-dup stage banding-joins the
    * persisted signature instead of re-reading and re-shingling text.
    * Near-dup drops are TRANSITIVE: candidate pairs → connected-component
    * clusters → keep each cluster's min id ([[Dedup.nearDupClusters]]) —
    * pairwise dropping keeps {1,3} of a {1~5, 3~5} chain where the cluster
    * policy keeps only {1}.
    *
    * Precondition: `idCol` unique and non-null (the keeper ranking and the
    * final id-keyed payload rejoin both depend on it; NULL ids would
    * silently drop, duplicate ids fan out). Output column order: `idCol`
    * first (rejoin key), then the remaining source columns, then the
    * annotation columns. */
  def curate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      cfg: Config = Config()): (DataFrame, DataFrame) = {
    val source =
      if (cfg.normalize) docs.withColumn(textCol, normalizeText(col(textCol)))
      else docs

    // ONE text scan computes every text-derived value onto a NARROW stats
    // frame (id + 4 annotation scalars + the minhash signature — no text),
    // and only THAT is materialized: the previous shape checkpointed the
    // full annotated frame, pinning every document's text in the block
    // manager for the pipeline's lifetime. Payload columns come back with
    // one id-keyed join at the end — the same discipline as
    // Sampling.selectTopQualityShare. Measured (ScaleProof 10× corpus):
    // wall 15.3 → 11.5 s, shuffle 68.3 → 58.4 MiB, and the
    // materialization footprint drops from corpus-size to ~50 B/doc;
    // bench-scale sf0.1 is a wash (the text now moves through the final
    // join instead of the checkpoint). Precondition (documented): idCol
    // is unique and non-null, which exact-dedup ranking already assumed.
    // LAZY localCheckpoint rather than persist(): persist registers the
    // analyzed plan with the CacheManager, and every later plan BUILD in
    // the session then pays a sameResult scan against it; the checkpoint
    // cuts lineage instead of cache-matching. On a cluster swap for
    // `checkpoint(false)` to reliable storage.
    val ranked = source
      .select(
        col(idCol),
        tokenCount(col(textCol)).as("n_tokens"),
        qualityScore(col(textCol)).as("quality"),
        langIdNgram(col(textCol)).as("lang_guess"),
        md5Fingerprint(col(textCol)).as("fingerprint"),
        (if (cfg.portableSig)
          Dedup.minhashSigColumnPortable(col(textCol), cfg.minhashHashes)
        else Dedup.minhashSigColumn(col(textCol), cfg.minhashHashes))
          .as("__sig"))
      .withColumn("drop_reason",
        when(col("n_tokens") < cfg.minTokens, "too_short")
          .when(col("quality") < cfg.minQuality, "low_quality")
          .when(!col("lang_guess").isin(cfg.keepLangs: _*), "language"))
      // exact dedup in ONE shuffle: rank within fingerprint groups
      // (keeper = smallest id)
      .withColumn("__rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("fingerprint"), col("drop_reason").isNull)
          .orderBy(col(idCol))))
      .localCheckpoint(false)

    // derived from the cached `ranked` on each use
    val passing = ranked.filter(col("drop_reason").isNull)
    val exactDeduped = passing.filter(col("__rn") === 1)
      .drop("__rn", "drop_reason")

    // near dedup over the carried signature; transitive cluster resolution
    val nearPairs = Dedup.minhashCandidatesFromSigs(
      exactDeduped.select(col(idCol).as("id"), col("__sig").as("sig")),
      numHashes = cfg.minhashHashes, bands = cfg.minhashBands)
      .filter(col("est_jaccard") >= cfg.nearDupJaccard)
    val nearDropIds = Dedup.nearDupClusters(nearPairs)
      .filter(col("id") =!= col("keep_id"))
      .select(col("id").as(idCol))
    // survivors' stats, then payload (text + any other source columns)
    // rejoined by id ONCE — text moves exactly once, into the output
    val survivors = exactDeduped.join(nearDropIds, Seq(idCol), "left_anti")
      .drop("__sig")
    val curated = source.join(survivors, Seq(idCol))

    val dropped = ranked.filter(col("drop_reason").isNotNull)
      .select(col(idCol), col("drop_reason"))
      .unionByName(
        passing.filter(col("__rn") > 1)
          .select(col(idCol), lit("exact_duplicate").as("drop_reason")))
      .unionByName(
        nearDropIds.select(col(idCol), lit("near_duplicate").as("drop_reason")))

    (curated, dropped)
  }

  /** STREAMING curation: the same annotate → quality/language filter →
    * exact-dedup pipeline over an unbounded document stream.
    *
    * The annotations are pure Column work (stream-capable as-is); exact
    * dedup becomes `dropDuplicatesWithinWatermark` on the content
    * fingerprint, so duplicate state expires once the watermark passes —
    * an ever-growing corpus does not grow the state store beyond one
    * watermark-window of distinct fingerprints. A duplicate arriving
    * WITHIN the watermark of its first occurrence is dropped exactly like
    * the batch pipeline's keeper rule; one arriving later than the
    * watermark is admitted (the documented streaming relaxation — at
    * 100 TB/day the alternative is unbounded state).
    *
    * NEAR-dup dedup (LSH banding) is inherently cross-row and stays a
    * periodic BATCH compaction over the streamed-in corpus — run
    * [[curate]] over the sink on a schedule; the shared
    * fingerprint/signature columns make the compaction incremental.
    *
    * @param docs      streaming DataFrame with `idCol`, `textCol`, and
    *                  `tsCol` (event-time)
    * @param watermark how long duplicate fingerprints are remembered */
  def curateStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      tsCol: String,
      cfg: Config = Config(),
      watermark: String = "1 hour"): DataFrame =
    annotate(docs, idCol, textCol)
      // EXACTLY the batch when-chain: a row passes iff no drop branch
      // fires — null annotations skip every branch and pass, like batch;
      // a direct >= filter would silently drop the null rows instead
      .withColumn("__drop",
        when(col("n_tokens") < cfg.minTokens, "too_short")
          .when(col("quality") < cfg.minQuality, "low_quality")
          .when(!col("lang_guess").isin(cfg.keepLangs: _*), "language"))
      .filter(col("__drop").isNull)
      .drop("__drop")
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** The Gopher quality-rule battery (Rae et al. 2021, appendix A —
    * the published heuristic filter every later corpus inherits):
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio
    * (applied to '#' and '...' each SEPARATELY, as published), bullet-
    * start / ellipsis-end line fractions, alphabetic-word fraction, and
    * the stopword-presence check.
    *
    * Every threshold is evaluated by exact integer CROSS-MULTIPLICATION
    * (mean_len >= 3  ⟺  n_chars >= 3·n_words), never a float ratio —
    * so the booleans are engine-exact at any magnitude and replay in
    * plain SQL. Counters that need substring occurrences use the
    * length-difference idiom (leftmost non-overlapping, identical in
    * Spark and DuckDB). The alphabetic check is the ASCII class [a-z]
    * over the lower-cased tokens (this corpus' contract); lines split
    * on '\n', a newline-free document being one line.
    *
    * Row-local: one projection over the scan, no shuffle at any corpus
    * size — the filter composes in front of [[curate]] as a free
    * pre-pass.
    *
    * Output: (idCol, counters..., rule booleans..., keep). */
  /** The C4 blocklist gate (Raffel et al. 2020 §2.2: "removed any page
    * that contained any word on the [blocklist]") — the one C4 cleanup
    * policy the line-level pass (c401) doesn't carry, because it is
    * DOCUMENT-level: one hit anywhere drops the whole page.
    *
    * Matching contract: term-boundary on the whitespace tokenizer —
    * the document's lowercased tokens are re-joined single-spaced and
    * space-padded, and a (possibly multi-word) term hits iff
    * `" term "` is a substring. That gives exact whole-token semantics
    * for single words AND phrases with one mechanism, replayable as the
    * same contains() in any engine; punctuation-attached occurrences
    * ("word," etc.) follow the tokenizer's contract and do not match —
    * the documented boundary with C4's regex word-boundary matching.
    * Terms are normalized the same way at the driver (lowercase,
    * single-spaced); the term list is a caller-supplied POLICY input (a
    * placeholder stands in for the published LDNOOBW list here — the
    * corpus is synthetic).
    *
    * Scale: one scan, `terms.size` codegen'd contains() per row, no
    * shuffle — composes in front of [[curate]] like [[gopherRules]].
    *
    * Output: (idCol, n_hits: long — distinct terms present, keep). */
  def blocklistGate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String]): DataFrame = {
    val normed = terms.map(_.trim.toLowerCase.split("\\s+").mkString(" "))
    require(normed.nonEmpty && normed.forall(_.nonEmpty),
      "blocklistGate: terms must be non-empty")
    require(normed.distinct.size == normed.size,
      "blocklistGate: duplicate terms after normalization")
    val padded = concat(lit(" "),
      array_join(tokens(col(textCol)), " "), lit(" "))
    docs.select(col(idCol), padded.as("__padded"))
      .select(col(idCol),
        normed.map(t => when(col("__padded").contains(lit(s" $t ")), 1L)
          .otherwise(0L)).reduce(_ + _).as("n_hits"))
      .withColumn("keep", col("n_hits") === 0L)
  }

  /** The 10 exact Gopher counters over (text, token-array, line-array)
    * ATTRIBUTES — the single definition [[gopherRules]] and
    * [[withGopherKeep]] share, so the two call shapes can never drift.
    * The inputs must be attributes (aliased in a prior projection), not
    * inline trees: each counter re-references them, and an inlined
    * tokens() would re-split the text once per counter. */
  private def gopherCounterCols(
      text: Column, toks: Column, lines: Column): Seq[Column] = {
    val stops = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    Seq(
      size(filter(toks, t => length(t) > 0)).cast("long").as("n_words"),
      aggregate(toks, lit(0L), (a, x) => a + length(x)).as("n_word_chars"),
      size(filter(toks, t => t.rlike("[a-z]"))).cast("long")
        .as("n_alpha_words"),
      stops.map(s => when(array_contains(toks, s), 1L)
        .otherwise(0L)).reduce(_ + _).as("n_stop"),
      (length(text) - length(regexp_replace(text, "#", ""))).cast("long")
        .as("n_hash"),
      call_function("div",
        (length(text) - length(regexp_replace(text, "\\.\\.\\.", "")))
          .cast("long"), lit(3L)).as("n_ellipsis"),
      size(lines).cast("long").as("n_lines"),
      size(filter(lines,
        l => substring(ltrim(l), 1, 1).isin("•", "-", "*")))
        .cast("long").as("n_bullet_lines"),
      size(filter(lines,
        l => right(rtrim(l), lit(3)) === "..." ||
          right(rtrim(l), lit(1)) === "…"))
        .cast("long").as("n_ellipsis_lines"))
  }

  /** The 7 published rule verdicts over the counters, by name — `c`
    * resolves a counter name to a Column (an attribute in
    * [[gopherRules]], a struct field in [[withGopherKeep]]).
    * Per-symbol thresholds, as published (Rae et al. 2021 apply the
    * 0.1 symbol-to-word ratio to '#' and '...' SEPARATELY — a doc
    * with 6% hash + 6% ellipsis passes; a summed ratio would fail it). */
  private def gopherRuleCols(
      c: String => Column): Seq[(String, Column)] = Seq(
    "r_word_count" -> (c("n_words") >= 50L && c("n_words") <= 100000L),
    "r_mean_word_len" ->
      (c("n_word_chars") >= lit(3L) * c("n_words") &&
        c("n_word_chars") <= lit(10L) * c("n_words")),
    "r_symbol_ratio" ->
      (lit(10L) * c("n_hash") <= c("n_words") &&
        lit(10L) * c("n_ellipsis") <= c("n_words")),
    "r_bullet_lines" ->
      (lit(10L) * c("n_bullet_lines") <= lit(9L) * c("n_lines")),
    "r_ellipsis_lines" ->
      (lit(10L) * c("n_ellipsis_lines") <= lit(3L) * c("n_lines")),
    "r_alpha_words" ->
      (lit(5L) * c("n_alpha_words") >= lit(4L) * c("n_words")),
    "r_stopwords" -> (c("n_stop") >= 2L))

  def gopherRules(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val counters = docs
      .select(col(idCol), col(textCol).as("__text"),
        tokens(col(textCol)).as("__toks"),
        split(col(textCol), "\n").as("__lines"))
      .select(col(idCol) +:
        gopherCounterCols(col("__text"), col("__toks"), col("__lines")): _*)
    val withRules = gopherRuleCols(col).foldLeft(counters) {
      case (d, (name, rule)) => d.withColumn(name, rule)
    }
    withRules.withColumn("keep",
      gopherRuleCols(col).map { case (name, _) => col(name) }
        .reduce(_ && _))
  }

  /** An arbitrary frame plus [[gopherRules]]' final keep verdict as ONE
    * extra boolean column — the row-local composition for pipelines that
    * need only the verdict next to their own per-doc signals (the
    * datasheet's facts frame), without the per-doc join
    * `gopherRules(docs).select(id, keep)` would cost. Identical
    * arithmetic by construction: counters and rules come from the same
    * [[gopherCounterCols]]/[[gopherRuleCols]] definitions. The counter
    * struct is built behind attribute projections so the token/line
    * arrays split once per row, not once per counter. */
  def withGopherKeep(
      docs: DataFrame, textCol: String, keepCol: String): DataFrame =
    docs
      .withColumn("__gk_toks", tokens(col(textCol)))
      .withColumn("__gk_lines", split(col(textCol), "\n"))
      .withColumn("__gk_c", struct(gopherCounterCols(
        col(textCol), col("__gk_toks"), col("__gk_lines")): _*))
      .withColumn(keepCol,
        gopherRuleCols(n => col("__gk_c")(n)).map(_._2).reduce(_ && _))
      .drop("__gk_toks", "__gk_lines", "__gk_c")
}
