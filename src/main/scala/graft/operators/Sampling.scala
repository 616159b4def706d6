package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Deterministic sampling and dataset splitting for training pipelines.
  *
  * `df.sample()` / `rand()` are the wrong tools for ML data work: a rerun
  * (task retry, next pipeline run, another team's job over the same
  * corpus) must land every document in the SAME split, or eval sets leak
  * into training. The standard fix is content-addressed assignment: hash a
  * stable id with a salt and cut the hash space by the split weights.
  * Changing the salt produces a fresh independent assignment; keeping it
  * reproduces the old one exactly — on any engine, any partitioning, any
  * cluster size.
  *
  * All assignment here is md5-based: fully portable (every engine hashes
  * identical bytes to identical hex), and map-side only — `hashSplit` and
  * `sampleFraction` add ZERO shuffles at any scale.
  */
object Sampling {

  /** First 8 hex chars of md5(id-salt): a uniform draw from [0, 2^32) in
    * lexicographic order (fixed-width lowercase hex compares like the
    * number it encodes). A null id fails fast: every silent option is a
    * trap (all nulls share one hash, so they'd co-move into one split,
    * hog the top groupSample ranks, or vanish from sampleFraction —
    * each wrong in a different way). */
  private def hashHex(idCol: Column, salt: String): Column =
    when(idCol.isNull, raise_error(lit(
      "Sampling: null id — content-addressed sampling requires non-null ids")))
    .otherwise(substring(
      md5(concat(idCol.cast("string"), lit("-" + salt)).cast("binary")), 1, 8))

  /** 8-hex-char threshold for a cumulative weight in [0, 1]. A weight of
    * 1.0 returns "g", which sorts above every hex string — `h < "g"` keeps
    * ALL rows (capping at "ffffffff" would drop the 2^-32 sliver hashing
    * exactly there). */
  private def thresholdHex(cum: Double): String =
    if (cum >= 1.0) "g"
    else f"${(cum * 4294967296.0).toLong}%08x"

  /** Deterministic train/val/test-style split. Appends `splitCol` with the
    * name of the bucket each row's salted id-hash falls into; weights are
    * normalized. Map-side only — no shuffle, no RNG, stable under retries
    * and across engines.
    */
  def hashSplit(
      df: DataFrame,
      idCol: String,
      salt: String,
      weights: Seq[(String, Double)],
      splitCol: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be non-empty and positive")
    require(weights.map(_._1).distinct.size == weights.size,
      "split names must be distinct")
    val total = weights.map(_._2).sum
    val cums = weights.scanLeft(0.0)(_ + _._2 / total).tail
    val h = hashHex(col(idCol), salt)
    // chained when(): h < t1 -> name1, h < t2 -> name2, ..., else last
    val assigned = weights.init.zip(cums.init).foldLeft(
        when(lit(false), lit(null).cast("string"))) {
      case (acc, ((name, _), cum)) =>
        acc.when(h < lit(thresholdHex(cum)), lit(name))
    }.otherwise(lit(weights.last._1))
    df.withColumn(splitCol, assigned)
  }

  /** Leakage-safe train/val/test split: a [[hashSplit]] keyed by each
    * document's NEAR-DUP CLUSTER REPRESENTATIVE instead of its own id,
    * so near-duplicates can never straddle train and test — the classic
    * eval-contamination hole in hash-splitting a deduplicated-but-not-
    * perfectly corpus (a doc and its 0.9-Jaccard variant land in
    * different splits 2·p·(1−p) of the time under a plain id hash).
    *
    * Composition, not new machinery: [[graft.operators.Dedup.nearDupResolve]]
    * (LSH candidates → exact-Jaccard confirm → transitive clusters)
    * yields (id, keep_id); every clustered doc takes its cluster's min-id
    * survivor as split key, unclustered docs their own id. The cluster
    * map is bounded by confirmed pairs — tiny next to the corpus — so it
    * broadcasts; the split itself stays map-side. Output: input columns +
    * `rep_id` (the split key, for audit) + `splitCol`. */
  def leakageSafeSplit(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      salt: String,
      weights: Seq[(String, Double)],
      threshold: Double = 0.8,
      nGram: Int = 3,
      numHashes: Int = 64,
      bands: Int = 16,
      maxBucketSize: Int = 1000,
      portable: Boolean = false,
      splitCol: String = "split"): DataFrame = {
    val reserved = Seq("graft_rep", "keep_id", "rep_id", splitCol)
    require(!reserved.exists(docs.columns.contains),
      s"input already has one of ${reserved.mkString("/")}")
    val reps = Dedup.nearDupResolve(docs, idCol, textCol, threshold,
        nGram, numHashes, bands, maxBucketSize, portable)
      .select(col("id").as(idCol), col("keep_id"))
    val withRep = docs
      .join(broadcast(reps), Seq(idCol), "left")
      .withColumn("graft_rep", coalesce(col("keep_id"), col(idCol)))
      .drop("keep_id")
    hashSplit(withRep, "graft_rep", salt, weights, splitCol)
      .withColumnRenamed("graft_rep", "rep_id")
  }

  /** Keep a deterministic `fraction` of rows by salted id-hash. Same
    * content-addressed guarantee as `hashSplit`; a row's fate depends only
    * on (id, salt). Fractions compose: sampleFraction(0.5) of
    * sampleFraction(0.5) with DIFFERENT salts is an unbiased 0.25. */
  def sampleFraction(
      df: DataFrame,
      idCol: String,
      salt: String,
      fraction: Double): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    df.filter(hashHex(col(idCol), salt) < lit(thresholdHex(fraction)))
  }

  /** Deterministic stratified sampling: a different keep-fraction per
    * stratum value (`df.stat.sampleBy` without the RNG). Strata not listed
    * in `fractions` are dropped — and a NULL stratum can never be listed,
    * so null-stratum rows are always dropped too (coalesce the column
    * first if they should survive). The stratum is compared via its
    * cast-to-string rendering, the same keys `balancedFractions` emits —
    * comparing the raw column to a string literal would go through
    * Spark's numeric widening, under which float strata like 0.1f never
    * equal their own rendering. Same content-addressed guarantee as
    * `sampleFraction`, and still map-side only — the stratum threshold is
    * a chained when() on the stratum column, not a join. */
  def sampleByStratum(
      df: DataFrame,
      idCol: String,
      stratumCol: String,
      fractions: Map[String, Double],
      salt: String): DataFrame = {
    require(fractions.nonEmpty, "fractions must be non-empty")
    require(fractions.values.forall(f => f >= 0.0 && f <= 1.0),
      "fractions must be in [0,1]")
    val h = hashHex(col(idCol), salt)
    val s = col(stratumCol).cast("string")
    val threshold = fractions.tail.foldLeft(
        when(s === lit(fractions.head._1),
          lit(thresholdHex(fractions.head._2)))) {
      case (acc, (stratum, f)) =>
        acc.when(s === lit(stratum), lit(thresholdHex(f)))
    } // unlisted/null strata: null threshold, h < null is null -> dropped
    df.filter(h < threshold)
  }

  /** Per-stratum fractions that downsample every stratum toward
    * `targetPerStratum` rows (strata already at or under target keep
    * fraction 1.0) — the class-balancing companion to `sampleByStratum`:
    *
    * {{{
    * val fr = Sampling.balancedFractions(docs, "lang", 100000)
    * val balanced = Sampling.sampleByStratum(docs, "doc_id", "lang", fr, "v1")
    * }}}
    *
    * One count aggregation; the returned map is driver-side (stratum
    * cardinality must be driver-sized, which class labels are). Keys are
    * the strata's cast-to-string renderings — exactly what
    * `sampleByStratum` matches on. NULL strata are excluded (a map can't
    * key them and `sampleByStratum` drops them regardless — coalesce
    * first to keep them). Expected kept rows per stratum = target (hash
    * sampling is binomial around it, not exact — for exact-n use
    * `groupSample`). */
  def balancedFractions(
      df: DataFrame,
      stratumCol: String,
      targetPerStratum: Long): Map[String, Double] = {
    require(targetPerStratum > 0, "targetPerStratum must be positive")
    df.groupBy(col(stratumCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .collect()
      .flatMap { r =>
        Option(r.getAs[String]("__s")).map { s =>
          s -> math.min(1.0, targetPerStratum.toDouble / r.getAs[Long]("__n"))
        }
      }.toMap
  }

  /** Deterministic per-group sample: the `n` rows of each group with the
    * smallest salted id-hash (ties broken by id). A rank window, so one
    * shuffle on `groupCol` with a per-partition sort.
    *
    * Scale: for huge groups and small `n`, pre-filter with
    * `preFilterFraction` — rows hash-filtered BEFORE the rank shuffle (the
    * same hash orders and filters, so the top-n by hash is unchanged as
    * long as each group keeps >= n survivors; a fraction of f keeps the
    * result exact whenever every group has >= n rows below the f
    * threshold — size the fraction so f * minGroupSize >> n).
    */
  def groupSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      n: Int,
      salt: String,
      preFilterFraction: Double = 1.0): DataFrame = {
    require(n > 0, "n must be positive")
    require(!df.columns.contains("sample_rank"),
      "input already has a sample_rank column")
    val h = hashHex(col(idCol), salt)
    val pre =
      if (preFilterFraction >= 1.0) df
      else df.filter(h < lit(thresholdHex(preFilterFraction)))
    val w = Window.partitionBy(col(groupCol)).orderBy(h.asc, col(idCol).asc)
    pre.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= n)
  }

  // ------------------------------------------------------------------
  // Mixture sampling: per-source token budgets
  // ------------------------------------------------------------------

  /** Non-empty-token count of the lower-cased whitespace tokenization —
    * the SAME counter [[graft.operators.CorpusStats.mixtureWeights]]
    * aggregates, so a mixture measured there and sampled here uses one
    * definition of "token". */
  private def ntokens(textCol: Column): Column =
    size(filter(graft.functions.TextFunctions.tokens(textCol),
      t => length(t) > 0)).cast("long")

  /** Deterministic mixture sampling — the SELECTION half of data mixing
    * ([[graft.operators.CorpusStats.mixtureWeights]] is the measurement
    * half). Per group, keeps documents in salted-hash order until the
    * group's token budget is filled: the greedy maximal prefix whose
    * running token total stays <= the budget (a uniform, reproducible,
    * content-addressed sample — rerun, engine, and partitioning
    * invariant, like everything in [[Sampling]]).
    *
    * Scale shape: the naive formulation is one running-sum window per
    * group — an ENTIRE source through one task, the classic
    * window-skew trap at 100 TB. Instead the hash space is cut into
    * 4096 ordered slices (first 3 hex chars): per-(group, slice) token
    * subtotals (partial-aggregated groupBy; 4096 rows per group) locate
    * the boundary slice, slices wholly under budget are kept with NO
    * window at all (broadcast semi-join), and only the boundary
    * slice's documents — 1/4096th of the group — pay the fine-grained
    * running sum. Equivalence to the naive prefix is spec-pinned.
    *
    * `budgets`: (groupCol, token_budget) — one row per group; groups
    * without a budget row are dropped (mixtures are explicit opt-in
    * tables in practice). Output: input columns + `n_tokens`. */
  /** The MIXTURE SOLVER — produces the `budgets` frame [[mixtureSample]]
    * / [[mixtureSampleWithRepetition]] consume, from target proportions:
    * the largest total token count `T` satisfiable at EXACTLY the target
    * shares given what each source holds,
    * `T = min_s floor(tokens_s · maxEpochs · 10^6 / w_s)`, then
    * `budget_s = floor(w_s · T / 10^6)` — the data-mixing arithmetic
    * behind every published mixture table (LLaMA/Gopher-style weighted
    * corpora; `maxEpochs > 1` allows upsampling scarce sources by
    * repetition, the DoReMi/LLaMA regime).
    *
    * Weights are EXACT micro-shares (caller-normalized, must sum to
    * 10^6) so the solve replays bit-for-bit. The per-source token
    * totals are one group-domain aggregation; the solve itself runs on
    * the collected group table — bounded by the SOURCE domain, which is
    * the output's own size — in BigInt (no 2^63 cliff at 10^13-token
    * sources). Sources in the corpus but not in `weightsMicro` get
    * weight 0 / budget 0 (surfaced, not silently dropped); a named
    * source with NO corpus tokens zeroes every budget — hard
    * proportions are unsatisfiable without it, and a loud all-zero
    * table beats a silently re-normalized mixture.
    *
    * Output: (groupCol, n_tokens, weight_micro, token_budget), one row
    * per source in the union of corpus and weight names, ordered by
    * source. */
  def mixtureBudgets(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      weightsMicro: Seq[(String, Long)],
      maxEpochs: Int = 1): DataFrame = {
    require(weightsMicro.nonEmpty, "weightsMicro must be non-empty")
    require(weightsMicro.map(_._1).distinct.size == weightsMicro.size,
      "duplicate source names in weightsMicro")
    require(weightsMicro.forall(_._2 > 0L),
      "weights must be positive micro-shares")
    require(weightsMicro.map(_._2).sum == 1000000L,
      s"micro-shares must sum to 1000000, got ${weightsMicro.map(_._2).sum}")
    require(maxEpochs >= 1, s"maxEpochs=$maxEpochs")
    val spark = docs.sparkSession
    import spark.implicits._
    // group-domain aggregation; the collect is the output's own size.
    // A null source label raises descriptively (the corpusDiff
    // convention) — it would otherwise NPE in the driver solve, and a
    // null-labeled source is a data bug worth naming
    val tokens = docs
      .groupBy(
        when(col(groupCol).isNull, raise_error(lit(
          s"mixtureBudgets: null $groupCol — every document must carry " +
            "a non-null source label to participate in a mixture")))
          .otherwise(col(groupCol).cast("string")).as("__g"))
      .agg(coalesce(sum(ntokens(col(textCol))), lit(0L)).as("__nt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val w = weightsMicro.toMap
    val t: BigInt = weightsMicro.map { case (g, wm) =>
      BigInt(tokens.getOrElse(g, 0L)) * maxEpochs * 1000000L / wm
    }.min
    val names = (tokens.keySet ++ w.keySet).toSeq.sorted
    names.map { g =>
      val wm = w.getOrElse(g, 0L)
      (g, tokens.getOrElse(g, 0L), wm, (BigInt(wm) * t / 1000000L).toLong)
    }.toDF(groupCol, "n_tokens", "weight_micro", "token_budget")
  }

  def mixtureSample(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      budgets: DataFrame,
      salt: String = "mix"): DataFrame = {
    val reserved = Seq("graft_hh", "graft_bkt", "graft_nt", "graft_bt",
      "graft_pre", "graft_cum", "n_tokens")
    require(!reserved.exists(docs.columns.contains),
      s"input already has one of ${reserved.mkString("/")}")
    require(budgets.columns.toSeq.sorted == Seq(groupCol, "token_budget").sorted,
      s"budgets must have exactly ($groupCol, token_budget) columns")
    val base = docs
      .withColumn("graft_hh", hashHex(col(idCol), salt))
      .withColumn("graft_bkt", substring(col("graft_hh"), 1, 3))
      .withColumn("graft_nt", ntokens(col(textCol)))
    val wb = Window.partitionBy(col(groupCol)).orderBy(col("graft_bkt"))
    val bpre = base
      .groupBy(col(groupCol), col("graft_bkt"))
      .agg(sum(col("graft_nt")).as("graft_bt"))
      .withColumn("graft_pre",
        sum(col("graft_bt")).over(wb) - col("graft_bt"))
      .join(broadcast(budgets), Seq(groupCol))
    val keepWhole = bpre
      .filter(col("graft_pre") + col("graft_bt") <= col("token_budget"))
      .select(col(groupCol), col("graft_bkt"))
    val boundary = bpre
      .filter(col("graft_pre") <= col("token_budget")
        && col("graft_pre") + col("graft_bt") > col("token_budget"))
      .select(col(groupCol), col("graft_bkt"), col("graft_pre"),
        col("token_budget"))
    val wf = Window.partitionBy(col(groupCol), col("graft_bkt"))
      .orderBy(col("graft_hh").asc, col(idCol).asc)
    val keptBoundary = base
      .join(broadcast(boundary), Seq(groupCol, "graft_bkt"))
      .withColumn("graft_cum", sum(col("graft_nt")).over(wf))
      .filter(col("graft_pre") + col("graft_cum") <= col("token_budget"))
      .drop("graft_pre", "token_budget", "graft_cum")
    base.join(broadcast(keepWhole), Seq(groupCol, "graft_bkt"), "left_semi")
      .unionByName(keptBoundary)
      .withColumnRenamed("graft_nt", "n_tokens")
      .drop("graft_hh", "graft_bkt")
  }

  /** [[mixtureSample]] extended with EPOCH REPETITION — the regime where
    * a source's token budget EXCEEDS its token mass, so the mixture
    * upsamples by repeating the source (LLaMA/DoReMi-style "seen for 2.3
    * epochs"). Per group with total tokens T and budget B:
    * `e = div(B, T)` full passes (every document emitted with `epoch`
    * 0..e−1) plus the greedy salted-hash prefix filling the residual
    * `B − e·T` tokens at `epoch = e` — all integer arithmetic, so the
    * cut is exact in any engine. `B <= T` degenerates to
    * [[mixtureSample]] with an `epoch = 0` column; a zero-token group
    * takes e = 0 and passes whole (same convention as mixtureSample).
    *
    * Scale shape: group totals are a tiny broadcast frame; full epochs
    * are a map-side `explode(sequence)` — no shuffle; the residual
    * prefix reuses mixtureSample's two-level slice plan. Output: input
    * columns + `n_tokens` + `epoch`. Output token mass per group is
    * within one document below B. */
  def mixtureSampleWithRepetition(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      budgets: DataFrame,
      salt: String = "mix"): DataFrame = {
    val reserved = Seq("graft_gt", "graft_e", "graft_r", "epoch")
    require(!reserved.exists(docs.columns.contains),
      s"input already has one of ${reserved.mkString("/")}")
    require(budgets.columns.toSeq.sorted == Seq(groupCol, "token_budget").sorted,
      s"budgets must have exactly ($groupCol, token_budget) columns")
    val nt = docs.withColumn("graft_nt", ntokens(col(textCol)))
    val eb = nt
      .groupBy(col(groupCol)).agg(sum(col("graft_nt")).as("graft_gt"))
      .join(budgets, Seq(groupCol))
      .withColumn("graft_e",
        when(col("graft_gt") <= 0L, lit(0L))
          .otherwise(greatest(lit(0L),
            call_function("div", col("token_budget"), col("graft_gt")))))
      .withColumn("graft_r",
        col("token_budget") - col("graft_e") * col("graft_gt"))
    val full = nt
      .join(broadcast(eb.filter(col("graft_e") > 0L)
        .select(col(groupCol), col("graft_e"))), Seq(groupCol))
      .withColumn("epoch", explode(sequence(lit(0L), col("graft_e") - 1L)))
      .drop("graft_e")
      .withColumnRenamed("graft_nt", "n_tokens")
    val resid = mixtureSample(docs, idCol, textCol, groupCol,
        eb.select(col(groupCol), col("graft_r").as("token_budget")), salt)
      .join(broadcast(eb.select(col(groupCol), col("graft_e"))), Seq(groupCol))
      .withColumn("epoch", col("graft_e"))
      .drop("graft_e")
    full.unionByName(resid)
  }

  /** The naive formulation of [[mixtureSampleWithRepetition]] — one
    * running-sum window per group, epochs via a row-count sequence;
    * semantically identical (spec-pinned); the oracle-replay shape. */
  private[graft] def mixtureSampleWithRepetitionNaive(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      budgets: DataFrame,
      salt: String = "mix"): DataFrame = {
    val wc = Window.partitionBy(col(groupCol))
      .orderBy(hashHex(col(idCol), salt).asc, col(idCol).asc)
    val wg = Window.partitionBy(col(groupCol))
    docs
      .withColumn("graft_nt", ntokens(col(textCol)))
      .withColumn("graft_cum", sum(col("graft_nt")).over(wc))
      .withColumn("graft_gt", sum(col("graft_nt")).over(wg))
      .join(broadcast(budgets), Seq(groupCol))
      .withColumn("graft_e",
        when(col("graft_gt") <= 0L, lit(0L))
          .otherwise(greatest(lit(0L),
            call_function("div", col("token_budget"), col("graft_gt")))))
      .withColumn("graft_r",
        col("token_budget") - col("graft_e") * col("graft_gt"))
      .withColumn("epoch", explode(sequence(lit(0L), col("graft_e"))))
      .filter(col("epoch") < col("graft_e") || col("graft_cum") <= col("graft_r"))
      .withColumnRenamed("graft_nt", "n_tokens")
      .drop("graft_cum", "graft_gt", "graft_e", "graft_r", "token_budget")
  }

  /** The naive single-window formulation of [[mixtureSample]] — one
    * running sum per group, each group through one task. Semantically
    * identical (the spec pins it); here as the equivalence reference
    * and for small corpora where the two-level plan's extra stages
    * cost more than they save. */
  private[graft] def mixtureSampleNaive(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      groupCol: String,
      budgets: DataFrame,
      salt: String = "mix"): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(hashHex(col(idCol), salt).asc, col(idCol).asc)
    docs
      .withColumn("graft_nt", ntokens(col(textCol)))
      .withColumn("graft_cum", sum(col("graft_nt")).over(w))
      .join(broadcast(budgets), Seq(groupCol))
      .filter(col("graft_cum") <= col("token_budget"))
      .withColumnRenamed("graft_nt", "n_tokens")
      .drop("graft_cum", "token_budget")
  }

  /** Deterministic balanced-token SHARDING for training-data writes.
    * Assigns each document a shard in [0, nShards) such that (a) the
    * assignment is content-addressed — salted-hash order, so it is
    * rerun/engine/partitioning invariant AND doubles as a reproducible
    * global shuffle of the corpus — and (b) shards carry equal token
    * mass to within one document:
    * `shard = floor(tokens_before * nShards / total_tokens)` along the
    * hash order (all integer arithmetic — exact in any engine). A
    * writer then `.partitionBy("shard")`s to get nShards ≈equal-token
    * training files with a stable within-shard order ((hash, id)).
    *
    * Scale shape: the naive formulation is ONE global running-sum
    * window — the whole corpus through a single task. Instead, the same
    * two-level plan as [[mixtureSample]]: 4096 hash slices (first 3 hex
    * chars), per-slice token subtotals prefix-summed on the tiny
    * 4096-row frame (broadcast back), and each document pays only a
    * within-slice window — 4096-way parallel, 1/4096th of the corpus
    * per task. Two-level ≡ naive is spec-pinned (the slice key is a
    * prefix of the hash, so (slice, hash, id) order IS (hash, id)
    * order).
    *
    * Bound: needs `total_tokens * nShards < 2^63` — at 10^14 corpus
    * tokens that still allows ~90k shards. Output: input columns +
    * `n_tokens` + `shard`. */
  def shardByTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int,
      salt: String = "shard"): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val reserved = Seq("graft_hh", "graft_bkt", "graft_nt", "graft_bt",
      "graft_pre", "graft_cum", "graft_tot", "n_tokens", "shard")
    require(!reserved.exists(docs.columns.contains),
      s"input already has one of ${reserved.mkString("/")}")
    val base = docs
      .withColumn("graft_hh", hashHex(col(idCol), salt))
      .withColumn("graft_bkt", substring(col("graft_hh"), 1, 3))
      .withColumn("graft_nt", ntokens(col(textCol)))
    // per-slice subtotals: ≤4096 rows, so the orderBy window's single
    // task is trivially small; exclusive prefix = slice's global offset
    val slices = base
      .groupBy(col("graft_bkt"))
      .agg(sum(col("graft_nt")).as("graft_bt"))
      .withColumn("graft_pre",
        coalesce(sum(col("graft_bt")).over(
          Window.orderBy(col("graft_bkt"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("graft_bkt"), col("graft_pre"))
    val tot = base.agg(sum(col("graft_nt")).as("graft_tot"))
    val wf = Window.partitionBy(col("graft_bkt"))
      .orderBy(col("graft_hh").asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    base
      .join(broadcast(slices), Seq("graft_bkt"))
      .crossJoin(broadcast(tot))
      .withColumn("graft_cum",
        col("graft_pre") + coalesce(sum(col("graft_nt")).over(wf), lit(0L)))
      .withColumn("shard",
        when(col("graft_tot") <= 0L, lit(0))
          .otherwise(least(lit(nShards - 1),
            call_function("div", col("graft_cum") * nShards, col("graft_tot"))
              .cast("int"))))
      .withColumnRenamed("graft_nt", "n_tokens")
      .drop("graft_hh", "graft_bkt", "graft_pre", "graft_cum", "graft_tot")
  }

  /** FineWeb-style quality-threshold selection: keep the HIGHEST-scoring
    * documents until their token mass reaches `sharePermille`/1000 of the
    * corpus (integer budget — `div(total·share, 1000)` — so the cut is
    * exact in any engine). Order within a score is salted-hash then id:
    * content-addressed, rerun/partitioning invariant, and unbiased within
    * the tied score band. `scoreCol` must be integral and non-null (e.g.
    * [[graft.functions.TextFunctions.qualityScore]]'s [0,100]).
    *
    * Scale shape — hierarchical boundary refinement, no full-corpus
    * window anywhere: the naive formulation is ONE global running-sum
    * window in (score desc, hash) order. Instead:
    *   1. per-score-bin token subtotals (one partial-aggregated groupBy;
    *      ≤ |score range| rows) locate the boundary BIN — bins wholly
    *      under budget are kept with a broadcast semi-join, later bins
    *      dropped;
    *   2. inside the one boundary bin, the [[mixtureSample]] hash-slice
    *      trick refines further: 4096 per-slice subtotals locate the
    *      boundary SLICE, whole slices keep by semi-join, and only that
    *      slice's documents — 1/4096th of ONE score bin — pay the
    *      fine-grained running sum.
    * The decomposition is exact because the slice key is a prefix of the
    * hash, so (score desc, slice, hash, id) order IS the naive order;
    * two-level ≡ naive is spec-pinned. Output: input columns +
    * `n_tokens` (with `idCol` moved to the first position by the final
    * id-keyed payload rejoin).
    *
    * Precondition: `idCol` must be unique and non-null. The keep decision
    * is computed on a narrow stats frame and payload columns come back via
    * one equi-join on `idCol`, which silently drops NULL ids (NULL never
    * equi-joins) and fans out duplicate ids multiplicatively. */
  def selectTopQualityShare(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      scoreCol: String,
      sharePermille: Int,
      salt: String = "tq"): DataFrame = {
    require(sharePermille >= 0 && sharePermille <= 1000,
      "sharePermille must be in [0, 1000]")
    val reserved = Seq("graft_hh", "graft_bkt", "graft_nt", "graft_bt",
      "graft_pre", "graft_cum", "graft_tot", "graft_budget", "graft_rem",
      "graft_st", "graft_spre", "graft_srem", "n_tokens")
    require(!reserved.exists(docs.columns.contains),
      s"input already has one of ${reserved.mkString("/")}")
    // ONE corpus pass computes every text-derived stat (token count) plus
    // the content-addressed hash, onto a NARROW materialized frame
    // (id, score, nt, hash — ~40 bytes/doc): every refinement level and
    // all three keep branches read these stats again, and without the
    // lineage cut each reuse re-evaluated the expensive text expressions
    // over the whole corpus (~5 passes; measured 2.7s -> this shape at
    // sf0.1). Payload columns rejoin by id once at the end.
    val stats = docs
      .select(col(idCol), col(scoreCol), ntokens(col(textCol)).as("graft_nt"))
      .withColumn("graft_hh", hashHex(col(idCol), salt))
      .withColumn("graft_bkt", substring(col("graft_hh"), 1, 3))
      .localCheckpoint(false)
    // level 1: score-bin subtotals (tiny frame; the orderBy windows below
    // run on it, not the corpus). Exclusive prefix in score-desc order.
    val wb = Window.orderBy(col(scoreCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bins = stats
      .groupBy(col(scoreCol))
      .agg(sum(col("graft_nt")).as("graft_bt"))
      .withColumn("graft_pre", coalesce(sum(col("graft_bt")).over(wb), lit(0L)))
      .crossJoin(broadcast(stats.agg(sum(col("graft_nt")).as("graft_tot"))))
      .withColumn("graft_budget",
        call_function("div",
          coalesce(col("graft_tot"), lit(0L)) * lit(sharePermille.toLong),
          lit(1000L)))
    val keepBins = bins
      .filter(col("graft_pre") + col("graft_bt") <= col("graft_budget"))
      .select(col(scoreCol))
    val boundaryBin = bins
      .filter(col("graft_pre") <= col("graft_budget")
        && col("graft_pre") + col("graft_bt") > col("graft_budget"))
      .select(col(scoreCol),
        (col("graft_budget") - col("graft_pre")).as("graft_rem"))
    // level 2: hash-slice refinement inside the (at most one) boundary bin.
    // The unpartitioned window (WindowExec WARN) runs over ≤4096 slice
    // subtotal rows, never the corpus — bounded by construction.
    val bnd = stats.join(broadcast(boundaryBin), Seq(scoreCol))
    val ws = Window.orderBy(col("graft_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val slices = bnd
      .groupBy(col("graft_bkt"))
      .agg(sum(col("graft_nt")).as("graft_st"),
        max(col("graft_rem")).as("graft_rem"))
      .withColumn("graft_spre", coalesce(sum(col("graft_st")).over(ws), lit(0L)))
    val keepSlices = slices
      .filter(col("graft_spre") + col("graft_st") <= col("graft_rem"))
      .select(col("graft_bkt"))
    val boundarySlice = slices
      .filter(col("graft_spre") <= col("graft_rem")
        && col("graft_spre") + col("graft_st") > col("graft_rem"))
      .select(col("graft_bkt"),
        (col("graft_rem") - col("graft_spre")).as("graft_srem"))
    val wf = Window.partitionBy(col("graft_bkt"))
      .orderBy(col("graft_hh").asc, col(idCol).asc)
    val keptBoundary = bnd
      .join(broadcast(boundarySlice), Seq("graft_bkt"))
      .withColumn("graft_cum", sum(col("graft_nt")).over(wf))
      .filter(col("graft_cum") <= col("graft_srem"))
      .drop("graft_rem", "graft_srem", "graft_cum")
    // the keep decision lives entirely on the narrow stats frame; payload
    // columns come back with ONE id-keyed join against the input
    val kept = stats.join(broadcast(keepBins), Seq(scoreCol), "left_semi")
      .unionByName(
        bnd.join(broadcast(keepSlices), Seq("graft_bkt"), "left_semi")
          .drop("graft_rem"))
      .unionByName(keptBoundary)
      .select(col(idCol), col("graft_nt").as("n_tokens"))
    docs.join(kept, Seq(idCol))
  }

  /** The naive single-global-window formulation of
    * [[selectTopQualityShare]] — semantically identical (spec-pinned);
    * the equivalence reference and the shape the SQL oracle replays. */
  private[graft] def selectTopQualityShareNaive(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      scoreCol: String,
      sharePermille: Int,
      salt: String = "tq"): DataFrame = {
    val w = Window.orderBy(col(scoreCol).desc,
      hashHex(col(idCol), salt).asc, col(idCol).asc)
    val tot = docs.select(ntokens(col(textCol)).as("graft_nt"))
      .agg(sum(col("graft_nt")).as("graft_tot"))
    docs
      .withColumn("graft_nt", ntokens(col(textCol)))
      .crossJoin(broadcast(tot))
      .withColumn("graft_cum", sum(col("graft_nt")).over(w))
      .filter(col("graft_cum") <=
        call_function("div",
          coalesce(col("graft_tot"), lit(0L)) * lit(sharePermille.toLong),
          lit(1000L)))
      .withColumnRenamed("graft_nt", "n_tokens")
      .drop("graft_cum", "graft_tot")
  }

  /** The naive single-global-window formulation of [[shardByTokens]] —
    * semantically identical (spec-pinned); the equivalence reference. */
  private[graft] def shardByTokensNaive(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      nShards: Int,
      salt: String = "shard"): DataFrame = {
    val w = Window.orderBy(hashHex(col(idCol), salt).asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = docs.select(ntokens(col(textCol)).as("graft_nt"))
      .agg(sum(col("graft_nt")).as("graft_tot"))
    docs
      .withColumn("graft_nt", ntokens(col(textCol)))
      .crossJoin(broadcast(tot))
      .withColumn("graft_cum", coalesce(sum(col("graft_nt")).over(w), lit(0L)))
      .withColumn("shard",
        when(col("graft_tot") <= 0L, lit(0))
          .otherwise(least(lit(nShards - 1),
            call_function("div", col("graft_cum") * nShards, col("graft_tot"))
              .cast("int"))))
      .withColumnRenamed("graft_nt", "n_tokens")
      .drop("graft_cum", "graft_tot")
  }

  /** Weighted sampling WITHOUT replacement by priority (Duffield–Lund–
    * Thorup priority sampling, "Priority sampling for estimation of
    * arbitrary subset sums", JACM 2007): each row gets priority
    * q = w / u with u a content-addressed uniform in (0, 1], the k
    * largest-priority rows form the sample, and the (k+1)-th priority τ
    * yields the unbiased subset-sum estimator ŵ = max(w, τ) — summing
    * ŵ over any sampled subset estimates that subset's true total
    * weight. The training-data use: pick a fixed-count, quality- or
    * token-weighted subset of a corpus whose per-source token totals
    * remain estimable from the sample alone.
    *
    * Deterministic and engine-portable like everything in this file:
    * u = (md5-60bit(id || "-" || salt) + 1) / 2^60 — an exact
    * power-of-two scale of an integer both engines cast identically —
    * and q is ONE correctly-rounded IEEE division, so priorities (and
    * the sample) replay bit-for-bit in DuckDB. Ties break by id.
    *
    * Plan shape: the corpus side is one narrow projection into a
    * TakeOrderedAndProject(k+1) — per-partition top-(k+1) then one
    * driver-sized merge, NO global sort, NO full-width shuffle at any
    * scale; τ attaches via a one-row broadcast.
    *
    * Output: (idCol, weight, priority, w_hat), the k sampled rows.
    * Weights are LONG-INTEGER by contract: the weight is cast to long
    * once and that long drives BOTH the priority and the ŵ estimator (a
    * fractional weight in one and its truncation in the other would bias
    * ŵ relative to the sampled priorities — scale fractional weights to
    * integer micro-units first). Non-positive weights are filtered out
    * before scoring: DLT is undefined at w ≤ 0 (a zero weight yields
    * priority 0 and a negative one a negative priority, both of which
    * would silently corrupt τ and the subset-sum estimate). A POSITIVE
    * weight that truncates to 0 (fractional, in (0, 1)) is a contract
    * violation and raises loudly — silently excluding a row the caller
    * weighted above zero is the one failure mode worse than a crash
    * (same loud-raise convention as [[hashHex]]'s null-id check). */
  def prioritySample(
      df: DataFrame,
      idCol: String,
      weight: Column,
      k: Int,
      salt: String): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val h60 = conv(substring(
        md5(concat(col(idCol).cast("string"), lit("-" + salt))
          .cast("binary")), 1, 15), 16, 10)
      .cast("long")
    val u = (h60.cast("double") + lit(1.0)) / lit(1152921504606846976.0)
    val scored = df
      .select(col(idCol),
        when(weight > lit(0) && weight.cast("long") === 0L,
          raise_error(concat(
            lit("prioritySample: positive weight truncates to 0 at id="),
            col(idCol).cast("string"),
            lit(" — scale fractional weights to integer micro-units"))))
          .otherwise(weight.cast("long")).as("weight"))
      .filter(col("weight") > 0L)
      .select(col(idCol), col("weight"),
        (col("weight").cast("double") / u).as("priority"))
      .orderBy(desc("priority"), col(idCol))
      .limit(k + 1)
      .localCheckpoint(false)
    // DLT threshold: the (k+1)-th priority. When the population itself is
    // <= k there IS no threshold (every row is sampled) — τ = 0, so the
    // estimator degrades to the exact weight, not an inflated one.
    val tau = scored.agg(
      when(count(lit(1)) > k, min(col("priority"))).otherwise(lit(0.0))
        .as("tau"))
    scored
      .orderBy(desc("priority"), col(idCol))
      .limit(k)
      .crossJoin(broadcast(tau))
      .select(col(idCol), col("weight"), col("priority"),
        greatest(col("weight").cast("double"), col("tau")).as("w_hat"))
  }

  /** Deterministic fixed-count sample per stratum: each group keeps its
    * `k` rows with the smallest salted content hash (ties by id) — the
    * balanced-eval-set / per-class-quota op ([[hashSplit]] fixes a
    * FRACTION per row; this fixes a COUNT per group). Content-addressed
    * like the rest of the file: membership is a pure function of
    * (id, salt), stable under reruns, insertions elsewhere in the
    * stratum never evict more than the hash order implies.
    *
    * Exact min-k without a per-stratum global sort: rows are first
    * ranked inside (stratum, one of 32 salted sub-buckets) — windows
    * over ~1/32 of each stratum — and only the per-bucket top-k
    * survivors (≤ 32·k rows per stratum, k-bounded not data-bounded)
    * enter the final per-stratum ranking. Min-k over a union of bucket
    * min-k's is the global min-k, so the two-level plan is exact; only
    * (stratum, id, 8-hex hash) rows ever shuffle. The same hierarchical
    * trick as `selectTopQualityShare`'s boundary refinement.
    *
    * Output: (strataCol, idCol, sample_rank), sample_rank in 1..k per
    * stratum (hash asc, id asc); strata with fewer than k rows keep all. */
  def stratifiedFixedSample(
      df: DataFrame,
      idCol: String,
      strataCol: String,
      k: Int,
      salt: String): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val h = hashHex(col(idCol), salt)
    val sub = graft.functions.PortableHash.h32(
      concat(col(idCol).cast("string"), lit("-sub-" + salt))) % 32
    val level1 = Window.partitionBy(col(strataCol), col("__sub"))
      .orderBy(col("__h").asc, col(idCol).asc)
    val survivors = df
      .select(col(strataCol), col(idCol), h.as("__h"), sub.as("__sub"))
      .withColumn("__r1", row_number().over(level1))
      .filter(col("__r1") <= k)
    val level2 = Window.partitionBy(col(strataCol))
      .orderBy(col("__h").asc, col(idCol).asc)
    survivors
      .withColumn("sample_rank", row_number().over(level2).cast("long"))
      .filter(col("sample_rank") <= k)
      .select(col(strataCol), col(idCol), col("sample_rank"))
  }

  /** Per-domain document cap — the Gopher/RefinedWeb domain-mixing stage
    * (Rae et al. 2021; Penedo et al. 2023 cap how much any one
    * registered domain contributes): each registered domain
    * (`UrlFunctions.urlDomain` — eTLD+1 of the URL's host) keeps its `k`
    * rows with the smallest salted content hash, via the same exact
    * two-level salted min-k as [[stratifiedFixedSample]] (no domain's
    * rows ever sort in one task — a 10M-page domain costs 32 bounded
    * windows, not one giant one). Membership is content-addressed:
    * stable under reruns and insertions elsewhere in the domain.
    *
    * Rows whose URL does not parse (null domain) are EXCLUDED — the
    * front door rejects what it cannot attribute to a domain; route
    * them to a separate policy if they matter (grouping them as one
    * giant pseudo-domain would cap all of them at k, silently).
    *
    * Output: (domain, idCol, sample_rank), sample_rank in 1..k per
    * domain (hash asc, id asc); domains with fewer than k rows keep
    * all. */
  def domainCap(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      k: Int,
      salt: String): DataFrame = {
    val doms = df.select(col(idCol),
      graft.functions.UrlFunctions.urlDomain(col(urlCol)).as("domain"))
      .filter(col("domain").isNotNull)
    stratifiedFixedSample(doms, idCol, "domain", k, salt)
  }

  /** PADDING-EFFICIENCY report — the batching decision every fixed-shape
    * training/inference job makes: batches padded to their longest
    * member waste `max·B − Σ tokens` per batch, and LENGTH-SORTED
    * batching (each batch drawn from similar lengths) recovers most of
    * that waste versus arrival-order batching. One summary row per
    * layout quantifies the trade before anyone re-sorts 100 TB.
    *
    * Batch assignment is the exact global rank under each ordering,
    * computed WITHOUT a single-task global window (the [[shardByTokens]]
    * discipline): rows are sliced on a bounded domain — the token-count
    * VALUE for the sorted layout (the qd01 value-domain argument), a
    * 4096-wide id-range cut for arrival order — each slice's exclusive
    * row-count prefix comes from a slice-domain window, and within-slice
    * ranks from per-slice partitioned windows. `batch = (rank−1) div B`,
    * all exact integers, engine-replayable.
    *
    * Output: two rows (layout ∈ arrival|length_sorted; n_batches,
    * useful_tokens, padded_tokens, waste_permille), ordered by layout.
    * Empty input: two zero rows. */
  def paddingReport(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      batchSize: Int): DataFrame = {
    require(batchSize >= 1, s"batchSize=$batchSize")
    // the arrival-order slicing reads the id domain with getLong +
    // shiftright — a string/decimal id would die with an opaque
    // ClassCastException at head(); fail loudly up front instead
    require(docs.schema(idCol).dataType ==
      org.apache.spark.sql.types.LongType,
      s"paddingReport requires a BIGINT id column; '$idCol' is " +
        s"${docs.schema(idCol).dataType.simpleString}")
    // coalesce: a null text is a zero-token row, NOT a droppable one —
    // a null __nt would both vanish from the length_sorted layout (its
    // slice key is __nt; a null key never survives the prefix join) and
    // sort unlike the naive twin. Materialized once: the scan + token
    // count otherwise re-inlines ~5x (domain agg + both sides of each
    // layout's prefix self-join).
    val base = Barriers.stage(docs.select(col(idCol).as("__id"),
      coalesce(ntokens(col(textCol)), lit(0L)).as("__nt")))
    def report(name: String, slice: Column, sliceAsc: Boolean,
        ord: Seq[Column]): DataFrame = {
      val sliced = base.withColumn("__slice", slice)
      val sw = if (sliceAsc) Window.orderBy(col("__slice").asc)
        else Window.orderBy(col("__slice").desc)
      // slice-domain window: bounded rows by construction
      val pre = sliced.groupBy(col("__slice"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__pre", coalesce(sum(col("__c")).over(
          sw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("__slice"), col("__pre"))
      val wf = Window.partitionBy(col("__slice")).orderBy(ord: _*)
      val batched = sliced
        .join(broadcast(pre), Seq("__slice"))
        .withColumn("__rank",
          col("__pre") + row_number().over(wf).cast("long"))
        .withColumn("__batch",
          TextFunctions.ldiv(col("__rank") - 1L, lit(batchSize.toLong)))
        .groupBy(col("__batch"))
        .agg(count(lit(1)).as("__n"), max(col("__nt")).as("__max"),
          sum(col("__nt")).as("__sum"))
      batched
        .agg(count(lit(1)).as("n_batches"),
          coalesce(sum(col("__sum")), lit(0L)).as("useful_tokens"),
          coalesce(sum(col("__max") * col("__n")), lit(0L))
            .as("padded_tokens"))
        .select(lit(name).as("layout"), col("n_batches"),
          col("useful_tokens"), col("padded_tokens"),
          when(col("padded_tokens") <= 0L, 0L)
            .otherwise(TextFunctions.ldiv(
              (col("padded_tokens") - col("useful_tokens")) * lit(1000L),
              col("padded_tokens"))).as("waste_permille"))
    }
    // arrival: id order, sliced by an arithmetic RIGHT SHIFT sized from
    // the domain's bit width (two bounded scalars). The earlier affine
    // cut ((id - lo) div width) overflowed when the id domain spans
    // more than a signed long — 64-bit hash ids are routine — throwing
    // under ANSI and silently inverting slice order without it. The
    // shift is monotone over the WHOLE long range (arithmetic shift
    // preserves order incl. negatives), overflow-free by construction,
    // and caps distinct slices at ~4096 for any domain.
    val dom = base.agg(min(col("__id")), max(col("__id"))).head()
    val k =
      if (dom.isNullAt(0)) 0
      else {
        val width = BigInt(dom.getLong(1)) - BigInt(dom.getLong(0)) + 1
        math.max(0, width.bitLength - 12)
      }
    val arrival = report("arrival", shiftright(col("__id"), k),
      sliceAsc = true, Seq(col("__id").asc))
    // length-sorted: (n_tokens desc, id) order, sliced on the token
    // count itself
    val sorted = report("length_sorted", col("__nt"), sliceAsc = false,
      Seq(col("__id").asc))
    arrival.unionByName(sorted).orderBy(col("layout"))
  }

  /** Naive single-window [[paddingReport]] twin — the reference the
    * two-level plan is spec-proven equal to (SamplingSpec). */
  private[graft] def paddingReportNaive(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      batchSize: Int): DataFrame = {
    val base = docs.select(col(idCol).as("__id"),
      coalesce(ntokens(col(textCol)), lit(0L)).as("__nt"))
    def report(name: String, ord: Seq[Column]): DataFrame =
      base
        .withColumn("__rank",
          row_number().over(Window.orderBy(ord: _*)).cast("long"))
        .withColumn("__batch",
          TextFunctions.ldiv(col("__rank") - 1L, lit(batchSize.toLong)))
        .groupBy(col("__batch"))
        .agg(count(lit(1)).as("__n"), max(col("__nt")).as("__max"),
          sum(col("__nt")).as("__sum"))
        .agg(count(lit(1)).as("n_batches"),
          coalesce(sum(col("__sum")), lit(0L)).as("useful_tokens"),
          coalesce(sum(col("__max") * col("__n")), lit(0L))
            .as("padded_tokens"))
        .select(lit(name).as("layout"), col("n_batches"),
          col("useful_tokens"), col("padded_tokens"),
          when(col("padded_tokens") <= 0L, 0L)
            .otherwise(TextFunctions.ldiv(
              (col("padded_tokens") - col("useful_tokens")) * lit(1000L),
              col("padded_tokens"))).as("waste_permille"))
    report("arrival", Seq(col("__id").asc))
      .unionByName(report("length_sorted",
        Seq(col("__nt").desc, col("__id").asc)))
      .orderBy(col("layout"))
  }
}
