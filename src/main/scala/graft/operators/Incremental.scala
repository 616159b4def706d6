package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of keep-first elections under snapshot
  * deltas — the machinery that lets a 100 TB front door process a daily
  * crawl WITHOUT rescanning the corpus.
  *
  * A production acquire pipeline persists two artifacts between runs:
  * the PER-DOC SIGNAL table (id, group key, pass verdict, quality
  * columns — everything the gates need, none of the text) and the
  * KEEPER table (group key → elected owner id). On the next snapshot,
  * only the delta (added/changed docs from [[Dedup.corpusDiff]]) pays
  * the text scan; this operator folds the delta into both tables with
  * delta-bounded work:
  *
  *   - the next signal table is prior MINUS (changed ∪ removed) PLUS
  *     the recomputed delta rows — two id-keyed anti/union passes over
  *     NARROW signal rows, never text;
  *   - a group's election can only move if the group gained or lost a
  *     member, so only TOUCHED keys (keys of delta rows ∪ keys of
  *     departed rows) re-elect — a semi-join-restricted min-agg whose
  *     input is bounded by (delta size × group fan-in), not corpus
  *     size; every untouched key carries its prior keeper row forward
  *     via one anti-join on the key-domain-bounded keeper table.
  *
  * Correctness is the invariant the wp05 oracle enforces end to end:
  * incremental maintenance must be INDISTINGUISHABLE from batch
  * recomputation over the new snapshot (keep-first = min passing id
  * per key is a per-group function of membership alone, so carrying
  * untouched groups is exact, not approximate).
  */
object Incremental {

  /** Fold a snapshot delta into (signals, keepers).
    *
    * @param prior   stored per-doc signal frame for the OLD snapshot
    * @param delta   recomputed signal rows for added+changed ids ONLY
    *                (same schema as `prior`)
    * @param diff    (idCol, status) with status ∈ added|changed|removed
    *                — [[Dedup.corpusDiff]]'s contract
    * @param priorKeepers stored (keyCol, keeperCol) election results
    *                for the OLD snapshot
    * @param idCol   document id (election tie-break: minimum wins)
    * @param keyCol  election group key (null keys never elect)
    * @param passCol boolean gate — only passing rows hold ownership
    * @param keeperCol name of the keeper-id column in the keeper frames
    * @return (nextSignals, nextKeepers) for the NEW snapshot
    */
  def maintainKeepFirst(
      prior: DataFrame,
      delta: DataFrame,
      diff: DataFrame,
      priorKeepers: DataFrame,
      idCol: String,
      keyCol: String,
      passCol: String,
      keeperCol: String = "keep_id"): (DataFrame, DataFrame) = {
    require(prior.columns.sameElements(delta.columns),
      s"prior/delta schemas differ: ${prior.columns.mkString(",")} vs " +
        delta.columns.mkString(","))
    require(priorKeepers.columns.toSeq == Seq(keyCol, keeperCol),
      s"priorKeepers must be ($keyCol, $keeperCol), got " +
        priorKeepers.columns.mkString(","))
    // rows leaving the table: changed docs are replaced by their delta
    // row, removed docs just leave
    val gone = diff.filter(col("status").isin("changed", "removed"))
      .select(col(idCol))
    val next = prior.join(gone, Seq(idCol), "left_anti").unionByName(delta)
    // touched keys: gained a member (delta) or lost one (departed
    // prior rows). Departed keys come from the prior SIGNAL table —
    // the delta row of a changed doc may carry a different key, and
    // both its old and new groups must re-elect
    val touched = delta.select(col(keyCol))
      .unionByName(
        prior.join(gone, Seq(idCol), "left_semi").select(col(keyCol)))
      .filter(col(keyCol).isNotNull)
      .distinct()
    val reElected = next
      .join(touched, Seq(keyCol), "left_semi")
      .filter(col(passCol) && col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(min(col(idCol)).as(keeperCol))
    val nextKeepers = priorKeepers
      .join(touched, Seq(keyCol), "left_anti")
      .unionByName(reElected)
    (next, nextKeepers)
  }

  /** Incremental maintenance of a per-group salted MIN-K sample (the
    * `Sampling.domainCap` / `stratifiedFixedSample` shape) under a
    * snapshot delta. Membership is content-addressed — a row's hash is
    * a pure function of (id, salt) — so the SALT is the only election
    * state: touched groups re-rank through the exact same two-level
    * salted windows as the batch operator (on the delta-restricted
    * frame, so a re-ranked hot group still never sorts in one task),
    * and untouched groups carry their prior sample rows byte-for-byte.
    * Incremental therefore equals batch EXACTLY, which the url06
    * oracle (a full batch replay over the new snapshot) enforces.
    *
    * @param prior stored (idCol, keyCol, ...) membership frame for the
    *              old snapshot (callers pre-filter eligibility — min-k
    *              has no pass gate)
    * @param delta membership rows for added+changed ids only
    * @param diff  (idCol, status) from [[Dedup.corpusDiff]]
    * @param priorSample stored (keyCol, idCol, sample_rank) — the
    *              batch operator's output for the old snapshot
    * @return (nextMembership, nextSample) */
  def maintainMinK(
      prior: DataFrame,
      delta: DataFrame,
      diff: DataFrame,
      priorSample: DataFrame,
      idCol: String,
      keyCol: String,
      k: Int,
      salt: String): (DataFrame, DataFrame) = {
    require(prior.columns.sameElements(delta.columns),
      s"prior/delta schemas differ: ${prior.columns.mkString(",")} vs " +
        delta.columns.mkString(","))
    require(priorSample.columns.toSeq == Seq(keyCol, idCol, "sample_rank"),
      s"priorSample must be ($keyCol, $idCol, sample_rank), got " +
        priorSample.columns.mkString(","))
    val gone = diff.filter(col("status").isin("changed", "removed"))
      .select(col(idCol))
    val next = prior.join(gone, Seq(idCol), "left_anti").unionByName(delta)
    val touched = delta.select(col(keyCol))
      .unionByName(
        prior.join(gone, Seq(idCol), "left_semi").select(col(keyCol)))
      .filter(col(keyCol).isNotNull)
      .distinct()
    val reRanked = Sampling.stratifiedFixedSample(
      next.join(touched, Seq(keyCol), "left_semi"), idCol, keyCol, k, salt)
    val nextSample = priorSample
      .join(touched, Seq(keyCol), "left_anti")
      .unionByName(reRanked)
    (next, nextSample)
  }

  /** Incremental maintenance of per-group ADDITIVE aggregates (row
    * count + long sums — the mixture/token-volume tables) under a
    * snapshot delta: only the departed and delta rows aggregate
    * (delta-bounded by construction — sums fold additively, unlike the
    * elections above no untouched group ever recomputes ANYTHING), and
    * the totals update is a key-domain-bounded three-way outer join.
    * Groups whose row count reaches zero DISAPPEAR, exactly as a batch
    * groupBy over the new snapshot would drop them.
    *
    * Contract: NULL-KEY rows never enter the totals (the domainCap
    * convention — route unattributable rows to their own policy), and
    * value columns must be NON-NULL LONGS (a null value is invisible
    * to SUM, so a group holding only nulls would read 0 incrementally
    * but NULL in batch — coalesce values upstream).
    *
    * @param prior stored (idCol, keyCol, valueCols...) frame
    * @param delta recomputed rows for added+changed ids only
    * @param diff  (idCol, status) from [[Dedup.corpusDiff]]
    * @param priorTotals stored (keyCol, countCol, valueCols...) —
    *              the batch aggregation's output for the old snapshot
    * @return (nextRows, nextTotals) */
  def maintainGroupSums(
      prior: DataFrame,
      delta: DataFrame,
      diff: DataFrame,
      priorTotals: DataFrame,
      idCol: String,
      keyCol: String,
      valueCols: Seq[String],
      countCol: String = "n_rows"): (DataFrame, DataFrame) = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    require(prior.columns.sameElements(delta.columns),
      s"prior/delta schemas differ: ${prior.columns.mkString(",")} vs " +
        delta.columns.mkString(","))
    require(priorTotals.columns.toSeq == keyCol +: countCol +: valueCols,
      s"priorTotals must be ($keyCol, $countCol, ${valueCols.mkString(", ")}), " +
        s"got ${priorTotals.columns.mkString(",")}")
    val gone = diff.filter(col("status").isin("changed", "removed"))
      .select(col(idCol))
    val next = prior.join(gone, Seq(idCol), "left_anti").unionByName(delta)
    def sums(df: DataFrame, tag: String) = df
      .filter(col(keyCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as(s"$tag$countCol"),
        valueCols.map(c => sum(col(c)).as(s"$tag$c")): _*)
    val minus = sums(prior.join(gone, Seq(idCol), "left_semi"), "__m_")
    val adds = sums(delta, "__a_")
    val nextTotals = priorTotals
      .join(minus, Seq(keyCol), "full_outer")
      .join(adds, Seq(keyCol), "full_outer")
      .select(col(keyCol) +:
        (countCol +: valueCols).map(c =>
          (coalesce(col(c), lit(0L)) - coalesce(col(s"__m_$c"), lit(0L)) +
            coalesce(col(s"__a_$c"), lit(0L))).as(c)): _*)
      .filter(col(countCol) > 0L)
    (next, nextTotals)
  }

  /** STREAMING twin of [[maintainGroupSums]]: the additive fold is a
    * homomorphism, so a live totals table is just a stateful streaming
    * SUM over SIGNED delta contributions — each snapshot step emits
    * one row per arriving/departing document with `statusCol` ∈
    * added|changed_new (sign +1) or removed|changed_old (sign −1), and
    * `groupBy(key).sum` in COMPLETE output mode maintains the same
    * totals batch maintenance computes. State is the key domain
    * (bounded — the same reason the batch totals table is small), so
    * the fold is streaming-legal at any corpus size; groups folded to
    * zero rows are filtered out, matching the batch disappearance
    * rule. Works identically on a batch frame (the spec's duality
    * check). Null-key rows are excluded (the batch contract); an
    * unknown status raises. */
  def maintainGroupSumsStream(
      deltas: DataFrame,
      keyCol: String,
      statusCol: String,
      valueCols: Seq[String],
      countCol: String = "n_rows"): DataFrame = {
    require(valueCols.nonEmpty, "valueCols must be non-empty")
    val sign = when(col(statusCol).isin("added", "changed_new"), lit(1L))
      .when(col(statusCol).isin("removed", "changed_old"), lit(-1L))
      .otherwise(raise_error(lit(
        "maintainGroupSumsStream: status must be " +
          "added|removed|changed_new|changed_old")))
    deltas
      .filter(col(keyCol).isNotNull)
      .select(col(keyCol) +: sign.as("__sgn") +:
        valueCols.map(c => col(c)): _*)
      .groupBy(col(keyCol))
      .agg(sum(col("__sgn")).as(countCol),
        valueCols.map(c => sum(col(c) * col("__sgn")).as(c)): _*)
      .filter(col(countCol) > 0L)
  }
}
