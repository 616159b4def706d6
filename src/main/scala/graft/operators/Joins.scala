package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for skewed keys at scale.
  *
  * AQE's skew-join splitting (on in `GraftSession`) handles most skew at
  * runtime; `saltedJoin` is the explicit tool for the pathological case it
  * can't fix — a shuffle join where a handful of hot keys dwarf everything
  * (the classic "null key / hub vertex / default value" skew), or where the
  * planner picked sort-merge before sizes were known.
  *
  * Fact side gets a random salt in [0, salts); the dimension side is
  * exploded `salts`× so every (key, salt) bucket finds its match. Hot keys
  * spread across `salts` reducers at the cost of duplicating only the
  * (small) dimension rows.
  */
object Joins {

  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      salts: Int = 16,
      joinType: String = "inner"): DataFrame = {
    require(salts > 1, "salts must be > 1")
    // The salt scheme is only correct when unmatched DIM rows never reach
    // the output: with 'right'/'full_outer' an unmatched dim row would
    // survive once per salt (the dim side is exploded salts×).
    require(
      Set("inner", "left", "leftouter", "leftsemi", "leftanti")
        .contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin supports inner/left joins only, got '$joinType': " +
        "outer-preserved dim rows would be duplicated salts times")
    // deterministic salt: hash of the whole fact row modulo salts (a random
    // salt would make retried tasks nondeterministic)
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(salts)))
    val exploded = dim
      .withColumn("__salt", explode(
        array((0 until salts).map(s => lit(s.toLong)): _*)))
    salted
      .join(exploded, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Co-occurrence pairs WITHOUT a self-join: collect each group's items,
    * explode twice, keep a < b. Same pair multiset as the classic
    * self-join-on-group (duplicates in a group pair per occurrence), but
    * one scan + two shuffles instead of two scans + three — measured 2×
    * on the co-purchase graph (G03Probe). ONLY for bounded groups (an
    * order's lineitems, an occupation's skills): a hot GROUP's quadratic
    * fan-out is generated inside one task here, where a self-join would
    * spread it — for hot-group data keep the join (see
    * `EscoAnalytics.occupationCooccurrence`).
    * Output: (a, b) item pairs, one row per co-occurrence. */
  def groupedPairs(df: DataFrame, groupCol: String, itemCol: String): DataFrame =
    df.groupBy(col(groupCol))
      .agg(collect_list(col(itemCol)).as("__items"))
      .select(explode(col("__items")).as("a"), col("__items"))
      .select(col("a"), explode(col("__items")).as("b"))
      .filter(col("a") < col("b"))

  /** The classic self-join co-occurrence shape: same pair multiset as
    * [[groupedPairs]], but a hot group's quadratic fan-out is SPREAD by
    * the join (both sides shuffle-partition on the group key and the pair
    * rows materialize across the matching tasks) instead of generated
    * inside one task's collected array. Costs one extra scan + shuffle —
    * only worth it when a hot group exists. */
  def selfJoinPairs(df: DataFrame, groupCol: String, itemCol: String): DataFrame = {
    val l = df.select(col(groupCol).as("__g"), col(itemCol).as("a"))
    val r = df.select(col(groupCol).as("__g"), col(itemCol).as("b"))
    l.join(r, Seq("__g"))
      .filter(col("a") < col("b"))
      .select(col("a"), col("b"))
  }

  /** Co-occurrence pairs with the physical shape chosen from the DATA:
    * one cheap count-aggregate probe finds the largest group, and the
    * grouped shape ([[groupedPairs]], one scan + two shuffles) is used
    * only when every group is at most `hotGroupThreshold` items —
    * otherwise the spread-out [[selfJoinPairs]] shape. Callers no longer
    * need to know their distribution (the skill-side vs occupation-side
    * co-occurrence split used to be a hand-made version of exactly this
    * decision). The probe is one small aggregate job run eagerly at call
    * time — a bounded driver scalar, like the sampling strata probe.
    * Output: (a, b), one row per co-occurrence — identical multiset from
    * either shape. */
  def adaptivePairs(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      hotGroupThreshold: Int = 1000): DataFrame = {
    require(hotGroupThreshold > 0, "hotGroupThreshold must be positive")
    val maxRow = df.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__n"))
      .agg(max(col("__n"))).head()
    val maxGroup = if (maxRow.isNullAt(0)) 0L else maxRow.getLong(0)
    if (maxGroup <= hotGroupThreshold) groupedPairs(df, groupCol, itemCol)
    else selfJoinPairs(df, groupCol, itemCol)
  }
}
