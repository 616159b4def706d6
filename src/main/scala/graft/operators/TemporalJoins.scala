package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** Temporal join operators Spark lacks natively: as-of join and
  * point-in-interval (range) join.
  *
  * Both are staples of a training-data pipeline — "join each log event to
  * the newest model-checkpoint snapshot at or before it", "count events
  * inside each maintenance window" — and both degenerate catastrophically
  * if written naively in Spark: an inequality join plans as
  * BroadcastNestedLoopJoin (O(n·m) comparisons) and an
  * equi-join + window-rank shuffles the full n×m pair blow-up.
  *
  * The implementations here use the two classic scalable shapes:
  *
  *  - `asofJoin`: UNION both sides, one shuffle on the key, one sort within
  *    partitions, then `last(_, ignoreNulls)` over an unbounded-preceding
  *    running frame. Cost is sort-shuffle of |L|+|R| rows — no pair
  *    materialization at any point. (Same plan a stream-table processor
  *    like Flink's temporal join executes.)
  *
  *  - `rangeJoin`: bucketize time into `bucketWidth`-sized cells; an
  *    interval explodes to the cells it covers, a point maps to exactly one
  *    cell, and the join becomes an equi-join on the cell id + a residual
  *    filter. Each (interval, point) match meets in exactly the point's
  *    cell, so no dedup pass is needed. Cost is |P| + Σ cells(interval)
  *    rows into a hash join — no nested loop.
  */
object TemporalJoins {

  /** As-of join: for each left row, the single right row with the greatest
    * `rightTs <= leftTs` (direction="backward", the default) or the least
    * `rightTs >= leftTs` (direction="forward") sharing the same `key`.
    * Pandas `merge_asof` / kdb `aj` semantics, left-preserving: every left
    * row survives; unmatched rows carry nulls.
    *
    * `rightCols` are the right-side columns carried onto the match (must
    * not collide with left column names); `matchedTs` (the matched right
    * timestamp, null when unmatched) is always appended so callers can
    * apply a tolerance as a post-filter:
    * `when(l_ts - matched_ts <= tol, matched_col)`.
    *
    * Ties: equal `rightTs` within a key are broken by the LAST such right
    * row in (ts, input-order) — callers needing determinism under ts ties
    * should pre-aggregate the right side to one row per (key, ts).
    * `strict=true` excludes `rightTs == leftTs` matches.
    *
    * Null handling: null-ts and null-KEY right rows are dropped (SQL join
    * semantics — null keys never match, matching `asofJoinIndexed`);
    * null-ts/null-key left rows are preserved with a null match (they sort
    * before every real timestamp via nulls-first, so the running `last`
    * has seen no right row yet).
    *
    * Scale: one shuffle on `key`, one sort — the optimal distributed
    * as-of. The unit of parallelism is the key, so a single pathologically
    * hot key would serialize into one task; `hotKeyBuckets > 1` pre-shards
    * every key into that many coarse TIME buckets and windows over
    * `(key, bucket)` instead. Each bucket needs the newest right row from
    * earlier buckets as its starting state, so the per-(key, bucket) last
    * right carry (one partial-aggregable `max_by`/`min_by`) is re-emitted
    * as a seed row into every later (backward) / earlier (forward) bucket
    * — O(hotKeyBuckets²) seed rows per key, negligible for the 8–64 range
    * this is meant for. Seeds come from a strictly different bucket, hence
    * a strictly different ts, so `strict`/inclusive semantics are
    * untouched. Bucket arithmetic needs a numeric view of the ts:
    * `hotKeyBuckets > 1` (or auto, below) requires a numeric or timestamp
    * ts column (cast dates to timestamp first). Tie-breaking among equal
    * right ts in a seed aggregate is arbitrary — same disclaimer as above:
    * pre-aggregate the right side for determinism under ties. Computing
    * the shared time range for bucketing runs one small min/max aggregate
    * job eagerly at call time (a bounded driver scalar, like the sampling
    * strata probe).
    *
    * `hotKeyBuckets = 0` is AUTO: a count-probe (one partial-aggregable
    * groupBy over just the key columns, the same shape as
    * `Joins.adaptivePairs`'s probe) measures the largest window partition
    * — left plus surviving right rows per key — and shards only when it
    * exceeds `autoHotKeyThreshold` rows, picking just enough buckets to
    * bring the hottest key under the threshold (capped at 64; the seed
    * fan-out is O(buckets²) per key). Uniform inputs keep the plain
    * single-sort plan; a skewed run flips to the sharded shape with
    * identical output. The probe is one cheap eager job; pass an explicit
    * bucket count to skip it.
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightCols: Seq[String],
      direction: String = "backward",
      strict: Boolean = false,
      hotKeyBuckets: Int = 1,
      autoHotKeyThreshold: Long = 4000000L): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")
    val collisions = rightCols.toSet.intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"rightCols collide with left columns: ${collisions.mkString(",")}")
    val reserved = Set("matched_ts", "__ts", "__tag", "__carry", "__bkt")
    val clashes = reserved.intersect(left.columns.toSet ++ rightCols)
    require(clashes.isEmpty,
      s"reserved column names in use: ${clashes.mkString(",")}")
    require(hotKeyBuckets >= 0, "hotKeyBuckets must be >= 1, or 0 for auto")
    require(autoHotKeyThreshold >= 1, "autoHotKeyThreshold must be positive")
    if (hotKeyBuckets != 1) {
      import org.apache.spark.sql.types._
      Seq(left.schema(leftTs), right.schema(rightTs)).foreach { f =>
        require(f.dataType.isInstanceOf[NumericType] ||
            f.dataType == TimestampType || f.dataType == TimestampNTZType,
          s"hotKeyBuckets needs a numeric/timestamp ts, got ${f.dataType} " +
            s"(${f.name}); cast dates to timestamp first")
      }
    }
    // auto mode: measure the largest would-be window partition (left rows
    // keep null keys — those sort into one shared partition too; right
    // rows only if they survive the null filter) and shard just enough to
    // split it under the threshold. One cheap probe job, driver-bounded.
    val buckets: Int =
      if (hotKeyBuckets != 0) hotKeyBuckets
      else {
        val probe = left.select(col(key).cast("string").as("__k"))
          .unionAll(right
            .filter(col(rightTs).isNotNull && col(key).isNotNull)
            .select(col(key).cast("string").as("__k")))
          .groupBy(col("__k")).count()
          .agg(max(col("count"))).head()
        val hottest = if (probe.isNullAt(0)) 0L else probe.getLong(0)
        if (hottest <= autoHotKeyThreshold) 1
        else math.min(64L,
          (hottest + autoHotKeyThreshold - 1L) / autoHotKeyThreshold).toInt
      }

    val leftCols = left.columns.toSeq
    // __tag orders left vs right rows at equal ts: inclusive match wants
    // the right row FIRST (so the left row's running `last` sees it),
    // strict wants it AFTER. The carried payload is ONE struct per right
    // row (null for left rows): a single last(_, ignoreNulls) then can't
    // mix columns from different right rows — per-column ignoreNulls would
    // back-fill a genuinely-null value from an OLDER row.
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__tag", lit(if (strict) 0 else 1))
      .withColumn("__carry", lit(null).cast(
        StructType(StructField("matched_ts", right.schema(rightTs).dataType) +:
          rightCols.map(c => right.schema(c).copy(name = c)))))
      .select(Seq(col(key), col("__ts"), col("__tag"), col("__carry")) ++
        leftCols.filterNot(_ == key).map(col): _*)
    val rTagged = right
      // null keys never match (SQL join semantics; asofJoinIndexed's
      // equi-join agrees) — null-key LEFT rows are preserved unmatched
      .filter(col(rightTs).isNotNull && col(key).isNotNull)
      .withColumn("__ts", col(rightTs))
      .withColumn("__tag", lit(if (strict) 1 else 0))
      .withColumn("__carry",
        struct(col(rightTs).as("matched_ts") +: rightCols.map(col): _*))
      .select(Seq(col(key), col("__ts"), col("__tag"), col("__carry")) ++
        leftCols.filterNot(_ == key).map(c =>
          lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Hot-key pre-shard: assign every row a coarse time bucket (equal ts
    // always land in the same bucket — monotonic floor of a shared range),
    // seed each bucket with the best-so-far right carry from the buckets
    // the window can no longer see, and partition the window by
    // (key, bucket). Null-ts left rows get a null bucket: they form their
    // own shard with no right rows and stay unmatched, as before.
    val (lIn, rIn, partCols) = if (buckets <= 1) {
      (lTagged, rTagged, Seq(col(key)))
    } else {
      val n = buckets
      val bounds = lTagged.select(col("__ts").cast("double").as("v"))
        .unionAll(rTagged.select(col("__ts").cast("double").as("v")))
        .agg(min(col("v")), max(col("v"))).head()
      if (bounds.isNullAt(0)) (lTagged, rTagged, Seq(col(key)))
      else {
        val lo = bounds.getDouble(0)
        val width = math.max((bounds.getDouble(1) - lo) / n,
          java.lang.Double.MIN_VALUE)
        val bkt = least(greatest(
          floor((col("__ts").cast("double") - lit(lo)) / lit(width)),
          lit(0L)), lit((n - 1).toLong)).cast("int")
        val lB = lTagged.withColumn("__bkt", bkt)
        val rB = rTagged.withColumn("__bkt", bkt)
        // One seed per (key, source bucket): the right carry a later
        // (backward) / earlier (forward) bucket would otherwise have to
        // reach across the shard boundary for. explode of an empty array
        // drops edge buckets with no targets.
        val bestCarry =
          if (direction == "backward") max_by(col("__carry"), col("__ts"))
          else min_by(col("__carry"), col("__ts"))
        val targets =
          if (direction == "backward")
            when(col("__bkt") < lit(n - 1),
              sequence(col("__bkt") + 1, lit(n - 1)))
              .otherwise(array().cast("array<int>"))
          else
            when(col("__bkt") > lit(0),
              sequence(lit(0), col("__bkt") - 1))
              .otherwise(array().cast("array<int>"))
        val seeds = rB.groupBy(col(key), col("__bkt"))
          .agg(bestCarry.as("__carry"))
          .select(col(key), col("__carry"), explode(targets).as("__bkt"))
          .select(Seq(col(key),
            col("__carry")("matched_ts").as("__ts"),
            lit(if (strict) 1 else 0).as("__tag"),
            col("__carry"), col("__bkt")) ++
            leftCols.filterNot(_ == key).map(c =>
              lit(null).cast(left.schema(c).dataType).as(c)): _*)
        (lB, rB.unionByName(seeds), Seq(col(key), col("__bkt")))
      }
    }

    // nulls-first in BOTH directions so a null-ts left row precedes every
    // right row and matches nothing (desc default would be nulls-last and
    // hand it the globally-last value)
    val ordering =
      if (direction == "backward") Seq(col("__ts").asc_nulls_first, col("__tag").asc)
      else Seq(col("__ts").desc_nulls_first, col("__tag").asc)
    val w = Window.partitionBy(partCols: _*).orderBy(ordering: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val isLeft = col("__tag") === lit(if (strict) 0 else 1)
    lIn.unionByName(rIn, allowMissingColumns = true)
      .select(Seq(col(key), col("__ts"), col("__tag"),
        last(col("__carry"), ignoreNulls = true).over(w).as("__carry")) ++
        leftCols.filterNot(_ == key).map(col): _*)
      .filter(isLeft)
      .select(Seq(col(key)) ++ leftCols.filterNot(_ == key).map(col) ++
        (col("__carry")("matched_ts").as("matched_ts") +:
          rightCols.map(c => col("__carry")(c).as(c))): _*)
  }

  /** Point-in-interval join: rows of `points` matched to every `intervals`
    * row whose [lowCol, highCol) contains pointCol (`inclusiveHigh=true`
    * for closed intervals). All three columns must be LONG (callers
    * convert timestamps via `unix_seconds`/`unix_micros` first — explicit,
    * so the bucket width's unit is never ambiguous).
    *
    * `bucketWidth` trades fan-out for selectivity: intervals are exploded
    * to `ceil(span / bucketWidth)` cells, so pick it near the TYPICAL
    * interval span (one cell per interval) — too small multiplies the
    * interval side, too large packs unrelated intervals into each cell and
    * the residual filter does the work. Pass `bucketWidth = 0` to DERIVE
    * it from the data: one small aggregate reads the median interval span
    * (the "one cell per typical interval" rule applied automatically, run
    * eagerly at call time — a bounded driver scalar, like the sampling
    * strata probe). `maxCellsPerInterval` fails fast (at runtime, per
    * row) on degenerate giant intervals instead of letting one row
    * explode into millions — with a derived width it also bounds the
    * damage a heavy-tailed span distribution can do (median-sized cells,
    * outlier-sized intervals).
    *
    * Inner-join semantics: points matching no interval are dropped.
    */
  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      lowCol: String,
      highCol: String,
      bucketWidth: Long,
      inclusiveHigh: Boolean = false,
      maxCellsPerInterval: Int = 4096): DataFrame = {
    require(bucketWidth >= 0, "bucketWidth must be positive (or 0 = derive)")
    val collisions = points.columns.toSet.intersect(intervals.columns.toSet)
    require(collisions.isEmpty,
      s"points/intervals column collision: ${collisions.mkString(",")}")
    val reserved = Set("__cell", "__pt", "__lo", "__hi", "__c0", "__c1")
    val clashes = reserved.intersect(points.columns.toSet ++ intervals.columns)
    require(clashes.isEmpty,
      s"reserved column names in use: ${clashes.mkString(",")}")
    // enforce the documented LONG-only contract: a silent cast of DOUBLE
    // bounds would TRUNCATE them, and the half-open `high - 1` trick then
    // drops sub-unit intervals entirely (wrong results, not an error)
    Seq(points.schema(pointCol) -> pointCol,
        intervals.schema(lowCol) -> lowCol,
        intervals.schema(highCol) -> highCol).foreach { case (f, n) =>
      require(f.dataType == org.apache.spark.sql.types.LongType ||
          f.dataType == org.apache.spark.sql.types.IntegerType,
        s"rangeJoin column $n must be integral (long/int), got ${f.dataType}; " +
          "convert timestamps with unix_seconds/unix_micros first")
    }

    val width: Long =
      if (bucketWidth > 0) bucketWidth
      else {
        val row = intervals
          .filter(col(lowCol).isNotNull && col(highCol).isNotNull)
          .select((col(highCol).cast("long") - col(lowCol).cast("long"))
            .as("__span"))
          .filter(col("__span") >= 0)
          .agg(percentile_approx(col("__span"), lit(0.5), lit(1000))).head()
        if (row.isNullAt(0)) 1L else math.max(1L, row.getLong(0))
      }

    // exact floor division on longs: Spark's `/` on integers is DOUBLE
    // division (lossy past 2^53), so go through SQL DIV (truncates toward
    // zero) with the usual negative-remainder correction
    def floorDiv(c: String) =
      expr(s"CASE WHEN $c >= 0 OR $c % $width = 0 " +
        s"THEN $c DIV $width ELSE $c DIV $width - 1 END")

    val iCells = intervals
      .filter(col(lowCol).isNotNull && col(highCol).isNotNull)
      .withColumn("__lo", col(lowCol).cast("long"))
      .withColumn("__hi",
        col(highCol).cast("long") - lit(if (inclusiveHigh) 0L else 1L))
      .filter(col("__hi") >= col("__lo"))
      .withColumn("__c0", floorDiv("__lo"))
      .withColumn("__c1", floorDiv("__hi"))
      // the guard lives INSIDE the evaluated expression (a dropped
      // assert_true column would be pruned away and never fire)
      .withColumn("__cell", explode(
        when(col("__c1") - col("__c0") < lit(maxCellsPerInterval.toLong),
          sequence(col("__c0"), col("__c1")))
        .otherwise(raise_error(lit(
          s"rangeJoin: interval spans >= $maxCellsPerInterval cells; " +
            "raise bucketWidth or maxCellsPerInterval"))
          .cast("array<bigint>"))))
      .drop("__lo", "__hi", "__c0", "__c1")
    val pCells = points
      .filter(col(pointCol).isNotNull)
      .withColumn("__pt", col(pointCol).cast("long"))
      .withColumn("__cell", floorDiv("__pt"))
      .drop("__pt")

    val inRange =
      if (inclusiveHigh) col(pointCol) >= col(lowCol) && col(pointCol) <= col(highCol)
      else col(pointCol) >= col(lowCol) && col(pointCol) < col(highCol)
    pCells.join(iCells, Seq("__cell")).filter(inRange).drop("__cell")
  }

  /** Compact a timeline table to ONE row per key: `__asof_ts` (ascending
    * `array<bigint>`) plus one aligned array per value column. This is the
    * build side of `asofJoinIndexed` — the shape that makes as-of legal on
    * a STREAM (window functions aren't; an equi-join plus per-row binary
    * search is).
    *
    * `rightTs` must be integral (convert timestamps with
    * `unix_micros` first). Each key's whole timeline becomes one row, so
    * this is for dimension-style histories (model checkpoints, config
    * versions, price snapshots) — `maxPerKey` fails fast (at runtime) on a
    * key whose history wouldn't fit a row, rather than silently building a
    * multi-GB array. */
  def compactTimeline(
      right: DataFrame,
      key: String,
      rightTs: String,
      valueCols: Seq[String],
      maxPerKey: Int = 1000000): DataFrame = {
    require(!valueCols.contains("__t"), "valueCols may not use the name __t")
    val fields = struct((col(rightTs).cast("long").as("__t") +:
      valueCols.map(col)): _*)
    // struct sort is lexicographic by field order -> ascending by ts, value
    // ties broken deterministically by the value fields
    val tl = sort_array(collect_list(fields))
    val guarded = when(size(tl) <= lit(maxPerKey), tl)
      .otherwise(raise_error(lit(
        s"compactTimeline: key exceeds $maxPerKey timeline entries")))
    right
      .filter(col(rightTs).isNotNull)
      .groupBy(col(key))
      .agg(guarded.as("__tl"))
      .select(col(key) +: (col("__tl")("__t").as("__asof_ts") +:
        valueCols.map(c => col("__tl")(c).as(s"__asof_$c"))): _*)
  }

  /** As-of join against a compacted timeline (from `compactTimeline`):
    * equi-join on the key, then an O(log n) `asof_index` binary search per
    * row — no window function, so this SAME call works on a streaming
    * `left` against a static timeline (stream-static left join + projection
    * are both streaming-legal). Semantics match `asofJoin(direction =
    * "backward")`: greatest right ts <= left ts, left rows preserved,
    * unmatched rows carry nulls, plus a `matched_ts` column — here always
    * LONG (the timeline stores integral ts), where `asofJoin` preserves
    * the right column's original type. Null keys never match on either
    * path.
    *
    * Requires `GraftSession.prepare` (registers `asof_index`). The batch
    * `asofJoin` stays preferable when both sides are large and fine-grained
    * (it never widens a row to a whole timeline); this one is for
    * dimension-style histories probed by a big fact/stream side. */
  def asofJoinIndexed(
      left: DataFrame,
      timeline: DataFrame,
      key: String,
      leftTs: String,
      rightCols: Seq[String]): DataFrame = {
    val collisions = (("matched_ts" +: rightCols).toSet).intersect(left.columns.toSet)
    require(collisions.isEmpty,
      s"right columns collide with left columns: ${collisions.mkString(",")}")
    require(!left.columns.contains("__idx"),
      "left side may not have a column named __idx")
    val idx = graft.GraftFunctions.asofIndex(
      col("__asof_ts"), col(leftTs).cast("long"))
    left
      .join(timeline, Seq(key), "left")
      .withColumn("__idx", idx)
      .withColumn("matched_ts", element_at(col("__asof_ts"), col("__idx")))
      .select(left.columns.map(col) ++
        Seq(col("matched_ts")) ++
        rightCols.map(c => element_at(col(s"__asof_$c"), col("__idx")).as(c)): _*)
  }
}
