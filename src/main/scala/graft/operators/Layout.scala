package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT for scan pruning — the Z-order
  * (Morton-curve) clustering that Delta `OPTIMIZE ZORDER BY` and
  * Iceberg's sort-order rewrite apply before writing files (Morton
  * 1966; Bayer's UB-tree line of work is the published basis).
  *
  * Why it matters at 100 TB: parquet readers prune files/row-groups by
  * per-column min/max statistics. Sorting by ONE column makes that
  * column's ranges tight and every other column's ranges full-width —
  * a filter on the second column prunes nothing. Interleaving the bits
  * of d columns into one sort key gives every participating column
  * ranges of width ~range/2^(bits-k) per file, so selective filters on
  * ANY of them skip most of the data. The whole transform is scan-local
  * arithmetic plus the one range exchange the write needs anyway.
  *
  * Everything here is exact integer math (quantization by long
  * multiply/floor-divide, interleave by shift/mask/add), so bucket
  * assignments replay bit-for-bit in any engine — no float rank, no
  * sampled partitioner in the verified path.
  */
object Layout {

  /** Quantize a long column from the closed domain [min, max] onto
    * [0, 2^bits) by exact integer affine scaling:
    * `q = (x - min) * 2^bits div (max - min + 1)`.
    *
    * Monotone (order-preserving) and endpoint-exact: x = min -> 0,
    * x = max -> 2^bits - 1. Caller supplies the domain — at scale these
    * are two bounded scalars from an `agg(min, max)` pass or known
    * metadata; keeping them literal keeps the expression codegen'd and
    * replayable. Overflow bound: `(max - min) * 2^bits < 2^63`, i.e. a
    * domain width up to 2^47 at the default 16 bits — raise an error
    * early rather than wrap.
    *
    * PRECONDITION: values outside [min, max] quantize outside
    * [0, 2^bits) — a negative q feeds sign-extended garbage into
    * [[zValue]]'s bit interleave, and an oversized q aliases into low
    * z bits. Derive the domain from the data (`agg(min, max)`, as the
    * zo01/zo02 lanes do) or clamp upstream. */
  def quantize(x: Column, min: Long, max: Long, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    require(max >= min, s"empty domain [$min, $max]")
    require(
      (max - min) <= (Long.MaxValue >> bits),
      s"domain width ${max - min} * 2^$bits would overflow a long")
    val width = max - min + 1L
    graft.functions.TextFunctions.ldiv((x.cast("long") - lit(min)) * lit(1L << bits), lit(width))
  }

  /** Morton/Z-value of d pre-quantized columns (each in [0, 2^bits)):
    * bit k of column i lands at output bit `k*d + i`, so the low bits of
    * every dimension interleave first and nearby (x, y, ...) points get
    * nearby z values. Unrolled shift/mask/multiply sum — d*bits terms of
    * plain long arithmetic, inside whole-stage codegen, replayable as
    * the same `>> & *` chain in any SQL engine. Bound: d * bits <= 62
    * (the z value itself must fit a positive long). */
  def zValue(qs: Seq[Column], bits: Int): Column = {
    val d = qs.size
    require(d >= 1, "zValue needs at least one column")
    require(d * bits <= 62, s"d*bits = ${d * bits} exceeds 62 (long z overflow)")
    val terms = for {
      (q, i) <- qs.zipWithIndex
      k <- 0 until bits
    } yield (shiftright(q, k).bitwiseAND(lit(1L))) * lit(1L << (k * d + i))
    terms.reduce(_ + _)
  }

  /** Fixed-width z-range bucket id in [0, nBuckets):
    * `bucket = z * nBuckets div 2^(d*bits)` — the deterministic stand-in
    * for a range partitioner's boundaries (Spark's `repartitionByRange`
    * SAMPLES its boundaries, so the verified path uses value-based
    * cuts instead; the write path below uses the real partitioner). */
  def zBucket(z: Column, dBits: Int, nBuckets: Int): Column = {
    require(nBuckets >= 1, "nBuckets must be positive")
    // the PRODUCT must fit a long: z < 2^dBits times nBuckets — a bound
    // on dBits alone lets z * nBuckets wrap negative for large bucket
    // counts and corrupt the bucket domain with no error
    val bucketBits = 64 - java.lang.Long.numberOfLeadingZeros(nBuckets.toLong)
    require(dBits + bucketBits <= 62,
      s"z domain (2^$dBits) times nBuckets ($nBuckets) would overflow a long")
    graft.functions.TextFunctions.ldiv(z * lit(nBuckets.toLong), lit(1L << dBits))
  }

  /** Per-bucket locality summary — the observability face of the
    * layout: quantize `cols` (long-typed) onto `bits` bits each from
    * their literal [min, max] domains, interleave, cut the z domain into
    * `nBuckets` fixed ranges, and report per bucket the row count and
    * each dimension's min/max. Tight per-bucket ranges on EVERY column
    * are exactly what parquet min/max pruning consumes; the summary is
    * what an OPTIMIZE job would log. One scan, one `nBuckets`-wide
    * aggregation — no other exchange.
    *
    * Output: (bucket, n_rows, <col>_min, <col>_max ...), ordered by
    * bucket. */
  def zorderBuckets(
      df: DataFrame,
      cols: Seq[String],
      domains: Seq[(Long, Long)],
      bits: Int = 16,
      nBuckets: Int = 16): DataFrame = {
    require(cols.nonEmpty && cols.size == domains.size,
      "cols and domains must align and be non-empty")
    // select(col("*"), ...bucket) + the summary agg claim these names;
    // an input already carrying them would be ambiguous or silently
    // regroup (same reserved-column convention as the Sampling ops)
    val reserved = Seq("bucket", "n_rows")
    require(!reserved.exists(df.columns.contains),
      s"input must not carry reserved columns ${reserved.mkString("/")}")
    val qs = cols.zip(domains).map { case (c, (mn, mx)) =>
      quantize(col(c), mn, mx, bits)
    }
    val aggs = cols.flatMap(c => Seq(
      min(col(c)).as(s"${c}_min"), max(col(c)).as(s"${c}_max")))
    df.select(col("*"),
        zBucket(zValue(qs, bits), cols.size * bits, nBuckets).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .orderBy("bucket")
  }

  /** Pruning WHAT-IF: how many files would a selective filter on
    * `filterCol` skip under (a) a single-column sort on `cols.head`
    * versus (b) the Z-order interleave of both columns — the number an
    * OPTIMIZE planner reports before committing to a rewrite. A bucket
    * stands for one output file; it is prunable iff its
    * [min, max] range of `filterCol` misses the closed predicate range
    * [lo, hi] — exactly the min/max-stats test a parquet reader runs.
    *
    * All bucketing is the exact integer arithmetic above, so both
    * layouts' counts replay bit-for-bit in any engine. Cost: one scan
    * per layout (a diagnostic, not a hot path — feed a sample at
    * extreme scale); each scan feeds one nBuckets-domain aggregation.
    *
    * Output: two rows (layout ∈ single_sort|zorder; n_buckets,
    * n_pruned, rows_scanned), ordered by layout. */
  def pruningComparison(
      df: DataFrame,
      cols: Seq[String],
      domains: Seq[(Long, Long)],
      filterCol: String,
      lo: Long,
      hi: Long,
      bits: Int = 8,
      nBuckets: Int = 16): DataFrame = {
    require(cols.size == 2 && cols.size == domains.size,
      "pruningComparison compares a 2-column layout")
    require(cols.contains(filterCol), s"$filterCol must be a layout column")
    require(lo <= hi, s"empty predicate range [$lo, $hi]")
    val qs = cols.zip(domains).map { case (c, (mn, mx)) =>
      quantize(col(c), mn, mx, bits)
    }
    val missed = col("fmax") < lo || col("fmin") > hi
    def layoutStats(name: String, bucket: Column): DataFrame =
      df.select(bucket.as("bucket"), col(filterCol))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          min(filterCol).as("fmin"), max(filterCol).as("fmax"))
        .agg(
          count(lit(1)).as("n_buckets"),
          sum(when(missed, 1L).otherwise(0L)).as("n_pruned"),
          sum(when(missed, 0L).otherwise(col("n_rows"))).as("rows_scanned"))
        .select(lit(name).as("layout"), col("n_buckets"),
          col("n_pruned"), col("rows_scanned"))
    layoutStats("single_sort", zBucket(qs.head, bits, nBuckets))
      .unionByName(
        layoutStats("zorder", zBucket(zValue(qs, bits), 2 * bits, nBuckets)))
      .orderBy("layout")
  }

  /** The write path: one column per dimension quantized from its domain,
    * the rows range-partitioned and sorted by z value so each output
    * file covers one tight z range (= one small hyper-rectangle in the
    * original columns). `numPartitions` sizes the files; follow with
    * `.write.parquet(...)` — the sort makes parquet's row-group min/max
    * stats tight on every participating column. Uses Spark's sampled
    * range partitioner (the production-correct choice for skewed z
    * distributions); the z VALUE is still the exact deterministic
    * arithmetic above. */
  def zorderLayout(
      df: DataFrame,
      cols: Seq[String],
      domains: Seq[(Long, Long)],
      bits: Int = 16,
      numPartitions: Int = 200): DataFrame = {
    val qs = cols.zip(domains).map { case (c, (mn, mx)) =>
      quantize(col(c), mn, mx, bits)
    }
    df.withColumn("graft_z", zValue(qs, bits))
      .repartitionByRange(numPartitions, col("graft_z"))
      .sortWithinPartitions("graft_z")
      .drop("graft_z")
  }
}
