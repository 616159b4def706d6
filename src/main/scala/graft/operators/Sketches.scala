package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{PortableHash, TextFunctions}

/** Engine-portable streaming sketches whose INTERNALS replay exactly in
  * any SQL engine: HyperLogLog register tables (Flajolet et al. 2007),
  * KMV / bottom-k distinct estimation (Bar-Yossef et al. 2002), and
  * Count-Min frequency cells (Cormode & Muthukrishnan 2005).
  *
  * Spark's own `approx_count_distinct` / `count_min_sketch` are the
  * 100 TB defaults (densely-coded HLL++ registers, partial-mergeable) —
  * this family exists because their binary internals cannot be
  * value-checked across engines. Here every register/cell is a plain
  * integer derived from the portable md5 hash family, so a DuckDB oracle
  * can rebuild the sketch bit-for-bit; the estimates use only IEEE steps
  * that are correctly rounded everywhere (divisions by powers of two,
  * one libm log2 under the house micro-rounding convention).
  *
  * Scale design: every sketch is a bounded-domain aggregation over the
  * token scan — 2^p HLL buckets, d·w Count-Min cells, k bottom hashes —
  * so partial (map-side) aggregation collapses per-task volume to the
  * sketch size before the exchange and the shuffle is O(sketch), never
  * O(corpus). Nothing here moves text: only 8-byte hashes and counters.
  */
object Sketches {

  private def ldiv(a: Column, b: Column): Column =
    TextFunctions.ldiv(a, b)

  /** Non-empty whitespace tokens, one row per occurrence. */
  private def tokenStream(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)

  /** HyperLogLog register table over the distinct tokens of `textCol`:
    * the top `p` bits of the portable 32-bit hash pick one of m = 2^p
    * buckets, and the register is the maximum rank (position of the
    * first set bit, counted from the left) of the remaining 32-p bits.
    * `rho = (32-p) + 1 - length(bin(w))` needs no bit-twiddling
    * builtins — `bin()` (binary string without leading zeros) exists
    * identically in Spark and DuckDB; the all-zero remainder takes the
    * conventional maximal rank 32-p+1.
    *
    * Duplicates need no pre-distinct: max() over repeated tokens is the
    * set semantics for free, so this is ONE m-domain aggregation over
    * the scan (map-side combined, ~zero shuffle at any corpus size).
    * Only non-empty buckets appear; [[hllEstimate]] re-adds the zeros.
    *
    * Output: (bucket, register) longs, at most 2^p rows. */
  def hllRegisters(docs: DataFrame, textCol: String, p: Int = 4): DataFrame = {
    require(p >= 1 && p <= 16, s"p=$p out of range")
    val wBits = 32 - p
    val mod = 1L << wBits
    tokenStream(docs, textCol)
      .select(PortableHash.h32(col("tok")).as("h"))
      .select(ldiv(col("h"), lit(mod)).as("bucket"),
        (col("h") % mod).as("w"))
      .select(col("bucket"),
        when(col("w") === 0L, lit(wBits + 1).cast("long"))
          .otherwise(lit(wBits + 1) - length(bin(col("w")))).as("rho"))
      .groupBy(col("bucket"))
      .agg(max(col("rho")).as("register"))
  }

  /** Per-document HLL register CONTRIBUTIONS — the state frame
    * [[Incremental.maintainRegisterMax]] folds under snapshot deltas.
    * One row per (document, non-empty bucket): the doc's own maximal
    * rank for that bucket, derived by the exact hash/bucket/rho chain
    * of [[hllRegisters]], so `max(rho)` over this frame per bucket IS
    * the register table (SketchesSpec pins the identity). Linear in
    * min(doc count × 2^p, token volume) — the same posting-frame
    * shape the dedup families persist; only 8-byte integers, never
    * text. Batch callers should keep using [[hllRegisters]] (one
    * m-domain agg, no per-doc shuffle); this frame exists so a daily
    * snapshot only re-tokenizes its delta. */
  def hllContrib(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      p: Int = 4): DataFrame = {
    require(p >= 1 && p <= 16, s"p=$p out of range")
    val wBits = 32 - p
    val mod = 1L << wBits
    docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol), PortableHash.h32(col("tok")).as("h"))
      .select(col(idCol), ldiv(col("h"), lit(mod)).as("bucket"),
        (col("h") % mod).as("w"))
      .select(col(idCol), col("bucket"),
        when(col("w") === 0L, lit(wBits + 1).cast("long"))
          .otherwise(lit(wBits + 1) - length(bin(col("w")))).as("rho"))
      .groupBy(col(idCol), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  /** [[hllContrib]] carrying a group column — the state frame a
    * per-group sketch family ([[groupedHllRegisters]]) needs under
    * snapshot deltas: one (id, group, non-empty bucket, own max rank)
    * row per document, so `max(rho)` per (group, bucket) IS the
    * grouped register table (SketchesSpec pins the identity) and
    * [[Incremental.maintainRegisterMax]] with
    * `keyCols = Seq(groupCol, "bucket")` folds the whole family in one
    * delta-bounded pass. The group value is the DOCUMENT's — rows fold
    * by id, so a doc whose group changes across snapshots moves its
    * contributions with it. */
  def groupedHllContrib(
      docs: DataFrame,
      idCol: String,
      groupCol: String,
      textCol: String,
      p: Int = 4): DataFrame = {
    require(p >= 1 && p <= 16, s"p=$p out of range")
    val wBits = 32 - p
    val mod = 1L << wBits
    docs.select(col(idCol), col(groupCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol), col(groupCol), PortableHash.h32(col("tok")).as("h"))
      .select(col(idCol), col(groupCol), ldiv(col("h"), lit(mod)).as("bucket"),
        (col("h") % mod).as("w"))
      .select(col(idCol), col(groupCol), col("bucket"),
        when(col("w") === 0L, lit(wBits + 1).cast("long"))
          .otherwise(lit(wBits + 1) - length(bin(col("w")))).as("rho"))
      .groupBy(col(idCol), col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("rho"))
  }

  /** [[hllRegisters]] keyed by a group column — per-source /
    * per-language distinct sketches, the observability table a corpus
    * datasheet reports when exact per-group distincts stop scaling.
    * Identical hash/bucket/rho chain; ONE (group × 2^p)-domain
    * aggregation (map-side combined — the register frame is bounded by
    * group-domain · m at any corpus size). Per-group slices equal the
    * global operator over the group's slice (SketchesSpec pins it),
    * and register-wise `max` merges stay free across groups, unions,
    * and snapshots. Output: (groupCol, bucket, register). */
  def groupedHllRegisters(
      docs: DataFrame,
      groupCol: String,
      textCol: String,
      p: Int = 4): DataFrame = {
    require(p >= 1 && p <= 16, s"p=$p out of range")
    val wBits = 32 - p
    val mod = 1L << wBits
    docs
      .select(col(groupCol),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(groupCol), PortableHash.h32(col("tok")).as("h"))
      .select(col(groupCol), ldiv(col("h"), lit(mod)).as("bucket"),
        (col("h") % mod).as("w"))
      .select(col(groupCol), col("bucket"),
        when(col("w") === 0L, lit(wBits + 1).cast("long"))
          .otherwise(lit(wBits + 1) - length(bin(col("w")))).as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).as("register"))
  }

  /** [[hllEstimate]] keyed by a group column — the same published
    * estimator (identical literals, branch, and rounding points)
    * evaluated per group over a [[groupedHllRegisters]] frame; every
    * floating step replays cross-engine for the same reasons (the 2^−r
    * terms are exact binary fractions, so the per-group sums are exact
    * in any order). Output: one row per group —
    * (groupCol, m, v_zero, raw_est_micro, lc_est_micro, est_micro). */
  def groupedHllEstimate(
      registers: DataFrame,
      groupCol: String,
      p: Int = 4): DataFrame = {
    val m = 1 << p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => throw new IllegalArgumentException(
        s"p=$p: keep p in 4..6 so alpha_m is a published literal")
    }
    registers
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("nb"),
        sum(lit(1.0) / call_function("shiftleft", lit(1L),
          col("register").cast("int")).cast("double")).as("s_nonzero"))
      .select(col(groupCol), lit(m.toLong).as("m"),
        when(col("nb") > m.toLong, raise_error(lit(
          s"groupedHllEstimate: a group has more than 2^p = $m buckets" +
            " — p does not match the frame")))
          .otherwise(lit(m.toLong) - col("nb")).as("v_zero"),
        (coalesce(col("s_nonzero"), lit(0.0)) +
          (lit(m.toLong) - col("nb")).cast("double")).as("s"))
      .select(col(groupCol), col("m"), col("v_zero"),
        ((lit(alpha) * lit(m.toDouble * m.toDouble)) / col("s")).as("raw"))
      .select(col(groupCol), col("m"), col("v_zero"),
        round(col("raw") * lit(1000000.0)).cast("long").as("raw_est_micro"),
        when(col("v_zero") > 0L,
          round(((lit(m.toDouble) *
            log2(lit(m.toDouble) / col("v_zero").cast("double"))) *
            lit(0.6931471805599453)) * lit(1000000.0)).cast("long"))
          .as("lc_est_micro"),
        col("raw").as("__raw"))
      .select(col(groupCol), col("m"), col("v_zero"),
        col("raw_est_micro"), col("lc_est_micro"),
        when(col("__raw") <= lit(2.5 * m) && col("v_zero") > 0L,
          col("lc_est_micro")).otherwise(col("raw_est_micro"))
          .as("est_micro"))
  }

  /** The published HLL estimator over a [[hllRegisters]] frame, in
    * micro-units: raw = alpha_m · m² / Σ 2^(−register) (empty buckets
    * contribute 2^0 = 1), with the small-range linear-counting
    * correction m·ln(m/V) when raw ≤ 2.5·m and V (zero buckets) > 0.
    *
    * Every floating step replays across engines: 2^(−r) is an exact
    * IEEE division of 1.0 by an exact power of two, the sum of those
    * binary fractions is exact (exponent span < 53 bits at p ≤ 16), the
    * alpha_m·m² product and final division are single correctly-rounded
    * operations, and ln(m/V) routes through libm log2 (the lm01/psi
    * convention) times a literal ln 2 — each rounded to micro at the
    * end only. `p` is restricted to the published small-m alpha table
    * so alpha_m stays a literal, not a pow().
    *
    * Output: one row (m, v_zero, raw_est_micro, lc_est_micro,
    * est_micro); lc_est_micro is null outside the correction branch. */
  def hllEstimate(registers: DataFrame, p: Int = 4): DataFrame = {
    val m = 1 << p
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => throw new IllegalArgumentException(
        s"p=$p: keep p in 4..6 so alpha_m is a published literal")
    }
    registers
      .agg(count(lit(1)).as("nb"),
        sum(lit(1.0) / call_function("shiftleft", lit(1L),
          col("register").cast("int")).cast("double")).as("s_nonzero"))
      // loud failure on a p mismatch with the registers frame: more
      // buckets than 2^p would otherwise yield a silently negative
      // v_zero and a garbage estimate
      .select(lit(m.toLong).as("m"),
        when(col("nb") > m.toLong, raise_error(lit(
          s"hllEstimate: registers frame has more than 2^p = $m buckets" +
            " — p does not match the frame")))
          .otherwise(lit(m.toLong) - col("nb")).as("v_zero"),
        (coalesce(col("s_nonzero"), lit(0.0)) +
          (lit(m.toLong) - col("nb")).cast("double")).as("s"))
      .select(col("m"), col("v_zero"),
        ((lit(alpha) * lit(m.toDouble * m.toDouble)) / col("s")).as("raw"))
      .select(col("m"), col("v_zero"),
        round(col("raw") * lit(1000000.0)).cast("long").as("raw_est_micro"),
        when(col("v_zero") > 0L,
          round(((lit(m.toDouble) *
            log2(lit(m.toDouble) / col("v_zero").cast("double"))) *
            lit(0.6931471805599453)) * lit(1000000.0)).cast("long"))
          .as("lc_est_micro"),
        col("raw").as("__raw"))
      .select(col("m"), col("v_zero"), col("raw_est_micro"),
        col("lc_est_micro"),
        when(col("__raw") <= lit(2.5 * m) && col("v_zero") > 0L,
          col("lc_est_micro")).otherwise(col("raw_est_micro"))
          .as("est_micro"))
  }

  /** KMV (bottom-k) distinct-count sketch over the tokens of `textCol`:
    * keep the k smallest DISTINCT portable 60-bit hashes; the k-th
    * smallest order statistic estimates distinct = (k−1) · 2^60 / h_k
    * — exact integer arithmetic end to end (the product is widened to
    * decimal(38,0) / HUGEINT before the floor division, since
    * (k−1)·2^60 overflows a long for k ≥ 9). Fewer than k distinct
    * hashes means the sketch holds the whole set and IS the exact
    * count.
    *
    * The distinct is a vocabulary-domain aggregation (map-side
    * combined) and the bottom-k is a TakeOrdered — no corpus-sized
    * shuffle, no sort.
    *
    * Output: one row (n_kept, kth_min, est_distinct). */
  def kmvDistinct(docs: DataFrame, textCol: String, k: Int = 16): DataFrame =
    kmvFromHashes(
      tokenStream(docs, textCol)
        .select(PortableHash.h60(col("tok")).as("h"))
        .groupBy(col("h")).agg(count(lit(1)).as("__n")).drop("__n"),
      k)

  /** The bottom-k + estimator tail of [[kmvDistinct]] over an already-
    * distinct hash frame (h) — factored so a MAINTAINED vocabulary
    * table (the kv02 incremental path: distinct per-doc hash
    * contributions folded additively into (h, holder-count) rows) feeds
    * the identical estimate. The TakeOrdered is map-side min-k — no
    * sort, no corpus-sized shuffle, at any vocabulary size. */
  def kmvFromHashes(hashes: DataFrame, k: Int = 16): DataFrame = {
    require(k >= 2, s"k=$k too small")
    hashes.select(col("h"))
      .orderBy(col("h")).limit(k)
      .agg(count(lit(1)).as("n_kept"), max(col("h")).as("kth_min"))
      .select(col("n_kept"), col("kth_min"),
        when(col("n_kept") < lit(k.toLong), col("n_kept"))
          .otherwise(ldiv(lit(k - 1).cast("decimal(38,0)") *
            lit(1152921504606846976L), col("kth_min")))
          .as("est_distinct"))
  }

  /** Per-document DISTINCT 60-bit token-hash memberships — the state
    * frame the kv02 incremental KMV path folds: a hash survives the
    * corpus while ≥ 1 document holds it, so holder counts are additive
    * over documents ([[Incremental.maintainGroupSums]] count-only) and
    * the maintained (h, holder-count) vocabulary table re-derives the
    * sketch via [[kmvFromHashes]] with no re-tokenization. */
  def kmvContrib(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol), PortableHash.h60(col("tok")).as("h"))
      .distinct()

  /** Pairwise source-similarity matrix via bottom-k (KMV) vocabulary
    * sketches — the corpus-mixture-design table: which sources share
    * vocabulary, estimated from k-sized sketches instead of a full
    * |vocab_a ∩ vocab_b| join. Standard bottom-k union estimator
    * (Bar-Yossef et al. 2002; Broder's min-wise resemblance): for each
    * pair, J ≈ |bottomK(S_a ∪ S_b) ∩ S_a ∩ S_b| / k — an element of A
    * in the union's bottom-k is necessarily in A's own bottom-k, so the
    * sketches suffice. When the merged sketch holds fewer than k hashes
    * both vocabularies were kept whole and the estimate IS the exact
    * Jaccard (denominator = union size).
    *
    * Scale: the vocabulary pass is a distinct (source, 60-bit hash)
    * aggregation (map-side combined); per-source bottom-k is the exact
    * two-level salted min-k (the stratifiedFixedSample / linkPrediction
    * discipline — no source's vocabulary ever sorts in one task); all
    * pair work happens on k-bounded sketches, |sources|²·2k rows total.
    * Only hashes move. Sources with an empty vocabulary have no sketch
    * and appear in no pair. The PAIR DOMAIN itself is quadratic in the
    * number of distinct sources (a deliberate all-pairs over sources,
    * not rows) — fine for the handfuls-to-hundreds of sources a mixture
    * table describes; at thousands of sources the |sources|²·2k merged
    * frame dominates and callers should pre-filter to the sources under
    * comparison.
    *
    * Output: (src_a, src_b, union_kept, inter_k, est_jaccard_micro,
    * exact), src_a < src_b, one row per source pair; `exact` marks pairs
    * whose merged sketch held the whole union (union_kept < k), where
    * the estimate IS the true Jaccard — it makes the policy table
    * self-describing. */
  def sourceJaccard(
      docs: DataFrame,
      srcCol: String,
      textCol: String,
      k: Int = 64): DataFrame =
    mergedBottomK(docs, srcCol, textCol, k)
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("union_kept"),
        sum(when(col("in_a") + col("in_b") === 2L, 1L).otherwise(0L))
          .as("inter_k"))
      .select(col("src_a"), col("src_b"), col("union_kept"), col("inter_k"),
        ldiv(col("inter_k") * lit(1000000L), col("union_kept"))
          .as("est_jaccard_micro"),
        (col("union_kept") < lit(k.toLong)).as("exact"))

  /** Directional containment estimates from the SAME merged-bottom-k
    * frame as [[sourceJaccard]] — the dedup-policy table ("B contains
    * 90% of A's vocabulary → fold A into B") that symmetric Jaccard
    * cannot answer. The union's bottom-k is a uniform hash-order
    * sample of A ∪ B, so among it the fraction of A-side elements also
    * present in B is a ratio estimator of |A∩B| / |A|. Exact when the
    * merged sketch holds the whole union. A side that contributed
    * nothing to the union's bottom-k (a_kept = 0 — its smallest hashes
    * all rank past k) reports containment 0 rather than dividing by
    * zero. Same |sources|² pair-domain note as [[sourceJaccard]]: the
    * cost is quadratic in DISTINCT SOURCES (k-bounded per pair), so
    * pre-filter at thousands of sources.
    *
    * Output: (src_a, src_b, a_kept, b_kept, inter_k,
    * containment_a_micro, containment_b_micro, exact), src_a < src_b;
    * containment_a is the A-in-B direction; `exact` marks pairs whose
    * merged sketch held the whole union (union kept < k) — there both
    * ratios are true containments, not estimates. */
  def sourceContainment(
      docs: DataFrame,
      srcCol: String,
      textCol: String,
      k: Int = 64): DataFrame = {
    val inter =
      sum(when(col("in_a") + col("in_b") === 2L, 1L).otherwise(0L))
    mergedBottomK(docs, srcCol, textCol, k)
      .groupBy(col("src_a"), col("src_b"))
      .agg(sum(col("in_a")).as("a_kept"),
        sum(col("in_b")).as("b_kept"),
        inter.as("inter_k"),
        count(lit(1)).as("__union_kept"))
      .select(col("src_a"), col("src_b"), col("a_kept"), col("b_kept"),
        col("inter_k"),
        when(col("a_kept") === 0L, lit(0L))
          .otherwise(ldiv(col("inter_k") * lit(1000000L), col("a_kept")))
          .as("containment_a_micro"),
        when(col("b_kept") === 0L, lit(0L))
          .otherwise(ldiv(col("inter_k") * lit(1000000L), col("b_kept")))
          .as("containment_b_micro"),
        (col("__union_kept") < lit(k.toLong)).as("exact"))
  }

  /** The shared pair frame of [[sourceJaccard]] / [[sourceContainment]]:
    * per-source bottom-k sketches (exact two-level salted min-k — no
    * source's vocabulary ever sorts in one task), exploded over the
    * source-pair domain, merged per (pair, hash) with membership flags,
    * and cut to each pair's union bottom-k. ≤ |sources|²·k rows out. */
  private def mergedBottomK(
      docs: DataFrame,
      srcCol: String,
      textCol: String,
      k: Int): DataFrame = {
    require(k >= 2, s"k=$k too small")
    import org.apache.spark.sql.expressions.Window
    val vocab = docs
      .select(col(srcCol).as("src"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col("src"), PortableHash.h60(col("tok")).as("h"))
      .distinct()
    val level1 = Window.partitionBy(col("src"), col("__sub")).orderBy(col("h"))
    val level2 = Window.partitionBy(col("src")).orderBy(col("h"))
    val sig = vocab
      .withColumn("__sub", pmod(col("h"), lit(32L)))
      .withColumn("__r1", row_number().over(level1))
      .filter(col("__r1") <= k)
      .withColumn("__rk", row_number().over(level2))
      .filter(col("__rk") <= k)
      .select(col("src"), col("h"))
      // feeds the source list and both sides of the pair union
      .localCheckpoint(false)
    val srcs = sig.select(col("src")).distinct()
    val pairsDom = srcs.select(col("src").as("src_a"))
      .join(srcs.select(col("src").as("src_b")), col("src_a") < col("src_b"))
    val ea = pairsDom
      .join(sig.select(col("src").as("src_a"), col("h")), Seq("src_a"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(1L).as("in_a"), lit(0L).as("in_b"))
    val eb = pairsDom
      .join(sig.select(col("src").as("src_b"), col("h")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("h"),
        lit(0L).as("in_a"), lit(1L).as("in_b"))
    val merged = ea.unionByName(eb)
      .groupBy(col("src_a"), col("src_b"), col("h"))
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val w = Window.partitionBy(col("src_a"), col("src_b")).orderBy(col("h"))
    merged
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
  }

  /** Count-Min sketch cell table over token occurrences: d independent
    * rows, each hashing a token to one of w columns via the portable
    * 32-bit hash of a row-salted token ("cm<r>|" ++ tok — the md5
    * double-hash convention of the Bloom/LSH families); a cell is the
    * exact sum of occurrences hashing into it. The d·w-domain
    * aggregation map-side combines, so the shuffle is O(d·w) at any
    * corpus size.
    *
    * Output: (r, c, cnt), at most d·w rows. */
  def countMinCells(
      docs: DataFrame, textCol: String, d: Int = 4, w: Int = 64): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2, s"d=$d w=$w out of range")
    val cells = array((0 until d).map { r =>
      struct(lit(r.toLong).as("r"),
        (PortableHash.h32(concat(lit(s"cm$r|"), col("tok"))) % w).as("c"))
    }: _*)
    tokenStream(docs, textCol)
      .select(explode(cells).as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Per-document Count-Min cell CONTRIBUTIONS — the state frame
    * [[Incremental.maintainCountMinCells]] folds under snapshot
    * deltas. One row per (document, r, c) the doc's tokens hash into,
    * carrying the doc's exact occurrence count for that cell via the
    * identical row-salted hash chain as [[countMinCells]]; summing
    * `cnt` per (r, c) over this frame IS the cell table (SketchesSpec
    * pins the identity). At most d × (per-doc distinct tokens) rows
    * per document — the posting-frame shape, integers only. Batch
    * callers keep [[countMinCells]] (d·w-domain agg, no per-doc key);
    * this frame exists so a snapshot step only re-tokenizes its
    * delta. */
  def countMinContrib(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      d: Int = 4,
      w: Int = 64): DataFrame = {
    require(d >= 1 && d <= 16 && w >= 2, s"d=$d w=$w out of range")
    val cells = array((0 until d).map { r =>
      struct(lit(r.toLong).as("r"),
        (PortableHash.h32(concat(lit(s"cm$r|"), col("tok"))) % w).as("c"))
    }: _*)
    docs.select(col(idCol),
      explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .filter(length(col("tok")) > 0)
      .select(col(idCol), explode(cells).as("cell"))
      .groupBy(col(idCol), col("cell.r").as("r"), col("cell.c").as("c"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point queries against a [[countMinCells]] table: the estimate for
    * a token is the MIN over its d cells (the classic one-sided
    * overestimate), next to the exact count for calibration. The probe
    * cell coordinates are computed DRIVER-SIDE from the same md5 family
    * (PortableHash.md5_32 is the literal twin of the column hash), so
    * the lookup is a broadcast of |probes|·d literal rows — no corpus
    * scan beyond the exact-count aggregation, no shuffle join.
    *
    * Output: (tok, est, exact), one row per probe; absent tokens keep
    * est >= 0 (whatever collides into their cells) and exact = 0. */
  def countMinPoint(
      docs: DataFrame,
      textCol: String,
      probes: Seq[String],
      d: Int = 4,
      w: Int = 64): DataFrame = {
    require(probes.nonEmpty, "no probe tokens")
    val spark = docs.sparkSession
    import spark.implicits._
    val cells = countMinCells(docs, textCol, d, w)
    val probeCells = probes.flatMap { t =>
      (0 until d).map(r => (t, r.toLong, PortableHash.md5_32(s"cm$r|$t") % w))
    }.toDF("tok", "r", "c")
    val est = probeCells
      .join(cells, Seq("r", "c"), "left")
      .na.fill(0L, Seq("cnt"))
      .groupBy(col("tok")).agg(min(col("cnt")).as("est"))
    val exact = tokenStream(docs, textCol)
      .filter(col("tok").isin(probes: _*))
      .groupBy(col("tok")).agg(count(lit(1)).as("exact"))
    est.join(exact, Seq("tok"), "left").na.fill(0L, Seq("exact"))
  }
}
