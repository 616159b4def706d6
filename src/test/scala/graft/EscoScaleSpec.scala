package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.profile.Profiles
import graft.sources.EscoWarehouse
import graft.vector.{HashingEmbedder, SemanticSearch}

/** ESCO-path scale proof (the ScaleProof harness covers the corpus
  * lanes; this covers the warehouse/profile path, which was previously
  * gated only at fixture scale).
  *
  * A 10× warehouse is synthesized by replicating every table with
  * replica-suffixed URIs — 10 disjoint copies of the full graph, edges
  * staying within their copy because every URI column of a row gets the
  * SAME replica index. The golden ingest invariants must scale exactly
  * ×10 (the quirk semantics — Q2/Q3 empties, S4 silent drop — must stay
  * EXACTLY zero, not ×10), and profileSearch must remain ONE plan whose
  * shape is constant in both the corpus size and the hit count: the
  * join count of the optimized plan is pinned equal across limits and
  * across 1×/10×, which is precisely what kills the reference's 1+k
  * per-hit round-trip loop (src/semantic_search.py:205-214).
  */
class EscoScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val whBase = EscoWarehouse.build(spark, "/root/reference/ESCO")

  /** Replicate `df` k times, suffixing each URI column with the row's
    * replica index (same index across all columns of a row). */
  private def xk(df: DataFrame, uriCols: Seq[String], k: Int): DataFrame = {
    val withK = df.withColumn("__k", explode(sequence(lit(0), lit(k - 1))))
    uriCols.foldLeft(withK) { (d, c) =>
      d.withColumn(c, concat(col(c), lit("#r"), col("__k")))
    }.drop("__k")
  }

  private lazy val wh10 = EscoWarehouse(
    skills = xk(whBase.skills, Seq("conceptUri"), 10),
    occupations = xk(whBase.occupations, Seq("conceptUri"), 10),
    iscoGroups = xk(whBase.iscoGroups, Seq("conceptUri"), 10),
    broaderSkill = xk(whBase.broaderSkill, Seq("parentUri", "childUri"), 10),
    broaderIsco = xk(whBase.broaderIsco, Seq("parentUri", "childUri"), 10),
    broaderOccupation =
      xk(whBase.broaderOccupation, Seq("parentUri", "childUri"), 10),
    partOfIscoGroup =
      xk(whBase.partOfIscoGroup, Seq("occupationUri", "iscoUri"), 10),
    essentialFor = xk(whBase.essentialFor, Seq("skillUri", "occupationUri"), 10),
    optionalFor = xk(whBase.optionalFor, Seq("skillUri", "occupationUri"), 10),
    relatedSkill = xk(whBase.relatedSkill, Seq("srcUri", "dstUri"), 10),
    partOfSkillGroup =
      xk(whBase.partOfSkillGroup, Seq("skillUri", "groupUri"), 10))

  test("10x warehouse: golden node/edge invariants scale exactly x10") {
    assert(wh10.occupations.count() == 30390L)
    assert(wh10.iscoGroups.count() == 6190L)
    assert(wh10.skills.count() == 6400L)
    assert(wh10.skills.filter(col("isSkillGroup")).count() == 6400L)
    assert(wh10.broaderSkill.count() == 6360L)
    assert(wh10.broaderIsco.count() == 6090L)
    assert(wh10.partOfIscoGroup.count() == 30390L)
    // the quirk semantics stay EXACTLY empty at any scale
    assert(wh10.broaderOccupation.count() == 0L)
    assert(wh10.relatedSkill.count() == 0L)
    assert(wh10.partOfSkillGroup.count() == 0L)
  }

  test("10x warehouse: replica graphs are disjoint (no cross-replica edges)") {
    // every broaderIsco edge joins two URIs with the SAME replica suffix
    val crossed = wh10.broaderIsco
      .filter(substring_index(col("parentUri"), "#r", -1) =!=
        substring_index(col("childUri"), "#r", -1))
    assert(crossed.count() == 0L)
    // and node lookups still resolve: every partOfIscoGroup ISCO endpoint
    // exists in the replicated iscoGroups table (S4 semantics preserved)
    val dangling = wh10.partOfIscoGroup.join(
      wh10.iscoGroups.select(col("conceptUri").as("iscoUri")),
      Seq("iscoUri"), "left_anti")
    assert(dangling.count() == 0L)
  }

  private def joinCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.size

  test("profileSearch stays ONE plan: join count constant in limit and in corpus scale") {
    val search10 = new SemanticSearch(wh10, new HashingEmbedder(128))
    val searchBase = new SemanticSearch(whBase, new HashingEmbedder(128))
    val q = "chief technical director operations"
    val p3 = Profiles.profileSearch(wh10, search10, q, "occupation", 0.1, 3)
    val p10 = Profiles.profileSearch(wh10, search10, q, "occupation", 0.1, 10)
    val pBase = Profiles.profileSearch(whBase, searchBase, q, "occupation", 0.1, 10)
    val (j3, j10, jBase) = (joinCount(p3), joinCount(p10), joinCount(pBase))
    // a per-hit loop (the reference's 1+k round trips) would grow the
    // plan with the hit count; a per-replica rebuild would grow it with
    // corpus scale — both pinned flat
    assert(j3 == j10, s"plan shape varies with limit: $j3 vs $j10")
    assert(j10 == jBase, s"plan shape varies with corpus scale: $j10 vs $jBase")
    // and it actually answers at 10x: top-limit rows, scores descending
    val rows = p10.collect()
    assert(rows.nonEmpty && rows.length <= 10)
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }

  test("10x semantic search: top-k is replica-degenerate exactly 10 ways") {
    // every base hit now exists 10 times with an identical embedding, so
    // a top-30 search must return each surviving base URI exactly 10
    // times (score ties broken by uri asc — deterministic)
    val search10 = new SemanticSearch(wh10, new HashingEmbedder(128))
    val hits = search10.search("chief technical director operations",
      nodeType = "occupation", threshold = 0.1, limit = 30)
      .withColumn("base_uri", substring_index(col("uri"), "#r", 1))
      .groupBy(col("base_uri")).count()
      .collect()
    assert(hits.nonEmpty)
    // fully-included base URIs appear exactly 10x; at most one boundary
    // URI may be truncated by the limit
    val partial = hits.count(_.getLong(1) != 10L)
    assert(partial <= 1, s"replica counts: ${hits.map(_.getLong(1)).toSeq}")
  }

  test("10x graph analytics: triangle and k-core row counts scale exactly x10") {
    // the replica copies are disjoint, so every graph statistic computed
    // per node must replicate exactly — triangles and core membership
    // can't leak across replicas
    import graft.analytics.EscoAnalytics
    val tri1 = EscoAnalytics.topTriangles(whBase, n = 1000000)
    val tri10 = EscoAnalytics.topTriangles(wh10, n = 10000000)
    assert(tri10.count() == 10L * tri1.count())
    val core1 = EscoAnalytics.conceptCore(whBase, k = 2)
    val core10 = EscoAnalytics.conceptCore(wh10, k = 2)
    assert(core10.count() == 10L * core1.count())
    // per-degree histogram of the core replicates exactly x10
    val h1 = core1.groupBy("core_degree").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h10 = core10.groupBy("core_degree").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(h10 == h1.map { case (d, c) => d -> c * 10 })
  }

  test("10x HITS: per-label (hub, auth) score multisets replicate exactly x10") {
    // replicas are disjoint AND identical, so the global max-normalizer
    // equals every replica's local max — each score replays exactly, and
    // each (label, hub, auth) row appears exactly 10x as often
    import graft.analytics.EscoAnalytics
    val n = 200
    val s1 = EscoAnalytics.topHitsExact(whBase, n = n)
      .groupBy("preferredLabel", "hub_micro", "auth_micro").count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    val s10 = EscoAnalytics.topHitsExact(wh10, n = 10 * n)
      .groupBy("preferredLabel", "hub_micro", "auth_micro").count()
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    assert(s10 == s1.map { case (k, c) => k -> c * 10 })
  }

  test("10x label sketches: the cardinality row is scale-INVARIANT and BPE merges replicate") {
    import graft.analytics.EscoAnalytics
    // labels replicate verbatim (only URIs are suffixed), so the label
    // VOCABULARY is identical at 10x — the whole sketch row (exact
    // distinct, KMV estimate, HLL estimate) must be bit-identical:
    // cardinality sketches see sets, not multisets
    val c1 = EscoAnalytics.labelCardinality(whBase).head()
    val c10 = EscoAnalytics.labelCardinality(wh10).head()
    assert(c1.getLong(0) == c10.getLong(0))
    assert(c1.getLong(1) == c10.getLong(1))
    assert(c1.getLong(2) == c10.getLong(2))
    // BPE training sees word COUNTS x10: the merge sequence is identical
    // (argmax and ties are scale-free) with every pair_count x10
    val m1 = EscoAnalytics.labelBpeMerges(whBase, steps = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    val m10 = EscoAnalytics.labelBpeMerges(wh10, steps = 4).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m1.nonEmpty)
    assert(m10.toSeq == m1.map { case (s, a, b, c) => (s, a, b, c * 10) }.toSeq)
  }
}
