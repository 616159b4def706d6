package graft.cli

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkTestSession, TestWarehouse}
import graft.sources.EscoWarehouse

/** CLI smoke: every analyze subcommand (including the round-2 additions
  * and the anchored variants) runs end-to-end against a saved mini
  * warehouse without throwing. Output goes to stdout; the library-level
  * values are pinned in CatalogGapsSpec/EscoWarehouseSpec — this guards
  * the wiring. */
class EscoCliSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private lazy val whDir: String = {
    val dir = Files.createTempDirectory("graft-cli-wh").toString
    EscoWarehouse.save(TestWarehouse.build(spark), dir)
    dir
  }

  private val analyses = Seq(
    "node-counts", "rel-counts", "top-essential-skills",
    "top-optional-skills", "top-occupations", "isco-most-occupations",
    "skill-cooccurrence", "skill-depths",
    "top-skills-by-relationships", "top-occupations-optional",
    "transferable-skills", "skill-groups-most-skills",
    "combined-connections", "pagerank-exact", "hits-exact",
    "triangles", "concept-core", "cluster-skills",
    "label-bpe", "label-cardinality", "suggest-relations",
    "description-novelty", "sample-skills", "kind-vocab-similarity",
    // the graph-analytics verbs, on the mini warehouse: wiring smoke for
    // the GraphX/iterative paths too
    "isco-depths", "communities", "betweenness", "pagerank")

  analyses.foreach { name =>
    test(s"analyze $name runs") {
      EscoCli.run(spark, List("analyze", whDir, name))
    }
  }

  test("multi-verb analyze shares ONE graph build and ONE adjacency") {
    val wh = EscoWarehouse.load(spark, whDir)
    val session = new graft.analytics.EscoAnalytics.GraphSession(wh)
    // the four shared-scaffolding verbs, driven the way the multi-verb
    // CLI case drives them
    val triangles = EscoCli.analyzeOne(wh, "triangles", Some(session))
    val core = EscoCli.analyzeOne(wh, "concept-core", Some(session))
    val pr = EscoCli.analyzeOne(wh, "pagerank-exact", Some(session))
    val hits = EscoCli.analyzeOne(wh, "hits-exact", Some(session))
    val suggest = EscoCli.analyzeOne(wh, "suggest-relations", Some(session))
    Seq(triangles, core, pr, hits, suggest).foreach(_.collect(): Unit)
    // the build-once pin: dictionary+edges and the symmetric adjacency
    // each materialized exactly once across all five verbs
    assert(session.graphBuilds == 1, "dict/edges rebuilt across verbs")
    assert(session.adjacencyBuilds == 1, "adjacency rebuilt across verbs")
    assert(session.relatedBuilds == 1)
    // session answers are the sessionless answers (rows compared as sets;
    // both sides carry total ORDER BYs but collect-order is still plan
    // dependent for ties)
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSet
    assert(rows(pr) ==
      rows(EscoCli.analyzeOne(wh, "pagerank-exact", None)))
    assert(rows(triangles) ==
      rows(EscoCli.analyzeOne(wh, "triangles", None)))
    assert(rows(core) ==
      rows(EscoCli.analyzeOne(wh, "concept-core", None)))
    assert(rows(suggest) ==
      rows(EscoCli.analyzeOne(wh, "suggest-relations", None)))
  }

  test("multi-verb analyze invocation runs end-to-end") {
    EscoCli.run(spark, List("analyze", whDir,
      "triangles", "suggest-relations", "pagerank-exact", "hits-exact"))
  }

  test("every smoke-tested analysis name is in the multi-verb catalog guard") {
    analyses.foreach(n => assert(EscoCli.catalogNames.contains(n), n))
  }

  test("multi-verb analyze with a typo names the unrecognized verbs") {
    // one mistyped verb among valid ones used to fall through to the
    // generic usage blob; the message must name exactly the bad ones
    val msg = EscoCli.unknownVerbMessage(
      Seq("triangles", "trangles", "pagerank-exact"))
    assert(msg.contains("unknown query trangles"))
    assert(!msg.contains("triangles,") && !msg.contains("pagerank-exact,"))
    val msg2 = EscoCli.unknownVerbMessage(Seq("triangles", "foo", "bar"))
    assert(msg2.contains("unknown queries foo, bar"))
  }

  test("analyze related-occupations (direct and --bridge) runs") {
    EscoCli.run(spark,
      List("analyze", whDir, "related-occupations", "data engineer"))
    EscoCli.run(spark,
      List("analyze", whDir, "related-occupations", "data engineer", "--bridge"))
  }

  test("analyze skill-profile runs") {
    EscoCli.run(spark, List("analyze", whDir, "skill-profile", "manage data"))
  }

  test("analyze shortest-path runs (connected and disconnected pairs)") {
    // s1 -[related]- s2 in the mini warehouse: direct hop
    EscoCli.run(spark,
      List("analyze", whDir, "shortest-path", "manage data", "spark internals"))
    // s4 has no edges: the no-path branch must print, not throw
    EscoCli.run(spark,
      List("analyze", whDir, "shortest-path", "manage data", "lonely"))
  }

  test("analyze viz-graph runs") {
    EscoCli.run(spark, List("analyze", whDir, "viz-graph", "data engineer"))
  }

  test("analyze skill-viz-graph runs") {
    EscoCli.run(spark, List("analyze", whDir, "skill-viz-graph", "manage data"))
  }

  test("search --json and --profile-search run against the saved warehouse") {
    EscoCli.run(spark, List("search", whDir, "data", "--type", "skill",
      "--threshold", "-1.0", "--limit", "3", "--json"))
    EscoCli.run(spark, List("search", whDir, "data", "--type", "skill",
      "--threshold", "-1.0", "--profile-search"))
  }

  test("real-ESCO smoke: shortest-path and viz-graph over the reference CSVs") {
    val dir = Files.createTempDirectory("graft-cli-realwh").toString
    val wh = EscoWarehouse.build(spark, "/root/reference/ESCO")
    EscoWarehouse.save(wh, dir)
    // a (parent, child) pair from the skill pillar: path length must be 1
    val pair = wh.broaderSkill
      .join(wh.skills.select(org.apache.spark.sql.functions.col("conceptUri")
          .as("parentUri"),
        org.apache.spark.sql.functions.col("preferredLabel").as("pl")),
        Seq("parentUri"))
      .join(wh.skills.select(org.apache.spark.sql.functions.col("conceptUri")
          .as("childUri"),
        org.apache.spark.sql.functions.col("preferredLabel").as("cl")),
        Seq("childUri"))
      .select("pl", "cl").head()
    EscoCli.run(spark,
      List("analyze", dir, "shortest-path", pair.getString(0), pair.getString(1)))
    val occLabel = wh.occupations
      .orderBy("conceptUri")
      .select("preferredLabel").head().getString(0)
    EscoCli.run(spark, List("analyze", dir, "viz-graph", occLabel))
    EscoCli.run(spark, List("analyze", dir, "combined-connections"))
  }

  test("kind-vocab-similarity: estimates stay in [0, 1] and pairs are ordered") {
    val wh = EscoWarehouse.load(spark, whDir)
    val rows = graft.analytics.EscoAnalytics.kindVocabularySimilarity(wh)
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getString(0) < r.getString(1))
      val est = r.getAs[Long]("est_jaccard_micro")
      assert(est >= 0L && est <= 1000000L)
      assert(r.getAs[Long]("inter_k") <= r.getAs[Long]("union_kept"))
    }
  }

  test("label-cardinality: sketch estimates track the exact distinct") {
    val wh = EscoWarehouse.load(spark, whDir)
    val r = graft.analytics.EscoAnalytics.labelCardinality(wh).head()
    val exact = r.getAs[Long]("exact_distinct")
    assert(exact > 0L)
    // below k = 64 distinct hashes the KMV sketch IS the exact count
    assert(r.getAs[Long]("kmv_est") == exact)
    // the HLL small-range (linear-counting) estimate lands within 2x on
    // a tiny vocabulary — a broken register/rank chain lands far away
    val hll = r.getAs[Long]("hll_est_micro").toDouble / 1e6
    assert(hll > 0.5 * exact && hll < 2.0 * exact,
      s"hll=$hll exact=$exact")
  }
}
