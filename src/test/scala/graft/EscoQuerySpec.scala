package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.analytics.EscoAnalytics
import graft.enrich.{DictionaryTranslator, IdentityTranslator, Translate}
import graft.profile.Profiles
import graft.sources.EscoWarehouse
import graft.vector.{HashingEmbedder, SemanticSearch}

/** Search / profile / analytics / translate over the fixture warehouse. */
class EscoQuerySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // real CSVs for analytics that only need occupations/ISCO;
  // fixture-free semantic search over occupations works there too
  private lazy val whReal = EscoWarehouse.build(spark, "/root/reference/ESCO")
  private lazy val search = new SemanticSearch(whReal, new HashingEmbedder(128))

  test("semantic search: top-k occupations, strict threshold, deterministic") {
    val hits = search.search("chief technical director operations",
      nodeType = "occupation", threshold = 0.1, limit = 5)
    val rows = hits.collect()
    assert(rows.nonEmpty && rows.length <= 5)
    assert(rows.forall(_.getAs[Double]("score") > 0.1))
    // descending scores
    val scores = rows.map(_.getAs[Double]("score"))
    assert(scores.sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
    // deterministic across runs
    val again = search.search("chief technical director operations",
      nodeType = "occupation", threshold = 0.1, limit = 5).collect()
    assert(rows.map(_.getString(0)).toSeq == again.map(_.getString(0)).toSeq)
  }

  test("isDataIndexed reports true once embeddings exist") {
    assert(search.isDataIndexed)
  }

  test("occupation related graph: ISCO groups populated, broader empty (Q2)") {
    val anchor = whReal.occupations.limit(1).select(col("conceptUri").as("uri"))
    val g = Profiles.occupationRelatedGraph(whReal, anchor).head()
    assert(g.getAs[scala.collection.Seq[String]]("isco_groups").nonEmpty)
    assert(g.getAs[scala.collection.Seq[String]]("broader_occupations").isEmpty)
    assert(g.getAs[scala.collection.Seq[String]]("narrower_occupations").isEmpty)
    // no occupation-skill file in snapshot → empty but present (S4)
    assert(g.getAs[scala.collection.Seq[String]]("essential_skills").isEmpty)
  }

  test("nodeCounts / relationshipCounts mirror the Cypher catalog shapes") {
    val nc = EscoAnalytics.nodeCounts(whReal).collect()
    assert(nc.map(_.getLong(1)).sum == 640L + 3039L + 619L)
    val rc = EscoAnalytics.relationshipCounts(whReal).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rc("PART_OF_ISCOGROUP") == 3039L)
  }

  test("iscoGroupsWithMostOccupations: top-20, descending") {
    val top = EscoAnalytics.iscoGroupsWithMostOccupations(whReal).collect()
    assert(top.length == 20)
    val counts = top.map(_.getAs[Long]("occupation_count"))
    assert(counts.sliding(2).forall(p => p(0) >= p(1)))
    assert(counts.head > 10L)
  }

  test("ISCO hierarchy depths via variable-length paths (G1)") {
    val depths = EscoAnalytics.iscoHierarchyDepths(whReal).collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // ISCO tree: 4 levels → depths 1..3 from the roots
    assert(depths.keySet == Set(1, 2, 3))
    assert(depths.values.sum > 500L) // most of the 609 child groups reached
  }

  test("combinedConnections / twoHopNetwork run over the fixture graph") {
    // relatedSkill is empty on the snapshot (skills file absent), so these
    // exercise plan validity + empty-collect semantics
    val cc = EscoAnalytics.combinedConnections(whReal)
    assert(cc.count() == 0L)
    val net = EscoAnalytics.occupationTwoHopNetwork(whReal, "technical director")
    assert(net.count() == 0L)
  }

  test("translate: worklist semantics + distinct-first + Q5 mapping") {
    val translated = Translate.translateProperty(
      whReal.occupations.limit(50), "prefLabel",
      new IdentityTranslator("he:"))
    assert(translated.columns.contains("preferredLabel_he"))
    val rows = translated.select("preferredLabel", "preferredLabel_he").collect()
    assert(rows.forall(r => r.getString(1) != null))
    assert(rows.forall(r => r.getString(1).startsWith("he:")))
    // idempotent: already-translated rows are not re-translated
    val again = Translate.translateProperty(
      translated, "prefLabel", new IdentityTranslator("2nd:"))
    assert(again.filter(col("preferredLabel_he").startsWith("2nd:")).count() == 0L)
  }

  test("dictionary translator maps word-by-word") {
    val out = Translate.translateProperty(
      Seq(("a", "data engineer")).toDF("id", "preferredLabel"),
      "prefLabel",
      new DictionaryTranslator(Map("data" -> "נתונים", "engineer" -> "מהנדס")))
    assert(out.head().getAs[String]("preferredLabel_he") == "נתונים מהנדס")
  }
}
