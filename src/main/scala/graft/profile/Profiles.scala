package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sources.EscoWarehouse
import graft.vector.SemanticSearch

/** Profile / related-graph extraction (SURVEY G6–G9).
  *
  * The reference expands each search hit with a second Cypher round-trip of
  * five OPTIONAL MATCH + collect(DISTINCT) clauses (reference:
  * `src/semantic_search.py:111-169`), and profile search loops client-side
  * over hits — 1 + k round-trips (`src/semantic_search.py:185-215`). Here
  * each expansion is a grouped aggregation over an edge table and the whole
  * profile is ONE logical plan: anchors × 5 left-joined aggregates. k
  * anchors or k million anchors is the same plan.
  *
  * Cypher null semantics (SURVEY §7.4.1): `collect(DISTINCT x)` over an
  * unmatched OPTIONAL MATCH yields `[]` — reproduced by aggregating each
  * expansion independently (inner joins) and coalescing missing groups to
  * `array()` after the left join. Collected arrays are sorted for
  * deterministic output (Q4-style canonicalisation).
  */
object Profiles {

  private def agg(
      edges: DataFrame, anchorCol: String, otherCol: String,
      labels: DataFrame, labelKey: String, outCol: String): DataFrame =
    edges
      .join(labels.withColumnRenamed(labelKey, otherCol), Seq(otherCol))
      .groupBy(col(anchorCol).as("uri"))
      .agg(sort_array(collect_set(col("preferredLabel"))).as(outCol))

  private def leftJoinAll(anchors: DataFrame, parts: Seq[(DataFrame, String)]): DataFrame =
    parts.foldLeft(anchors) { case (acc, (part, outCol)) =>
      acc.join(part, Seq("uri"), "left_outer")
        .withColumn(outCol, coalesce(col(outCol), array()))
    }

  /** Related graph for skill anchors (`uri` column): essential/optional
    * occupations, related skills (undirected J6), broader/narrower skills.
    * Mirrors `src/semantic_search.py:115-128`. */
  def skillRelatedGraph(wh: EscoWarehouse, anchors: DataFrame): DataFrame = {
    val skillLabels = wh.skills.select(col("conceptUri"), col("preferredLabel"))
    val occLabels = wh.occupations.select(col("conceptUri"), col("preferredLabel"))
    // J6: undirected RELATED_SKILL = union with reversal
    val relatedUndirected = wh.relatedSkill.select(col("srcUri"), col("dstUri"))
      .unionByName(wh.relatedSkill.select(col("dstUri").as("srcUri"),
        col("srcUri").as("dstUri")))
    leftJoinAll(anchors, Seq(
      agg(wh.essentialFor, "skillUri", "occupationUri", occLabels,
        "conceptUri", "essential_for_occupations") -> "essential_for_occupations",
      agg(wh.optionalFor, "skillUri", "occupationUri", occLabels,
        "conceptUri", "optional_for_occupations") -> "optional_for_occupations",
      agg(relatedUndirected, "srcUri", "dstUri", skillLabels,
        "conceptUri", "related_skills") -> "related_skills",
      agg(wh.broaderSkill.select(col("childUri"), col("parentUri")),
        "childUri", "parentUri", skillLabels,
        "conceptUri", "broader_skills") -> "broader_skills",
      agg(wh.broaderSkill.select(col("parentUri"), col("childUri")),
        "parentUri", "childUri", skillLabels,
        "conceptUri", "narrower_skills") -> "narrower_skills"
    ).map { case (df, c) => (df, c) })
  }

  /** Related graph for occupation anchors: essential/optional skills, ISCO
    * groups, broader/narrower occupations — the last two are always empty
    * because the reference never creates Occupation BROADER_THAN edges
    * (Q2; queried anyway at `src/semantic_search.py:135-136`). */
  def occupationRelatedGraph(wh: EscoWarehouse, anchors: DataFrame): DataFrame = {
    val skillLabels = wh.skills.select(col("conceptUri"), col("preferredLabel"))
    val iscoLabels = wh.iscoGroups.select(col("conceptUri"), col("preferredLabel"))
    val occLabels = wh.occupations.select(col("conceptUri"), col("preferredLabel"))
    leftJoinAll(anchors, Seq(
      agg(wh.essentialFor.select(col("occupationUri"), col("skillUri")),
        "occupationUri", "skillUri", skillLabels,
        "conceptUri", "essential_skills") -> "essential_skills",
      agg(wh.optionalFor.select(col("occupationUri"), col("skillUri")),
        "occupationUri", "skillUri", skillLabels,
        "conceptUri", "optional_skills") -> "optional_skills",
      agg(wh.partOfIscoGroup, "occupationUri", "iscoUri", iscoLabels,
        "conceptUri", "isco_groups") -> "isco_groups",
      agg(wh.broaderOccupation.select(col("childUri"), col("parentUri")),
        "childUri", "parentUri", occLabels,
        "conceptUri", "broader_occupations") -> "broader_occupations",
      agg(wh.broaderOccupation.select(col("parentUri"), col("childUri")),
        "parentUri", "childUri", occLabels,
        "conceptUri", "narrower_occupations") -> "narrower_occupations"
    ))
  }

  /** Complete profile with typed struct collections (SURVEY A5/G8,
    * `analysis_queries.md:253-306`): each related item as
    * struct(name, type) with a fixed field order, sorted. */
  def occupationCompleteProfile(wh: EscoWarehouse, anchors: DataFrame): DataFrame = {
    val skillLabels = wh.skills.select(col("conceptUri"), col("preferredLabel"))
    def typedAgg(edges: DataFrame, typ: String): DataFrame =
      edges
        .join(skillLabels.withColumnRenamed("conceptUri", "skillUri"), Seq("skillUri"))
        .groupBy(col("occupationUri").as("uri"))
        .agg(sort_array(collect_set(struct(
          col("preferredLabel").as("skill"), lit(typ).as("type")))).as(s"${typ.toLowerCase}_skills"))
    leftJoinAll(anchors, Seq(
      typedAgg(wh.essentialFor, "Essential") -> "essential_skills",
      typedAgg(wh.optionalFor, "Optional") -> "optional_skills"))
  }

  /** Two-phase profile search as ONE plan (SURVEY G7): top-k semantic hits
    * expanded with their related graph — replaces the reference's 1 + k
    * round-trip loop (`src/semantic_search.py:205-214`). */
  def profileSearch(
      wh: EscoWarehouse,
      search: SemanticSearch,
      query: String,
      nodeType: String = "occupation",
      threshold: Double = 0.5,
      limit: Int = 10): DataFrame = {
    val hits = search.search(query, nodeType, threshold, limit)
    val expanded = nodeType.toLowerCase match {
      case "skill" => skillRelatedGraph(wh, hits.select(col("uri")))
      case _ => occupationRelatedGraph(wh, hits.select(col("uri")))
    }
    hits.join(expanded, Seq("uri"), "left_outer")
      .orderBy(desc("score"), col("uri"))
  }
}
