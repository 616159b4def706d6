package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The graft warehouse: ESCO's labeled property graph as node + edge
  * Parquet tables (SURVEY §1.4 mapping).
  *
  * Replaces the reference's per-row `MERGE` ingest into Neo4j (reference:
  * `src/esco_ingest.py:391-419` stage order) with one declarative DAG:
  * read → normalize → integrity joins → write. What was N+1 Bolt
  * round-trips per node becomes a single columnar pass; at 100 TB the same
  * plan just gets more partitions.
  *
  * Faithfulness decisions (SURVEY quirks):
  *  - Q1 (replicated): SkillGroups are also Skills — one `skills` table
  *    with an `isSkillGroup` flag; every "all skills" scan includes groups,
  *    exactly like the dual label `MERGE (sg:Skill:SkillGroup ...)`
  *    (reference: `src/esco_ingest.py:98`).
  *  - Q2 (replicated): occupation-pillar broader rows whose endpoints are
  *    not both ISCOGroups are dropped by the integrity join, so
  *    `broaderOccupation` exists but is empty (reference:
  *    `src/esco_ingest.py:197-202` matches only `:ISCOGroup`).
  *  - Q3 (replicated): `partOfSkillGroup` is declared but never populated
  *    (queried at `analysis_queries.md:290,417`, created nowhere).
  *  - S4 (replicated): edge rows whose endpoints don't exist are silently
  *    dropped — inner joins against the node tables reproduce Cypher
  *    `MATCH` endpoint semantics (reference: `src/esco_ingest.py:179-184`).
  */
case class EscoWarehouse(
    skills: DataFrame, // Q1: includes skill groups, flagged
    occupations: DataFrame,
    iscoGroups: DataFrame,
    broaderSkill: DataFrame, // parentUri, childUri (both :Skill)
    broaderIsco: DataFrame, // parentUri, childUri (ISCOGroup → ISCOGroup)
    broaderOccupation: DataFrame, // empty by Q2, queryable
    partOfIscoGroup: DataFrame, // occupationUri, iscoUri
    essentialFor: DataFrame, // skillUri, occupationUri
    optionalFor: DataFrame, // skillUri, occupationUri
    relatedSkill: DataFrame, // srcUri, dstUri, relType
    partOfSkillGroup: DataFrame // empty by Q3, queryable
) {
  /** Union view of all nodes with their label array (Q1 dual-labels). */
  def allNodes: DataFrame = {
    val sk = skills.select(col("conceptUri"), col("preferredLabel"),
      when(col("isSkillGroup"), array(lit("Skill"), lit("SkillGroup")))
        .otherwise(array(lit("Skill"))).as("labels"))
    val oc = occupations.select(col("conceptUri"), col("preferredLabel"),
      array(lit("Occupation")).as("labels"))
    val ig = iscoGroups.select(col("conceptUri"), col("preferredLabel"),
      array(lit("ISCOGroup")).as("labels"))
    sk.unionByName(oc).unionByName(ig)
  }

  /** All edges with a relType tag (A9 `type(r)` grouping). */
  def allEdges: DataFrame = {
    def tag(df: DataFrame, s: String, d: String, t: String) =
      df.select(col(s).as("srcUri"), col(d).as("dstUri"), lit(t).as("relType"))
    tag(broaderSkill, "parentUri", "childUri", "BROADER_THAN")
      .unionByName(tag(broaderIsco, "parentUri", "childUri", "BROADER_THAN"))
      .unionByName(tag(broaderOccupation, "parentUri", "childUri", "BROADER_THAN"))
      .unionByName(tag(partOfIscoGroup, "occupationUri", "iscoUri", "PART_OF_ISCOGROUP"))
      .unionByName(tag(essentialFor, "skillUri", "occupationUri", "ESSENTIAL_FOR"))
      .unionByName(tag(optionalFor, "skillUri", "occupationUri", "OPTIONAL_FOR"))
      .unionByName(relatedSkill.select(col("srcUri"), col("dstUri"),
        lit("RELATED_SKILL").as("relType")))
      .unionByName(tag(partOfSkillGroup, "skillUri", "groupUri", "PART_OF_SKILLGROUP"))
  }
}

object EscoWarehouse {

  /** Fail-fast uniqueness assertion mirroring the reference's constraints
    * (reference: `src/esco_ingest.py:70-74`). */
  private def assertUnique(df: DataFrame, keyCol: String, what: String): Unit = {
    val dupes = df.groupBy(col(keyCol)).count().filter(col("count") > 1)
    if (!dupes.isEmpty)
      throw new IllegalStateException(
        s"uniqueness violated for $what.$keyCol: ${dupes.head()}")
  }

  private def emptyEdge(spark: SparkSession, cols: String*): DataFrame = {
    import org.apache.spark.sql.types._
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(cols.map(c => StructField(c, StringType, nullable = true))))
  }

  /** Build the warehouse from an ESCO CSV directory.
    *
    * @param skillsCsv / occupationSkillCsv optional overrides for the two
    *   files absent from the reference snapshot (`.MISSING_LARGE_BLOBS`);
    *   tests point them at synthesized fixtures.
    */
  def build(
      spark: SparkSession,
      escoDir: String,
      skillsCsv: Option[String] = None,
      occupationSkillCsv: Option[String] = None): EscoWarehouse = {
    import EscoCsv._

    def path(f: String) = s"$escoDir/$f"

    val skillGroupsRaw = read(spark, path("skillGroups_en.csv"), skillGroupsSchema)
      .dropDuplicates("conceptUri")
    val skillsFile = skillsCsv.getOrElse(path("skills_en.csv"))
    val skillsRaw =
      (if (new java.io.File(skillsFile.stripPrefix("file:")).exists())
        read(spark, skillsFile, skillsSchema)
      else // absent from the reference snapshot (.MISSING_LARGE_BLOBS)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], skillsSchema))
        .dropDuplicates("conceptUri")

    // Q1: SkillGroup rows become Skill rows too (flagged); align schemas
    val skills = skillsRaw
      .withColumn("isSkillGroup", lit(false))
      .withColumn("code", lit(null).cast("string"))
      .unionByName(
        skillGroupsRaw
          .withColumn("isSkillGroup", lit(true))
          .withColumn("skillType", lit(null).cast("string"))
          .withColumn("reuseLevel", lit(null).cast("string"))
          .withColumn("definition", lit(null).cast("string")),
        allowMissingColumns = false)

    val occupations = read(spark, path("occupations_en.csv"), occupationsSchema)
      .dropDuplicates("conceptUri")

    // reference dedupes ISCO codes per batch (P10 quirk); the faithful-at-
    // scale reading is global dedup since the constraint is global
    val iscoGroups = read(spark, path("ISCOGroups_en.csv"), iscoGroupsSchema)
      .dropDuplicates("conceptUri")
      .dropDuplicates("code")

    assertUnique(skills, "conceptUri", "skills")
    assertUnique(occupations, "conceptUri", "occupations")
    assertUnique(iscoGroups, "code", "iscoGroups")

    val skillUris = skills.select(col("conceptUri"))
    val iscoUris = iscoGroups.select(col("conceptUri"), col("code"))

    // S4 semantics: inner joins drop rows with missing endpoints silently
    val broaderSkillFile = read(
      spark, path("broaderRelationsSkillPillar_en.csv"), broaderRelationsSchema)
    val broaderSkill = broaderSkillFile
      .select(col("broaderUri").as("parentUri"), col("conceptUri").as("childUri"))
      .join(skillUris.withColumnRenamed("conceptUri", "parentUri"), Seq("parentUri"), "left_semi")
      .join(skillUris.withColumnRenamed("conceptUri", "childUri"), Seq("childUri"), "left_semi")
      .select("parentUri", "childUri")
      .dropDuplicates()

    val broaderOccFile = read(
      spark, path("broaderRelationsOccPillar_en.csv"), broaderRelationsSchema)
    val broaderIsco = broaderOccFile
      .select(col("broaderUri").as("parentUri"), col("conceptUri").as("childUri"))
      .join(iscoUris.select(col("conceptUri").as("parentUri")), Seq("parentUri"), "left_semi")
      .join(iscoUris.select(col("conceptUri").as("childUri")), Seq("childUri"), "left_semi")
      .select("parentUri", "childUri")
      .dropDuplicates()

    // Q2: Occupation broader edges are never created by the reference
    val broaderOccupation = emptyEdge(spark, "parentUri", "childUri")

    // J2 property join: Occupation.iscoGroup = ISCOGroup.code
    val partOfIscoGroup = occupations
      .select(col("conceptUri").as("occupationUri"), col("iscoGroup"))
      .join(iscoUris.select(col("code").as("iscoGroup"),
        col("conceptUri").as("iscoUri")), Seq("iscoGroup"))
      .select("occupationUri", "iscoUri")
      .dropDuplicates()

    val occSkillFile = occupationSkillCsv.getOrElse(path("occupationSkillRelations_en.csv"))
    val occSkillRaw =
      if (new java.io.File(occSkillFile.stripPrefix("file:")).exists())
        read(spark, occSkillFile, occupationSkillRelationsSchema)
      else emptyEdge(spark, "occupationUri", "relationType", "skillType", "skillUri")
    val occUris = occupations.select(col("conceptUri"))
    def occSkillEdges(relType: String): DataFrame =
      occSkillRaw.filter(col("relationType") === relType)
        .select(col("skillUri"), col("occupationUri"))
        .join(skillUris.withColumnRenamed("conceptUri", "skillUri"), Seq("skillUri"), "left_semi")
        .join(occUris.withColumnRenamed("conceptUri", "occupationUri"), Seq("occupationUri"), "left_semi")
        .select("skillUri", "occupationUri")
        .dropDuplicates()
    val essentialFor = occSkillEdges("essential")
    val optionalFor = occSkillEdges("optional")

    val relatedSkill = read(
      spark, path("skillSkillRelations_en.csv"), skillSkillRelationsSchema)
      .select(col("originalSkillUri").as("srcUri"),
        col("relatedSkillUri").as("dstUri"), col("relationType").as("relType"))
      .join(skillUris.withColumnRenamed("conceptUri", "srcUri"), Seq("srcUri"), "left_semi")
      .join(skillUris.withColumnRenamed("conceptUri", "dstUri"), Seq("dstUri"), "left_semi")
      .select("srcUri", "dstUri", "relType")
      .dropDuplicates()

    // Q3: declared, never populated
    val partOfSkillGroup = emptyEdge(spark, "skillUri", "groupUri")

    EscoWarehouse(skills, occupations, iscoGroups, broaderSkill, broaderIsco,
      broaderOccupation, partOfIscoGroup, essentialFor, optionalFor,
      relatedSkill, partOfSkillGroup)
  }

  private val tableNames = Seq(
    "skills", "occupations", "isco_groups", "broader_skill", "broader_isco",
    "broader_occupation", "part_of_isco_group", "essential_for",
    "optional_for", "related_skill", "part_of_skill_group")

  private def tables(wh: EscoWarehouse): Seq[(String, DataFrame)] =
    tableNames.zip(Seq(wh.skills, wh.occupations, wh.iscoGroups,
      wh.broaderSkill, wh.broaderIsco, wh.broaderOccupation,
      wh.partOfIscoGroup, wh.essentialFor, wh.optionalFor,
      wh.relatedSkill, wh.partOfSkillGroup))

  /** Persist as Parquet ("the database"). At scale, node/edge tables would
    * additionally be bucketed by uri hash; ESCO itself is dimension-sized. */
  def save(wh: EscoWarehouse, dir: String): Unit =
    tables(wh).foreach { case (n, df) =>
      df.write.mode("overwrite").parquet(s"$dir/$n")
    }

  /** Keyed upsert for incremental re-runs (the reference's MERGE semantics
    * when the warehouse is NOT rebuilt from empty): incoming rows replace
    * existing rows with the same key; unseen keys are appended. One
    * outer-shuffle-free plan when both sides are bucketed on the key. */
  def upsertNodes(existing: DataFrame, incoming: DataFrame, key: String): DataFrame = {
    val cols = existing.columns
    incoming.dropDuplicates(key) // uniqueness constraint holds post-upsert
      .select(cols.map(col): _*)
      .unionByName(
        existing.join(incoming.select(col(key)), Seq(key), "left_anti"))
  }

  /** Bucketed persistence: node and edge tables bucketed (and sorted) on
    * their join keys so edge⋈node joins run WITHOUT a shuffle exchange —
    * the on-disk co-location strategy for the 100 TB deployment (SCALING.md
    * "Parquet layout"). Requires a table catalog (`saveAsTable`); bucket
    * counts are per-table because a 100 TB edge table and a dimension-sized
    * node table need different fan-outs. */
  def saveBucketed(
      wh: EscoWarehouse,
      spark: SparkSession,
      database: String,
      nodeBuckets: Int = 8,
      edgeBuckets: Int = 8): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $database")
    def bucketed(df: DataFrame, table: String, key: String, n: Int): Unit = {
      // a stale managed-table location (fresh in-memory catalog, old
      // warehouse dir on disk) must not fail the rebuild
      spark.sql(s"DROP TABLE IF EXISTS $database.$table")
      df.write.mode("overwrite")
        .bucketBy(n, key).sortBy(key)
        .saveAsTable(s"$database.$table")
    }
    bucketed(wh.skills, "skills", "conceptUri", nodeBuckets)
    bucketed(wh.occupations, "occupations", "conceptUri", nodeBuckets)
    bucketed(wh.iscoGroups, "isco_groups", "conceptUri", nodeBuckets)
    bucketed(wh.essentialFor, "essential_for", "skillUri", edgeBuckets)
    bucketed(wh.optionalFor, "optional_for", "skillUri", edgeBuckets)
    bucketed(wh.relatedSkill, "related_skill", "srcUri", edgeBuckets)
    bucketed(wh.broaderSkill, "broader_skill", "childUri", edgeBuckets)
    bucketed(wh.broaderIsco, "broader_isco", "childUri", edgeBuckets)
    bucketed(wh.partOfIscoGroup, "part_of_isco_group", "occupationUri", edgeBuckets)
  }

  def load(spark: SparkSession, dir: String): EscoWarehouse = {
    def t(n: String) = spark.read.parquet(s"$dir/$n")
    EscoWarehouse(t("skills"), t("occupations"), t("isco_groups"),
      t("broader_skill"), t("broader_isco"), t("broader_occupation"),
      t("part_of_isco_group"), t("essential_for"), t("optional_for"),
      t("related_skill"), t("part_of_skill_group"))
  }
}
