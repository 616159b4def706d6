package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** ESCO CSV source (SURVEY S1).
  *
  * Parser parity with the reference's `pd.read_csv` (reference:
  * `src/esco_ingest.py:82`): header row, `"`-quoted fields containing
  * literal newlines (altLabels / inScheme are newline-joined multi-values)
  * and `""` escapes, empty cells → null. `multiLine` + `escape` are
  * mandatory — without them physical lines ≠ records and row counts are
  * >10× off (FIXTURES.md §A).
  *
  * Explicit schemas (all strings — the reference stores CSV cells verbatim,
  * SURVEY §1.2): schema inference at 100 TB means a second full read and
  * nondeterministic typing, so it is banned here.
  */
object EscoCsv {

  private def schemaOf(cols: String*): StructType =
    StructType(cols.map(c => StructField(c, StringType, nullable = true)))

  val skillGroupsSchema: StructType = schemaOf(
    "conceptType", "conceptUri", "preferredLabel", "altLabels", "hiddenLabels",
    "status", "modifiedDate", "scopeNote", "inScheme", "description", "code")

  val skillsSchema: StructType = schemaOf(
    "conceptType", "conceptUri", "skillType", "reuseLevel", "preferredLabel",
    "altLabels", "hiddenLabels", "status", "modifiedDate", "scopeNote",
    "definition", "inScheme", "description")

  val occupationsSchema: StructType = schemaOf(
    "conceptType", "conceptUri", "iscoGroup", "preferredLabel", "altLabels",
    "hiddenLabels", "status", "modifiedDate", "regulatedProfessionNote",
    "scopeNote", "definition", "inScheme", "description", "code")

  val iscoGroupsSchema: StructType = schemaOf(
    "conceptType", "conceptUri", "code", "preferredLabel", "status",
    "altLabels", "inScheme", "description")

  val broaderRelationsSchema: StructType = schemaOf(
    "conceptType", "conceptUri", "broaderType", "broaderUri")

  val occupationSkillRelationsSchema: StructType = schemaOf(
    "occupationUri", "relationType", "skillType", "skillUri")

  val skillSkillRelationsSchema: StructType = schemaOf(
    "originalSkillUri", "originalSkillType", "relationType",
    "relatedSkillType", "relatedSkillUri")

  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "true")
      .option("escape", "\"")
      .schema(schema)
      .csv(path)
}
