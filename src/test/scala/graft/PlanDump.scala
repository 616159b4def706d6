package graft

import org.apache.spark.sql.SparkSession

/** Dump formatted plans for queries named on the command line, one file per
  * query, under a target directory — the optimization-round evidence trail
  * (plans/r14/<lane>_<tag>.txt).
  *
  * Run: Test/runMain graft.PlanDump <outDir> <tag> lane1 lane2 ...
  *   - outDir: e.g. plans/r14 (created if absent)
  *   - tag:    e.g. before / after — appended to the lane name
  * Session mirrors Bench's config (same master/shuffle settings via
  * SPARK_GRAFT_CPUS, SPARK_GRAFT_SF_DIR) so the captured plan is the one
  * the bench actually runs. Plans are the pre-execution formatted mode
  * (AdaptiveSparkPlan isFinalPlan=false) — Exchange count, join strategy,
  * PushedFilters/ReadSchema are all decided there. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> lane...")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val tag = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    args.drop(2).foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        outDir.resolve(s"${name}_$tag.txt"), plan.getBytes("UTF-8"))
      println(s"[plandump] wrote ${name}_$tag.txt (${plan.length} chars)")
    }
    spark.stop()
  }
}
