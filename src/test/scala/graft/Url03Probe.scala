package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: reproduce url03's 64 KB codegen fallback and verify the
  * fix. Run: Test/runMain graft.Url03Probe */
object Url03Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    val df = SparkEntry.queries("url03_domain_cap")(spark, sfDir)
    df.explain("formatted")
    println("rows: " + df.count())
    spark.stop()
  }
}
