package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: print formatted plans for queries named on the command line.
  * Run: Test/runMain graft.PlanDump q47_part_degree_ranking ... */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    args.foreach { name =>
      println(s"## $name\n")
      println("```")
      println(SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println("```")
    }
    spark.stop()
  }
}
