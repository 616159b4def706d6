package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: co-purchase edge-build shapes for g03 — self-join vs
  * grouped pair generation. Run: Test/runMain graft.G03Probe */
object G03Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    for (round <- 1 to 3) {
      println(s"-- round $round")
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      time("self-join   ") {
        val a = l.select(col("l_orderkey"), col("l_partkey").as("src"))
        val b = l.select(col("l_orderkey").as("ok2"), col("l_partkey").as("dst"))
        a.join(b, a("l_orderkey") === b("ok2") && col("src") < col("dst"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2).count()
      }
      time("grouped-pair") {
        l.groupBy(col("l_orderkey"))
          .agg(collect_list(col("l_partkey")).as("ps"))
          .select(explode(col("ps")).as("src"), col("ps"))
          .select(col("src"), explode(col("ps")).as("dst"))
          .filter(col("src") < col("dst"))
          .groupBy("src", "dst").agg(count(lit(1)).as("w"))
          .filter(col("w") >= 2).count()
      }
    }
    spark.stop()
  }
}
