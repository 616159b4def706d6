package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.GraphOps

/** Throwaway probe: times the three CC implementations on the g03 bench
  * graph (sf0.1 co-purchase graph). Run: Test/runMain graft.CCProbe */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val l = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey"))
    val a = l.select(col("l_orderkey"), col("l_partkey").as("src"))
    val b = l.select(col("l_orderkey").as("ok2"), col("l_partkey").as("dst"))
    val edges = a.join(b, a("l_orderkey") === b("ok2") && col("src") < col("dst"))
      .groupBy("src", "dst").agg(count(lit(1)).as("w"))
      .filter(col("w") >= 2)
      .select("src", "dst")
      .localCheckpoint()
    println(s"edges: ${edges.count()}")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n comps)")
    }
    def hist(df: org.apache.spark.sql.DataFrame): Long =
      df.groupBy(col("component")).count().count()
    // warm each path twice; print both
    for (round <- 1 to 2) {
      println(s"-- round $round")
      time("graphx    ")(hist(GraphOps.connectedComponents(edges)))
      time("relational")(hist(GraphOps.connectedComponentsRelational(edges, maxIter = 60)))
      time("star      ")(hist(GraphOps.connectedComponentsStar(edges)))
    }
    spark.stop()
  }
}
