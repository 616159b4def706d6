package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling probe: for each named lane, split wall time into
  * (a) DataFrame construction — includes any eager Barriers.stage jobs,
  * (b) analysis+optimization+physical planning (executedPlan forced),
  * (c) execution (count()). Run twice per lane to expose codegen warmup.
  * Not part of the suite; Test/runMain graft.TimeProbe lane1 lane2 ... */
object TimeProbe {
  def main(args: Array[String]): Unit = {
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
    spark.range(1000).selectExpr("sum(id)").collect()
    for (t <- Seq("documents", "lineitem", "orders", "embeddings"))
      try spark.read.parquet(s"$sfDir/$t.parquet")
        .selectExpr("max(xxhash64(struct(*)))").collect()
      catch { case _: Throwable => () }
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    args.foreach { name =>
      for (round <- 1 to 2) {
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, sfDir)
        val tBuild = ms(t0)
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan
        val tPlan = ms(t1)
        val t2 = System.nanoTime()
        val n = df.count()
        val tExec = ms(t2)
        println(f"[probe] $name round$round rows=$n%d build=$tBuild%.0fms " +
          f"plan=$tPlan%.0fms exec=$tExec%.0fms")
      }
    }
    spark.stop()
  }
}
