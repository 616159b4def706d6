package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: cost of repeated spark.read.parquet plan construction
  * (driver-side footer/listing work) vs reusing the DataFrame. */
object ReadCostProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm FS
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    def time[A](label: String)(f: => A): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[readprobe] $label ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    }
    time("50x read.parquet(lineitem) construct only") {
      (1 to 50).foreach(_ => spark.read.parquet(s"$sfDir/lineitem.parquet"))
    }
    time("50x read.parquet(documents) construct only") {
      (1 to 50).foreach(_ => spark.read.parquet(s"$sfDir/documents.parquet"))
    }
    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val sch = df.schema
    time("50x read.parquet(lineitem) with explicit schema, construct only") {
      (1 to 50).foreach(_ =>
        spark.read.schema(sch).parquet(s"$sfDir/lineitem.parquet"))
    }
    time("50x count() on one reused df") {
      (1 to 50).foreach(_ => df.count())
    }
    time("50x count() on fresh reads") {
      (1 to 50).foreach(_ =>
        spark.read.parquet(s"$sfDir/lineitem.parquet").count())
    }
    time("50x count() on fresh schema-pinned reads") {
      (1 to 50).foreach(_ =>
        spark.read.schema(sch).parquet(s"$sfDir/lineitem.parquet").count())
    }
    spark.stop()
  }
}
