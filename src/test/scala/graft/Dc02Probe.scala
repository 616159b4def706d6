package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.{PortableBloom, TextFunctions}
import graft.operators.{Decontaminate, Dedup}

/** Throwaway probe: where dc02's time goes — bloom build vs probe vs the
  * per-doc gram-count side; and whether the work actually parallelizes.
  * Run: Test/runMain graft.Dc02Probe */
object Dc02Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for (round <- 1 to 3) {
      println(s"-- round $round")
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val test = docs.filter(col("doc_id") % 10 === 0)
      val train = docs.filter(col("doc_id") % 10 =!= 0)
      time("full lane        ") {
        SparkEntry.queries("dc02_bloom_decontam")(spark, dir).count()
      }
      time("operator         ") {
        Decontaminate.bloomDecontaminate(
          train, "doc_id", "text", test, "text", nGram = 13).count()
      }
      val testGrams = test
        .select(explode(TextFunctions.wordGrams(col("text"), 13)).as("g"))
      val bloom = time("bloom build      ") {
        PortableBloom.build(testGrams, col("g"), 2048, 5)
      }
      val par = Dedup.ensureParallelism(train)
      println("  train partitions after ensureParallelism: " +
        par.queryExecution.toRdd.getNumPartitions)
      time("par explode only ") {
        par.select(explode(TextFunctions.wordGrams(col("text"), 13)).as("g"))
          .count()
      }
      time("par size+explode ") {
        par.select(col("doc_id"),
            TextFunctions.wordGrams(col("text"), 13).as("gs"))
          .select(col("doc_id"), size(col("gs")).cast("long").as("n"),
            explode(col("gs")).as("g"))
          .count()
      }
      time("par probe only   ") {
        val g = par
          .select(explode(TextFunctions.wordGrams(col("text"), 13)).as("g"))
        val (h1, h2) = PortableBloom.hashPair(col("g"))
        g.filter(bloom.mightContain(h1, h2)).count()
      }
    }
    spark.stop()
  }
}
