package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** Throwaway probe: per-stage timing of the cu01 curation pipeline.
  * Run: Test/runMain graft.CurateProbe */
object CurateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    println(s"docs: ${docs.count()}")
    for (round <- 1 to 2) {
      println(s"-- round $round")
      val annotated = Curation.annotate(docs, "doc_id", "text")
        .withColumn("__sig", graft.GraftFunctions.minhashFromHashes(
          graft.GraftFunctions.ngramHashes(
            graft.functions.TextFunctions.tokens(col("text")), 3), 64))
      time("annotate+sig ")(annotated.select(count(lit(1))).head())
      val cfg = Curation.Config(
        keepLangs = Seq("en", "fr", "es", "de", "und"),
        minhashHashes = 64, minhashBands = 16)
      val (curated, dropped) = Curation.curate(docs, "doc_id", "text", cfg)
      time("curate full  ")(curated.select(col("doc_id")).orderBy(col("doc_id")).limit(100).collect())
      time("drop report  ")(dropped.count())
      // isolate the cluster-resolution cost on the real pair set
      val ranked = Curation.annotate(docs, "doc_id", "text")
        .withColumn("__sig", graft.GraftFunctions.minhashFromHashes(
          graft.GraftFunctions.ngramHashes(
            graft.functions.TextFunctions.tokens(col("text")), 3), 64))
      val pairs = Dedup.minhashCandidatesFromSigs(
        ranked.select(col("doc_id").as("id"), col("__sig").as("sig")),
        numHashes = 64, bands = 16)
        .filter(col("est_jaccard") >= 0.8)
        .localCheckpoint()
      println(s"  near pairs: ${pairs.count()}")
      time("clusters(star)")(Dedup.nearDupClusters(pairs).count())
    }
    spark.stop()
  }
}
