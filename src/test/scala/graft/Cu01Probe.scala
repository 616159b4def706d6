package graft

import org.apache.spark.sql.SparkSession

/** Throwaway: reproduce bench's cu01 measurement in a fresh session with
  * the same warmup, timing each piece. Run: Test/runMain graft.Cu01Probe */
object Cu01Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.prepare(spark)
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    time("warmup") {
      spark.range(1000).selectExpr("sum(id)").collect()
      spark.read.parquet(s"$sfDir/region.parquet").count()
      val warmDocs = spark.range(32).selectExpr(
        "id AS doc_id",
        "concat('the and of to in is that it for was warm doc ', id) AS text")
      val (wc, wd) = graft.operators.Curation.curate(
        warmDocs, "doc_id", "text",
        graft.operators.Curation.Config(
          minTokens = 1L, minQuality = -100L, keepLangs = Seq("en", "und")))
      wc.count(); wd.count()
    }
    time("cu01 run 1")(SparkEntry.queries("cu01_curation")(spark, sfDir).count())
    time("cu01 run 2")(SparkEntry.queries("cu01_curation")(spark, sfDir).count())
    // stage breakdown
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cfg = graft.operators.Curation.Config(
      keepLangs = Seq("en", "fr", "es", "de", "und"),
      minhashHashes = 64, minhashBands = 16)
    val annotated = graft.operators.Curation.annotate(docs, "doc_id", "text")
      .withColumn("__sig", graft.GraftFunctions.minhashFromHashes(
        graft.GraftFunctions.ngramHashes(
          graft.functions.TextFunctions.tokens(col("text")), 3), 64))
    time("annotate+sig count")(annotated.count())
    val pairs = graft.operators.Dedup.minhashCandidatesFromSigs(
      annotated.select(col("doc_id").as("id"), col("__sig").as("sig")),
      numHashes = 64, bands = 16).filter(col("est_jaccard") >= 0.8)
      .localCheckpoint()
    time("pairs")(pairs.count())
    time("clusters star")(graft.operators.Dedup.nearDupClusters(pairs).count())
    time("clusters star again")(graft.operators.Dedup.nearDupClusters(pairs).count())
    val (curated1, _) = graft.operators.Curation.curate(docs, "doc_id", "text", cfg)
    time("curate.count direct")(curated1.count())
    val (curated2, dropped2) = graft.operators.Curation.curate(docs, "doc_id", "text", cfg)
    time("curate+limit like bench")(
      curated2.select(col("doc_id")).orderBy(col("doc_id")).limit(100).count())
    time("dropped.count")(dropped2.count())
    // decompose the SparkEntry path
    val fn = time("queries map")(SparkEntry.queries("cu01_curation"))
    val df = time("fn(spark, dir) build")(fn(spark, sfDir))
    time("df.count")(df.count())
    val df2 = time("fn build 2")(fn(spark, sfDir))
    time("df2.count")(df2.count())
    time("prepare only")(GraftSession.prepare(spark))
    val freshDocs = time("read.parquet")(
      spark.read.parquet(s"$sfDir/documents.parquet"))
    val built = time("curate build on fresh read")(
      graft.operators.Curation.curate(freshDocs, "doc_id", "text", cfg))
    time("built count")(built._1.count())
    spark.stop()
  }
}
