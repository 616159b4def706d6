package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{Curation, Dedup}

/** Scale smoke for the dedup family: 10× the sf0.1 documents (50k docs,
  * each original spawning 10 near-dup variants — a worst-ish case for
  * candidate-pair blowup and cluster resolution). Records wall time, rows,
  * and the largest single-stage shuffle write, to validate the
  * maxBucketSize / maxPostingLength caps empirically.
  * Run: Test/runMain graft.ScaleSmoke */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.prepare(spark)

    @volatile var maxShuffleWrite = 0L
    @volatile var totalShuffleWrite = 0L
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        totalShuffleWrite += w
        if (w > maxShuffleWrite) maxShuffleWrite = w
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val base = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    // 10 variants per doc: distinct ids, text perturbed by a per-variant
    // suffix token so variants are near- (not exact-) duplicates
    val docs = base
      .crossJoin(spark.range(10).select(col("id").as("variant")))
      .select(
        (col("doc_id") * 10L + col("variant")).as("doc_id"),
        concat(col("text"), lit(" variant"), col("variant")).as("text"))
      .repartition(32)
      .persist()
    println(s"docs: ${docs.count()}")

    def run(name: String)(f: => Long): Unit = {
      val m0 = maxShuffleWrite; maxShuffleWrite = 0L
      val t0s = totalShuffleWrite
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-22s ${sec}%7.1f s  rows=$rows%-9d " +
        f"maxStageShuffle=${maxShuffleWrite / 1024 / 1024}%5d MiB " +
        f"opShuffle=${(totalShuffleWrite - t0s) / 1024 / 1024}%5d MiB")
      maxShuffleWrite = math.max(m0, maxShuffleWrite)
    }

    run("exactDropIds")(
      Dedup.exactDropIds(docs, "doc_id", "text").count())
    run("minhashCandidates")(
      Dedup.minhashCandidates(docs, "doc_id", "text",
        numHashes = 64, bands = 16).filter(col("est_jaccard") >= 0.8).count())
    run("simhashNearDup")(
      Dedup.simhashNearDup(docs, "doc_id", "text").count())
    run("simhash cap=1000")(
      Dedup.simhashNearDup(docs, "doc_id", "text",
        maxBucketSize = 1000).count())
    run("ngramJaccard t=0.7")(
      Dedup.ngramJaccard(docs, "doc_id", "text", nGram = 3,
        threshold = 0.7).count())
    run("nearDupClusters")({
      val pairs = Dedup.minhashCandidates(docs, "doc_id", "text",
        numHashes = 64, bands = 16).filter(col("est_jaccard") >= 0.8)
      Dedup.nearDupClusters(pairs).count()
    })
    run("curate (full)")({
      val (curated, dropped) = Curation.curate(docs, "doc_id", "text",
        Curation.Config(keepLangs = Seq("en", "fr", "es", "de", "und"),
          minhashHashes = 64, minhashBands = 16))
      curated.count() + dropped.count()
    })
    spark.stop()
  }
}
