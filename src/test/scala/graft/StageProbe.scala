package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Scratch profiling probe: run one lane once and print every completed
  * stage with wall duration, task count, and the first line of its name —
  * plus job boundaries — so per-lane cost decomposes into actual stages.
  * Test/runMain graft.StageProbe <lane> */
object StageProbe {
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
    val stages = mutable.ArrayBuffer.empty[(Int, Long, Int, String)]
    val jobs = mutable.ArrayBuffer.empty[(Int, Long)]
    val t00 = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val dur = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
        stages.synchronized {
          stages += ((i.stageId, dur, i.numTasks,
            i.name.linesIterator.next().take(100)))
        }
      }
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          jobs += ((e.jobId, (System.nanoTime() - t00) / 1000000L))
        }
    })
    val name = args(0)
    // warm round (codegen) then measured round
    for (round <- 1 to 2) {
      stages.clear(); jobs.clear()
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.count()
      val t2 = System.nanoTime()
      Thread.sleep(300) // let listener drain
      if (round == 2) {
        println(f"[stageprobe] $name build=${(t1 - t0) / 1e6}%.0fms " +
          f"exec=${(t2 - t1) / 1e6}%.0fms jobs=${jobs.size}%d " +
          f"stages=${stages.size}%d stageWallSum=${stages.map(_._2).sum}%dms")
        stages.sortBy(-_._2).take(30).foreach { case (id, dur, nt, nm) =>
          println(f"[stage] id=$id%-4d ${dur}%5dms tasks=$nt%-3d $nm")
        }
      }
    }
    spark.stop()
  }
}
