package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.CorpusStats

/** Throwaway probe: per-stage shuffle-write bytes of nb01's NB pipeline
  * vs cm01's NB+report chain on the ScaleProof 10x corpus, to localize
  * cm01's extra exchange. Run: Test/runMain graft.Cm01Probe */
object Cm01Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/tmp/graft_scaleproof/docs10x")
    val labeled = docs.withColumn("graft_lbl",
      (col("doc_id") % 5).cast("string"))

    def measure(tag: String)(f: => Unit): Unit = {
      val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String)]
      val l = new SparkListener {
        override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
          stages += ((s.stageInfo.stageId,
            s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten,
            s.stageInfo.name.take(80)))
      }
      spark.sparkContext.addSparkListener(l)
      f
      Thread.sleep(1000) // let the listener bus drain
      spark.sparkContext.removeSparkListener(l)
      println(s"== $tag total=${stages.map(_._2).sum / 1048576.0} MiB")
      stages.filter(_._2 > 1048576).sortBy(-_._2).foreach { case (id, b, n) =>
        println(f"  stage $id%4d ${b / 1048576.0}%8.1f MiB  $n")
      }
    }

    measure("nb01 shape") {
      CorpusStats.naiveBayesPredict(
        labeled, "doc_id", "text", "graft_lbl", vocabCap = 1024).count()
    }
    measure("nb01 + join only") {
      CorpusStats.naiveBayesPredict(
          labeled, "doc_id", "text", "graft_lbl", vocabCap = 1024)
        .join(labeled.select(col("doc_id"), col("graft_lbl")), "doc_id")
        .count()
    }
    measure("nb01 consumed (collect pred)") {
      CorpusStats.naiveBayesPredict(
          labeled, "doc_id", "text", "graft_lbl", vocabCap = 1024)
        .agg(count(col("pred"))).head()
    }
    measure("cm01 chain") {
      val scored = CorpusStats.naiveBayesPredict(
          labeled, "doc_id", "text", "graft_lbl", vocabCap = 1024)
        .join(labeled.select(col("doc_id"), col("graft_lbl")), "doc_id")
      CorpusStats.classifierReport(scored, "graft_lbl", "pred").count()
    }
    spark.stop()
  }
}
