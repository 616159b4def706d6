package graft.operators

import org.apache.spark.sql.DataFrame

/** Materialization barriers for pipeline frames.
  *
  * The funnel lanes stage their keeper/verdict frames behind an eager
  * checkpoint: it stops ProjectCollapse from re-inlining the whole
  * extraction tree into every downstream branch, and it is the honest
  * cost accounting (without it a bare count() prunes the funnel away and
  * the lane benchmarks an empty plan). `localCheckpoint` is the right
  * default on a healthy cluster — executor-local storage, no
  * distributed-FS round trip — but it is NON-RELIABLE: the blocks pin to
  * executor storage and are lost on executor failure, which on a real
  * 1000-executor run means the whole job restarts from the source scan.
  *
  * [[stage]] keeps the default and adds the cluster path behind one
  * session conf: set `spark.graft.checkpointDir` to a reliable
  * (HDFS/object-store) location and every barrier in the engine becomes
  * a reliable `Dataset.checkpoint` to that directory instead — same call
  * sites, same eager semantics, survivable executors. The conf is read
  * per call, so one session can flip modes between pipelines.
  */
object Barriers {

  /** Conf key naming the reliable checkpoint location; unset/empty →
    * executor-local checkpoints (the single-box default). */
  val CheckpointDirKey = "spark.graft.checkpointDir"

  // the conf value LAST APPLIED per context — SparkContext stores
  // <dir>/<random-UUID> (fully qualified), so getCheckpointDir can
  // never equal the conf value; without this map every stage() call
  // would re-run setCheckpointDir (an FS mkdirs round trip on the
  // driver) and scatter each checkpoint into a fresh UUID directory
  private val applied =
    new java.util.concurrent.ConcurrentHashMap[org.apache.spark.SparkContext, String]()

  /** Eager (default) or lazy materialization barrier: reliable
    * `checkpoint` when [[CheckpointDirKey]] is set, `localCheckpoint`
    * otherwise. Sets the SparkContext checkpoint dir on first use per
    * configured value (a later conf change re-points it). */
  def stage(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(CheckpointDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        val sc = spark.sparkContext
        if (applied.get(sc) != dir) {
          sc.setCheckpointDir(dir)
          applied.put(sc, dir)
        }
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }
}
