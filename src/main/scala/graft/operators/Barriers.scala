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
  *
  * Operational constraints of the reliable path:
  *
  *   - '''Cleanup''': Spark deletes reliable checkpoint files only when
  *     `spark.cleaner.referenceTracking.cleanCheckpoints=true` (default
  *     FALSE, and it must be set in the SparkConf BEFORE the context
  *     starts — ContextCleaner reads it once at startup). Without it,
  *     every staged frame leaves a full materialized copy under the
  *     checkpoint dir for the application's lifetime and beyond; a
  *     long-lived cluster session must either set the cleaner conf or
  *     point [[CheckpointDirKey]] at a location with a storage-lifecycle
  *     rule (object-store TTL) / delete it on app teardown.
  *   - '''One dir per context''': the checkpoint directory is a
  *     SparkContext-global (`setCheckpointDir`), while
  *     [[CheckpointDirKey]] is session-scoped. Two sessions sharing one
  *     context MUST configure the same value — with different values the
  *     last writer wins and the other session's checkpoints land under
  *     the winner's directory. [[stage]] serializes the set-and-check so
  *     the applied record can't race, but it cannot give two sessions two
  *     directories on one context.
  */
object Barriers {

  /** Conf key naming the reliable checkpoint location; unset/empty →
    * executor-local checkpoints (the single-box default). */
  val CheckpointDirKey = "spark.graft.checkpointDir"

  // the conf value LAST APPLIED per context — SparkContext stores
  // <dir>/<random-UUID> (fully qualified), so getCheckpointDir can
  // never equal the conf value; without this map every stage() call
  // would re-run setCheckpointDir (an FS mkdirs round trip on the
  // driver) and scatter each checkpoint into a fresh UUID directory.
  // WeakHashMap so a stopped SparkContext isn't pinned forever; all
  // access goes through [[applyDir]]'s monitor (the map is not
  // thread-safe, and the check-then-set must be atomic anyway).
  private val applied =
    new java.util.WeakHashMap[org.apache.spark.SparkContext, String]()

  // atomic check-and-set of the context's checkpoint dir: without the
  // monitor, two sessions racing stage() could interleave get/set and
  // double-apply (an extra mkdirs round trip + a stray UUID dir)
  private def applyDir(sc: org.apache.spark.SparkContext, dir: String): Unit =
    applied.synchronized {
      if (applied.get(sc) != dir) {
        sc.setCheckpointDir(dir)
        applied.put(sc, dir)
      }
    }

  /** Eager (default) or lazy materialization barrier: reliable
    * `checkpoint` when [[CheckpointDirKey]] is set, `localCheckpoint`
    * otherwise. Sets the SparkContext checkpoint dir on first use per
    * configured value (a later conf change re-points it); see the object
    * doc for the cleanup and one-dir-per-context constraints. */
  def stage(df: DataFrame, eager: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(CheckpointDirKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        applyDir(spark.sparkContext, dir)
        df.checkpoint(eager)
      case None => df.localCheckpoint(eager)
    }
  }

  /** Materialize several MUTUALLY INDEPENDENT frames' barriers
    * concurrently. Eager [[stage]] calls issued one after another leave
    * the cluster idle through each job's tail; Spark's scheduler runs
    * concurrent jobs happily (actions are only sequential because the
    * driver calls them sequentially — optimization guide §2.6), so the
    * independent prior-state frames of a maintenance lane can
    * materialize together and back-fill each other's stragglers.
    *
    * Implementation: every frame takes a LAZY barrier, then one bounded
    * thread pool runs a count() per frame — the first action
    * materializes a lazy checkpoint, so after the barrier returns, all
    * frames read from their materialized blocks exactly as if staged
    * eagerly in sequence. Caller contract: the frames must not depend
    * on one another's barrier (a dependent frame would just recompute
    * its parent inside its own job — correct, but the parent's work
    * runs twice). */
  def stageAll(dfs: DataFrame*): Seq[DataFrame] = {
    val staged = dfs.map(stage(_, eager = false))
    if (staged.size <= 1) { staged.foreach(_.count()); return staged }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(staged.size, 8))
    try {
      val futures = staged.map(df =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          override def call(): Long = df.count()
        }))
      futures.foreach(_.get())
    } finally pool.shutdown()
    staged
  }
}
