package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Barriers

/** Barriers.stage: local by default, RELIABLE (checkpointDir-backed)
  * when `spark.graft.checkpointDir` is set — the cluster path for the
  * funnel barriers (localCheckpoint pins blocks to executor storage and
  * loses them on executor failure). */
class BarriersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("default: executor-local checkpoint, rows preserved") {
    val df = spark.range(100).select(col("id"), (col("id") * 2).as("x"))
    val staged = Barriers.stage(df)
    assert(staged.columns.toSeq == Seq("id", "x"))
    assert(staged.count() == 100L)
    assert(staged.agg(sum("x")).head.getLong(0) == 9900L)
  }

  test("spark.graft.checkpointDir set: reliable checkpoint to that dir") {
    val dir = Files.createTempDirectory("graft-ckpt-").toString
    val session = spark.newSession()
    GraftSession.prepare(session)
    session.conf.set(Barriers.CheckpointDirKey, dir)
    try {
      val df = session.range(50).select(col("id"), (col("id") + 1).as("y"))
      val staged = Barriers.stage(df)
      assert(staged.count() == 50L)
      assert(staged.agg(sum("y")).head.getLong(0) == 1275L)
      // the eager reliable checkpoint must have written real files
      val written = Files.walk(Paths.get(dir)).filter(Files.isRegularFile(_))
        .count()
      assert(written > 0, s"no checkpoint files under $dir")
    } finally {
      session.conf.unset(Barriers.CheckpointDirKey)
    }
  }

  test("timing smoke: reliable vs local barrier cost on the wp02 funnel") {
    // the cluster-mode cost as a MEASURED number (recorded in
    // SCALING.md), not a docstring: the same wp02 lane, barrier mode
    // flipped by the session conf alone. local[*] writes the reliable
    // checkpoint to local disk, so this measures the serialize+write
    // overhead floor — a distributed FS adds network on top.
    val sf = sys.env.getOrElse("SPARK_GRAFT_SMOKE_SF",
      "/root/testdata/sf0.001")
    val lane = SparkEntry.queries("wp02_web_acquire")
    def run(session: org.apache.spark.sql.SparkSession): Double = {
      val t0 = System.nanoTime()
      lane(session, sf).count()
      (System.nanoTime() - t0) / 1e9
    }
    run(spark) // warm the local path (codegen + page cache)
    val local = (1 to 3).map(_ => run(spark)).min
    val dir = Files.createTempDirectory("graft-ckpt-timing-").toString
    val session = spark.newSession()
    GraftSession.prepare(session)
    session.conf.set(Barriers.CheckpointDirKey, dir)
    try {
      run(session) // warm the reliable path
      val reliable = (1 to 3).map(_ => run(session)).min
      info(f"wp02 [$sf] barrier cost: local=$local%.3f s " +
        f"reliable=$reliable%.3f s (${reliable / local}%.2fx)")
      assert(local > 0.0 && reliable > 0.0)
      // files actually landed (the mode really flipped)
      assert(Files.walk(Paths.get(dir))
        .filter(Files.isRegularFile(_)).count() > 0)
    } finally session.conf.unset(Barriers.CheckpointDirKey)
  }
}
