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
}
