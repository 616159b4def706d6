package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EscoWarehouse

/** Accuracy bounds for the sketch aggregates (sk01) and semantics of the
  * incremental upsert helper. */
class SketchAccuracySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("approx_count_distinct within 5% of exact on the events table") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val rows = ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact"),
        approx_count_distinct(col("user_id"), 0.02).as("approx"))
      .collect()
    rows.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"${r.getString(0)}: exact=$exact approx=$approx")
    }
  }

  test("percentile_approx brackets the exact median") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    val exact = ev.agg(median(col("value"))).head().getDouble(0)
    val approx = ev.agg(percentile_approx(col("value"), lit(0.5), lit(1000)))
      .head().getDouble(0)
    val spread = ev.agg(max(col("value")) - min(col("value"))).head().getDouble(0)
    assert(math.abs(approx - exact) < spread * 0.02,
      s"exact=$exact approx=$approx spread=$spread")
  }

  test("upsertNodes: replace on key, append unseen, keep untouched") {
    val existing = Seq((1L, "a", "old"), (2L, "b", "old"), (3L, "c", "old"))
      .toDF("k", "name", "ver")
    val incoming = Seq((2L, "b2", "new"), (9L, "z", "new"))
      .toDF("k", "name", "ver")
    val out = EscoWarehouse.upsertNodes(existing, incoming, "k")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
    assert(out(1L) == (("a", "old")))
    assert(out(2L) == (("b2", "new")))
    assert(out(3L) == (("c", "old")))
    assert(out(9L) == (("z", "new")))
    assert(out.size == 4)
  }
}
