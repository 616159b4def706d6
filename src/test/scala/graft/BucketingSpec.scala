package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.EscoWarehouse

/** Proves the bucketed layout removes the shuffle from edge⋈node joins —
  * the physical plan for a co-bucketed join must contain no
  * ShuffleExchange on the bucketed sides. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("co-bucketed edge-node join plans without a shuffle exchange") {
    // wipe any stale managed-table location from a previous test JVM
    val warehouseDb = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"),
      "graft_bucketed_test.db")
    if (warehouseDb.exists())
      org.apache.commons.io.FileUtils.deleteDirectory(warehouseDb)
    val wh = EscoWarehouse.build(spark, "/root/reference/ESCO")
    EscoWarehouse.saveBucketed(wh, spark, "graft_bucketed_test",
      nodeBuckets = 4, edgeBuckets = 4)

    val occ = spark.table("graft_bucketed_test.occupations")
      .withColumnRenamed("conceptUri", "occupationUri")
    val edges = spark.table("graft_bucketed_test.part_of_isco_group")

    val joined = edges.join(occ, Seq("occupationUri"))
    val plan = joined.queryExecution.executedPlan.toString()

    // both sides read pre-bucketed data on the join key -> SortMergeJoin
    // (or shuffle-free hash join) with zero Exchange operators
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    assert(joined.count() == 3039L)
  }

  test("bucketed vs unbucketed results identical") {
    val viaBucket = spark.table("graft_bucketed_test.essential_for").count()
    val wh = EscoWarehouse.build(spark, "/root/reference/ESCO")
    assert(viaBucket == wh.essentialFor.count())
  }
}
