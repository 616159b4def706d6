package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams

/** Environment-drift tripwire for the driver's testdata contract.
  *
  * Round 6 lost 8 correctness lanes and 15 tests because `events.ts`
  * silently changed parquet type (TIMESTAMP(NANOS) → TIMESTAMP(MICROS))
  * between driver generations; every failure was a cryptic analysis error
  * far from the cause. This spec fails FIRST, with the exact drifted
  * column, if the loader-facing dtypes move again — and proves the events
  * loader handles both known `ts` encodings via in-test fixtures.
  */
class TestdataContractSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def dtypes(table: String): Map[String, DataType] = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sf/$table.parquet")
      .schema.fields.map(f => f.name -> f.dataType).toMap
  }

  private def assertTypes(table: String, expected: (String, Seq[DataType])*): Unit = {
    val got = dtypes(table)
    val drift = expected.flatMap { case (col, ok) =>
      got.get(col) match {
        case Some(t) if ok.contains(t) => None
        case Some(t) => Some(s"$table.$col is $t, loader expects one of ${ok.mkString("/")}")
        case None    => Some(s"$table.$col is MISSING")
      }
    }
    assert(drift.isEmpty, s"\nTESTDATA DRIFT:\n  ${drift.mkString("\n  ")}")
  }

  test("events: loader-facing dtypes (ts may be long-nanos OR timestamp)") {
    assertTypes("events",
      "event_id" -> Seq(LongType),
      "ts" -> Seq(LongType, TimestampType, TimestampNTZType),
      "user_id" -> Seq(LongType),
      "event_type" -> Seq(StringType),
      "value" -> Seq(DoubleType),
      "props" -> Seq(StringType))
  }

  test("relational tables: loader-facing dtypes") {
    assertTypes("lineitem",
      "l_orderkey" -> Seq(LongType), "l_partkey" -> Seq(LongType),
      "l_quantity" -> Seq(DoubleType), "l_extendedprice" -> Seq(DoubleType),
      "l_discount" -> Seq(DoubleType), "l_returnflag" -> Seq(StringType),
      "l_shipdate" -> Seq(TimestampType, TimestampNTZType, DateType))
    assertTypes("orders",
      "o_orderkey" -> Seq(LongType), "o_custkey" -> Seq(LongType),
      "o_totalprice" -> Seq(DoubleType),
      "o_orderdate" -> Seq(TimestampType, TimestampNTZType, DateType),
      "o_orderstatus" -> Seq(StringType), "o_orderpriority" -> Seq(StringType))
    assertTypes("customer",
      "c_custkey" -> Seq(LongType), "c_nationkey" -> Seq(IntegerType),
      "c_acctbal" -> Seq(DoubleType), "c_mktsegment" -> Seq(StringType))
    assertTypes("documents",
      "doc_id" -> Seq(LongType), "text" -> Seq(StringType),
      "lang" -> Seq(StringType), "source" -> Seq(StringType))
    assertTypes("embeddings",
      "vec_id" -> Seq(LongType),
      "embedding" -> Seq(ArrayType(FloatType), ArrayType(FloatType, false)),
      "label" -> Seq(IntegerType))
  }

  /** The two known `ts` encodings, as real parquet files round-tripped
    * through the loader: normalize must yield identical (ts, ts_ns) for
    * the same instant from either encoding. */
  test("GraftSession.prepare sets the nanosAsLong read conf for events") {
    // Lane builders must NOT mutate session conf; prepare() (which every
    // lane runs first via withReg, and SparkEntry.events calls directly)
    // is the single place the nanos read conf is established.
    val fresh = spark.newSession()
    GraftSession.prepare(fresh)
    assert(fresh.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true",
      "prepare() must set the nanosAsLong conf before any events read")
  }

  test("events loader normalizes both nanos-long and micros-timestamp ts") {
    val micros = 1700000123456789L // 2023-11-14T22:15:23.456789Z
    val dir = Files.createTempDirectory("graft-ts-fixtures")
    try {

    val nanoSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, micros * 1000L, 7L, "view", 1.0, "{}")), 1), nanoSchema)
      .write.parquet(s"$dir/nanos")

    val microsSchema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", TimestampNTZType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        Seq(Row(1L, java.time.LocalDateTime.ofEpochSecond(
          micros / 1000000L, (micros % 1000000L).toInt * 1000,
          java.time.ZoneOffset.UTC), 7L, "view", 1.0, "{}")), 1), microsSchema)
      .write.parquet(s"$dir/micros")

    def load(sub: String): (String, Long) = {
      val r = EventStreams.normalize(spark.read.parquet(s"$dir/$sub"))
        .select(col("ts").cast("string"), col("ts_ns")).head()
      (r.getString(0), r.getLong(1))
    }
    val (tsN, nsN) = load("nanos")
    val (tsU, nsU) = load("micros")
    assert(tsN == tsU, s"ts mismatch across encodings: $tsN vs $tsU")
    assert(nsN == nsU && nsN == micros * 1000L,
      s"ts_ns mismatch: nanos=$nsN micros=$nsU expected=${micros * 1000L}")
    } finally {
      // per-run fixtures; leave nothing behind in the temp dir
      import scala.jdk.CollectionConverters._
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(p => Files.deleteIfExists(p))
    }
  }
}
