package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("quantize: monotone, endpoint-exact, identity on a power-of-two domain") {
    val df = (0L to 3L).toDF("x")
      .select(Layout.quantize(col("x"), 0L, 3L, bits = 2).as("q"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L, 3L))
    // non-power-of-two domain: [10, 14] onto 2 bits -> floor((x-10)*4/5)
    val q = (10L to 14L).toDF("x")
      .select(Layout.quantize(col("x"), 10L, 14L, bits = 2).as("q"))
      .collect().map(_.getLong(0)).toSeq
    assert(q == Seq(0L, 0L, 1L, 2L, 3L)) // min -> 0, max -> 2^bits - 1
    assertThrows[IllegalArgumentException](Layout.quantize(col("x"), 5L, 4L, 2))
    assertThrows[IllegalArgumentException](
      Layout.quantize(col("x"), 0L, Long.MaxValue / 2, bits = 16))
  }

  test("zValue: hand-checked Morton interleave; d*bits bound enforced") {
    // (x=1, y=2) at 2 bits: z bits (y1 x1 y0 x0) = 1001 = 9
    val z = Seq((1L, 2L)).toDF("x", "y")
      .select(Layout.zValue(Seq(col("x"), col("y")), bits = 2).as("z"))
      .head().getLong(0)
    assert(z == 9L)
    // one column degenerates to the identity
    val one = Seq(5L).toDF("x")
      .select(Layout.zValue(Seq(col("x")), bits = 3).as("z")).head().getLong(0)
    assert(one == 5L)
    assertThrows[IllegalArgumentException](
      Layout.zValue(Seq(col("x"), col("y")), bits = 32))
  }

  test("zorderBuckets: a 4x4 grid cut 4 ways lands each quadrant in one bucket") {
    val grid = (for { x <- 0L to 3L; y <- 0L to 3L } yield (x, y)).toDF("x", "y")
    val out = Layout.zorderBuckets(grid, Seq("x", "y"),
      Seq((0L, 3L), (0L, 3L)), bits = 2, nBuckets = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // bucket = (x high bit) + 2*(y high bit): the four 2x2 quadrants,
    // each with TIGHT min/max ranges on BOTH columns — the pruning win
    assert(out.toSeq == Seq(
      (0L, 4L, 0L, 1L, 0L, 1L),
      (1L, 4L, 2L, 3L, 0L, 1L),
      (2L, 4L, 0L, 1L, 2L, 3L),
      (3L, 4L, 2L, 3L, 2L, 3L)))
  }

  test("pruningComparison: y-filter prunes z-order quadrants, never the x-sort") {
    val grid = (for { x <- 0L to 3L; y <- 0L to 3L } yield (x, y)).toDF("x", "y")
    val out = Layout.pruningComparison(grid, Seq("x", "y"),
      Seq((0L, 3L), (0L, 3L)), filterCol = "y", lo = 2L, hi = 3L,
      bits = 2, nBuckets = 4)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // sorting by x leaves every bucket with the full y range (nothing
    // prunable); the z layout's two low-y quadrants miss [2,3] entirely
    assert(out.toSeq == Seq(
      ("single_sort", 4L, 0L, 16L),
      ("zorder", 4L, 2L, 8L)))
    assertThrows[IllegalArgumentException](
      Layout.pruningComparison(grid, Seq("x", "y"),
        Seq((0L, 3L), (0L, 3L)), "z_not_a_col", 0L, 1L))
  }

  test("zorderLayout: row-preserving, column-preserving, z-sorted within partitions") {
    val grid = (for { x <- 0L to 7L; y <- 0L to 7L } yield (x, y)).toDF("x", "y")
    val out = Layout.zorderLayout(grid, Seq("x", "y"),
      Seq((0L, 7L), (0L, 7L)), bits = 3, numPartitions = 4)
    assert(out.columns.toSeq == Seq("x", "y"))
    assert(out.count() == 64L)
    // within every partition the recomputed z must be non-decreasing
    val zs = out
      .withColumn("z", Layout.zValue(Seq(
        Layout.quantize(col("x"), 0L, 7L, 3),
        Layout.quantize(col("y"), 0L, 7L, 3)), 3))
      .withColumn("pid", spark_partition_id())
    import org.apache.spark.sql.Row
    val sortedWithin = zs.select("pid", "z").collect()
      .groupBy { case Row(pid: Int, _) => pid }
      .values.forall { rows =>
        val seq = rows.map { case Row(_, z: Long) => z }.toSeq
        seq == seq.sorted
      }
    assert(sortedWithin)
  }
}
