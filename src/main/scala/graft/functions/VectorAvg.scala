package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Element-wise mean of `array<float>` vectors — the engine's UDAF surface
  * (SURVEY §2.10): a typed `Aggregator` with a primitive mutable buffer,
  * so a centroid computation is one hash aggregation instead of a
  * posexplode → (key, pos) shuffle → re-collect pipeline (dim× fewer
  * shuffled rows).
  *
  * Buffer: (sum per dimension, count); merge is element-wise. Vectors of
  * differing lengths extend the buffer to the max seen (shorter vectors
  * are zero-padded, consistent with treating them as sparse tails).
  */
object VectorAvg extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Float]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(
      b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    if (v == null) b
    else {
      val acc = if (b._1.length >= v.length) b._1
        else java.util.Arrays.copyOf(b._1, v.length)
      var i = 0
      while (i < v.length) { acc(i) += v(i); i += 1 }
      (acc, b._2 + 1)
    }
  }

  override def merge(
      x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    val (small, big) = if (x._1.length <= y._1.length) (x._1, y._1) else (y._1, x._1)
    val acc = java.util.Arrays.copyOf(big, big.length)
    var i = 0
    while (i < small.length) { acc(i) += small(i); i += 1 }
    (acc, x._2 + y._2)
  }

  override def finish(b: (Array[Double], Long)): Seq[Float] =
    if (b._2 == 0L) Seq.empty
    else b._1.map(s => (s / b._2).toFloat).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Float]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]()

  /** Column-API entry point. */
  def vectorAvg(c: Column): Column = udaf(VectorAvg).apply(c)
}

/** Exact-replay twin of [[VectorAvg]]: element-wise mean of `array<float>`
  * vectors in INTEGER MICRO-UNITS, so the result is independent of merge
  * order and replays bit-for-bit in any engine (the float path's double
  * sums depend on partial-aggregation grouping and can never hash-match
  * cross-engine). Each element is quantized once on ingest —
  * `floor(x * 1e6 + 0.5)` on the exact float→double widening — summed in
  * longs (embedding magnitudes ~1, so |sum| ≪ 2^63 for any realistic
  * group), and finished with `Math.floorDiv` (floor semantics hold for
  * negative sums too). This is the oracle-checkable UDAF representative
  * (SURVEY §2.10): same typed-`Aggregator` + primitive-buffer shape as
  * `VectorAvg`, one hash aggregation, no posexplode shuffle.
  */
object VectorAvgExact extends Aggregator[Seq[Float], (Array[Long], Long), Seq[Long]] {

  private def quantize(x: Float): Long = {
    // fail fast where the SQL twin would error: CAST(floor(x*1e6+0.5) AS
    // BIGINT) raises on NaN/Inf/overflow, while toLong would silently
    // saturate — the twin must diverge in NEITHER value nor kind
    require(java.lang.Float.isFinite(x) && math.abs(x) <= 1e12f,
      s"VectorAvgExact requires finite elements with |x| <= 1e12, got $x")
    math.floor(x.toDouble * 1e6 + 0.5).toLong
  }

  override def zero: (Array[Long], Long) = (Array.emptyLongArray, 0L)

  override def reduce(
      b: (Array[Long], Long), v: Seq[Float]): (Array[Long], Long) = {
    if (v == null) b
    else {
      val acc = if (b._1.length >= v.length) b._1
        else java.util.Arrays.copyOf(b._1, v.length)
      var i = 0
      while (i < v.length) { acc(i) += quantize(v(i)); i += 1 }
      (acc, b._2 + 1)
    }
  }

  override def merge(
      x: (Array[Long], Long), y: (Array[Long], Long)): (Array[Long], Long) = {
    val (small, big) = if (x._1.length <= y._1.length) (x._1, y._1) else (y._1, x._1)
    val acc = java.util.Arrays.copyOf(big, big.length)
    var i = 0
    while (i < small.length) { acc(i) += small(i); i += 1 }
    (acc, x._2 + y._2)
  }

  override def finish(b: (Array[Long], Long)): Seq[Long] =
    if (b._2 == 0L) Seq.empty
    else b._1.map(s => Math.floorDiv(s, b._2)).toSeq

  override def bufferEncoder: Encoder[(Array[Long], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Long], Long)]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()

  /** Column-API entry point. */
  def vectorAvgExact(c: Column): Column = udaf(VectorAvgExact).apply(c)
}
