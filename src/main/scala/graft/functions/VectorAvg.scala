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
