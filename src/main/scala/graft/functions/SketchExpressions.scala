package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.util.hashing.MurmurHash3

/** Sketch expressions backing the near-duplicate operators (graft.operators.Dedup).
  *
  * These are the scale path for deduplicating a 100 TB corpus: each is a
  * single narrow map over the token array — no shuffle, no state — producing
  * a compact signature that the LSH band/bucket join then shuffles instead
  * of the raw text. All hashing is seeded murmur3: deterministic across
  * runs, JVMs and partitionings.
  *
  * CodegenFallback is deliberate here: each eval is a tight per-row loop
  * over ~100 tokens dominated by hashing, and keeping the surrounding
  * projection in codegen with one virtual call per row costs ~nothing
  * relative to the hash work (unlike per-element UDF boxing).
  */
object Sketches {
  /** 64-bit token hash from two seeded murmur3-32 halves. */
  @inline def hash64(bytes: Array[Byte], seedHi: Int, seedLo: Int): Long = {
    val hi = MurmurHash3.bytesHash(bytes, seedHi).toLong
    val lo = MurmurHash3.bytesHash(bytes, seedLo).toLong & 0xffffffffL
    (hi << 32) | lo
  }
}

/** k-permutation MinHash signature over an `array<string>` of shingles.
  * Output: `array<int>` of length `numHashes`; empty input → all Int.MaxValue. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.stringArrays(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Int.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val bytes = s.getBytes
        var j = 0
        while (j < numHashes) {
          val h = MurmurHash3.bytesHash(bytes, 0x1b873593 + j * 0x9e3779b9)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over an `array<string>` of tokens (bit-voting). */
case class SimHash64(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.stringArrays(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = Sketches.hash64(s.getBytes, 0xcafebabe, 0x5bd1e995)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing-style document fingerprint: min-of-rolling-polynomial-hash over
  * character k-grams. One long per document; equal fingerprints are strong
  * near-duplicate candidates even under small edits away from the minimum.
  */
case class RollingFingerprint(child: Expression, k: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(k > 0, "k must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.strings(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  private val B = 1000003L // polynomial base
  private lazy val Bk: Long = { // B^(k-1) for the rolling subtract, wrapping arithmetic
    var p = 1L; var i = 1
    while (i < k) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < k) {
      var h = 0L; var i = 0
      while (i < n) { h = h * B + s.charAt(i); i += 1 }
      h
    } else {
      var h = 0L; var i = 0
      while (i < k) { h = h * B + s.charAt(i); i += 1 }
      var min = mix(h)
      while (i < n) {
        h = (h - s.charAt(i - k) * Bk) * B + s.charAt(i)
        val m = mix(h)
        if (m < min) min = m
        i += 1
      }
      min
    }
  }

  /** finalizer so the min is over well-scrambled values, not raw prefixes */
  @inline private def mix(x: Long): Long = {
    var h = x
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
