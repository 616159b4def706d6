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

  // one strong base hash per shingle + k universal-hash permutations
  // (a_j * h + b_j): 64× fewer hash computations than hashing per
  // permutation, statistically equivalent for MinHash (Broder's scheme)
  private lazy val as: Array[Long] = {
    val rnd = new java.util.Random(0x9e3779b97f4a7c15L)
    Array.fill(numHashes)(rnd.nextLong() | 1L) // odd multipliers
  }
  private lazy val bs: Array[Long] = {
    val rnd = new java.util.Random(0xc2b2ae3d27d4eb4fL)
    Array.fill(numHashes)(rnd.nextLong())
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Int.MaxValue)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val bytes = s.getBytes
        val h = Sketches.hash64(bytes, 0x1b873593, 0x85ebca6b)
        var j = 0
        while (j < numHashes) {
          // top 32 bits of the permuted hash: well-mixed under a*h+b
          val p = ((as(j) * h + bs(j)) >>> 32).toInt
          if (p < mins(j)) mins(j) = p
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

/** Distinct hashed token n-grams: `array<string>` tokens → `array<long>`
  * of the distinct n-gram hashes. The allocation-free path feeding MinHash
  * and Jaccard — building shingle STRINGS via higher-order functions costs
  * interpreted per-element lambdas plus string copies (measured ~10× the
  * whole dedup runtime); this walks the token array once and combines
  * per-token hashes positionally. */
case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(n > 0, "n must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.stringArrays(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ngram_hashes"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    if (cnt < n) new GenericArrayData(Array.empty[Long])
    else {
      // per-token 64-bit hashes once, then positional combine per window
      val th = new Array[Long](cnt)
      var i = 0
      while (i < cnt) {
        val s = arr.getUTF8String(i)
        th(i) = if (s == null) 0L else Sketches.hash64(s.getBytes, 0x9747b28c, 0x3c6ef372)
        i += 1
      }
      val out = new java.util.HashSet[java.lang.Long]()
      i = 0
      while (i <= cnt - n) {
        var h = 0x811c9dc5L
        var j = 0
        while (j < n) { h = h * 0x100000001b3L + th(i + j); j += 1 }
        out.add(h)
        i += 1
      }
      val res = new Array[Long](out.size)
      val it = out.iterator()
      var k = 0
      while (it.hasNext) { res(k) = it.next(); k += 1 }
      java.util.Arrays.sort(res) // deterministic order regardless of set impl
      new GenericArrayData(res)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over pre-hashed shingles (`array<long>`), permutation
  * scheme identical to [[MinHashSignature]] but with the base hash already
  * computed — the fast path used by graft.operators.Dedup. */
case class MinHashFromHashes(child: Expression, numHashes: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(numHashes > 0, "numHashes must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<long>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_from_hashes"

  private lazy val as: Array[Long] = {
    val rnd = new java.util.Random(0x9e3779b97f4a7c15L)
    Array.fill(numHashes)(rnd.nextLong() | 1L)
  }
  private lazy val bs: Array[Long] = {
    val rnd = new java.util.Random(0xc2b2ae3d27d4eb4fL)
    Array.fill(numHashes)(rnd.nextLong())
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    val mins = Array.fill(numHashes)(Int.MaxValue)
    var i = 0
    while (i < cnt) {
      val h = arr.getLong(i)
      var j = 0
      while (j < numHashes) {
        val p = ((as(j) * h + bs(j)) >>> 32).toInt
        if (p < mins(j)) mins(j) = p
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** md5-derived hash primitives shared by the engine-portable signature
  * family (graft.operators.Dedup's `*Portable` surface). Every value here
  * is reproducible in any SQL engine from `md5(x)` + integer arithmetic —
  * that's the whole point: a DuckDB oracle replays signatures bit-for-bit.
  */
object PortableHash {
  /** Largest 32-bit prime: modulus of the portable permutation family. */
  val P = 4294967291L

  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** Thread-local MD5 instance (digest() leaves it reset for reuse). */
  def md5: java.security.MessageDigest = mdLocal.get()

  /** First 32 bits of an md5 digest as an unsigned value in a long —
    * `('0x' || substr(md5(s), 1, 8))::BIGINT` in SQL. */
  @inline def first32(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)

  /** First 60 bits (15 hex chars — the widest md5 prefix that stays a
    * positive long in every engine): 7 full bytes + the high nibble of
    * the 8th. */
  @inline def first60(d: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** md5-32 of a string's UTF-8 bytes. */
  def md5_32(s: String): Long = first32(md5.digest(s.getBytes("UTF-8")))

  /** md5-60 of a string's UTF-8 bytes — driver twin of [[h60]]. */
  def md5_60(s: String): Long = first60(md5.digest(s.getBytes("UTF-8")))

  /** Column twin of [[md5_32]] — the ONE definition of the portable
    * 32-bit column hash (`('0x' || substr(md5(c), 1, 8))::BIGINT` in
    * SQL). The replay contract is load-bearing for every md5-family
    * oracle, so the expression must not fork per call site. */
  def h32(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{conv, md5 => md5c, substring}
    conv(substring(md5c(c.cast("binary")), 1, 8), 16, 10).cast("long")
  }

  /** Column twin of [[first60]] — `('0x' || substr(md5(c), 1, 15))
    * ::BIGINT` in SQL: the widest md5 prefix that stays a positive long
    * in every engine. Use where 32 bits would birthday-collide at scale
    * (e.g. chunk fingerprints); same one-definition contract as [[h32]]. */
  def h60(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{conv, md5 => md5c, substring}
    conv(substring(md5c(c.cast("binary")), 1, 15), 16, 10).cast("long")
  }

  /** Permutation constants of the portable MinHash family: md5-derived
    * from the literal strings "a<j>"/"b<j>" — no RNG for an oracle to
    * replay. `a_j` stays below 2³¹ so `a_j·h + b_j` never exceeds 2⁶³. */
  def minhashA(j: Int): Long = (md5_32("a" + j) % 2147483647L) + 1L
  def minhashB(j: Int): Long = md5_32("b" + j) % P
}

/** Engine-portable MinHash signature over an `array<string>` of tokens:
  * n-gram shingles joined by single spaces, base hash md5-32 of the
  * shingle's UTF-8 bytes, permutations `(a_j·h + b_j) mod P` with the
  * [[PortableHash]] constants. Output `array<long>` of length `numHashes`;
  * fewer than `nGram` tokens → the all-sentinel signature (P everywhere).
  *
  * Bit-identical to the documented SQL formulation (and to the
  * higher-order-function twin kept in graft.operators.Dedup for the
  * equivalence spec) but ~10× faster: the HOF version pays an interpreted
  * lambda plus a fresh 64-slot array per shingle; this is one tight loop
  * per row. Null tokens are filtered exactly like SQL `array_join`. */
case class MinHashPortable(child: Expression, numHashes: Int, nGram: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(numHashes > 0, "numHashes must be positive")
  require(nGram > 0, "nGram must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.stringArrays(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_portable"

  private lazy val as: Array[Long] = Array.tabulate(numHashes)(PortableHash.minhashA)
  private lazy val bs: Array[Long] = Array.tabulate(numHashes)(PortableHash.minhashB)

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    val mins = Array.fill(numHashes)(PortableHash.P)
    if (cnt >= nGram) {
      val tb = new Array[Array[Byte]](cnt)
      var i = 0
      while (i < cnt) {
        val s = arr.getUTF8String(i)
        tb(i) = if (s == null) null else s.getBytes
        i += 1
      }
      val md = PortableHash.md5
      i = 0
      while (i <= cnt - nGram) {
        var wrote = false
        var j = 0
        while (j < nGram) {
          val b = tb(i + j)
          if (b != null) { // array_join filters nulls (delimiter too)
            if (wrote) md.update(0x20.toByte)
            md.update(b)
            wrote = true
          }
          j += 1
        }
        val h = PortableHash.first32(md.digest())
        var k = 0
        while (k < numHashes) {
          val p = (as(k) * h + bs(k)) % PortableHash.P
          if (p < mins(k)) mins(k) = p
          k += 1
        }
        i += 1
      }
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Engine-portable 60-bit SimHash over an `array<string>` of tokens (with
  * multiplicity): per-token hash = md5-60, bit b votes +1 when set and −1
  * when clear, output sets bit b iff its vote is strictly positive. A null
  * token hashes as 0 (every bit clear — the SQL `when` falls to −1), same
  * as the HOF twin. */
case class SimHash60Portable(child: Expression)
    extends UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.stringArrays(prettyName, child.dataType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash60_portable"

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val cnt = arr.numElements()
    val votes = new Array[Int](60)
    val md = PortableHash.md5
    var i = 0
    while (i < cnt) {
      val s = arr.getUTF8String(i)
      val h = if (s == null) 0L else PortableHash.first60(md.digest(s.getBytes))
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
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
