package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float>` columns.
  *
  * The reference engine scores embeddings with a server-side
  * `vector.similarity.cosine` scan (reference: `src/semantic_search.py:62-71`,
  * `analysis_queries.md:504,515`). Spark has no built-in cosine over arrays;
  * a Scala UDF would box every element and block whole-stage codegen, so
  * this is the one place the engine drops to a custom `Expression` with
  * `doGenCode` — the generated loop stays inside the WholeStageCodegen span
  * and reads primitive floats straight out of Tungsten `ArrayData`.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.floatArrays(prettyName, left.dataType, right.dataType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi; i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh locals: this expression can occur many times in one projection
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product over two `array<float>` columns (codegen'd). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.floatArrays(prettyName, left.dataType, right.dataType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over two `array<tinyint>` columns (codegen'd) —
  * the scoring kernel of the int8-quantized ANN path
  * (`Similarity.quantizeI8`). Returns LONG so no dimension count can
  * overflow (127² per element). Reconstruct real-space similarity by
  * multiplying with the two per-vector scales.
  */
case class DotProductQ8(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.byteArrays(prettyName, left.dataType, right.dataType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_q8"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L; var i = 0
    while (i < n) { dot += x.getByte(i).toLong * y.getByte(i).toLong; i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += (long) $a.getByte($i) * (long) $b.getByte($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of an `array<float>` column (codegen'd). */
case class L2Norm(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.floatArrays(prettyName, child.dataType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "l2_norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var s = 0.0; var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.functions.VectorOps.l2Norm($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Deterministic feature-hashing text embedder producing `array<float>`.
  *
  * Stand-in for the reference's sentence-transformers MiniLM encoder
  * (reference: `src/embedding_utils.py:8-20`) in a zero-egress JVM build:
  * bag-of-words feature hashing (sign + slot from murmur3), L2-normalised so
  * cosine scores are meaningful. The real model sits behind the same
  * `TextEmbedder` trait (see graft.esco.embed) — this expression is the
  * deterministic test/CI implementation.
  */
case class HashEmbed(child: Expression, dim: Int)
    extends UnaryExpression {

  require(dim > 0, "dim must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.strings(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hash_embed"

  override def nullSafeEval(a: Any): Any =
    VectorOps.hashEmbed(a.toString, dim)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      a => s"graft.functions.VectorOps.hashEmbed($a.toString(), $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

private[graft] object GraftTypeChecks {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult.{TypeCheckFailure, TypeCheckSuccess}
  def floatArrays(fn: String, ts: DataType*): TypeCheckResult =
    if (ts.forall(_.isInstanceOf[ArrayType]) &&
        ts.forall(_.asInstanceOf[ArrayType].elementType == FloatType)) TypeCheckSuccess
    else TypeCheckFailure(s"$fn expects array<float> arguments, got ${ts.mkString(", ")}")
  def strings(fn: String, ts: DataType*): TypeCheckResult =
    if (ts.forall(_ == StringType)) TypeCheckSuccess
    else TypeCheckFailure(s"$fn expects string arguments, got ${ts.mkString(", ")}")
  def byteArrays(fn: String, ts: DataType*): TypeCheckResult =
    if (ts.forall(t => t.isInstanceOf[ArrayType] &&
        t.asInstanceOf[ArrayType].elementType == ByteType)) TypeCheckSuccess
    else TypeCheckFailure(s"$fn expects array<tinyint> arguments, got ${ts.mkString(", ")}")
  def stringArrays(fn: String, ts: DataType*): TypeCheckResult =
    if (ts.forall(t => t.isInstanceOf[ArrayType] &&
        t.asInstanceOf[ArrayType].elementType == StringType)) TypeCheckSuccess
    else TypeCheckFailure(s"$fn expects array<string> arguments, got ${ts.mkString(", ")}")
}

/** Static helpers callable from generated code. */
object VectorOps {
  def l2Norm(x: ArrayData): Double = {
    var s = 0.0; var i = 0
    val n = x.numElements()
    while (i < n) { val v = x.getFloat(i).toDouble; s += v * v; i += 1 }
    math.sqrt(s)
  }

  def hashEmbed(text: String, dim: Int): ArrayData = {
    val acc = new Array[Double](dim)
    var start = 0
    val len = text.length
    var i = 0
    while (i <= len) {
      if (i == len || Character.isWhitespace(text.charAt(i))) {
        if (i > start) {
          val tok = text.substring(start, i).toLowerCase
          val h = scala.util.hashing.MurmurHash3.stringHash(tok, 0x9747b28c)
          val slot = math.floorMod(h >>> 1, dim)
          val sign = if ((h & 1) == 0) 1.0 else -1.0
          acc(slot) += sign
        }
        start = i + 1
      }
      i += 1
    }
    var norm = 0.0
    var j = 0
    while (j < dim) { norm += acc(j) * acc(j); j += 1 }
    val inv = if (norm == 0.0) 0.0 else 1.0 / math.sqrt(norm)
    val out = new Array[Float](dim)
    j = 0
    while (j < dim) { out(j) = (acc(j) * inv).toFloat; j += 1 }
    new GenericArrayData(out)
  }
}

/** All signed-random-projection LSH buckets of an `array<float>` vector in
  * ONE expression: returns `array<struct<band:int, bucket:long>>`, one
  * entry per hyperplane table, bit `b` of a bucket set iff the vector's
  * sequential-double dot with plane (t, b) is >= 0 — bit-for-bit the same
  * buckets as the previous `tables x bits` composition of `dot_product` /
  * `shiftleft` / `bitwiseOR` Column expressions (so SQL-oracle replays are
  * unchanged).
  *
  * Exists for CODEGEN COMPACTNESS, not semantics: Catalyst substitutes a
  * projected array expression into every predicate that references it, so
  * the inlined form (48 dot-product loops, duplicated 8x by an
  * `array_contains` disjunction after predicate pushdown) generated a
  * ~9.7k-line `processNext()` that janino refused to compile — the whole
  * stage silently fell back to interpreted execution. Here the generated
  * code is a single `compute()` call into compiled Scala regardless of how
  * wide the plane tensor is, keeping every LSH stage inside
  * WholeStageCodegen at any (tables, bits, dim).
  */
case class LshBuckets(child: Expression, planes: Seq[Seq[Seq[Float]]])
    extends UnaryExpression {

  // compiled plane tensor; rebuilt once per deserialized instance
  @transient private lazy val p: Array[Array[Array[Float]]] =
    planes.map(_.map(_.toArray).toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.floatArrays(prettyName, child.dataType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("band", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false))),
    containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_buckets"

  def compute(a: ArrayData): ArrayData = {
    val tables = p.length
    val len = a.numElements()
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      val tp = p(t)
      var acc = 0L
      var b = 0
      while (b < tp.length) {
        val pb = tp(b)
        val n = math.min(pb.length, len)
        var dot = 0.0
        var i = 0
        while (i < n) { dot += pb(i).toDouble * a.getFloat(i).toDouble; i += 1 }
        if (dot >= 0) acc |= (1L << b)
        b += 1
      }
      out(t) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](t, acc))
      t += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(a: Any): Any = compute(a.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("lshPlanes", this, classOf[LshBuckets].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
