package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization of a string column (codegen'd).
  *
  * Spark has no built-in Unicode normalizer; text curation needs one
  * before any dedup/fingerprint step ("Café" composed vs decomposed must
  * hash identically — without NFC they are different md5s, different
  * minhash shingles, different exact-dup groups). Implemented over
  * `java.text.Normalizer` (the JDK's ICU-equivalent table); DuckDB's
  * `nfc_normalize` agrees byte-for-byte, which is what lets the tx01
  * oracle value-check the whole normalize pipeline.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    GraftTypeChecks.strings(prettyName, child.dataType)
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(a: Any): Any =
    TextOps.nfc(a.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.TextOps.nfc($a)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Static helpers callable from generated code. */
object TextOps {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: Normalizer.isNormalized is a cheap scan; ASCII and most
    // already-composed text skips the allocation entirely
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
