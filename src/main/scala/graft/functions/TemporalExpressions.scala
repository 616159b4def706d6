package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** As-of lookup over a pre-sorted timeline array.
  *
  * `asof_index(ts_array, ts)` returns the 1-BASED index of the greatest
  * element `<= ts` in an ascending-sorted `array<bigint>`, or null when
  * every element is greater. 1-based so the result feeds `element_at`
  * directly on any aligned value array — keeping this expression
  * type-generic without generic codegen.
  *
  * This is the probe side of the stream-static as-of join
  * (`TemporalJoins.asofJoinIndexed`): the window-function formulation of
  * as-of is illegal on streams, but a stream-static equi-join plus a
  * per-row binary search over the compacted static timeline is not.
  * O(log n) per row, inside whole-stage codegen.
  */
case class AsofIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == ArrayType(LongType, containsNull = false) ||
        left.dataType == ArrayType(LongType, containsNull = true))
      if (right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects a bigint probe, got ${right.dataType}")
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${left.dataType}")
  override def dataType: DataType = IntegerType
  // null inputs -> null AND a probe before the first element -> null
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true
  override def prettyName: String = "asof_index"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val idx = TemporalOps.asofIndex(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])
    if (idx == 0) null else idx
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, ts) => {
      val idx = ctx.freshName("idx")
      s"""
         |int $idx = graft.functions.TemporalOps.asofIndex($arr, $ts);
         |if ($idx == 0) { ${ev.isNull} = true; } else { ${ev.value} = $idx; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Static helpers callable from generated code. */
object TemporalOps {
  /** 1-based index of the greatest element <= ts in an ascending-sorted
    * array; 0 when none. Null elements (possible only when the array was
    * built outside `compactTimeline`) sort nowhere — treated as missing by
    * skipping: the array contract is non-null ascending, enforced by the
    * builder, so this just guards against crashes. */
  def asofIndex(arr: ArrayData, ts: Long): Int = {
    var lo = 0
    var hi = arr.numElements() - 1
    var ans = 0
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (!arr.isNullAt(mid) && arr.getLong(mid) <= ts) { ans = mid + 1; lo = mid + 1 }
      else hi = mid - 1
    }
    ans
  }
}
