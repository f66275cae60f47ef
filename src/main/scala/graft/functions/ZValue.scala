package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-order (Morton) interleave of two non-negative long keys — the
  * space-filling-curve sort key for multi-column data clustering. Sorting a
  * table by `z(a, b)` makes every contiguous file/row-group span a small
  * RECTANGLE in (a, b) space, so min/max footer stats prune scans filtered
  * on EITHER column — where a plain `ORDER BY a, b` clusters only the
  * leading column and leaves b's per-file range at full width.
  *
  * Each input contributes its low 31 bits (clamped; negative → 0), output
  * is the 62-bit interleave. Codegen'd static call, no allocation.
  */
case class ZValue(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "zvalue"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (BIGINT, BIGINT), got (${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZValue.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZValue.interleave($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ZValue {

  /** Spread the low 31 bits of v to even bit positions (0, 2, 4, …). */
  private def spread(v: Long): Long = {
    var x = v & 0x7fffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Morton interleave: a's bits at even positions, b's at odd. Negative
    * inputs clamp to 0 (keys are expected non-negative surrogate ids). */
  def interleave(a: Long, b: Long): Long =
    spread(if (a < 0) 0L else a) | (spread(if (b < 0) 0L else b) << 1)
}
