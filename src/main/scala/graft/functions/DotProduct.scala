package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression for the dot product of two DOUBLE arrays —
  * the [[CosineSimilarity]] treatment applied to the bare fold.
  *
  * The composable form (`aggregate(zip_with(a,b,*), 0.0, +)`) is
  * CodegenFallback: it breaks whole-stage codegen for the entire projection
  * it appears in, materializes an intermediate array per row, and evaluates
  * two lambda closures per element. That cost sat on the hottest artifact
  * builds in the suite — every SRP band table computes tables×bits dot
  * products per vector (the n×104-row crossJoin in `srpBands`), and the
  * modality join one per row. This expression is one fused loop, allocates
  * nothing, and participates in whole-stage codegen.
  *
  * Bit-identity with the HOF form and DuckDB's `list_dot_product` (the
  * oracle's rendering): accumulation is sequential left-to-right from +0.0
  * (dot = ((0+x₀y₀)+x₁y₁)+…), the identical fold order, so every result —
  * and in particular the SIGN that decides each SRP band bit — is
  * bit-identical across all three forms. (0.0 + z == z for every IEEE
  * double z except -0.0, where both forms produce +0.0 — still equal.)
  *
  * Null handling: NULL if either array is NULL (BinaryExpression default).
  * Vectors of unequal length fold over the common prefix, matching
  * [[CosineSimilarity]].
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<DOUBLE> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
