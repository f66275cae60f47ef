package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expression counting positions where two BIGINT arrays
  * hold equal values — the MinHash signature-agreement estimator
  * (est_jaccard = matches / numPerms), previously computed per candidate
  * pair as `aggregate(zip_with(sa.sig, sb.sig, (x,y) -> int(x=y)), 0, +)`.
  * That HOF chain is CodegenFallback (breaks whole-stage codegen for the
  * verification projection) and allocates an intermediate 32-element array
  * per pair. This is one fused loop over the two arrays, integer-exact by
  * construction (no floating point anywhere), so oracle parity is free.
  *
  * Null handling: NULL if either array is NULL (BinaryExpression default);
  * arrays of unequal length compare over the common prefix, matching
  * [[CosineSimilarity]] / [[DotProduct]]. Signature arrays contain no null
  * elements (they are MIN aggregates of non-null hashes).
  */
case class ArrayEqCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two ARRAY<BIGINT> arguments, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "array_eq_count"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (x.getLong(i) == y.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
