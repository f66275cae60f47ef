package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Exact integer cents of a DOUBLE measure: bit-identical to
  * `CAST(x AS DECIMAL(18,2)) * 100` as a BIGINT, without the per-row
  * `Double.toString` + BigDecimal allocation that cast takes. On the
  * error regime (NaN/Inf/precision overflow) it yields NULL — i.e.
  * `try_cast` semantics; the session's ANSI-mode CAST would throw there
  * instead, a regime no real measure column reaches (DoubleCentsSpec's
  * real-measure test proves the data, its adversarial test pins the
  * try_cast equality).
  *
  * Spark's double→DECIMAL(18,2) cast rounds the SHORTEST decimal
  * representation of the double (`BigDecimal.valueOf`, i.e.
  * `Double.toString`) HALF_UP at scale 2, yielding NULL on NaN/±Inf or
  * when the result exceeds 18 digits of precision. This expression takes
  * a primitive fast path when it can PROVE the same answer:
  * for |x| < 2⁴⁴, if n = round(x·100) satisfies `(double)(n/100) == x`,
  * then x is exactly the double nearest to the 2-decimal value n/100 —
  * the shortest representation r of x then sits within ulp(x) ≤ 2⁻⁸ of
  * n/100, strictly inside the half-cent interval, so HALF_UP(r, 2) is
  * n/100 and the cents are n. Every other input (3-decimal doubles,
  * magnitudes ≥ 2⁴⁴, NaN/Inf) falls back to the exact BigDecimal path —
  * the same arithmetic the cast performs. DoubleCentsSpec pins equality
  * to `(CAST(x AS DECIMAL(18,2)) * 100) :: BIGINT` on real measure
  * columns and adversarial boundary doubles.
  *
  * Used where a DECIMAL(18,2) aggregate feeds only a COMPARISON, never
  * the output schema (analytics_big_orders' HAVING): summing exact cents
  * as BIGINT is the identical total in integer arithmetic at codegen
  * speed. (Group sums must stay ≪ 2⁶³ cents — per-key measure sums, not
  * corpus-wide money, by orders of magnitude.)
  */
case class DoubleCents(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def prettyName: String = "double_cents"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires DOUBLE, got ${other.sql}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else DoubleCents.centsOrNull(v.asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("cents")
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        long ${ev.value} = 0L;
        if (!${childGen.isNull}) {
          java.lang.Long $boxed =
            graft.functions.DoubleCents.centsOrNull(${childGen.value});
          if ($boxed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $boxed.longValue();
          }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object DoubleCents {

  private val Ten18 = java.math.BigInteger.TEN.pow(18)
  /** 2⁴⁴ — fast-path magnitude bound: ulp(2⁴⁴) = 2⁻⁸ < half a cent. */
  private val FastBound = 1.7592186044416e13

  /** Exact cents of `d` under DECIMAL(18,2)-cast semantics, or null where
    * the cast yields null (NaN/Inf/precision overflow). Static-forwarded
    * for the generated code. */
  def centsOrNull(d: Double): java.lang.Long = {
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) return null
    if (d > -FastBound && d < FastBound) {
      val n = Math.round(d * 100.0)
      if (n / 100.0 == d) return java.lang.Long.valueOf(n)
    }
    val s = new java.math.BigDecimal(java.lang.Double.toString(d))
      .setScale(2, java.math.RoundingMode.HALF_UP)
    if (s.unscaledValue.abs.compareTo(Ten18) >= 0) null
    else java.lang.Long.valueOf(s.unscaledValue.longValueExact)
  }
}
