package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Catalyst optimizer rule: bound thresholded Levenshtein comparisons.
  *
  * `levenshtein(a, b) <= k` (the record-linkage filter shape, e.g.
  * [[graft.operators.Dedup.nameEdit]]) computes the full O(|a|·|b|) DP for
  * every candidate pair and THEN compares. But a distance bound admits two
  * strictly cheaper equivalent forms, applied together:
  *
  *   1. `abs(length(a) - length(b)) <= k` — a free prune (edit distance is
  *      at least the length difference), evaluated before any DP;
  *   2. `levenshtein(a, b, k) >= 0` — Spark's banded threshold variant,
  *      O(min(|a|,|b|)·k) with early exit, returning −1 when the distance
  *      exceeds k.
  *
  * The rewrite preserves three-valued null semantics (null operand → null
  * comparison on both sides) so it is safe in any expression context, not
  * just Filter. It only fires on an UNthresholded levenshtein compared to a
  * non-negative integer literal, so it cannot re-fire on its own output
  * (fixed-point safe).
  *
  * This is the "custom `Rule[LogicalPlan]` via `SparkSessionExtensions`"
  * integration path: users enable it with
  * `spark.sql.extensions=graft.plans.GraftExtensions`, and every query in
  * the session — including raw `spark.sql` text — gets the optimization
  * with no query rewrite. At 100 TB blocking-join scale the banded DP is
  * the difference between the join's non-equi filter dominating and
  * disappearing into the scan.
  */
object LevenshteinThresholdRule extends Rule[LogicalPlan] {

  private def lengthGuard(a: Expression, b: Expression, k: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(a), Length(b))), k)

  private def banded(a: Expression, b: Expression, k: Expression): Expression =
    GreaterThanOrEqual(Levenshtein(a, b, Some(k)), Literal(0))

  private def bounded(a: Expression, b: Expression, k: Expression): Expression =
    And(lengthGuard(a, b, k), banded(a, b, k))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case LessThanOrEqual(Levenshtein(a, b, None), k @ Literal(kv: Int, IntegerType))
          if kv >= 0 =>
        bounded(a, b, k)
      case LessThan(Levenshtein(a, b, None), Literal(kv: Int, IntegerType)) if kv >= 1 =>
        bounded(a, b, Literal(kv - 1))
      case GreaterThanOrEqual(k @ Literal(kv: Int, IntegerType), Levenshtein(a, b, None))
          if kv >= 0 =>
        bounded(a, b, k)
      case GreaterThan(Literal(kv: Int, IntegerType), Levenshtein(a, b, None)) if kv >= 1 =>
        bounded(a, b, Literal(kv - 1))
    }
}

/** Session extension entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => LevenshteinThresholdRule)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
    // the library's custom expressions as SQL functions: raw
    // `spark.sql("SELECT hash60(x) ...")` text gets the same codegen'd
    // expression the DataFrame API uses
    ext.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("hash60"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.Hash60].getName, "hash60"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "hash60 takes one argument")
        graft.functions.Hash60(children.head)
      }))
  }
}
