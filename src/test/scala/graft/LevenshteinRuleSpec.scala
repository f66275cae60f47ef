package graft

import graft.plans.LevenshteinThresholdRule
import org.apache.spark.sql.catalyst.expressions.Levenshtein
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions-injected optimizer rule
  * ([[graft.plans.LevenshteinThresholdRule]]): `levenshtein(a,b) <= k`
  * must be rewritten to a length-difference prune plus the banded
  * threshold Levenshtein, without changing any result.
  */
class LevenshteinRuleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val pairs = Seq(
    ("kitten", "sitting"),   // distance 3
    ("flaw", "lawn"),        // distance 2
    ("abc", "abc"),          // distance 0
    ("short", "muchlongerstring"), // length gap 11 — prunable without DP
    ("abcd", "wxyz")         // distance 4
  ).toDF("a", "b")

  test("filter lev(a,b) <= k is rewritten to banded form in the optimized plan") {
    // file-backed relation — a local relation would be constant-folded away
    // by ConvertToLocalRelation before the plan can be inspected
    val q = Tables.part(spark, TestSpark.Sf0001)
      .filter(levenshtein(col("p_name"), reverse(col("p_name"))) <= 3)
    val optimized = q.queryExecution.optimizedPlan
    val thresholded = optimized.expressions.flatMap(_.collect {
      case l @ Levenshtein(_, _, Some(_)) => l
    })
    assert(thresholded.nonEmpty, s"no banded levenshtein in:\n$optimized")
    val unbounded = optimized.expressions.flatMap(_.collect {
      case l @ Levenshtein(_, _, None) => l
    })
    assert(unbounded.isEmpty, s"unbounded levenshtein survived:\n$optimized")
    // the free length prune is present
    assert(optimized.toString.contains("length"), optimized.toString)
  }

  test("the rule fires inside the real nameEdit query (through the alias)") {
    // nameEdit filters on a projected alias of levenshtein; predicate
    // pushdown substitutes the alias in the same optimizer fixpoint, so
    // the injected rule must still band the DP
    val optimized = graft.operators.Dedup.nameEdit(spark, TestSpark.Sf0001)
      .queryExecution.optimizedPlan
    val thresholded = optimized.collect { case p =>
      p.expressions.flatMap(_.collect { case l @ Levenshtein(_, _, Some(_)) => l })
    }.flatten
    assert(thresholded.nonEmpty, s"rule did not reach nameEdit:\n$optimized")
  }

  test("rewrite preserves results, including strict < and flipped forms") {
    assert(pairs.filter(levenshtein(col("a"), col("b")) <= 3).count() == 3)
    assert(pairs.filter(levenshtein(col("a"), col("b")) < 3).count() == 2)
    assert(pairs.filter(lit(3) >= levenshtein(col("a"), col("b"))).count() == 3)
    assert(pairs.filter(lit(3) > levenshtein(col("a"), col("b"))).count() == 2)
    // null operands still yield no match (three-valued semantics preserved)
    val withNull = Seq(("kitten", Option.empty[String])).toDF("a", "b")
    assert(withNull.filter(levenshtein(col("a"), col("b")) <= 3).count() == 0)
  }

  test("hash60 is registered as a SQL function by the extensions") {
    val viaSql = spark.sql("SELECT hash60('abc') AS h").collect()(0).getLong(0)
    val viaApi = pairs.limit(1)
      .select(graft.functions.TextFns.hash60(lit("abc")).as("h"))
      .collect()(0).getLong(0)
    assert(viaSql == viaApi)
  }

  test("projected distances are untouched when not compared to a literal") {
    val rows = pairs.select(levenshtein(col("a"), col("b")).as("d"))
      .collect().map(_.getInt(0)).sorted
    assert(rows.toSeq == Seq(0, 2, 3, 4, 12))
  }
}
