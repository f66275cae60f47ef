package graft

import graft.operators.Windows
import graft.plans.AsOf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom as-of physical operator ([[graft.plans.AsOfJoinExec]]):
  * planned via the injected strategy, equal to the window carry-forward
  * form, correct left-outer null semantics.
  */
class AsOfExecSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("custom exec result == window carry-forward result (sf0.001)") {
    val a = Windows.asofJoin(spark, TestSpark.Sf0001)
    val b = Windows.asofJoinCustom(spark, TestSpark.Sf0001)
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    assert(b.count() > 0)
  }

  test("the plan contains the custom AsOfJoin node, not a window or SMJ") {
    val p = Windows.asofJoinCustom(spark, TestSpark.Sf0001)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p.take(800))
    assert(!p.contains("SortMergeJoin"), "fell back to a standard join")
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "),
      "fell back to the window form")
  }

  test("left-outer semantics: unmatched and future-only right rows yield nulls") {
    val left = Seq((1L, 10L, "p1"), (2L, 5L, "p2"), (3L, 7L, "p3"))
      .toDF("k", "t", "ltag")
    val right = Seq((1L, 9L, "c-early"), (1L, 11L, "c-late"), (3L, 7L, "c-equal"),
        (4L, 1L, "c-orphan"))
      .toDF("rk", "rt", "rtag")
    val out = AsOf.joinBackward(left, right, "k", "rk", "t", "rt")
      .select(col("ltag"), col("rtag")).collect()
      .map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out("p1").contains("c-early"), "latest ts <= left ts wins")
    assert(out("p2").isEmpty, "key with no right rows -> null")
    assert(out("p3").contains("c-equal"), "equal timestamp is inclusive")
  }

  test("randomized equivalence with a reference as-of computed in plain Scala") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val rowGen = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 5L), Gen.choose(0L, 20L)))
    (1 to 6).foreach { seed =>
      val lRows = rowGen.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .zipWithIndex.map { case ((k, t), i) => (k, t, s"l$i") }
      val rRowsRaw = rowGen.pureApply(Gen.Parameters.default, Seed(seed + 100L))
        .zipWithIndex.map { case ((k, t), i) => (k, t, s"r$i") }
      // dedup right per (key, ts) — the operator's documented precondition
      val rRows = rRowsRaw.groupBy(r => (r._1, r._2)).map(_._2.maxBy(_._3)).toSeq
      val expected = lRows.map { case (k, t, tag) =>
        val m = rRows.filter(r => r._1 == k && r._2 <= t)
        tag -> (if (m.isEmpty) None else Some(m.maxBy(r => (r._2, r._3))._3))
      }.toMap
      val out = AsOf.joinBackward(
          lRows.toDF("k", "t", "ltag"), rRows.toDF("rk", "rt", "rtag"),
          "k", "rk", "t", "rt")
        .select(col("ltag"), col("rtag")).collect()
        .map(r => r.getString(0) -> Option(r.getString(1))).toMap
      assert(out == expected, s"seed $seed mismatch")
    }
  }

  test("multiple left rows share one match; right pointer never rewinds") {
    val left = Seq((1L, 10L, "a"), (1L, 10L, "b"), (1L, 20L, "c")).toDF("k", "t", "ltag")
    val right = Seq((1L, 8L, "m1"), (1L, 15L, "m2")).toDF("rk", "rt", "rtag")
    val out = AsOf.joinBackward(left, right, "k", "rk", "t", "rt")
      .select(col("ltag"), col("rtag")).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out == Map("a" -> "m1", "b" -> "m1", "c" -> "m2"))
  }
}
