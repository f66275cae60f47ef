package graft

import graft.operators.Relational
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct stays within 5% of exact per group") {
    val rows = Relational.approxDistinct(spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2),
        s"${r.getString(0)}: approx error exceeds 5% (exact=${r.getLong(1)})")
    }
  }
}
