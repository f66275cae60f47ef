package graft

import graft.operators.Relational
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("approx_count_distinct stays within 5% of exact per group") {
    val rows = Relational.approxDistinct(spark, TestSpark.Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      val err = math.abs(approx - exact) / exact
      assert(err <= 0.05, s"${r.getString(0)}: approx=$approx exact=$exact err=$err")
    }
  }
}
