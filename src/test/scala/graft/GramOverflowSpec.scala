package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the two-lane BIGINT Gram accumulation (Similarity.gramCells) at a
  * row count where a single-lane BIGINT sum of the raw products WOULD wrap:
  * 10.5M rows of the max micro-unit product (10^12 each) sum to 1.05e19 >
  * Long.MaxValue (~9.22e18). The two-lane split keeps each lane's running
  * sum around 1e13 — ~2^43-row headroom — and the recombined BigInt must be
  * exact, which is what keeps the Spark side equal to the oracle's HUGEINT
  * sum past the ~9M-row single-lane boundary. */
class GramOverflowSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val Rows = 10500000L
  private val Q = 1000000L // max micro-unit magnitude: product = 10^12

  test("gram lane sum is exact where a single BIGINT product sum wraps") {
    // the guard the spec exists for: this row count MUST exceed the
    // single-lane wrap point, or the test stops testing anything
    assert(BigInt(Rows) * Q * Q > BigInt(Long.MaxValue))
    val qarr = spark.range(Rows).select(array(lit(Q)).as("q"))
    val cells = Similarity.gramCells(qarr)
    assert(cells.length == 1)
    val (d1, d2, c) = cells.head
    assert(d1 == 0 && d2 == 0)
    assert(c == BigInt(Rows) * Q * Q)
  }

  test("gram lane split is exact on negative products") {
    // q1*q2 < 0 exercises the arithmetic-shift hi lane + non-negative lo
    // lane on negatives: p = (p >> 20)*2^20 + (p & (2^20-1)) must hold
    val qarr = spark.range(1000L)
      .select(array(lit(999999L), lit(-997L)).as("q"))
    val cells = Similarity.gramCells(qarr).map { case (a, b, c) => (a, b) -> c }.toMap
    assert(cells((0, 0)) == BigInt(1000L) * 999999L * 999999L)
    assert(cells((0, 1)) == BigInt(1000L) * 999999L * -997L)
    assert(cells((1, 0)) == BigInt(1000L) * 999999L * -997L)
    assert(cells((1, 1)) == BigInt(1000L) * 997L * 997L)
  }
}
