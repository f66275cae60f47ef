package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-format round-trips (`operators.Formats`): losslessness of the
  * JSON-lines nested-struct path and filter pushdown into the ORC reader. */
class FormatsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("JSON round-trip is lossless for the nested supplier schema") {
    val back = graft.operators.Formats.jsonRoundtrip(spark, TestSpark.Sf0001)
    val orig = Tables.supplier(spark, TestSpark.Sf0001)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    assert(back.count() === orig.count())
    // exact row-set equality both directions
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("ORC read-back pushes the status filter into the reader") {
    val df = graft.operators.Formats.orcRoundtrip(spark, TestSpark.Sf0001)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedFilters"), plan)
    assert(plan.contains("o_orderstatus"), plan)
    // and the aggregate agrees with the parquet-direct form
    val direct = Tables.orders(spark, TestSpark.Sf0001)
      .filter(col("o_orderstatus") === "F")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
    val got = df.select("o_orderpriority", "n_orders")
    assert(got.exceptAll(direct).isEmpty && direct.exceptAll(got).isEmpty)
  }
}
