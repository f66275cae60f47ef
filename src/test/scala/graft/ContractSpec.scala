package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants: the flagship smoke, key consistency between
  * queries and oracleSql, and executability of every declared query
  * (mirrors the reference's own runtime verification,
  * `etl_medallion.py:220-296`). */
class ContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("flagship entry returns rows at sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a queries entry") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("declared query names are unique") {
    val names = SparkEntry.declared.map(_.name)
    assert(names.distinct.size == names.size)
  }

  test("every declared query executes at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, TestSpark.Sf0001).count()
      withClue(name)(assert(n >= 0))
    }
  }

  test("core queries are non-empty at sf0.001") {
    val core = Seq("silver_sales", "gold_sales_analytics", "gold_product_metrics",
      "gold_sales_summary", "analytics_top_products", "dedup_exact",
      "sim_bruteforce_topk", "text_token_counts", "events_hourly", "mm_features")
    core.foreach { name =>
      withClue(name)(assert(SparkEntry.queries(name)(spark, TestSpark.Sf0001).count() > 0))
    }
  }
}
