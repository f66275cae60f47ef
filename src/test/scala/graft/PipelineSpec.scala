package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Orchestration semantics from SURVEY §3.1/§7.6(6): inter-layer
  * short-circuit, intra-layer statement independence, truncated errors. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("happy path: all layers processed in order, inventory complete") {
    val report = Pipeline.run(spark, TestSpark.Sf0001)
    assert(report.status == "success")
    assert(report.layersProcessed == Seq("bronze", "silver", "gold"))
    assert(report.durationSec > 0)
    assert(report.inventory.map(_.name) == Seq(
      "bronze_lineitem", "bronze_part", "bronze_supplier",
      "silver_sales", "silver_products", "silver_suppliers",
      "gold_sales_analytics", "gold_product_metrics", "gold_sales_summary"))
    assert(report.inventoryComplete)
    assert(report.inventory.forall(_.rows > 0))
  }

  test("failing statement stops later layers but not its own layer's siblings") {
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new RuntimeException("x" * 500)
    val layers = Seq(
      "bronze" -> Seq[Pipeline.Statement](
        "b_ok" -> ((s, d) => Tables.part(s, d))),
      "silver" -> Seq[Pipeline.Statement](
        "s_fail" -> boom,
        "s_ok_after_fail" -> ((s, d) => Tables.part(s, d))),
      "gold" -> Seq[Pipeline.Statement](
        "g_never" -> ((s, d) => Tables.part(s, d))))
    val report = Pipeline.run(spark, TestSpark.Sf0001, layers)
    assert(report.status == "error")
    assert(report.layersProcessed == Seq("bronze"))
    val silver = report.layers.find(_.layer == "silver").get
    assert(!silver.ok)
    assert(silver.statements.map(_.name) == Seq("s_fail", "s_ok_after_fail"),
      "intra-layer statements after a failure must still run")
    assert(silver.statements.last.ok)
    assert(silver.statements.head.error.get.length == 100, "errors truncate to 100 chars")
    assert(!report.layers.exists(_.layer == "gold"), "gold must never start")
    // inventory reflects the halt: failed + never-run statements are absent
    assert(!report.inventoryComplete)
    val inv = report.inventory.map(c => c.name -> c.present).toMap
    assert(inv("b_ok") && inv("s_ok_after_fail"))
    assert(!inv("s_fail") && !inv("g_never"))
  }
}
