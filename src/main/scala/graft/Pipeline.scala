package graft

import graft.operators.Medallion
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Orchestration analog of the reference's HTTP surface + `run_etl()`
  * (reference `main.py:35-74`, `etl_medallion.py:302-344`):
  *
  *   - layers run in order; the pipeline STOPS at the first failed layer
  *     (`etl_medallion.py:316-321`);
  *   - statements *within* a layer are independent: a failure marks the
  *     layer failed but the remaining statements still run
  *     (`etl_medallion.py:144-148, 213-217`);
  *   - error messages are truncated to 100 chars (`etl_medallion.py:70`);
  *   - the run report carries per-layer status + timing, like
  *     `POST /trigger-etl`'s JSON and `CloudRunETL.run_etl_pipeline()`'s
  *     duration (`etl_pipeline.py:10-13`).
  *
  * Each "statement" materializes one relation as a temp view (the session-
  * catalog analog of the reference's CTAS into BigQuery datasets).
  */
object Pipeline {

  final case class StatementResult(name: String, ok: Boolean, error: Option[String])
  final case class LayerResult(layer: String, ok: Boolean, statements: Seq[StatementResult])

  /** One expected-table inventory row (reference `etl_medallion.py:261-265`:
    * the post-run check that every expected table exists, with its count). */
  final case class InventoryCheck(name: String, present: Boolean, rows: Long)

  final case class RunReport(
      status: String,
      layersProcessed: Seq[String],
      layers: Seq[LayerResult],
      durationSec: Double,
      inventory: Seq[InventoryCheck]) {
    /** True iff every expected table materialized (reference's
      * `verification` gate). */
    def inventoryComplete: Boolean = inventory.forall(_.present)
  }

  type Statement = (String, (SparkSession, String) => DataFrame)

  /** The medallion layers, as ordered statement lists. */
  def defaultLayers(): Seq[(String, Seq[Statement])] = Seq(
    "bronze" -> Seq[Statement](
      "bronze_lineitem" -> ((s, d) => Tables.lineitem(s, d)),
      "bronze_part" -> ((s, d) => Tables.part(s, d)),
      "bronze_supplier" -> ((s, d) => Tables.supplier(s, d))),
    "silver" -> Seq[Statement](
      "silver_sales" -> Medallion.silverSales _,
      "silver_products" -> Medallion.silverProducts _,
      "silver_suppliers" -> Medallion.silverSuppliers _),
    "gold" -> Seq[Statement](
      "gold_sales_analytics" -> Medallion.goldSalesAnalytics _,
      "gold_product_metrics" -> Medallion.goldProductMetrics _,
      "gold_sales_summary" -> Medallion.goldSalesSummary _))

  private def truncate(msg: String): String = {
    val m = Option(msg).getOrElse("")
    if (m.length <= 100) m else m.substring(0, 100)
  }

  /** Run one statement: build the plan, materialize it as a temp view, and
    * force execution (the CTAS analog — a view alone would defer failures). */
  private def runStatement(spark: SparkSession, dir: String, st: Statement): StatementResult =
    try {
      val (name, fn) = st
      val df = fn(spark, dir)
      df.createOrReplaceTempView(name)
      df.count() // force, like job.result() at etl_medallion.py:67
      StatementResult(name, ok = true, None)
    } catch {
      case e: Throwable => StatementResult(st._1, ok = false, Some(truncate(e.getMessage)))
    }

  def run(spark: SparkSession, dir: String,
      layers: Seq[(String, Seq[Statement])] = defaultLayers()): RunReport = {
    val t0 = System.nanoTime()
    val results = scala.collection.mutable.ArrayBuffer.empty[LayerResult]
    val processed = scala.collection.mutable.ArrayBuffer.empty[String]
    var halted = false
    layers.foreach { case (layer, statements) =>
      if (!halted) {
        // intra-layer: independent statements, all attempted
        val sts = statements.map(runStatement(spark, dir, _))
        val ok = sts.forall(_.ok)
        results += LayerResult(layer, ok, sts)
        if (ok) processed += layer
        else halted = true // inter-layer: dependent, stop at first failure
      }
    }
    // post-run expected-table inventory (reference `etl_medallion.py:261-265`):
    // every DECLARED statement is expected, including those of layers that
    // never ran — a halted pipeline reports them as absent
    val expected = layers.flatMap(_._2.map(_._1))
    val inventory = expected.map { name =>
      val present = spark.catalog.tableExists(name) &&
        results.exists(_.statements.exists(s => s.name == name && s.ok))
      InventoryCheck(name, present,
        if (present) spark.table(name).count() else -1L)
    }
    RunReport(
      status = if (halted) "error" else "success",
      layersProcessed = processed.toSeq,
      layers = results.toSeq,
      durationSec = (System.nanoTime() - t0) / 1e9,
      inventory = inventory)
  }
}
