package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full declared operator inventory (one entry per SURVEY §2
  * capability, plus the extension tier); `oracleSql` holds the DuckDB
  * equivalent for every SQL-expressible entry. Column names and ordering are
  * pinned identically on both sides (SURVEY §7.3).
  */
object SparkEntry {

  /** All declared queries, in module groups. */
  def declared: Seq[Q] =
    Medallion.all ++ Analytics.all ++ Notebook.all ++ Relational.all ++ Formats.all ++
      Windows.all ++ EventTime.all ++ Dedup.all ++ TextAnalysis.all ++ Similarity.all ++
      Multimodal.all ++ Sampling.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship denormalization (gold.sales_analytics,
    * reference `etl_medallion.py:161-179`).
    */
  def entry(spark: SparkSession): DataFrame =
    Medallion.goldSalesAnalytics(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    declared.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    declared.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
