package graft.operators

import graft.{Q, Tables}
import graft.Q._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operators beyond the reference's own surface, completing the
  * engine vocabulary: set operations (SURVEY §2.7 — absent in reference),
  * distinct aggregates, ROLLUP grouping sets (§2.4 absent rows), and the
  * bronze CSV edge (S1/S2/S4) as a lossless round-trip through the CSV
  * source/sink.
  */
object Relational {

  /** Set operations over user cohorts: buyers who clicked, minus errors.
    * UNION/INTERSECT/EXCEPT all compile to hash aggregates/joins on a
    * shuffled key — no driver-side sets. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    def ids(t: String) = ev.filter(col("event_type") === t).select(col("user_id")).distinct()
    ids("click").intersect(ids("purchase")).except(ids("error"))
  }

  val setOpsSql: String =
    """SELECT DISTINCT user_id FROM events WHERE event_type = 'click'
      |INTERSECT
      |SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
      |EXCEPT
      |SELECT DISTINCT user_id FROM events WHERE event_type = 'error'
      |ORDER BY user_id""".stripMargin

  /** Distinct aggregate: exact per-type distinct users + event count.
    * Catalyst plans COUNT(DISTINCT) as a two-phase expand+aggregate — the
    * scalable exact form (approx_count_distinct is the sketch variant). */
  def countDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        count_distinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_events"))

  val countDistinctSql: String =
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** ROLLUP over (channel, region): per-pair, per-channel subtotal, and
    * grand total in one pass (Expand + single shuffle). */
  def rollupRevenue(spark: SparkSession, dir: String): DataFrame =
    Medallion.silverSales(spark, dir)
      .rollup(col("l_returnflag").as("channel"), col("l_linestatus").as("region"))
      .agg(
        count(lit(1)).as("n"),
        dec2(sum(dec(col("l_extendedprice")))).as("total_revenue"))

  val rollupRevenueSql: String =
    """SELECT l_returnflag AS channel, l_linestatus AS region,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_revenue
      |FROM lineitem
      |WHERE l_quantity > 0 AND l_extendedprice > 0
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY channel NULLS FIRST, region NULLS FIRST""".stripMargin

  /** Pivot: revenue per (year, month) with one column per return-flag
    * channel — `groupBy().pivot(values)` compiles to conditional aggregates
    * in a single pass (values pinned, so no extra distinct-scan job). */
  def pivotRevenue(spark: SparkSession, dir: String): DataFrame =
    Medallion.silverSales(spark, dir)
      .groupBy(year(col("l_shipdate")).as("year"), month(col("l_shipdate")).as("month"))
      .pivot("l_returnflag", Seq("A", "N", "R"))
      .agg(dec2(sum(dec(col("l_extendedprice")))))

  val pivotRevenueSql: String =
    """SELECT CAST(EXTRACT(YEAR FROM l_shipdate) AS INTEGER) AS year,
      |       CAST(EXTRACT(MONTH FROM l_shipdate) AS INTEGER) AS month,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
      |            FILTER (WHERE l_returnflag = 'A') AS DECIMAL(18,2)) AS "A",
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
      |            FILTER (WHERE l_returnflag = 'N') AS DECIMAL(18,2)) AS "N",
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
      |            FILTER (WHERE l_returnflag = 'R') AS DECIMAL(18,2)) AS "R"
      |FROM lineitem
      |WHERE l_quantity > 0 AND l_extendedprice > 0
      |GROUP BY 1, 2
      |ORDER BY year, month""".stripMargin

  /** Semi-structured extraction: pull a typed field out of the JSON props
    * column and aggregate it — the JSON path stays inside codegen
    * (get_json_object), no UDF, no driver-side parsing. */
  def jsonExtract(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_parsed"),
        sum(col("k")).as("total_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))

  val jsonExtractSql: String =
    """SELECT event_type,
      |       COUNT(k) AS n_parsed,
      |       CAST(SUM(k) AS BIGINT) AS total_k,
      |       MIN(k) AS min_k,
      |       MAX(k) AS max_k
      |FROM (SELECT event_type,
      |             CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
      |      FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** CUBE over (channel, region): all four grouping sets in one pass. */
  def cubeRevenue(spark: SparkSession, dir: String): DataFrame =
    Medallion.silverSales(spark, dir)
      .cube(col("l_returnflag").as("channel"), col("l_linestatus").as("region"))
      .agg(
        count(lit(1)).as("n"),
        dec2(sum(dec(col("l_extendedprice")))).as("total_revenue"))

  val cubeRevenueSql: String =
    """SELECT l_returnflag AS channel, l_linestatus AS region,
      |       COUNT(*) AS n,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_revenue
      |FROM lineitem
      |WHERE l_quantity > 0 AND l_extendedprice > 0
      |GROUP BY CUBE(l_returnflag, l_linestatus)
      |ORDER BY channel NULLS FIRST, region NULLS FIRST""".stripMargin

  /** Bronze CSV edge (S1/S2/S4): parquet → CSV sink (header, explicit sep)
    * → CSV source (header + schema inference) must be lossless for this
    * schema, so the oracle is simply the parquet table. Mirrors the
    * reference's LOAD DATA … skip_leading_rows=1 (`etl_medallion.py:90-99`)
    * and the notebook's sep=';', inferSchema read (`etl_spark.ipynb:113`).
    */
  def csvRoundtrip(spark: SparkSession, dir: String): DataFrame = {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_csv_bronze/" +
      dir.replaceAll("[^A-Za-z0-9.]", "_") + "/part"
    Tables.part(spark, dir)
      .write.mode("overwrite")
      .option("header", "true").option("sep", ";")
      .csv(out)
    spark.read
      .option("header", "true").option("sep", ";").option("inferSchema", "true")
      .csv(out)
      .select(col("p_partkey").cast("long"), col("p_name"), col("p_brand"),
        col("p_type"), col("p_size").cast("int"), col("p_retailprice").cast("double"))
  }

  val csvRoundtripSql: String =
    """SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
      |FROM part
      |ORDER BY p_partkey""".stripMargin

  /** Catalog inventory (S6/S7/S9 + the reference's expected-table contract,
    * `etl_medallion.py:261-265`): register the medallion relations as temp
    * views in a session catalog namespace-by-prefix, then read the inventory
    * back from `spark.catalog`. The oracle pins the expected inventory as a
    * literal — a schema contract, like the reference's hardcoded lists. */
  def catalogInventory(spark: SparkSession, dir: String): DataFrame = {
    val layers: Seq[(String, DataFrame)] = Seq(
      "bronze_lineitem" -> Tables.lineitem(spark, dir),
      "bronze_part" -> Tables.part(spark, dir),
      "bronze_supplier" -> Tables.supplier(spark, dir),
      "silver_sales" -> Medallion.silverSales(spark, dir),
      "silver_products" -> Medallion.silverProducts(spark, dir),
      "silver_suppliers" -> Medallion.silverSuppliers(spark, dir),
      "gold_sales_analytics" -> Medallion.goldSalesAnalytics(spark, dir),
      "gold_product_metrics" -> Medallion.goldProductMetrics(spark, dir),
      "gold_sales_summary" -> Medallion.goldSalesSummary(spark, dir))
    layers.foreach { case (name, df) => df.createOrReplaceTempView(name) }
    val inventory = spark.catalog.listTables()
      .filter(col("isTemporary") === true)
      .select(col("name"))
      .filter(col("name").startsWith("bronze_") ||
        col("name").startsWith("silver_") || col("name").startsWith("gold_"))
      .withColumn("layer", split(col("name"), "_").getItem(0))
      .withColumn("n_columns",
        element_at(
          map(layers.flatMap { case (n, df) =>
            Seq(lit(n), lit(df.schema.fields.length))
          }: _*),
          col("name")))
    inventory.select(col("layer"), col("name"), col("n_columns"))
  }

  val catalogInventorySql: String =
    """SELECT * FROM (VALUES
      |  ('bronze', 'bronze_lineitem', 11),
      |  ('bronze', 'bronze_part', 6),
      |  ('bronze', 'bronze_supplier', 4),
      |  ('gold', 'gold_product_metrics', 7),
      |  ('gold', 'gold_sales_analytics', 14),
      |  ('gold', 'gold_sales_summary', 7),
      |  ('silver', 'silver_products', 6),
      |  ('silver', 'silver_sales', 11),
      |  ('silver', 'silver_suppliers', 5)
      |) AS t(layer, name, n_columns)
      |ORDER BY name""".stripMargin

  /** Skew-resistant aggregation: pre-aggregate on (key, salt) — 16-way fan
    * of any hot key — then combine partials. Same result as a direct
    * groupBy (the oracle is the plain form); at 100 TB this is the pattern
    * that keeps one hot event_type from pinning a single reducer.
    * (Catalyst's partial aggregation already does this for algebraic aggs;
    * the explicit form is for sketches/collect-style states that lack a
    * map-side combine, and composes with AQE skew handling.)
    */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("_salt", pmod(hash(col("user_id")), lit(16)))
      .groupBy(col("event_type"), col("_salt"))
      .agg(
        count(lit(1)).as("n"),
        sum(dec(col("value"))).as("v"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("n")).as("n_events"),
        dec2(sum(col("v"))).as("total_value"))

  val saltedAggSql: String =
    """SELECT event_type, COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Exact interpolated percentiles per group (median, p90). Spark's
    * `percentile` and DuckDB's `quantile_cont` both linearly interpolate
    * over the sorted group. */
  def quantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.9)").as("p90"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  val quantilesSql: String =
    """SELECT event_type,
      |       quantile_cont(value, 0.5) AS p50,
      |       quantile_cont(value, 0.9) AS p90,
      |       MIN(value) AS min_value,
      |       MAX(value) AS max_value
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** HyperLogLog distinct-count sketch next to the exact count. No DuckDB
    * oracle (sketch estimates are engine-specific) — the spec bounds the
    * relative error instead. At 100 TB the sketch is the only affordable
    * way to count distincts per high-cardinality group. */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), 0.02).as("approx_users"),
        count_distinct(col("user_id")).as("exact_users"))

  val all: Seq[Q] = Seq(
    Q("rel_set_ops", setOps(_, _).orderBy("user_id"), Some(setOpsSql)),
    Q("rel_quantiles", quantiles(_, _).orderBy("event_type"), Some(quantilesSql)),
    Q("rel_json_extract", jsonExtract(_, _).orderBy("event_type"), Some(jsonExtractSql)),
    Q("rel_pivot", pivotRevenue(_, _).orderBy("year", "month"), Some(pivotRevenueSql)),
    Q("rel_approx_distinct", approxDistinct(_, _).orderBy("event_type"), None),
    Q("rel_salted_agg", saltedAgg(_, _).orderBy("event_type"), Some(saltedAggSql)),
    Q("rel_count_distinct", countDistinct(_, _).orderBy("event_type"),
      Some(countDistinctSql)),
    Q("rel_rollup", rollupRevenue(_, _)
      .orderBy(col("channel").asc_nulls_first, col("region").asc_nulls_first),
      Some(rollupRevenueSql)),
    Q("rel_cube", cubeRevenue(_, _)
      .orderBy(col("channel").asc_nulls_first, col("region").asc_nulls_first),
      Some(cubeRevenueSql)),
    Q("rel_csv_roundtrip", csvRoundtrip(_, _).orderBy("p_partkey"), Some(csvRoundtripSql)),
    Q("rel_catalog_inventory", catalogInventory(_, _).orderBy("name"),
      Some(catalogInventorySql)))
}
