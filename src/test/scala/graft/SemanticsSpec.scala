package graft

import graft.operators.Medallion
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** Pins the load-bearing semantics from SURVEY §7.6 with dirty fixtures:
  * COUNT(col) vs COUNT(*) on left joins (A5), concat NULL propagation (C3),
  * and the silver cleaning filters (F1-F3, C1-C2). */
class SemanticsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Tiny fixture star schema with dirty rows, written as parquet tables so
    * the production readers/queries run unmodified. */
  private lazy val fixtureDir: String = {
    val dir = Files.createTempDirectory("graft-fixture").toString
    val part = spark.createDataFrame(
      List(
        Row(1L, "widget", "B1", "T1", 5, 10.0),
        Row(2L, "gadget", "B1", "T2", 7, 20.0),
        Row(3L, "unsold thing", "B2", "T1", 9, 30.0), // no sales → total_sales must be 0
        Row(4L, "free thing", "B2", "T2", 3, 0.0)     // price 0 → dropped by silver
      ).asJava, Tables.partSchema)
    val supplier = spark.createDataFrame(
      List(
        Row(10L, "  Padded Name  ", 1, 100.0),
        Row(11L, null, 2, 50.0),          // null name → concat must yield NULL rep
        Row(12L, "Broke Supplier", 3, -5.0) // non-positive balance → dropped by silver
      ).asJava, Tables.supplierSchema)
    val lineitem = spark.createDataFrame(
      List(
        Row(100L, 1L, 10L, 1, 2.0, 40.0, 0.0, 0.0, "N", "O", ts("1995-03-15")),
        Row(100L, 2L, 11L, 2, 1.0, 20.0, 0.0, 0.0, "N", "O", ts("1995-03-15")),
        Row(101L, 1L, 10L, 1, 3.0, 60.0, 0.0, 0.0, "A", "F", ts("1996-07-01")),
        Row(102L, 2L, 10L, 1, 0.0, 99.0, 0.0, 0.0, "R", "F", ts("1996-07-01")), // qty 0 → dropped
        Row(103L, 1L, 10L, 1, 5.0, 0.0, 0.0, 0.0, "R", "F", ts("1996-07-01"))   // amount 0 → dropped
      ).asJava, Tables.lineitemSchema)
    part.write.parquet(s"$dir/part.parquet")
    supplier.write.parquet(s"$dir/supplier.parquet")
    lineitem.write.parquet(s"$dir/lineitem.parquet")
    dir
  }

  private def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 00:00:00")

  test("silver sales drops non-positive quantity and amount rows (F3)") {
    val rows = Medallion.silverSales(spark, fixtureDir).collect()
    assert(rows.length == 3)
    assert(rows.forall(r => r.getDouble(4) > 0 && r.getDouble(5) > 0))
  }

  test("silver suppliers trims, lowercases, and drops non-positive balances (P1,F1,C1,C2)") {
    val rows = Medallion.silverSuppliers(spark, fixtureDir).collect()
    val byKey = rows.map(r => r.getLong(0) -> r).toMap
    assert(byKey.contains(10L) && byKey(10L).getString(1) == "Padded Name")
    assert(byKey(10L).getString(2) == "padded name")
    assert(!byKey.contains(12L), "non-positive balance must be filtered")
  }

  test("zero-sale products get total_sales=0 and NULL avg, not 1 (A5/J2)") {
    val m = Medallion.goldProductMetrics(spark, fixtureDir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(3L).getLong(3) == 0, "COUNT(col) over unmatched left join must be 0")
    assert(m(3L).isNullAt(5), "revenue of unsold product must be NULL")
    assert(m(3L).isNullAt(6), "avg of unsold product must be NULL")
    assert(m(1L).getLong(3) == 2)
  }

  test("sales_rep concat NULL-propagates like BigQuery || (C3)") {
    val rows = Medallion.goldSalesAnalytics(spark, fixtureDir).collect()
    val repByLine = rows.map(r => (r.getLong(0), r.getInt(1)) -> r.getAs[String]("sales_rep")).toMap
    assert(repByLine((100L, 2)) == null,
      "supplier with NULL name is cleaned away in silver → left-join miss → NULL rep")
    assert(repByLine((100L, 1)) == "Padded Name 1",
      "gold joins silver dims, so the rep name arrives trimmed")
  }

  test("avgCents2 rounds half-up exactly (SURVEY §7.6(1))") {
    // 3 sales totalling 100.01 → avg 33.336666… → 33.34? no: 33.34 only if
    // HALF_UP at cent 33.335; exact: 10001/3 = 3333.67 cents (floor(3333.66..)+…)
    import org.apache.spark.sql.functions._
    val df = spark.range(1).select(
      lit(10001L).as("_sum_cents"), lit(3L).as("n"))
    val v = df.select(Q.avgCents2("_sum_cents", "n").as("avg")).head.getDouble(0)
    assert(math.abs(v - 33.34) < 1e-9, s"got $v")
    val half = spark.range(1).select(lit(5L).as("_sum_cents"), lit(2L).as("n"))
      .select(Q.avgCents2("_sum_cents", "n").as("avg")).head.getDouble(0)
    assert(math.abs(half - 0.03) < 1e-9, s"2.5 cents must round up to 0.03, got $half")
  }
}
