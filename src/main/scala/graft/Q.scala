package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** One declared query: name + Spark implementation + optional DuckDB oracle
  * SQL (same result, same column names, same deterministic ORDER BY —
  * SURVEY.md §7.3). `oracle = None` marks a non-SQL-expressible operator; the
  * driver then records a weaker rows-only check.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  /** Money/measure columns are aggregated in DECIMAL(18,2), never DOUBLE:
    * decimal addition is exact and associative, so shuffle/partial-agg order
    * (which differs between Spark and DuckDB and between runs) cannot change
    * the result — SURVEY.md §7.3(b)/§7.6(1).
    */
  val Dec18: DecimalType = DecimalType(18, 2)

  def dec(c: Column): Column = c.cast(Dec18)

  /** Re-narrow an aggregated decimal (Spark widens sum(dec(18,2)) to
    * dec(28,2); DuckDB to dec(38,2)) back to a common DECIMAL(18,2).
    */
  def dec2(c: Column): Column = c.cast(Dec18)

  def dbl(c: Column): Column = c.cast(DoubleType)

  import org.apache.spark.sql.functions.{col, expr, lit, when}

  /** Exact ROUND-HALF-UP average to 2 decimals, in integer cents:
    * `floor((2*sum_cents + cnt) / (2*cnt)) / 100` for non-negative sums.
    * `round(sum_double/cnt, 2)` differs between Spark and DuckDB on half-cent
    * boundaries (observed at sf0.01); integer division is bit-identical
    * everywhere. Takes the *names* of an exact cents sum column (LongType)
    * and a count column; emits DOUBLE (NULL when cnt = 0).
    */
  def avgCents2(sumCentsCol: String, cntCol: String): Column =
    when(col(cntCol) === 0, lit(null).cast(DoubleType))
      .otherwise(
        expr(s"(2 * $sumCentsCol + $cntCol) div (2 * $cntCol)")
          .cast(DoubleType) / 100)

  /** DuckDB rendering of [[avgCents2]] over a DECIMAL(18,2)-summed measure. */
  def avgCents2Sql(sumDecSql: String, cntSql: String): String =
    s"CASE WHEN $cntSql = 0 THEN NULL ELSE " +
      s"CAST((2 * CAST($sumDecSql * 100 AS BIGINT) + $cntSql) // (2 * $cntSql) AS DOUBLE) / 100 END"
}
