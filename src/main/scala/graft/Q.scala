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

  /** Finalize an aggregated decimal for OUTPUT: quantize to DECIMAL(18,2)
    * (Spark widens sum(dec(18,2)) to dec(28,2); DuckDB to dec(38,2)), then
    * emit DOUBLE. The decimal math stays exact and shuffle-order-independent;
    * the final DOUBLE is exact too (these magnitudes are ≤ 2³⁵ cents ≪ 2⁵³)
    * and renders identically everywhere — fixed-scale decimals do not
    * (`123.40` vs `123.4`), which is a hash-gate trap. Oracle side mirrors
    * with `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
    */
  def dec2(c: Column): Column = c.cast(Dec18).cast(DoubleType)

  /** Exact integer cents of a DOUBLE measure — bit-identical to
    * `dec(c) * 100` as BIGINT (DoubleCentsSpec pins it), at primitive
    * codegen cost ([[graft.functions.DoubleCents]]). ONLY for decimal
    * aggregates that feed comparisons, never output columns (outputs keep
    * the [[dec2]] contract). */
  def cents(c: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      functions.DoubleCents(org.apache.spark.sql.GraftSql.expression(c)))

  def dbl(c: Column): Column = c.cast(DoubleType)

  import org.apache.spark.sql.functions.{col, expr, lit, when}

  /** Exact ROUND-HALF-AWAY-FROM-ZERO average to 2 decimals, in integer
    * cents: `sign(s) * floor((2*|s| + cnt) / (2*cnt)) / 100`.
    * `round(sum_double/cnt, 2)` differs between Spark and DuckDB on
    * half-cent boundaries (observed at sf0.01); integer division is
    * bit-identical everywhere. The abs/sign split matters because Spark's
    * `div` truncates toward zero while DuckDB's `//` floors — they agree
    * only on non-negative operands, so the division always runs on |s|
    * (measures like acctbal can go negative). Takes the *names* of an exact
    * cents sum column (LongType) and a count column; emits DOUBLE (NULL
    * when cnt = 0).
    */
  def avgCents2(sumCentsCol: String, cntCol: String): Column =
    when(col(cntCol) === 0, lit(null).cast(DoubleType))
      .otherwise(
        (expr(s"sign($sumCentsCol)") *
          expr(s"(2 * abs($sumCentsCol) + $cntCol) div (2 * $cntCol)"))
          .cast(DoubleType) / 100)

  /** DuckDB rendering of [[avgCents2]] over a DECIMAL(18,2)-summed measure. */
  def avgCents2Sql(sumDecSql: String, cntSql: String): String =
    s"CASE WHEN $cntSql = 0 THEN NULL ELSE " +
      s"CAST(SIGN(CAST($sumDecSql * 100 AS BIGINT)) * " +
      s"((2 * ABS(CAST($sumDecSql * 100 AS BIGINT)) + $cntSql) // (2 * $cntSql)) " +
      s"AS DOUBLE) / 100 END"
}
