package graft.sources

import graft.functions.ZValue
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** Physical-layout writers: how a 100 TB fact table should land on disk so
  * later scans skip most of it.
  *
  *   - [[zorderWrite]]: cluster by the Morton interleave of two key columns
  *     — range-partition and sort by z, so every output file covers a small
  *     rectangle in key space and parquet min/max footer stats prune scans
  *     filtered on EITHER key. A plain sort clusters only its leading
  *     column.
  *   - The single-column analog is just `repartitionByRange(col).
  *     sortWithinPartitions(col)` — z-order is the multi-column
  *     generalization; beyond two columns, chain interleaves or widen the
  *     expression.
  *
  * This composes with [[Stage]]: layout decides file contents, Stage
  * decides where the files go.
  */
object Layout {

  /** The z-value column for two non-negative long key columns. */
  def zvalue(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(ZValue(
      org.apache.spark.sql.GraftSql.expression(a.cast("long")),
      org.apache.spark.sql.GraftSql.expression(b.cast("long"))))

  /** Write `df` z-ordered by (a, b) into `nFiles` parquet files at `path`.
    * Range partitioning by z balances file sizes; the within-partition sort
    * gives each file a contiguous z-range (a small key-space rectangle).
    *
    * Keys are min/max-NORMALIZED to a common 20-bit scale before the
    * interleave — without this, the wider-ranged column's high bits sit
    * above all of the narrower column's bits and the "z" order degenerates
    * to a plain sort on the wide column (the narrow column's per-file span
    * stays at full width). The min/max fetch is a 4-scalar layout-time
    * statistic, the same class of pre-pass as range partitioning's
    * sampling. */
  def zorderWrite(df: DataFrame, a: String, b: String, path: String, nFiles: Int): Unit = {
    import org.apache.spark.sql.functions.{lit, max, min}
    val r = df.agg(
      min(col(a)).cast("long"), max(col(a)).cast("long"),
      min(col(b)).cast("long"), max(col(b)).cast("long")).collect()(0)
    val (aLo, aHi, bLo, bHi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    def norm(c: Column, lo: Long, hi: Long): Column =
      if (hi <= lo) lit(0L)
      else (c.cast("long") - lit(lo)) * lit((1L << 20) - 1) / lit(hi - lo)
    df.withColumn("_z", zvalue(norm(col(a), aLo, aHi), norm(col(b), bLo, bHi)))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }

  /** Plain linear-sort layout (the comparison baseline): clusters `a`,
    * leaves `b` unclustered. */
  def linearWrite(df: DataFrame, a: String, path: String, nFiles: Int): Unit =
    df.repartitionByRange(nFiles, col(a))
      .sortWithinPartitions(col(a))
      .write.mode("overwrite").parquet(path)
}
