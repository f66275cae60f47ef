package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector arithmetic over ArrayType(Double) columns, built from Spark's
  * codegen'd higher-order functions (`zip_with` + `aggregate`) — no UDFs.
  * The fold is sequential left-to-right over the dimensions, matching
  * DuckDB's `list_dot_product`, so double results are bit-identical between
  * the engines.
  */
object VectorFns {

  /** Cast an ArrayType(Float) column to ArrayType(Double). A native array
    * Cast, NOT `transform(v, _.cast)`: higher-order functions are
    * CodegenFallback and would break whole-stage codegen for every
    * expression in the same projection. */
  def toDouble(v: Column): Column =
    v.cast(org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType))

  /** Sequential dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity via composed higher-order functions:
    * dot / (||a|| * ||b||). Kept as the reference implementation for the
    * codegen'd [[cosineFast]]. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Cosine similarity as a native codegen'd Catalyst expression
    * ([[graft.functions.CosineSimilarity]]) — one fused loop, no
    * intermediate array, same bit-exact result as [[cosine]]. */
  def cosineFast(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      CosineSimilarity(
        org.apache.spark.sql.GraftSql.expression(a),
        org.apache.spark.sql.GraftSql.expression(b)))

  /** Dot product as a native codegen'd Catalyst expression
    * ([[graft.functions.DotProduct]]) — one fused loop, bit-identical to
    * [[dot]] (same sequential fold), codegen where the HOF form falls back
    * to interpretation. */
  def dotFast(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      DotProduct(
        org.apache.spark.sql.GraftSql.expression(a),
        org.apache.spark.sql.GraftSql.expression(b)))

  /** Count of positions where two BIGINT arrays agree
    * ([[graft.functions.ArrayEqCount]]) — the MinHash signature-agreement
    * estimator as one fused native loop (integer-exact). */
  def arrayEqCount(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSql.column(
      ArrayEqCount(
        org.apache.spark.sql.GraftSql.expression(a),
        org.apache.spark.sql.GraftSql.expression(b)))

  /** DuckDB rendering of [[cosine]] over DOUBLE[] columns. */
  def cosineSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
}
