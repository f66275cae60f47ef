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

  /** Cast an ArrayType(Float) column to ArrayType(Double). */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Sequential dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity: dot / (||a|| * ||b||). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** DuckDB rendering of [[cosine]] over DOUBLE[] columns. */
  def cosineSql(a: String, b: String): String =
    s"list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b)))"
}
