package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface: wraps a raw Catalyst [[Expression]]
  * as a user-facing [[Column]] (Spark 4 routes this through
  * `classic.ExpressionUtils`). The one blessed pattern for exposing custom
  * codegen expressions from a library without forking Spark.
  */
object GraftSql {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
