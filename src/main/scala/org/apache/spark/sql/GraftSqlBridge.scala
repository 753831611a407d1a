package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` Column<->Expression conversion (Spark 4 made
  * `Column` wrap a ColumnNode; classic-mode conversions live behind
  * `org.apache.spark.sql.classic.ExpressionUtils`). Standard extension-
  * library technique: a tiny shim in the `org.apache.spark.sql` package.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
