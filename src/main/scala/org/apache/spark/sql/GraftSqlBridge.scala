package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column <-> Expression converters that
  * Spark 4 hides behind the ColumnNode API. Needed to expose custom
  * Catalyst expressions (graft.functions.*) through the public Column
  * surface without a SparkSessionExtensions round-trip.
  */
object GraftSqlBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
