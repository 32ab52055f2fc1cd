package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the classic-sql internals the DML lowering needs:
  * wrapping a resolved [[LogicalPlan]] as a DataFrame (the MERGE
  * source) and a Catalyst [[Expression]] as a [[Column]] (conditions /
  * assignment values lifted out of UpdateTable / MergeIntoTable).
  * Spark's own connectors sit inside this package for the same
  * constructors; both calls delegate to public members of the
  * `classic` implementation.
  */
object GraftSqlShim {

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
