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

  /** Parse SQL text with the session's own parser (view bodies are
    * stored as TEXT and re-expanded at read time).
    */
  def parsePlan(spark: SparkSession, sql: String): LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sessionState.sqlParser.parsePlan(sql)

  /** Run the analyzer over a plan (view creation validates the
    * expanded body before persisting anything).
    */
  def analyzed(spark: SparkSession, plan: LogicalPlan): LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sessionState.executePlan(plan).analyzed

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
