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

  /** Release the materialized blocks behind a `localCheckpoint()`ed
    * Dataset. `Dataset.unpersist` cannot do this (it goes through the
    * CacheManager, which never saw the checkpoint — the checkpoint
    * persists its RDD directly), so an iterative trainer that
    * re-materializes its working frame every round would otherwise leak
    * one frame-sized block set PER ROUND. Safe once a successor
    * checkpoint is materialized: local checkpointing truncates lineage,
    * so the predecessor's blocks back nothing downstream. No-op for
    * plans that are not a checkpoint/RDD leaf.
    */
  def unpersistLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed match {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(blocking = false): Unit
      case _ => ()
    }
}
