package org.apache.spark.sql

/** Bridge for V1 streaming sources outside Spark's own tree: a
  * [[org.apache.spark.sql.execution.streaming.Source.getBatch]] result
  * must carry `isStreaming = true`, and the only constructor for that is
  * `SparkSession.internalCreateDataFrame(..., isStreaming = true)`,
  * which is `private[sql]`. Spark's own external connectors sit inside
  * this package for exactly this call (e.g. the Kafka source's
  * `KafkaSource.getBatch`); this shim does the same for
  * `graft.streaming.GraftStreamSource`. The wrapped RDD is lazy — the
  * delta plan executes when the microbatch runs, with its own pruning.
  */
object GraftStreamShim {

  def asStreamingFrame(df: DataFrame): DataFrame = {
    val spark = df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
