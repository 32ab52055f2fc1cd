package graft.streaming

import graft.sink.SnapshotTable
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming SOURCE over a [[SnapshotTable]] — the lakehouse
  * CDC tail (Iceberg's Spark streaming read has the same contract:
  * consume an append lineage incrementally, snapshot ids as offsets):
  * {{{
  *   spark.readStream.format("graft-stream")
  *     .option("warehouse", wh).option("table", "ns.events").load()
  * }}}
  * Offsets are PUBLISHED snapshot ids. Batch 0 is the table's state at
  * the stream's first offset; every subsequent batch is
  * `readIncremental(lastOffset, newOffset)` — the dir-set difference, so
  * per-trigger scan I/O is O(delta) regardless of table size (the same
  * bound the batch changelog consumer gets). Meaningful along an
  * append-only lineage, like Iceberg's streaming read: an intervening
  * overwrite surfaces its full rewritten state as that trigger's delta.
  * Downstream, the engine's existing streaming surface (watermarked
  * windows, dedup, `foreachBatch` governed re-ingest) applies — this
  * source closes the loop: ingest -> table -> incremental consume.
  *
  * Restart semantics: the checkpointed offset must still exist in table
  * history — retention that expires a snapshot the stream has not
  * consumed past invalidates the checkpoint (Iceberg documents the same
  * constraint).
  */
final class GraftStreamSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-stream"

  private def tableOf(parameters: Map[String, String]): SnapshotTable = {
    val wh = parameters.getOrElse("warehouse",
      throw new IllegalArgumentException("graft-stream needs option 'warehouse'"))
    val full = parameters.getOrElse("table",
      throw new IllegalArgumentException("graft-stream needs option 'table' (<ns>.<name>)"))
    val parts = full.split("\\.", 2)
    require(parts.length == 2, s"option 'table' must be <namespace>.<name>, got '$full'")
    SnapshotTable(wh, parts(0), parts(1))
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse(
      tableOf(parameters).read(sqlContext.sparkSession).schema))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val table = tableOf(parameters)
    val resolved = schema.getOrElse(table.read(sqlContext.sparkSession).schema)
    new GraftStreamSource(sqlContext, table, resolved)
  }
}

/** One snapshot id as a streaming offset (JSON = the id). */
final case class GraftSnapshotOffset(snapshotId: Long) extends Offset {
  override def json: String = snapshotId.toString
}

private final class GraftStreamSource(
    sqlContext: SQLContext,
    table: SnapshotTable,
    override val schema: StructType) extends Source {

  private def idOf(o: Offset): Long = o match {
    case GraftSnapshotOffset(id) => id
    case other                   => other.json.trim.toLong // SerializedOffset after restart
  }

  override def getOffset: Option[Offset] =
    table.currentSnapshot.map(s => GraftSnapshotOffset(s.id))

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val spark = sqlContext.sparkSession
    val toId = idOf(end)
    val df = start match {
      // first batch: the table's full state at the starting offset
      case None => table.readSnapshot(spark, toId)
      // steady state: exactly the dirs added in (from, to] — O(delta)
      case Some(s) => table.readIncremental(spark, fromId = idOf(s), toId = toId)
    }
    // pin the source schema across mid-stream evolution: columns added
    // after stream start are not surfaced (restart to pick them up)
    val pinned = df.select(
      schema.fieldNames.toSeq.map(org.apache.spark.sql.functions.col): _*)
    // microbatch contract: the returned frame must be streaming-marked
    org.apache.spark.sql.GraftStreamShim.asStreamingFrame(pinned)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftStreamSource[${table.fullName}]"
}
