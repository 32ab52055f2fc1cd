package graft.patterns

import graft.quality.Quality
import graft.sink.{SnapshotTable, TableSink}
import graft.template.TableTemplate
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only event ingestion (`event_stream` pattern,
  * `table-templates/event_stream.yaml:4,58-60`): new rows only, never
  * update, with the duplicate guard the reference declares as a quality
  * invariant (`duplicate_count(event_id) = 0`,
  * `quality/soda_checks/event_stream_checks.yaml:10-11`).
  *
  * Scale notes: the within-batch guard is one aggregation over the batch;
  * the against-table guard is a left_anti join against only the existing
  * table's id column (column-pruned scan). Both are optional knobs — at
  * very high volume the reference pattern relies on the invariant check
  * rather than a per-append dedup, and so do we by default.
  */
object EventAppend {

  /** Append a batch, rejecting in-batch duplicate ids and (optionally)
    * ids already present in the table.
    */
  def append(
      spark: SparkSession,
      batch: DataFrame,
      template: TableTemplate,
      table: SnapshotTable,
      idCol: String,
      dedupeAgainstTable: Boolean = false): Unit = {

    Quality.gate(batch, template.fullName, Seq(Quality.duplicateCount(idCol)))
    val toWrite =
      if (dedupeAgainstTable && table.exists && table.currentSnapshot.nonEmpty)
        batch.join(table.read(spark).select(col(idCol)), Seq(idCol), "left_anti")
      else batch
    TableSink.append(toWrite, template, table): Unit
  }
}
