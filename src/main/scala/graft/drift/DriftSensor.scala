package graft.drift

import graft.sink.{SnapshotTable, TableSink}
import graft.template.TemplateLoader
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Warehouse-wide drift sensor: the scheduling/cursor surface around
  * [[SchemaDrift]], mirroring the reference's hourly Dagster sensor
  * (`dagster/lakehouse/sensors/schema_drift.py:36-110`): iterate every
  * template, skip tables not created yet (`:61-63`), alert + audit per
  * drifted table, then advance a cursor to the evaluation instant
  * (`:107` `context.update_cursor(now)`). The reference's
  * `minimum_interval_seconds=3600` becomes [[due]]: the embedding
  * scheduler (cron, Airflow, a driver loop) persists the returned cursor
  * and calls `due(cursor, nowMs)` before re-evaluating.
  *
  * Clocks are INJECTED (`nowMs`), never read — evaluations are
  * deterministic and replayable. Pure metadata work: schemas only, no
  * executor jobs beyond reading table metadata, so cadence is safe at
  * any table size.
  */
object DriftSensor {

  /** Reference cadence: at most one evaluation per hour. */
  val MinIntervalMs: Long = 3600000L

  final case class SensorRun(
      cursor: String, // ISO-8601 instant of this evaluation
      checked: Seq[String], // tables compared against their template
      skipped: Seq[String], // templates whose table does not exist yet
      drift: Seq[SchemaDrift.DriftReport] // non-empty reports only
  )

  /** Is an evaluation due at `nowMs` given the last persisted cursor?
    * No cursor (first run) is always due.
    */
  def due(cursor: Option[String], nowMs: Long): Boolean =
    cursor.forall(c => nowMs - java.time.Instant.parse(c).toEpochMilli >= MinIntervalMs)

  /** One sensor evaluation over every template in a warehouse. */
  def evaluate(
      templatesDir: String,
      warehouse: String,
      spark: SparkSession,
      nowMs: Long,
      env: Map[String, String] = sys.env): SensorRun = {
    val templates = TemplateLoader.load(templatesDir).values.toSeq.sortBy(_.fullName)
    val results = templates.map { t =>
      val table = SnapshotTable(warehouse, t.namespace, t.name)
      if (!table.exists) Left(t.fullName)
      else {
        // derived partition columns (ts_day etc.) are table LAYOUT, not
        // schema: a sensor that flags them as drift would alert on every
        // partitioned table it ever checks
        val derived = t.partitionSpec.map(TableSink.transformColumn(_)._1).toSet --
          t.columns.map(_.name).toSet
        val live = StructType(
          table.read(spark).schema.fields.filterNot(f => derived.contains(f.name)))
        Right(SchemaDrift.checkAndAlert(t, live, env))
      }
    }
    SensorRun(
      cursor = java.time.Instant.ofEpochMilli(nowMs).toString,
      checked = results.collect { case Right(r) => r.table },
      skipped = results.collect { case Left(name) => name },
      drift = results.collect { case Right(r) if r.hasDrift => r })
  }
}
