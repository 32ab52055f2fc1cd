package graft.pipeline

import graft.governance.Audit
import graft.sink.{SnapshotTable, TableSink}
import graft.source.SourceReader
import graft.template.{TableTemplate, TemplateLoader}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Template-driven job auto-generation — for each template with a
  * `source:` block, an ingest job: read path -> conform schema -> write
  * table -> audit `source_ingest`, with retries; the Spark equivalent of
  * the reference's source-asset factory
  * (`dagster/lakehouse/assets/source_assets.py:83-126`; retry policy
  * 2 retries / 30 s delay at :94).
  */
object Pipeline {

  final case class IngestJob(template: TableTemplate) {
    def run(spark: SparkSession, warehouse: String,
        retries: Int = 2, retryDelayMs: Long = 30000): SnapshotTable = {
      val table = SnapshotTable(warehouse, template.namespace, template.name)
      var attempt = 0
      var done = false
      var lastErr: Throwable = null
      while (!done && attempt <= retries) {
        try {
          val df = SourceReader.read(spark, template)
          TableSink.overwrite(df, template, table)
          Audit.log("source_ingest", template.fullName,
            Map("path" -> template.source.get.path, "format" -> template.source.get.format))
          done = true
        } catch {
          case e: Throwable =>
            lastErr = e
            attempt += 1
            if (attempt <= retries && retryDelayMs > 0) Thread.sleep(retryDelayMs)
        }
      }
      if (!done) throw new RuntimeException(
        s"Ingest failed for ${template.fullName} after ${retries + 1} attempts", lastErr)
      table
    }
  }

  /** `source_asset_autogen`: one job per sourced template. */
  def fromTemplates(templateDir: String): Seq[IngestJob] =
    TemplateLoader.load(templateDir).values.toSeq
      .filter(_.source.isDefined)
      .sortBy(_.name)
      .map(IngestJob.apply)

  /** Read path with governance (table_read audit + PII mask). */
  def readTable(spark: SparkSession, warehouse: String, template: TableTemplate): DataFrame =
    TableSink.read(spark, SnapshotTable(warehouse, template.namespace, template.name), template)

  final case class MaintenanceResult(table: String, retentionMs: Option[Long], expired: Seq[Long])

  /** Warehouse maintenance: expire snapshot history older than each
    * template's `history_expire_max_snapshot_age_ms`, relative to an
    * explicit `nowMs` (deterministic, schedulable — the engine's
    * equivalent of Iceberg's ExpireSnapshots action driven by the
    * reference's per-table retention property, `_schema.json:105-107`).
    * Tables without a retention or without a registered footprint are
    * reported untouched. Metadata-only on the driver except for the
    * data-directory deletes of expired snapshots.
    */
  def maintain(templateDir: String, warehouse: String, nowMs: Long): Seq[MaintenanceResult] =
    TemplateLoader.load(templateDir).values.toSeq.sortBy(_.fullName).map { t =>
      val table = SnapshotTable(warehouse, t.namespace, t.name)
      // TABLE-level properties (TBLPROPERTIES DDL) override the
      // template's declared policy — the Iceberg precedence: table
      // properties are the operative config, the template is the
      // provisioning default. Same keys as the template vocabulary.
      val props = if (table.exists) table.properties else Map.empty[String, String]
      val retention = props.get("history_expire_max_snapshot_age_ms").map(_.toLong)
        .orElse(t.retentionMs)
      val retainLast = props.get("history_expire_retain_last").map(_.toInt).getOrElse(1)
      val expired = retention match {
        case Some(r) if table.exists => table.expireSnapshots(nowMs - r, retainLast)
        case _ => Nil
      }
      MaintenanceResult(t.fullName, retention, expired)
    }
}
