package graft.drift

import graft.governance.{Alerting, Audit}
import graft.template.TableTemplate
import graft.types.IcebergTypes
import org.apache.spark.sql.types.StructType

/** Schema-drift detection: template columns vs live table schema —
  * missing / extra / type-mismatched columns, with alert + audit on drift,
  * the Spark equivalent of the reference's hourly drift sensor
  * (`dagster/lakehouse/sensors/schema_drift.py:36-110`; set algebra at
  * 71-82, type normalization at 13-33, alert at 104).
  *
  * Pure metadata work: runs entirely on the driver against catalog
  * schemas, no executor involvement — safe to schedule at any cadence
  * regardless of table size.
  */
object SchemaDrift {

  final case class ColumnIssue(column: String, issue: String, expected: String, actual: String)

  final case class DriftReport(table: String, issues: Seq[ColumnIssue]) {
    def hasDrift: Boolean = issues.nonEmpty
    def summary: String =
      if (!hasDrift) s"$table: no drift"
      else s"$table: " + issues.map(i => s"${i.issue}:${i.column}").mkString(", ")
  }

  /** Compare declared template schema to a live schema. */
  def check(template: TableTemplate, live: StructType): DriftReport = {
    val expected = template.columns.map(c => c.name -> IcebergTypes.normalize(c.icebergType)).toMap
    val actual = live.fields.map(f => f.name -> IcebergTypes.normalize(IcebergTypes.fromSpark(f.dataType))).toMap

    val missing = (expected.keySet -- actual.keySet).toSeq.sorted
      .map(c => ColumnIssue(c, "missing", expected(c), ""))
    val extra = (actual.keySet -- expected.keySet).toSeq.sorted
      .map(c => ColumnIssue(c, "extra", "", actual(c)))
    val mismatched = (expected.keySet & actual.keySet).toSeq.sorted
      .filter(c => expected(c) != actual(c))
      .map(c => ColumnIssue(c, "type_mismatch", expected(c), actual(c)))

    DriftReport(template.fullName, missing ++ extra ++ mismatched)
  }

  /** Check and, on drift, audit + alert (sensor behavior). */
  def checkAndAlert(template: TableTemplate, live: StructType,
      env: Map[String, String] = sys.env): DriftReport = {
    val report = check(template, live)
    if (report.hasDrift) {
      Audit.log("schema_drift", template.fullName,
        Map("issues" -> report.issues.map(i => s"${i.issue}:${i.column}").mkString(",")))
      Alerting.alert(s"Schema drift detected: ${template.fullName}", report.summary, env)
    }
    report
  }
}
