package graft.drift

import graft.governance.Alerting
import graft.template.TemplateLoader
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class SchemaDriftSpec extends AnyFunSuite {

  lazy val t = TemplateLoader.get("/root/repo/templates", "events")

  test("identical schema -> no drift") {
    assert(!SchemaDrift.check(t, t.schema).hasDrift)
  }

  test("missing, extra, and type-mismatched columns are each reported") {
    val live = StructType(
      t.schema.fields.filterNot(_.name == "props").map {
        case f if f.name == "value" => StructField("value", StringType)
        case f => f
      } :+ StructField("rogue", IntegerType))
    val report = SchemaDrift.check(t, live)
    val byCol = report.issues.map(i => i.column -> i.issue).toMap
    assert(byCol("props") == "missing")
    assert(byCol("rogue") == "extra")
    assert(byCol("value") == "type_mismatch")
    assert(report.summary.contains("missing:props"))
  }

  test("engine type aliases do not count as drift (normalization)") {
    // TimestampType spells 'timestamptz'; a live LongType for a declared
    // long is fine, and NTZ vs TZ *is* drift
    val live = StructType(t.schema.fields.map {
      case f if f.name == "ts" => StructField("ts", TimestampNTZType)
      case f => f
    })
    val report = SchemaDrift.check(t, live)
    assert(report.issues.map(_.column) == Seq("ts"))
  }

  test("drift fires audit + alert through the sensor path") {
    Alerting.clear()
    val live = StructType(t.schema.fields.filterNot(_.name == "props"))
    val env = Map("ALERT_SLACK_WEBHOOK_URL" -> "https://h/x")
    val report = SchemaDrift.checkAndAlert(t, live, env)
    assert(report.hasDrift)
    assert(Alerting.deliveredAlerts.exists(_.subject.contains("Schema drift")))
    Alerting.clear()
  }
}
