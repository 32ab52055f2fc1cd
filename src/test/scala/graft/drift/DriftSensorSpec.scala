package graft.drift

import java.nio.file.Files

import graft.SparkSpec
import graft.sink.{SnapshotTable, TableSink}
import graft.template.TemplateLoader

class DriftSensorSpec extends SparkSpec {

  val TemplatesDir = "/root/repo/templates"
  val NowMs = 1706745600000L // 2024-02-01T00:00:00Z

  test("due: first run always; then gated by the hourly minimum interval") {
    assert(DriftSensor.due(None, NowMs))
    val cursor = java.time.Instant.ofEpochMilli(NowMs).toString
    assert(!DriftSensor.due(Some(cursor), NowMs + 59 * 60000L))
    assert(DriftSensor.due(Some(cursor), NowMs + DriftSensor.MinIntervalMs))
  }

  test("evaluate: skips absent tables, passes conforming ones, cursor advances") {
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_sensor").toString
    val t = TemplateLoader.get(TemplatesDir, "events")
    val conforming = Seq((1L, new java.sql.Timestamp(NowMs), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    TableSink.overwrite(conforming, t, SnapshotTable(wh, t.namespace, t.name))
    val run = DriftSensor.evaluate(TemplatesDir, wh, spark, NowMs, Map.empty)
    assert(run.cursor == "2024-02-01T00:00:00Z")
    assert(run.checked == Seq("testdata.events"))
    assert(run.skipped.size == TemplateLoader.load(TemplatesDir).size - 1)
    // derived partition column ts_day is layout, not drift
    assert(run.drift.isEmpty)
  }

  test("evaluate: drifted live schema is reported per issue") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val wh = Files.createTempDirectory("graft_sensor2").toString
    val t = TemplateLoader.get(TemplatesDir, "events")
    val drifted = Seq((1L, new java.sql.Timestamp(NowMs), 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .drop("props").withColumn("value", col("value").cast("string"))
    SnapshotTable(wh, t.namespace, t.name).overwrite(drifted)
    val run = DriftSensor.evaluate(TemplatesDir, wh, spark, NowMs, Map.empty)
    assert(run.drift.map(_.table) == Seq("testdata.events"))
    assert(run.drift.head.issues.map(i => s"${i.issue}:${i.column}") ==
      Seq("missing:props", "type_mismatch:value"))
  }
}
