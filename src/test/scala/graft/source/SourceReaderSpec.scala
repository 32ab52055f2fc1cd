package graft.source

import graft.SparkSpec
import graft.template.TemplateLoader
import org.apache.spark.sql.types._

class SourceReaderSpec extends SparkSpec {

  test("path guard: cloud schemes pass, local/relative rejected (reference parity)") {
    assert(SourceReader.pathAllowed("s3://bucket/k"))
    assert(SourceReader.pathAllowed("s3a://bucket/k"))
    assert(SourceReader.pathAllowed("gs://bucket/k"))
    assert(SourceReader.pathAllowed("local:///tmp/x")) // test-only scheme
    for (bad <- Seq("/tmp/x", "file:///tmp/x", "relative/path", "http://x"))
      assert(!SourceReader.pathAllowed(bad), bad)
    val e = intercept[IllegalArgumentException](SourceReader.validatePath("/tmp/x"))
    assert(e.getMessage.contains("s3://"))
  }

  test("csv ingest honors delimiter, declared column names, skip_rows") {
    val t = TemplateLoader.get("/root/repo/templates", "events_ingest")
    val df = SourceReader.read(spark, t)
    assert(df.columns.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(df.schema("event_id").dataType == LongType)
    assert(df.schema("ts").dataType == TimestampType)
    assert(df.count() > 0)
  }

  test("skip_rows > 1 drops the whole preamble before parsing") {
    import java.nio.file.Files
    val f = Files.createTempFile("pre", ".csv")
    Files.writeString(f, "# exported 2024\n# by tool v2\n1|a\n2|b\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val df = SourceReader.read(spark,
      graft.template.SourceDef(s"local://$f", "csv",
        Map("delimiter" -> "|", "skip_rows" -> "2")), schema)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "a"), (2L, "b")))
  }

  test("json ingest casts to the declared schema") {
    val t = TemplateLoader.get("/root/repo/templates", "events")
    val raw = spark.read.json("/root/repo/fixtures/events_sample.jsonl")
    val df = SourceReader.conform(raw, t.schema)
    assert(df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      t.schema.fields.map(f => (f.name, f.dataType)).toSeq)
  }

  test("conform reorders and casts columns to the declared shape") {
    import spark.implicits._
    val messy = Seq(("7", "x", "2024-01-01 00:00:00"))
      .toDF("value", "event_type", "ts") // wrong order, strings
    val schema = StructType(Seq(
      StructField("ts", TimestampType), StructField("value", DoubleType),
      StructField("event_type", StringType)))
    val out = SourceReader.conform(messy, schema)
    assert(out.columns.toSeq == Seq("ts", "value", "event_type"))
    assert(out.schema("value").dataType == DoubleType)
    assert(out.head().getAs[Double]("value") == 7.0)
  }
}
