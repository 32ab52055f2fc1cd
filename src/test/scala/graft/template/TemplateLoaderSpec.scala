package graft.template

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class TemplateLoaderSpec extends AnyFunSuite {

  val dir = "/root/repo/templates"

  test("loads every shipped template") {
    val all = TemplateLoader.load(dir)
    assert(all.keySet == Set(
      "event_stream", "events", "events_ingest", "feature_table", "scd_type2"))
  }

  test("declared schema preserves column order and governance metadata") {
    val t = TemplateLoader.get(dir, "events")
    assert(t.schema.fieldNames.toSeq ==
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
    assert(t.restrictedColumns == Seq("user_id"))
    assert(t.requiredColumns == Seq("event_id", "ts", "user_id", "event_type"))
    assert(!t.schema("event_id").nullable)
    assert(t.schema("value").nullable)
    assert(t.schema("user_id").metadata.getBoolean("pii"))
  }

  test("source block parsed with options") {
    val t = TemplateLoader.get(dir, "events_ingest")
    val src = t.source.get
    assert(src.format == "csv")
    assert(src.options("delimiter") == "|")
    assert(src.options("skip_rows") == "1")
  }

  test("unknown template raises with available list (reference parity)") {
    val e = intercept[NoSuchElementException](TemplateLoader.get(dir, "nope"))
    assert(e.getMessage.contains("nope"))
    assert(e.getMessage.contains("event_stream"))
  }

  test("empty YAML file raises (reference parity)") {
    val f = File.createTempFile("empty", ".yaml")
    Files.writeString(f.toPath, "")
    val e = intercept[IllegalArgumentException](TemplateLoader.parseFile(f))
    assert(e.getMessage.toLowerCase.contains("empty yaml"))
  }

  test("missing required keys raise, naming the keys (reference parity)") {
    val f = File.createTempFile("partial", ".yaml")
    Files.writeString(f.toPath, "name: t1\ncolumns:\n  - name: a\n    type: int\n")
    val e = intercept[IllegalArgumentException](TemplateLoader.parseFile(f))
    assert(e.getMessage.contains("partition_spec"))
  }

  test("retention and write format plumb through from properties") {
    assert(TemplateLoader.get(dir, "events").retentionMs.contains(604800000L))
    assert(TemplateLoader.get(dir, "events_ingest").retentionMs.isEmpty)
    assert(TemplateLoader.get(dir, "events").writeFormat == "parquet")
  }
}
