package graft.quality

import java.io.File
import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class CheckLoaderSpec extends AnyFunSuite {

  test("loads the shipped events check suite with severities") {
    val cf = CheckLoader.load("/root/repo/quality/events_checks.yaml", 1000L)
    assert(cf.table == "testdata.events")
    assert(cf.checks.size == 7)
    assert(cf.checks.count(_.severity == Quality.Warn) == 1)
    assert(cf.checks.map(_.name).distinct.toSet ==
      Set("row_count", "missing_count", "duplicate_count", "freshness"))
  }

  test("duration literals parse across units") {
    assert(CheckLoader.parseDurationMs("7d") == 7L * 86400000L)
    assert(CheckLoader.parseDurationMs("24h") == 86400000L)
    assert(CheckLoader.parseDurationMs("30m") == 1800000L)
    assert(CheckLoader.parseDurationMs("10s") == 10000L)
    assert(CheckLoader.parseDurationMs("500") == 500L)
  }

  test("comparison operators compile to the right predicates") {
    val c = CheckLoader.parseCheck("row_count >= 5", Quality.Fail, 0L)
    assert(c.pass(5L) && !c.pass(4L))
    val eq = CheckLoader.parseCheck("missing_count(x) = 0", Quality.Fail, 0L)
    assert(eq.pass(0L) && !eq.pass(1L))
    assert(eq.column == "x")
  }

  test("unknown severity values are rejected, not coerced to fail") {
    import java.nio.file.Files
    val f = java.io.File.createTempFile("sev", ".yaml")
    Files.writeString(f.toPath,
      "table: t\nchecks:\n  - check: row_count > 0\n    severity: warning\n")
    val e = intercept[IllegalArgumentException](CheckLoader.load(f.getPath, 0L))
    assert(e.getMessage.contains("warning"))
  }

  test("multi-suite files load per-table suites with per-table asOf anchors") {
    val suites = CheckLoader.loadSuites(
      "/root/repo/quality/compliance_checks.yaml",
      t => if (t == "testdata.events") 1000L else 2000L)
    assert(suites.map(_.table) == Seq("testdata.events", "lakehouse.scd_type2"))
    assert(suites.head.checks.count(_.severity == Quality.Warn) == 1)
    assert(suites(1).checks.map(_.name) == Seq("missing_count", "freshness"))
  }

  test("loadSuites accepts the single-table form; load rejects multi-suite files") {
    val single = CheckLoader.loadSuites("/root/repo/quality/feature_checks.yaml", _ => 0L)
    assert(single.map(_.table) == Seq("lakehouse.feature_table"))
    assert(single.head.checks.size == 6)
    intercept[IllegalArgumentException](
      CheckLoader.load("/root/repo/quality/scd_checks.yaml", 0L))
  }

  test("unparseable checks and missing keys raise actionable errors") {
    intercept[IllegalArgumentException](
      CheckLoader.parseCheck("made_up(x) > 1", Quality.Fail, 0L))
    val f = File.createTempFile("checks", ".yaml")
    Files.writeString(f.toPath, "checks:\n  - check: row_count > 0\n")
    val e = intercept[IllegalArgumentException](CheckLoader.load(f.getPath, 0L))
    assert(e.getMessage.contains("table"))
  }
}
