package graft.quality

import java.io.{File, FileInputStream}
import java.util.{List => JList, Map => JMap}
import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Declarative quality-check files — the engine's SodaCL equivalent
  * (the `quality/soda_checks` YAML files in the reference, executed by
  * `quality/runner.py`): a YAML file declares metric predicates per
  * table; the loader compiles them to [[Quality.Check]]s evaluated in one
  * aggregate pass.
  *
  * Grammar (one `check:` string per entry):
  * {{{
  *   table: testdata.events
  *   checks:
  *     - check: row_count > 0
  *     - check: missing_count(event_id) = 0
  *     - check: duplicate_count(event_type) = 0
  *       severity: warn          # default fail
  *     - check: freshness(ts) < 7d    # durations: Nd / Nh / Nm / Ns / Nms
  * }}}
  */
object CheckLoader {

  final case class CheckFile(table: String, checks: Seq[Quality.Check])

  private val CheckRe =
    """(row_count|missing_count|duplicate_count|freshness)\s*(?:\(\s*([\w.]+)\s*\))?\s*(<=|>=|=|<|>)\s*(\w+)""".r

  private val DurationRe = """(\d+)(ms|s|m|h|d)""".r

  def parseDurationMs(s: String): Long = s match {
    case DurationRe(n, unit) =>
      n.toLong * (unit match {
        case "ms" => 1L
        case "s"  => 1000L
        case "m"  => 60000L
        case "h"  => 3600000L
        case "d"  => 86400000L
      })
    case other => other.toLong // bare number = ms
  }

  /** Compile one check line. `asOfEpochMs` anchors freshness windows
    * (explicit, never now() — SURVEY.md §7.4).
    */
  def parseCheck(line: String, severity: Quality.Severity, asOfEpochMs: Long): Quality.Check =
    line.trim match {
      case CheckRe(metric, colName, op, value) =>
        def cmp(v: Long, bound: Long): Boolean = op match {
          case "<"  => v < bound
          case "<=" => v <= bound
          case ">"  => v > bound
          case ">=" => v >= bound
          case "="  => v == bound
        }
        metric match {
          case "row_count" =>
            Quality.rowCount().copy(pass = v => cmp(v, value.toLong), severity = severity)
          case "missing_count" =>
            require(colName != null, s"missing_count needs a column: $line")
            Quality.missingCount(colName).copy(pass = v => cmp(v, value.toLong), severity = severity)
          case "duplicate_count" =>
            require(colName != null, s"duplicate_count needs a column: $line")
            Quality.duplicateCount(colName).copy(pass = v => cmp(v, value.toLong), severity = severity)
          case "freshness" =>
            require(colName != null, s"freshness needs a column: $line")
            val bound = parseDurationMs(value)
            Quality.freshness(colName, asOfEpochMs, bound)
              .copy(pass = v => v >= 0 && cmp(v, bound), severity = severity)
        }
      case other =>
        throw new IllegalArgumentException(
          s"Unparseable check '$other'. Expected: metric[(column)] op value " +
            "with metric in {row_count, missing_count, duplicate_count, freshness}.")
    }

  private def readRoot(path: String): scala.collection.mutable.Map[String, Any] = {
    val in = new FileInputStream(new File(path))
    val raw = try new Yaml().load[Any](in) finally in.close()
    if (raw == null) throw new IllegalArgumentException(s"Empty check file: $path")
    raw.asInstanceOf[JMap[String, Any]].asScala
  }

  private def parseSuite(
      m: scala.collection.Map[String, Any], path: String, asOfEpochMs: Long): CheckFile = {
    val table = m.getOrElse("table",
      throw new IllegalArgumentException(s"Check file $path missing 'table'")).toString
    val entries = m.getOrElse("checks",
      throw new IllegalArgumentException(s"Check file $path missing 'checks'"))
      .asInstanceOf[JList[Any]].asScala.toSeq
    val checks = entries.map { e =>
      val em = e.asInstanceOf[JMap[String, Any]].asScala
      val sev = em.get("severity").map(_.toString) match {
        case Some("warn") => Quality.Warn
        case Some("fail") | None => Quality.Fail
        case Some(other) => throw new IllegalArgumentException(
          s"Unknown severity '$other' in $path (expected 'warn' or 'fail') - " +
            "refusing to guess: a typo'd warn silently becoming a hard gate inverts intent")
      }
      parseCheck(em("check").toString, sev, asOfEpochMs)
    }
    CheckFile(table, checks)
  }

  def load(path: String, asOfEpochMs: Long): CheckFile = {
    val m = readRoot(path)
    require(!m.contains("suites"),
      s"$path declares multiple suites; use loadSuites")
    parseSuite(m, path, asOfEpochMs)
  }

  /** Multi-suite form: one file declaring checks over SEVERAL tables —
    * the shape of the reference's compliance suite, which spans the
    * event stream and the SCD dimension in a single document. Accepts
    * the single-table form too. `asOfFor` supplies the freshness anchor
    * per table (different tables live on different clocks).
    */
  def loadSuites(path: String, asOfFor: String => Long): Seq[CheckFile] = {
    val m = readRoot(path)
    m.get("suites") match {
      case Some(list) =>
        list.asInstanceOf[JList[Any]].asScala.toSeq.map { s =>
          val sm = s.asInstanceOf[JMap[String, Any]].asScala
          val table = sm.getOrElse("table",
            throw new IllegalArgumentException(s"Suite in $path missing 'table'")).toString
          parseSuite(sm, path, asOfFor(table))
        }
      case None =>
        val table = m.getOrElse("table",
          throw new IllegalArgumentException(s"Check file $path missing 'table'")).toString
        Seq(parseSuite(m, path, asOfFor(table)))
    }
  }
}
