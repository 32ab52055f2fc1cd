package graft

import graft.patterns.Scd2
import graft.quality.{CheckLoader, Quality}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The full declarative quality-check corpus — one runner query per
  * reference check file (`quality/soda_checks/{event_stream,scd,feature,
  * compliance}_checks.yaml`; the event-stream file is `quality_checkfile`
  * in MetaQueries). Each suite loads its YAML, evaluates every check in
  * one aggregate pass per table via [[Quality.gate]], and emits the
  * check results as rows; the oracle recomputes every measured value
  * from the same source tables in DuckDB.
  */
object QualityQueries {

  import Queries.tbl

  val QualityDir = "/root/repo/quality"

  /** 2024-03-01T01:00:00Z — one hour after the SCD merge instant /
    * feature computation time, the deterministic "now" for freshness
    * checks over those tables (the events suite keeps its own anchor,
    * [[CoreQueries.FreshnessAsOfMs]]).
    */
  private[graft] val MergeAsOfMs = PatternQueries.MergeAtMs + 3600000L

  /** Evaluate loaded suites against their named tables; one result row
    * per check, tagged with the table. Unknown table names fail loudly —
    * a check silently skipped is a check that never gates.
    */
  private def runSuites(
      s: SparkSession,
      suites: Seq[CheckLoader.CheckFile],
      data: Map[String, DataFrame]): DataFrame = {
    import s.implicits._
    suites.flatMap { cf =>
      val df = data.getOrElse(cf.table, throw new IllegalArgumentException(
        s"Check file names unknown table '${cf.table}'; known: ${data.keys.toSeq.sorted.mkString(", ")}"))
      Quality.gate(df, cf.table, cf.checks)
        .map(r => (cf.table, r.check, r.column, r.value, r.passed, r.severity))
    }.toDF("table", "check", "column", "value", "passed", "severity")
  }

  def defs: Map[String, QueryDef] = Map(

    "quality_checkfile_scd" -> QueryDef(
      (s, dir) => {
        val merged = PatternQueries.mergedScd(s, dir)
        val suites = CheckLoader.loadSuites(
          s"$QualityDir/scd_checks.yaml", _ => MergeAsOfMs)
        runSuites(s, suites, Map(
          "lakehouse.scd_type2" -> merged,
          "lakehouse.scd_type2_current" -> Scd2.currentView(merged)))
      },
      Some(s"""WITH ${PatternQueries.MergedScdSql},
              |cur AS (SELECT * FROM merged WHERE is_current)
              |SELECT 'lakehouse.scd_type2' AS "table", 'row_count' AS "check", '*' AS "column",
              |  CAST(count(*) AS BIGINT) AS value, count(*) > 0 AS passed, 'fail' AS severity FROM merged
              |UNION ALL SELECT 'lakehouse.scd_type2', 'missing_count', 'natural_key',
              |  CAST(count(*) - count(natural_key) AS BIGINT), count(*) - count(natural_key) = 0, 'fail' FROM merged
              |UNION ALL SELECT 'lakehouse.scd_type2', 'missing_count', 'name',
              |  CAST(count(*) - count(name) AS BIGINT), count(*) - count(name) = 0, 'fail' FROM merged
              |UNION ALL SELECT 'lakehouse.scd_type2', 'missing_count', 'effective_from',
              |  CAST(count(*) - count(effective_from) AS BIGINT), count(*) - count(effective_from) = 0, 'fail' FROM merged
              |UNION ALL SELECT 'lakehouse.scd_type2', 'missing_count', 'is_current',
              |  CAST(count(*) - count(is_current) AS BIGINT), count(*) - count(is_current) = 0, 'fail' FROM merged
              |UNION ALL SELECT 'lakehouse.scd_type2_current', 'duplicate_count', 'natural_key',
              |  CAST(count(natural_key) - count(DISTINCT natural_key) AS BIGINT),
              |  count(natural_key) - count(DISTINCT natural_key) = 0, 'fail' FROM cur""".stripMargin),
      doc = "SCD2 declarative suite: full-history NOT NULLs + current-slice key uniqueness"),

    "quality_checkfile_feature" -> QueryDef(
      (s, dir) => {
        val suites = CheckLoader.loadSuites(
          s"$QualityDir/feature_checks.yaml", _ => MergeAsOfMs)
        runSuites(s, suites,
          Map("lakehouse.feature_table" -> PatternQueries.featureTable(s, dir)))
      },
      Some(s"""WITH feat AS (${PatternQueries.FeatureSql})
              |SELECT 'lakehouse.feature_table' AS "table", 'row_count' AS "check", '*' AS "column",
              |  CAST(count(*) AS BIGINT) AS value, count(*) > 0 AS passed, 'fail' AS severity FROM feat
              |UNION ALL SELECT 'lakehouse.feature_table', 'missing_count', 'entity_id',
              |  CAST(count(*) - count(entity_id) AS BIGINT), count(*) - count(entity_id) = 0, 'fail' FROM feat
              |UNION ALL SELECT 'lakehouse.feature_table', 'missing_count', 'feature_timestamp',
              |  CAST(count(*) - count(feature_timestamp) AS BIGINT), count(*) - count(feature_timestamp) = 0, 'fail' FROM feat
              |UNION ALL SELECT 'lakehouse.feature_table', 'missing_count', 'feature_set',
              |  CAST(count(*) - count(feature_set) AS BIGINT), count(*) - count(feature_set) = 0, 'fail' FROM feat
              |UNION ALL SELECT 'lakehouse.feature_table', 'duplicate_count', 'entity_id',
              |  CAST(count(entity_id) - count(DISTINCT entity_id) AS BIGINT),
              |  count(entity_id) - count(DISTINCT entity_id) = 0, 'fail' FROM feat
              |UNION ALL SELECT 'lakehouse.feature_table', 'freshness', 'computed_at',
              |  $MergeAsOfMs - epoch_ms(max(computed_at)),
              |  $MergeAsOfMs - epoch_ms(max(computed_at)) < ${2L * 86400000L}, 'fail' FROM feat""".stripMargin),
      doc = "feature-table declarative suite incl. freshness of computed_at"),

    "quality_checkfile_compliance" -> QueryDef(
      (s, dir) => {
        // cross-table suite: events + SCD dimension in ONE document,
        // with per-table freshness anchors (the tables live on
        // different clocks) and a warn-severity PII-payload check that
        // reports but never gates
        val suites = CheckLoader.loadSuites(
          s"$QualityDir/compliance_checks.yaml",
          table => if (table == "testdata.events") CoreQueries.FreshnessAsOfMs
                   else MergeAsOfMs)
        runSuites(s, suites, Map(
          "testdata.events" -> tbl(s, dir, "events"),
          "lakehouse.scd_type2" -> PatternQueries.mergedScd(s, dir)))
      },
      Some(s"""WITH ${PatternQueries.MergedScdSql}
              |SELECT 'testdata.events' AS "table", 'missing_count' AS "check", 'user_id' AS "column",
              |  CAST(count(*) - count(user_id) AS BIGINT) AS value, count(*) - count(user_id) = 0 AS passed, 'fail' AS severity FROM events
              |UNION ALL SELECT 'testdata.events', 'missing_count', 'props',
              |  CAST(count(*) - count(props) AS BIGINT), count(*) - count(props) = 0, 'warn' FROM events
              |UNION ALL SELECT 'testdata.events', 'freshness', 'ts',
              |  ${CoreQueries.FreshnessAsOfMs} - epoch_ms(max(ts)),
              |  ${CoreQueries.FreshnessAsOfMs} - epoch_ms(max(ts)) < ${7L * 86400000L}, 'fail' FROM events
              |UNION ALL SELECT 'lakehouse.scd_type2', 'missing_count', 'effective_from',
              |  CAST(count(*) - count(effective_from) AS BIGINT), count(*) - count(effective_from) = 0, 'fail' FROM merged
              |UNION ALL SELECT 'lakehouse.scd_type2', 'freshness', 'effective_from',
              |  $MergeAsOfMs - epoch_ms(max(effective_from)),
              |  $MergeAsOfMs - epoch_ms(max(effective_from)) < ${30L * 86400000L}, 'fail' FROM merged""".stripMargin),
      doc = "cross-table compliance suite: PII tracking, staleness bounds, warn severity")
  )
}
