package graft

import graft.governance.AccessControl
import graft.quality.Quality
import graft.source.SourceReader
import graft.template.TemplateLoader
import org.apache.spark.sql.functions._

/** Scans, projections, quality aggregates — SURVEY.md §2.1, §2.2, §2.4.
  *
  * Oracle-parity conventions used throughout the registry:
  *  - money/double sums go through DECIMAL(18,2) and are cast back to
  *    DOUBLE, so Spark and DuckDB agree bit-for-bit (no float-order drift);
  *  - freshness/as-of instants are fixed literals (no now());
  *  - DuckDB sums of integers are cast to BIGINT to match Spark's LongType.
  */
object CoreQueries {

  import Queries.tbl

  val TemplatesDir = "/root/repo/templates"
  val CsvFixture = "/root/repo/fixtures/events_sample.csv"
  val JsonFixture = "/root/repo/fixtures/events_sample.jsonl"

  /** 2024-02-01T00:00:00Z, just after the events table's max ts. */
  val FreshnessAsOfMs = 1706745600000L

  /** scan_avro's staged fixture: one unique dir per JVM, created lazily
    * and reused across invocations — no overwrite-while-read races
    * across JVMs. Rooted under MetaQueries' per-JVM scratch so the
    * exit hook reclaims it (a bare createTempDirectory here would leak
    * one events slice per bench/verify/test JVM forever).
    */
  private[graft] lazy val scanAvroFixtureDir: String =
    MetaQueries.freshWarehouse("scan_avro_fixture")

  /** scan_orc's staged fixture: same per-JVM pattern as scan_avro. */
  private[graft] lazy val scanOrcFixtureDir: String =
    MetaQueries.freshWarehouse("scan_orc_fixture")

  def defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------------
    // §2.1 scans
    // ------------------------------------------------------------------
    "scan_parquet" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .filter(col("l_orderkey") < 1000)
          .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_shipdate")),
      Some("""SELECT l_orderkey, l_partkey, l_quantity, l_shipdate
             |FROM lineitem WHERE l_orderkey < 1000""".stripMargin),
      doc = "declared-schema parquet scan with pushed filter + pruned columns"),

    "scan_csv" -> QueryDef(
      (s, _) => {
        val t = TemplateLoader.get(TemplatesDir, "events_ingest")
        SourceReader.read(s, t)
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      },
      Some(s"""SELECT event_id, ts, event_type, value
              |FROM read_csv('$CsvFixture', delim='|', header=true,
              |  columns={'event_id':'BIGINT','ts':'TIMESTAMP','user_id':'BIGINT',
              |           'event_type':'VARCHAR','value':'DOUBLE','props':'VARCHAR'},
              |  timestampformat='%Y-%m-%d %H:%M:%S.%f')""".stripMargin),
      doc = "CSV scan with delimiter/column_names/skip_rows options"),

    "scan_json" -> QueryDef(
      (s, _) => {
        val t = TemplateLoader.get(TemplatesDir, "events")
        SourceReader.conform(s.read.json(JsonFixture), t.schema)
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      },
      Some(s"""SELECT event_id, ts, event_type, value
              |FROM read_json('$JsonFixture', format='newline_delimited',
              |  columns={'event_id':'BIGINT','ts':'TIMESTAMP','user_id':'BIGINT',
              |           'event_type':'VARCHAR','value':'DOUBLE','props':'VARCHAR'},
              |  timestampformat='%Y-%m-%d %H:%M:%S.%f')""".stripMargin),
      doc = "newline-JSON scan cast to declared schema"),

    // ------------------------------------------------------------------
    // §2.2 projections / filters
    // ------------------------------------------------------------------
    "project_pii_mask" -> QueryDef(
      (s, dir) => {
        val t = TemplateLoader.get(TemplatesDir, "events")
        AccessControl.maskPii(tbl(s, dir, "events"), t, AccessControl.Reader)
      },
      Some("SELECT event_id, ts, event_type, value, props FROM events"),
      doc = "restricted columns dropped for reader principals"),

    "project_schema_conform" -> QueryDef(
      (s, dir) => {
        val t = TemplateLoader.get(TemplatesDir, "events")
        SourceReader.conform(tbl(s, dir, "events"), t.schema)
      },
      Some("""SELECT event_id, ts, user_id, event_type, value, props FROM events"""),
      doc = "declared column order + types projection"),

    "filter_required_notnull" -> QueryDef(
      (s, dir) => {
        val t = TemplateLoader.get(TemplatesDir, "events")
        val df = tbl(s, dir, "events")
        df.filter(t.requiredColumns.map(c => col(c).isNotNull).reduce(_ && _))
          .select(col("event_id"), col("event_type"), col("user_id"))
      },
      Some("""SELECT event_id, event_type, user_id FROM events
             |WHERE event_id IS NOT NULL AND ts IS NOT NULL
             |  AND user_id IS NOT NULL AND event_type IS NOT NULL""".stripMargin),
      doc = "required-column NOT NULL enforcement"),

    "filter_predicate" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .filter(
            col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount") > 0.05 && col("l_quantity") < 25)
          .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice")),
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1997-01-01'
             |  AND l_discount > 0.05 AND l_quantity < 25""".stripMargin),
      doc = "arbitrary WHERE predicates, pushed to the parquet scan"),

    // ------------------------------------------------------------------
    // §2.4 quality aggregates
    // ------------------------------------------------------------------
    "agg_row_count" -> QueryDef(
      (s, dir) => tbl(s, dir, "events").agg(count(lit(1)).as("row_count")),
      Some("SELECT count(*) AS row_count FROM events")),

    "agg_missing_count" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "events").agg(
          (count(lit(1)) - count(col("event_id"))).as("missing_event_id"),
          (count(lit(1)) - count(col("ts"))).as("missing_ts"),
          (count(lit(1)) - count(col("user_id"))).as("missing_user_id"),
          (count(lit(1)) - count(col("value"))).as("missing_value")),
      Some("""SELECT count(*) - count(event_id) AS missing_event_id,
             |       count(*) - count(ts) AS missing_ts,
             |       count(*) - count(user_id) AS missing_user_id,
             |       count(*) - count(value) AS missing_value
             |FROM events""".stripMargin)),

    "agg_duplicate_count" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "events").agg(
          (count(col("event_id")) - count_distinct(col("event_id"))).as("dup_event_id"),
          (count(col("event_type")) - count_distinct(col("event_type"))).as("dup_event_type")),
      Some("""SELECT CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT) AS dup_event_id,
             |       CAST(count(event_type) - count(DISTINCT event_type) AS BIGINT) AS dup_event_type
             |FROM events""".stripMargin),
      doc = "Soda duplicate_count: rows beyond the first per value"),

    "agg_freshness" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "events").agg(
          (lit(FreshnessAsOfMs) - unix_millis(max(col("ts")))).as("age_ms")),
      Some(s"""SELECT $FreshnessAsOfMs - epoch_ms(max(ts)) AS age_ms FROM events"""),
      doc = "now - max(ts), with a fixed as_of for determinism"),

    "quality_gate" -> QueryDef(
      (s, dir) => {
        val results = Quality.gate(
          tbl(s, dir, "events"), "testdata.events",
          Seq(
            Quality.rowCount(),
            Quality.missingCount("event_id"),
            Quality.missingCount("ts"),
            Quality.duplicateCount("event_id"),
            Quality.freshness("ts", FreshnessAsOfMs, maxAgeMs = 7L * 24 * 3600 * 1000)))
        import s.implicits._
        results.toDF().select(col("check"), col("column"), col("value"), col("passed"), col("severity"))
      },
      Some(s"""SELECT 'row_count' AS "check", '*' AS "column",
              |       CAST(count(*) AS BIGINT) AS value, count(*) > 0 AS passed, 'fail' AS severity FROM events
              |UNION ALL SELECT 'missing_count', 'event_id', CAST(count(*) - count(event_id) AS BIGINT),
              |       count(*) - count(event_id) = 0, 'fail' FROM events
              |UNION ALL SELECT 'missing_count', 'ts', CAST(count(*) - count(ts) AS BIGINT),
              |       count(*) - count(ts) = 0, 'fail' FROM events
              |UNION ALL SELECT 'duplicate_count', 'event_id',
              |       CAST(count(event_id) - count(DISTINCT event_id) AS BIGINT),
              |       count(event_id) - count(DISTINCT event_id) = 0, 'fail' FROM events
              |UNION ALL SELECT 'freshness', 'ts', $FreshnessAsOfMs - epoch_ms(max(ts)),
              |       $FreshnessAsOfMs - epoch_ms(max(ts)) < ${7L * 24 * 3600 * 1000}, 'fail' FROM events""".stripMargin),
      doc = "whole check suite as ONE multi-aggregate pass + gate semantics"),

    // ------------------------------------------------------------------
    // flagship: TPC-H Q1-shaped pricing summary (entry query)
    // ------------------------------------------------------------------
    "scan_avro" -> QueryDef(
      (s, dir) => {
        // the avro READ front door: a declared avro source scans through
        // the same validated-path + schema-conform pipeline as parquet/
        // csv/json, served by the engine's avro-core FileFormat. The
        // fixture materializes a deterministic avro copy of events
        // first (timestamps ride the timestamp-micros logical type).
        val t = TemplateLoader.get(TemplatesDir, "events")
        // one unique dir PER JVM, reused across invocations: no temp-dir
        // accumulation over repeated runs, and no overwrite-while-read
        // race between concurrent JVMs (bench + verify) or users
        val avroDir = CoreQueries.scanAvroFixtureDir
        tbl(s, dir, "events").filter(col("event_id") % 6 === 0)
          .write.mode("overwrite").format("avro").save(avroDir)
        SourceReader.read(s,
          graft.template.SourceDef(s"local://$avroDir", "avro"), t.schema)
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      },
      Some("""SELECT event_id, ts, event_type, value
             |FROM events WHERE event_id % 6 = 0""".stripMargin),
      doc = "avro scan through the validated-source front door (path guard + " +
        "schema conform), served by the avro-core FileFormat; container-header " +
        "schema inference, logical-type timestamps"),

    "scan_orc" -> QueryDef(
      (s, dir) => {
        // the orc READ front door: orc is a declared source/write format
        // in the reference's template schema (table-templates/
        // _schema.json:100-103); the engine already WRITES orc natively
        // (SnapshotTable format dispatch) — this is the matching ingest
        // path through the same validated-path + schema-conform pipeline
        // as parquet/csv/json/avro, with the declared schema pushed to
        // Spark's columnar orc reader (no inference pass).
        val t = TemplateLoader.get(TemplatesDir, "events")
        val orcDir = CoreQueries.scanOrcFixtureDir
        tbl(s, dir, "events").filter(col("event_id") % 5 === 0)
          .write.mode("overwrite").orc(orcDir)
        SourceReader.read(s,
          graft.template.SourceDef(s"local://$orcDir", "orc"), t.schema)
          .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      },
      Some("""SELECT event_id, ts, event_type, value
             |FROM events WHERE event_id % 5 = 0""".stripMargin),
      doc = "orc scan through the validated-source front door (path guard + " +
        "schema conform), served by Spark's native columnar orc source with " +
        "the declared schema (no inference pass)"),

    "q1_agg" -> QueryDef(
      (s, dir) => Q1.build(tbl(s, dir, "lineitem")),
      Some(Q1.oracle)),

    "q3_priority" -> QueryDef(
      (s, dir) => {
        // TPC-H Q3-shaped flagship join: the canonical star shape —
        // customer (filtered dim, broadcast) ⋈ orders ⋈ lineitem
        // (fact), every filter pushed to its scan, revenue in exact
        // decimal, top-10 with a total tie-break. PlanSpec pins the
        // broadcast + pushdown; AQE is free to pick the join order.
        val cut = lit("1998-06-15").cast("timestamp")
        val dec = (c: String) => col(c).cast("decimal(18,2)")
        val cust = tbl(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
        val ord = tbl(s, dir, "orders")
          .filter(col("o_orderdate") < cut)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
        val li = tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") > cut)
          .select(col("l_orderkey"),
            (dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
              .as("rev"))
        li.join(ord, col("l_orderkey") === col("o_orderkey"))
          .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            col("o_orderpriority"))
          .agg(sum(col("rev")).cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc)
          .limit(10)
      },
      Some("""SELECT l_orderkey,
             |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
             |  o_orderpriority,
             |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) *
             |    (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1998-06-15'
             |  AND l_shipdate > TIMESTAMP '1998-06-15'
             |GROUP BY 1, 2, 3
             |ORDER BY revenue DESC, l_orderkey ASC
             |LIMIT 10""".stripMargin),
      doc = "TPC-H Q3-shaped star join: filtered dim broadcast, filters " +
        "pushed to every scan, decimal-exact revenue, deterministic top-10"),

    "q18_big_orders" -> QueryDef(
      (s, dir) => {
        // TPC-H Q18-shaped flagship (large-volume customers): the
        // HAVING-subquery pattern — a fact self-aggregation gates the
        // main join via a SEMI join on its keys (never a second full
        // join), then customer/orders/lineitem re-aggregate over the
        // survivors. Quantity sums ride DECIMAL end-to-end (a double
        // sum is partition-order-dependent and both the >250 gate and
        // the oracle hash would knife-edge); top-100 is a distributed
        // TakeOrdered, not a global sort.
        val dec = (c: String) => col(c).cast("decimal(18,2)")
        val li = tbl(s, dir, "lineitem")
          .select(col("l_orderkey"), dec("l_quantity").as("lq"))
        val bigKeys = li.groupBy(col("l_orderkey"))
          .agg(sum(col("lq")).as("q"))
          .filter(col("q") > lit(250).cast("decimal(18,2)"))
          .select(col("l_orderkey").as("bk"))
        val ord = tbl(s, dir, "orders")
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
          .join(bigKeys, col("o_orderkey") === col("bk"), "left_semi")
        val cust = tbl(s, dir, "customer").select("c_custkey", "c_name")
        ord.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("c_name"), col("c_custkey"), col("o_orderkey"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
            col("o_totalprice"))
          .agg(sum(col("lq")).cast("double").as("sum_qty"))
          .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
            col("o_orderkey").asc)
          .limit(100)
      },
      Some("""WITH big AS (
             |  SELECT l_orderkey FROM lineitem
             |  GROUP BY 1
             |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
             |SELECT c_name, c_custkey, o_orderkey,
             |  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
             |  o_totalprice,
             |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM orders
             |JOIN customer ON o_custkey = c_custkey
             |JOIN lineitem ON o_orderkey = l_orderkey
             |WHERE o_orderkey IN (SELECT l_orderkey FROM big)
             |GROUP BY 1, 2, 3, 4, 5
             |ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
             |LIMIT 100""".stripMargin),
      doc = "TPC-H Q18-shaped flagship: HAVING-gated fact self-aggregation " +
        "feeding a semi join (never a second full join), broadcast customer " +
        "dim, decimal-exact quantities, distributed top-100")
  )

  /** TPC-H Q1-shaped flagship: filter -> groupBy -> multi-aggregate.
    * Decimal-exact sums; avg derived from exact sums for oracle parity.
    */
  object Q1 {
    import org.apache.spark.sql.{Column, DataFrame}
    private def dec(c: String): Column = col(c).cast("decimal(18,2)")

    def build(lineitem: DataFrame): DataFrame =
      lineitem
        .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec("l_quantity")).cast("double").as("sum_qty"),
          sum(dec("l_extendedprice")).cast("double").as("sum_base_price"),
          sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double").as("sum_disc_price"),
          sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")) *
              (lit(1).cast("decimal(18,2)") + dec("l_tax")))
            .cast("double").as("sum_charge"),
          (sum(dec("l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))

    val oracle: String =
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-12-01'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  }
}
