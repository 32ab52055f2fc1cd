package graft

import graft.patterns.{FeatureStore, Scd1, Scd2}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's three declared table patterns as verifiable queries
  * (SURVEY.md §2.10): SCD Type 2 dimension maintenance, append-only event
  * streams, and the point-in-time feature store.
  *
  * Each query constructs its inputs deterministically from the testdata
  * tables (no fixtures, no now()) so the DuckDB oracle can rebuild the
  * exact same state.
  */
object PatternQueries {

  import Queries.tbl

  /** Fixed merge instant (2024-03-01T00:00:00Z). Package-visible: the
    * declarative quality suites (QualityQueries) check the SCD/feature
    * tables this module builds and anchor freshness just after it.
    */
  private[graft] val MergeAtMs = 1709251200000L
  private[graft] val MergeAtSql = "TIMESTAMP '2024-03-01 00:00:00'"
  /** Dimension birth instant (2024-01-01T00:00:00Z). */
  private val Epoch0Sql = "TIMESTAMP '2024-01-01 00:00:00'"
  private val Epoch0Ms = 1704067200000L

  /** The existing dimension: every customer, one current version born at
    * epoch0. (SCD2 shape per `table-templates/scd_type2.yaml:31-48`.)
    */
  private[graft] def dim(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer").select(
      col("c_custkey").as("natural_key"),
      col("c_name").as("name"),
      col("c_mktsegment").as("segment"),
      col("c_acctbal").as("acctbal"),
      timestamp_millis(lit(Epoch0Ms)).as("effective_from"),
      lit(null).cast("timestamp").as("effective_to"),
      lit(true).as("is_current"))

  private[graft] val DimSql =
    s"""SELECT c_custkey AS natural_key, c_name AS name,
       |  c_mktsegment AS segment, c_acctbal AS acctbal,
       |  $Epoch0Sql AS effective_from,
       |  CAST(NULL AS TIMESTAMP) AS effective_to,
       |  true AS is_current
       |FROM customer""".stripMargin

  /** The change feed: customers with custkey % 3 = 0 get a new balance
    * (+100) — a changed version; custkey % 7 = 0 among them also changes
    * segment. Keys 900000+ are brand new.
    */
  private[graft] def feed(s: SparkSession, dir: String): DataFrame = {
    val changed = tbl(s, dir, "customer")
      .filter(col("c_custkey") % 3 === 0)
      .select(
        col("c_custkey").as("natural_key"),
        col("c_name").as("name"),
        when(col("c_custkey") % 7 === 0, lit("MACHINERY")).otherwise(col("c_mktsegment")).as("segment"),
        (col("c_acctbal").cast("decimal(18,2)") + 100).cast("double").as("acctbal"))
    val fresh = tbl(s, dir, "customer")
      .filter(col("c_custkey") % 11 === 0)
      .select(
        (col("c_custkey") + 900000).as("natural_key"),
        concat(lit("NewCo#"), col("c_custkey")).as("name"),
        lit("STARTUP").as("segment"),
        lit(0.0).as("acctbal"))
    changed.unionByName(fresh)
  }

  private[graft] val FeedSql =
    """SELECT c_custkey AS natural_key, c_name AS name,
      |  CASE WHEN c_custkey % 7 = 0 THEN 'MACHINERY' ELSE c_mktsegment END AS segment,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 100 AS DOUBLE) AS acctbal
      |FROM customer WHERE c_custkey % 3 = 0
      |UNION ALL
      |SELECT c_custkey + 900000, 'NewCo#' || c_custkey, 'STARTUP', 0.0
      |FROM customer WHERE c_custkey % 11 = 0""".stripMargin

  /** Second merge instant (2024-04-01T00:00:00Z) — the `stream_scd2_merge`
    * query's batch-2 effectiveAt.
    */
  private[graft] val MergeAt2Ms = 1711929600000L
  private[graft] val MergeAt2Sql = "TIMESTAMP '2024-04-01 00:00:00'"

  /** A SECOND change feed (stream batch 2): customers with custkey % 6 = 0
    * — a subset of feed 1's % 3 keys — change balance again (+300 from the
    * original, vs feed 1's +100), opening a THIRD version per key: the
    * multi-batch lineage that makes the streaming merge more than a
    * re-run of the batch one.
    */
  private[graft] def feed2(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "customer")
      .filter(col("c_custkey") % 6 === 0)
      .select(
        col("c_custkey").as("natural_key"),
        col("c_name").as("name"),
        when(col("c_custkey") % 7 === 0, lit("MACHINERY")).otherwise(col("c_mktsegment")).as("segment"),
        (col("c_acctbal").cast("decimal(18,2)") + 300).cast("double").as("acctbal"))

  private[graft] val Feed2Sql =
    """SELECT c_custkey AS natural_key, c_name AS name,
      |  CASE WHEN c_custkey % 7 = 0 THEN 'MACHINERY' ELSE c_mktsegment END AS segment,
      |  CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 300 AS DOUBLE) AS acctbal
      |FROM customer WHERE c_custkey % 6 = 0""".stripMargin

  /** DuckDB rebuild of merge(merge(dim, feed)@T1, feed2)@T2 — the
    * two-microbatch streaming SCD2 lineage, ending in CTE `merged2`.
    * (lazy: MergedScdSql is declared further down this object)
    */
  private[graft] lazy val Merged2ScdSql =
    s"""$MergedScdSql,
       |feed2 AS ($Feed2Sql),
       |cur2 AS (SELECT * FROM merged WHERE is_current),
       |hist2 AS (SELECT * FROM merged WHERE NOT is_current),
       |matched2 AS (
       |  SELECT c.*, f.natural_key AS f_key, f.name AS f_name,
       |         f.segment AS f_segment, f.acctbal AS f_acctbal,
       |         (c.name IS DISTINCT FROM f.name
       |          OR c.segment IS DISTINCT FROM f.segment
       |          OR c.acctbal IS DISTINCT FROM f.acctbal) AS changed
       |  FROM cur2 c JOIN feed2 f ON c.natural_key = f.natural_key),
       |merged2 AS (
       |  SELECT natural_key, name, segment, acctbal,
       |         effective_from, effective_to, is_current FROM hist2
       |  UNION ALL
       |  SELECT natural_key, name, segment, acctbal,
       |         effective_from, $MergeAt2Sql AS effective_to, false AS is_current
       |  FROM matched2 WHERE changed
       |  UNION ALL
       |  SELECT natural_key, name, segment, acctbal,
       |         effective_from, effective_to, is_current
       |  FROM matched2 WHERE NOT changed
       |  UNION ALL
       |  SELECT c.natural_key, c.name, c.segment, c.acctbal,
       |         c.effective_from, c.effective_to, c.is_current
       |  FROM cur2 c WHERE NOT EXISTS
       |    (SELECT 1 FROM feed2 f WHERE f.natural_key = c.natural_key)
       |  UNION ALL
       |  SELECT f_key, f_name, f_segment, f_acctbal,
       |         $MergeAt2Sql, CAST(NULL AS TIMESTAMP), true
       |  FROM matched2 WHERE changed
       |  UNION ALL
       |  SELECT f.natural_key, f.name, f.segment, f.acctbal,
       |         $MergeAt2Sql, CAST(NULL AS TIMESTAMP), true
       |  FROM feed2 f WHERE NOT EXISTS
       |    (SELECT 1 FROM cur2 c WHERE c.natural_key = f.natural_key))""".stripMargin

  /** The post-merge SCD2 dimension (shared with the declarative quality
    * suites, which check this exact table).
    */
  private[graft] def mergedScd(s: SparkSession, dir: String): DataFrame =
    Scd2.merge(dim(s, dir), feed(s, dir),
      trackedCols = Seq("name", "segment", "acctbal"),
      effectiveAt = timestamp_millis(lit(MergeAtMs)))

  /** The materialized feature table (shared with the quality suites). */
  private[graft] def featureTable(s: SparkSession, dir: String): DataFrame =
    FeatureStore.materialize(
      tbl(s, dir, "events"),
      entityCol = "user_id", tsCol = "ts",
      featureSet = "user_activity", modelVersion = "v1",
      computedAt = timestamp_millis(lit(MergeAtMs)),
      aggs = Map(
        "event_count" -> count(lit(1)),
        "purchase_count" -> sum(when(col("event_type") === "purchase", 1).otherwise(0)),
        "total_value" -> sum(col("value").cast("decimal(18,6)")).cast("double")))

  /** DuckDB rebuild of [[featureTable]] (reused as a CTE by the quality
    * suite oracles).
    */
  private[graft] val FeatureSql =
    s"""SELECT user_id AS entity_id, max(ts) AS feature_timestamp,
       |  count(*) AS event_count,
       |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_count,
       |  CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
       |  'user_activity' AS feature_set, 'v1' AS model_version,
       |  $MergeAtSql AS computed_at
       |FROM events GROUP BY user_id""".stripMargin

  /** DuckDB rebuild of [[mergedScd]] as a chain of CTEs ending in
    * `merged` (reused by the quality suite oracles; mirrors the
    * scd2_merge oracle).
    */
  private[graft] val MergedScdSql =
    s"""dim AS ($DimSql), feed AS ($FeedSql),
       |matched AS (
       |  SELECT d.*, f.natural_key AS f_key, f.name AS f_name,
       |         f.segment AS f_segment, f.acctbal AS f_acctbal,
       |         (d.name IS DISTINCT FROM f.name
       |          OR d.segment IS DISTINCT FROM f.segment
       |          OR d.acctbal IS DISTINCT FROM f.acctbal) AS changed
       |  FROM dim d JOIN feed f ON d.natural_key = f.natural_key),
       |merged AS (
       |  SELECT natural_key, name, segment, acctbal,
       |         effective_from, $MergeAtSql AS effective_to, false AS is_current
       |  FROM matched WHERE changed
       |  UNION ALL
       |  SELECT natural_key, name, segment, acctbal,
       |         effective_from, effective_to, is_current
       |  FROM matched WHERE NOT changed
       |  UNION ALL
       |  SELECT d.natural_key, d.name, d.segment, d.acctbal,
       |         d.effective_from, d.effective_to, d.is_current
       |  FROM dim d WHERE NOT EXISTS
       |    (SELECT 1 FROM feed f WHERE f.natural_key = d.natural_key)
       |  UNION ALL
       |  SELECT f_key, f_name, f_segment, f_acctbal,
       |         $MergeAtSql, CAST(NULL AS TIMESTAMP), true
       |  FROM matched WHERE changed
       |  UNION ALL
       |  SELECT f.natural_key, f.name, f.segment, f.acctbal,
       |         $MergeAtSql, CAST(NULL AS TIMESTAMP), true
       |  FROM feed f WHERE NOT EXISTS
       |    (SELECT 1 FROM dim d WHERE d.natural_key = f.natural_key))""".stripMargin

  def defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------------
    // SCD Type 2
    // ------------------------------------------------------------------
    "scd2_merge" -> QueryDef(
      (s, dir) => mergedScd(s, dir),
      // single source of truth: the same CTE chain the quality-suite
      // oracles consume — an SCD semantics change edits one string
      Some(s"WITH $MergedScdSql\nSELECT * FROM merged"),
      doc = "full SCD2 merge: close changed, pass unchanged/absent, open new"),

    "scd1_upsert" -> QueryDef(
      (s, dir) => {
        // SCD Type 1 latest-wins upsert, one batch carrying BOTH change
        // feeds: %6 keys appear twice (T1 +100 and T2 +300) and the T2
        // version must win via the in-batch collapse; %3-not-%6 keys take
        // the T1 version; 9xxxxx keys insert; untouched keys pass through
        // with a NULL applied-at.
        val d = tbl(s, dir, "customer").select(
          col("c_custkey").as("natural_key"), col("c_name").as("name"),
          col("c_mktsegment").as("segment"), col("c_acctbal").as("acctbal"),
          lit(null).cast("timestamp").as("updated_at"))
        val batch = feed(s, dir)
          .withColumn("updated_at", timestamp_millis(lit(MergeAtMs)))
          .unionByName(feed2(s, dir)
            .withColumn("updated_at", timestamp_millis(lit(MergeAt2Ms))))
        Scd1.upsert(d, batch, "natural_key", Seq(col("updated_at")))
      },
      Some(s"""WITH batch AS (
              |  SELECT f.*, $MergeAtSql AS updated_at FROM ($FeedSql) f
              |  UNION ALL
              |  SELECT f2.*, $MergeAt2Sql AS updated_at FROM ($Feed2Sql) f2
              |),
              |latest AS (
              |  SELECT natural_key, name, segment, acctbal, updated_at FROM (
              |    SELECT b.*, row_number() OVER (
              |      PARTITION BY natural_key ORDER BY updated_at DESC) AS rn
              |    FROM batch b)
              |  WHERE rn = 1
              |),
              |dim AS (
              |  SELECT c_custkey AS natural_key, c_name AS name,
              |    c_mktsegment AS segment, c_acctbal AS acctbal,
              |    CAST(NULL AS TIMESTAMP) AS updated_at
              |  FROM customer
              |)
              |SELECT coalesce(d.natural_key, l.natural_key) AS natural_key,
              |  CASE WHEN l.natural_key IS NOT NULL THEN l.name ELSE d.name END AS name,
              |  CASE WHEN l.natural_key IS NOT NULL THEN l.segment ELSE d.segment END AS segment,
              |  CASE WHEN l.natural_key IS NOT NULL THEN l.acctbal ELSE d.acctbal END AS acctbal,
              |  CASE WHEN l.natural_key IS NOT NULL THEN l.updated_at ELSE d.updated_at END AS updated_at
              |FROM dim d FULL JOIN latest l ON d.natural_key = l.natural_key""".stripMargin),
      doc = "SCD1 latest-wins upsert: collapse batch to newest per key, overwrite matched, " +
        "insert new, pass untouched"),

    "scd2_key_join" -> QueryDef(
      (s, dir) => {
        // the merge's core equi-join in isolation: current dim rows
        // matched to the incoming feed on natural_key.
        val d = Scd2.currentView(dim(s, dir)).select(
          col("natural_key"), col("segment").as("dim_segment"),
          col("acctbal").as("dim_acctbal"))
        val f = feed(s, dir).select(
          col("natural_key"), col("segment").as("feed_segment"),
          col("acctbal").as("feed_acctbal"))
        d.join(f, Seq("natural_key"), "full_outer")
      },
      Some(s"""WITH dim AS ($DimSql), feed AS ($FeedSql)
              |SELECT COALESCE(d.natural_key, f.natural_key) AS natural_key,
              |  d.segment AS dim_segment, d.acctbal AS dim_acctbal,
              |  f.segment AS feed_segment, f.acctbal AS feed_acctbal
              |FROM (SELECT * FROM dim WHERE is_current) d
              |FULL OUTER JOIN feed f ON d.natural_key = f.natural_key""".stripMargin),
      doc = "SCD2 matching join: current dimension vs incoming feed"),

    "scd2_current_view" -> QueryDef(
      (s, dir) => Scd2.currentView(mergedScd(s, dir))
        .select("natural_key", "segment", "acctbal", "effective_from"),
      Some(s"""WITH dim AS ($DimSql), feed AS ($FeedSql),
              |matched AS (
              |  SELECT d.natural_key, f.name AS f_name, f.segment AS f_segment,
              |         f.acctbal AS f_acctbal, d.effective_from,
              |         (d.name IS DISTINCT FROM f.name
              |          OR d.segment IS DISTINCT FROM f.segment
              |          OR d.acctbal IS DISTINCT FROM f.acctbal) AS changed,
              |         d.segment AS d_segment, d.acctbal AS d_acctbal
              |  FROM dim d JOIN feed f ON d.natural_key = f.natural_key)
              |SELECT natural_key, d_segment AS segment, d_acctbal AS acctbal, effective_from
              |FROM matched WHERE NOT changed
              |UNION ALL
              |SELECT d.natural_key, d.segment, d.acctbal, d.effective_from
              |FROM dim d WHERE NOT EXISTS
              |  (SELECT 1 FROM feed f WHERE f.natural_key = d.natural_key)
              |UNION ALL
              |SELECT natural_key, f_segment, f_acctbal, $MergeAtSql
              |FROM matched WHERE changed
              |UNION ALL
              |SELECT f.natural_key, f.segment, f.acctbal, $MergeAtSql
              |FROM feed f WHERE NOT EXISTS
              |  (SELECT 1 FROM dim d WHERE d.natural_key = f.natural_key)""".stripMargin),
      doc = "current slice after a merge: exactly one row per natural_key"),

    "scd2_window_close" -> QueryDef(
      (s, dir) => {
        // raw version history: each order is a version of its customer's
        // state; windowClose derives effective_to / is_current via lead().
        val versions = tbl(s, dir, "orders").select(
          col("o_custkey").as("natural_key"),
          col("o_orderdate").as("effective_from"),
          col("o_totalprice").as("state_price"),
          col("o_orderkey"))
        Scd2.windowClose(
            versions.dropDuplicates("natural_key", "effective_from"),
            "natural_key", "effective_from")
          .select("natural_key", "effective_from", "effective_to", "is_current")
      },
      Some("""WITH versions AS (
             |  SELECT natural_key, effective_from FROM (
             |    SELECT o_custkey AS natural_key, o_orderdate AS effective_from,
             |      row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey) AS rn
             |    FROM orders) WHERE rn = 1)
             |SELECT natural_key, effective_from,
             |  lead(effective_from, 1) OVER (PARTITION BY natural_key ORDER BY effective_from) AS effective_to,
             |  lead(effective_from, 1) OVER (PARTITION BY natural_key ORDER BY effective_from) IS NULL AS is_current
             |FROM versions""".stripMargin),
      doc = "window realization of close-old-versions: lead() per key"),

    "scd2_asof_state" -> QueryDef(
      (s, dir) => {
        // point-in-time dimension lookup: the version of each key in
        // force at an instant T — the query SCD2 exists to answer.
        val versions = tbl(s, dir, "orders").select(
          col("o_custkey").as("natural_key"),
          col("o_orderdate").as("effective_from"),
          col("o_totalprice").as("state_price"),
          col("o_orderkey"))
        // deterministic survivor per (key, instant): min o_orderkey —
        // dropDuplicates picks a partition-order-dependent row, which
        // diverges from the oracle whenever duplicate versions differ
        val pick = Window.partitionBy(col("natural_key"), col("effective_from"))
          .orderBy(col("o_orderkey").asc)
        val dedup = versions.withColumn("_rn", row_number().over(pick))
          .filter(col("_rn") === 1).drop("_rn")
        val closed = Scd2.windowClose(dedup, "natural_key", "effective_from")
        val t = lit("1997-01-01 00:00:00").cast("timestamp")
        closed.filter(col("effective_from") <= t &&
            (col("effective_to").isNull || col("effective_to") > t))
          .select("natural_key", "effective_from", "state_price")
      },
      Some("""WITH versions AS (
             |  SELECT natural_key, effective_from, state_price FROM (
             |    SELECT o_custkey AS natural_key, o_orderdate AS effective_from,
             |      o_totalprice AS state_price,
             |      row_number() OVER (PARTITION BY o_custkey, o_orderdate ORDER BY o_orderkey) AS rn
             |    FROM orders) WHERE rn = 1),
             |closed AS (
             |  SELECT natural_key, effective_from, state_price,
             |    lead(effective_from, 1) OVER (PARTITION BY natural_key ORDER BY effective_from) AS effective_to
             |  FROM versions)
             |SELECT natural_key, effective_from, state_price FROM closed
             |WHERE effective_from <= TIMESTAMP '1997-01-01 00:00:00'
             |  AND (effective_to IS NULL OR effective_to > TIMESTAMP '1997-01-01 00:00:00')""".stripMargin),
      doc = "point-in-time SCD2 state: at most one version per key at instant T"),

    // ------------------------------------------------------------------
    // append-only event stream
    // ------------------------------------------------------------------
    "event_transitions" -> QueryDef(
      (s, dir) => {
        // first-order Markov transition matrix of the event stream:
        // (event_type -> next_event_type) counts and row-normalized
        // probabilities per user timeline. The lead() window partitions
        // by user_id (bounded per-user timelines — never a single-task
        // global sort); the count + normalize stages are two hash
        // aggregations over at most |types|^2 rows. The behavioral-model
        // counterpart of event_funnel's fixed-order analysis.
        val events = tbl(s, dir, "events")
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val pairs = events
          .withColumn("next_type", lead(col("event_type"), 1).over(byUser))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type").as("prev_type"), col("next_type"))
          .agg(count(lit(1)).as("n"))
        val byPrev = Window.partitionBy(col("prev_type"))
        pairs
          .withColumn("p", round(col("n").cast("double") /
            sum(col("n")).over(byPrev), 4))
          .select("prev_type", "next_type", "n", "p")
      },
      Some("""WITH pairs AS (
             |  SELECT event_type AS prev_type,
             |    lead(event_type, 1) OVER (PARTITION BY user_id
             |      ORDER BY ts ASC, event_id ASC) AS next_type
             |  FROM events),
             |c AS (SELECT prev_type, next_type, count(*) AS n
             |  FROM pairs WHERE next_type IS NOT NULL GROUP BY 1, 2)
             |SELECT prev_type, next_type, n,
             |  round(CAST(n AS DOUBLE) /
             |    sum(n) OVER (PARTITION BY prev_type), 4) AS p
             |FROM c""".stripMargin),
      doc = "first-order Markov transitions of the event stream: per-user " +
        "lead() pairing (bounded partitions), counts + row-normalized " +
        "probabilities - the behavioral-model counterpart of the funnel"),

    "event_anomaly_mad" -> QueryDef(
      (s, dir) => {
        // robust per-type anomaly detection: median absolute deviation
        // (the estimator outliers cannot poison, unlike mean/stddev —
        // the same spike being hunted would inflate a z-score's own
        // yardstick). Exact percentiles here; at 100 TB swap in
        // approx_percentile, same plan shape. Outlier gate compares
        // 6-dp-rounded values on both sides (no float knife edge);
        // 1.4826 is the usual normal-consistency constant.
        val ev = tbl(s, dir, "events").select(col("event_type"), col("value"))
        val med = ev.groupBy(col("event_type"))
          .agg(expr("percentile(value, 0.5)").as("med"))
        val dev = ev.join(broadcast(med), "event_type")
          .withColumn("adev", abs(col("value") - col("med")))
        val mad = dev.groupBy(col("event_type"))
          .agg(expr("percentile(adev, 0.5)").as("mad"))
        dev.join(broadcast(mad), "event_type")
          .groupBy(col("event_type"))
          .agg(
            count(col("value")).as("n"),
            (round(min(col("med")), 6) + lit(0.0)).as("med"),
            (round(min(col("mad")), 6) + lit(0.0)).as("mad"),
            sum(when(round(col("adev"), 6) >
              round(lit(3.0) * lit(1.4826) * col("mad"), 6), 1L).otherwise(0L))
              .as("n_outliers"))
      },
      Some("""WITH m AS (SELECT event_type, quantile_cont(value, 0.5) AS med
             |  FROM events GROUP BY 1),
             |d AS (SELECT e.event_type, e.value, m.med,
             |    abs(e.value - m.med) AS adev
             |  FROM events e JOIN m USING (event_type)),
             |md AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
             |  FROM d GROUP BY 1)
             |SELECT d.event_type, count(d.value) AS n,
             |  (round(min(d.med), 6) + 0.0) AS med, (round(min(md.mad), 6) + 0.0) AS mad,
             |  CAST(sum(CASE WHEN round(d.adev, 6) >
             |    round(3.0 * 1.4826 * md.mad, 6) THEN 1 ELSE 0 END) AS BIGINT)
             |    AS n_outliers
             |FROM d JOIN md USING (event_type) GROUP BY 1""".stripMargin),
      doc = "median-absolute-deviation anomaly detection per event type: the " +
        "robust estimator outliers cannot poison; exact percentiles (approx " +
        "at scale, same plan), 6-dp-rounded gate, two broadcast-joined aggs"),

    "event_sessionize" -> QueryDef(
      (s, dir) => {
        // classic event sessionization: a 30-minute inactivity gap opens
        // a new session; session ids via cumulative sum of gap markers.
        // ROWS frame explicitly (RANGE would merge equal timestamps).
        val events = tbl(s, dir, "events")
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
        val cum = Window.partitionBy(col("user_id"))
          .orderBy(col("ts").asc, col("event_id").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        events
          .withColumn("gap",
            when(unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(byUser)) > 1800000L
              || lag(col("ts"), 1).over(byUser).isNull, 1).otherwise(0))
          .withColumn("session_id", sum(col("gap")).over(cum))
          .select("event_id", "user_id", "session_id")
      },
      Some("""SELECT event_id, user_id,
             |  CAST(sum(gap) OVER (PARTITION BY user_id
             |    ORDER BY ts ASC, event_id ASC
             |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
             |FROM (
             |  SELECT event_id, user_id, ts,
             |    CASE WHEN lag(ts, 1) OVER w IS NULL THEN 1
             |         WHEN epoch_ms(ts) - epoch_ms(lag(ts, 1) OVER w) > 1800000 THEN 1
             |         ELSE 0 END AS gap
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC))""".stripMargin),
      doc = "30-min-gap sessionization: lag marker + running sum, one shuffle"),

    "event_funnel" -> QueryDef(
      (s, dir) =>
        // ordered conversion funnel via patterns.Funnel: generalized to
        // any N-step sequence (fold of conditional min-aggs); the
        // registry pins the reference 3-step instance and its oracle
        graft.patterns.Funnel.stepsCompleted(
          tbl(s, dir, "events"), Seq("signup", "view", "purchase")),
      Some("""WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
             |  WHERE event_type = 'signup' GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
             |  JOIN s1 USING (user_id)
             |  WHERE e.event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
             |  JOIN s2 USING (user_id)
             |  WHERE e.event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1),
             |u AS (SELECT DISTINCT user_id FROM events)
             |SELECT u.user_id,
             |  CAST(CASE WHEN t3 IS NOT NULL THEN 3 WHEN t2 IS NOT NULL THEN 2
             |       WHEN t1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS steps_completed
             |FROM u LEFT JOIN s1 USING (user_id) LEFT JOIN s2 USING (user_id)
             |LEFT JOIN s3 USING (user_id)""".stripMargin),
      doc = "ordered signup->view->purchase funnel via conditional min-aggs, " +
        "co-partitioned on user_id after one exchange"),

    "event_retention" -> QueryDef(
      (s, dir) => {
        // cohort retention: users bucketed by first-activity week; for
        // each (cohort, offset) count users active that many weeks later.
        // Distinct (user, week) first — the count-distinct then shuffles
        // survivor pairs, not raw events.
        val events = tbl(s, dir, "events")
        // floor(days/7), not a truncating cast: Divide yields a double
        // and cast truncates toward zero, which disagrees with the
        // oracle's `//` (floor) for any event before the anchor date
        val wk = events.select(col("user_id"),
            floor(datediff(to_date(col("ts")), lit("2024-01-01")) / 7)
              .cast("long").as("week"))
          .distinct()
        val cohort = wk.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
        wk.join(cohort, "user_id")
          .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("week_offset"))
          .agg(count(lit(1)).as("users"))
      },
      Some("""WITH wk AS (
             |  SELECT DISTINCT user_id,
             |    datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS week
             |  FROM events),
             |cohort AS (SELECT user_id, min(week) AS cohort_week FROM wk GROUP BY 1)
             |SELECT c.cohort_week, wk.week - c.cohort_week AS week_offset,
             |  count(*) AS users
             |FROM wk JOIN cohort c USING (user_id)
             |GROUP BY 1, 2""".stripMargin),
      doc = "weekly cohort retention: distinct (user, week) pairs shuffle, " +
        "never raw events; cohort = min week per user"),

    "event_append" -> QueryDef(
      (s, dir) => {
        // batch = events in the last day of the dataset; table = the rest.
        // The appended delta is the batch minus ids already present
        // (left anti against the pruned id column).
        val events = tbl(s, dir, "events")
        val cut = lit("2024-01-30 00:00:00").cast("timestamp")
        val existing = events.filter(col("ts") < cut)
        // deliberate overlap: batch includes ids ending in 0 from the
        // existing range to prove the dedupe guard drops them
        val batch = events.filter(col("ts") >= cut)
          .unionByName(existing.filter(col("event_id") % 100 === 0))
        batch.join(existing.select("event_id"), Seq("event_id"), "left_anti")
          .select("event_id", "ts", "user_id", "event_type")
      },
      Some("""WITH existing AS (
             |  SELECT * FROM events WHERE ts < TIMESTAMP '2024-01-30 00:00:00'),
             |batch AS (
             |  SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
             |  UNION ALL
             |  SELECT * FROM existing WHERE event_id % 100 = 0)
             |SELECT event_id, ts, user_id, event_type FROM batch b
             |WHERE NOT EXISTS
             |  (SELECT 1 FROM existing e WHERE e.event_id = b.event_id)""".stripMargin),
      doc = "append-only ingest with duplicate-id guard (anti join on pruned ids)"),

    // ------------------------------------------------------------------
    // feature store
    // ------------------------------------------------------------------
    "feature_materialize" -> QueryDef(
      (s, dir) => featureTable(s, dir),
      Some(FeatureSql),
      doc = "per-entity feature aggregation into the feature_table shape"),

    "asof_feature_join" -> QueryDef(
      (s, dir) => {
        val events = tbl(s, dir, "events")
        // features: per (user, ts) aggregated activity value; labels:
        // purchase events. Dedup per (entity, ts) keeps the as-of pick
        // deterministic on both engines.
        val features = events.filter(col("event_type").isin("view", "click"))
          .groupBy(col("user_id"), col("ts"))
          .agg(max(col("value")).as("feature_value"))
        val labels = events.filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("ts"))
        FeatureStore.asofJoin(labels, features,
            entityCol = "user_id", labelTsCol = "ts", featureTsCol = "ts")
          .select(col("event_id"), col("user_id"), col("feature_value"))
      },
      Some("""WITH f AS (
             |  SELECT user_id, ts, max(value) AS feature_value FROM events
             |  WHERE event_type IN ('view','click') GROUP BY user_id, ts),
             |l AS (
             |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
             |SELECT l.event_id, l.user_id, f.feature_value
             |FROM l ASOF LEFT JOIN f
             |  ON l.user_id = f.user_id AND f.ts <= l.ts""".stripMargin),
      doc = "point-in-time as-of join: one shuffle, no range-join explosion")
  )
}
