package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational surface — joins, windows, sorts/top-k, set ops, grouping
  * analytics, scalar derivations (SURVEY.md §2.3, §2.5–§2.8).
  *
  * The reference delegates all of this to Athena/BigQuery
  * (`docs/architecture.md:78,109`); here it is first-class Catalyst work.
  * Scale conventions:
  *  - dimension sides of joins are `broadcast()`ed explicitly (region,
  *    nation, filtered customer) — no shuffle of the fact table beyond
  *    what the aggregation itself needs;
  *  - every ranking has a total-order tie-break so results are stable
  *    under any partitioning;
  *  - money math goes through DECIMAL(18,2) for bit-exact oracle parity;
  *  - windows use the SQL-standard default RANGE frame, identical in
  *    Spark and DuckDB.
  */
object RelationalQueries {

  import Queries.tbl

  /** One-time-per-(session, dir) setup of the bucketed join tables;
    * returns the tag the table names carry. ConcurrentHashMap compute
    * gives per-key mutual exclusion, so concurrent first calls build
    * once. Both the cache key and the warehouse path are
    * (session, dir)-unique: a shared path would let a second dir's
    * build wipe the first's table files while the cache still reports
    * them ready, and a dir-only key would outlive a SparkSession
    * restart with the tables registered in a dead catalog.
    */
  private val bucketedReady = new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def bucketedTablesFor(s: SparkSession, dir: String): String = {
    val tag = java.lang.Integer.toHexString(System.identityHashCode(s)) + "_" +
      java.lang.Integer.toHexString(dir.hashCode)
    bucketedReady.computeIfAbsent(tag, { _ =>
      val wh = MetaQueries.freshWarehouse(s"join_bucketed_$tag")
      s.sql(s"DROP TABLE IF EXISTS graft_bucketed_orders_$tag")
      s.sql(s"DROP TABLE IF EXISTS graft_bucketed_lineitem_$tag")
      tbl(s, dir, "orders").select("o_orderkey", "o_orderpriority")
        .write.format("parquet").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders").saveAsTable(s"graft_bucketed_orders_$tag")
      tbl(s, dir, "lineitem").select("l_orderkey", "l_quantity")
        .write.format("parquet").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem").saveAsTable(s"graft_bucketed_lineitem_$tag")
      tag
    })
  }

  private def dec(c: String) = col(c).cast("decimal(18,2)")

  def defs: Map[String, QueryDef] = Map(

    // ------------------------------------------------------------------
    // §2.3 joins
    // ------------------------------------------------------------------
    "join_inner" -> QueryDef(
      (s, dir) => {
        // Q3-shaped: revenue per order for one market segment. Only the
        // filtered customer KEY SET is broadcast (a true dimension);
        // orders and lineitem are both fact tables that scale with the
        // data, so their join shuffles on l_orderkey/o_orderkey — an
        // explicit fact-side broadcast hint OOMs at 100x, and AQE will
        // still locally broadcast if the filtered side turns out tiny.
        val cust = tbl(s, dir, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
          .select("c_custkey")
        val orders = tbl(s, dir, "orders")
          .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
        val li = tbl(s, dir, "lineitem")
        li.join(orders.join(broadcast(cust),
            orders("o_custkey") === cust("c_custkey"))
            .select("o_orderkey", "o_orderdate"),
            li("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"))
          .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double").as("revenue"))
      },
      Some("""SELECT o_orderkey, o_orderdate,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey
             |WHERE c_mktsegment = 'BUILDING'
             |  AND o_orderdate < TIMESTAMP '1997-06-01'
             |GROUP BY o_orderkey, o_orderdate""".stripMargin),
      doc = "broadcast equi-join chain fact<-dim with aggregation"),

    "join_multiway" -> QueryDef(
      (s, dir) => {
        // Q5-shaped: revenue by nation. Broadcast hints go ONLY on the
        // true dimensions (supplier, nation, region — bounded size);
        // orders and customer scale linearly with the data, so those
        // joins shuffle on their keys and AQE converts them to local
        // broadcasts at runtime only if the actual size allows. An
        // explicit broadcast of a fact-side projection was the round-1
        // defect: the hint overrides size estimation entirely and builds
        // the whole table on every executor.
        val region = tbl(s, dir, "region").filter(col("r_name") === "ASIA")
        val nation = tbl(s, dir, "nation")
        val cust = tbl(s, dir, "customer")
        val orders = tbl(s, dir, "orders")
        val supplier = tbl(s, dir, "supplier")
        val li = tbl(s, dir, "lineitem")
        li.join(broadcast(supplier), li("l_suppkey") === supplier("s_suppkey"))
          .join(orders.select("o_orderkey", "o_custkey"),
            li("l_orderkey") === col("o_orderkey"))
          .join(cust.select("c_custkey", "c_nationkey"),
            col("o_custkey") === col("c_custkey") &&
              supplier("s_nationkey") === col("c_nationkey"))
          .join(broadcast(nation), col("c_nationkey") === nation("n_nationkey"))
          .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
          .groupBy(col("n_name"))
          .agg(sum(dec("l_extendedprice") * (lit(1).cast("decimal(18,2)") - dec("l_discount")))
            .cast("double").as("revenue"))
      },
      Some("""SELECT n_name,
             |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN orders ON l_orderkey = o_orderkey
             |JOIN customer ON o_custkey = c_custkey AND s_nationkey = c_nationkey
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |WHERE r_name = 'ASIA'
             |GROUP BY n_name""".stripMargin),
      doc = "five-way star join: bounded dims broadcast, fact-fact joins shuffle"),

    "join_left_outer" -> QueryDef(
      (s, dir) => {
        val nation = tbl(s, dir, "nation")
        val cust = tbl(s, dir, "customer")
        nation.join(cust, nation("n_nationkey") === cust("c_nationkey"), "left_outer")
          .groupBy(col("n_nationkey"), col("n_name"))
          .agg(count(col("c_custkey")).as("customer_count"),
            sum(dec("c_acctbal")).cast("double").as("total_acctbal"))
      },
      Some("""SELECT n_nationkey, n_name, count(c_custkey) AS customer_count,
             |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
             |FROM nation LEFT JOIN customer ON n_nationkey = c_nationkey
             |GROUP BY n_nationkey, n_name""".stripMargin),
      doc = "left outer join preserving unmatched dimension rows"),

    "join_semi" -> QueryDef(
      (s, dir) => {
        val orders = tbl(s, dir, "orders")
        val li = tbl(s, dir, "lineitem").filter(col("l_quantity") > 45)
        orders.join(li, orders("o_orderkey") === li("l_orderkey"), "left_semi")
          .select("o_orderkey", "o_orderstatus", "o_totalprice")
      },
      Some("""SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
             |WHERE EXISTS (SELECT 1 FROM lineitem
             |  WHERE l_orderkey = o_orderkey AND l_quantity > 45)""".stripMargin),
      doc = "left semi join (EXISTS)"),

    "join_anti" -> QueryDef(
      (s, dir) => {
        val cust = tbl(s, dir, "customer")
        val orders = tbl(s, dir, "orders")
        cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
          .select("c_custkey", "c_name", "c_mktsegment")
      },
      Some("""SELECT c_custkey, c_name, c_mktsegment FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin),
      doc = "left anti join (NOT EXISTS): customers with no orders"),

    "join_bucketed" -> QueryDef(
      (s, dir) => {
        // co-located fact-fact join: both sides bucketed on the join key
        // at WRITE time, so the join itself needs NO exchange — the
        // 100 TB answer to lineitem⨝orders when the broadcast hint is
        // off the table and a per-query shuffle is the dominant cost.
        // Bucket count 8 stands in for the production 1000s; PlanSpec
        // asserts the exchange-free join shape.
        // bucketed layout is WRITE-ONCE in production (you pay the
        // clustering once, then every join is exchange-free); mirror
        // that: set the tables up once per (session, dir), so repeated
        // executions measure the join, not the one-time layout build
        val tag = bucketedTablesFor(s, dir)
        s.table(s"graft_bucketed_lineitem_$tag")
          .join(s.table(s"graft_bucketed_orders_$tag"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("total_qty"))
      },
      Some("""SELECT o_orderpriority,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority""".stripMargin),
      doc = "bucketed co-located join: bucketBy at write, zero-exchange fact-fact join"),

    "join_skew_salted" -> QueryDef(
      (s, dir) => {
        // Skew pattern: the fact side is heavily skewed on the join key
        // (5 distinct event_types over 600k rows -> one reducer per key
        // in a plain shuffle join). Salting spreads each hot key over 16
        // sub-keys: fact rows get salt = id % 16, the small dim side is
        // replicated x16, and the join runs on (key, salt) — every
        // reducer gets 1/16th of a hot key. AQE's skew-join handles the
        // moderate case automatically; explicit salting is the pattern
        // that survives extreme single-key skew at 100 TB.
        val events = tbl(s, dir, "events")
        val dim = events.select(col("event_type")).distinct()
          .withColumn("weight", length(col("event_type")))
        val salted = events.withColumn("salt", pmod(col("event_id"), lit(16)))
        val dimSalted = dim.withColumn("salt",
          explode(sequence(lit(0), lit(15)))).withColumn("salt", col("salt").cast("long"))
        salted.join(dimSalted, Seq("event_type", "salt"))
          .groupBy(col("event_type"))
          .agg(sum(col("value").cast("decimal(18,6)") * col("weight"))
            .cast("double").as("weighted_value"),
            count(lit(1)).as("n"))
      },
      Some("""WITH dim AS (
             |  SELECT DISTINCT event_type, length(event_type) AS weight FROM events)
             |SELECT e.event_type,
             |  CAST(sum(CAST(e.value AS DECIMAL(18,6)) * d.weight) AS DOUBLE) AS weighted_value,
             |  count(*) AS n
             |FROM events e JOIN dim d ON e.event_type = d.event_type
             |GROUP BY e.event_type""".stripMargin),
      doc = "salted join: hot keys spread over 16 sub-keys, dim replicated"),

    // ------------------------------------------------------------------
    // §2.5 windows
    // ------------------------------------------------------------------
    "window_rank" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        tbl(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
             |  SELECT o_custkey, o_orderkey, o_totalprice,
             |    CAST(row_number() OVER (PARTITION BY o_custkey
             |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rn
             |  FROM orders) WHERE rn <= 3""".stripMargin),
      doc = "top-3 orders per customer; total-order tie-break on o_orderkey"),

    "window_running" -> QueryDef(
      (s, dir) => {
        // SQL-standard default RANGE frame: ties on o_orderdate aggregate
        // together, so the running sum is deterministic.
        val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"))
        tbl(s, dir, "orders")
          .withColumn("running_spend", sum(dec("o_totalprice")).over(w).cast("double"))
          .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")
      },
      Some("""SELECT o_custkey, o_orderkey, o_orderdate,
             |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
             |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS DOUBLE) AS running_spend
             |FROM orders""".stripMargin),
      doc = "cumulative sum per key, default RANGE frame"),

    "window_lag" -> QueryDef(
      (s, dir) => {
        val w = Window.partitionBy(col("o_custkey"))
          .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
        tbl(s, dir, "orders")
          .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
          .withColumn("delta",
            (dec("o_totalprice") - col("prev_price").cast("decimal(18,2)")).cast("double"))
          .select("o_custkey", "o_orderkey", "prev_price", "delta")
      },
      Some("""SELECT o_custkey, o_orderkey,
             |  lag(o_totalprice, 1) OVER w AS prev_price,
             |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) - CAST(lag(o_totalprice, 1) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS delta
             |FROM orders
             |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)""".stripMargin),
      doc = "lag analytic: order-over-order spend delta"),

    "window_ntile" -> QueryDef(
      (s, dir) => {
        // Two-pass DISTRIBUTED ranking (graft.plans.DistributedRank).
        // o_orderpriority has 5 distinct values, so `ntile(4) OVER
        // (PARTITION BY o_orderpriority ...)` would hold ~20% of the
        // table on ONE task (windows require the whole partition in a
        // single task) — fine at sf0.1, a straggler at 100x, OOM at the
        // 100 TB target. The global rank is reconstructed from bounded
        // per-range-partition ranks; ntile/percent_rank are closed forms
        // of (rank, n). The tie-break is total (orderkey unique), so the
        // output is identical for ANY partition count/boundaries.
        val nParts = s.conf.get("spark.sql.shuffle.partitions").toInt
        // ntile(b): first (n mod b) tiles hold ceil(n/b) rows, the rest
        // floor(n/b); for q = n div b, rem = n mod b and 1-based rank r:
        //   r <= rem*(q+1)  ->  tile = ceil(r / (q+1))
        //   otherwise       ->  tile = rem + ceil((r - rem*(q+1)) / q)
        // (q = 0, i.e. n < b, always lands in the first branch: tile = r)
        graft.plans.DistributedRank.withGlobalRank(
            tbl(s, dir, "orders")
              .select("o_orderkey", "o_orderpriority", "o_totalprice"),
            keyCols = Seq("o_orderpriority"),
            order = Seq(col("o_totalprice").asc, col("o_orderkey").asc),
            nParts = nParts)
          .withColumn("quartile", expr(
            """CAST(CASE
              |  WHEN _rk <= (_n % 4) * ((_n div 4) + 1)
              |    THEN (_rk + (_n div 4)) div ((_n div 4) + 1)
              |  ELSE (_n % 4) + (_rk - (_n % 4) * ((_n div 4) + 1) + (_n div 4) - 1) div (_n div 4)
              |END AS INT)""".stripMargin))
          .withColumn("pct_rank",
            when(col("_n") === 1, lit(0.0d)).otherwise(
              round((col("_rk") - 1).cast("double") / (col("_n") - 1), 6)))
          .select("o_orderkey", "o_orderpriority", "quartile", "pct_rank")
      },
      Some("""SELECT o_orderkey, o_orderpriority,
             |  CAST(ntile(4) OVER w AS INT) AS quartile,
             |  round(percent_rank() OVER w, 6) AS pct_rank
             |FROM orders
             |WINDOW w AS (PARTITION BY o_orderpriority
             |  ORDER BY o_totalprice ASC, o_orderkey ASC)""".stripMargin),
      doc = "ntile + percent_rank via two-pass distributed ranking (no low-cardinality window partition)"),

    // ------------------------------------------------------------------
    // §2.6 sorts / limits / top-k
    // ------------------------------------------------------------------
    "sort_limit_topk" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "orders")
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10)
          .select("o_orderkey", "o_custkey", "o_totalprice"),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
             |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin),
      doc = "global top-k: Spark plans TakeOrderedAndProject, no full sort"),

    "sort_global" -> QueryDef(
      (s, dir) =>
        // total order via range partitioning: Spark samples key ranges,
        // then each partition sorts locally — the only all-data sort in
        // the registry, here bounded to one month of lineitem.
        tbl(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
            col("l_shipdate") < lit("1996-02-01").cast("timestamp"))
          .orderBy(col("l_shipdate").asc, col("l_orderkey").asc, col("l_linenumber").asc)
          .select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity"),
      Some("""SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
             |FROM lineitem
             |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             |  AND l_shipdate < TIMESTAMP '1996-02-01'
             |ORDER BY l_shipdate, l_orderkey, l_linenumber""".stripMargin),
      doc = "global sort via range partitioning (sampled key ranges)"),

    "sort_within_partitions" -> QueryDef(
      (s, dir) =>
        // the declared-write-sort operator: cluster rows inside partitions
        // without a global range shuffle; row set is oracle-checked (the
        // verifier is order-insensitive), the clustering is a layout
        // property asserted in SortSpec.
        tbl(s, dir, "lineitem")
          .repartition(col("l_returnflag"))
          .sortWithinPartitions(col("l_shipdate").asc_nulls_last, col("l_orderkey").asc)
          .filter(col("l_quantity") >= 49)
          .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate"),
      Some("""SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate
             |FROM lineitem WHERE l_quantity >= 49""".stripMargin),
      doc = "sortWithinPartitions: write-side clustering, no global shuffle"),

    // ------------------------------------------------------------------
    // §2.7 set operations
    // ------------------------------------------------------------------
    "set_union" -> QueryDef(
      (s, dir) => {
        val buyers = tbl(s, dir, "orders").select(col("o_custkey").as("custkey")).distinct()
        val rich = tbl(s, dir, "customer").filter(col("c_acctbal") > 9000)
          .select(col("c_custkey").as("custkey"))
        buyers.union(rich).distinct()
      },
      Some("""SELECT o_custkey AS custkey FROM orders
             |UNION
             |SELECT c_custkey FROM customer WHERE c_acctbal > 9000""".stripMargin)),

    "set_intersect" -> QueryDef(
      (s, dir) => {
        val buyers = tbl(s, dir, "orders").select(col("o_custkey").as("custkey"))
        val rich = tbl(s, dir, "customer").filter(col("c_acctbal") > 9000)
          .select(col("c_custkey").as("custkey"))
        buyers.intersect(rich)
      },
      Some("""SELECT o_custkey AS custkey FROM orders
             |INTERSECT
             |SELECT c_custkey FROM customer WHERE c_acctbal > 9000""".stripMargin)),

    "set_except" -> QueryDef(
      (s, dir) => {
        val all = tbl(s, dir, "customer").select(col("c_custkey").as("custkey"))
        val buyers = tbl(s, dir, "orders").select(col("o_custkey").as("custkey"))
        all.except(buyers)
      },
      Some("""SELECT c_custkey AS custkey FROM customer
             |EXCEPT
             |SELECT o_custkey FROM orders""".stripMargin)),

    // ------------------------------------------------------------------
    // §2.4 grouping analytics (rollup / cube / grouping sets / distinct)
    // ------------------------------------------------------------------
    "agg_rollup" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
            grouping(col("l_linestatus")).cast("int").as("g_ls"),
            count(lit(1)).as("n"),
            sum(dec("l_quantity")).cast("double").as("sum_qty")),
      Some("""SELECT l_returnflag, l_linestatus,
             |  CAST(grouping(l_returnflag) AS INT) AS g_rf,
             |  CAST(grouping(l_linestatus) AS INT) AS g_ls,
             |  count(*) AS n,
             |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
             |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin)),

    "agg_cube" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "orders")
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(grouping(col("o_orderstatus")).cast("int").as("g_st"),
            grouping(col("o_orderpriority")).cast("int").as("g_pr"),
            count(lit(1)).as("n")),
      Some("""SELECT o_orderstatus, o_orderpriority,
             |  CAST(grouping(o_orderstatus) AS INT) AS g_st,
             |  CAST(grouping(o_orderpriority) AS INT) AS g_pr,
             |  count(*) AS n
             |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)),

    "agg_grouping_sets" -> QueryDef(
      (s, dir) => {
        tbl(s, dir, "events").createOrReplaceTempView("graft_events_gs")
        s.sql("""SELECT event_type, user_id % 10 AS user_bucket,
                |  CAST(grouping(event_type) AS INT) AS g_et,
                |  count(*) AS n
                |FROM graft_events_gs
                |GROUP BY GROUPING SETS ((event_type), (user_id % 10))""".stripMargin)
      },
      Some("""SELECT event_type, user_id % 10 AS user_bucket,
             |  CAST(grouping(event_type) AS INT) AS g_et,
             |  count(*) AS n
             |FROM events
             |GROUP BY GROUPING SETS ((event_type), (user_id % 10))""".stripMargin),
      doc = "explicit grouping sets via the engine's SQL surface"),

    "agg_pivot" -> QueryDef(
      (s, dir) =>
        // pivot with an EXPLICIT value list: without it Spark runs an
        // extra distinct-collect job and the column set becomes
        // data-dependent — both wrong at scale.
        tbl(s, dir, "events")
          .groupBy((col("user_id") % 10).as("user_bucket"))
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .count(),
      // each pivot column CAST AS BIGINT: DuckDB's bare sum(CASE...) is
      // HUGEINT, which the driver's pandas compare renders as float64 and
      // hash-mismatches Spark's int64 counts even when values are equal
      Some("""SELECT user_id % 10 AS user_bucket,
             |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS click,
             |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS view,
             |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS purchase,
             |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS signup,
             |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS error
             |FROM events GROUP BY user_id % 10""".stripMargin),
      doc = "pivot to wide counts; explicit value list avoids a discovery pass"),

    "agg_percentile" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
            round(expr("percentile(o_totalprice, 0.95)"), 4).as("p95"),
            round(max(col("o_totalprice")), 4).as("p100")),
      Some("""SELECT o_orderpriority,
             |  round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
             |  round(quantile_cont(o_totalprice, 0.95), 4) AS p95,
             |  round(max(o_totalprice), 4) AS p100
             |FROM orders GROUP BY o_orderpriority""".stripMargin),
      doc = "exact interpolated percentiles per group"),

    "agg_distinct" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(count_distinct(col("user_id")).as("distinct_users"),
            count(lit(1)).as("events")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS distinct_users,
             |  count(*) AS events
             |FROM events GROUP BY event_type""".stripMargin),
      doc = "distinct aggregate (two-phase partial/final under the hood)"),

    // approx_count_distinct: the raw HLL sketch value is engine-specific
    // and can never hash-match a DuckDB oracle — so the VERIFIABLE
    // contract is the accuracy guarantee itself: the sketch (rsd=0.02)
    // must land within 10% of the exact count. The oracle recomputes the
    // exact count and expects the tolerance check to hold.
    "agg_approx_distinct" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(
            count_distinct(col("user_id")).as("exact_users"),
            approx_count_distinct(col("user_id"), 0.02).as("_approx"))
          .select(col("event_type"), col("exact_users"),
            (abs(col("_approx") - col("exact_users")).cast("double") <=
              col("exact_users") * 0.1).as("approx_within_10pct")),
      Some("""SELECT event_type, count(DISTINCT user_id) AS exact_users,
             |  true AS approx_within_10pct
             |FROM events GROUP BY event_type""".stripMargin),
      // (the exact count_distinct here exists FOR the oracle check — the
      // production operator is the sketch alone, constant memory/group)
      doc = "HLL++ sketch distinct, verified against the exact count's 10% error bound"),

    "agg_approx_percentile" -> QueryDef(
      (s, dir) =>
        // the sketch value is engine-specific, so the oracle-verifiable
        // contract is a RANK bound: the approximate median must land
        // between the exact 45th and 55th exact percentiles (the
        // approx_count_distinct pattern; sketch = constant memory/group
        // vs percentile()'s full value buffer)
        tbl(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(
            expr("approx_percentile(o_totalprice, 0.5, 1000)").as("_ap50"),
            expr("percentile(o_totalprice, 0.45)").as("_lo"),
            expr("percentile(o_totalprice, 0.55)").as("_hi"),
            count(lit(1)).as("n_orders"))
          .select(col("o_orderpriority"), col("n_orders"),
            (col("_ap50") >= col("_lo") && col("_ap50") <= col("_hi"))
              .as("approx_within_rank_bound")),
      Some("""SELECT o_orderpriority, count(*) AS n_orders,
             |  true AS approx_within_rank_bound
             |FROM orders GROUP BY o_orderpriority""".stripMargin),
      doc = "approximate-percentile sketch (constant memory/group), verified " +
        "against an exact-percentile rank window"),

    // ------------------------------------------------------------------
    // §2.8 scalar derivations
    // ------------------------------------------------------------------
    "json_payload_extract" -> QueryDef(
      (s, dir) =>
        tbl(s, dir, "events")
          .select(col("event_id"),
            get_json_object(col("props"), "$.k").cast("int").as("prop_k")),
      Some("""SELECT event_id,
             |  CAST(json_extract_string(props, '$.k') AS INT) AS prop_k
             |FROM events""".stripMargin),
      doc = "typed field extraction from JSON payload column"),

    "ts_partition_derive" -> QueryDef(
      (s, dir) =>
        // The portable slice of the Iceberg transform vocabulary
        // (year/month/day/hour/truncate + a mod bucket). The engine's real
        // write path (TableSink.transformColumn) additionally uses
        // murmur-hash bucketing, which has no DuckDB equivalent.
        tbl(s, dir, "events")
          .select(col("event_id"),
            year(col("ts")).as("ts_year"),
            month(col("ts")).as("ts_month"),
            dayofmonth(col("ts")).as("ts_day"),
            hour(col("ts")).as("ts_hour"),
            substring(col("event_type"), 1, 3).as("type_trunc"),
            pmod(col("event_id"), lit(16)).as("id_bucket")),
      Some("""SELECT event_id,
             |  CAST(year(ts) AS INT) AS ts_year,
             |  CAST(month(ts) AS INT) AS ts_month,
             |  CAST(day(ts) AS INT) AS ts_day,
             |  CAST(hour(ts) AS INT) AS ts_hour,
             |  substr(event_type, 1, 3) AS type_trunc,
             |  event_id % 16 AS id_bucket
             |FROM events""".stripMargin),
      doc = "partition transform vocabulary: year/month/day/hour/truncate/bucket")
  )
}
