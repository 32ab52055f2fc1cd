package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.sink.SnapshotTable
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Hidden partitioning, read side: predicates on a transform's SOURCE
  * column (`ts >= X`) must prune the transform-derived partition dirs
  * (`ts_day`) without the query ever naming them — and never change
  * results.
  */
class HiddenPartitionSpec extends SparkSpec {

  import spark.implicits._

  private def freshCatalog(key: String): String = {
    val wh = Files.createTempDirectory(s"graft_hp_$key").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[graft.catalog.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    wh
  }

  private def partDirs(df: org.apache.spark.sql.DataFrame): Long =
    df.queryExecution.executedPlan.collect {
      case f: FileSourceScanExec => f.selectedPartitions.partitionCount.toLong
    }.sum

  test("day transform: raw-ts range and equality predicates prune day dirs") {
    freshCatalog("day")
    spark.sql(
      "CREATE TABLE graft.ns.hp (id BIGINT, ts TIMESTAMP) PARTITIONED BY (days(ts))")
    spark.sql(
      """INSERT INTO graft.ns.hp VALUES
        |  (1, TIMESTAMP '2024-01-01 10:00:00'),
        |  (2, TIMESTAMP '2024-01-02 11:00:00'),
        |  (3, TIMESTAMP '2024-01-03 05:00:00'),
        |  (4, TIMESTAMP '2024-01-03 23:00:00')""".stripMargin)
    // range on RAW ts — never names ts_day — must plan 1 of 3 day dirs
    val q = spark.sql(
      "SELECT id FROM graft.ns.hp WHERE ts >= TIMESTAMP '2024-01-03 00:00:00'")
    assert(partDirs(q) == 1, s"expected 1 day dir, planned ${partDirs(q)}")
    assert(q.as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    // mid-day lower bound keeps its OWN day (day(x) >= day(v), not >)
    val q2 = spark.sql(
      "SELECT id FROM graft.ns.hp WHERE ts > TIMESTAMP '2024-01-02 12:00:00'")
    assert(partDirs(q2) == 2)
    assert(q2.as[Long].collect().sorted.toSeq == Seq(3L, 4L))
    // equality
    val q3 = spark.sql(
      "SELECT id FROM graft.ns.hp WHERE ts = TIMESTAMP '2024-01-02 11:00:00'")
    assert(partDirs(q3) == 1)
    assert(q3.as[Long].collect().toSeq == Seq(2L))
    // upper bound
    val q4 = spark.sql(
      "SELECT id FROM graft.ns.hp WHERE ts < TIMESTAMP '2024-01-02 00:00:00'")
    assert(partDirs(q4) == 2) // day(v)=2024-01-02 stays in (<= is derived)
    assert(q4.as[Long].collect().toSeq == Seq(1L))
  }

  test("bucket transform: equality and IN on the source column prune buckets") {
    freshCatalog("bucket")
    spark.sql(
      "CREATE TABLE graft.ns.hpb (id BIGINT, v STRING) PARTITIONED BY (bucket(8, id))")
    spark.sql(
      "INSERT INTO graft.ns.hpb SELECT id, concat('v', id) FROM range(0, 64)")
    val all = partDirs(spark.sql("SELECT v FROM graft.ns.hpb"))
    assert(all == 8, s"fixture should land in all 8 buckets, got $all")
    val q = spark.sql("SELECT v FROM graft.ns.hpb WHERE id = 7")
    assert(partDirs(q) == 1)
    assert(q.as[String].collect().toSeq == Seq("v7"))
    val in = spark.sql("SELECT v FROM graft.ns.hpb WHERE id IN (3, 9)")
    assert(partDirs(in) <= 2)
    assert(in.as[String].collect().sorted.toSeq == Seq("v3", "v9"))
    // ranges must NOT derive for the non-monotone bucket transform
    val r = spark.sql("SELECT v FROM graft.ns.hpb WHERE id >= 60")
    assert(partDirs(r) == 8) // correctness over pruning
    assert(r.count() == 4L)
  }

  test("truncate transform: string prefixes derive equality and ranges") {
    freshCatalog("trunc")
    spark.sql(
      "CREATE TABLE graft.ns.hpt (code STRING, n BIGINT) PARTITIONED BY (truncate(2, code))")
    spark.sql(
      """INSERT INTO graft.ns.hpt VALUES
        |  ('aa-1', 1), ('aa-2', 2), ('bb-1', 3), ('cc-1', 4)""".stripMargin)
    val q = spark.sql("SELECT n FROM graft.ns.hpt WHERE code = 'bb-1'")
    assert(partDirs(q) == 1)
    assert(q.as[Long].collect().toSeq == Seq(3L))
    val r = spark.sql("SELECT n FROM graft.ns.hpt WHERE code >= 'bb'")
    assert(partDirs(r) == 2)
    assert(r.as[Long].collect().sorted.toSeq == Seq(3L, 4L))
  }

  test("template-driven tables get the same source-column pruning") {
    // a TableSink-style day(ts) layout built directly: spec sidecar +
    // partitioned snapshot commits
    val root = Files.createTempDirectory("graft_hp_tpl").toString
    val t = SnapshotTable(root, "ns", "ev")
    def batch(lo: Long, hi: Long, day: String) =
      (lo to hi).toDF("id")
        .withColumn("ts", concat(lit(s"$day "), lit("0"), (col("id") % 10).cast("string"),
          lit(":00:00")).cast("timestamp"))
        .withColumn("ts_day", to_date(col("ts")))
    t.overwrite(batch(1, 10, "2024-02-01"), partitionCols = Seq("ts_day"))
    t.append(batch(11, 20, "2024-02-02"), partitionCols = Seq("ts_day"))
    graft.sink.DeclaredPartitionSpec.write(t.root,
      Seq(graft.template.PartitionField("ts", "day")))
    val q = t.read(spark).filter(col("ts") >= lit("2024-02-02 00:00:00").cast("timestamp"))
    // range-stats sidecars already dir-skip the first COMMIT; the
    // hidden-partition rule additionally proves the ts_day predicate,
    // visible in the optimized filter
    assert(q.count() == 10L)
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("ts_day"),
      s"expected a derived ts_day conjunct in:\n$optimized")
  }

  test("partition evolution: each epoch prunes with its own transform") {
    val wh = freshCatalog("evolve")
    spark.sql(
      "CREATE TABLE graft.ns.pe (id BIGINT, ts TIMESTAMP) PARTITIONED BY (days(ts))")
    spark.sql(
      """INSERT INTO graft.ns.pe VALUES
        |  (1, TIMESTAMP '2024-01-01 10:00:00'),
        |  (2, TIMESTAMP '2024-01-02 11:00:00')""".stripMargin)
    // evolve day(ts) -> month(ts): metadata-only, future writes only
    val t = SnapshotTable(wh, "ns", "pe")
    t.updatePartitionSpec(Seq(graft.template.PartitionField("ts", "month")))
    // the derived ts_day column materialized into the table schema with
    // epoch 1; post-evolution inserts supply it (NULL — the new layout
    // no longer derives it, matching the null backfill old dirs get for
    // ts_month)
    spark.sql(
      """INSERT INTO graft.ns.pe VALUES
        |  (3, TIMESTAMP '2024-02-05 09:00:00', NULL),
        |  (4, TIMESTAMP '2024-03-06 09:00:00', NULL)""".stripMargin)
    // mixed layout on disk: epoch 1 kept ts_day dirs, epoch 2 wrote ts_month
    val layouts = t.currentSnapshot.get.dataDirs.flatMap(d =>
      Option(new java.io.File(d).list()).getOrElse(Array.empty[String])
        .filter(_.contains("=")).map(_.split("=")(0))).distinct.sorted
    assert(layouts == Seq("ts_day", "ts_month"), s"got $layouts")
    // cross-epoch read is complete
    assert(spark.sql("SELECT id FROM graft.ns.pe").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // an epoch-1 window prunes to 1 of 2 day partitions; the month
    // epoch's derived conjunct (ts_month = '2024-01') prunes it to zero
    val q1 = spark.sql(
      """SELECT id FROM graft.ns.pe
        |WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-03 00:00:00'""".stripMargin)
    assert(q1.as[Long].collect().toSeq == Seq(2L))
    assert(partDirs(q1) == 1, s"expected 1 planned partition, got ${partDirs(q1)}")
    // an epoch-2 window strictly inside February prunes to 1 of 2 month
    // partitions (an upper bound ON a month boundary keeps that month —
    // month(v) <= derives, not <); day epoch prunes to zero
    val q2 = spark.sql(
      """SELECT id FROM graft.ns.pe
        |WHERE ts >= TIMESTAMP '2024-02-01 00:00:00'
        |  AND ts < TIMESTAMP '2024-02-20 00:00:00'""".stripMargin)
    assert(q2.as[Long].collect().toSeq == Seq(3L))
    assert(partDirs(q2) == 1, s"expected 1 planned partition, got ${partDirs(q2)}")
    // superseded spec is archived, current spec is the new one
    assert(graft.sink.DeclaredPartitionSpec.read(wh + "/ns.pe")
      .map(_.transform) == Seq("month"))
    assert(graft.sink.DeclaredPartitionSpec.readAll(wh + "/ns.pe")
      .map(_.transform).sorted == Seq("day", "month"))
    // compaction migrates the day epoch into the evolved month layout:
    // one replace snapshot, every dir month-partitioned, rows intact
    t.compact(spark)
    val migrated = t.currentSnapshot.get.dataDirs.flatMap(d =>
      Option(new java.io.File(d).list()).getOrElse(Array.empty[String])
        .filter(_.contains("=")).map(_.split("=")(0))).distinct
    assert(migrated == Seq("ts_month"), s"expected month-only layout, got $migrated")
    assert(spark.sql("SELECT id FROM graft.ns.pe").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L, 3L, 4L))
    // post-migration pruning serves the ENTIRE table via month dirs
    val q3 = spark.sql(
      """SELECT id FROM graft.ns.pe
        |WHERE ts >= TIMESTAMP '2024-01-01 00:00:00'
        |  AND ts < TIMESTAMP '2024-01-20 00:00:00'""".stripMargin)
    assert(q3.as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    assert(partDirs(q3) == 1, s"expected 1 month partition, got ${partDirs(q3)}")
  }

  test("no declared spec, no rewrite: external partitioned data untouched") {
    val dir = Files.createTempDirectory("graft_hp_ext").toString
    Seq((1L, "2024-01-01"), (2L, "2024-01-02")).toDF("id", "d")
      .withColumn("day", col("d").cast("date"))
      .write.partitionBy("day").parquet(s"$dir/t")
    val df = spark.read.parquet(s"$dir/t").filter(col("id") > 0L)
    assert(df.count() == 2L)
    assert(!df.queryExecution.optimizedPlan.toString.contains("day >="))
  }
}
