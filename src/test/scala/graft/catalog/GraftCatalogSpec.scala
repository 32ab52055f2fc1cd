package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import graft.sink.SnapshotTable
import org.apache.spark.sql.SparkSession

/** The SQL front door: `spark.sql` over the graft DSv2 TableCatalog —
  * reads, VERSION/TIMESTAMP AS OF time travel, INSERT (V1 write
  * fallback), CREATE/ALTER/DROP TABLE DDL, and the extension-less
  * V1Scan fallback path.
  */
class GraftCatalogSpec extends SparkSpec {

  import spark.implicits._

  private def freshCatalog(key: String): String = {
    val wh = Files.createTempDirectory(s"graft_cat_$key").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    wh
  }

  test("SELECT over a snapshot table resolves through the catalog") {
    val wh = freshCatalog("read")
    val t = SnapshotTable(wh, "ns", "people")
    t.overwrite(Seq((1L, "alice"), (2L, "bob")).toDF("id", "name"))
    val rows = spark.sql("SELECT name FROM graft.ns.people WHERE id = 2")
      .as[String].collect().toSeq
    assert(rows == Seq("bob"))
    // the inline rule makes SQL plan EXACTLY like the Scala API: a
    // native file scan, no V1 row-conversion wrapper
    val plan = spark.sql("SELECT name FROM graft.ns.people").queryExecution.executedPlan.toString
    assert(plan.contains("FileScan parquet"), s"expected a native parquet scan:\n$plan")
    assert(!plan.contains("Scan V1FallbackScan"), "must not fall back with extensions on")
  }

  test("VERSION AS OF and TIMESTAMP AS OF resolve through loadTable hooks") {
    val wh = freshCatalog("tt")
    val t = SnapshotTable(wh, "ns", "ev")
    val saved = SnapshotTable.clockMs
    try {
      SnapshotTable.clockMs = () => 1000L
      t.overwrite(Seq((1L, "a")).toDF("id", "v"))
      SnapshotTable.clockMs = () => 2000L
      t.append(Seq((2L, "b")).toDF("id", "v"))
    } finally SnapshotTable.clockMs = saved
    assert(spark.sql("SELECT * FROM graft.ns.ev").count() == 2)
    assert(spark.sql("SELECT * FROM graft.ns.ev VERSION AS OF 1").count() == 1)
    assert(spark.sql(
      "SELECT * FROM graft.ns.ev TIMESTAMP AS OF '1970-01-01 00:00:01.5'").count() == 1)
    assert(spark.sql(
      "SELECT * FROM graft.ns.ev TIMESTAMP AS OF '1970-01-01 00:00:02'").count() == 2)
  }

  test("INSERT INTO / INSERT OVERWRITE go through the snapshot commit protocol") {
    val wh = freshCatalog("ins")
    val t = SnapshotTable(wh, "ns", "sink")
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    spark.sql("INSERT INTO graft.ns.sink VALUES (2L, 'b')")
    assert(spark.sql("SELECT id FROM graft.ns.sink").as[Long].collect().sorted.toSeq ==
      Seq(1L, 2L))
    assert(t.currentSnapshot.get.operation == "append")
    spark.sql("INSERT OVERWRITE graft.ns.sink VALUES (9L, 'z')")
    assert(spark.sql("SELECT id FROM graft.ns.sink").as[Long].collect().toSeq == Seq(9L))
    assert(t.currentSnapshot.get.operation == "overwrite")
    // history is intact: the pre-overwrite state still time-travels
    assert(spark.sql("SELECT * FROM graft.ns.sink VERSION AS OF 2").count() == 2)
  }

  test("CREATE TABLE / ALTER TABLE / DROP TABLE map onto metadata-only commits") {
    val wh = freshCatalog("ddl")
    spark.sql("CREATE TABLE graft.ns.fresh (id BIGINT, name STRING)")
    val t = SnapshotTable(wh, "ns", "fresh")
    assert(t.exists && t.schema.map(_.name) == Seq("id", "name"))
    assert(spark.sql("SELECT * FROM graft.ns.fresh").count() == 0)
    spark.sql("INSERT INTO graft.ns.fresh VALUES (1L, 'a')")
    spark.sql("ALTER TABLE graft.ns.fresh ADD COLUMN score DOUBLE")
    spark.sql("ALTER TABLE graft.ns.fresh RENAME COLUMN name TO full_name")
    assert(spark.sql("SELECT full_name, score FROM graft.ns.fresh").collect().length == 1)
    // type promotion through SQL DDL (int column widened to bigint)
    spark.sql("CREATE TABLE graft.ns.promo (v INT)")
    spark.sql("INSERT INTO graft.ns.promo VALUES (1)")
    spark.sql("ALTER TABLE graft.ns.promo ALTER COLUMN v TYPE BIGINT")
    spark.sql("INSERT INTO graft.ns.promo VALUES (5000000000)")
    assert(spark.sql("SELECT sum(v) FROM graft.ns.promo").as[Long].head() == 5000000001L)
    assert(spark.sql("SHOW TABLES IN graft.ns").count() >= 2)
    spark.sql("DROP TABLE graft.ns.fresh")
    assert(!SnapshotTable(wh, "ns", "fresh").exists)
  }

  test("CREATE TABLE PARTITIONED BY (days(ts)) round-trips into day-dirs and prunes") {
    val wh = freshCatalog("pddl")
    spark.sql(
      "CREATE TABLE graft.ns.pt (id BIGINT, ts TIMESTAMP) PARTITIONED BY (days(ts))")
    spark.sql(
      """INSERT INTO graft.ns.pt VALUES
        |  (1, TIMESTAMP '2024-01-01 10:00:00'),
        |  (2, TIMESTAMP '2024-01-02 11:00:00'),
        |  (3, TIMESTAMP '2024-01-02 12:00:00')""".stripMargin)
    // the declared transform became the physical layout: day directories
    val t = SnapshotTable(wh, "ns", "pt")
    assert(t.partitionColumns == Seq("ts_day"))
    val dayDirs = new java.io.File(t.currentSnapshot.get.dataDirs.head)
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dayDirs == Set("ts_day=2024-01-01", "ts_day=2024-01-02"), dayDirs.toString)
    // and the SQL read PRUNES on the derived column: one of two
    // partition dirs selected at planning
    val q = spark.sql("SELECT id FROM graft.ns.pt WHERE ts_day = DATE '2024-01-01'")
    assert(q.as[Long].collect().toSeq == Seq(1L))
    val parts = q.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.selectedPartitions.partitionCount
    }.sum
    assert(parts == 1, s"expected 1 selected partition dir, got $parts")
    // later INSERTs RE-derive the dir column — a null arriving in the
    // derived slot (full-width VALUES after the first write) never
    // leaks into the layout
    spark.sql("INSERT INTO graft.ns.pt VALUES (4, TIMESTAMP '2024-01-03 09:00:00', NULL)")
    assert(spark.sql("SELECT id FROM graft.ns.pt WHERE ts_day = DATE '2024-01-03'")
      .as[Long].collect().toSeq == Seq(4L))
    // DESCRIBE-visible partitioning reports the declared transform
    val ddl = spark.sql("DESCRIBE TABLE EXTENDED graft.ns.pt").collect().map(_.toString).mkString
    assert(ddl.contains("days(ts)") || ddl.contains("ts_day"), ddl)
  }

  test("self-join of one catalog table keeps sides independent") {
    val wh = freshCatalog("selfjoin")
    SnapshotTable(wh, "ns", "e").overwrite(
      Seq((1L, 10L), (2L, 10L), (3L, 20L)).toDF("id", "grp"))
    val n = spark.sql(
      """SELECT a.id, b.id FROM graft.ns.e a
        |JOIN graft.ns.e b ON a.grp = b.grp AND a.id < b.id""".stripMargin).count()
    assert(n == 1)
  }

  test("writes to a time-travel-pinned table are rejected") {
    val wh = freshCatalog("pinned")
    SnapshotTable(wh, "ns", "p").overwrite(Seq(Tuple1(1L)).toDF("id"))
    val e = intercept[Exception](
      spark.sql("INSERT INTO graft.ns.p VERSION AS OF 1 VALUES (2L)"))
    assert(e != null)
  }

  test("metadata tables serve snapshots/history/partitions with zero data I/O") {
    val wh = freshCatalog("meta")
    val t = SnapshotTable(wh, "ns", "m")
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    val snaps = spark.sql(
      "SELECT snapshot_id, operation, row_count FROM graft.ns.m.snapshots ORDER BY 1")
      .as[(Long, String, Long)].collect().toSeq
    assert(snaps == Seq((1L, "overwrite", 1L), (2L, "append", 2L)))
    assert(spark.sql("SELECT * FROM graft.ns.m.history").count() == 2)
    val parts = spark.sql(
      "SELECT partition_path, row_count FROM graft.ns.m.partitions")
      .as[(String, Long)].collect().toSeq
    assert(parts == Seq(("", 2L)))
    // pure metadata: the listing never opens a data file
    val plan = spark.sql("SELECT * FROM graft.ns.m.snapshots")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan") && !plan.contains("Scan parquet"),
      s"metadata listing scans data files:\n${plan.take(300)}")
    // read-only
    intercept[Exception](spark.sql("INSERT INTO graft.ns.m.snapshots VALUES (3L)"))
    // is_current_ancestor (Iceberg $history): a rollback's parent is its
    // TARGET, so the abandoned lineage drops off the current ancestor chain
    t.rollback(1L)
    val hist = spark.sql(
      "SELECT snapshot_id, is_current_ancestor FROM graft.ns.m.history ORDER BY 1")
      .as[(Long, Boolean)].collect().toSeq
    assert(hist == Seq((1L, true), (2L, false), (3L, true)),
      s"rollback(1) should orphan snapshot 2 from the current lineage: $hist")
  }

  test("$entries lists ADDED/EXISTING/DELETED file lifecycle per commit") {
    val wh = freshCatalog("entries")
    val t = SnapshotTable(wh, "ns", "ent")
    t.overwrite(Seq((1L, "a"), (2L, "a")).toDF("id", "v"))  // snap 1
    t.append(Seq((3L, "b"), (4L, "b")).toDF("id", "v"))     // snap 2
    // fresh append head: snap-1 files EXISTING@1, snap-2 files ADDED@2
    val e2 = spark.sql(
      """SELECT status, snapshot_id, sum(record_count)
        |FROM graft.ns.ent.entries GROUP BY 1, 2 ORDER BY 1""".stripMargin)
      .as[(Int, Long, Long)].collect().toSeq
    assert(e2 == Seq((0, 1L, 2L), (1, 2L, 2L)), s"append head: $e2")
    // a full overwrite retires BOTH live dirs: everything DELETED@3
    // beside the replacement ADDED@3
    t.overwrite(Seq((9L, "z")).toDF("id", "v"))             // snap 3
    val e3 = spark.sql(
      """SELECT status, snapshot_id, sum(record_count)
        |FROM graft.ns.ent.entries GROUP BY 1, 2 ORDER BY 1""".stripMargin)
      .as[(Int, Long, Long)].collect().toSeq
    assert(e3 == Seq((1, 3L, 1L), (2, 3L, 4L)), s"overwrite head: $e3")
  }

  test("TBLPROPERTIES persist, SET/UNSET round-trip, reserved keys refused") {
    val wh = freshCatalog("props")
    spark.sql(
      "CREATE TABLE graft.ns.p (id BIGINT) TBLPROPERTIES ('a.b'='1', 'c'='x')")
    val t = SnapshotTable(wh, "ns", "p")
    assert(t.properties == Map("a.b" -> "1", "c" -> "x"))
    spark.sql("ALTER TABLE graft.ns.p SET TBLPROPERTIES ('c'='y', 'd'='2')")
    spark.sql("ALTER TABLE graft.ns.p UNSET TBLPROPERTIES ('a.b')")
    assert(t.properties == Map("c" -> "y", "d" -> "2"))
    // engine-computed keys overlay on read and are not settable
    val shown = spark.sql("SHOW TBLPROPERTIES graft.ns.p")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // Spark hides the reserved 'provider' key from SHOW; the engine's
    // computed keys and the user keys both surface
    assert(shown("c") == "y" && shown("d") == "2", shown.toString)
    // 'provider' is refused by Spark itself; engine-computed keys Spark
    // does not know about are refused by the catalog
    intercept[Exception](
      spark.sql("ALTER TABLE graft.ns.p SET TBLPROPERTIES ('provider'='mine')"))
    val e = intercept[Exception](
      spark.sql("ALTER TABLE graft.ns.p SET TBLPROPERTIES ('current-snapshot-id'='9')"))
    assert(e.getMessage.contains("engine-managed") ||
      Option(e.getCause).exists(_.getMessage.contains("engine-managed")))
    // survives commits (sidecar is independent of snapshot metadata)
    t.overwrite(Seq(1L).toDF("id"))
    assert(t.properties == Map("c" -> "y", "d" -> "2"))
  }

  test("the files metadata table lists per-file footer stats") {
    val wh = freshCatalog("files")
    val t = SnapshotTable(wh, "ns", "f")
    t.overwrite((1L to 10L).toDF("id"))
    t.append((11L to 20L).toDF("id"))
    val counts = spark.sql("SELECT record_count FROM graft.ns.f.files")
      .as[Long].collect().toSeq
    assert(counts.forall(_ > 0L), counts.toString) // footer counts resolved
    assert(counts.sum == 20L)
    assert(spark.sql("SELECT count(DISTINCT data_dir) FROM graft.ns.f.files")
      .as[Long].head() == 2L)
    val sizes = spark.sql("SELECT size_bytes FROM graft.ns.f.files").as[Long].collect()
    assert(sizes.forall(_ > 0L))
  }

  test("DELETE FROM maps onto merge-on-read equality deletes (no rewrite)") {
    val wh = freshCatalog("del")
    val t = SnapshotTable(wh, "ns", "d")
    t.overwrite(Seq((1L, "a"), (2L, "b"), (3L, "a"), (4L, "c")).toDF("id", "v"))
    val dirsBefore = t.currentSnapshot.get.dataDirs
    spark.sql("DELETE FROM graft.ns.d WHERE id = 2")
    assert(spark.sql("SELECT id FROM graft.ns.d").as[Long].collect().sorted.toSeq ==
      Seq(1L, 3L, 4L))
    // merge-on-read: the data dirs are untouched, a delete file was recorded
    assert(t.currentSnapshot.get.dataDirs == dirsBefore)
    assert(t.currentSnapshot.get.deletes.nonEmpty)
    // IN fans out tuples; composite conjunction keys on both columns
    spark.sql("DELETE FROM graft.ns.d WHERE id IN (3, 4)")
    assert(spark.sql("SELECT id FROM graft.ns.d").as[Long].collect().toSeq == Seq(1L))
    spark.sql("DELETE FROM graft.ns.d WHERE id = 1 AND v = 'zzz'")
    assert(spark.sql("SELECT id FROM graft.ns.d").count() == 1, "non-matching composite key")
    spark.sql("DELETE FROM graft.ns.d WHERE id = 1 AND v = 'a'")
    assert(spark.sql("SELECT id FROM graft.ns.d").count() == 0)
    // non-equality predicates are rejected, not approximated
    intercept[Exception](spark.sql("DELETE FROM graft.ns.d WHERE id > 0"))
  }

  test("DataFrameWriterV2 / spark.table route through the catalog too") {
    val wh = freshCatalog("wtv2")
    SnapshotTable(wh, "ns", "w").overwrite(Seq((1L, "a")).toDF("id", "v"))
    Seq((2L, "b")).toDF("id", "v").writeTo("graft.ns.w").append()
    assert(spark.table("graft.ns.w").count() == 2)
    Seq((9L, "z")).toDF("id", "v").writeTo("graft.ns.w").createOrReplace()
    assert(spark.table("graft.ns.w").as[(Long, String)].collect().toSeq == Seq((9L, "z")))
  }

  test("CTAS routes through the staging catalog: atomic, nothing left on failure") {
    val wh = freshCatalog("ctas")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").createOrReplaceTempView("ctas_src")
    spark.sql("CREATE TABLE graft.ns.ctas_ok AS SELECT * FROM ctas_src")
    val t = SnapshotTable(wh, "ns", "ctas_ok")
    assert(spark.table("graft.ns.ctas_ok").count() == 2)
    // staged-then-published: no staged snapshot survives the commit
    assert(t.snapshots.nonEmpty && !t.snapshots.exists(_.staged))

    // a query that fails DURING the write job (ANSI cast, data-dependent)
    // must leave NO table behind — not a root dir, not metadata
    Seq("1", "x").toDF("v").createOrReplaceTempView("ctas_bad")
    intercept[Exception] {
      spark.sql("CREATE TABLE graft.ns.ctas_fail AS SELECT CAST(v AS INT) i FROM ctas_bad")
    }
    assert(!SnapshotTable(wh, "ns", "ctas_fail").exists, "failed CTAS must not create the table")
    assert(!new java.io.File(s"$wh/ns.ctas_fail").exists(),
      "failed CTAS must not leave a root dir")
  }

  test("REPLACE TABLE AS SELECT is atomic and preserves snapshot history") {
    val wh = freshCatalog("rtas")
    val t = SnapshotTable(wh, "ns", "rt")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val beforeId = t.currentSnapshot.get.id

    Seq((10L, 1.5), (20L, 2.5)).toDF("k", "score").createOrReplaceTempView("rtas_src")
    spark.sql("REPLACE TABLE graft.ns.rt AS SELECT * FROM rtas_src")
    // new schema + data are live
    assert(spark.table("graft.ns.rt").columns.toSeq == Seq("k", "score"))
    assert(spark.sql("SELECT sum(k) FROM graft.ns.rt").as[Long].head() == 30L)
    // history preserved: the pre-replace snapshot still time-travels
    // with its own schema (Iceberg REPLACE contract)
    val old = spark.sql(s"SELECT * FROM graft.ns.rt VERSION AS OF $beforeId")
    assert(old.columns.toSeq == Seq("id", "v") && old.count() == 2)

    // a failing RTAS leaves the table byte-untouched and no staged debris
    val headBefore = t.currentSnapshot.get.id
    Seq("x").toDF("v").createOrReplaceTempView("rtas_bad")
    intercept[Exception] {
      spark.sql("REPLACE TABLE graft.ns.rt AS SELECT CAST(v AS INT) i FROM rtas_bad")
    }
    assert(t.currentSnapshot.get.id == headBefore, "failed RTAS must not advance the head")
    assert(!t.snapshots.exists(_.staged), "failed RTAS must discard its staged snapshot")
    assert(spark.table("graft.ns.rt").columns.toSeq == Seq("k", "score"))
    // REPLACE TABLE on a missing table is an error (CREATE OR REPLACE is not)
    intercept[Exception] {
      spark.sql("REPLACE TABLE graft.ns.rt_missing AS SELECT 1 AS x")
    }
  }

  test("CREATE OR REPLACE TABLE creates when missing, replaces when present") {
    val wh = freshCatalog("corp")
    spark.sql("CREATE OR REPLACE TABLE graft.ns.corp AS SELECT 1L AS id, 'a' AS v")
    assert(spark.table("graft.ns.corp").count() == 1)
    spark.sql("CREATE OR REPLACE TABLE graft.ns.corp AS SELECT 2L AS id")
    assert(spark.table("graft.ns.corp").columns.toSeq == Seq("id"))
    assert(spark.sql("SELECT id FROM graft.ns.corp").as[Long].head() == 2L)
    val t = SnapshotTable(wh, "ns", "corp")
    assert(!t.snapshots.exists(_.staged))
  }

  test("RTAS PARTITIONED BY evolves the declared spec; new layout governs new dirs") {
    val wh = freshCatalog("rtpart")
    val t = SnapshotTable(wh, "ns", "rp")
    t.overwrite(Seq((1L, "2024-01-05 10:00:00"), (2L, "2024-01-06 11:00:00"))
      .toDF("id", "ts_s").selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts"))
    spark.sql("""REPLACE TABLE graft.ns.rp PARTITIONED BY (days(ts)) AS
                |SELECT id, CAST(ts AS TIMESTAMP) AS ts FROM graft.ns.rp""".stripMargin)
    // hidden partitioning: the derived day column landed as the dir layout
    assert(t.partitionColumns == Seq("ts_day"))
    val dirs = new java.io.File(t.currentSnapshot.get.dataDirs.last)
      .listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(dirs == Seq("ts_day=2024-01-05", "ts_day=2024-01-06"))
    // DESCRIBE reports the declared transform
    val desc = spark.sql("DESCRIBE TABLE graft.ns.rp").collect().map(_.toString).mkString
    assert(desc.contains("days(ts)"), s"expected days(ts) in:\n$desc")
  }

  test("write.distribution-mode is operative: none mirrors tasks, hash bounds files; bad DDL fails early") {
    val wh = freshCatalog("wdm")
    spark.sql("""CREATE TABLE graft.ns.wd (id BIGINT, cat STRING)
                |PARTITIONED BY (cat)
                |TBLPROPERTIES ('write.distribution-mode'='none')""".stripMargin)
    // 4-task round-robin source: every task holds both partition values
    (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b")).toDF("id", "cat")
      .repartition(4).createOrReplaceTempView("wd_src")
    val t = SnapshotTable(wh, "ns", "wd")
    def filesIn(p: String): Int = t.currentSnapshot.get.dataDirs.map { d =>
      Option(new java.io.File(s"$d/$p").listFiles())
        .fold(0)(_.count(f => f.isFile && f.getName.endsWith(".parquet")))
    }.sum
    spark.sql("INSERT INTO graft.ns.wd SELECT * FROM wd_src")
    assert(filesIn("cat=a") == 4 && filesIn("cat=b") == 4,
      "mode none must mirror the 4 input tasks into each partition dir")
    spark.sql(
      "ALTER TABLE graft.ns.wd SET TBLPROPERTIES('write.distribution-mode'='hash')")
    spark.sql("INSERT OVERWRITE graft.ns.wd SELECT * FROM wd_src")
    assert(filesIn("cat=a") == 1 && filesIn("cat=b") == 1,
      "mode hash must land exactly one file per partition dir")
    assert(spark.table("graft.ns.wd").count() == 200)
    // a mode outside the Iceberg vocabulary fails the ALTER itself
    val e = intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft.ns.wd SET TBLPROPERTIES('write.distribution-mode'='sideways')")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("write.distribution-mode")), s"got: ${msgs(e)}")
    // ... and fails a CREATE that declares it
    intercept[Exception] {
      spark.sql("""CREATE TABLE graft.ns.wd2 (id BIGINT)
                  |TBLPROPERTIES ('write.distribution-mode'='shuffle')""".stripMargin)
    }
  }

  test("write.sort.order is operative: inserts land sorted; bad DDL fails early") {
    val wh = freshCatalog("wso")
    spark.sql("CREATE TABLE graft.ns.ws (id BIGINT, score DOUBLE)")
    spark.sql(
      "ALTER TABLE graft.ns.ws SET TBLPROPERTIES('write.sort.order'='score DESC')")
    Seq((1L, 1.0), (2L, 9.0), (3L, 5.0)).toDF("id", "score")
      .coalesce(1).createOrReplaceTempView("ws_src")
    spark.sql("INSERT INTO graft.ns.ws SELECT * FROM ws_src")
    val t = SnapshotTable(wh, "ns", "ws")
    val files = t.currentSnapshot.get.dataDirs.flatMap(d =>
      Option(new java.io.File(d).listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
        .filter(f => f.isFile && f.getName.endsWith(".parquet")))
    assert(files.size == 1)
    val scores = spark.read.parquet(files.head.getPath)
      .select($"score").as[Double].collect().toSeq
    assert(scores == Seq(9.0, 5.0, 1.0), "file must be internally sorted DESC")
    // a typo'd direction fails the ALTER itself, not a later write
    intercept[Exception] {
      spark.sql(
        "ALTER TABLE graft.ns.ws SET TBLPROPERTIES('write.sort.order'='score SIDEWAYS')")
    }
    // an unknown column fails the WRITE with an actionable message
    spark.sql(
      "ALTER TABLE graft.ns.ws SET TBLPROPERTIES('write.sort.order'='nope ASC')")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO graft.ns.ws VALUES (4L, 2.0)")
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("unknown column")), s"got: ${msgs(e)}")
    // identifiers resolve case-INSENSITIVELY, like Spark SQL: 'SCORE'
    // declared on a column named 'score' validates and sorts
    spark.sql(
      "ALTER TABLE graft.ns.ws SET TBLPROPERTIES('write.sort.order'='SCORE ASC')")
    spark.sql("INSERT INTO graft.ns.ws VALUES (5L, 0.5)")
    assert(spark.table("graft.ns.ws").count() == 4)
    // the declared order survives MAINTENANCE and DML rewrites: after a
    // compaction and a row-level UPDATE, every rewritten file must still
    // be internally sorted — the property is a contract on the table's
    // files, not on one statement's output
    def allFileScores(): Seq[Seq[Double]] =
      t.currentSnapshot.get.dataDirs.flatMap(d =>
        Option(new java.io.File(d).listFiles()).getOrElse(Array.empty[java.io.File]).toSeq
          .filter(f => f.isFile && f.getName.endsWith(".parquet")))
        .map(f => spark.read.parquet(f.getPath).select($"score").as[Double].collect().toSeq)
    t.compact(spark)
    assert(allFileScores().forall(s => s == s.sorted),
      s"compacted files must keep the declared ASC order: ${allFileScores()}")
    spark.sql("UPDATE graft.ns.ws SET score = score + 0.25 WHERE id = 2")
    assert(allFileScores().forall(s => s == s.sorted),
      s"UPDATE-rewritten files must keep the declared ASC order: ${allFileScores()}")
  }

  test("TRUNCATE TABLE: schema and history survive, commit is metadata-only") {
    val wh = freshCatalog("trunc")
    val t = SnapshotTable(wh, "ns", "tr")
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val preId = t.currentSnapshot.get.id
    spark.sql("TRUNCATE TABLE graft.ns.tr")
    assert(spark.table("graft.ns.tr").count() == 0)
    assert(spark.table("graft.ns.tr").columns.toSeq == Seq("id", "v"))
    // history preserved: pre-truncate state still time-travels
    assert(spark.sql(s"SELECT * FROM graft.ns.tr VERSION AS OF $preId").count() == 2)
    // metadata-only: the truncate snapshot references no dirs
    val head = t.currentSnapshot.get
    assert(head.dataDirs.isEmpty && head.rowCount == 0)
    // the table accepts writes again afterwards
    spark.sql("INSERT INTO graft.ns.tr VALUES (9L, 'z')")
    assert(spark.table("graft.ns.tr").count() == 1)
  }

  test("plain REPLACE TABLE (no AS SELECT) materializes the new empty definition") {
    val wh = freshCatalog("plainrt")
    val t = SnapshotTable(wh, "ns", "pr")
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    val preId = t.currentSnapshot.get.id
    spark.sql("REPLACE TABLE graft.ns.pr (k BIGINT, score DOUBLE)")
    assert(spark.table("graft.ns.pr").columns.toSeq == Seq("k", "score"))
    assert(spark.table("graft.ns.pr").count() == 0)
    // history kept, like RTAS
    assert(spark.sql(s"SELECT * FROM graft.ns.pr VERSION AS OF $preId").count() == 1)
    // CREATE OR REPLACE without AS SELECT works on both arms
    spark.sql("CREATE OR REPLACE TABLE graft.ns.pr2 (x BIGINT)")
    assert(spark.table("graft.ns.pr2").count() == 0)
    spark.sql("CREATE OR REPLACE TABLE graft.ns.pr2 (y STRING)")
    assert(spark.table("graft.ns.pr2").columns.toSeq == Seq("y"))
  }

  test("conflicted RTAS leaves the live table's spec and properties untouched") {
    val wh = freshCatalog("rtconf")
    val t = SnapshotTable(wh, "ns", "cf")
    t.overwrite(Seq((1L, "2024-01-05 10:00:00")).toDF("id", "ts_s")
      .selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts"))
    t.setProperties(Map("owner.team" -> "old-team"))
    // stage a replace with a NEW spec + NEW properties...
    val staged = new GraftStagedTable(t,
      spark.table("graft.ns.cf").schema,
      Seq(graft.template.PartitionField("ts", "day")),
      Map("owner.team" -> "new-team"), replace = true)
    val rel = staged.newWriteBuilder(null).build()
      .asInstanceOf[org.apache.spark.sql.connector.write.V1Write].toInsertableRelation
    rel.insert(spark.table("graft.ns.cf"), false)
    // ...then a rival commit advances the head before the commit
    t.append(Seq((2L, "2024-01-06 10:00:00")).toDF("id", "ts_s")
      .selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts"))
    intercept[graft.sink.PublishConflictException] { staged.commitStagedChanges() }
    // the conflicted REPLACE must not have clobbered the table's metadata
    assert(t.properties == Map("owner.team" -> "old-team"),
      "conflicted RTAS must leave properties untouched")
    assert(graft.sink.DeclaredPartitionSpec.read(t.root).isEmpty,
      "conflicted RTAS must leave the declared spec untouched")
    staged.abortStagedChanges()
    assert(!t.snapshots.exists(_.staged))
    assert(t.read(spark).count() == 2)
  }

  test("CTAS abort never deletes a rival's published commits") {
    val wh = freshCatalog("ctrival")
    val t = SnapshotTable(wh, "ns", "rv")
    val staged = new GraftStagedTable(t,
      Seq((0L, "x")).toDF("id", "v").schema, Nil, Map.empty, replace = false)
    val rel = staged.newWriteBuilder(null).build()
      .asInstanceOf[org.apache.spark.sql.connector.write.V1Write].toInsertableRelation
    rel.insert(Seq((1L, "ours")).toDF("id", "v"), false)
    // a rival legally publishes the same name while our CTAS is in flight
    t.append(Seq((2L, "rival")).toDF("id", "v"))
    staged.abortStagedChanges()
    // the rival's published data must survive; only our stage is gone
    assert(t.exists, "abort must not rm a root containing rival commits")
    assert(t.read(spark).as[(Long, String)].collect().toSeq == Seq((2L, "rival")))
    assert(!t.snapshots.exists(_.staged))
  }

  test("in-flight CTAS is INVISIBLE: no load, no listing, no existence before commit") {
    val wh = freshCatalog("ctinv")
    val t = SnapshotTable(wh, "ns", "inv")
    val staged = new GraftStagedTable(t,
      Seq((0L, "x")).toDF("id", "v").schema, Nil, Map.empty, replace = false)
    val rel = staged.newWriteBuilder(null).build()
      .asInstanceOf[org.apache.spark.sql.connector.write.V1Write].toInsertableRelation
    rel.insert(Seq((1L, "ours")).toDF("id", "v"), false)
    // the data is fully written and staged — and NOTHING is visible:
    // the DSv2 StagedTable contract (no state before commit)
    assert(!spark.catalog.tableExists("graft.ns.inv"))
    intercept[Exception] { spark.table("graft.ns.inv").collect() }
    assert(!spark.sql("SHOW TABLES IN graft.ns").as[(String, String, Boolean)]
      .collect().exists(_._2 == "inv"), "SHOW TABLES must not list an in-flight CTAS")
    staged.commitStagedChanges()
    assert(spark.table("graft.ns.inv").count() == 1)
  }

  test("CTAS loses the create race to a rival that PUBLISHED first; rival untouched") {
    val wh = freshCatalog("ctrace")
    val t = SnapshotTable(wh, "ns", "race")
    val staged = new GraftStagedTable(t,
      Seq((0L, "x")).toDF("id", "v").schema, Nil, Map.empty, replace = false)
    val rel = staged.newWriteBuilder(null).build()
      .asInstanceOf[org.apache.spark.sql.connector.write.V1Write].toInsertableRelation
    rel.insert(Seq((1L, "ours")).toDF("id", "v"), false)
    // a rival plain CREATE wins while our query ran — legal, because our
    // staged state was invisible (t.create tolerates staged-only debris)
    t.create(Seq("k" -> "BIGINT"))
    val err = intercept[IllegalStateException] { staged.commitStagedChanges() }
    assert(err.getMessage.contains("lost the create race"))
    assert(!t.snapshots.exists(_.staged), "losing CTAS must discard its stage")
    assert(t.schema.map(_.name) == Seq("k"), "rival's table must be untouched")
    // Spark aborts a failed staged commit right after: the stage is
    // already discarded — the abort must be a NO-OP, not an error that
    // masks the race, and must not touch the rival's table
    staged.abortStagedChanges()
    assert(t.exists && t.schema.map(_.name) == Seq("k"))
  }

  test("crash debris of an aborted CTAS (staged-only root) does not block CREATE") {
    val wh = freshCatalog("ctdebris")
    val t = SnapshotTable(wh, "ns", "deb")
    val staged = new GraftStagedTable(t,
      Seq((0L, "x")).toDF("id", "v").schema, Nil, Map.empty, replace = false)
    val rel = staged.newWriteBuilder(null).build()
      .asInstanceOf[org.apache.spark.sql.connector.write.V1Write].toInsertableRelation
    rel.insert(Seq((1L, "ours")).toDF("id", "v"), false)
    // simulate a process crash: neither commit nor abort runs. The root
    // holds staged-only metadata — invisible, and a later CTAS of the
    // same name must succeed over the debris.
    spark.sql("CREATE TABLE graft.ns.deb AS SELECT 7L AS id, 'fresh' AS v")
    assert(spark.table("graft.ns.deb").as[(Long, String)].collect().toSeq ==
      Seq((7L, "fresh")))
  }

  test("extension-less sessions still read through the V1Scan fallback") {
    val prevDefault = SparkSession.getDefaultSession
    val prevActive = SparkSession.getActiveSession
    SparkSession.clearDefaultSession()
    SparkSession.clearActiveSession()
    try {
      val bare = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val wh = Files.createTempDirectory("graft_cat_bare").toString
      bare.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
      bare.conf.set("spark.sql.catalog.graft.warehouse", wh)
      import bare.implicits._
      SnapshotTable(wh, "ns", "fb").overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
      val rows = bare.sql("SELECT v FROM graft.ns.fb WHERE id = 1").as[String].collect().toSeq
      assert(rows == Seq("a"))
    } finally {
      prevDefault.foreach(SparkSession.setDefaultSession)
      prevActive.foreach(SparkSession.setActiveSession)
    }
  }
}
