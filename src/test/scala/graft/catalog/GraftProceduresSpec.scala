package graft.catalog

import java.nio.file.Files

import graft.SparkSpec
import graft.sink.SnapshotTable
import org.apache.spark.sql.SparkSession

/** SQL stored procedures: `CALL graft.system.<proc>(...)` through the
  * DSv2 ProcedureCatalog — the Iceberg maintenance vocabulary, each
  * call running the same engine primitive as the Scala API and
  * returning its result as rows.
  */
class GraftProceduresSpec extends SparkSpec {

  import spark.implicits._

  private def freshCatalog(key: String): String = {
    val wh = Files.createTempDirectory(s"graft_proc_$key").toString
    spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    wh
  }

  test("expire_snapshots: named args, defaults, expired ids returned as rows") {
    val wh = freshCatalog("expire")
    val t = SnapshotTable(wh, "ns", "e")
    val saved = SnapshotTable.clockMs
    try {
      SnapshotTable.clockMs = () => 1000L
      t.overwrite(Seq((1L, "a")).toDF("id", "v"))
      SnapshotTable.clockMs = () => 2000L
      t.append(Seq((2L, "b")).toDF("id", "v"))
      SnapshotTable.clockMs = () => 3000L
      t.append(Seq((3L, "c")).toDF("id", "v"))
    } finally SnapshotTable.clockMs = saved
    // retain_last => 2 beats the age cutoff for the newest two
    val expired = spark.sql(
      "CALL graft.system.expire_snapshots(`table` => 'ns.e', " +
        "older_than_ms => 999999, retain_last => 2)")
      .as[Long].collect().toSeq
    assert(expired == Seq(1L))
    assert(t.snapshots.map(_.id) == Seq(2L, 3L))
    assert(t.read(spark).count() == 3) // appends carried all rows forward
  }

  test("rollback_to_snapshot and publish_changes run the engine primitives") {
    val wh = freshCatalog("rbpub")
    val t = SnapshotTable(wh, "ns", "r")
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    val row = spark.sql(
      "CALL graft.system.rollback_to_snapshot(`table` => 'ns.r', snapshot_id => 1)")
      .as[(Long, Long)].head()
    assert(row._1 == 2L && row._2 == 3L) // rollback commits NEW history
    assert(t.read(spark).count() == 1)

    val staged = t.stageAppend(Seq((9L, "z")).toDF("id", "v"))
    val pub = spark.sql(
      s"CALL graft.system.publish_changes(`table` => 'ns.r', snapshot_id => ${staged.id})")
      .as[(Long, Long)].head()
    assert(pub._1 == staged.id && pub._2 == 2L)
    assert(t.read(spark).count() == 2)
  }

  test("rewrite_data_files compacts; remove_orphan_files lists removals") {
    val wh = freshCatalog("rw")
    val t = SnapshotTable(wh, "ns", "c")
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    val res = spark.sql("CALL graft.system.rewrite_data_files(`table` => 'ns.c')")
      .as[(Long, Int, Long)].head()
    assert(res._2 == 1 && res._3 == 3L, s"compaction must bin-pack to 1 dir: $res")
    assert(t.read(spark).count() == 3)

    // an unreferenced dir (failed-commit debris) is swept and reported —
    // aged past the recency clamp, which protects in-flight writers'
    // dirs regardless of the caller's cutoff
    val orphan = java.nio.file.Paths.get(t.root, "snap-deadbeef")
    java.nio.file.Files.createDirectories(orphan)
    java.nio.file.Files.write(orphan.resolve("junk.parquet"), Array[Byte](1, 2, 3))
    assert(orphan.toFile.setLastModified(
      System.currentTimeMillis() - 25L * 3600 * 1000))
    val removed = spark.sql(
      "CALL graft.system.remove_orphan_files(`table` => 'ns.c')")
      .as[String].collect().toSeq
    assert(removed.exists(_.contains("snap-deadbeef")), s"got: $removed")
    assert(!java.nio.file.Files.exists(orphan))
  }

  test("refs lifecycle from SQL: create_branch, append, fast_forward, create_tag, drop_ref") {
    val wh = freshCatalog("refs")
    val t = SnapshotTable(wh, "ns", "rf")
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    val br = spark.sql(
      "CALL graft.system.create_branch(`table` => 'ns.rf', branch => 'wip')")
      .as[(String, Long)].head()
    assert(br == ("wip", 1L))
    t.appendToBranch("wip", Seq((2L, "b")).toDF("id", "v"))
    assert(t.read(spark).count() == 1, "branch append stays invisible")
    spark.sql("CALL graft.system.fast_forward(`table` => 'ns.rf', branch => 'wip')")
    assert(t.read(spark).count() == 2)
    val tag = spark.sql(
      "CALL graft.system.create_tag(`table` => 'ns.rf', tag => 'v1')")
      .as[(String, Long)].head()
    assert(tag._1 == "v1" && tag._2 == t.currentSnapshot.get.id)
    assert(spark.sql("SELECT name FROM graft.ns.rf.refs").as[String].collect().toSet ==
      Set("main", "wip", "v1"))
    spark.sql("CALL graft.system.drop_ref(`table` => 'ns.rf', name => 'wip')")
    assert(t.refs.map(_.name) == Seq("v1"))
  }

  test("update_partition_spec evolves the declared layout from SQL") {
    val wh = freshCatalog("uspec")
    val t = SnapshotTable(wh, "ns", "pe")
    t.overwrite(Seq((1L, "2024-01-05 10:00:00"))
      .toDF("id", "ts_s").selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts"))
    val row = spark.sql(
      "CALL graft.system.update_partition_spec(`table` => 'ns.pe', " +
        "spec => 'days(ts), bucket(4, id)')")
      .as[(String, String)].head()
    assert(row == ("none", "days(ts), bucket(4, id)"))
    assert(graft.sink.DeclaredPartitionSpec.read(t.root)
      .map(f => (f.column, f.transform, f.n)) ==
      Seq(("ts", "day", 0), ("id", "bucket", 4)))
    // the next catalog write adopts the new layout
    spark.sql("INSERT INTO graft.ns.pe VALUES (7L, TIMESTAMP '2024-02-01 00:00:00')")
    val newDir = new java.io.File(t.currentSnapshot.get.dataDirs.last)
    val sub = newDir.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
    assert(sub == Seq("ts_day=2024-02-01"), s"got $sub")
    // 'none' unpartitions future writes; bad transforms fail loudly
    spark.sql("CALL graft.system.update_partition_spec(`table` => 'ns.pe', spec => 'none')")
    assert(graft.sink.DeclaredPartitionSpec.read(t.root).isEmpty)
    intercept[Exception] {
      spark.sql("CALL graft.system.update_partition_spec(`table` => 'ns.pe', spec => 'sideways(ts)')")
    }
  }

  test("fast_forward publishes a branch; unknown procedure and table fail loudly") {
    val wh = freshCatalog("ff")
    val t = SnapshotTable(wh, "ns", "b")
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("audit")
    t.appendToBranch("audit", Seq((2L, "b")).toDF("id", "v"))
    val row = spark.sql(
      "CALL graft.system.fast_forward(`table` => 'ns.b', branch => 'audit')")
      .as[(String, Long, Long)].head()
    assert(row._1 == "audit" && row._2 == 1L && row._3 == 2L)
    assert(t.read(spark).count() == 2)

    val e1 = intercept[Exception] {
      spark.sql("CALL graft.system.no_such_proc(`table` => 'ns.b')")
    }
    assert(e1.getMessage.contains("unknown procedure") ||
      Option(e1.getCause).exists(_.getMessage.contains("unknown procedure")),
      s"got: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql("CALL graft.system.rewrite_data_files(`table` => 'ns.missing')")
    }
    assert(e2.getMessage.contains("missing") ||
      Option(e2.getCause).exists(_.getMessage.contains("missing")))
  }
}
