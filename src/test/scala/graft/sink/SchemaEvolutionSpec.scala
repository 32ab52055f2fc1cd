package graft.sink

import java.nio.file.Files

import graft.SparkSpec

/** Iceberg-semantics schema evolution on SnapshotTable: per-snapshot
  * schemas with stable field ids, metadata-only add/rename/drop, reads
  * projecting every dir to the snapshot schema (null backfill for
  * columns a dir predates), and — the id discipline's whole point —
  * no resurrection of old data when a dropped name is re-added.
  * Reference: docs/deep-dive.md:49-72 (evolution is a metadata
  * operation), sensors/schema_drift.py:71-82 (live schemas drift).
  */
class SchemaEvolutionSpec extends SparkSpec {

  import spark.implicits._

  def freshTable(): SnapshotTable =
    SnapshotTable(Files.createTempDirectory("graft_evo").toString, "ns", "t")

  test("append with a new column evolves the schema; old rows backfill null") {
    val t = freshTable()
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "name"))
    t.append(Seq((3L, "c", 0.5), (4L, "d", 0.7)).toDF("id", "name", "score"))
    val rows = t.read(spark).select("id", "name", "score")
      .as[(Long, String, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(rows == Seq((1L, "a", None), (2L, "b", None),
      (3L, "c", Some(0.5)), (4L, "d", Some(0.7))))
    // time travel: the pre-evolution snapshot keeps the OLD schema
    assert(t.readSnapshot(spark, 1L).columns.toSeq == Seq("id", "name"))
    assert(t.read(spark).columns.toSeq == Seq("id", "name", "score"))
    // schema metadata: ids stable for carried columns, fresh for the new
    assert(t.schema.map(c => (c.id, c.name)) == Seq((1, "id"), (2, "name"), (3, "score")))
    assert(t.currentSnapshot.get.lastColumnId == 3)
  }

  test("append missing a column keeps it in the schema; the batch backfills null") {
    val t = freshTable()
    t.overwrite(Seq((1L, "a", 10)).toDF("id", "name", "v"))
    t.append(Seq((2L, "b")).toDF("id", "name"))
    val rows = t.read(spark).select("id", "v")
      .as[(Long, Option[Int])].collect().toSeq.sortBy(_._1)
    assert(rows == Seq((1L, Some(10)), (2L, None)))
  }

  test("addColumn is metadata-only: zero data I/O, existing rows read null") {
    val t = freshTable()
    t.overwrite(Seq((1L, "a")).toDF("id", "name"))
    val before = t.currentSnapshot.get
    val snap = t.addColumn(spark, "lang", "STRING")
    assert(snap.operation == "schema")
    assert(snap.dataDirs == before.dataDirs, "schema commit must not touch data")
    assert(snap.rowCount == before.rowCount)
    val rows = t.read(spark).select("id", "lang")
      .as[(Long, Option[String])].collect().toSeq
    assert(rows == Seq((1L, None)))
    // the next append can then fill it
    t.append(Seq((2L, "b", "en")).toDF("id", "name", "lang"))
    assert(t.read(spark).filter($"lang".isNotNull).count() == 1)
    // duplicate add is rejected
    intercept[IllegalArgumentException](t.addColumn(spark, "lang", "STRING"))
    // bad DDL is rejected before committing anything
    intercept[Exception](t.addColumn(spark, "x", "NOT A TYPE"))
    assert(t.schema.map(_.name) == Seq("id", "name", "lang"))
  }

  test("renameColumn is metadata-only; old dirs serve data under the new name") {
    val t = freshTable()
    t.overwrite(Seq((1L, "alice")).toDF("id", "name"))
    t.renameColumn(spark, "name", "full_name")
    assert(t.read(spark).columns.toSeq == Seq("id", "full_name"))
    assert(t.read(spark).select("full_name").as[String].collect().toSeq == Seq("alice"))
    // appends after the rename write the NEW physical name; both resolve
    t.append(Seq((2L, "bob")).toDF("id", "full_name"))
    assert(t.read(spark).select("full_name").as[String].collect().sorted.toSeq ==
      Seq("alice", "bob"))
    // time travel shows the old name before the rename
    assert(t.readSnapshot(spark, 1L).columns.toSeq == Seq("id", "name"))
    // rename to an existing name / of a missing column rejected
    intercept[IllegalArgumentException](t.renameColumn(spark, "id", "full_name"))
    intercept[IllegalArgumentException](t.renameColumn(spark, "ghost", "x"))
  }

  test("dropColumn then re-adding the name does NOT resurrect old data") {
    val t = freshTable()
    t.overwrite(Seq((1L, "secret-1"), (2L, "secret-2")).toDF("id", "payload"))
    t.dropColumn(spark, "payload")
    assert(t.read(spark).columns.toSeq == Seq("id"))
    // re-add the same NAME: fresh field id — the old dir's physical
    // 'payload' column must stay invisible (Iceberg id discipline)
    t.addColumn(spark, "payload", "STRING")
    val rows = t.read(spark).select("id", "payload")
      .as[(Long, Option[String])].collect().toSeq.sortBy(_._1)
    assert(rows == Seq((1L, None), (2L, None)),
      s"dropped data resurrected: $rows")
    // but history is honest: time travel BEFORE the drop still sees it
    assert(t.readSnapshot(spark, 1L).select("payload").as[String]
      .collect().sorted.toSeq == Seq("secret-1", "secret-2"))
    // dropping the last column is rejected
    intercept[IllegalArgumentException] {
      t.dropColumn(spark, "payload"); t.dropColumn(spark, "id")
    }
  }

  test("evolution interplays: partition and delete-key guard rails") {
    val t = freshTable()
    t.overwrite(Seq((1L, "a", "p1"), (2L, "b", "p2")).toDF("id", "u", "part"),
      partitionCols = Seq("part"))
    // partition column: rename and drop both rejected (paths + masks are
    // keyed by name)
    intercept[IllegalArgumentException](t.renameColumn(spark, "part", "bucket"))
    intercept[IllegalArgumentException](t.dropColumn(spark, "part"))
    // active equality-delete key: rename rejected until compacted
    t.deleteWhere(Seq("a").toDF("u"), Seq("u"))
    intercept[IllegalArgumentException](t.renameColumn(spark, "u", "user"))
    t.compact(spark) // applies the delete physically, drops it
    t.renameColumn(spark, "u", "user")
    assert(t.read(spark).select("user").as[String].collect().toSeq == Seq("b"))
  }

  test("schema survives the metadata round-trip and legacy tables evolve on demand") {
    val t = freshTable()
    t.overwrite(Seq((1L, 2.5)).toDF("id", "v"))
    t.addColumn(spark, "tag", "STRING")
    val reloaded = new SnapshotTable(t.root, t.fullName)
    assert(reloaded.schema == Seq(
      TableColumn(1, "id", "BIGINT"), TableColumn(2, "v", "DOUBLE"),
      TableColumn(3, "tag", "STRING")))
    assert(reloaded.currentSnapshot.get.lastColumnId == 3)

    // LEGACY table: metadata written before schema tracking (no cols) —
    // a schema op derives ids from the live schema once, then evolves
    val legacy = freshTable()
    legacy.overwrite(Seq((1L, "x")).toDF("id", "s"))
    val stripped = legacy.snapshots.map(_.copy(cols = Nil, lastColumnId = 0))
    legacy.writeMetadata(stripped)
    assert(legacy.schema.isEmpty)
    legacy.addColumn(spark, "extra", "INT")
    assert(legacy.schema.map(_.name) == Seq("id", "s", "extra"))
    // the pre-upgrade dir has no columns sidecar: by-name resolution
    val rows = legacy.read(spark).select("id", "s", "extra")
      .as[(Long, String, Option[Int])].collect().toSeq
    assert(rows == Seq((1L, "x", None)))
  }

  test("evolved schema flows through incremental reads and compaction") {
    val t = freshTable()
    t.overwrite(Seq((1L, "a")).toDF("id", "name"))
    t.append(Seq((2L, "b", 7)).toDF("id", "name", "n"))
    // incremental delta projected to the TO snapshot's evolved schema
    val delta = t.readIncremental(spark, 1L, 2L)
    assert(delta.columns.toSeq == Seq("id", "name", "n"))
    assert(delta.as[(Long, String, Option[Int])].collect().toSeq == Seq((2L, "b", Some(7))))
    // empty delta carries the evolved schema too
    assert(t.readIncremental(spark, 2L, 2L).columns.toSeq == Seq("id", "name", "n"))
    // compaction materializes the evolved schema physically and keeps ids
    val idsBefore = t.schema.map(c => c.name -> c.id).toMap
    t.compact(spark)
    assert(t.schema.map(c => c.name -> c.id).toMap == idsBefore)
    val rows = t.read(spark).select("id", "n")
      .as[(Long, Option[Int])].collect().toSeq.sortBy(_._1)
    assert(rows == Seq((1L, None), (2L, Some(7))))
  }

  test("staged evolution batches publish cleanly (WAP x evolution)") {
    val t = freshTable()
    t.overwrite(Seq((1L, "a")).toDF("id", "name"))
    val staged = t.stageAppend(Seq((2L, "b", "en")).toDF("id", "name", "lang"))
    // audit sees the evolved candidate; the table does not, yet
    assert(t.readSnapshot(spark, staged.id).columns.toSeq == Seq("id", "name", "lang"))
    assert(t.read(spark).columns.toSeq == Seq("id", "name"))
    t.publish(staged.id): Unit
    assert(t.read(spark).columns.toSeq == Seq("id", "name", "lang"))
  }
}
