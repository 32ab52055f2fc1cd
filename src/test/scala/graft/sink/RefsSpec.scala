package graft.sink

import java.io.File
import java.nio.file.Files

import graft.SparkSpec

/** Named refs (Iceberg table refs): branches, tags, fast-forward,
  * cherry-pick, ref-protected retention.
  */
class RefsSpec extends SparkSpec {

  import spark.implicits._

  def freshTable(): SnapshotTable =
    SnapshotTable(Files.createTempDirectory("graft_refs").toString, "ns", "t")

  test("createBranch/createTag/dropRef: listing, create-once, reserved name") {
    val t = freshTable()
    t.overwrite(Seq(1, 2).toDF("v"))
    t.createTag("v1")
    t.createBranch("dev")
    assert(t.refs.map(r => (r.name, r.kind, r.snapshotId)).toSet ==
      Set(("v1", "tag", 1L), ("dev", "branch", 1L)))
    // refs are create-once
    val dup = intercept[IllegalArgumentException](t.createTag("v1"))
    assert(dup.getMessage.contains("already has a ref"))
    // 'main' is the implicit published head, never a stored ref
    val res = intercept[IllegalArgumentException](t.createBranch("main"))
    assert(res.getMessage.contains("reserved"))
    t.dropRef("v1")
    assert(t.refs.map(_.name) == Seq("dev"))
    val gone = intercept[IllegalArgumentException](t.dropRef("v1"))
    assert(gone.getMessage.contains("no ref 'v1'"))
  }

  test("ref creation targets an existing snapshot; empty tables cannot ref") {
    val t = freshTable()
    val empty = intercept[IllegalStateException](t.createTag("v0"))
    assert(empty.getMessage.contains("no published snapshot"))
    t.overwrite(Seq(1).toDF("v"))
    val missing = intercept[NoSuchElementException](t.createTag("vX", at = Some(99L)))
    assert(missing.getMessage.contains("no snapshot 99"))
    t.createTag("v1", at = Some(1L))
    assert(t.refs.head.snapshotId == 1L)
  }

  test("appendToBranch: head stays put, ref advances, branch read sees the delta") {
    val t = freshTable()
    t.overwrite(Seq(1, 2).toDF("v")) // snap 1
    t.createBranch("dev")
    val s2 = t.appendToBranch("dev", Seq(3, 4).toDF("v"))
    assert(s2.staged, "branch snapshots must be invisible to published reads")
    assert(s2.parentId.contains(1L))
    assert(t.currentSnapshot.map(_.id).contains(1L), "published head must not move")
    assert(t.refs.find(_.name == "dev").map(_.snapshotId).contains(s2.id))
    assert(t.read(spark).count() == 2)
    assert(t.readRef(spark, "dev").as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    // second branch append stacks on the first
    t.appendToBranch("dev", Seq(5).toDF("v"))
    assert(t.readRef(spark, "dev").count() == 5)
    assert(t.read(spark).count() == 2)
  }

  test("appendToBranch on a missing branch (or a tag) fails clearly") {
    val t = freshTable()
    t.overwrite(Seq(1).toDF("v"))
    t.createTag("v1")
    val e = intercept[NoSuchElementException](t.appendToBranch("v1", Seq(2).toDF("v")))
    assert(e.getMessage.contains("no branch 'v1'"))
  }

  test("fastForward publishes the branch chain; no-op when already at head") {
    val t = freshTable()
    t.overwrite(Seq(1, 2).toDF("v")) // snap 1
    t.createBranch("dev")
    // ff with branch == head is a no-op
    assert(t.fastForward("dev").id == 1L)
    t.appendToBranch("dev", Seq(3).toDF("v")) // snap 2 (staged)
    t.appendToBranch("dev", Seq(4).toDF("v")) // snap 3 (staged)
    val head = t.fastForward("dev")
    assert(head.id == 3L && !head.staged)
    assert(t.currentSnapshot.map(_.id).contains(3L))
    assert(t.read(spark).as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
    // intermediate branch commit is published history too (time travel)
    assert(t.readSnapshot(spark, 2L).count() == 3)
  }

  test("fastForward refuses a diverged branch (rival rows never dropped)") {
    val t = freshTable()
    t.overwrite(Seq(1).toDF("v")) // snap 1
    t.createBranch("dev")
    t.appendToBranch("dev", Seq(2).toDF("v")) // snap 2 (staged)
    t.append(Seq(9).toDF("v")) // snap 3: head moved past the branch base
    val e = intercept[PublishConflictException](t.fastForward("dev"))
    assert(e.getMessage.contains("advanced"))
    // table unharmed
    assert(t.read(spark).as[Int].collect().sorted.toSeq == Seq(1, 9))
  }

  test("expiry never drops a ref target or its dirs; dropRef releases it") {
    val t = freshTable()
    t.overwrite(Seq(1).toDF("v")) // snap 1 — tagged
    t.createTag("pin")
    t.overwrite(Seq(2).toDF("v")) // snap 2 — unprotected
    t.overwrite(Seq(3).toDF("v")) // snap 3 — current
    val dir1 = t.snapshots.head.dataDirs.head
    val expired = t.expireSnapshots(System.currentTimeMillis() + 60000)
    assert(expired == Seq(2L), s"only the untagged snapshot should expire: $expired")
    assert(new File(dir1).exists, "tagged snapshot's data dir must survive the GC")
    assert(t.readRef(spark, "pin").as[Int].collect().toSeq == Seq(1))
    t.dropRef("pin")
    val expired2 = t.expireSnapshots(System.currentTimeMillis() + 60000)
    assert(expired2 == Seq(1L))
    assert(!new File(dir1).exists, "untagged history should GC after dropRef")
  }

  test("branch heads are expiry-protected like tags") {
    val t = freshTable()
    t.overwrite(Seq(1).toDF("v")) // snap 1
    t.createBranch("dev")
    t.appendToBranch("dev", Seq(2).toDF("v")) // snap 2 (staged, branch head)
    t.overwrite(Seq(3).toDF("v")) // snap 3 — current
    // staged snapshots normally expire; the branch head must not
    val expired = t.expireSnapshots(System.currentTimeMillis() + 60000)
    assert(expired == Seq(1L))
    assert(t.readRef(spark, "dev").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("per-ref retention: max_ref_age_ms ages a ref out with the expiry run") {
    val t = freshTable()
    t.overwrite(Seq(1).toDF("v")) // snap 1 — tagged, tag pre-aged
    t.createTag("ephemeral", maxRefAgeMs = Some(1L))
    t.createTag("durable") // no policy — survives forever
    Thread.sleep(5)
    t.overwrite(Seq(2).toDF("v")) // snap 2 — current
    val expired = t.expireSnapshots(System.currentTimeMillis() + 60000)
    // the aged tag dropped WITH the run; its target (1) then expired
    // unprotected... except 'durable' still pins it
    assert(expired.isEmpty && t.refs.map(_.name) == Seq("durable"),
      s"refs=${t.refs.map(_.name)} expired=$expired")
    t.dropRef("durable")
    assert(t.expireSnapshots(System.currentTimeMillis() + 60000) == Seq(1L))
  }

  test("per-ref retention: min_snapshots_to_keep protects the staged chain prefix") {
    val t = freshTable()
    t.overwrite(Seq(1).toDF("v")) // snap 1 — published base
    t.createBranch("dev", minSnapshotsToKeep = Some(2))
    t.appendToBranch("dev", Seq(2).toDF("v")) // snap 2 — expires (beyond min-keep)
    t.appendToBranch("dev", Seq(3).toDF("v")) // snap 3 — kept (position 1)
    t.appendToBranch("dev", Seq(4).toDF("v")) // snap 4 — kept (head)
    t.overwrite(Seq(9).toDF("v")) // snap 5 — current
    val expired = t.expireSnapshots(System.currentTimeMillis() + 60000)
    assert(expired == Seq(1L, 2L), s"got $expired")
    // the branch head still reads back IN FULL: snapshots are
    // self-contained, kept snapshots' dirs survived the GC
    assert(t.readRef(spark, "dev").as[Int].collect().sorted.toSeq == Seq(1, 2, 3, 4))
  }

  test("per-ref retention: max_snapshot_age_ms keeps young chain snapshots") {
    val t = freshTable()
    t.overwrite(Seq(1).toDF("v"))
    t.createBranch("dev", maxSnapshotAgeMs = Some(3600000L)) // keep < 1h old
    t.appendToBranch("dev", Seq(2).toDF("v")) // snap 2 — young, kept
    t.appendToBranch("dev", Seq(3).toDF("v")) // snap 3 — head
    t.overwrite(Seq(9).toDF("v")) // snap 4 — current
    // cutoff far future: age alone would expire 1 and 2; the branch
    // policy saves 2 (staged, younger than 1h), main policy expires 1
    val expired = t.expireSnapshots(System.currentTimeMillis() + 7200000L)
    assert(expired == Seq(1L), s"got $expired")
    assert(t.readRef(spark, "dev").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("per-ref retention: fields round-trip refs.json; legacy refs parse policy-free") {
    val t = freshTable()
    t.overwrite(Seq(1).toDF("v"))
    t.createBranch("b", maxRefAgeMs = Some(86400000L),
      minSnapshotsToKeep = Some(5), maxSnapshotAgeMs = Some(3600000L))
    t.createTag("g", maxRefAgeMs = Some(1000L))
    t.createTag("plain")
    val again = new SnapshotTable(t.root, t.fullName).refs
    assert(again.find(_.name == "b").get ==
      TableRef("b", "branch", 1L, Some(86400000L), Some(5), Some(3600000L)))
    assert(again.find(_.name == "g").get == TableRef("g", "tag", 1L, Some(1000L)))
    assert(again.find(_.name == "plain").get == TableRef("plain", "tag", 1L))
    // tags cannot carry branch-only snapshot retention
    intercept[IllegalArgumentException](
      t.createTag("bad", maxRefAgeMs = None).copy(minSnapshotsToKeep = Some(1)))
  }

  test("cherryPick transplants a staged append's delta onto the advanced head") {
    val t = freshTable()
    t.overwrite(Seq(1).toDF("v")) // snap 1
    val staged = t.stageAppend(Seq(2).toDF("v")) // snap 2, parent 1
    t.append(Seq(3).toDF("v")) // snap 3: head moved
    intercept[PublishConflictException](t.publish(staged.id))
    val picked = t.cherryPick(staged.id)
    assert(picked.operation == "cherry_pick" && picked.parentId.contains(3L))
    assert(picked.rowCount == 3L)
    assert(t.read(spark).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("cherryPick rejects non-append-shaped snapshots") {
    val t = freshTable()
    t.overwrite(Seq(1, 2).toDF("v")) // snap 1
    t.overwrite(Seq(9).toDF("v")) // snap 2: overwrite drops snap 1's dirs
    t.append(Seq(10).toDF("v")) // snap 3
    val e = intercept[IllegalArgumentException](t.cherryPick(2L))
    assert(e.getMessage.contains("append-shaped"))
  }

  test("cherryPick of a branch append applies one branch commit to main") {
    val t = freshTable()
    t.overwrite(Seq(1).toDF("v")) // snap 1
    t.createBranch("dev")
    t.appendToBranch("dev", Seq(2).toDF("v")) // snap 2 (staged)
    t.append(Seq(3).toDF("v")) // snap 3: main moved — branch diverged
    val picked = t.cherryPick(2L)
    assert(t.read(spark).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    assert(picked.parentId.contains(3L))
  }

  test("concurrent branch appends conflict on the ref and retry cleanly") {
    val t = freshTable()
    t.overwrite(Seq(0).toDF("v"))
    t.createBranch("dev")
    val threads = (1 to 4).map { i =>
      new Thread(() => { t.appendToBranch("dev", Seq(i).toDF("v")): Unit })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    // all four appends landed on the branch, serialized by the CAS
    assert(t.readRef(spark, "dev").count() == 5)
    assert(t.read(spark).count() == 1)
    // the ref points at the last branch snapshot in the chain
    val headId = t.refs.find(_.name == "dev").get.snapshotId
    assert(t.snapshots.find(_.id == headId).get.rowCount == 5L)
  }

  test("SQL writes route to a branch via spark.graft.write.branch") {
    val wh = Files.createTempDirectory("graft_refs_wap").toString
    val t = SnapshotTable(wh, "ns", "w")
    t.overwrite(Seq(1).toDF("v"))
    t.createBranch("audit")
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    spark.conf.set("spark.graft.write.branch", "audit")
    try {
      spark.sql("INSERT INTO graft.ns.w VALUES (2), (3)")
      // published table untouched; the branch carries the insert
      assert(t.read(spark).as[Int].collect().toSeq == Seq(1))
      assert(t.readRef(spark, "audit").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
      // INSERT OVERWRITE cannot target a branch (append-only)
      val e = intercept[Exception](
        spark.sql("INSERT OVERWRITE graft.ns.w VALUES (9)"))
      assert(e.getMessage.contains("append-only"))
    } finally spark.conf.unset("spark.graft.write.branch")
    // conf cleared: writes land on the published table again
    spark.sql("INSERT INTO graft.ns.w VALUES (4)")
    assert(t.read(spark).as[Int].collect().sorted.toSeq == Seq(1, 4))
  }

  test("expireSnapshots retain_last keeps the newest N regardless of age") {
    val t = freshTable()
    t.overwrite(Seq(1).toDF("v")) // 1
    t.overwrite(Seq(2).toDF("v")) // 2
    t.overwrite(Seq(3).toDF("v")) // 3
    t.overwrite(Seq(4).toDF("v")) // 4
    val expired = t.expireSnapshots(System.currentTimeMillis() + 60000, retainLast = 3)
    assert(expired == Seq(1L), s"retain_last=3 must keep 2,3,4; expired $expired")
    assert(t.snapshots.map(_.id) == Seq(2L, 3L, 4L))
    // rollback window still works on the retained history
    assert(t.readSnapshot(spark, 2L).as[Int].collect().toSeq == Seq(2))
  }

  test("rewriteDeletes pays down only delete-scoped dirs") {
    val t = freshTable()
    t.overwrite((1 to 10).toDF("v")) // dir A
    t.append((11 to 20).toDF("v")) // dir B
    t.deleteWhere(Seq(5, 15).toDF("v"), Seq("v")) // scoped to A+B
    t.append((21 to 30).toDF("v")) // dir C — out of scope
    val before = t.currentSnapshot.get
    assert(before.deletes.nonEmpty)
    val dirC = before.dataDirs.last
    val snap = t.rewriteDeletes(spark)
    assert(snap.deletes.isEmpty)
    assert(snap.dataDirs.contains(dirC), "out-of-scope dir must carry forward")
    assert(snap.dataDirs.size == 2)
    assert(snap.rowCount == 28L)
    assert(t.read(spark).as[Int].collect().sorted.toSeq ==
      ((1 to 30).toSet -- Set(5, 15)).toSeq.sorted)
    // idempotent no-op: same snapshot, no new commit
    assert(t.rewriteDeletes(spark).id == snap.id)
  }

  test("catalog: $refs listing and VERSION AS OF 'ref-name'") {
    val wh = Files.createTempDirectory("graft_refs_cat").toString
    val t = SnapshotTable(wh, "ns", "t")
    t.overwrite(Seq(1, 2).toDF("v"))
    t.createTag("v1")
    t.append(Seq(3).toDF("v"))
    t.createBranch("dev")
    t.appendToBranch("dev", Seq(4).toDF("v"))
    spark.conf.set("spark.sql.catalog.graft", "graft.catalog.GraftCatalog")
    spark.conf.set("spark.sql.catalog.graft.warehouse", wh)
    val refs = spark.sql("SELECT name, type, snapshot_id FROM graft.ns.t.refs")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(refs == Set(("main", "branch", 2L), ("v1", "tag", 1L), ("dev", "branch", 3L)))
    assert(spark.sql("SELECT count(*) FROM graft.ns.t VERSION AS OF 'v1'")
      .head.getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) FROM graft.ns.t VERSION AS OF 'dev'")
      .head.getLong(0) == 4L)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft.ns.t VERSION AS OF 'nope'").collect())
    assert(e.getMessage.contains("ref"))
  }
}
