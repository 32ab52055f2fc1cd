package graft.streaming

import java.nio.file.Files

import graft.SparkSpec
import graft.sink.SnapshotTable

/** The lakehouse CDC tail: a Structured-Streaming source over
  * SnapshotTable with snapshot ids as offsets — initial state, per-append
  * O(delta) microbatches, and checkpoint restart resuming from the last
  * consumed snapshot.
  */
class GraftStreamSourceSpec extends SparkSpec {

  import spark.implicits._

  private def fresh(): (SnapshotTable, String) = {
    val root = Files.createTempDirectory("graft_tail").toString
    (SnapshotTable(root, "ns", "t"), root)
  }

  test("initial state then per-append deltas, one microbatch each") {
    val (t, root) = fresh()
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val q = spark.readStream.format("graft-stream")
      .option("warehouse", root).option("table", "ns.t").load()
      .writeStream.format("memory").queryName("tail_spec_sink")
      .option("checkpointLocation", s"$root/_ckpt").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("tail_spec_sink").count() == 2, "batch 0 = seeded state")
      t.append(Seq((3L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("tail_spec_sink").as[(Long, String)].collect().sorted.toSeq ==
        Seq((1L, "a"), (2L, "b"), (3L, "c")), "batch 1 = the delta only, no re-read")
      t.append(Seq((4L, "d")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("tail_spec_sink").count() == 4)
      // three triggers processed data: initial + two deltas
      assert(q.recentProgress.count(_.numInputRows > 0) == 3,
        q.recentProgress.map(p => p.numInputRows).mkString(","))
    } finally q.stop()
  }

  test("checkpoint restart resumes from the last consumed snapshot (no replay)") {
    val (t, root) = fresh()
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String)]
    def start() = spark.readStream.format("graft-stream")
      .option("warehouse", root).option("table", "ns.t").load()
      .writeStream.option("checkpointLocation", s"$root/_ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.as[(Long, String)].collect()
        got.synchronized { got ++= rows }: Unit
      }.start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(got.synchronized(got.sorted.toSeq) == Seq((1L, "a")))
    // commits land while the stream is DOWN
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    got.synchronized(got.clear())
    val q2 = start()
    try {
      q2.processAllAvailable()
      // resume from the checkpointed snapshot id: both missed appends
      // arrive as ONE catch-up delta, nothing replayed
      assert(got.synchronized(got.sorted.toSeq) == Seq((2L, "b"), (3L, "c")),
        s"got ${got.synchronized(got.toSeq)}")
      t.append(Seq((4L, "d")).toDF("id", "v"))
      q2.processAllAvailable()
      assert(got.synchronized(got.sorted.toSeq) == Seq((2L, "b"), (3L, "c"), (4L, "d")))
    } finally q2.stop()
  }

  test("mid-stream schema evolution is pinned to the source schema") {
    val (t, root) = fresh()
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    val q = spark.readStream.format("graft-stream")
      .option("warehouse", root).option("table", "ns.t").load()
      .writeStream.format("memory").queryName("tail_evo_sink")
      .option("checkpointLocation", s"$root/_ckpt").outputMode("append").start()
    try {
      q.processAllAvailable()
      // a column evolves in mid-stream; the batch projects to the
      // stream's pinned schema instead of crashing the query
      t.append(Seq((2L, "b", 0.5)).toDF("id", "v", "score"))
      q.processAllAvailable()
      assert(spark.table("tail_evo_sink").columns.toSeq == Seq("id", "v"))
      assert(spark.table("tail_evo_sink").count() == 2)
    } finally q.stop()
  }

  test("maxDirsPerTrigger bounds catch-up batches, across a checkpoint restart") {
    val (t, root) = fresh()
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    val batches = scala.collection.mutable.ArrayBuffer.empty[Long]
    def start() = spark.readStream.format("graft-stream")
      .option("warehouse", root).option("table", "ns.t")
      .option("maxDirsPerTrigger", "1").load()
      .writeStream.option("checkpointLocation", s"$root/_ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val n = b.count()
        if (n > 0) batches.synchronized { batches += n }: Unit
      }.start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    assert(batches.synchronized(batches.toSeq) == Seq(1L))
    // FIVE commits land while the stream is down; with the cap each
    // must arrive as its own 1-row microbatch after restart, not one
    // 5-row catch-up delta
    (2L to 6L).foreach(i => t.append(Seq((i, s"v$i")).toDF("id", "v")))
    batches.synchronized(batches.clear())
    val q2 = start()
    try {
      q2.processAllAvailable()
      assert(batches.synchronized(batches.toSeq) == Seq(1L, 1L, 1L, 1L, 1L),
        s"capped catch-up must arrive one dir per trigger, got ${batches.synchronized(batches.toSeq)}")
    } finally q2.stop()
  }

  test("resuming from a retention-expired snapshot fails with a structured error") {
    val (t, root) = fresh()
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    def start() = spark.readStream.format("graft-stream")
      .option("warehouse", root).option("table", "ns.t").load()
      .writeStream.option("checkpointLocation", s"$root/_ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        b.count(): Unit
      }.start()
    val q1 = start()
    try { q1.processAllAvailable() } finally q1.stop()
    // while the stream is down, history moves on AND retention expires
    // every snapshot the checkpoint could resume from
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    t.expireSnapshots(olderThanMs = Long.MaxValue): Unit // retain only the head
    val q2 = start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q2.processAllAvailable()
    }
    try {
      val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
        .map(_.getMessage).mkString(" | ")
      assert(msgs.contains("no longer in table history"),
        s"expected the structured expired-snapshot error, got: $msgs")
    } finally q2.stop()
  }

  test("changelog mode streams row-level deletes too (CDC tail)") {
    val (t, root) = fresh()
    t.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val got = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String)]
    val q = spark.readStream.format("graft-stream")
      .option("warehouse", root).option("table", "ns.t")
      .option("changelog", "true").load()
      .writeStream.option("checkpointLocation", s"$root/_ckpt")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val rows = b.select("id", "v", "_change_type")
          .as[(Long, String, String)].collect()
        got.synchronized { got ++= rows }: Unit
      }.start()
    try {
      q.processAllAvailable()
      // batch 0 = the initial state, stamped as inserts
      assert(got.synchronized(got.sorted.toSeq) ==
        Seq((1L, "a", "insert"), (2L, "b", "insert")))
      got.synchronized(got.clear())
      // a GDPR erasure mid-stream arrives as a DELETE row (full row)
      t.deleteWhere(Seq(1L).toDF("id"), Seq("id"))
      q.processAllAvailable()
      assert(got.synchronized(got.toSeq) == Seq((1L, "a", "delete")))
      got.synchronized(got.clear())
      t.append(Seq((3L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      assert(got.synchronized(got.toSeq) == Seq((3L, "c", "insert")))
    } finally q.stop()
  }

  test("missing options fail fast with actionable messages") {
    val e = intercept[Exception](
      spark.readStream.format("graft-stream").load().writeStream
        .format("noop").start())
    assert(e.getMessage.contains("warehouse") || e.getCause != null)
  }

  test("branch tail consumes the branch chain; rival published commits never leak") {
    val (t, root) = fresh()
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("audit")
    val q = spark.readStream.format("graft-stream")
      .option("warehouse", root).option("table", "ns.t")
      .option("branch", "audit").load()
      .writeStream.format("memory").queryName("branch_tail_sink")
      .option("checkpointLocation", s"$root/_ckpt_b").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("branch_tail_sink").count() == 1, "batch 0 = branch state")
      // a branch append arrives as a delta ...
      t.appendToBranch("audit", Seq((2L, "b")).toDF("id", "v"))
      // ... while a RIVAL published append must NOT leak into the tail
      t.append(Seq((99L, "zz")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("branch_tail_sink").as[(Long, String)].collect().sorted.toSeq ==
        Seq((1L, "a"), (2L, "b")),
        "the branch tail must see only the branch chain")
      t.appendToBranch("audit", Seq((3L, "c")).toDF("id", "v"))
      q.processAllAvailable()
      assert(spark.table("branch_tail_sink").count() == 3)
    } finally q.stop()
  }

  test("branch + changelog do not compose; unknown branch fails loudly") {
    val (t, root) = fresh()
    t.overwrite(Seq((1L, "a")).toDF("id", "v"))
    t.createBranch("dev")
    val e = intercept[Exception](
      spark.readStream.format("graft-stream")
        .option("warehouse", root).option("table", "ns.t")
        .option("branch", "dev").option("changelog", "true").load()
        .writeStream.format("noop").start())
    assert(e.getMessage.contains("append-mode only") ||
      Option(e.getCause).exists(_.getMessage.contains("append-mode only")))
    val e2 = intercept[Exception](
      spark.readStream.format("graft-stream")
        .option("warehouse", root).option("table", "ns.t")
        .option("branch", "nope").load()
        .writeStream.format("noop").start())
    assert(e2.getMessage.contains("nope") ||
      Option(e2.getCause).exists(_.getMessage.contains("nope")))
  }
}
