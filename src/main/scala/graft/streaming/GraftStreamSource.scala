package graft.streaming

import graft.sink.SnapshotTable
import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming SOURCE over a [[SnapshotTable]] — the lakehouse
  * CDC tail (Iceberg's Spark streaming read has the same contract:
  * consume an append lineage incrementally, snapshot ids as offsets):
  * {{{
  *   spark.readStream.format("graft-stream")
  *     .option("warehouse", wh).option("table", "ns.events").load()
  * }}}
  * Offsets are PUBLISHED snapshot ids. Batch 0 is the table's state at
  * the stream's first offset; every subsequent batch is
  * `readIncremental(lastOffset, newOffset)` — the dir-set difference, so
  * per-trigger scan I/O is O(delta) regardless of table size (the same
  * bound the batch changelog consumer gets). Meaningful along an
  * append-only lineage, like Iceberg's streaming read: an intervening
  * overwrite surfaces its full rewritten state as that trigger's delta.
  *
  * Options beyond `warehouse`/`table`:
  *  - `maxDirsPerTrigger` — cap the dirs consumed per trigger
  *    (Iceberg's streaming `max-files-per-micro-batch` role): a
  *    catch-up after downtime arrives as bounded batches, surviving
  *    checkpoint restarts;
  *  - `changelog` = true — CDC mode (Delta CDF role): batches carry
  *    `_change_type` ('insert' | 'delete') + `_commit_snapshot_id`,
  *    batch 0 is the initial state as inserts, and row-level DELETES
  *    (equality deletes, dynamic-overwrite masks, copy-on-write
  *    rewrites) stream too, via the batch `readChangelog` dir-diff;
  *  - `branch` — tail a named BRANCH's append chain instead of the
  *    published lineage (offsets walk the ref's parent chain, so rival
  *    published commits never leak into the branch tail): an audit
  *    consumer sees staged branch appends as they land, before any
  *    fast-forward. Append-mode only.
  * Downstream, the engine's existing streaming surface (watermarked
  * windows, dedup, `foreachBatch` governed re-ingest) applies — this
  * source closes the loop: ingest -> table -> incremental consume.
  *
  * Restart semantics: the checkpointed offset must still exist in table
  * history — retention that expires a snapshot the stream has not
  * consumed past invalidates the checkpoint (Iceberg documents the same
  * constraint).
  */
final class GraftStreamSourceProvider extends StreamSourceProvider with DataSourceRegister {

  override def shortName(): String = "graft-stream"

  private def tableOf(parameters: Map[String, String]): SnapshotTable = {
    val wh = parameters.getOrElse("warehouse",
      throw new IllegalArgumentException("graft-stream needs option 'warehouse'"))
    val full = parameters.getOrElse("table",
      throw new IllegalArgumentException("graft-stream needs option 'table' (<ns>.<name>)"))
    val parts = full.split("\\.", 2)
    require(parts.length == 2, s"option 'table' must be <namespace>.<name>, got '$full'")
    SnapshotTable(wh, parts(0), parts(1))
  }

  private def isChangelog(parameters: Map[String, String]): Boolean =
    parameters.exists { case (k, v) =>
      k.equalsIgnoreCase("changelog") && v.equalsIgnoreCase("true")
    }

  private def branchOf(parameters: Map[String, String]): Option[String] =
    parameters.collectFirst {
      case (k, v) if k.equalsIgnoreCase("branch") && v.nonEmpty => v
    }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val t = tableOf(parameters)
      // validated here (sourceSchema runs synchronously at load()) so a
      // bad combination fails at the call site, not inside the stream
      require(branchOf(parameters).isEmpty || !isChangelog(parameters),
        "graft-stream: option 'branch' is append-mode only — changelog=true " +
          "walks the published lineage; fastForward the branch and tail the " +
          "published table for CDC")
      // a branch tail serves the BRANCH head's schema (branches evolve
      // independently of the published table)
      val base = branchOf(parameters)
        .map(b => t.readRef(sqlContext.sparkSession, b).schema)
        .getOrElse(t.read(sqlContext.sparkSession).schema)
      if (isChangelog(parameters))
        base.add("_change_type", org.apache.spark.sql.types.StringType)
          .add("_commit_snapshot_id", org.apache.spark.sql.types.LongType)
      else base
    })

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val table = tableOf(parameters)
    // must resolve to the SAME schema sourceSchema() reported (incl.
    // the changelog columns) — the engine validates batches against it
    val resolved = schema.getOrElse(
      sourceSchema(sqlContext, None, providerName, parameters)._2)
    val ci = parameters.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }
    val maxDirs = ci.get("maxdirspertrigger").map { v =>
      val n = try v.toInt catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft-stream option 'maxDirsPerTrigger' must be a positive integer, got '$v'")
      }
      require(n > 0, s"graft-stream option 'maxDirsPerTrigger' must be positive, got $n")
      n
    }
    val branch = branchOf(parameters)
    // branch tailing consumes the branch's append chain; the changelog
    // dir-diff walks the PUBLISHED lineage, so the two modes don't
    // compose (fast-forward first, then tail the published changelog)
    require(branch.isEmpty || !isChangelog(parameters),
      "graft-stream: option 'branch' is append-mode only — changelog=true " +
        "walks the published lineage; fastForward the branch and tail the " +
        "published table for CDC")
    new GraftStreamSource(sqlContext, table, resolved, metadataPath, maxDirs,
      isChangelog(parameters), branch)
  }
}

/** One snapshot id as a streaming offset (JSON = the id). */
final case class GraftSnapshotOffset(snapshotId: Long) extends Offset {
  override def json: String = snapshotId.toString
}

private final class GraftStreamSource(
    sqlContext: SQLContext,
    table: SnapshotTable,
    override val schema: StructType,
    metadataPath: String,
    maxDirsPerTrigger: Option[Int],
    changelog: Boolean,
    branch: Option[String] = None) extends Source {

  /** The tail's head: the branch ref's target when tailing a branch
    * (staging consumers see branch appends as they land, before any
    * fast-forward), the published head otherwise. A dropped ref fails
    * loudly — silently stalling would read as "no new data".
    */
  private def headSnapshotId: Option[Long] = branch match {
    case Some(b) =>
      Some(table.refs.find(r => r.name == b && r.kind == "branch").map(_.snapshotId)
        .getOrElse(throw new IllegalStateException(
          s"graft-stream tails branch '$b' of ${table.fullName}, but the ref " +
            "no longer exists (dropped?); restart the stream against the " +
            "published table or re-create the branch")))
    case None => table.currentSnapshot.map(_.id)
  }

  /** Snapshots on the consumed lineage in (base, head], ascending: the
    * branch parent chain when tailing a branch (branch commits are
    * staged and interleave with rival ids — list order won't do), the
    * published list otherwise.
    */
  private def lineage(base: Long, head: Long): Seq[graft.sink.Snapshot] = branch match {
    case Some(_) =>
      val byId = table.snapshots.map(s => s.id -> s).toMap
      var acc = List.empty[graft.sink.Snapshot]
      var cur = byId.get(head)
      while (cur.isDefined && cur.get.id > base) {
        acc ::= cur.get
        cur = cur.get.parentId.filter(_ != 0L).flatMap(byId.get)
      }
      acc
    case None =>
      table.snapshots.filter(s => !s.staged && s.id > base && s.id <= head)
  }

  private def idOf(o: Offset): Long = o match {
    case GraftSnapshotOffset(id) => id
    case other                   => other.json.trim.toLong // SerializedOffset after restart
  }

  // The rate limiter's base: the last END offset this source offered or
  // served. In-memory for the running query; mirrored to a tiny file
  // under the stream's checkpoint dir so a RESTARTED query that was
  // capped keeps arriving in bounded batches instead of one giant
  // catch-up delta (the V1 Source API never tells a source its
  // committed position before asking for the next offset — the same
  // reason FileStreamSource keeps its own metadata log).
  private var lastEnd: Option[Long] = readPersisted()

  // metadataPath arrives as a URI string ("file:/ckpt/sources/0");
  // treating it as a filesystem path would silently create a literal
  // "file:" directory under the working dir. Non-file schemes get no
  // mirror (the cap still works in-memory for the running query).
  private val persistDir: Option[java.nio.file.Path] = {
    val uri = try new java.net.URI(metadataPath) catch { case _: Exception => null }
    if (uri == null) Some(java.nio.file.Paths.get(metadataPath))
    else uri.getScheme match {
      case null   => Some(java.nio.file.Paths.get(metadataPath))
      case "file" => Some(java.nio.file.Paths.get(uri.getPath))
      case _      => None
    }
  }

  private def persistPath = persistDir.map(_.resolve("graft-last-end"))

  private def readPersisted(): Option[Long] =
    try persistPath.filter(java.nio.file.Files.exists(_)).map(p =>
      new String(java.nio.file.Files.readAllBytes(p),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong)
    catch { case scala.util.control.NonFatal(_) => None }

  private def advance(id: Long): Unit =
    if (!lastEnd.exists(_ >= id)) {
      lastEnd = Some(id)
      try persistPath.foreach { p =>
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p,
          id.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      } catch { case scala.util.control.NonFatal(_) => () }
    }

  override def getOffset: Option[Offset] =
    headSnapshotId.map { headId =>
      val end = (maxDirsPerTrigger, lastEnd) match {
        case (Some(cap), Some(base)) if headId > base => cappedEnd(base, headId, cap)
        case _ => headId
      }
      advance(end)
      GraftSnapshotOffset(end)
    }

  /** Largest lineage id in (base, head] whose NEW-dir count vs base
    * stays within `cap` — Iceberg's streaming `max-files-per-micro-batch`
    * role. A single snapshot's delta can't be split, so the first id
    * past base always qualifies even when it alone exceeds the cap.
    */
  private def cappedEnd(base: Long, head: Long, cap: Int): Long = {
    val line = lineage(base, head)
    if (line.isEmpty) head
    else {
      val baseDirs = table.snapshots.find(_.id == base)
        .map(_.dataDirs.toSet).getOrElse(Set.empty[String])
      val within = line.filter(_.dataDirs.count(!baseDirs.contains(_)) <= cap)
      if (within.isEmpty) line.head.id else within.last.id
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val spark = sqlContext.sparkSession
    val toId = idOf(end)
    advance(toId)
    // the checkpointed range must still exist in table history — both
    // ends (batch-0 replay after restart reads `end` directly)
    def requireLive(id: Long): Unit =
      if (!table.snapshots.exists(_.id == id))
        throw new IllegalStateException(
          s"graft-stream checkpoint references snapshot $id of ${table.fullName}, " +
            "which is no longer in table history (expired by retention_expire or " +
            "rolled back). The stream cannot resume from an expired snapshot: " +
            "restart with a fresh checkpoint location, or keep retention wider " +
            "than the stream's maximum downtime (Iceberg documents the same " +
            "constraint for its streaming reads)")
    val df = start match {
      // first batch: the table's full state at the starting offset
      // (changelog mode stamps it as inserts — Delta CDF's
      // startingVersion contract)
      case None =>
        requireLive(toId)
        val base = table.readSnapshot(spark, toId)
        if (changelog)
          base.withColumn("_change_type", org.apache.spark.sql.functions.lit("insert"))
            .withColumn("_commit_snapshot_id", org.apache.spark.sql.functions.lit(toId))
        else base
      // steady state: exactly the dirs added in (from, to] — O(delta);
      // changelog mode surfaces row-level deletes too (equality
      // deletes, dynamic-overwrite masks, COW rewrites) via the same
      // dir-diff walk the batch changelog uses
      case Some(s) =>
        val fromId = idOf(s)
        requireLive(fromId)
        if (changelog) table.readChangelog(spark, fromId = fromId, toId = toId)
        else table.readIncremental(spark, fromId = fromId, toId = toId)
    }
    // pin the source schema across mid-stream evolution: columns added
    // after stream start are not surfaced (restart to pick them up)
    val pinned = df.select(
      schema.fieldNames.toSeq.map(org.apache.spark.sql.functions.col): _*)
    // microbatch contract: the returned frame must be streaming-marked
    org.apache.spark.sql.GraftStreamShim.asStreamingFrame(pinned)
  }

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()

  override def toString: String = s"GraftStreamSource[${table.fullName}]"
}
