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
  *    rewrites) stream too, via the batch `readChangelog` dir-diff.
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

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), schema.getOrElse {
      val base = tableOf(parameters).read(sqlContext.sparkSession).schema
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
    new GraftStreamSource(sqlContext, table, resolved, metadataPath, maxDirs,
      isChangelog(parameters))
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
    changelog: Boolean) extends Source {

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
    table.currentSnapshot.map { head =>
      val end = (maxDirsPerTrigger, lastEnd) match {
        case (Some(cap), Some(base)) if head.id > base => cappedEnd(base, head.id, cap)
        case _ => head.id
      }
      advance(end)
      GraftSnapshotOffset(end)
    }

  /** Largest published id in (base, head] whose NEW-dir count vs base
    * stays within `cap` — Iceberg's streaming `max-files-per-micro-batch`
    * role. A single snapshot's delta can't be split, so the first id
    * past base always qualifies even when it alone exceeds the cap.
    */
  private def cappedEnd(base: Long, head: Long, cap: Int): Long = {
    val pubs = table.snapshots.filter(s => !s.staged && s.id > base && s.id <= head)
    if (pubs.isEmpty) head
    else {
      val baseDirs = table.snapshots.find(_.id == base)
        .map(_.dataDirs.toSet).getOrElse(Set.empty[String])
      val within = pubs.filter(_.dataDirs.count(!baseDirs.contains(_)) <= cap)
      if (within.isEmpty) pubs.head.id else within.last.id
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
