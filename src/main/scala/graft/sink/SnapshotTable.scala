package graft.sink

import java.io.File
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

import graft.governance.Audit
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-mode snapshot table: the Iceberg-semantics subset the engine
  * needs when no Iceberg catalog is available (this image carries no
  * Iceberg runtime jar — see SURVEY.md §7.4).
  *
  * Reproduces, on a plain filesystem, the reference's table behaviors:
  *  - atomic full-refresh overwrite (`resources/iceberg.py:59-105`) — data
  *    is written to a new immutable snapshot directory and the table's
  *    metadata pointer is swapped atomically (write-temp + atomic move),
  *    mirroring Iceberg's optimistic metadata-swap commit
  *    (`docs/deep-dive.md:66-69`);
  *  - append commits (event_stream pattern) — a new snapshot references the
  *    previous snapshot's directories plus the newly written one, so
  *    appends never rewrite old data (O(delta), not O(table), which is the
  *    property that matters at 100 TB);
  *  - snapshot history + time travel (`SELECT ... FOR SYSTEM_VERSION AS OF`,
  *    reference `aws/modules/athena/main.tf:48-67`);
  *  - snapshot expiration per `history_expire_max_snapshot_age_ms`
  *    (`table-templates/_schema.json:105-107`).
  *
  * Metadata format: one JSON file listing snapshots; each snapshot lists
  * the data directories it is composed of. Directories are immutable once
  * committed.
  */
final case class Snapshot(
    id: Long,
    committedAtMs: Long,
    operation: String, // overwrite | append
    dataDirs: Seq[String],
    format: String = "parquet" // parquet | orc (per _schema.json:100-103)
)

final class SnapshotTable(val root: String, val fullName: String) {

  private def metadataPath = Paths.get(root, "metadata.json")

  def exists: Boolean = Files.exists(metadataPath)

  def snapshots: Seq[Snapshot] =
    if (!exists) Nil
    else parse(new String(Files.readAllBytes(metadataPath), StandardCharsets.UTF_8))

  def currentSnapshot: Option[Snapshot] = snapshots.lastOption

  /** Read the table at its current snapshot. */
  def read(spark: SparkSession): DataFrame = readSnapshot(spark, requireCurrent.id)

  /** Time travel: read the table as of a snapshot id. */
  def readSnapshot(spark: SparkSession, snapshotId: Long): DataFrame = {
    val snap = snapshots.find(_.id == snapshotId).getOrElse(
      throw new NoSuchElementException(
        s"Table $fullName has no snapshot $snapshotId (available: ${snapshots.map(_.id).mkString(", ")})"))
    if (snap.dataDirs.isEmpty) spark.emptyDataFrame
    else
      // one read per committed dir, unioned — multi-root partition
      // discovery would reject sibling partitioned directories
      // (CONFLICTING_DIRECTORY_STRUCTURES), and per-dir reads keep each
      // commit's partition layout independently prunable.
      snap.dataDirs.map(spark.read.format(snap.format).load(_)).reduce(_ unionByName _)
  }

  /** Full-refresh overwrite: write `df` as a brand-new snapshot. */
  def overwrite(df: DataFrame, partitionCols: Seq[String] = Nil, sortCols: Seq[org.apache.spark.sql.Column] = Nil, format: String = "parquet"): Snapshot =
    commit(df, "overwrite", carryPrevious = false, partitionCols, sortCols, format)

  /** Append: new snapshot = previous data dirs + newly written dir. */
  def append(df: DataFrame, partitionCols: Seq[String] = Nil, sortCols: Seq[org.apache.spark.sql.Column] = Nil, format: String = "parquet"): Snapshot =
    commit(df, "append", carryPrevious = true, partitionCols, sortCols, format)

  /** Drop snapshots older than `olderThanMs` (never the current one) and
    * delete data directories no surviving snapshot references.
    */
  def expireSnapshots(olderThanMs: Long): Seq[Long] =
    // same lock as commit(): maintenance must not interleave with an
    // in-flight append's read-modify-write of the metadata pointer
    SnapshotTable.commitLock(root).synchronized { expireLocked(olderThanMs) }

  private def expireLocked(olderThanMs: Long): Seq[Long] = {
    val all = snapshots
    if (all.isEmpty) return Nil
    val current = all.last
    val (expired, kept0) = all.init.partition(_.committedAtMs < olderThanMs)
    val kept = kept0 :+ current
    if (expired.isEmpty) return Nil
    val liveDirs = kept.flatMap(_.dataDirs).toSet
    writeMetadata(kept)
    expired.flatMap(_.dataDirs).distinct.filterNot(liveDirs.contains).foreach { d =>
      deleteRecursively(new File(d))
    }
    expired.map(_.id)
  }

  private def requireCurrent: Snapshot = currentSnapshot.getOrElse(
    throw new RuntimeException(
      s"Table $fullName is not registered in the warehouse. " +
        "Create it first (Pipeline.ensureTable / DDL) before reading or writing - " +
        "the equivalent of the reference's 'run terraform apply' remediation."))

  private def commit(
      df: DataFrame,
      op: String,
      carryPrevious: Boolean,
      partitionCols: Seq[String],
      sortCols: Seq[org.apache.spark.sql.Column],
      format: String): Snapshot =
    // Commit protocol: readers always see a consistent table (the
    // metadata pointer swap below is atomic), and concurrent writers in
    // THIS JVM are serialized per table root so no commit is lost — the
    // previous-state read happens inside the lock. Cross-process writers
    // would need a real catalog's compare-and-swap (Iceberg's optimistic
    // commit); parquet-mode makes no such claim.
    SnapshotTable.commitLock(root).synchronized {
      commitLocked(df, op, carryPrevious, partitionCols, sortCols, format)
    }

  private def commitLocked(
      df: DataFrame,
      op: String,
      carryPrevious: Boolean,
      partitionCols: Seq[String],
      sortCols: Seq[org.apache.spark.sql.Column],
      format: String): Snapshot = {
    // dispatch per the template vocabulary (parquet|orc|avro,
    // `table-templates/_schema.json:100-103`). avro is declared-but-
    // unavailable here: the DataFrame avro source lives in the external
    // spark-avro module, which this distribution does not ship — fail
    // with the remediation instead of a ClassNotFoundException mid-write.
    if (format == "avro")
      throw new IllegalArgumentException(
        s"write_format 'avro' for $fullName requires the spark-avro module on the " +
          "classpath; this distribution ships parquet and orc")
    require(SnapshotTable.SupportedFormats.contains(format),
      s"Unknown write_format '$format' for $fullName " +
        s"(supported: ${SnapshotTable.SupportedFormats.mkString(", ")})")
    val prev = snapshots
    prev.lastOption.filter(_.dataDirs.nonEmpty).foreach { last =>
      if (carryPrevious)
        require(last.format == format,
          s"Append format '$format' differs from table format '${last.format}' for " +
            s"$fullName; carried snapshot dirs must stay one format")
    }
    val carryForward = if (carryPrevious) prev.lastOption.map(_.dataDirs).getOrElse(Nil) else Nil
    val id = prev.map(_.id).maxOption.getOrElse(0L) + 1
    val dataDir = Paths.get(root, f"snap-$id%05d").toString
    // cluster rows by partition value before a partitioned write: without
    // this every task writes a file into every partition directory
    // (tasks x partitions small files — the classic small-file explosion);
    // with it each partition directory gets O(1) files.
    val clustered =
      if (partitionCols.nonEmpty)
        df.repartition(partitionCols.map(org.apache.spark.sql.functions.col): _*)
      else df
    val sorted = if (sortCols.nonEmpty) clustered.sortWithinPartitions(sortCols: _*) else clustered
    val writer = sorted.write.mode("overwrite").format(format)
    (if (partitionCols.nonEmpty) writer.partitionBy(partitionCols: _*) else writer)
      .save(dataDir)
    val snap = Snapshot(id, System.currentTimeMillis(), op, carryForward :+ dataDir, format)
    writeMetadata(prev :+ snap)
    Audit.log("table_write", fullName, Map("operation" -> op, "snapshot_id" -> id.toString))
    snap
  }

  private def writeMetadata(snaps: Seq[Snapshot]): Unit = {
    Files.createDirectories(Paths.get(root))
    val json = snaps.map { s =>
      val dirs = s.dataDirs.map(d => "\"" + d.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
        .mkString("[", ",", "]")
      s"""{"id":${s.id},"committed_at_ms":${s.committedAtMs},"operation":"${s.operation}","format":"${s.format}","data_dirs":$dirs}"""
    }.mkString("[", ",", "]")
    // atomic metadata swap: temp file + atomic move, the commit point.
    val tmp = Paths.get(root, s".metadata.json.tmp-${System.nanoTime()}")
    Files.write(tmp, json.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, metadataPath, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  // Minimal JSON parse for our own fixed-shape metadata (no deps).
  private def parse(json: String): Seq[Snapshot] = {
    // "format" is optional on read: metadata written before the field
    // existed defaults to parquet (the only format back then)
    val snapRe = """\{"id":(\d+),"committed_at_ms":(\d+),"operation":"(\w+)",(?:"format":"(\w+)",)?"data_dirs":\[(.*?)\]\}""".r
    snapRe.findAllMatchIn(json).map { m =>
      val dirs =
        if (m.group(5).isEmpty) Nil
        else m.group(5).split("\",\"").map(_.stripPrefix("\"").stripSuffix("\"")
          .replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
      Snapshot(m.group(1).toLong, m.group(2).toLong, m.group(3), dirs,
        Option(m.group(4)).getOrElse("parquet"))
    }.toSeq
  }

  private def deleteRecursively(f: File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}

object SnapshotTable {

  /** Write formats this engine can materialize (avro is declared by the
    * template vocabulary but needs the external spark-avro module).
    */
  val SupportedFormats: Set[String] = Set("parquet", "orc")

  private val commitLocks = scala.collection.concurrent.TrieMap.empty[String, Object]

  /** One lock object per table root (JVM-wide writer serialization). */
  private[sink] def commitLock(root: String): Object =
    commitLocks.getOrElseUpdate(new java.io.File(root).getAbsolutePath, new Object)

  /** Warehouse layout: `<warehouse>/<namespace>.<name>/`. */
  def apply(warehouse: String, namespace: String, name: String): SnapshotTable =
    new SnapshotTable(Paths.get(warehouse, s"$namespace.$name").toString, s"$namespace.$name")
}
