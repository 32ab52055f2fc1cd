package graft.sink

import graft.governance.Audit
import graft.template.{PartitionField, SortField, TableTemplate}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Template-driven table writes: pre-write schema check, partition
  * transform derivation, declared sort order, overwrite/append modes —
  * the Spark realization of the reference's `IcebergIOManager.handle_output`
  * (`dagster/lakehouse/resources/iceberg.py:59-105`) plus the declared
  * physical layout (`table-templates/_schema.json:68-95`).
  *
  * Scale notes:
  *  - Partition columns are derived, not stored twice: `day(ts)` becomes a
  *    directory column, so partition pruning on `ts` predicates works the
  *    same way Iceberg hidden partitioning does.
  *  - `sortWithinPartitions` (not global `orderBy`) applies the declared
  *    sort: it clusters data inside each task's output files for row-group
  *    stat skipping WITHOUT a global range-shuffle, which would be a
  *    needless full exchange at 100 TB.
  *  - The pre-write schema check runs on metadata only (no data pass).
  */
object TableSink {

  /** `ts_partition_derive`: the Iceberg partition transform vocabulary as
    * Spark columns (`_schema.json:68-70`,
    * `docs/table-template-reference.md:137-145`).
    */
  def transformColumn(p: PartitionField): (String, Column) = p.transform match {
    case "identity" => (p.column, col(p.column))
    case "year"     => (s"${p.column}_year", year(col(p.column)))
    case "month"    => (s"${p.column}_month", date_format(col(p.column), "yyyy-MM"))
    case "day"      => (s"${p.column}_day", to_date(col(p.column)))
    case "hour"     => (s"${p.column}_hour", date_format(col(p.column), "yyyy-MM-dd-HH"))
    // Iceberg-spec murmur bucket (NOT Spark's hash(): different seed and
    // byte layout — see graft.functions.IcebergBucketHash)
    case "bucket"   => (s"${p.column}_bucket",
      graft.functions.IcebergBucketHash.bucket(p.n, col(p.column)))
    case "truncate" => (s"${p.column}_trunc", substring(col(p.column), 0, p.n))
    case other      => throw new IllegalArgumentException(s"Unknown partition transform: $other")
  }

  def sortColumn(s: SortField): Column = (s.direction, s.nullOrder) match {
    case ("asc", "nulls_first")  => col(s.column).asc_nulls_first
    case ("asc", _)              => col(s.column).asc_nulls_last
    case ("desc", "nulls_first") => col(s.column).desc_nulls_first
    case _                       => col(s.column).desc_nulls_last
  }

  /** `sink_schema_check`: compare incoming columns vs declared schema
    * before any write; on mismatch raise with the sorted column diff, as
    * the reference does on failed writes (`resources/iceberg.py:79-89`).
    */
  def checkSchema(df: DataFrame, declared: StructType, table: String): Unit = {
    val live = declared.fields.map(_.name).toSet
    val incoming = df.columns.toSet
    if (live != incoming) {
      val missing = (live -- incoming).toSeq.sorted
      val extra = (incoming -- live).toSeq.sorted
      throw new IllegalArgumentException(
        s"Schema mismatch writing to $table. " +
          s"Missing columns: ${missing.mkString("[", ", ", "]")}; " +
          s"unexpected columns: ${extra.mkString("[", ", ", "]")}. " +
          s"Declared: ${declared.fields.map(_.name).sorted.mkString(", ")}")
    }
  }

  /** Derive partition columns declared by the template (appended, used only
    * for directory layout).
    */
  def withPartitionColumns(df: DataFrame, template: TableTemplate): (DataFrame, Seq[String]) = {
    val derived = template.partitionSpec.map(transformColumn)
    val out = derived.foldLeft(df) { case (d, (name, c)) =>
      if (d.columns.contains(name)) d else d.withColumn(name, c)
    }
    (out, derived.map(_._1))
  }

  /** Persist the template's transform spec beside the table metadata so
    * the hidden-partitioning read rule can translate source-column
    * predicates into dir-column predicates (idempotent; see
    * [[DeclaredPartitionSpec]]).
    */
  private def declareSpec(template: TableTemplate, table: SnapshotTable): Unit =
    if (template.partitionSpec.nonEmpty)
      try DeclaredPartitionSpec.write(table.root, template.partitionSpec)
      catch { case scala.util.control.NonFatal(_) => () }

  /** `sink_overwrite`: full-refresh atomic overwrite (the reference's only
    * write mode) with schema check, declared partitioning + sort order,
    * audit.
    */
  def overwrite(df: DataFrame, template: TableTemplate, table: SnapshotTable): Snapshot = {
    checkSchema(df, template.schema, table.fullName)
    val (withParts, partCols) = withPartitionColumns(df, template)
    val snap = table.overwrite(withParts, partCols, template.sortOrder.map(sortColumn),
      template.writeFormat, template.commitNumRetries)
    declareSpec(template, table)
    snap
  }

  /** `event_append`: append-only commit (never updates existing rows).
    * `micro = true` for streaming microbatch deliveries — the commit
    * uses the slim stats path (no per-partition stats job).
    */
  def append(df: DataFrame, template: TableTemplate, table: SnapshotTable,
      micro: Boolean = false, summary: Map[String, String] = Map.empty): Snapshot = {
    checkSchema(df, template.schema, table.fullName)
    val (withParts, partCols) = withPartitionColumns(df, template)
    val snap = table.append(withParts, partCols, template.sortOrder.map(sortColumn),
      template.writeFormat, template.commitNumRetries, micro = micro,
      summary = summary)
    declareSpec(template, table)
    snap
  }

  /** Governed idempotent streaming append: schema check + declared
    * partition derivation as [[append]], committed through
    * [[SnapshotTable.appendOnce]] so a re-delivered microbatch (same
    * query id, batch id not beyond the committed watermark) is skipped
    * instead of double-appended — the exactly-once half of the
    * streaming ingest contract.
    */
  def appendOnce(
      df: DataFrame, template: TableTemplate, table: SnapshotTable,
      queryId: String, batchId: Long): Option[Snapshot] = {
    checkSchema(df, template.schema, table.fullName)
    val (withParts, partCols) = withPartitionColumns(df, template)
    val snap = table.appendOnce(queryId, batchId, withParts, partCols,
      template.sortOrder.map(sortColumn), template.writeFormat,
      template.commitNumRetries)
    declareSpec(template, table)
    snap
  }

  /** `wap_publish`, step 1: stage a governed append for audit (schema
    * check + partition derivation as usual; the snapshot is invisible
    * until published).
    */
  def stageAppend(
      df: DataFrame, template: TableTemplate, table: SnapshotTable): Snapshot = {
    checkSchema(df, template.schema, table.fullName)
    val (withParts, partCols) = withPartitionColumns(df, template)
    val snap = table.stageAppend(withParts, partCols, template.sortOrder.map(sortColumn),
      template.writeFormat, template.commitNumRetries)
    declareSpec(template, table)
    snap
  }

  /** `sink_dynamic_overwrite`: replace exactly the (template-derived)
    * partitions present in `df`, leaving the rest of the table untouched
    * — the restatement write mode (Iceberg dynamic overwrite). O(batch)
    * write + metadata masks; no existing data is rewritten.
    */
  def overwritePartitions(
      df: DataFrame, template: TableTemplate, table: SnapshotTable): Snapshot = {
    require(template.partitionSpec.nonEmpty,
      s"Template ${template.name} declares no partition_spec; dynamic partition " +
        "overwrite needs one (use overwrite for full refresh)")
    checkSchema(df, template.schema, table.fullName)
    val (withParts, partCols) = withPartitionColumns(df, template)
    val snap = table.overwritePartitions(withParts, partCols,
      template.sortOrder.map(sortColumn), template.writeFormat, template.commitNumRetries)
    declareSpec(template, table)
    snap
  }

  /** Governed read of a snapshot table: audits `table_read` (row count is
    * NOT computed eagerly at scale; we audit the snapshot id instead — the
    * reference audits rows because its tables are small,
    * `resources/iceberg.py:123-130`).
    */
  def read(spark: SparkSession, table: SnapshotTable, template: TableTemplate): DataFrame = {
    val df = table.read(spark).select(template.columns.map(c => col(c.name)): _*)
    Audit.log(
      "table_read", table.fullName,
      Map("snapshot_id" -> table.currentSnapshot.map(_.id.toString).getOrElse("")))
    graft.governance.AccessControl.maskPii(df, template, spark)
  }

  /** `ddl_create_table`: generate the CREATE TABLE statement a real
    * Iceberg catalog would receive for this template (the engine's
    * equivalent of the Athena named DDL query,
    * `aws/modules/athena/main.tf:26-45`).
    */
  def createTableDdl(t: TableTemplate): String = {
    val cols = t.columns
      .map(c => s"  ${c.name} ${sqlType(c.icebergType)}${if (c.required) " NOT NULL" else ""}")
      .mkString(",\n")
    val parts = t.partitionSpec.map { p =>
      p.transform match {
        case "identity" => p.column
        case "bucket"   => s"bucket(${p.n}, ${p.column})"
        case "truncate" => s"truncate(${p.n}, ${p.column})"
        case tr         => s"${tr}s(${p.column})" // years/months/days/hours
      }
    }
    val props = t.properties.toSeq.sortBy(_._1)
      .map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    s"CREATE TABLE IF NOT EXISTS ${t.fullName} (\n$cols\n)\nUSING iceberg" +
      (if (parts.nonEmpty) s"\nPARTITIONED BY (${parts.mkString(", ")})" else "") +
      (if (props.nonEmpty) s"\nTBLPROPERTIES ($props)" else "")
  }

  private def sqlType(iceberg: String): String = iceberg.toLowerCase match {
    case "long"        => "BIGINT"
    case "timestamptz" => "TIMESTAMP"
    case "timestamp"   => "TIMESTAMP_NTZ"
    case other         => other.toUpperCase
  }
}
