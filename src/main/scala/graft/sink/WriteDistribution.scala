package graft.sink

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** The `write.distribution-mode` table property (Iceberg's write
  * distribution, the sibling of `write.sort.order`): HOW rows shuffle
  * across tasks before a partitioned write — the lever that bounds FILE
  * COUNTS per partition directory at any input layout. At 100 TB this
  * is what keeps a skewed ingest from exploding into tasks × partitions
  * small files that every later scan pays to open.
  *
  *  - `hash` (engine default, matching Iceberg's Spark default for
  *    partitioned tables): cluster by the partition key — each
  *    partition value lands in ONE task ⇒ O(1) files per partition
  *    directory; the trade is a hot partition value becoming one big
  *    task.
  *  - `range`: range-partition by partition key + the declared write
  *    sort order — Spark samples the key distribution, so a HOT
  *    partition value spreads over several roughly equal tasks
  *    (bounded, balanced files) while keys stay clustered; the natural
  *    pair of `write.sort.order`.
  *  - `none`: trust the incoming distribution (the caller pre-arranged
  *    it — e.g. a bucketed upstream); files mirror the input tasks.
  *
  * Validated at DDL time (GraftCatalog.validateOperativeProps — a typo
  * fails the CREATE/ALTER, not a later write); applied at the single
  * choke point every write funnels through (SnapshotTable.commit), so
  * SQL INSERT, CTAS/RTAS, template sinks, DML rewrites, and compaction
  * all honor the declaration.
  */
object WriteDistribution {

  val Key = "write.distribution-mode"

  val Modes: Set[String] = Set("none", "hash", "range")

  /** Parse/validate a declared mode; throws on anything outside the
    * Iceberg vocabulary.
    */
  def parse(value: String): String = {
    val m = value.trim.toLowerCase
    require(Modes.contains(m),
      s"bad $Key '$value' (expected one of: ${Modes.toSeq.sorted.mkString(", ")})")
    m
  }

  /** Cluster `df` for a write per the table's declared mode — `hash`
    * when undeclared (the engine's long-standing behavior, unchanged).
    */
  def cluster(table: SnapshotTable, df: DataFrame,
      partitionCols: Seq[String], sortCols: Seq[Column]): DataFrame =
    table.properties.get(Key).map(parse).getOrElse("hash") match {
      case "none" => df
      case "hash" =>
        if (partitionCols.nonEmpty) df.repartition(partitionCols.map(col): _*)
        else df
      case "range" =>
        val keys = partitionCols.map(col) ++ sortCols
        if (keys.nonEmpty) df.repartitionByRange(keys: _*) else df
    }
}
