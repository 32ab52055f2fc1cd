package graft.patterns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type 1 dimension maintenance — latest-wins upsert, the historyless
  * sibling of [[Scd2]] (the reference's dimension assets describe both
  * strategies; type 1 "overwrite in place" is the default for
  * non-auditable attributes, `dagster/lakehouse/assets/dimensions.py:19`).
  *
  * Semantics: collapse the change batch to ONE row per key (newest by the
  * caller's ordering — a batch may legitimately carry several versions of
  * a key, e.g. a CDC feed replayed across polls), then merge into the
  * dimension: matched keys take every batch attribute (including
  * legitimate nulls — attribute-wise coalesce would silently resurrect
  * stale values), absent keys pass through, new keys insert.
  *
  * Scale notes: one keyed window over the BATCH (delta-sized, not
  * dimension-sized) plus one equi join on the key — Catalyst picks
  * broadcast for small batches, and AQE splits a skewed key. No window
  * ever runs over the full dimension.
  */
object Scd1 {

  /** `scd1_upsert`.
    *
    * @param dim     existing dimension (key + attribute columns)
    * @param batch   change feed: key + a SUBSET of dim's columns
    * @param keyCol  business key
    * @param orderBy total order within a key, newest LAST — e.g.
    *                `Seq(col("updated_at"))`; the highest row wins.
    *                Must be total for determinism (SURVEY.md §7.4).
    */
  def upsert(
      dim: DataFrame,
      batch: DataFrame,
      keyCol: String,
      orderBy: Seq[Column]): DataFrame = {
    val batchCols = batch.columns.toSeq
    require(batchCols.contains(keyCol), s"batch must carry the key column '$keyCol'")
    val unknown = batchCols.filterNot(dim.columns.contains)
    require(unknown.isEmpty,
      s"batch columns absent from the dimension: ${unknown.mkString(", ")} " +
        "(SCD1 overwrites existing attributes; it never widens the schema)")
    require(orderBy.nonEmpty, "orderBy must impose a total newest-last order per key")

    val w = Window.partitionBy(col(keyCol)).orderBy(orderBy.map(_.desc_nulls_last): _*)
    val latest = batch
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")

    val inc = latest.select(batchCols.map(c => col(c).as(s"_inc_$c")): _*)
    val joined = dim.join(inc, dim(keyCol) === inc(s"_inc_$keyCol"), "full_outer")
    val applied = col(s"_inc_$keyCol").isNotNull
    joined.select(dim.columns.toSeq.map {
      case `keyCol` => coalesce(col(keyCol), col(s"_inc_$keyCol")).as(keyCol)
      case c if batchCols.contains(c) => when(applied, col(s"_inc_$c")).otherwise(col(c)).as(c)
      case c => col(c) // dim-only column: untouched for matches, null for inserts
    }: _*)
  }
}
