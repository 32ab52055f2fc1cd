package graft.patterns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type 2 dimension maintenance — the reference's declared merge
  * semantics (`dagster/lakehouse/assets/dimensions.py:19-33`):
  *   1. load source records,
  *   2. compare with existing dimension rows on `natural_key`,
  *   3. close old versions (set `effective_to`, `is_current = false`),
  *   4. insert new/changed versions (`effective_from = now`,
  *      `is_current = true`).
  * Column model per `table-templates/scd_type2.yaml:31-48`.
  *
  * Scale notes: one equi-join on `natural_key` (Catalyst picks
  * broadcast vs shuffle-hash vs sort-merge; with AQE on, a skewed
  * natural_key is split automatically) plus cheap unions — no window over
  * the full dimension is required for a single merge. Invariants
  * (<=1 current row per key, non-overlapping effective ranges) are
  * property-tested in Scd2Spec.
  */
object Scd2 {

  /** `scd2_current_view`: the current slice (`scd_type2.yaml:35-41`). */
  def currentView(dim: DataFrame): DataFrame = dim.filter(col("is_current"))

  /** `scd2_merge`.
    *
    * @param dim         existing dimension (full SCD2 shape: includes
    *                    `natural_key`, `effective_from`, `effective_to`,
    *                    `is_current`, plus attribute columns)
    * @param incoming    change feed: `natural_key` + the same attribute
    *                    columns (no SCD bookkeeping columns)
    * @param trackedCols attribute columns whose change opens a new version
    * @param effectiveAt the merge instant (explicit, never now(), for
    *                    determinism — SURVEY.md §7.4)
    */
  def merge(
      dim: DataFrame,
      incoming: DataFrame,
      trackedCols: Seq[String],
      effectiveAt: Column): DataFrame = {

    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))
    val attrCols = incoming.columns.filterNot(_ == "natural_key").toSeq

    val inc = incoming.select(
      col("natural_key").as("_inc_key") +: attrCols.map(c => col(c).as(s"_inc_$c")): _*)

    // one equi hash join current-vs-incoming on the natural key
    val joined = current.join(inc, current("natural_key") === inc("_inc_key"), "full_outer")

    val matched = joined.filter(col("natural_key").isNotNull && col("_inc_key").isNotNull)
    val changedPred = trackedCols
      .map(c => !(col(c) <=> col(s"_inc_$c")))
      .reduceOption(_ || _)
      .getOrElse(lit(false))

    val dimCols = dim.columns.toSeq

    // (3) close changed current rows
    val closed = matched.filter(changedPred)
      .select(dimCols.map {
        case "effective_to" => effectiveAt.as("effective_to")
        case "is_current"   => lit(false).as("is_current")
        case c              => col(c)
      }: _*)

    // unchanged current rows pass through untouched
    val unchanged = matched.filter(!changedPred).select(dimCols.map(col): _*)

    // current rows absent from the feed also pass through (feed is a delta)
    val absent = joined.filter(col("natural_key").isNotNull && col("_inc_key").isNull)
      .select(dimCols.map(col): _*)

    // (4) open new versions: changed keys + brand-new keys
    def opened(src: DataFrame): DataFrame =
      src.select(dimCols.map {
        case "natural_key"    => col("_inc_key").as("natural_key")
        case "effective_from" => effectiveAt.as("effective_from")
        case "effective_to"   => lit(null).cast("timestamp").as("effective_to")
        case "is_current"     => lit(true).as("is_current")
        case c if attrCols.contains(c) => col(s"_inc_$c").as(c)
        case c                => col(c) // bookkeeping columns not in the feed (surrogate etc.) must be provided by caller via attrCols
      }: _*)

    val openedChanged = opened(matched.filter(changedPred))
    val openedNew = opened(joined.filter(col("natural_key").isNull))

    history
      .unionByName(absent)
      .unionByName(unchanged)
      .unionByName(closed)
      .unionByName(openedChanged)
      .unionByName(openedNew)
  }

  /** `scd2_window_close`: given raw version history (one row per key per
    * version instant), derive `effective_to` and `is_current` with
    * lead() — the window realization of "close old records"
    * (SURVEY.md §2.5). One shuffle on natural_key.
    */
  def windowClose(versions: DataFrame, keyCol: String = "natural_key",
      fromCol: String = "effective_from"): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(fromCol))
    versions
      .withColumn("effective_to", lead(col(fromCol), 1).over(w))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
