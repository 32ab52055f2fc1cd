package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-pass distributed per-key ranking.
  *
  * `row_number() OVER (PARTITION BY key ORDER BY ...)` requires the whole
  * key partition on ONE task, so a low-cardinality key (5 order
  * priorities, a handful of corpus sources) turns a window into a
  * straggler at 100x and an OOM at the 100 TB target. This computes the
  * identical global rank with every task bounded by `table / nParts`:
  *
  *  1. range-partition by (keys ++ order): the global sort order is
  *     spread over `nParts` tasks and partition ids ascend with it;
  *  2. local row_number within (pid, keys) — each window group is
  *     bounded by ONE range partition, never by key cardinality;
  *  3. a tiny per-(pid, keys) count table (nParts x |keys| rows) yields
  *     each group's global offset and key total via a cumulative sum;
  *  4. global rank = local rank + offset, broadcast-joined back.
  *
  * When `order` is a total order (callers tie-break on a unique id), the
  * resulting ranks — and therefore every column derived from them — are
  * IDENTICAL for any `nParts` and any sampled partition boundaries, so
  * `nParts` is purely a parallelism knob.
  *
  * Used by `window_ntile` (ntile/percent_rank closed forms over the
  * global rank) and `sample_interleave` (per-source read positions).
  */
object DistributedRank {

  /** Append `rankCol` (1-based global rank within `keyCols` under
    * `order`) and `totalCol` (the key group's row count) to `df`.
    *
    * @param keyCols rank partition keys, by name (join-back keys)
    * @param order   total-order sort expressions (use .asc/.desc)
    * @param nParts  range partition count — parallelism only, the output
    *                is invariant to it; size so a partition's rows fit
    *                one task (~table rows / nParts)
    */
  def withGlobalRank(
      df: DataFrame,
      keyCols: Seq[String],
      order: Seq[Column],
      nParts: Int,
      rankCol: String = "_rk",
      totalCol: String = "_n"): DataFrame = {
    require(nParts > 0, "nParts must be positive")
    val keys = keyCols.map(col)
    // localCheckpoint (eager) PINS the sampled pid assignment: the
    // local-rank branch and the offsets branch below both consume
    // `arranged`, and range boundaries are sampled per physical exchange —
    // without the cut, column pruning differentiates the two branches
    // (offsets never reads payload columns), each plans its OWN range
    // exchange with independently sampled boundaries, and the joined
    // offsets no longer describe the pids the local ranks were computed
    // in (verified: the un-cut plan really does duplicate the exchange —
    // DistributedRankSpec pins zero range exchanges in the final plan).
    // Cost: one materialization of the table, same order of magnitude as
    // the range shuffle itself; blocks are unreplicated executor storage,
    // the standard trade for an intra-operator temp.
    val arranged = df
      .repartitionByRange(nParts, keys ++ order: _*)
      .withColumn("_drk_pid", spark_partition_id())
      .localCheckpoint()
    val local = arranged.withColumn("_drk_lrk",
      row_number().over(
        Window.partitionBy(col("_drk_pid") +: keys: _*).orderBy(order: _*)))
    val offsets = local
      .groupBy(col("_drk_pid") +: keys: _*).agg(count(lit(1)).as("_drk_cnt"))
      .withColumn("_drk_off", sum(col("_drk_cnt")).over(
        Window.partitionBy(keys: _*).orderBy(col("_drk_pid"))) - col("_drk_cnt"))
      .withColumn(totalCol, sum(col("_drk_cnt")).over(Window.partitionBy(keys: _*)))
      .select(col("_drk_pid") +: keys :+ col("_drk_off") :+ col(totalCol): _*)
    local.join(broadcast(offsets), "_drk_pid" +: keyCols)
      .withColumn(rankCol, col("_drk_lrk") + col("_drk_off"))
      .drop("_drk_pid", "_drk_lrk", "_drk_off")
  }
}
