package graft.drift

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-DISTRIBUTION drift: compare per-group statistics of a metric
  * column between two table slices (e.g. this week vs last week). The
  * reference's drift surface is schema-only
  * (`dagster/lakehouse/utils/schema_drift.py`); production lakehouse
  * monitoring also needs the values watched — a silently shifting mean
  * breaks downstream consumers with the schema fully intact.
  *
  * Determinism contract (oracle parity): the mean is an EXACT
  * DECIMAL(18,6) sum followed by one double division, rounded to 6 dp —
  * a plain double sum is partition-order-dependent and would flake
  * against a sequential-fold oracle. Each profile is a single
  * aggregation pass; the comparison joins two bounded per-group
  * profiles (rows = group cardinality, not table size).
  */
object DataDrift {

  /** Per-group profile of `valueCol`: row count, null count, exact mean. */
  def profile(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.groupBy(col(groupCol)).agg(
      count(lit(1)).as("n"),
      sum(when(col(valueCol).isNull, 1L).otherwise(0L)).as("null_count"),
      (round(sum(col(valueCol).cast("decimal(18,6)")).cast("double") /
        count(col(valueCol)), 6) + lit(0.0)).as("mean"))

  /** Drift report between a baseline slice and a current slice: groups
    * present in BOTH, with relative mean delta and a threshold flag.
    */
  def compare(
      baseline: DataFrame, current: DataFrame,
      groupCol: String, valueCol: String,
      relThreshold: Double): DataFrame = {
    val b = profile(baseline, groupCol, valueCol)
      .select(col(groupCol), col("n").as("base_n"), col("mean").as("base_mean"))
    val c = profile(current, groupCol, valueCol)
      .select(col(groupCol), col("n").as("cur_n"), col("mean").as("cur_mean"))
    b.join(c, groupCol)
      .withColumn("rel_delta",
        round(abs(col("cur_mean") - col("base_mean")) / abs(col("base_mean")), 6))
      .withColumn("drifted", col("rel_delta") > relThreshold)
  }
}
