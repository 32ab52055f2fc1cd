package graft.drift

import graft.sink.SnapshotTable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Volume anomaly detection from snapshot METADATA alone — the sensor
  * family's third member next to schema drift (structure) and data drift
  * (distribution): each commit's recorded row delta is compared against
  * the trailing mean of the previous `window` deltas; a delta deviating
  * by more than `tolerance × mean` flags. Because commit-time row counts
  * live in the snapshot metadata (the Iceberg `total-records` contract),
  * the sensor costs ZERO data I/O — it is the check a 100 TB pipeline
  * can afford to run after every single commit, catching the
  * half-empty-upstream-delivery class of failure that schema and
  * distribution drift both miss.
  */
object VolumeSensor {

  final case class VolumeCheck(
      snapshot_id: Long,
      rows_added: Long,
      trailing_mean: Option[Double],
      anomalous: Boolean)

  /** Per-published-snapshot volume report. `trailing_mean` is null until
    * `window` prior deltas exist (no verdict on a cold start — an
    * arbitrary first-delta baseline would false-positive every new
    * table). Unknown (-1) row counts disable the sensor for the commits
    * they touch rather than inventing deltas.
    */
  def check(
      spark: SparkSession, table: SnapshotTable,
      window: Int = 3, tolerance: Double = 0.5): DataFrame = {
    require(window > 0, "window must be positive")
    require(tolerance > 0, "tolerance must be positive")
    val pub = table.snapshots.filterNot(_.staged)
    val deltas = pub.zipWithIndex.map { case (s, i) =>
      val prev = if (i == 0) 0L else pub(i - 1).rowCount
      val delta =
        if (s.rowCount < 0 || prev < 0) None
        else Some(s.rowCount - (if (i == 0) 0L else prev))
      (s.id, delta)
    }
    val rows = deltas.zipWithIndex.map { case ((id, delta), i) =>
      val trailing = deltas.slice(math.max(0, i - window), i).map(_._2)
      val mean =
        if (trailing.size < window || trailing.exists(_.isEmpty) || delta.isEmpty) None
        else Some(BigDecimal(trailing.flatten.sum.toDouble / window)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      val anomalous = (delta, mean) match {
        case (Some(d), Some(m)) => math.abs(d - m) > tolerance * math.abs(m)
        case _ => false
      }
      VolumeCheck(id, delta.getOrElse(-1L), mean, anomalous)
    }
    import spark.implicits._
    rows.toDF("snapshot_id", "rows_added", "trailing_mean", "anomalous")
  }
}
