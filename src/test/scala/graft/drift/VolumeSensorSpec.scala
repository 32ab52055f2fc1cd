package graft.drift

import graft.SparkSpec
import graft.sink.SnapshotTable

class VolumeSensorSpec extends SparkSpec {

  import spark.implicits._

  private def table(): SnapshotTable = SnapshotTable(
    java.nio.file.Files.createTempDirectory("graft_vol").toString, "ns", "t")

  test("flags a delta deviating from the trailing mean; cold start abstains") {
    val t = table()
    t.overwrite((1 to 100).toDF("v"))
    t.append((1 to 110).toDF("v"))
    t.append((1 to 90).toDF("v"))
    t.append((1 to 3).toDF("v")) // the half-delivery
    t.append((1 to 100).toDF("v")) // recovery — but the window now holds the dip
    val rows = VolumeSensor.check(spark, t, window = 3, tolerance = 0.5)
      .select("snapshot_id", "rows_added", "anomalous")
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._2) == Seq(100L, 110L, 90L, 3L, 100L))
    // first `window` commits have no verdict (no invented baseline)
    assert(rows.take(3).forall(!_._3))
    assert(rows(3)._3, "the tiny delta must flag against the ~100 baseline")
    // recovery compares against mean(110, 90, 3) ≈ 67.7 -> within 50%
    assert(!rows(4)._3)
  }

  test("unknown (-1) row counts disable the sensor rather than inventing deltas") {
    val t = table()
    t.overwrite((1 to 10).toDF("v"))
    // simulate pre-rowCount metadata: strip the field from the file (the
    // parser's documented unknown-(-1) fallback)
    val metaPath = java.nio.file.Paths.get(t.root, "metadata.json")
    val json = new String(java.nio.file.Files.readAllBytes(metaPath))
    java.nio.file.Files.write(metaPath,
      json.replaceAll("\"row_count\":-?\\d+,", "").getBytes): Unit
    t.append((1 to 10).toDF("v"))
    val rows = VolumeSensor.check(spark, t, window = 1)
      .select("rows_added", "anomalous").as[(Long, Boolean)].collect().toSeq
    assert(rows.map(_._1).contains(-1L))
    assert(rows.forall(!_._2), "unknown deltas must never flag")
  }

  test("staged snapshots are excluded from the volume history") {
    val t = table()
    t.overwrite((1 to 10).toDF("v"))
    t.stageAppend((1 to 500).toDF("v")): Unit
    val rows = VolumeSensor.check(spark, t).collect()
    assert(rows.length == 1, "staged snapshot must not appear in the report")
  }
}
