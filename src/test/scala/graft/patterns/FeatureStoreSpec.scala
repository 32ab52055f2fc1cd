package graft.patterns

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FeatureStoreSpec extends SparkSpec {

  import spark.implicits._

  // features: (entity, ts_ms, value); labels: (label_id, entity, ts_ms)
  lazy val features = Seq(
    ("e1", 1000L, 10.0), ("e1", 2000L, 20.0), ("e1", 3000L, 30.0),
    ("e2", 5000L, 50.0))
    .toDF("entity", "ms", "fval")
    .withColumn("fts", timestamp_millis($"ms")).drop("ms")

  lazy val labels = Seq(
    ("l1", "e1", 2500L), // between features -> picks ts=2000
    ("l2", "e1", 2000L), // exactly at a feature ts -> <= visible
    ("l3", "e1", 500L),  // before any feature -> null
    ("l4", "e2", 9000L), // after last -> picks 5000
    ("l5", "e3", 1000L)) // entity with no features -> null
    .toDF("label_id", "entity", "ms")
    .withColumn("lts", timestamp_millis($"ms")).drop("ms")

  test("as-of join picks the latest feature at or before each label ts") {
    val out = FeatureStore.asofJoin(labels, features,
      entityCol = "entity", labelTsCol = "lts", featureTsCol = "fts")
      .select($"label_id", $"fval").as[(String, Option[Double])]
      .collect().toMap
    assert(out("l1").contains(20.0))
    assert(out("l2").contains(20.0)) // <= semantics: equal ts visible
    assert(out("l3").isEmpty)
    assert(out("l4").contains(50.0))
    assert(out("l5").isEmpty)
  }

  test("a newer feature row with a null value shadows older non-null values") {
    // point-in-time semantics: the as-of row is the LATEST row <= label
    // ts, including its nulls — per-column carry would resurrect t1's 10.0
    val f = Seq(("e1", 1000L, Some(10.0)), ("e1", 2000L, None))
      .toDF("entity", "ms", "fval")
      .withColumn("fts", timestamp_millis($"ms")).drop("ms")
    val l = Seq(("l1", "e1", 3000L)).toDF("label_id", "entity", "ms")
      .withColumn("lts", timestamp_millis($"ms")).drop("ms")
    val out = FeatureStore.asofJoin(l, f, "entity", "lts", "fts")
      .select($"label_id", unix_millis($"fts"), $"fval")
      .as[(String, Long, Option[Double])].head()
    assert(out == (("l1", 2000L, None)))
  }

  test("as-of join plans exactly one shuffle (no range-join explosion)") {
    val out = FeatureStore.asofJoin(labels, features, "entity", "lts", "fts")
    val exchanges = out.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges <= 2) // union sides co-partitioned; no join node at all
    assert(!out.queryExecution.executedPlan.toString().contains("CartesianProduct"))
    assert(!out.queryExecution.executedPlan.toString().contains("BroadcastNestedLoop"))
  }

  test("materialize produces the feature_table shape") {
    val facts = Seq(("u1", 1000L, 5.0), ("u1", 2000L, 7.0), ("u2", 1500L, 1.0))
      .toDF("uid", "ms", "v")
      .withColumn("ts", timestamp_millis($"ms")).drop("ms")
    val out = FeatureStore.materialize(
      facts, "uid", "ts", "fs1", "m1", timestamp_millis(lit(99000L)),
      Map("sum_v" -> sum($"v"), "n" -> count(lit(1))))
    val row = out.filter($"entity_id" === "u1").head()
    assert(row.getAs[Long]("n") == 2L)
    assert(row.getAs[Double]("sum_v") == 12.0)
    assert(row.getAs[java.sql.Timestamp]("feature_timestamp").getTime == 2000L)
    assert(out.columns.contains("feature_set") && out.columns.contains("model_version"))
  }
}
