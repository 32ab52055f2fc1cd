package graft.drift

import graft.SparkSpec

class DataDriftSpec extends SparkSpec {

  import spark.implicits._

  test("profile counts nulls and computes the exact mean; compare flags only real drift") {
    val base = Seq(
      ("a", Some(10.0)), ("a", Some(20.0)), ("a", None),
      ("b", Some(5.0)), ("b", Some(5.0))).toDF("g", "v")
    // a: mean 15 -> 30 (rel_delta 1.0, drifted); b: 5 -> 5.1 (0.02, not)
    val cur = Seq(
      ("a", Some(30.0)), ("a", Some(30.0)),
      ("b", Some(5.1)), ("b", Some(5.1))).toDF("g", "v")

    val p = DataDrift.profile(base, "g", "v")
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(p("a") == ((3L, 1L, 15.0)))
    assert(p("b") == ((2L, 0L, 5.0)))

    val d = DataDrift.compare(base, cur, "g", "v", relThreshold = 0.05)
      .collect().map(r => r.getString(0) -> ((r.getDouble(5), r.getBoolean(6)))).toMap
    assert(d("a") == ((1.0, true)))
    assert(d("b") == ((0.02, false)))
  }

  test("a group absent from either slice drops from the report (inner comparison)") {
    val base = Seq(("only_base", 1.0)).toDF("g", "v")
    val cur = Seq(("only_cur", 1.0)).toDF("g", "v")
    assert(DataDrift.compare(base, cur, "g", "v", 0.1).count() == 0)
  }
}
