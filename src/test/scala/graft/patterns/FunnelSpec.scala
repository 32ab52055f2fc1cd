package graft.patterns

import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  import spark.implicits._

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  // u1 completes all in order; u2 purchases BEFORE viewing (order must
  // gate the purchase step); u3 only signs up; u4 never signs up but has
  // activity; u5 signs up then adds to cart then purchases (4-step path)
  lazy val events = Seq(
    (1L, "signup", ts(1)), (1L, "view", ts(2)), (1L, "cart", ts(3)), (1L, "purchase", ts(4)),
    (2L, "signup", ts(1)), (2L, "purchase", ts(2)), (2L, "view", ts(3)),
    (3L, "signup", ts(5)),
    (4L, "view", ts(1)), (4L, "purchase", ts(2)),
    (5L, "signup", ts(1)), (5L, "view", ts(2)), (5L, "cart", ts(3)))
    .toDF("user_id", "event_type", "ts")

  private def depths(steps: Seq[String]): Map[Long, Long] =
    Funnel.stepsCompleted(events, steps).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("3-step funnel: order-gated, every active user reported") {
    val d = depths(Seq("signup", "view", "purchase"))
    assert(d == Map(1L -> 3L, 2L -> 2L, 3L -> 1L, 4L -> 0L, 5L -> 2L))
    // u2's purchase precedes the view, so it must NOT count as step 3
  }

  test("2-step funnel is the prefix of the longer one") {
    val d = depths(Seq("signup", "view"))
    assert(d == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 0L, 5L -> 2L))
  }

  test("4-step funnel: only the full in-order path reaches depth 4") {
    val d = depths(Seq("signup", "view", "cart", "purchase"))
    assert(d == Map(1L -> 4L, 2L -> 2L, 3L -> 1L, 4L -> 0L, 5L -> 3L))
  }

  test("single-step funnel degenerates to first-completion flag") {
    val d = depths(Seq("purchase"))
    assert(d == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 1L, 5L -> 0L))
  }
}
