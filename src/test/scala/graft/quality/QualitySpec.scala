package graft.quality

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  import spark.implicits._

  // event_id 3 duplicated twice, one null user_id, ts in epoch ms
  lazy val df = Seq(
    (1L, Some(10L), 1000L), (2L, Some(20L), 2000L), (3L, None, 3000L),
    (3L, Some(30L), 4000L), (3L, Some(40L), 5000L))
    .toDF("event_id", "user_id", "ms")
    .withColumn("ts", timestamp_millis(col("ms")))

  test("row_count / missing_count / duplicate_count / freshness semantics") {
    val res = Quality.evaluate(df, Seq(
      Quality.rowCount(),
      Quality.missingCount("user_id"),
      Quality.duplicateCount("event_id"),
      Quality.freshness("ts", asOfEpochMs = 6000L, maxAgeMs = 2000L)))
    val byName = res.map(r => (r.check, r.column) -> r).toMap
    assert(byName(("row_count", "*")).value == 5 && byName(("row_count", "*")).passed)
    assert(byName(("missing_count", "user_id")).value == 1)
    assert(!byName(("missing_count", "user_id")).passed)
    // Soda semantics: rows beyond the first per duplicated value = 2
    assert(byName(("duplicate_count", "event_id")).value == 2)
    // age = 6000 - 5000 = 1000 < 2000
    assert(byName(("freshness", "ts")).value == 1000L)
    assert(byName(("freshness", "ts")).passed)
  }

  test("whole suite evaluates as one aggregate pass (single collected row)") {
    // behavioral proxy: evaluate returns consistent results for N checks
    // from one df.agg - verified by plan shape: exactly one Aggregate
    val aggs = Seq(Quality.rowCount(), Quality.missingCount("user_id"))
    val plan = df.agg(
      aggs.head.expr(df).cast("long").as("c0"),
      aggs(1).expr(df).cast("long").as("c1")).queryExecution.optimizedPlan
    val nAggregates = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    assert(nAggregates == 1)
  }

  test("gate throws a structured failure on fail-severity violations") {
    val e = intercept[Quality.QualityFailure] {
      Quality.gate(df, "ns.t", Seq(Quality.duplicateCount("event_id")))
    }
    assert(e.table == "ns.t")
    assert(e.failed.head.check == "duplicate_count")
    assert(e.getMessage.contains("duplicate_count(event_id)=2"))
  }

  test("warn-severity failures report but do not gate") {
    val res = Quality.gate(df, "ns.t",
      Seq(Quality.duplicateCount("event_id").copy(severity = Quality.Warn)))
    assert(res.head.severity == "warn" && !res.head.passed)
  }

  test("freshness fails when data is older than the threshold") {
    val res = Quality.evaluate(df,
      Seq(Quality.freshness("ts", asOfEpochMs = 100000L, maxAgeMs = 2000L)))
    assert(!res.head.passed)
  }

  test("a scan exceeding its wall-clock budget raises a structured timeout, not a hang") {
    // a deliberately slow check (10 s of per-row sleep; UDF is test-only)
    val sleepy = udf((x: Long) => { Thread.sleep(10000L); x })
    val slow = Quality.Check("slow", "event_id", d => max(sleepy(col("event_id"))), _ => true)
    val t0 = System.nanoTime()
    val e = intercept[Quality.QualityTimeout] {
      Quality.gate(df, "ns.t", Seq(slow), timeoutSeconds = 1L)
    }
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(e.table == "ns.t" && e.timeoutSeconds == 1L)
    assert(e.getMessage.contains("timed out after 1s"))
    // raised promptly (scan cancelled), nowhere near the 10 s sleep
    assert(elapsedSec < 8.0, f"timeout not enforced: took $elapsedSec%.1f s")
  }

  test("the default scan budget matches the reference runner's 300 s") {
    assert(Quality.DefaultTimeoutSeconds == 300L)
    // a normal fast suite under the default budget is unaffected
    val res = Quality.gate(df, "ns.t", Seq(Quality.rowCount()))
    assert(res.head.passed)
  }
}
