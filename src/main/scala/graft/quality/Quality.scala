package graft.quality

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality checks — the engine's reification of the reference's Soda
  * check suite (the YAML files under `quality/soda_checks/`) and gate runner
  * (`quality/runner.py:11-79`):
  *
  *  - `row_count > 0`                         (non-empty table)
  *  - `missing_count(col) = 0`                (NOT NULL per column)
  *  - `duplicate_count(col) = 0`              (PK uniqueness)
  *  - `freshness(ts) < threshold`             (now - max(ts) bound)
  *
  * Soda's `duplicate_count` counts rows beyond the first per duplicated
  * value (SURVEY.md §7.4); `freshness` here takes an explicit `asOf`
  * timestamp so checks are deterministic and oracle-expressible.
  *
  * Scale note: a check suite evaluates as ONE multi-aggregate pass
  * (`df.agg(e1, e2, ...)`) — a single scan + single partial/final
  * aggregation regardless of how many checks are declared. Duplicate
  * checks need a distinct-by-key aggregation and are grouped into the same
  * job but a separate (unavoidable) shuffle per key column.
  */
object Quality {

  sealed trait Severity
  case object Fail extends Severity
  case object Warn extends Severity

  final case class Check(
      name: String,
      column: String,
      expr: DataFrame => Column, // aggregate producing the measured value
      pass: Long => Boolean,
      severity: Severity = Fail
  )

  final case class CheckResult(
      check: String,
      column: String,
      value: Long,
      passed: Boolean,
      severity: String
  )

  final case class QualityFailure(table: String, failed: Seq[CheckResult])
      extends RuntimeException(
        s"Quality gate failed for $table: " +
          failed.map(r => s"${r.check}(${r.column})=${r.value}").mkString("; "))

  /** A scan exceeded its wall-clock budget — the structured Failure the
    * reference raises when a Soda subprocess trips its 300 s timeout
    * (`quality/runner.py:49-54`). The running Spark job is cancelled
    * before this is thrown; a hung scan must never wedge the pipeline.
    */
  final case class QualityTimeout(table: String, timeoutSeconds: Long)
      extends RuntimeException(
        s"Quality scan timed out after ${timeoutSeconds}s for $table")

  /** Reference scan budget (`quality/runner.py:49`: `timeout=300`). */
  val DefaultTimeoutSeconds: Long = 300L

  def rowCount(): Check =
    Check("row_count", "*", _ => count(lit(1)), _ > 0)

  def missingCount(column: String): Check =
    Check("missing_count", column, _ => count(lit(1)) - count(col(column)), _ == 0)

  /** Rows beyond the first per duplicated value (Soda semantics). Evaluated
    * via count - countDistinct, which equals sum(cnt-1) over groups with
    * cnt>1 when nulls are absent; nulls are excluded from both sides.
    */
  def duplicateCount(column: String): Check =
    Check(
      "duplicate_count", column,
      _ => count(col(column)) - count_distinct(col(column)),
      _ == 0)

  /** freshness(ts) < maxAgeMs relative to a fixed asOf (epoch ms, UTC). */
  def freshness(column: String, asOfEpochMs: Long, maxAgeMs: Long): Check =
    Check(
      "freshness", column,
      _ => lit(asOfEpochMs) - unix_millis(max(col(column))),
      age => age >= 0 && age < maxAgeMs)

  /** Evaluate a suite in one aggregate pass; returns per-check results.
    * The pass is bounded by `timeoutSeconds` wall-clock (reference:
    * every Soda scan runs under a 300 s subprocess timeout,
    * `quality/runner.py:49-54`): the aggregate runs in its own thread
    * under a Spark job group, and on expiry the job group is CANCELLED
    * (freeing its executors) before the structured [[QualityTimeout]]
    * is raised.
    */
  def evaluate(
      df: DataFrame, checks: Seq[Check],
      table: String = "<unnamed>",
      timeoutSeconds: Long = DefaultTimeoutSeconds): Seq[CheckResult] = {
    require(checks.nonEmpty, "empty check suite")
    require(timeoutSeconds > 0, "timeoutSeconds must be positive")
    val aggs = checks.zipWithIndex.map { case (c, i) => c.expr(df).cast("long").as(s"c$i") }
    val agg = df.agg(aggs.head, aggs.tail: _*)
    val row = headBounded(agg, table, timeoutSeconds)
    checks.zipWithIndex.map { case (c, i) =>
      val v = if (row.isNullAt(i)) 0L else row.getLong(i)
      CheckResult(c.name, c.column, v, c.pass(v),
        c.severity match { case Fail => "fail"; case Warn => "warn" })
    }
  }

  /** Run `df.head()` with a wall-clock bound, cancelling the underlying
    * Spark jobs on expiry.
    */
  private def headBounded(
      df: DataFrame, table: String, timeoutSeconds: Long): org.apache.spark.sql.Row = {
    import java.util.concurrent.{CountDownLatch, FutureTask, TimeUnit, TimeoutException}
    val sc = df.sparkSession.sparkContext
    val group = s"graft-quality-$table-${System.nanoTime()}"
    // closes the startup race: if the timeout fired before the worker had
    // called setJobGroup, cancelJobGroup would target an unset group and
    // the scan's Spark jobs would keep holding executors past the budget
    val groupArmed = new CountDownLatch(1)
    val task = new FutureTask(() => {
      // job-group tags are thread-local: set inside the worker thread so
      // cancellation targets exactly this scan's jobs
      sc.setJobGroup(group, s"quality scan: $table", interruptOnCancel = true)
      groupArmed.countDown()
      try df.head()
      finally sc.clearJobGroup()
    })
    val t = new Thread(task, group)
    t.setDaemon(true)
    t.start()
    try task.get(timeoutSeconds, TimeUnit.SECONDS)
    catch {
      case _: TimeoutException =>
        // wait (briefly) for the group tag before cancelling; if the worker
        // died before tagging there are no jobs to cancel anyway
        groupArmed.await(5, TimeUnit.SECONDS)
        sc.cancelJobGroup(group)
        task.cancel(true)
        throw QualityTimeout(table, timeoutSeconds)
      case e: java.util.concurrent.ExecutionException =>
        throw e.getCause
    }
  }

  /** `quality_gate`: evaluate and throw a structured failure if any
    * fail-severity check fails (warn-severity failures are reported but do
    * not gate), mirroring the reference runner's raise-on-failure with
    * structured metadata (`quality/runner.py:56-79`), under the same
    * 300 s scan budget.
    */
  def gate(
      df: DataFrame, table: String, checks: Seq[Check],
      timeoutSeconds: Long = DefaultTimeoutSeconds): Seq[CheckResult] = {
    val results = evaluate(df, checks, table, timeoutSeconds)
    val hardFailures = results.filter(r => !r.passed && r.severity == "fail")
    if (hardFailures.nonEmpty) throw QualityFailure(table, hardFailures)
    results
  }
}
