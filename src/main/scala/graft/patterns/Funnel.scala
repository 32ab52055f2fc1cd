package graft.patterns

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-step ordered conversion funnel over an event stream
  * (`event_stream` pattern, reference
  * `table-templates/event_stream.yaml:4` — the funnel is the canonical
  * downstream analytic the reference delegates to its SQL engines).
  *
  * Semantics: step i counts only events STRICTLY after the user's
  * first completion of step i-1, so out-of-order events never inflate
  * conversion. Realized as a fold of conditional min-aggregations —
  * one per step — every one keyed on the user column: after the first
  * shuffle puts a user's events on one partition, each subsequent
  * join/agg is co-partitioned, so an N-step funnel costs ONE real
  * exchange of the events table regardless of N
  * (`FunnelPlanCheck` pins this for the registry's 3-step instance).
  */
object Funnel {

  /** Per-user step-completion depth for the ordered `steps` sequence:
    * (user_id, steps_completed), where steps_completed = the longest
    * prefix of `steps` the user completed in order; 0 for users with
    * events but no first-step completion.
    */
  def stepsCompleted(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val stepCols = steps.indices.map(i => s"_t${i + 1}")
    val first = events.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as(stepCols.head))
    val stages = steps.indices.tail.foldLeft(Vector(first)) { (acc, i) =>
      val prevCol = stepCols(i - 1)
      acc :+ events.filter(col("event_type") === steps(i))
        .join(acc.last.select(col("user_id"), col(prevCol)), "user_id")
        .filter(col("ts") > col(prevCol))
        .groupBy(col("user_id")).agg(min(col("ts")).as(stepCols(i)))
    }
    val base = events.select(col("user_id")).distinct()
    val joined = stages.foldLeft(base)((b, s) => b.join(s, Seq("user_id"), "left_outer"))
    // deepest completed step wins: build the when-chain bottom-up so the
    // highest step is the outermost (first-checked) branch
    val completed = stepCols.zipWithIndex.foldLeft(lit(0L): Column) {
      case (els, (c, i)) => when(col(c).isNotNull, lit((i + 1).toLong)).otherwise(els)
    }
    joined.select(col("user_id"), completed.as("steps_completed"))
  }
}
