package graft.plans

import graft.{Queries, SparkSpec}

/** Exchange-count audit for the funnel/retention analytics: the funnel's
  * joins and aggregations all key on user_id, so the physical plan must
  * reuse one user_id hash partitioning rather than re-shuffling per step.
  */
class FunnelPlanCheck extends SparkSpec {
  val dir = "/root/testdata/sf0.001"

  test("funnel re-shuffles events per type-filter but never re-exchanges aggregated sides") {
    val plan = Queries.all("event_funnel").fn(spark, dir).queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    // each of the 4 event-scan legs (signup/view/purchase/distinct-users)
    // shuffles once on user_id; everything above joins co-partitioned.
    // Going above this count means a step re-exchanged an aggregate.
    assert(exchanges.size <= 6, s"funnel plans ${exchanges.size} exchanges:\n$plan")
  }
}
