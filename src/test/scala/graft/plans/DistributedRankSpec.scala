package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class DistributedRankSpec extends SparkSpec {

  import spark.implicits._

  test("equals the monolithic window formulation for seeded random data at any nParts") {
    val rnd = new scala.util.Random(42)
    // heavy ties in v (unique id tie-break), skewed 4-key distribution
    val rows = (1 to 500).map { i =>
      (i.toLong, s"k${math.min(rnd.nextInt(5), rnd.nextInt(5))}", rnd.nextInt(40))
    }
    val df = rows.toDF("id", "key", "v")
    val expected = df
      .withColumn("rk", row_number().over(
        Window.partitionBy("key").orderBy(col("v").asc, col("id").asc)).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("key")))
      .select("id", "rk", "n")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    for (nParts <- Seq(1, 3, 32, 97)) {
      val got = DistributedRank.withGlobalRank(
          df, Seq("key"), Seq(col("v").asc, col("id").asc), nParts)
        .select("id", "_rk", "_n")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      assert(got == expected, s"rank mismatch at nParts=$nParts")
    }
  }

  test("pid assignment is pinned: no range exchange survives into the final plan") {
    // Rank correctness requires both join branches to observe the SAME
    // _drk_pid assignment. Range boundaries are sampled per physical
    // exchange, and column pruning DOES differentiate the branches when
    // the table has a payload column the offsets side never reads
    // (observed: each branch planned its own independently sampled range
    // exchange — inconsistent pids, corrupt ranks, invisible at test
    // scale where the sample covers all rows). The eager localCheckpoint
    // inside withGlobalRank pins the assignment as DATA; pin here that
    // the final plan therefore contains ZERO range exchanges (both
    // branches scan the checkpointed RDD).
    val conf = spark.conf
    val prevAqe = conf.get("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (1 to 200).map(i => (i.toLong, s"k${i % 3}", i % 7, s"payload-$i"))
        .toDF("id", "key", "v", "payload")
      val plan = DistributedRank.withGlobalRank(
          df, Seq("key"), Seq(col("v").asc, col("id").asc), 8)
        .queryExecution.executedPlan
      val rangeExchanges = plan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
            if e.outputPartitioning.isInstanceOf[
              org.apache.spark.sql.catalyst.plans.physical.RangePartitioning] => e
      }
      assert(rangeExchanges.isEmpty,
        s"range exchange in the final plan means pid can be re-sampled per branch:\n$plan")
    } finally conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("ranks with a pruned-payload column are correct at any nParts") {
    // the divergence scenario end-to-end: payload flows through the rank
    // while the offsets branch never reads it
    val rnd = new scala.util.Random(7)
    val rows = (1 to 300).map { i =>
      (i.toLong, s"k${rnd.nextInt(3)}", rnd.nextInt(10), s"payload-$i")
    }
    val df = rows.toDF("id", "key", "v", "payload")
    val expected = df
      .withColumn("rk", row_number().over(
        Window.partitionBy("key").orderBy(col("v").asc, col("id").asc)).cast("long"))
      .select("id", "rk", "payload")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
    for (nParts <- Seq(3, 32)) {
      val got = DistributedRank.withGlobalRank(
          df, Seq("key"), Seq(col("v").asc, col("id").asc), nParts)
        .select("id", "_rk", "payload")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2)))).toMap
      assert(got == expected, s"rank mismatch at nParts=$nParts")
    }
  }

  test("empty input and single-key input are well-formed") {
    val empty = Seq.empty[(Long, String)].toDF("id", "key")
    val out = DistributedRank.withGlobalRank(empty, Seq("key"), Seq(col("id").asc), 8)
    assert(out.columns.contains("_rk") && out.count() == 0)
    val one = Seq((7L, "only")).toDF("id", "key")
    val r = DistributedRank.withGlobalRank(one, Seq("key"), Seq(col("id").asc), 8)
      .select("_rk", "_n").head()
    assert(r.getLong(0) == 1L && r.getLong(1) == 1L)
  }
}
