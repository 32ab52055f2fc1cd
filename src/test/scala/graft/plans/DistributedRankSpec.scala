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
