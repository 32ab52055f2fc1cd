package graft.functions

import com.google.common.hash.Hashing
import graft.SparkSpec
import org.apache.spark.sql.functions._

import scala.util.Random

/** IcebergBucketHash must match Guava's murmur3_32 over the Iceberg byte
  * layouts (little-endian longs, UTF-8 strings) — Guava is the
  * implementation Iceberg itself delegates to, so agreement here means
  * bucket directories line up with a real Iceberg catalog's pruning.
  */
class IcebergBucketSpec extends SparkSpec {

  import spark.implicits._

  def guavaLong(v: Long): Int = Hashing.murmur3_32_fixed().hashLong(v).asInt()
  def guavaStr(s: String): Int =
    Hashing.murmur3_32_fixed().hashBytes(s.getBytes("UTF-8")).asInt()

  test("long hashing matches Guava murmur3_32 (seeded random property)") {
    val rnd = new Random(7)
    for (_ <- 1 to 200) {
      val v = rnd.nextLong()
      assert(IcebergBucketHash.hashLong(v) == guavaLong(v), s"value $v")
    }
    for (v <- Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 34L))
      assert(IcebergBucketHash.hashLong(v) == guavaLong(v), s"value $v")
  }

  test("string hashing matches Guava murmur3_32 over UTF-8, all tail lengths") {
    val rnd = new Random(11)
    for (len <- 0 to 17) {
      val s = rnd.alphanumeric.take(len).mkString
      assert(IcebergBucketHash.hashBytes(s.getBytes("UTF-8")) == guavaStr(s), s"len $len '$s'")
    }
    // multi-byte UTF-8
    for (s <- Seq("über", "naïve", "日本語", "🧊berg"))
      assert(IcebergBucketHash.hashBytes(s.getBytes("UTF-8")) == guavaStr(s), s)
  }

  test("the Catalyst expression evaluates identically under codegen") {
    val df = Seq((34L, "iceberg"), (0L, ""), (-5L, "graft")).toDF("l", "s")
    val out = df.select(
      col("l"), col("s"),
      IcebergBucketHash.bucket(16, col("l")).as("bl"),
      IcebergBucketHash.bucket(16, col("s")).as("bs"))
      .collect()
    for (r <- out) {
      val expL = ((guavaLong(r.getAs[Long]("l")) & Int.MaxValue) % 16)
      val expS = ((guavaStr(r.getAs[String]("s")) & Int.MaxValue) % 16)
      assert(r.getAs[Int]("bl") == expL)
      assert(r.getAs[Int]("bs") == expS)
    }
  }

  test("buckets are in range and reasonably uniform") {
    val n = 8
    val buckets = spark.range(0, 10000)
      .select(IcebergBucketHash.bucket(n, col("id")).as("b"))
      .groupBy("b").count().as[(Int, Long)].collect().toMap
    assert(buckets.keySet == (0 until n).toSet)
    assert(buckets.values.forall(c => c > 1000 && c < 1500)) // ~1250 each
  }

  test("timestamps hash through their micros value (Iceberg layout)") {
    val df = Seq(1L).toDF("x")
      .select(timestamp_micros(lit(1510871468000000L)).as("ts"))
      .select(IcebergBucketHash.bucket(1000, col("ts")).as("b"))
    assert(df.head().getAs[Int]("b") ==
      ((guavaLong(1510871468000000L) & Int.MaxValue) % 1000))
  }

  test("stays inside WholeStageCodegen (no codegen fence)") {
    val df = spark.range(0, 10)
      .select(IcebergBucketHash.bucket(4, col("id")).as("b"))
    // the "*(n)" prefix marks operators fused into a WholeStageCodegen stage
    assert(df.queryExecution.executedPlan.toString.linesIterator.next().startsWith("*("))
  }
}
