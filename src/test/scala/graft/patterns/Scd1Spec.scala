package graft.patterns

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd1Spec extends SparkSpec {

  import spark.implicits._

  private def dim =
    Seq((1L, "a", 10.0, "keep"), (2L, "b", 20.0, "keep"), (3L, "c", 30.0, "keep"))
      .toDF("k", "name", "bal", "extra")

  test("upsert overwrites matched, inserts new, passes untouched") {
    val batch = Seq((2L, "b2", 99.0), (9L, "new", 0.5)).toDF("k", "name", "bal")
    val rows = Scd1.upsert(dim, batch, "k", Seq(col("bal")))
      .select("k", "name", "bal", "extra")
      .as[(Long, String, Double, String)].collect().toSeq.sortBy(_._1)
    assert(rows == Seq(
      (1L, "a", 10.0, "keep"),
      (2L, "b2", 99.0, "keep"), // overwritten, dim-only column untouched
      (3L, "c", 30.0, "keep"),
      (9L, "new", 0.5, null))) // inserted, dim-only column null
  }

  test("batch columns must be a subset of the dimension") {
    val e = intercept[IllegalArgumentException](
      Scd1.upsert(dim, Seq((1L, 1L)).toDF("k", "ver"), "k", Seq(col("ver"))))
    assert(e.getMessage.contains("ver"))
  }

  test("in-batch collapse: newest version per key wins") {
    val batch = Seq((1L, "v1", 1L), (1L, "v2", 2L), (1L, "v3", 3L))
      .toDF("k", "name", "ver")
    val d = dim.withColumn("ver", lit(0L))
    val out = Scd1.upsert(d, batch, "k", Seq(col("ver")))
    assert(out.filter($"k" === 1L).select("name").as[String].head() == "v3")
  }

  test("batch nulls overwrite (no stale-value resurrection) and upsert is idempotent") {
    val batch = Seq((2L, Option.empty[String], 5.0)).toDF("k", "name", "bal")
    val once = Scd1.upsert(dim, batch, "k", Seq(col("bal")))
    assert(once.filter($"k" === 2L).select("name").as[Option[String]].head().isEmpty)
    val twice = Scd1.upsert(once, batch, "k", Seq(col("bal")))
    assert(twice.exceptAll(once).isEmpty && once.exceptAll(twice).isEmpty)
  }
}
