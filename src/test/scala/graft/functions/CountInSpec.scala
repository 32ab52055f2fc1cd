package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CountInSpec extends SparkSpec {

  import spark.implicits._

  lazy val df = Seq(
    (1L, Seq("the", "cat", "the", "dog")), // duplicate hits count each time
    (2L, Seq("x", "y")),
    (3L, Seq.empty[String]),
    (4L, Seq(null.asInstanceOf[String], "the"))) // null elements skipped
    .toDF("id", "toks")

  val stop = Seq("the", "a", "of")

  def values(): Map[Long, Int] = df
    .select(col("id"), CountIn.countIn(col("toks"), stop).as("c"))
    .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("counts every matching occurrence, skips null elements") {
    val out = values()
    assert(out == Map(1L -> 2, 2L -> 0, 3L -> 0, 4L -> 1))
  }

  test("interpreted eval agrees with codegen") {
    val withCodegen = values()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(values() == withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("matches the higher-order lambda formulation it replaced") {
    val stopArr = array(stop.map(lit): _*)
    val both = df.select(
      CountIn.countIn(col("toks"), stop).as("native"),
      size(filter(col("toks"), t => array_contains(stopArr, t))).as("lambda"))
    assert(both.collect().forall(r => r.getInt(0) == r.getInt(1)))
  }

  test("non-string-array input is rejected at analysis time") {
    val bad = Seq((1L, Seq(1, 2))).toDF("id", "a")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(CountIn.countIn(col("a"), stop)).collect()
    }
  }

  test("null array yields null") {
    val n = Seq((1L, Option.empty[Seq[String]])).toDF("id", "toks")
      .select(CountIn.countIn(col("toks"), stop))
    assert(n.collect().head.isNullAt(0))
  }
}
