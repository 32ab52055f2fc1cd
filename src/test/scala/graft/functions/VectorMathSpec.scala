package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VectorMathSpec extends SparkSpec {

  import spark.implicits._

  lazy val df = Seq(
    (1L, Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
    (2L, Seq(0.0, 0.0, 0.0), Seq(1.0, 1.0, 1.0)),
    (3L, Seq(-1.0, 2.5, 0.5), Seq(2.0, -2.0, 4.0)))
    .toDF("id", "a", "b")

  test("dot product and norm match the sequential-fold reference values") {
    val out = df.select(col("id"),
        VectorMath.dotProduct(col("a"), col("b")).as("dot"),
        VectorMath.sumSquares(col("a")).as("ss"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(out(1L) == ((1 * 4 + 2 * 5 + 3 * 6).toDouble, (1 + 4 + 9).toDouble))
    assert(out(2L) == (0.0, 0.0))
    assert(out(3L) == ((-2.0 - 5.0 + 2.0), (1.0 + 6.25 + 0.25)))
  }

  test("interpreted eval agrees with codegen (same rows, wholestage off/on)") {
    def values(): Seq[Double] = df
      .select(VectorMath.dotProduct(col("a"), col("b"))).as[Double].collect().toSeq
    val withCodegen = values()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(values() == withCodegen)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null arrays yield null, not a crash") {
    val n = Seq((1L, Option.empty[Seq[Double]], Option(Seq(1.0))))
      .toDF("id", "a", "b")
      .select(VectorMath.dotProduct(col("a"), col("b")))
    assert(n.collect().head.isNullAt(0))
  }

  test("degenerate inputs null the result instead of silently truncating") {
    // length mismatch: a ragged embedding must NOT produce a
    // plausible-looking partial dot product
    val ragged = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)))
      .toDF("a", "b").select(VectorMath.dotProduct(col("a"), col("b")))
    assert(ragged.collect().head.isNullAt(0))
    // null ELEMENT inside an array nulls dot and sumSquares
    val withNullElem = Seq((Seq(Some(1.0), None), Seq(Some(1.0), Some(2.0))))
      .toDF("a", "b")
    assert(withNullElem.select(VectorMath.dotProduct(col("a"), col("b")))
      .collect().head.isNullAt(0))
    assert(withNullElem.select(VectorMath.sumSquares(col("a")))
      .collect().head.isNullAt(0))
  }

  test("non-double-array inputs are rejected at analysis time") {
    val bad = Seq((1L, Seq("x"))).toDF("id", "a")
    intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(VectorMath.sumSquares(col("a"))).collect()
    }
  }
}
