package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** NFC normalization expression: recomposition, ASCII identity fast
  * path, null handling, codegen/interpreted parity, type check.
  */
class NormalizeNFCSpec extends SparkSpec {

  import spark.implicits._
  import NormalizeNFC.normalizeNfc

  test("decomposed sequences recompose; ASCII and composed text pass through") {
    val rows = Seq(
      "e\u0301clair", // e + combining acute -> composed e-acute
      "A\u030A",      // A + combining ring  -> composed A-ring
      "\u00e9clair",  // already composed
      "plain ascii",
      "")
      .toDF("s")
      .select(col("s"), normalizeNfc(col("s")).as("n"),
        length(col("s")).as("lr"), length(col("n")).as("ln"))
      .collect()
    assert(rows(0).getAs[String]("n") == "\u00e9clair")
    assert(rows(0).getAs[Int]("lr") == 7 && rows(0).getAs[Int]("ln") == 6)
    assert(rows(1).getAs[String]("n") == "\u00c5")
    assert(rows(2).getAs[String]("n") == "\u00e9clair", "composed input is unchanged")
    assert(rows(3).getAs[String]("n") == "plain ascii")
    assert(rows(4).getAs[String]("n") == "")
  }

  test("null in, null out; non-string input fails analysis actionably") {
    val out = Seq(Option("a"), None).toDF("s")
      .select(normalizeNfc(col("s")).as("n")).collect()
    assert(out(0).getString(0) == "a" && out(1).isNullAt(0))
    val e = intercept[Exception] {
      Seq(1L).toDF("x").select(normalizeNfc(col("x"))).collect()
    }
    assert(e.getMessage.contains("normalize_nfc expects string"), e.getMessage)
  }

  test("interpreted eval matches codegen (both engine paths)") {
    import org.apache.spark.unsafe.types.UTF8String
    // direct static-path check (what generated code calls)
    val in = UTF8String.fromString("é")
    assert(NormalizeNFC.nfc(in).toString == "é")
    val ascii = UTF8String.fromString("abc")
    assert(NormalizeNFC.nfc(ascii) eq ascii, "ASCII must return the input instance")
    // interpreted expression path (nullSafeEval)
    val expr = NormalizeNFC(org.apache.spark.sql.catalyst.expressions.Literal(
      UTF8String.fromString("Å"), org.apache.spark.sql.types.StringType))
    assert(expr.eval(null).asInstanceOf[UTF8String].toString == "Å")
  }
}
