package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Value-parity contract of the native word n-gram assembler
  * (WordGramScan) against BOTH shapes it replaced:
  *  - the r19 HOF shape `when(size >= n, transform(sequence(0, size-n),
  *    j => array_join(slice(toks, j+1, n), " "))).otherwise([])`, and
  *  - the original r18 posexplode + window-lead row shape,
  * over adversarial inputs — multibyte tokens, empty text, docs shorter
  * than n, exactly-n, null text, repeated tokens, and a long document.
  * The whole shingle family (postings, jaccard, minhash, containment,
  * substring spans, decontamination) is oracle-verified through these
  * gram values, so parity here IS oracle parity.
  */
class WordGramScanSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, ""),
    (3L, "one two"), // shorter than n = 3: zero grams
    (4L, "one two three"), // exactly n: one gram
    (5L, "héllo wörld ünïcode テスト 文字 列 with mixed ® ascii"),
    (6L, null.asInstanceOf[String]),
    (7L, "a a a a a a a a"), // repeated token slab
    (8L, ("lorem ipsum dolor sit amet " * 40).trim),
    (9L, "   padded   with   runs   of   spaces   ")
  ).toDF("doc_id", "text")

  private val n = 3

  private def toks: Column = split(trim(col("text")), "\\s+")

  /** The r19 HOF shape, verbatim. */
  private def hofGrams: Column =
    when(size(col("_toks")) >= n,
      transform(sequence(lit(0), size(col("_toks")) - n), j =>
        array_join(slice(col("_toks"), j + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  test("native == HOF shape (array level)") {
    val rows = docs
      .select(col("doc_id"), toks.as("_toks"))
      .select(col("doc_id"),
        WordGramScan.wordGrams(col("_toks"), n).as("native"),
        hofGrams.as("hof"))
      .collect()
    assert(rows.length == docs.count())
    rows.foreach { r =>
      if (r.isNullAt(1) || r.isNullAt(2)) {
        // null text: tokens null -> both shapes must agree on "no grams"
        // (native: null; HOF: when(null >= n) -> otherwise -> []) — a
        // posexplode consumer emits zero rows either way
        assert(r.isNullAt(1) && (r.isNullAt(2) || r.getSeq[String](2).isEmpty),
          s"doc ${r.getLong(0)}: null-handling diverged")
      } else {
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"doc ${r.getLong(0)}: native ${r.getSeq[String](1)} != hof ${r.getSeq[String](2)}")
      }
    }
  }

  test("native posexplode rows == r18 window-lead rows") {
    // the ORIGINAL r18 shape: posexplode every token, window-lead n-1
    // successors, drop trailing partials
    import org.apache.spark.sql.expressions.Window
    val tokRows = docs
      .select(col("doc_id"), posexplode(toks))
      .toDF("doc_id", "pos", "tok")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val gram = concat_ws(" ",
      (0 until n).map(i => if (i == 0) col("tok") else lead(col("tok"), i).over(w)): _*)
    val windowShape = tokRows
      .withColumn("last", lead(col("tok"), n - 1).over(w))
      .withColumn("gram", gram)
      .filter(col("last").isNotNull)
      .select("doc_id", "pos", "gram")
    val nativeShape = docs
      .select(col("doc_id"), toks.as("_toks"))
      .select(col("doc_id"),
        posexplode(WordGramScan.wordGrams(col("_toks"), n)))
      .toDF("doc_id", "pos", "gram")
    val a = nativeShape.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val b = windowShape.collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(a.nonEmpty && a.sameElements(b),
      s"native rows (${a.length}) != window rows (${b.length})")
  }

  test("null tokens skipped exactly like array_join") {
    val arr = Seq((1L, Seq("a", null, "b", "c"))).toDF("doc_id", "toks")
    val r = arr.select(
      WordGramScan.wordGrams(col("toks"), 3).as("native"),
      transform(sequence(lit(0), size(col("toks")) - 3), j =>
        array_join(slice(col("toks"), j + 1, lit(3)), " ")).as("hof"))
      .head()
    assert(r.getSeq[String](0) == r.getSeq[String](1))
    assert(r.getSeq[String](0) == Seq("a b", "b c"))
  }

  test("wordPairs == zip-of-shifted-slices struct shape") {
    // the shape bigramLogprob used before the native: zip_with of the
    // two shifted slices under a size >= 2 guard
    val zipShape = when(size(col("_toks")) >= 2,
      zip_with(
        slice(col("_toks"), lit(1), size(col("_toks")) - 1),
        slice(col("_toks"), lit(2), size(col("_toks")) - 1),
        (p, w) => struct(p.as("prev"), w.as("tok"))))
      .otherwise(array().cast("array<struct<prev:string,tok:string>>"))
    val a = docs.select(col("doc_id"), toks.as("_toks"))
      .select(col("doc_id"),
        explode(WordGramScan.wordPairs(col("_toks"))).as("b"))
      .select(col("doc_id"), col("b.prev"), col("b.tok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    val b = docs.select(col("doc_id"), toks.as("_toks"))
      .select(col("doc_id"), explode(zipShape).as("b"))
      .select(col("doc_id"), col("b.prev"), col("b.tok"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).sorted
    assert(a.nonEmpty && a.sameElements(b),
      s"native pairs (${a.length}) != zip pairs (${b.length})")
    // null text and the 1-token doc emit zero pairs from both shapes
    assert(!a.exists(t => t._1 == 6L))
  }

  test("interpreted eval and codegen agree") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.sql.types.{ArrayType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    val toksIn = new GenericArrayData(Array[Any](
      UTF8String.fromString("héllo"), UTF8String.fromString("wörld"),
      UTF8String.fromString("テスト"), UTF8String.fromString("x")))
    val expr = WordNGrams(Literal(toksIn, ArrayType(StringType)), 2)
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toArray[UTF8String](StringType).map(_.toString).toSeq
    val viaDf = Seq(Seq("héllo", "wörld", "テスト", "x")).toDF("toks")
      .select(WordGramScan.wordGrams(col("toks"), 2)).head().getSeq[String](0)
    assert(interpreted == viaDf)
    assert(interpreted == Seq("héllo wörld", "wörld テスト", "テスト x"))
  }
}
