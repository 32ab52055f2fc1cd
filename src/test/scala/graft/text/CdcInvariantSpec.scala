package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SENSITIVITY of the CDC invariant audit (the text_cdc_chunks oracle
  * shape): an invariant oracle is only as good as what it catches, so
  * each corruption class a buggy chunker could produce is planted into
  * a real chunk frame and must flip at least one output column. The
  * classes cover the blind spots simple aggregates have — including a
  * gap+overlap pair that CANCELS in the length sum and frame edges,
  * which only the ordered-reassembly md5 sees.
  */
class CdcInvariantSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and then naps"),
    (2L, "a second document with enough characters to chunk at least once more"),
    (3L, "short one"))
    .toDF("doc_id", "text")

  private def chunks: DataFrame = TextAnalysis.cdcChunksFast(docs, "text", 8, 4)

  private def audit(c: DataFrame): Map[Long, (String, Int, Int, Int, Boolean, Boolean)] =
    TextAnalysis.cdcInvariants(c, docs, "text", k = 8, divisor = 4, keyCol = "chunk_hash")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getInt(3), r.getInt(4),
          r.getBoolean(5), r.getBoolean(6)))
      .toMap

  private lazy val clean = audit(chunks)

  test("the clean frame passes every invariant") {
    // divisor=4 so these short docs really split into multiple chunks
    assert(chunks.count() > docs.count(), "fixture must produce real splits")
    clean.foreach { case (id, (md5got, cov, first, last, inj, bok)) =>
      val text = docs.filter(col("doc_id") === id).head().getString(1)
      assert(cov == text.length && first == 1 && last == text.length,
        s"doc $id edges: $cov/$first/$last")
      assert(inj && bok, s"doc $id flags")
      val want = docs.filter(col("doc_id") === id)
        .select(md5(col("text"))).head().getString(0)
      assert(md5got == want, s"doc $id reassembly")
    }
  }

  test("a dropped chunk flips coverage and reassembly") {
    val corrupted = chunks.filter(!(col("doc_id") === 1 && col("chunk_id") === 0))
    val a = audit(corrupted)(1L)
    assert(a._2 < clean(1L)._2, "covered_len must shrink")
    assert(a._1 != clean(1L)._1, "reassembled_md5 must change")
  }

  test("a boundary shifted by one flips the boundary rule (coverage intact)") {
    // move the first cut of doc 1 one char right: chunk 0 grows, chunk 1
    // shrinks and starts later - lengths still sum, edges still match,
    // reassembly still equals the text... but the k-gram at the new cut
    // no longer hashes to 0 mod divisor
    val corrupted = chunks.withColumn("chunk_len",
        when(col("doc_id") === 1 && col("chunk_id") === 0, col("chunk_len") + 1)
          .otherwise(col("chunk_len")))
      .withColumn("start_char",
        when(col("doc_id") === 1 && col("chunk_id") === 1, col("start_char") + 1)
          .otherwise(col("start_char")))
      .withColumn("chunk_len",
        when(col("doc_id") === 1 && col("chunk_id") === 1, col("chunk_len") - 1)
          .otherwise(col("chunk_len")))
    val a = audit(corrupted)(1L)
    assert(a._2 == clean(1L)._2 && a._1 == clean(1L)._1,
      "the shift is constructed to keep coverage and reassembly intact")
    assert(!a._6, "boundaries_valid must flip")
  }

  test("swapped chunk ids flip the ordered reassembly") {
    val corrupted = chunks.withColumn("chunk_id",
      when(col("doc_id") === 1 && col("chunk_id") === 0, 1)
        .when(col("doc_id") === 1 && col("chunk_id") === 1, 0)
        .otherwise(col("chunk_id")))
    val a = audit(corrupted)(1L)
    assert(a._2 == clean(1L)._2, "length sum is blind to reordering")
    assert(a._1 != clean(1L)._1, "reassembled_md5 must catch the reorder")
  }

  test("a gap+overlap pair that cancels in the length sum is caught by reassembly") {
    // chunk 0 loses its LAST char (a gap before chunk 1) while chunk 1
    // extends at its END into chunk 2's first char (an overlap): the
    // length sum, first_start, and last_end are ALL unchanged, but the
    // reassembled text drops one char and duplicates another - only the
    // ordered reassembly md5 sees it. (Shifting a single cut point is
    // NOT such a case: that is content-preserving and is what the
    // boundary-rule column catches instead.)
    assert(chunks.filter(col("doc_id") === 1).count() >= 3,
      "fixture needs >=3 chunks in doc 1 for a disjoint gap+overlap pair")
    val corrupted = chunks.withColumn("chunk_len",
      when(col("doc_id") === 1 && col("chunk_id") === 0, col("chunk_len") - 1)
        .when(col("doc_id") === 1 && col("chunk_id") === 1, col("chunk_len") + 1)
        .otherwise(col("chunk_len")))
    val a = audit(corrupted)(1L)
    assert(a._2 == clean(1L)._2 && a._3 == clean(1L)._3 && a._4 == clean(1L)._4,
      "the corruption is constructed to be invisible to the frame-edge columns")
    assert(a._1 != clean(1L)._1, "reassembled_md5 must catch gap+overlap")
  }

  test("collapsed chunk keys flip injectivity") {
    val corrupted = chunks.withColumn("chunk_hash",
      when(col("doc_id") === 1, lit(42L)).otherwise(col("chunk_hash")))
    val a = audit(corrupted)(1L)
    assert(!a._5, "keys_injective must flip when distinct chunks share a key")
    assert(audit(corrupted)(2L)._5, "other docs unaffected")
  }
}
