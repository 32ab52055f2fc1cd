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

  // ------------------------------------------------------------------
  // size-bounded walk (cdcChunksBoundedFast + cdcInvariantsBounded)
  // ------------------------------------------------------------------

  private val longDocs = Seq(
    (1L, ("the quick brown fox jumps over the lazy dog and then naps " * 6).trim),
    (2L, ("entirely different content about spark physical plans and shuffles " * 5).trim),
    (3L, "short one"))
    .toDF("doc_id", "text")

  private val MinL = 12
  private val MaxL = 20

  private def boundedChunks: DataFrame =
    TextAnalysis.cdcChunksBoundedFast(longDocs, "text", 8, 4, MinL, MaxL)

  private def auditBounded(c: DataFrame): Map[Long, (String, Int, Boolean, Boolean, Boolean)] =
    TextAnalysis.cdcInvariantsBounded(c, longDocs, "text",
        k = 8, divisor = 4, minLen = MinL, maxLen = MaxL, keyCol = "chunk_hash")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getInt(2), r.getBoolean(5), r.getBoolean(6), r.getBoolean(7)))
      .toMap

  test("bounded: clean frame passes, every non-final chunk inside [min,max]") {
    val rows = boundedChunks.collect()
    assert(rows.length > longDocs.count(), "fixture must split")
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, cs) =>
      val last = cs.map(_.getInt(1)).max
      cs.foreach { r =>
        val len = r.getInt(3)
        assert(len <= MaxL, s"doc $id chunk ${r.getInt(1)} over max: $len")
        if (r.getInt(1) != last)
          assert(len >= MinL, s"doc $id non-final chunk ${r.getInt(1)} under min: $len")
      }
    }
    auditBounded(boundedChunks).foreach { case (id, a) =>
      assert(a._3 && a._4 && a._5, s"doc $id flags: $a")
      val text = longDocs.filter(col("doc_id") === id).head().getString(1)
      assert(a._2 == text.length, s"doc $id coverage")
    }
  }

  test("bounded: with no candidates the walk degrades to exact max-length slabs") {
    // a divisor the 60-bit hash never satisfies on these docs -> pure
    // cut-at-max: lengths are max, max, ..., tail (tail may undershoot
    // min - the documented final-chunk exception)
    val slabs = TextAnalysis.cdcChunksBoundedFast(
        longDocs, "text", 8, 1 << 30, MinL, MaxL)
      .collect().groupBy(_.getLong(0))
    slabs.foreach { case (id, cs) =>
      val text = longDocs.filter(col("doc_id") === id).head().getString(1)
      val lens = cs.sortBy(_.getInt(1)).map(_.getInt(3)).toSeq
      val want = Seq.fill(text.length / MaxL)(MaxL) ++
        (if (text.length % MaxL != 0) Seq(text.length % MaxL) else Nil)
      assert(lens == want, s"doc $id slab lengths: $lens vs $want")
    }
  }

  test("bounded: min=1/max=huge reproduces the unbounded chunker bit-for-bit") {
    // with no binding bound every hash candidate is accepted and no cut
    // is forced - the walk must equal cdcChunksFast frame-for-frame
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4))
    val unb = TextAnalysis.cdcChunksFast(longDocs, "text", 8, 4)
      .collect().map(key).toSet
    val bnd = TextAnalysis.cdcChunksBoundedFast(longDocs, "text", 8, 4, 1, 1 << 20)
      .collect().map(key).toSet
    assert(unb.nonEmpty && bnd == unb)
  }

  test("bounded: boundaries resynchronize after a prefix edit (shift robustness)") {
    val s = ("the quick brown fox jumps over the lazy dog and then naps " * 8).trim
    val pair = Seq((10L, s), (11L, "INSERTED PREFIX CHANGES EVERYTHING " + s))
      .toDF("doc_id", "text")
    val cs = TextAnalysis.cdcChunksBoundedFast(pair, "text", 8, 4, MinL, MaxL)
      .collect().groupBy(_.getLong(0))
    val ka = cs(10L).map(_.getLong(4)).toSet
    val kb = cs(11L).map(_.getLong(4)).toSet
    val shared = ka.intersect(kb)
    assert(shared.size >= ka.size / 2,
      s"bounded boundaries must resync after the edit: ${shared.size} of ${ka.size} shared")
  }

  test("bounded: a splinter chunk flips sizes_valid") {
    // split doc 1's first chunk into 1 + rest: coverage and reassembly
    // survive, but a 1-char non-final chunk violates the min bound
    val c0 = boundedChunks
    val splinter = c0.filter(col("doc_id") === 1 && col("chunk_id") === 0)
      .select(col("doc_id"), lit(-1).as("chunk_id"), col("start_char"),
        lit(1).as("chunk_len"), col("chunk_hash"))
    val rest = c0.withColumn("start_char",
        when(col("doc_id") === 1 && col("chunk_id") === 0, col("start_char") + 1)
          .otherwise(col("start_char")))
      .withColumn("chunk_len",
        when(col("doc_id") === 1 && col("chunk_id") === 0, col("chunk_len") - 1)
          .otherwise(col("chunk_len")))
    val a = auditBounded(rest.unionByName(splinter))(1L)
    assert(a._2 == auditBounded(c0)(1L)._2, "coverage intact by construction")
    assert(!a._5, "sizes_valid must flip on an under-min splinter")
  }

  test("bounded: a merged over-max chunk flips sizes_valid") {
    // extend doc 1's chunk 0 over chunk 1 and drop chunk 1: reassembly
    // and coverage stay intact, but the merged length exceeds max
    val c0 = boundedChunks
    val len1 = c0.filter(col("doc_id") === 1 && col("chunk_id") === 1)
      .head().getInt(3)
    val corrupted = c0
      .filter(!(col("doc_id") === 1 && col("chunk_id") === 1))
      .withColumn("chunk_len",
        when(col("doc_id") === 1 && col("chunk_id") === 0, col("chunk_len") + len1)
          .otherwise(col("chunk_len")))
    val a = auditBounded(corrupted)(1L)
    assert(a._1 == auditBounded(c0)(1L)._1, "reassembly intact by construction")
    assert(!a._5, "sizes_valid must flip on an over-max merged chunk")
  }
}
