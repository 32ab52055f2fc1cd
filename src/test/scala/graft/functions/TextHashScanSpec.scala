package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Bit-parity contract of the native single-pass k-gram hash scans
  * (TextHashScan) against the Column-expression shapes they replaced:
  * same candidate-boundary arrays and same min-shingle hashes, for both
  * hash modes, over adversarial inputs — multibyte UTF-8 (so char vs
  * byte offsets diverge), empty, shorter-than-k, exactly-k, null, and a
  * long mixed document. The CDC chunkers and fingerprints are
  * oracle-verified through these values, so parity here IS oracle
  * parity.
  */
class TextHashScanSpec extends SparkSpec {
  import spark.implicits._

  private def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and keeps running"),
    (2L, ""),
    (3L, "short"),
    (4L, "exactly8"), // len == k: one gram at i == len, always filtered
    (5L, "héllo wörld — ünïcode ärray テスト文字列 with mixed ascii and ® symbols"),
    (6L, null.asInstanceOf[String]),
    (7L, "a" * 500), // uniform slab: boundary rule fires wherever it fires
    (8L, ("lorem ipsum dolor sit amet " * 40).trim)
  ).toDF("doc_id", "text")

  private val k = 8
  private val divisor = 4 // dense boundaries so the fixture exercises hits

  /** The former HOF shape, verbatim. */
  private def hofCandidates(gramHash: Column => Column): Column = {
    val len = length(col("text"))
    when(len >= k,
      filter(
        transform(sequence(lit(k), len), i =>
          when(gramHash(col("text").substr(i - (k - 1), lit(k))) % divisor === 0, i)),
        x => x.isNotNull && x < len)).otherwise(array().cast("array<int>"))
  }

  /** The former explode + min shape, verbatim. */
  private def hofMinShingle(gramHash: Column => Column) = {
    val n = greatest(length(col("text")) - (k - 1), lit(1))
    docs
      .select(col("doc_id"), col("text").as("_t"),
        explode(sequence(lit(1), n)).as("_i"))
      .select(col("doc_id"), gramHash(col("_t").substr(col("_i"), lit(k))).as("_h"))
      .groupBy(col("doc_id")).agg(min(col("_h")).as("mh"))
  }

  for ((mode, gramHash) <- Seq(
      ("xxhash64", (c: Column) => xxhash64(c)),
      ("md5-hash60", (c: Column) => hash60(c)))) {
    val md5Mode = mode == "md5-hash60"

    test(s"cdc candidate boundaries: native == HOF shape ($mode)") {
      val both = docs.select(col("doc_id"),
        coalesce(TextHashScan.cdcBoundaries(col("text"), k, divisor, md5Mode),
          array().cast("array<int>")).as("native"),
        hofCandidates(gramHash).as("hof"))
      val rows = both.collect()
      assert(rows.length == docs.count())
      rows.foreach { r =>
        assert(r.getSeq[Int](1) == r.getSeq[Int](2),
          s"doc ${r.getLong(0)}: native ${r.getSeq[Int](1)} != hof ${r.getSeq[Int](2)}")
      }
    }

    test(s"min shingle hash: native == explode+min shape ($mode)") {
      // xx mode mirrors fingerprintFast's coalesce: Spark hash functions
      // return the SEED (42) on null input, so the explode+min HOF shape
      // yields 42 — not null — for a null document
      val nativeCol =
        if (md5Mode) TextHashScan.minShingleHash(col("text"), k, md5Mode)
        else coalesce(TextHashScan.minShingleHash(col("text"), k, md5Mode), lit(42L))
      val native = docs.select(col("doc_id"), nativeCol.as("mh"))
      val hof = hofMinShingle(gramHash)
      val joined = native.as("n")
        .join(hof.as("h"), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), col("n.mh").as("nm"), col("h.mh").as("hm"))
        .collect()
      assert(joined.length == docs.count())
      joined.foreach { r =>
        val nm = if (r.isNullAt(1)) None else Some(r.getLong(1))
        val hm = if (r.isNullAt(2)) None else Some(r.getLong(2))
        assert(nm == hm, s"doc ${r.getLong(0)}: native $nm != hof $hm")
      }
    }
  }

  test("null text: candidates coalesce to empty, min hash stays null") {
    val r = docs.filter(col("doc_id") === 6L).select(
      coalesce(TextHashScan.cdcBoundaries(col("text"), k, divisor, md5Mode = true),
        array().cast("array<int>")),
      TextHashScan.minShingleHash(col("text"), k, md5Mode = false)).head()
    assert(r.getSeq[Int](0).isEmpty)
    assert(r.isNullAt(1))
  }

  for ((mode, md5HexMode) <- Seq(("md5-hex", true), ("xxhash64", false))) {
    test(s"chunk slices: native == substr+chunkKey shape ($mode)") {
      // the former emitChunks projection, verbatim: per boundary pair,
      // (s, l) assembled by an interpreted transform, key =
      // chunkKey(substr(s + 1, l)) with substr's O(start) re-scan
      val chunkKey: Column => Column =
        if (md5HexMode) md5(_) else xxhash64(_)
      val len = length(col("text"))
      val bounds = coalesce(
        TextHashScan.cdcBoundaries(col("text"), k, divisor, md5HexMode),
        array().cast("array<int>"))
      val withB = docs.filter(col("text").isNotNull)
        .select(col("doc_id"), col("text").as("_t"),
          concat(array(lit(0)), bounds, array(len)).as("_b"))
      val old = withB
        .select(col("doc_id"), col("_t"),
          posexplode(when(size(col("_b")) > 1,
            transform(sequence(lit(1), size(col("_b")) - 1), j =>
              struct(element_at(col("_b"), j).as("s"),
                (element_at(col("_b"), j + 1) - element_at(col("_b"), j)).as("l"))))
            .otherwise(array().cast("array<struct<s:int,l:int>>"))))
        .select(col("doc_id"), col("pos"), col("col.s"), col("col.l"),
          chunkKey(col("_t").substr(col("col.s") + 1, col("col.l"))).as("key"))
      val native = withB
        .select(col("doc_id"),
          posexplode(TextHashScan.chunkSlices(col("_t"), col("_b"), md5HexMode)))
        .select(col("doc_id"), col("pos"), col("col.s"), col("col.l"),
          col("col.k").as("key"))
      val a = native.collect().map(r => r.toSeq.map(String.valueOf).mkString("|")).sorted
      val b = old.collect().map(r => r.toSeq.map(String.valueOf).mkString("|")).sorted
      assert(a.nonEmpty && a.sameElements(b),
        s"native chunks (${a.length}) != substr shape (${b.length})\n" +
          a.take(3).mkString("\n") + "\n--\n" + b.take(3).mkString("\n"))
    }
  }

  test("chunk slices: degenerate bounds (zero-length, clamped) match substr semantics") {
    import spark.implicits._
    // [0,5,5,12] has a zero-length middle chunk; [0,7,99] overshoots the
    // end — substr truncates, the native clamps to the same bytes
    val d = Seq(("héllo wörld x", Seq(0, 5, 5, 12)), ("héllo wörld x", Seq(0, 7, 99)))
      .toDF("text", "_b")
    val native = d.select(posexplode(
        TextHashScan.chunkSlices(col("text"), col("_b"), true)))
      .select(col("col.s"), col("col.l"), col("col.k")).collect()
    val old = d.select(col("text"), posexplode(
        transform(sequence(lit(1), size(col("_b")) - 1), j =>
          struct(element_at(col("_b"), j).as("s"),
            (element_at(col("_b"), j + 1) - element_at(col("_b"), j)).as("l")))))
      .select(col("col.s"), col("col.l"),
        md5(col("text").substr(col("col.s") + 1, col("col.l")))).collect()
    assert(native.map(_.toSeq).toSeq == old.map(_.toSeq).toSeq)
  }

  test("md5Prefix == conv(substring(md5)) for 15 and 6 nibbles") {
    import org.apache.spark.sql.functions.{col, conv, md5, substring}
    val strs = Seq("", "a", "the quick brown fox", "héllo wörld テスト",
      "\u0000binary-ish\u0001", "x" * 4096).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }
    val rows = strs.toDF("id", "t")
      .select(col("id"),
        TextHashScan.md5Prefix(col("t"), 15).as("n15"),
        conv(substring(md5(col("t")), 1, 15), 16, 10).cast("long").as("h15"),
        TextHashScan.md5Prefix(col("t"), 6).cast("int").as("n6"),
        conv(substring(md5(col("t")), 1, 6), 16, 10).cast("int").as("h6"))
      .collect()
    rows.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"15-nibble diverged for id ${r.getLong(0)}")
      assert(r.getInt(3) == r.getInt(4), s"6-nibble diverged for id ${r.getLong(0)}")
    }
    // null input -> null, like the conv shape
    val nr = Seq((1L, null.asInstanceOf[String])).toDF("id", "t")
      .select(TextHashScan.md5Prefix(col("t"), 15)).head()
    assert(nr.isNullAt(0))
  }

  test("interpreted eval and codegen agree") {
    // force the interpreted path via a manual eval on a literal row
    import org.apache.spark.sql.catalyst.expressions.Literal
    val s = org.apache.spark.unsafe.types.UTF8String.fromString(
      "héllo wörld — ünïcode ärray with ascii")
    val exprXx = MinShingleHash(Literal(s, org.apache.spark.sql.types.StringType), k, md5Mode = false)
    val exprMd = MinShingleHash(Literal(s, org.apache.spark.sql.types.StringType), k, md5Mode = true)
    val viaDf = Seq("héllo wörld — ünïcode ärray with ascii").toDF("text")
      .select(TextHashScan.minShingleHash(col("text"), k, md5Mode = false),
        TextHashScan.minShingleHash(col("text"), k, md5Mode = true)).head()
    assert(exprXx.eval(null) == viaDf.getLong(0))
    assert(exprMd.eval(null) == viaDf.getLong(1))
  }
}
