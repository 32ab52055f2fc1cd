package graft.text

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  import spark.implicits._

  test("unigram NLL ranks rare-token docs above common-token docs") {
    // "the cat" tokens dominate the corpus; doc 3 is all hapaxes
    val docs = Seq(
      (1L, "the cat the cat the cat"),
      (2L, "the cat sat"),
      (3L, "zyx qwv jkl"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogprob(docs, "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    assert(out(1)._2 == 6L && out(2)._2 == 3L && out(3)._2 == 3L)
    // common-token doc scores lowest, hapax doc highest
    assert(out(1)._1 < out(2)._1 && out(2)._1 < out(3)._1, s"ordering wrong: $out")
    // hapax NLL is exactly -ln(1/12) per token (12 tokens in corpus)
    assert(math.abs(out(3)._1 - math.log(12.0)) < 1e-3)
  }

  test("boilerplate coverage: cross-doc frequent spans, overlaps counted once") {
    import spark.implicits._
    // "click here to subscribe" appears in 3 docs (boilerplate); doc 4 is
    // clean; doc 5 is too short for any 3-gram
    val docs = Seq(
      (1L, "great article body click here to subscribe now"),
      (2L, "other words click here to subscribe"),
      (3L, "click here to subscribe unrelated tail words appended"),
      (4L, "entirely original content with no repeats"),
      (5L, "too short"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.boilerplateCoverage(docs, "text", n = 3, minDf = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // frequent 3-grams (df = 3): "click here to", "here to subscribe" -
    // their spans overlap, covering 4 distinct tokens per doc
    assert(out(1L) == ((8L, 4L, 0.5)))
    assert(out(2L) == ((6L, 4L, 0.666667)))
    assert(out(3L) == ((8L, 4L, 0.5)))
    assert(out(4L) == ((6L, 0L, 0.0)))
    assert(out(5L) == ((2L, 0L, 0.0)))
  }
}
