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
}
