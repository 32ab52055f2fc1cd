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

  test("bigram NLL sees word ORDER where the unigram model cannot") {
    // docs 1 and 2 have IDENTICAL token multisets (same unigram NLL);
    // doc 2's order is shuffled so its bigrams are corpus-rare
    val docs = Seq(
      (1L, "the cat sat on the mat the cat sat on the mat"),
      (2L, "mat the on sat cat the mat the on sat cat the"),
      (3L, "the cat sat on the mat"),
      (4L, "solo"))
      .toDF("doc_id", "text")
    val uni = TextAnalysis.unigramLogprob(docs, "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(uni(1) == uni(2), "unigram model is order-blind by construction")
    val out = TextAnalysis.bigramLogprob(docs, "text")
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    // n_bigrams = tokens - 1; single-token doc carries the 0/0 sentinel
    assert(out(1)._2 == 11L && out(3)._2 == 5L && out(4) == ((0.0, 0L)))
    // doc 1's bigrams repeat corpus-wide (docs 1+3 share them); doc 2's
    // shuffled order makes each bigram rare -> strictly higher NLL
    assert(out(1)._1 < out(2)._1,
      s"bigram NLL must separate the shuffled doc: $out")
  }

  test("line dedup keeps first occurrences; short lines always survive") {
    val boiler = "subscribe to our newsletter for all the updates"
    val docs = Seq(
      (1L, s"alpha beta\n$boiler\nunique one two three four five"),
      (2L, s"$boiler\nanother unique line of five words"),
      (3L, boiler))
      .toDF("doc_id", "text")
    val out = TextAnalysis.lineDedup(docs, "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // doc 1 saw the boilerplate first: keeps everything
    assert(out(1) == ((s"alpha beta\n$boiler\nunique one two three four five", 3L, 0L)))
    // doc 2 loses the repeated line, keeps its unique one
    assert(out(2) == (("another unique line of five words", 1L, 1L)))
    // doc 3 was ONLY the repeated line: drops from the output entirely
    assert(!out.contains(3L))
    // "alpha beta" (2 words) is below minWords: it would survive even
    // if repeated — short fragments must never dedup a doc to death
    val short = Seq((1L, "hi\nworld"), (2L, "hi\nworld")).toDF("doc_id", "text")
    val kept = TextAnalysis.lineDedup(short, "text")
      .collect().map(r => r.getString(1)).toSeq
    assert(kept == Seq("hi\nworld", "hi\nworld"))
    // determinism under repartitioning
    val re = TextAnalysis.lineDedup(docs.repartition(7), "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(re == out.map { case (k, v) => (k, v._1) }.toSet)
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

  test("fast CDC chunks: coverage, position-locality, degenerate docs") {
    val base = (1 to 40).map(i => s"sentence$i with some filler words here.").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, "PREFIX-EDIT " + base), // same content, shifted by an edit
      (3L, "tiny"),                // shorter than k: one whole-doc chunk
      (4L, "")                     // empty: one zero-length chunk (md5-variant parity)
    ).toDF("doc_id", "text")
    val out = TextAnalysis.cdcChunksFast(docs, "text").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .groupBy(_._1)
    // coverage: chunks tile the document exactly — contiguous starts,
    // lengths summing to the doc length
    val d1 = out(1L).sortBy(_._2)
    assert(d1.map(_._4).sum == base.length)
    assert(d1.head._3 == 1)
    d1.sliding(2).foreach {
      case Array(a, b) => assert(b._3 == a._3 + a._4, s"gap between $a and $b")
      case _ => ()
    }
    assert(d1.length > 3, s"expected multiple ~64-char chunks, got ${d1.length}")
    // position-locality (the CDC point): an edit at the head must not
    // reshift every downstream chunk — the two docs share most chunk keys
    val k1 = d1.map(_._5).toSet
    val k2 = out(2L).map(_._5).toSet
    val shared = k1.intersect(k2).size
    assert(shared >= k1.size - 2,
      s"only $shared/${k1.size} chunk keys survived a head edit — not shift-robust")
    // degenerate shapes (same contract the md5 variant's oracle pins:
    // sub-k docs one whole-doc chunk, empty docs one zero-length chunk)
    assert(out(3L).map(t => (t._3, t._4)).toSeq == Seq((1, 4)))
    assert(out(4L).map(t => (t._3, t._4)).toSeq == Seq((1, 0)))
  }

  test("fast fingerprint: duplicate detection and shingle-superset monotonicity") {
    val a = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq((1L, a), (2L, a), (3L, a + " plus a distinct suffix"), (4L, "entirely different content"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.fingerprintFast(docs, "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // exact duplicates share BOTH keys — the dedup decision the md5
    // variant makes, at native-hash cost
    assert(out(1L) == out(2L))
    assert(out(1L)._1 != out(4L)._1)
    // doc 3's shingle set is a superset of doc 1's: its min can only be <=
    assert(out(3L)._2 <= out(1L)._2)
    assert(out(3L)._1 != out(1L)._1, "content hash must see the suffix")
  }

  test("zipf fit: recovers ~-1 on a synthetic zipfian corpus, partition-invariant") {
    // token w_r appears floor(1024/r) times: an exact-Zipf frequency
    // table, so the ln-ln regression must land near slope -1
    val words = (1 to 50).flatMap(r => Seq.fill(1024 / r)(s"w$r"))
    val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val fit = TextAnalysis.zipfFit(docs, "text", topN = 50).head()
    assert(fit.getLong(0) == 50L)
    val slope = fit.getDouble(1)
    assert(slope > -1.1 && slope < -0.9, s"zipfian corpus must fit near -1: $slope")
    // exact decimal sums: the fit is bit-identical under any partitioning
    val re = TextAnalysis.zipfFit(docs.repartition(7), "text", topN = 50).head()
    assert(re == fit, s"partitioning changed the fit: $re != $fit")
  }

  test("ppl buckets: per-language terciles, fluent third is head, nParts-invariant") {
    // 6 'en' docs spanning common -> hapax vocab (distinct NLLs): 2 per
    // tercile. The null-lang doc groups under '<none>' as a singleton
    // language, where the integer cut (rk*3 vs n) lands its one row in
    // 'tail' (3 > 1 and 3 > 2) — pinned so the closed form stays put.
    val docs = Seq(
      (1L, "en", "the the the the"),
      (2L, "en", "the the the cat"),
      (3L, "en", "the the cat sat"),
      (4L, "en", "the cat sat mat"),
      (5L, "en", "cat sat mat dog"),
      (6L, "en", "qqq www eee rrr"),
      (7L, null.asInstanceOf[String], "the the the the"))
      .toDF("doc_id", "lang", "text")
    for (nParts <- Seq(1, 3, 7)) {
      val out = TextAnalysis.pplBuckets(docs, "text", nParts)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      assert(out == Map(1L -> "head", 2L -> "head", 3L -> "middle",
        4L -> "middle", 5L -> "tail", 6L -> "tail", 7L -> "tail"),
        s"nParts=$nParts: $out")
    }
  }
}
