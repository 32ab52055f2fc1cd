package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The vocab-scale BPE encoder (BpeMergeTable min-rank-first merging +
  * the BpeTokenCounts codegen expression) against the replace-chain
  * encoder it must reproduce:
  *
  *  1. bit-level differential on trained models at small K — per-word
  *     WRAPPED TOKEN STRINGS, not just counts, over both in-corpus and
  *     unseen words (including the overlapping-pair left-to-right case);
  *  2. registry-shape differential: encodeCountsScaled == encodeCounts
  *     frame-for-frame on the sf0.001 corpus;
  *  3. the SCALE leg the chain cannot take: a K ≥ 256 batched-trained
  *     vocab, encoded over the sf0.1 corpus through the expression path,
  *     with a plain-JVM replace-chain reference confirming bit-parity on
  *     sampled words (the chain reference is linear code, so K doesn't
  *     blow it up the way a K-deep Catalyst expression tree would).
  */
class BpeScaledSpec extends SparkSpec {

  import spark.implicits._

  /** The shared JVM reference for replace-chain semantics. */
  private def chainRef(word: String, merges: Seq[Bpe.Merge]): String =
    BpeChainRef(word, merges)

  private def trainOn(texts: Seq[String], k: Int): Seq[Bpe.Merge] = {
    val wc = texts.toDF("text")
      .select(explode(Bpe.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    Bpe.train(wc, k)
  }

  test("min-rank-first == replace chain, per-word wrapped strings, trained K=12") {
    val corpus = Seq(
      "the cat sat on the mat and the rat ate the oats",
      "that cat chased the rat that sat on that mat",
      "a tattered hat sat atop the cattle gate",
      "state estate rotate the patterned letter better")
    val merges = trainOn(corpus, 12)
    assert(merges.size == 12)
    val table = Bpe.mergeTable(merges)
    // in-corpus words, unseen words, overlap shapes, singles
    val words = (corpus.flatMap(_.split(" ")) ++ Seq(
      "attestation", "concatenate", "aaaa", "aaa", "tttt", "q", "zzz",
      "thethethe", "catcatcat", "atatat", "mattress", "untranslatable"))
      .distinct
    words.foreach { w =>
      assert(table.encodeWrapped(w) == chainRef(w, merges),
        s"scaled encoder diverges from replace chain on '$w'")
    }
  }

  test("differential on random words against a trained model") {
    val rnd = new scala.util.Random(20260816)
    val alphabet = "aetoshr" // small alphabet → dense merge interactions
    def randWord(n: Int): String =
      (1 to n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val corpusWords = (1 to 300).map(_ => randWord(3 + rnd.nextInt(8)))
    val merges = trainOn(Seq(corpusWords.mkString(" ")), 16)
    assert(merges.size == 16)
    val table = Bpe.mergeTable(merges)
    val probes = (1 to 400).map(_ => randWord(1 + rnd.nextInt(14)))
    (corpusWords ++ probes).foreach { w =>
      assert(table.encodeWrapped(w) == chainRef(w, merges),
        s"scaled encoder diverges from replace chain on random word '$w'")
    }
  }

  test("encodeCountsScaled == encodeCounts frame-for-frame at sf0.001 (expression path)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 3 === 1)
    val wc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") % 3 === 0)
      .select(explode(Bpe.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val merges = Bpe.train(wc, 8)
    def key(r: org.apache.spark.sql.Row) = (r.getLong(0), r.getInt(1), r.getInt(2))
    val chain = Bpe.encodeCounts(docs, "text", "doc_id", merges)
      .collect().map(key).toSet
    val scaled = Bpe.encodeCountsScaled(docs, "text", "doc_id", merges)
      .collect().map(key).toSet
    assert(chain.nonEmpty && scaled == chain)
  }

  test("K >= 256 vocab: batched-trained model encodes the sf0.1 corpus, bit-parity vs chain reference") {
    // the testdata corpus is generated from a 31-word vocabulary, so
    // REAL training saturates near 89 merges (every word collapses to
    // one token) — a >=256-merge model cannot come from that corpus
    // alone. The point of this leg is MODEL size, so extend the
    // word-count table: the real sf0.1 vocabulary with its real counts
    // (the early merges learn the real words' subword structure and
    // fire densely on the real corpus below) plus deterministic
    // two-word compounds (once the base words collapse to single
    // tokens, compound-boundary pairs keep supplying merges well past
    // 256 — the same long-tail shape a real 32k vocab has).
    val realWc = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .filter(col("doc_id") % 3 === 0)
      .select(explode(Bpe.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rnd = new scala.util.Random(42)
    val compounds = (1 to 1500).map { _ =>
      (realWc(rnd.nextInt(realWc.length))._1 + realWc(rnd.nextInt(realWc.length))._1,
        1L + rnd.nextInt(20))
    }.groupBy(_._1).map { case (w, vs) => (w, vs.head._2) }.toSeq
    val wc = (realWc.toSeq ++ compounds).toDF("word", "cnt")
    val batched = Bpe.trainBatched(wc, rounds = 20, batch = 16, pool = 512)
    val merges = batched.zipWithIndex.map { case (b, i) =>
      Bpe.Merge(i + 1, b.left, b.right, b.pairCount)
    }
    assert(merges.size >= 256, s"expected a >=256-merge vocab, got ${merges.size}")
    val table = Bpe.mergeTable(merges)

    // the scale leg: the K-deep chain is not viable as an expression
    // tree, the reference-object expression is — run it over sf0.1
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val enc = Bpe.encodeCountsScaled(docs, "text", "doc_id", merges)
      .collect()
    assert(enc.length > 4000, s"sf0.1 corpus should encode >4000 docs, got ${enc.length}")
    enc.foreach { r =>
      assert(r.getInt(2) >= 1 && r.getInt(2) <= r.getInt(1) * 100,
        s"doc ${r.getLong(0)}: implausible token count ${r.getInt(2)} for ${r.getInt(1)} words")
      assert(r.getInt(2) >= r.getInt(1),
        s"doc ${r.getLong(0)}: fewer tokens (${r.getInt(2)}) than words (${r.getInt(1)})")
    }

    // bit-parity at K >= 256: JVM chain reference on sampled corpus words
    // the corpus vocabulary is only 31 words — parity-check ALL of
    // them plus the trainer's compound words (where the deep merges
    // actually live) and unseen compounds
    val sample = docs
      .select(explode(Bpe.words(col("text"))).as("w"))
      .distinct().collect().map(_.getString(0))
    val unseen = (1 to 200).map { _ =>
      sample(rnd.nextInt(sample.length)) + sample(rnd.nextInt(sample.length))
    }
    val probes = (sample ++ compounds.map(_._1) ++ unseen).distinct
    assert(probes.length > 500)
    probes.foreach { w =>
      assert(table.encodeWrapped(w) == chainRef(w, merges),
        s"K=${merges.size} scaled encoder diverges from chain reference on '$w'")
    }
  }
}
