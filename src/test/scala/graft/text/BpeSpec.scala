package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BPE tokenizer train + encode: merge order and tie-breaks against a
  * hand-derived reference, greedy left-to-right application (including
  * the overlapping-pair case), and the encoder's behavior on words the
  * training corpus never saw.
  */
class BpeSpec extends SparkSpec {

  import spark.implicits._

  test("train derives the hand-computed merge sequence with deterministic tie-breaks") {
    // corpus: "the cat sat on the mat" / "the cat ate the rat" /
    // "a cat and a rat sat" — reference merges worked out by hand
    // (pair counts weighted by word count, ties broken (left, right)):
    // (a,t):9, (h,e):4, (t,he):4, (c,at):3, (r,at):2, (s,at):2
    val words = Seq(
      "the cat sat on the mat", "the cat ate the rat", "a cat and a rat sat")
      .toDF("text")
      .select(explode(Bpe.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val merges = Bpe.train(words, 6)
    assert(merges.map(m => (m.rank, m.left, m.right, m.pairCount)) == Seq(
      (1, "a", "t", 9L), (2, "h", "e", 4L), (3, "t", "he", 4L),
      (4, "c", "at", 3L), (5, "r", "at", 2L), (6, "s", "at", 2L)))
  }

  test("merge application is greedy left-to-right: 'aaaa' + (a,a) -> aa|aa, 'aaa' -> aa|a") {
    val merges = Seq(Bpe.Merge(1, "a", "a", 1L))
    val got = Seq("aaaa", "aaa", "baa", "aab")
      .toDF("w")
      .select(col("w"),
        Bpe.unwrap(Bpe.applyMerges(Bpe.wrapChars(col("w")), merges)).as("t"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(got("aaaa") == List("aa", "aa"))
    assert(got("aaa") == List("aa", "a"))
    // boundary safety: the trailing 'a' of 'b','a' never merges across
    // a token boundary with a neighboring token's leading char
    assert(got("baa") == List("b", "aa"))
    assert(got("aab") == List("aa", "b"))
  }

  test("trainBatched reproduces the hand-derived batched rounds on the same corpus") {
    // same corpus as the exact trainer's test; hand-derived with
    // M=4, pool=16. Round 1 raw pair counts: (a,t):9, (h,e):4,
    // (t,h):4, (c,a):3, (r,a):2, (s,a):2, (a,n):1, (m,a):1, (n,d):1,
    // (o,n):1, (t,e):1. Greedy: accept (a,t); accept (h,e); (t,h)
    // shares t; (c,a)/(r,a)/(s,a)/(a,n)/(m,a) share a; accept (n,d);
    // (o,n) shares n; (t,e) shares both -> round 1 = 3 merges (pool
    // dry before the batch fills). Round 2 over [t,he]/[c,at]/[s,at]/
    // [o,n]/[m,at]/[at,e]/[r,at]/[a,nd]/[a]: (t,he):4, (c,at):3,
    // (r,at):2, (s,at):2, (a,nd):1, (at,e):1, (m,at):1, (o,n):1 ->
    // accept (t,he), (c,at), skip (r,at)/(s,at) [at], accept (a,nd),
    // skip (at,e)/(m,at), accept (o,n) -> batch FULL at 4. Round 3:
    // (r,at):2, (s,at):2, (at,e):1, (m,at):1 -> accept (r,at), rest
    // share at -> 1 merge.
    val words = Seq(
      "the cat sat on the mat", "the cat ate the rat", "a cat and a rat sat")
      .toDF("text")
      .select(explode(Bpe.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
    val got = Bpe.trainBatched(words, rounds = 3, batch = 4, pool = 16)
      .map(m => (m.round, m.idx, m.left, m.right, m.pairCount))
    assert(got == Seq(
      (1, 1, "a", "t", 9L), (1, 2, "h", "e", 4L), (1, 3, "n", "d", 1L),
      (2, 1, "t", "he", 4L), (2, 2, "c", "at", 3L), (2, 3, "a", "nd", 1L),
      (2, 4, "o", "n", 1L),
      (3, 1, "r", "at", 2L)))
  }

  test("trainBatched with batch=1, pool=1 degenerates to the exact trainer") {
    // one accepted merge per round from a one-candidate pool IS the
    // exact argmax loop — the relaxation must vanish at M=1, so the
    // batched trainer inherits the exact trainer's entire test weight
    // (tie-breaks, greedy application, count bookkeeping) at that point
    for (corpus <- Seq(
      Seq("the cat sat on the mat", "the cat ate the rat", "a cat and a rat sat"),
      Seq("ab ab abc abcd", "zz zzz z", "banana bandana"))) {
      val words = corpus.toDF("text")
        .select(explode(Bpe.words(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      val exact = Bpe.train(words, 6)
        .map(m => (m.rank, m.left, m.right, m.pairCount))
      val batched = Bpe.trainBatched(words, rounds = 6, batch = 1, pool = 1)
        .map(m => (m.round, m.left, m.right, m.pairCount))
      assert(batched == exact,
        s"M=1 batched trainer must equal the exact trainer on $corpus:\n" +
          s"  exact  =$exact\n  batched=$batched")
      assert(Bpe.trainBatched(words, rounds = 6, batch = 1, pool = 1)
        .forall(_.idx == 1), "one merge per round must carry idx 1")
    }
  }

  test("greedySelect rejects token-sharing AND produced-token candidates, caps at batch") {
    // (a,bc) accepted -> produced token 'abc'; (ab,c) has neither side
    // used but WOULD produce/consume 'abc' -> the l+r rule rejects it
    // (without it, simultaneous application would be order-dependent:
    // '<a><b><c>' under (a,bc) vs (ab,c) first differs)
    val got = Bpe.greedySelect(Seq(
      ("a", "bc", 10L),   // accept
      ("ab", "c", 9L),    // reject: produced token abc already used
      ("bc", "d", 8L),    // reject: bc used
      ("x", "y", 7L),     // accept
      ("q", "xy", 6L),    // reject: produced token xy of (x,y) is used
      ("m", "n", 5L),     // accept
      ("p", "q", 4L),     // accept -> batch full
      ("u", "v", 3L)),    // would accept, but batch = 4
      batch = 4)
    assert(got == Seq(("a", "bc", 10L), ("x", "y", 7L), ("m", "n", 5L), ("p", "q", 4L)))
  }

  test("merges never fire out of rank order and compose on unseen words") {
    // (h,e) then (t,he): "then" (unseen as a word) still segments to
    // [the, n] because the merges apply by rank, not by training vocab
    val merges = Seq(Bpe.Merge(1, "h", "e", 1L), Bpe.Merge(2, "t", "he", 1L))
    val enc = Bpe.encodeCounts(
      Seq((1L, "then the theorem"), (2L, ""), (3L, "!!!")).toDF("doc_id", "text"),
      "text", "doc_id", merges)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toList
    // "then"->[the,n]=2, "the"->[the]=1, "theorem"->[the,o,r,e,m]=5;
    // docs 2 and 3 normalize to zero words and drop
    assert(enc == List((1L, 3, 8)))
  }
}
