package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (3L, "the quick brown fox jumps over the sleepy dog"), // near dup
    (4L, "entirely different content about spark engines"),
    (5L, "short"))
    .toDF("doc_id", "text")

  test("exact dedup groups identical content, keeps the lowest doc_id") {
    val out = Dedup.exact(docs, "text")
    assert(out.count() == 4) // 1+2 collapse
    val dup = out.filter($"copies" === 2).head()
    assert(dup.getAs[Long]("keep_doc_id") == 1L)
  }

  test("shingling: distinct word n-grams; short docs yield empty sets") {
    val sh = Dedup.shingled(docs, "text", 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(sh(1L).contains("the quick brown"))
    assert(sh(1L).size == 7) // 9 tokens -> 7 trigrams, all distinct
    assert(sh(5L).isEmpty) // 1 token < n
  }

  test("jaccard pairs find exact and near duplicates with correct scores") {
    val pairs = Dedup.jaccardPairs(Dedup.shinglePostings(docs, "text", 3), 0.3)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(pairs((1L, 2L)) == 1.0) // identical
    // docs 1 and 3 differ in one token, which perturbs the last 2 of 7
    // trigrams: shared 5, union 9 -> 5/9
    assert(pairs.contains((1L, 3L)) && pairs((1L, 3L)) == 0.555556)
    assert(!pairs.keys.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhash LSH surfaces the same high-similarity pairs as exact jaccard") {
    val out = Dedup.minhashLshPairs(docs, "text", n = 3, rowsPerBand = 2, minJaccard = 0.4)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(out.contains((1L, 2L))) // identical docs always collide
    // every reported pair is verified >= 0.4, so no false positives
    assert(out.subsetOf(Set((1L, 2L), (1L, 3L), (2L, 3L))))
  }

  test("simhash: identical docs share signatures; unrelated docs differ") {
    val sigs = Dedup.simhash(docs, "text").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("simhash")).toMap
    assert(sigs(1L) == sigs(2L))
    assert(sigs(1L) != sigs(4L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sigs(1L), sigs(3L)) < hamming(sigs(1L), sigs(4L)))
  }

  test("embedding near-dup pairs respect the blocking key and threshold") {
    val emb = Seq(
      (1L, 0, Seq(1.0f, 0.0f)), (2L, 0, Seq(1.0f, 0.1f)), // same block, similar
      (3L, 0, Seq(-1.0f, 0.0f)), // same block, opposite
      (4L, 1, Seq(1.0f, 0.0f))) // other block: never paired with 1
      .toDF("vec_id", "label", "embedding")
    val out = Dedup.embeddingPairs(emb, "label", minCos = 0.9)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSet
    assert(out == Set((1L, 2L)))
  }

  test("sub-blocked embedding pairing is exhaustive and duplicate-free for any k") {
    import org.apache.spark.sql.functions.rand
    // 30 vectors in ONE block: every pair must appear exactly once
    // whether or not the skew guard splits the block
    val emb = (1L to 30L).map(i =>
      (i, 0, Seq((i % 7).toFloat + 1f, (i % 5).toFloat - 2f, (i % 3).toFloat)))
      .toDF("vec_id", "label", "embedding")
    def pairs(k: Int) = Dedup.embeddingPairs(emb, "label", minCos = -1.0, subBlocks = k)
      .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSeq
    val base = pairs(1)
    assert(base.size == 30 * 29 / 2 && base.distinct.size == base.size)
    for (k <- Seq(2, 4, 7)) {
      val p = pairs(k)
      assert(p.distinct.size == p.size, s"k=$k produced duplicate pairs")
      assert(p.toSet == base.toSet, s"k=$k changed the pair set")
    }
  }

  test("auto sub-block k engages on a hot block and leaves the pair set identical") {
    // skewed fixture: one hot label (24 vectors) + small labels; a pair
    // budget of 50 makes the hot block's 24^2 = 576 candidate pairs
    // overflow one join cell, so the guard must split (k = ceil(576/50))
    val emb = ((1L to 24L).map(i => (i, 0)) ++ Seq((30L, 1), (31L, 1), (40L, 2)))
      .map { case (i, lbl) =>
        (i, lbl, Seq((i % 7).toFloat + 1f, (i % 5).toFloat - 2f, (i % 3).toFloat)) }
      .toDF("vec_id", "label", "embedding")
    val prevBudget = Dedup.maxPairsPerCell
    Dedup.maxPairsPerCell = 50L
    try {
      assert(Dedup.autoSubBlocks(emb, "label") == 12) // ceil(576/50)
      val auto = Dedup.embeddingPairs(emb, "label", minCos = -1.0) // default: auto
        .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSeq
      val unsplit = Dedup.embeddingPairs(emb, "label", minCos = -1.0, subBlocks = 1)
        .collect().map(r => (r.getAs[Long]("vec_a"), r.getAs[Long]("vec_b"))).toSeq
      assert(auto.distinct.size == auto.size, "auto-k produced duplicate pairs")
      assert(auto.toSet == unsplit.toSet, "auto-k changed the pair set")
    } finally Dedup.maxPairsPerCell = prevBudget
    // production budget: small blocks never trigger a split
    assert(Dedup.autoSubBlocks(emb, "label") == 1)
    // empty corpus is well-defined
    assert(Dedup.autoSubBlocks(emb.filter($"vec_id" < 0), "label") == 1)
  }

  test("incremental pairs: only pairs touching the new batch, each exactly once") {
    // 1~2 both OLD (excluded), 3 NEW ~ 4 OLD (kept, new id < old id),
    // 5 OLD ~ 6 NEW (kept), 7~8 both NEW (kept exactly once)
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"),
      (4L, "one two three four five six seven"),
      (5L, "red orange yellow green blue indigo"),
      (6L, "red orange yellow green blue indigo"),
      (7L, "north south east west up down around"),
      (8L, "north south east west up down around"))
      .toDF("doc_id", "text")
    val newIds = Seq(3L, 6L, 7L, 8L).toDF("doc_id")
    val got = Dedup.incrementalJaccardPairs(
        Dedup.shinglePostings(corpus, "text"), newIds, minJaccard = 0.9)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == got.distinct.length, "a pair was emitted twice")
    assert(got.toSet == Set((3L, 4L), (5L, 6L), (7L, 8L)))
  }

  test("persisted minhash index: delta pairs only, corpus never re-hashed pairs") {
    // corpus: 1~2 identical (settled history — must NOT re-report);
    // delta: 9 identical to both, 10 unrelated. Expected: (1,9), (2,9)
    // and nothing else — the stored buckets serve corpus candidates,
    // the delta hashes only itself.
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (4L, "entirely different content about spark engines"))
      .toDF("doc_id", "text")
    val delta = Seq(
      (9L, "the quick brown fox jumps over the lazy dog"),
      (10L, "totally novel text neither corpus doc resembles at all"))
      .toDF("doc_id", "text")
    val stored = Dedup.bandBuckets(
      Dedup.minhashSignature(Dedup.shinglePostings(corpus, "text", 3)), rowsPerBand = 2)
    val deltaB = Dedup.bandBuckets(
      Dedup.minhashSignature(Dedup.shinglePostings(delta, "text", 3)), rowsPerBand = 2)
    val all = corpus.unionByName(delta)
    val got = Dedup.minhashPersistedPairs(stored, deltaB,
        Dedup.shinglePostings(all, "text", 3), minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet == Set((1L, 9L), (2L, 9L)),
      s"delta-only pairs expected: $got")
    assert(got.values.forall(_ == 1.0), s"identical docs must verify at 1.0: $got")
  }

  test("hot-bucket cap skips the degenerate bucket's quadratic pairs, keeps cold pairs") {
    // 40 identical boilerplate docs share every band bucket -> the
    // uncapped self-join yields all 780 boilerplate pairs (plus the one
    // real pair); capped at 3, the hot buckets are skipped and ONLY the
    // cold 2-member bucket's pair survives - the B^2/2 blowup is the
    // thing the cap exists to stop
    val boiler = (1L to 40L).map(i =>
      (i, "lorem ipsum dolor sit amet boilerplate page footer text"))
    val real = Seq(
      (101L, "a unique sentence about spark physical plans today"),
      (102L, "a unique sentence about spark physical plans today"))
    val docs = (boiler ++ real).toDF("doc_id", "text")
    val uncapped = Dedup.minhashLshPairs(docs, "text", 3, 2, minJaccard = 0.9).count()
    assert(uncapped == 40L * 39 / 2 + 1, s"expected 781 uncapped pairs, got $uncapped")
    val capped = Dedup.minhashLshPairsCapped(
        docs, "text", 3, 2, minJaccard = 0.9, maxBucket = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((101L, 102L)),
      s"cap must drop the hot bucket's pairs and keep the cold pair: $capped")
  }

  test("capped LSH == uncapped when the cap exceeds every bucket; subset otherwise") {
    // random docs (seeded): with the cap above the largest bucket the
    // two operators must agree pair-for-pair (the cap path is a pure
    // candidate filter); with a tight cap the result must be a subset
    // (the cap can only DROP candidates, never invent or rescore them)
    val rnd = new scala.util.Random(17)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    def doc(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val base = (1L to 30L).map(i => (i, doc(6 + rnd.nextInt(6))))
    // planted duplicate cluster -> at least one genuinely hot bucket
    val dups = (101L to 106L).map(i => (i, base.head._2))
    val docs = (base ++ dups).toDF("doc_id", "text")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val uncapped = pairs(Dedup.minhashLshPairs(docs, "text", 3, 2, minJaccard = 0.3))
    val loose = pairs(Dedup.minhashLshPairsCapped(
      docs, "text", 3, 2, minJaccard = 0.3, maxBucket = 1000))
    assert(loose == uncapped, "a never-binding cap must be a no-op")
    val tight = pairs(Dedup.minhashLshPairsCapped(
      docs, "text", 3, 2, minJaccard = 0.3, maxBucket = 3))
    assert(tight.subsetOf(uncapped), "the cap may only drop pairs")
    assert(tight.size < uncapped.size, "the planted 7-dup cluster must trip a cap=3 bucket")
  }

  test("cap stats report exactly the buckets and pair volume the cap skips") {
    // same fixture as the cap test: 40 identical boilerplate docs (one
    // hot bucket per band) + 1 identical real pair (one cold 2-member
    // bucket per band). Per band the telemetry must read: 2 buckets,
    // 1 skipped, 781 total candidate pairs (40·39/2 + 1), 780 skipped —
    // the "no silent caps" surface quantifying what the capped operator
    // above dropped
    val boiler = (1L to 40L).map(i =>
      (i, "lorem ipsum dolor sit amet boilerplate page footer text"))
    val real = Seq(
      (101L, "a unique sentence about spark physical plans today"),
      (102L, "a unique sentence about spark physical plans today"))
    val docs = (boiler ++ real).toDF("doc_id", "text")
    val stats = Dedup.minhashLshCapStats(docs, "text", 3, 2, maxBucket = 3)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6))).toMap
    assert(stats.keySet == Set(0, 1, 2, 3), s"one row per band: $stats")
    val expectedFrac = math.round(780.0 / 781.0 * 1e6) / 1e6
    stats.foreach { case (band, s) =>
      assert(s == ((2L, 1L, 781L, 780L, 0.5, expectedFrac)),
        s"band $band stats off: $s")
    }
    // never-binding cap -> zero skipped everywhere, fractions 0
    val loose = Dedup.minhashLshCapStats(docs, "text", 3, 2, maxBucket = 1000)
      .collect()
    assert(loose.forall(r => r.getLong(2) == 0L && r.getLong(4) == 0L &&
      r.getDouble(5) == 0.0 && r.getDouble(6) == 0.0),
      "a never-binding cap must report zero skips")
  }

  test("cdc containment pairs an offset excerpt with its source; df cap kills boilerplate blowup") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet")
    def prose(n: Int) = (1 to n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val source = prose(120) // ~700 chars -> several bounded chunks
    // the excerpt is a long MIDDLE slice of the source at a different
    // offset (prefix changes everything a fixed-window scheme keys on)
    val excerpt = "totally new leading words here " + source.substring(180, 650)
    val noise = (10L to 19L).map(i => (i, prose(80)))
    val boiler = (100L to 139L).map(i => (i, "identical boilerplate page " * 12))
    val docs = (Seq((1L, source), (2L, excerpt)) ++ noise ++ boiler)
      .toDF("doc_id", "text")
    // BOTH hash families must satisfy the operator's invariants: the
    // md5 variant is the oracle/registry default, the xxhash64 variant
    // the production default (boundaries differ between hashes, so the
    // exact pair sets are family-specific - the CONTRACT is not)
    for (fast <- Seq(false, true)) {
      val pairs = Dedup.cdcContainmentPairs(docs, "text", maxDf = 8,
          fastHash = fast)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      // shift robustness: the offset excerpt shares its unedited spans'
      // chunk keys with the source -> the pair MUST surface, containment
      // measured against the smaller (excerpt) side
      val (shared, containment) = pairs.getOrElse((1L, 2L),
        fail(s"excerpt/source pair missing (fast=$fast): ${pairs.keySet}"))
      assert(shared >= 2, s"expected >=2 shared chunk keys (fast=$fast), got $shared")
      assert(containment >= 0.5,
        s"an excerpt must score high containment vs its source (fast=$fast): $containment")
      // df cap: 40 identical boilerplate docs share every chunk key at
      // df=40 > 8 -> ALL their keys are capped and none of the 780
      // boilerplate pairs may appear
      assert(!pairs.keySet.exists { case (a, b) => a >= 100L && b >= 100L },
        s"boilerplate pairs must be df-capped away (fast=$fast): ${pairs.keySet}")
    }
  }

  test("index compaction folds delta dirs and leaves probe verdicts bit-identical") {
    // seed + two fragmenting appends, then compact both index tables —
    // the probe's pairs (and jaccards) must be THE SAME frame before
    // and after: compaction may only change file layout, never content
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "entirely different content about spark engines today"))
      .toDF("doc_id", "text")
    val d1 = Seq((11L, "the quick brown fox jumps over the lazy dog")).toDF("doc_id", "text")
    val d2 = Seq((12L, "entirely different content about spark engines today")).toDF("doc_id", "text")
    val wh = java.nio.file.Files.createTempDirectory("graft_mh_cpt").toString
    val bT = graft.sink.SnapshotTable(wh, "dedup", "buckets")
    val pT = graft.sink.SnapshotTable(wh, "dedup", "postings")
    def ingest(df: org.apache.spark.sql.DataFrame, first: Boolean): Unit = {
      val p = Dedup.shinglePostings(df, "text", 3)
      val bk = Dedup.bandBuckets(Dedup.minhashSignature(p), rowsPerBand = 2)
      if (first) { bT.overwrite(bk): Unit; pT.overwrite(p): Unit }
      else { bT.append(bk): Unit; pT.append(p): Unit }
    }
    ingest(corpus, first = true); ingest(d1, first = false); ingest(d2, first = false)
    val probe = Seq(
      (21L, "the quick brown fox jumps over the lazy dog"),
      (22L, "entirely different content about spark engines today"),
      (23L, "a totally unrelated probe document about nothing")).toDF("doc_id", "text")
    val pp = Dedup.shinglePostings(probe, "text", 3)
    val pb = Dedup.bandBuckets(Dedup.minhashSignature(pp), rowsPerBand = 2)
    def pairs() = Dedup.minhashPersistedPairs(bT.read(spark), pb,
        pT.read(spark).unionByName(pp), minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val before = pairs()
    assert(before == Set((1L, 21L, 1.0), (11L, 21L, 1.0), (2L, 22L, 1.0), (12L, 22L, 1.0)),
      s"probe verdicts before compaction: $before")
    val bDirs = bT.currentSnapshot.get.dataDirs.size
    assert(bDirs == 3 && pT.currentSnapshot.get.dataDirs.size == 3)
    assert(bT.compact(spark).operation == "replace")
    assert(pT.compact(spark).operation == "replace")
    assert(bT.currentSnapshot.get.dataDirs.size < bDirs)
    assert(pairs() == before, "compaction changed probe verdicts")
  }

  test("decontamination flags shared rare n-grams; df cap mutes common phrases") {
    import org.apache.spark.sql.functions.{col, lit}
    val docs = Seq(
      (100L, "the quick brown fox jumps over the lazy dog tonight"), // benchmark
      (1L, "he saw the quick brown fox jumps over a fence"), // 4 shared 3-grams
      (2L, "completely unrelated text about spark physical plans"), // clean
      (3L, "the lazy dog sat still"), // 1 shared 3-gram < minCommon
      // 4 shares ONLY the phrase every doc below carries (df > cap)
      (4L, "alpha beta gamma delta lazy dog tonight"),
      (5L, "alpha beta gamma unrelated one"),
      (6L, "alpha beta gamma unrelated two"))
      .toDF("doc_id", "text")
    // make "alpha beta gamma" frequent ALSO relative to bench: add it there
    val withPhrase = docs.union(
      Seq((101L, "alpha beta gamma benchmark prompt please answer")).toDF("doc_id", "text"))
    val out = Dedup.contaminationPairs(
        Dedup.shinglePostings(withPhrase, "text"),
        benchPred = col("doc_id") >= lit(100L), minCommon = 3, maxDf = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.map(t => (t._1, t._2)).toSet == Set((1L, 100L)),
      s"expected exactly the contaminated pair: ${out.toSeq}")
    assert(out.head._3 >= 3)
  }

  test("containment catches a short doc embedded in a long one; jaccard misses it") {
    val quote = "the five boxing wizards jump quickly"
    val docs = Seq(
      (1L, quote), // 6 tokens -> 4 trigrams, all inside doc 2
      (2L, s"a long article that quotes $quote and then continues with many " +
        "further original sentences about completely different material"),
      (3L, "unrelated document about engines"))
      .toDF("doc_id", "text")
    val postings = Dedup.shinglePostings(docs, "text", 3)
    val cont = Dedup.containmentPairs(postings, minContainment = 0.9, maxDf = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    assert(cont.toSeq == Seq((1L, 2L, 1.0)), s"full embedding scores 1.0: ${cont.toSeq}")
    // the same pair under jaccard: 4 common / (4 + 22 - 4) trigrams ~ 0.18
    val jac = Dedup.jaccardPairs(postings, minJaccard = 0.5, maxDf = 10).collect()
    assert(jac.isEmpty, "union-normalized jaccard misses the embedded quote")
  }

  test("decontamination at 13-token spans: one shared span flags, shorter overlap doesn't") {
    import org.apache.spark.sql.functions.{col, lit}
    // a 13-token eval answer span
    val span = "a b c d e f g h i j k l m"
    val docs = Seq(
      (100L, s"eval question prompt $span"), // benchmark doc
      // training doc that memorized the full eval span -> contaminated
      (1L, s"some unrelated preamble $span and a trailing remark"),
      // shares only a 5-token prefix of the span -> no 13-token span match
      (2L, "other text a b c d e continues differently here now with more words"),
      (3L, "completely clean training document about engines"))
      .toDF("doc_id", "text")
    Dedup.clearCaches() // span postings key on the same plan as other specs' docs
    val out = Dedup.decontaminate(docs, "text",
        benchPred = col("doc_id") >= lit(100L)) // defaults: 13-token span, minCommon 1
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSet == Set((1L, 100L)),
      s"only the full-span copy is contamination: ${out.toSeq}")
    Dedup.clearCaches()
  }

  test("connected components: min-label fixpoint over chains, cliques and pairs") {
    // components: chain 1-2-3-4 (diameter 3, exercises multiple rounds),
    // triangle 10-11-12, isolated pair 20-21
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(
      (1L, 1L, 4L), (2L, 1L, 4L), (3L, 1L, 4L), (4L, 1L, 4L),
      (10L, 10L, 3L), (11L, 10L, 3L), (12L, 10L, 3L),
      (20L, 20L, 2L), (21L, 20L, 2L)))
  }

  test("connected components: non-convergence within maxIter fails loudly") {
    // chain 1-2-3-...-8 has diameter 7; min-label propagation moves the
    // min one hop per round, so maxIter=2 cannot converge — consuming the
    // split labels as dedup groups would silently under-merge
    val chain = (1L to 7L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 2).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // the same graph converges fine with an adequate budget
    val ok = Dedup.connectedComponents(chain, maxIter = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ok == (1L to 8L).map(i => (i, 1L, 8L)).toSet)
  }

  test("minhash LSH differential on random docs: no false positives, exact dups never missed, persisted split agrees") {
    // random docs from a tiny vocab (so near-dups actually occur) plus
    // planted exact clones. Three contracts over unshaped inputs:
    //  1. every reported pair verifies: its jaccard equals the exact
    //     driver-side jaccard and clears the threshold (no false pos);
    //  2. exact clones (jaccard 1.0, identical signatures) are NEVER
    //     missed — they collide on every band;
    //  3. the persisted-index split (corpus = even ids, delta = odd)
    //     reports exactly the full run's delta-touching pairs.
    val rng = new scala.util.Random(42L)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    val bodies = (0 until 16).map(i =>
      i.toLong -> Seq.fill(8)(vocab(rng.nextInt(vocab.size))).mkString(" "))
    val clones = Seq(100L -> bodies(3)._2, 101L -> bodies(8)._2)
    val all = bodies ++ clones
    val docs = all.toDF("doc_id", "text")
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val exact = (for {
      (a, ta) <- all; (b, tb) <- all if a < b
      sa = shingles(ta); sb = shingles(tb)
      j = sa.intersect(sb).size.toDouble / sa.union(sb).size
    } yield (a, b) -> math.rint(j * 1e6) / 1e6).toMap
    val got = Dedup.minhashLshPairs(docs, "text", n = 3, rowsPerBand = 2, minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    got.foreach { case (p, j) =>
      assert(exact(p) == j && j >= 0.4, s"false positive or wrong score: $p -> $j vs ${exact(p)}")
    }
    assert(got.contains((3L, 100L)) && got((3L, 100L)) == 1.0)
    assert(got.contains((8L, 101L)) && got((8L, 101L)) == 1.0)
    // persisted split: corpus = even doc_ids, delta = odd — its output
    // must equal the full run restricted to pairs touching the delta
    val corpus = docs.filter($"doc_id" % 2 === 0)
    val delta = docs.filter($"doc_id" % 2 === 1)
    val cb = Dedup.bandBuckets(
      Dedup.minhashSignature(Dedup.shinglePostings(corpus, "text", 3)), rowsPerBand = 2)
    val db = Dedup.bandBuckets(
      Dedup.minhashSignature(Dedup.shinglePostings(delta, "text", 3)), rowsPerBand = 2)
    val split = Dedup.minhashPersistedPairs(cb, db,
        Dedup.shinglePostings(docs, "text", 3), minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val wantSplit = got.filter { case ((a, b), _) => a % 2 == 1 || b % 2 == 1 }
    assert(split == wantSplit,
      s"persisted split must equal the full run's delta-touching pairs:\n  split=$split\n  want =$wantSplit")
  }

  test("connected components: differential vs union-find on seeded random graphs") {
    // the distributed min-label fixpoint against a driver-side
    // union-find reference over graphs nobody hand-shaped: random
    // densities from near-forest (long chains, many rounds) to dense
    // (few components, fast convergence)
    def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      (0L until n).map(i => i -> find(i)).toMap
    }
    val rng = new scala.util.Random(16L)
    for (round <- 1 to 4) {
      val n = 30
      val nEdges = Seq(12, 20, 35, 60)(round - 1)
      val edges = Seq.fill(nEdges)(
        (rng.nextInt(n).toLong, rng.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val expect = unionFind(n, edges)
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // only nodes with at least one edge appear in the distributed output
      val touched = edges.flatMap(e => Seq(e._1, e._2)).toSet
      assert(got.keySet == touched,
        s"round $round: node set mismatch (edges=$edges)")
      touched.foreach { v =>
        assert(got(v) == expect(v),
          s"round $round: node $v label ${got(v)} != union-find ${expect(v)} (edges=$edges)")
      }
    }
  }

  test("connected components: empty pair set yields an empty, well-typed frame") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(empty)
    assert(out.columns.toSeq == Seq("doc_id", "cluster_id", "cluster_size"))
    assert(out.count() == 0)
  }

  test("substring spans: cross-doc repeated windows merge into maximal spans") {
    val shared = (1 to 14).map(i => s"w$i").mkString(" ")
    val fix = Seq(
      (1L, shared + " unique1 tail1 a b"), // dup windows start 0,1,2
      (2L, "lead2 x " + shared + " ending2"), // dup windows start 2,3,4
      (3L, "totally different words " + (1 to 12).map(i => s"z$i").mkString(" ")))
      .toDF("doc_id", "text")
    val spans = Dedup.substringSpans(fix, "text", w = 12).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSet
    // three overlapping duplicated windows merge into ONE [start, end) span
    // per doc; the clean doc emits nothing
    assert(spans == Set((1L, 0, 14, 14), (2L, 2, 16, 14)))
  }

  test("substring spans: within-doc repeats are duplication; disjoint runs stay split") {
    val run = (1 to 12).map(i => s"r$i").mkString(" ")
    val fix = Seq((7L, run + " mid " + run)).toDF("doc_id", "text")
    val spans = Dedup.substringSpans(fix, "text", w = 12).collect()
      .map(r => (r.getInt(1), r.getInt(2))).toSet
    // the run occurs at token 0 and token 13: two islands (13 > 0 + 12),
    // windows crossing 'mid' are unique and never bridge them
    assert(spans == Set((0, 12), (13, 25)))
  }

  test("cluster canonicalization keeps the best-quality copy, not the min id") {
    val clusters = Seq((1L, 1L, 3L), (2L, 1L, 3L), (3L, 1L, 3L), (9L, 9L, 1L))
      .toDF("doc_id", "cluster_id", "cluster_size")
    val quality = Seq((1L, 0.4), (2L, 0.9), (3L, 0.9), (9L, 0.1))
      .toDF("doc_id", "quality_score")
    val out = Dedup.canonicalByQuality(clusters, quality).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    // doc 2 wins cluster 1 (best score; the tie vs doc 3 breaks to the
    // lower id); a singleton keeps its only member regardless of score
    assert(out == Map(1L -> false, 2L -> true, 3L -> false, 9L -> true))
  }

  test("contamination spans point at the exact leaked positions per eval doc") {
    val fix = Seq(
      (1L, "xx yy alpha beta gamma delta zz ww"), // leak at tokens [2, 6)
      (2L, "totally unrelated words here right now"),
      (100L, "alpha beta gamma delta epsilon")) // the benchmark doc
      .toDF("doc_id", "text")
    val spans = Dedup.contaminationSpans(fix, "text",
        benchPred = col("doc_id") >= 100L, spanTokens = 3, maxDf = 20)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
      .toSet
    // grams at starts 2 and 3 are shared -> one merged island [2, 6);
    // the clean doc pairs with nothing, bench docs never self-report
    assert(spans == Set((1L, 100L, 2, 6, 4)))
  }

  test("substring apply: covered tokens cut, survivors rejoin in order") {
    val shared = (1 to 14).map(i => s"w$i").mkString(" ")
    val fix = Seq(
      (1L, shared + " unique1 tail1 a b"), // span [0,14) -> keep last 4
      (2L, "lead2 x " + shared + " ending2"), // span [2,16) -> keep 2 + 1
      (3L, "clean short doc"),
      (4L, shared + " " + shared.split(" ").take(12).mkString(" "))) // check below
      .toDF("doc_id", "text")
    val out = Dedup.substringApply(fix, "text", w = 12).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getInt(3)))).toMap
    assert(out(1L) == (("unique1 tail1 a b", 4L, 18)))
    assert(out(2L) == (("lead2 x ending2", 3L, 17)))
    assert(out(3L) == (("clean short doc", 3L, 3)))
    // doc 4 is w1..w14 w1..w12: every 12-window of it repeats (vs docs 1/2
    // or internally), so the whole doc is duplicated -> empty, NOT dropped
    assert(out(4L)._1 == "" && out(4L)._2 == 0L && out(4L)._3 == 26)
  }

  test("substring stats: every doc reports coverage; clean docs report zero") {
    val shared = (1 to 14).map(i => s"w$i").mkString(" ")
    val fix = Seq(
      (1L, shared + " unique1 tail1 a b"), // 18 tokens, 14 duplicated
      (2L, "lead2 x " + shared + " ending2"),
      (3L, "clean short doc"))
      .toDF("doc_id", "text")
    val st = Dedup.substringStats(fix, "text", w = 12).collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getDouble(3))).toMap
    assert(st(1L) == ((18, 14L, math.round(14.0 / 18 * 1e6) / 1e6)))
    assert(st(2L)._2 == 14L)
    assert(st(3L) == ((3, 0L, 0.0)))
  }

  test("UrlDedup canonicalization: each normalization rule, and the keeper/count contract") {
    import graft.dedup.UrlDedup
    val cases = Seq(
      // case + default port + trailing slash + fragment
      (1L, "HTTPS://News.Example.COM:443/a/b/#sec", "https://news.example.com/a/b"),
      (2L, "https://news.example.com/a/b", "https://news.example.com/a/b"),
      // tracking params drop entirely; root path normalizes away
      (3L, "http://x.org:80/?utm_source=a&fbclid=b&ref=c", "http://x.org"),
      // surviving params sort; non-tracking 'referer' is NOT stripped
      (4L, "https://x.org/p?z=1&a=2&utm_campaign=x&referer=ok",
        "https://x.org/p?a=2&referer=ok&z=1"),
      // :8443 is not a default port — it stays
      (5L, "https://x.org:8443/p", "https://x.org:8443/p"),
      // malformed (no scheme) passes through UNCHANGED — no collapse
      // onto a degenerate '://' key with other malformed URLs
      (6L, "www.a.org/p#frag", "www.a.org/p#frag"),
      (7L, "relative/path?utm_source=x", "relative/path?utm_source=x"),
      (8L, "", ""))
    val got = cases.toDF("doc_id", "url", "expected")
      .select(col("doc_id"), UrlDedup.canonicalize(col("url")).as("c"), col("expected"))
      .collect()
    got.foreach(r => assert(r.getString(1) == r.getString(2),
      s"doc ${r.getLong(0)}: ${r.getString(1)} != ${r.getString(2)}"))
    val dd = UrlDedup.dedupByUrl(
      cases.toDF("doc_id", "url", "expected").select("doc_id", "url"), "url")
      .orderBy("doc_id").collect()
    // docs 1+2 collapse (keeper 1, n_forms 2); 3-8 stand alone — in
    // particular the three malformed URLs do NOT merge with each other
    assert(dd.map(r => (r.getLong(0), r.getLong(2))).toSeq ==
      Seq((1L, 2L), (3L, 1L), (4L, 1L), (5L, 1L), (6L, 1L), (7L, 1L), (8L, 1L)))
  }

  test("urlFilter: blocklist suffix matching, score threshold, malformed hosts") {
    import graft.dedup.UrlDedup
    val docs = Seq(
      (1L, "https://bad.site/x"),                 // exact blocked domain
      (2L, "https://cdn.bad.site/x"),             // subdomain of blocked
      (3L, "https://notbad.site/x"),              // similar suffix: NOT blocked
      (4L, "https://ok.org/casino-poker/x"),      // 0.8+0.4 = 1.2 >= 1.0: drop
      (5L, "https://ok.org/casino-review/x"),     // 0.8 < 1.0: keep
      (6L, "https://ok.org/xxx"),                 // 1.0 >= threshold: drop
      (7L, "https://ok.org/articles/x"),          // clean: keep
      (8L, "no-scheme/casino"))                   // malformed: empty host, scored
      .toDF("doc_id", "url")
    val out = UrlDedup.urlFilter(docs, "url",
        blockedDomains = Seq("bad.site"),
        badWords = Seq("casino" -> 0.8, "poker" -> 0.4, "xxx" -> 1.0))
      .orderBy("doc_id")
      .collect().map(r => r.getLong(0) -> ((r.getBoolean(3), r.getBoolean(4)))).toMap
    assert(out == Map(
      1L -> ((true, false)), 2L -> ((true, false)), 3L -> ((false, true)),
      4L -> ((false, false)), 5L -> ((false, true)), 6L -> ((false, false)),
      7L -> ((false, true)), 8L -> ((false, true))),
      s"blocked/keep decisions: $out")
  }
}
