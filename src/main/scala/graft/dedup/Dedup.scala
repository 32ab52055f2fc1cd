package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (the whole point of these ops is the 100 TB case):
  *  - NOTHING does a cross join. Candidate generation is always an
  *    inverted-index / bucket equi-join: shuffle once on a bounded key
  *    (shingle, LSH band signature, blocking key) and only compare
  *    documents that collide.
  *  - Frequent shingles are capped (`maxDf`): a shingle appearing in huge
  *    numbers of documents contributes no discriminative signal but
  *    produces O(df²) candidate pairs — the classic skew bomb. Dropping
  *    them bounds every posting list.
  *  - The hot path is ROW-SHAPED, not array-shaped: shingles are built by
  *    posexplode + window-lead (each token materialized once), and
  *    minhash signatures are plain `groupBy(doc).agg(min(perm(h)))`
  *    aggregations. An earlier array-lambda formulation
  *    (`transform(sequence(...), i -> element_at(split(text)...))`) was
  *    ~50x slower because Catalyst inlines the tokenizer into every
  *    lambda reference and the generator re-evaluates it per output row —
  *    measured 40 s vs <1 s at sf0.1. Keep nested higher-order
  *    expressions out of exploded/aggregated hot paths.
  *  - Hashes are md5-derived (`TextAnalysis.hash60`) so the DuckDB oracle
  *    reproduces results bit-for-bit; swap in murmur `hash()` for
  *    production speed if oracle parity is not needed.
  */
object Dedup {

  /** Mersenne prime 2^31-1: modulus of the minhash permutation family. */
  val P: Long = 2147483647L
  /** Fixed permutation parameters h_i(x) = (A(i)·x + B(i)) mod P. */
  val A: Seq[Long] = Seq(1299721L, 1750357L, 2750159L, 3407807L, 4256233L, 5800079L, 6700417L, 7368787L)
  val B: Seq[Long] = Seq(15485863L, 32452843L, 49979687L, 67867967L, 86028121L, 104395301L, 122949823L, 141650939L)

  /** Plan-keyed derived-index caches (see [[graft.util.KeyedCache]]):
    * shingle postings, SimHash signatures, and composed-pipeline
    * intermediates are each built ONCE per dataset per driver run.
    */
  val CacheSlots = graft.util.KeyedCache.CacheSlots
  private val postingsCache = new graft.util.KeyedCache
  private val simhashCache = new graft.util.KeyedCache
  private val derivedCache = new graft.util.KeyedCache
  private val gramsCache = new graft.util.KeyedCache

  /** Drop every cached derived index (postings, signatures, trained
    * quantizer assignments). Call when the underlying source files of a
    * cached dataset are rewritten in place within one driver run.
    */
  def clearCaches(): Unit = {
    postingsCache.clear(); simhashCache.clear(); derivedCache.clear()
    gramsCache.clear()
    graft.similarity.Similarity.clearCaches()
    graft.text.TextAnalysis.clearCaches()
  }

  /** Generic derived-DataFrame cache: persist `build` once per
    * (source dataset, tag). For composed pipelines (corpus_clean) whose
    * intermediate results feed several downstream consumers in one plan
    * tree — without persistence Spark re-executes the shared subtree per
    * consumer (a DataFrame is a plan, not a materialized value).
    */
  def sharedDerived(src: DataFrame, tag: String)(build: => DataFrame): DataFrame =
    derivedCache.getOrBuild(src, tag, 0)(build)

  /** [[shinglePostings]] through the keyed cache (`dedup_ngram_jaccard`,
    * `dedup_minhash`, `corpus_clean` share one postings build per
    * dataset).
    */
  def sharedPostings(df: DataFrame, textCol: String, n: Int = 3): DataFrame =
    postingsCache.getOrBuild(df, textCol, n)(shinglePostings(df, textCol, n))

  /** [[simhash]] through the keyed cache: the signature table feeds both
    * the signature query and the banded pair generator — computed once
    * per dataset per run.
    */
  def sharedSimhash(df: DataFrame, textCol: String): DataFrame =
    simhashCache.getOrBuild(df, textCol, 0)(simhash(df, textCol))

  /** `dedup_exact`: group by content hash, keep the lowest doc_id as the
    * canonical representative. One hash-shuffle; the text itself never
    * shuffles (hash + id only).
    */
  def exact(df: DataFrame, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("copies"))

  /** `dedup_decontaminate`: benchmark decontamination — training docs
    * sharing >= `minCommon` n-gram shingles with any doc of an
    * eval/benchmark subset (the contamination check every LLM training
    * pipeline runs so eval answers don't leak into training data).
    *
    * Shape: the SAME inverted-index equi-join as the Jaccard family,
    * made asymmetric — the benchmark side of the postings is BROADCAST
    * (an eval set is bounded by construction: thousands of docs, not a
    * corpus), so the training corpus streams once with no shuffle of
    * text. High-document-frequency shingles are capped out first
    * (df computed over the FULL postings): a common phrase shared with
    * a benchmark doc is not leakage evidence, and the cap is also what
    * bounds the join fan-out (skew guard — without it one stopword
    * 3-gram pairs the whole corpus).
    *
    * @param benchPred predicate over postings rows (doc_id) selecting
    *                  the benchmark subset; remaining docs are corpus
    */
  /** [[contaminationPairs]] at real-benchmark shape: decontamination in
    * published training pipelines matches on LONG n-gram spans, not
    * 3-grams — GPT-3 removed examples sharing a 13-gram with an eval set
    * (Brown et al. 2020, arXiv:2005.14165, Appendix C) and the
    * Llama-family filters use 8–13-token spans. A 13-token span is
    * specific enough that ONE shared occurrence is leakage evidence
    * (`minCommon = 1`), where the 3-gram form needs several. Longer
    * spans also shrink the postings index (fewer distinct spans repeat
    * across documents), so the broadcast-bench / streaming-corpus join
    * shape is unchanged at 100 TB. The span postings run through the
    * shared plan-keyed cache like every other shingle index.
    */
  def decontaminate(
      docs: DataFrame, textCol: String, benchPred: Column,
      spanTokens: Int = 13, minCommon: Long = 1, maxDf: Int = 20): DataFrame =
    contaminationPairs(
      sharedPostings(docs, textCol, spanTokens), benchPred, minCommon, maxDf)

  def contaminationPairs(
      postings: DataFrame, benchPred: Column,
      minCommon: Long, maxDf: Int = 20): DataFrame = {
    val rare = rarePostings(postings, maxDf)
    val bench = rare.filter(benchPred).select(col("doc_id").as("bench_id"), col("sh"))
    rare.filter(!benchPred)
      .join(broadcast(bench), "sh")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
      .select("doc_id", "bench_id", "common")
  }

  /** Distinct (doc_id, sh) word-n-gram postings — the inverted-index
    * representation every near-dup op consumes. Row-shaped: posexplode
    * tokenizes once, window-lead assembles each n-gram once, `distinct`
    * is one shuffle with map-side partial aggregation.
    */
  def shinglePostings(df: DataFrame, textCol: String, n: Int = 3): DataFrame =
    positionalGrams(df, textCol, n)
      .select(col("doc_id"), col("gram").as("sh"))
      .distinct()

  /** (doc_id, pos, gram) — every `n`-token window with its 0-based start
    * position, the ONE row-shaped assembler behind the shingle postings
    * AND the exact-substring / contamination gram views. MAP-SIDE: grams
    * assemble from the per-doc token array in one native pass
    * ([[graft.functions.WordGramScan]]) and posexplode, so the assembler
    * adds NO exchange — the former posexplode + window-lead shape
    * shuffled and sorted EVERY TOKEN ROW by doc_id before a single gram
    * existed, a full corpus shuffle at the 100 TB target that this
    * operator never needed (the window only ever read within one
    * document) — and no interpreted per-position lambda either (the
    * r19 `transform`+`slice`+`array_join` HOF shape paid lambda
    * dispatch plus an n-element slice allocation per gram, which at
    * single-task fixture scale gave back most of the shuffle win).
    * Output rows are value-identical: 0-based start positions,
    * space-joined n-token grams, trailing partial windows dropped.
    */
  private def positionalGrams(df: DataFrame, textCol: String, n: Int): DataFrame =
    df.select(col("doc_id"), TextAnalysis.tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"),
        posexplode(graft.functions.WordGramScan.wordGrams(col("_toks"), n)))
      .toDF("doc_id", "pos", "gram")

  /** Array-of-shingles view (test/inspection surface; the operators
    * themselves stay on the postings representation).
    */
  def shingled(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    val sets = shinglePostings(df, textCol, n)
      .groupBy(col("doc_id")).agg(collect_list(col("sh")).as("shingles"))
    // docs too short for any n-gram still get an (empty) row
    df.select(col("doc_id")).join(sets, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("shingles"), array().cast("array<string>")).as("shingles"))
  }

  /** Postings with document frequency capped (skew guard). */
  private def rarePostings(postings: DataFrame, maxDf: Int): DataFrame = {
    val rare = postings.groupBy("sh").count()
      .filter(col("count") <= maxDf).select("sh")
    postings.join(rare, "sh")
  }

  /** Pair candidates sharing >=1 rare shingle, with common-shingle count. */
  private def commonCounts(p: DataFrame): DataFrame =
    p.as("a").join(p.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))

  /** `dedup_ngram_jaccard`: exact Jaccard over shingle sets via the
    * inverted-index self-join.
    */
  def jaccardPairs(postings: DataFrame, minJaccard: Double, maxDf: Int = 10): DataFrame = {
    val sizes = postings.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    commonCounts(rarePostings(postings, maxDf))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("na") + col("nb") - col("common")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "common", "jaccard")
  }

  /** `dedup_containment`: containment-scored near-dup pairs — Broder's
    * asymmetric resemblance measure, containment(A in B) =
    * |S(A) ∩ S(B)| / |S(A)| (Broder 1997, "On the resemblance and
    * containment of documents"). Reported per pair as the MAX of the
    * two directions, common / min(|A|, |B|): a short document quoted
    * wholesale inside a long one scores 1.0 here while its Jaccard
    * (union-normalized) can be arbitrarily small — the quote/excerpt
    * duplication Jaccard structurally misses. Same inverted-index join,
    * df cap, and full-corpus size statistics as [[jaccardPairs]].
    */
  def containmentPairs(
      postings: DataFrame, minContainment: Double, maxDf: Int = 10): DataFrame = {
    val sizes = postings.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    commonCounts(rarePostings(postings, maxDf))
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("containment",
        round(col("common").cast("double") / least(col("na"), col("nb")), 6))
      .filter(col("containment") >= minContainment)
      .select("doc_a", "doc_b", "common", "containment")
  }

  /** `dedup_incremental`: near-dup pairs between an arriving BATCH and
    * the full corpus — the production ingestion shape. A steady-state
    * pipeline must not re-pair the whole corpus on every delta: pairs
    * among existing docs are excluded, so the candidate join costs
    * O(batch postings x colliding corpus postings), not corpus². Every
    * pair with >= 1 new endpoint is emitted exactly once: (old, new)
    * pairs form with the old doc on the corpus side, and new-new pairs
    * are kept only in their `a.doc < b.doc` orientation. The df cap and
    * set sizes are counted over the FULL corpus postings (same rarity
    * statistics a full re-dedup would use, so scores match it exactly).
    */
  def incrementalJaccardPairs(
      postings: DataFrame, newIds: DataFrame,
      minJaccard: Double, maxDf: Int = 10): DataFrame = {
    val flagged = rarePostings(postings, maxDf)
      .join(newIds.select(col("doc_id")).distinct().withColumn("_new", lit(1)),
        Seq("doc_id"), "left_outer")
    val rareNew = flagged.filter(col("_new") === 1)
    val cand = flagged.as("a").join(rareNew.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id") &&
          (col("a._new").isNull || col("a.doc_id") < col("b.doc_id")))
      .groupBy(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .agg(count(lit(1)).as("common"))
    val sizes = postings.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    cand
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("na") + col("nb") - col("common")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "common", "jaccard")
  }

  /** K-wide minhash signature, one column per permutation: a single
    * hash-aggregate over the postings (map-side partial mins, fixed-width
    * state — K longs per doc).
    */
  def minhashSignature(postings: DataFrame): DataFrame = {
    val h = TextAnalysis.hash60(col("sh")) % P
    postings.groupBy(col("doc_id"))
      .agg(min((lit(A.head) * h + lit(B.head)) % P).as("sig0"),
        A.indices.tail.map(i => min((lit(A(i)) * h + lit(B(i))) % P).as(s"sig$i")): _*)
  }

  /** LSH band buckets of a K-wide minhash signature frame:
    * (doc_id, band, bucket) rows, `bucket` the ':'-joined row slice —
    * the join key of candidate generation AND the persistable index
    * payload (`dedup_minhash_persisted` stores exactly this frame).
    */
  def bandBuckets(sigs: DataFrame, rowsPerBand: Int): DataFrame = {
    val bands = A.size / rowsPerBand
    sigs.select(col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws(":", (0 until rowsPerBand).map(r =>
            col(s"sig${b * rowsPerBand + r}")): _*).as("bucket"))
      }: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** `dedup_minhash`: LSH banding over minhash signatures, candidate
    * pairs from band-bucket collisions, verified with exact Jaccard
    * computed on the postings index (no shingle arrays are ever built).
    * Collision probability for similarity s is 1-(1-s^r)^b — K=8, r=2,
    * b=4 centers the S-curve near s=0.5.
    */
  def minhashLshPairs(
      df: DataFrame, textCol: String, n: Int = 3,
      rowsPerBand: Int = 2, minJaccard: Double = 0.4): DataFrame = {
    // the postings index feeds three consumers (signatures, the
    // candidate-verification join, set sizes) AND is shared with the
    // other shingle-based operators through the keyed cache — the
    // tokenize+window+distinct pipeline runs once per dataset, not once
    // per operator (MEMORY_AND_DISK: spills instead of recomputing)
    val postings = sharedPostings(df, textCol, n)
    val banded = bandBuckets(minhashSignature(postings), rowsPerBand)
    bandedVerifiedPairs(banded, postings, minJaccard)
  }

  /** [[minhashLshPairs]] with a HOT-BUCKET CAP — the standard production
    * LSH safeguard: a degenerate bucket with B members (boilerplate,
    * empty-ish texts, templated pages all sharing a signature slice)
    * yields B²/2 candidate pairs, so one hot bucket turns candidate
    * generation quadratic no matter how good the banding is. Buckets
    * with more than `maxBucket` members are SKIPPED for candidate
    * generation (one partial-agg size pass + an equi join back — both
    * corpus-scale safe); the recall trade is documented and deliberate:
    * members of an over-cap bucket usually still co-occur in another,
    * colder band, and what a hot bucket mostly holds is near-identical
    * boilerplate the pipeline handles with exact dedup anyway.
    *
    * The skip is NOT silent: [[minhashLshCapStats]] reports, per band,
    * how many buckets the cap dropped and the candidate-pair volume
    * (Σ B·(B−1)/2) it saved/cost — run it alongside to see what recall
    * the cap traded on a given corpus.
    */
  def minhashLshPairsCapped(
      df: DataFrame, textCol: String, n: Int = 3,
      rowsPerBand: Int = 2, minJaccard: Double = 0.4,
      maxBucket: Int = 1000): DataFrame = {
    require(maxBucket >= 2, s"a bucket cap below 2 can never emit a pair ($maxBucket)")
    val postings = sharedPostings(df, textCol, n)
    val banded = bandBuckets(minhashSignature(postings), rowsPerBand)
    val cold = banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_bc")).filter(col("_bc") <= maxBucket)
      .select(col("band"), col("bucket"))
    bandedVerifiedPairs(banded.join(cold, Seq("band", "bucket")), postings, minJaccard)
  }

  /** Cap TELEMETRY for [[minhashLshPairsCapped]] — the "no silent caps"
    * surface: per band, how many buckets exist, how many the cap skips,
    * the total candidate-pair volume (Σ B·(B−1)/2 over every bucket),
    * the volume the skipped buckets would have generated, and the
    * resulting skip fractions. A user reads `pairs_skipped` /
    * `pair_skip_frac` to see exactly how much candidate recall the cap
    * traded on THEIR corpus (and `pairs_total − pairs_skipped` to see
    * the quadratic blowup it prevented). Same bucket pipeline as the
    * operator (shared postings cache, one partial-agg size pass), so the
    * numbers describe the exact buckets the capped run uses; cost is two
    * keyed aggregations, never a pair join — safe to run at any scale.
    * Integer pair arithmetic (`div`) keeps the counts bit-stable
    * cross-engine; the fraction is rounded to 6 dp like every ratio.
    */
  def minhashLshCapStats(
      df: DataFrame, textCol: String, n: Int = 3,
      rowsPerBand: Int = 2, maxBucket: Int = 1000): DataFrame = {
    require(maxBucket >= 2, s"a bucket cap below 2 can never emit a pair ($maxBucket)")
    val postings = sharedPostings(df, textCol, n)
    val banded = bandBuckets(minhashSignature(postings), rowsPerBand)
    banded.groupBy(col("band"), col("bucket"))
      .agg(count(lit(1)).as("_bc"))
      .groupBy(col("band"))
      .agg(
        count(lit(1)).as("buckets"),
        count(when(col("_bc") > maxBucket, 1)).as("buckets_skipped"),
        sum(expr("_bc * (_bc - 1) div 2")).as("pairs_total"),
        sum(when(col("_bc") > maxBucket, expr("_bc * (_bc - 1) div 2"))
          .otherwise(lit(0L))).as("pairs_skipped"))
      .select(col("band"), col("buckets"), col("buckets_skipped"),
        col("pairs_total"), col("pairs_skipped"),
        round(col("buckets_skipped").cast("double") /
          greatest(col("buckets"), lit(1L)), 6).as("bucket_skip_frac"),
        round(col("pairs_skipped").cast("double") /
          greatest(col("pairs_total"), lit(1L)).cast("double"), 6).as("pair_skip_frac"))
  }

  /** Candidate generation (bucket self-join) + exact-Jaccard
    * verification over the postings index — shared by the capped and
    * uncapped LSH pair operators.
    */
  private def bandedVerifiedPairs(
      banded: DataFrame, postings: DataFrame, minJaccard: Double): DataFrame = {
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // verify on the inverted index: common-shingle counts restricted to
    // candidate pairs, then the Jaccard threshold
    val pa = postings.select(col("doc_id").as("doc_a"), col("sh"))
    val pb = postings.select(col("doc_id").as("doc_b"), col("sh"))
    val common = candidates.join(pa, "doc_a").join(pb, Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
    val sizes = postings.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("na") + col("nb") - col("common")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** `dedup_cdc_containment`: shift-robust near-dup pairs over BOUNDED
    * content-defined chunks — the dedup CONSUMER the CDC chunkers exist
    * for. Each doc becomes its distinct set of [minLen,maxLen]-bounded
    * chunk keys ([[graft.text.TextAnalysis.cdcChunksBounded]]); docs
    * sharing ≥ `minShared` keys pair up, scored by containment =
    * shared / min(|A|, |B|) (the quote/excerpt measure — an excerpt
    * scores ~1 against its source no matter how small a fraction of the
    * source it is). Because CDC boundaries resynchronize after edits, a
    * doc shares its unedited spans' keys at ANY offset — the detector
    * fixed windows and whole-doc hashes both miss.
    *
    * Scale shape: chunk-key POSTINGS with a document-frequency cap
    * (`maxDf`) — a boilerplate chunk appearing in ten thousand docs is
    * evidence of boilerplate, not of pairwise similarity, and without
    * the cap it alone generates 10^8 candidate pairs (the same
    * safeguard as [[rarePostings]] and the LSH hot-bucket cap; the cap
    * is visible in the df frame, not silent). Pairs come from an
    * equi-join on the chunk key — never an all-pairs comparison — and
    * everything else is keyed aggregation. Containment denominators use
    * the UNCAPPED per-doc chunk counts, so scores are conservative
    * (capped keys can only lower them), matching
    * [[incrementalJaccardPairs]]'s convention.
    *
    * `fastHash = false` (the registry/oracle default) chunks with md5 so
    * DuckDB can replay keys bit-exactly; a production pipeline passes
    * `fastHash = true` for the xxhash64 chunker — same walk, same pair
    * arithmetic, ~2-4× cheaper per position (the engine-default/oracle
    * twin convention of the CDC and fingerprint families; boundaries
    * differ between the hashes, so pair sets are hash-family-specific —
    * the spec pins the same excerpt-detection and cap invariants on
    * both).
    */
  def cdcContainmentPairs(
      df: DataFrame, textCol: String,
      k: Int = 8, divisor: Int = 64, minLen: Int = 32, maxLen: Int = 128,
      minShared: Long = 2, maxDf: Int = 8,
      fastHash: Boolean = false): DataFrame = {
    val docs = df.filter(col(textCol).isNotNull && length(col(textCol)) > 0)
    // the chunk-key postings feed FOUR consumers (df frame, both sides
    // of the pair self-join, sizes) — without the cache Catalyst
    // recomputes the per-position hash walk once per consumer, turning
    // one corpus hashing pass into four (plan-audited; the same reason
    // the shingle postings are cached)
    val ch = sharedDerived(docs,
        s"cdc-chunks:$textCol:$k:$divisor:$minLen:$maxLen:$fastHash") {
      val chunks =
        if (fastHash) graft.text.TextAnalysis
          .cdcChunksBoundedFast(docs, textCol, k, divisor, minLen, maxLen)
          .select(col("doc_id"), col("chunk_hash").cast("string").as("ck"))
        else graft.text.TextAnalysis
          .cdcChunksBounded(docs, textCol, k, divisor, minLen, maxLen)
          .select(col("doc_id"), col("chunk_md5").as("ck"))
      chunks.distinct()
    }
    val dfreq = ch.groupBy(col("ck")).agg(count(lit(1)).as("_df"))
    val rare = ch.join(dfreq.filter(col("_df") <= maxDf).select(col("ck")), "ck")
    val sizes = ch.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    rare.as("a").join(rare.as("b"),
        col("a.ck") === col("b.ck") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("containment",
        round(col("shared").cast("double") / least(col("na"), col("nb")), 6))
      .select(col("doc_a"), col("doc_b"), col("shared"), col("containment"))
  }

  /** `dedup_minhash_persisted` read path: candidate pairs from the
    * STORED band-bucket index joined with the delta's freshly hashed
    * buckets — delta-vs-corpus and delta-vs-delta; corpus-vs-corpus
    * pairs were settled when those batches ingested — then exact
    * Jaccard verification on the postings index restricted to candidate
    * docs. The index table is the ingest contract: corpus text is never
    * re-shingled when a delta arrives.
    */
  def minhashPersistedPairs(
      storedBuckets: DataFrame, deltaBuckets: DataFrame,
      postings: DataFrame, minJaccard: Double): DataFrame = {
    val all = storedBuckets.unionByName(deltaBuckets)
    val cand = all.as("a").join(deltaBuckets.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") =!= col("b.doc_id"))
      .select(least(col("a.doc_id"), col("b.doc_id")).as("doc_a"),
        greatest(col("a.doc_id"), col("b.doc_id")).as("doc_b"))
      .distinct()
    val pa = postings.select(col("doc_id").as("doc_a"), col("sh"))
    val pb = postings.select(col("doc_id").as("doc_b"), col("sh"))
    val common = cand.join(pa, "doc_a").join(pb, Seq("doc_b", "sh"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("common"))
    val sizes = postings.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("na") + col("nb") - col("common")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash geometry: 60 signature bits (the full md5-derived hash60
    * width) split into 4 bands of 15 bits. Band buckets therefore have
    * 2^15 = 32768 values, so unrelated docs collide on a band at
    * ~1/32768 — candidate volume ~4·N²/32768, vs N²/256 for the 8-bit
    * bands this replaces (the round-1 scale-killer: at corpus scale the
    * candidate self-join degenerated toward quadratic).
    */
  val SimhashBits = 60
  val SimhashBands = 4
  val SimhashBandBits: Int = SimhashBits / SimhashBands // 15

  /** `dedup_simhash`: 60-bit SimHash over word tokens — per-bit majority
    * vote of token hashes, computed as a row-shaped explode + one
    * aggregation (60 conditional sums), not nested array lambdas.
    * Bit extraction is pure integer ops (`shiftright`/`% 2`): a
    * double-division formulation loses bits above 2^53 (mantissa width)
    * and falls out of whole-stage codegen.
    */
  def simhash(df: DataFrame, textCol: String): DataFrame = {
    val tok = df.select(col("doc_id"),
      explode(TextAnalysis.wordTokens(col(textCol))).as("tok"))
      .select(col("doc_id"), TextAnalysis.hash60(col("tok")).as("h"))
    // Per-bit ONES counts in PACKED accumulators: 3 counters of 21 bits
    // per long, so the aggregate carries 20 sum buffers instead of 60.
    // One aggregate expression per BIT compiled to a Janino unit so large
    // it cost ~7 s to compile (pure fixed overhead, both at sf0.001 and
    // sf0.1); the packed form plans+runs the same query in ~1 s. Lanes
    // cannot carry into each other while tokens/doc < 2^21 (~2M — a
    // larger "document" is a corpus-ingestion bug, not a hash input).
    // Majority vote: bit set  <=>  2*ones > tokens (ties vote negative,
    // matching the ±1-sum > 0 formulation the oracle uses).
    val lanes = 3
    val groups = SimhashBits / lanes // 20 packed sums
    val sums = (0 until groups).map { j =>
      val term = (0 until lanes).map { l =>
        shiftright(col("h"), j + groups * l).bitwiseAND(lit(1L)) * lit(1L << (21 * l))
      }.reduce(_ + _)
      sum(term).as(s"g$j")
    } :+ count(lit(1)).as("n_tok")
    val packed = (0 until SimhashBits).map { b =>
      val j = b % groups
      val l = b / groups
      val ones = shiftright(col(s"g$j"), 21 * l).bitwiseAND(lit((1L << 21) - 1))
      when(ones * 2 > col("n_tok"), lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    val sigs = tok.groupBy(col("doc_id")).agg(sums.head, sums.tail: _*)
      .select(col("doc_id"), packed.as("simhash"))
    // docs with no word tokens hash to 0 (all-bits negative majority)
    df.select(col("doc_id")).join(sigs, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("simhash"), lit(0L)).as("simhash"))
  }

  /** `dedup_simhash_pairs`: near-dup pairs by SimHash banding — docs
    * sharing any of the 4 15-bit signature bands become candidates (a
    * pair within Hamming distance d <= 3 of a 4-band split MUST agree on
    * at least one band — pigeonhole), then exact Hamming distance
    * filters. Same inverted-index shape as every other candidate
    * generator here.
    */
  def simhashPairs(df: DataFrame, textCol: String, maxHamming: Int = 2): DataFrame = {
    val sigs = sharedSimhash(df, textCol)
    val banded = sigs.select(col("doc_id"),
      posexplode(array((0 until SimhashBands).map(b =>
        shiftright(col("simhash"), b * SimhashBandBits) % (1 << SimhashBandBits)): _*)))
      .toDF("doc_id", "band", "bv")
    val cand = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(sigs.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), "doc_b")
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** `dedup_clusters`: connected components of the near-dup pair graph —
    * the step that turns pairwise matches into dedup GROUPS (keep one
    * representative per cluster, drop the rest). Iterative MIN-LABEL
    * PROPAGATION: driver-coordinated rounds, each fully distributed —
    * one equi-join (neighbor labels onto edge endpoints) plus one
    * groupBy-min, both shuffling on doc_id. No step ever holds a whole
    * component on one task, so component size never bounds a task.
    *
    * Converges in O(component diameter) rounds; near-dup components are
    * shallow (duplicate groups are clique-like), and `maxIter` bounds
    * the adversarial case. At extreme scale the two-phase
    * large-star/small-star formulation (Kiveris et al., "Connected
    * Components in MapReduce and Beyond") halves diameter per round —
    * same join shape, more state; min-label is chosen for its simple,
    * oracle-reproducible fixpoint (both converge to the component min).
    *
    * EAGER, with per-round LINEAGE CUTS: every round's label table is
    * `localCheckpoint()`ed (materialized, plan truncated to the stored
    * blocks). Without the cut the logical plan deepens by three
    * operators per round and Catalyst re-analyzes the WHOLE history on
    * every action — measured at sf0.1 the un-cut loop spent ~35 s in
    * planning for a 370-node graph, and even re-reading the final
    * frame cost ~8 s of pure analysis. With cuts each round plans a
    * constant-depth tree. (localCheckpoint blocks are unreplicated; an
    * executor loss fails the job and the operator re-runs — the right
    * trade for an iterative temp vs. paying a distributed-FS write per
    * round with reliable checkpoint().)
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 25): DataFrame = {
    val edges = pairs.select(col("doc_a").as("a"), col("doc_b").as("b"))
      .union(pairs.select(col("doc_b").as("a"), col("doc_a").as("b")))
      .localCheckpoint() // eager: the pair pipeline runs exactly once
    var labels = edges.select(col("a").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("label"))
      .localCheckpoint()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("b"), col("label").as("nl")), "b")
        .groupBy(col("a").as("doc_id")).agg(min(col("nl")).as("nmin"))
      val next = labels.join(nbrMin, Seq("doc_id"), "left_outer")
        .select(col("doc_id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"))
        .localCheckpoint()
      // monotone: labels only ever decrease, so "no row decreased" is
      // exactly the fixpoint test (one tiny count action per round)
      val changed = next
        .join(labels.select(col("doc_id"), col("label").as("prev")), "doc_id")
        .filter(col("label") < col("prev")).count()
      labels = next
      done = changed == 0
      iter += 1
    }
    // a non-converged label table is WRONG (components still split), and
    // consuming it as dedup groups would silently under-merge — fail loudly
    // instead; diameter > maxIter is the pathological-chain case, so the
    // remedy is a higher maxIter, not a partial answer
    if (!done)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(component diameter exceeds maxIter); labels would be split and wrong - " +
          "raise maxIter for deeper graphs")
    val sizes = labels.groupBy(col("label")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
  }

  /** Cosine similarity of two double arrays via the native codegen
    * expressions (graft.functions.VectorMath): sequential left-to-right
    * fold, bit-identical to the oracle's `list_reduce` order. The
    * earlier `aggregate(zip_with(...))` formulation computed the same
    * fold on the interpreted expression path — per-element lambda
    * dispatch on what is a per-PAIR hot path at scale.
    */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.VectorMath
    VectorMath.dotProduct(a, b) / (VectorMath.l2Norm(a) * VectorMath.l2Norm(b))
  }

  /** Dot product only (callers supply precomputed norms). */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorMath.dotProduct(a, b)

  /** Euclidean norm of a double array. */
  def norm(v: Column): Column =
    graft.functions.VectorMath.l2Norm(v)

  /** `dedup_embedding`: cosine near-duplicate pairs within a blocking key
    * (here a label/cluster column — at scale this is the coarse-quantizer
    * cell of an IVF index). Pairs only form inside a block, norms are
    * precomputed per vector BEFORE the pair stage, and each pair costs
    * exactly one NATIVE dot product (graft.functions.VectorMath — a
    * codegen'd tight loop over the array data).
    *
    * Formulations measured at sf0.1, identical results:
    *  - interpreted `zip_with`/`aggregate` lambdas per pair: ~4.5 s
    *    (lambda dispatch per element on the pair hot path);
    *  - positional row shape ((block, pos) join + sum): ~3 s — the
    *    dims-fold is codegen'd but the join inflates shuffle volume by
    *    the vector width (64x here, 1000x+ for real embedding dims);
    *  - array join + native expression: ~0.5 s, and the win GROWS with
    *    dimensionality since pairs, not pair*dims, cross the join.
    */
  /** @param subBlocks skew guard: with `k > 1` each block splits into k
    *   deterministic sub-blocks and the pair space becomes a join on
    *   (block, sub-pair) — a pathological hot block spreads over ~k²/2
    *   join keys instead of one, at the cost of replicating one side
    *   ~(k+1)/2 times. Every pair is still compared EXACTLY once
    *   (sub-pairs (sa, sb) with sa<sb cross; sa==sb pairs by id order),
    *   so the output is identical for any k. Default 1 (off): balanced
    *   corpora shouldn't pay the replication.
    */
  /** Pairs-per-join-cell budget driving the automatic sub-block count:
    * ~4M dot products is a few seconds of one task's work at 64 dims —
    * bounded, but large enough that auto-k never engages on data where
    * the plain blocked join is already fine. Test seam.
    */
  @volatile private[dedup] var maxPairsPerCell: Long = 4L << 20

  /** Data-driven skew guard: the hottest block of n rows pushes ~n^2/2
    * candidate pairs through ONE join cell (a straggler no cluster size
    * fixes — more executors don't split a key). One cheap column-pruned
    * groupBy-count observes n_max and picks the smallest k whose largest
    * sub-cell stays inside [[maxPairsPerCell]]: k = ceil(n_max^2 / P),
    * clamped to [1, 64] (side A's row duplication grows ~k/2, so
    * unbounded k would trade a straggler for volume).
    */
  private[dedup] def autoSubBlocks(emb: DataFrame, blockCol: String): Int = {
    val nMax = emb.groupBy(col(blockCol)).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    val k = math.ceil(nMax.toDouble * nMax.toDouble / maxPairsPerCell).toLong
    math.min(math.max(k, 1L), 64L).toInt
  }

  /** @param subBlocks 0 (default) derives the skew-guard split from the
    *                  observed max block size ([[autoSubBlocks]]); 1
    *                  disables splitting; k>1 forces a split.
    */
  def embeddingPairs(
      emb: DataFrame, blockCol: String, minCos: Double,
      subBlocks: Int = 0): DataFrame = {
    import graft.functions.VectorMath
    val k = if (subBlocks == 0) autoSubBlocks(emb, blockCol) else subBlocks
    val e = emb.select(col("vec_id"), col(blockCol).as("block"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("nrm", VectorMath.l2Norm(col("v")))
    val joined =
      if (k <= 1)
        e.as("a").join(e.as("b"),
          col("a.block") === col("b.block") && col("a.vec_id") < col("b.vec_id"))
      else {
        val sub = e.withColumn("s", pmod(col("vec_id"), lit(k)))
        // side A carries every target sub-block >= its own: sub-pair
        // (sa, sb) is produced exactly once, keyed (block, sb)
        val a = sub.withColumn("tgt", explode(sequence(col("s"), lit(k - 1)))).as("a")
        a.join(sub.as("b"),
          col("a.block") === col("b.block") && col("a.tgt") === col("b.s") &&
            (col("a.s") < col("b.s") ||
              (col("a.s") === col("b.s") && col("a.vec_id") < col("b.vec_id"))))
      }
    // canonical orientation vec_a < vec_b: a cross-sub-block pair can
    // arrive with the higher id on the a side (cos is symmetric)
    joined
      .select(least(col("a.vec_id"), col("b.vec_id")).as("vec_a"),
        greatest(col("a.vec_id"), col("b.vec_id")).as("vec_b"),
        col("a.block").as("block"),
        round(VectorMath.dotProduct(col("a.v"), col("b.v")) /
          (col("a.nrm") * col("b.nrm")), 4).as("cos"))
      .filter(col("cos") >= minCos)
  }

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023,
    * arXiv:2303.09540): train a k-means coarse quantizer on the
    * embeddings (reference has no analogue — this is the
    * embedding-space stage a 100 TB training corpus needs), assign every
    * vector to its cell, and drop any vector that has a SMALLER-id
    * near-duplicate (cosine >= `minCos`) in the same cell. The smallest
    * id in every near-dup neighborhood survives as the representative.
    *
    * Semantics note: the keep rule is "no smaller-id neighbor", applied
    * over the ORIGINAL corpus — a dropped vector's witness may itself be
    * dropped by an even smaller neighbor (chains collapse toward the
    * minimum). That matches SemDeDup's one-shot pruning, and it is
    * deterministic and order-free, which is what the oracle contract
    * needs; it is NOT a transitive-closure clustering (that is
    * [[clusterAssignments]]' job).
    *
    * Scale shape: clustering IS the blocking — pair volume is
    * sum(cell_i^2)/2, ~N^2/k for balanced cells, and k grows with the
    * corpus (a 100 TB run trains k ~ sqrt(N) cells so cells stay
    * bounded); the [[embeddingPairs]] auto sub-block guard catches a
    * runaway hot cell on top. Training cost is [[graft.similarity.Similarity.kmeans]]'s
    * bounded per-round shuffle (k*dims partials, never vectors).
    *
    * @return (vec_id, cell, kept) — one row per input vector.
    */
  def semanticDedup(
      emb: DataFrame, k: Int, iters: Int, minCos: Double): DataFrame = {
    val indexed = emb.join(
      graft.similarity.Similarity.kmeansAssign(emb, k, iters), "vec_id")
    val drops = embeddingPairs(indexed, "cell", minCos)
      .select(col("vec_b").as("vec_id")).distinct()
      .withColumn("_dropped", lit(true))
    indexed.join(drops, Seq("vec_id"), "left_outer")
      .select(col("vec_id"), col("cell"),
        not(coalesce(col("_dropped"), lit(false))).as("kept"))
  }

  /** (doc_id, pos, g) fingerprints of every `w`-token window — the
    * row view both exact-substring ops share. md5 keeps the oracle
    * bit-parity contract (an engine-default build would swap xxhash64,
    * like the cdc/fingerprint twins); positions are 0-based.
    */
  private def windowGrams(df: DataFrame, textCol: String, w: Int): DataFrame =
    positionalGrams(df, textCol, w)
      .select(col("doc_id"), col("pos"), md5(col("gram")).as("g"))

  /** [[windowGrams]] through the keyed cache: the gram view feeds BOTH
    * sides of the duplicated-fingerprint self-consumption (occurrence
    * counts AND the position join-back) plus every substring op layered
    * on spans — without persistence Spark re-runs the scan + tokenize +
    * lead-window subtree once per consumer (measured: two full document
    * scans in the spans plan alone). Same recompute-vs-persist call as
    * [[sharedPostings]]; at real scale the persist spills to executor
    * disk, still cheaper than re-tokenizing the corpus.
    */
  private def sharedWindowGrams(df: DataFrame, textCol: String, w: Int): DataFrame =
    gramsCache.getOrBuild(df, textCol, w)(windowGrams(df, textCol, w))

  /** `dedup_substring_spans`: exact-substring duplicated spans (the
    * suffix-array dedup of Lee et al. 2022, "Deduplicating Training Data
    * Makes Language Models Better", re-expressed as a window-fingerprint
    * join): any `w`-token window whose exact text occurs >= 2 times
    * corpus-wide (within-doc repeats count — self-plagiarized boilerplate
    * is still duplicated text) marks its token positions duplicated;
    * overlapping/adjacent duplicated windows merge into maximal spans via
    * gaps-and-islands (running max of span end, island break when a start
    * clears it).
    *
    * Scale: the gram view is linear in corpus tokens (one posexplode +
    * per-doc lead window, no shuffle beyond the doc partitioning);
    * occurrence counting is one hash shuffle on the 16-byte fingerprint
    * with map-side partial counts; the duplicated-gram set is tiny after
    * the >=2 filter, so the join back is effectively a semi-join; the
    * island windows partition by doc_id — bounded by document length,
    * never corpus-wide. No all-pairs stage anywhere, unlike the
    * quadratic candidate joins the reference's athena templates imply
    * (docs/deep-dive.md:49-72 stops at engine-delegated SQL).
    *
    * @return (doc_id, span_start, span_end, span_tokens) — token-index
    *         half-open [start, end) spans to cut before training.
    */
  def substringSpans(df: DataFrame, textCol: String = "text", w: Int = 12): DataFrame = {
    val grams = sharedWindowGrams(df, textCol, w)
    val dup = grams.groupBy(col("g"))
      .agg(count(lit(1)).as("occ")).filter(col("occ") >= 2).select("g")
    val starts = grams.join(dup, "g").select("doc_id", "pos")
    mergeSpans(starts, Seq("doc_id"), w)
  }

  /** Merge window start positions into maximal [start, end) token spans
    * per `partCols` group — gaps-and-islands: running max of span end,
    * island break when a start clears it. The ONE island rule both the
    * exact-substring family and the contamination evidence share (and
    * both DuckDB oracles mirror).
    */
  private def mergeSpans(hits: DataFrame, partCols: Seq[String], w: Int): DataFrame = {
    val keys = partCols.map(col)
    val byPos = Window.partitionBy(keys: _*).orderBy(col("pos"))
    val islands = hits
      .withColumn("prev_end",
        max(col("pos") + lit(w)).over(byPos.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ni",
        when(col("prev_end").isNull || col("pos") > col("prev_end"), 1).otherwise(0))
      .withColumn("island", sum(col("ni")).over(byPos))
    islands.groupBy(keys :+ col("island"): _*)
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(w)).as("span_end"))
      .select(keys :+ col("span_start") :+ col("span_end") :+
        (col("span_end") - col("span_start")).as("span_tokens"): _*)
  }

  /** `dedup_cluster_canonical` selection: within each near-dup cluster
    * keep the HIGHEST-QUALITY copy (tie -> lowest doc_id), not the
    * arbitrary min id — the RefinedWeb-style production semantics. The
    * ranking window partitions by cluster_id: bounded by cluster size,
    * never corpus-wide.
    *
    * @param clusters (doc_id, cluster_id, cluster_size) from
    *                 [[connectedComponents]]
    * @param quality  (doc_id, quality_score)
    */
  def canonicalByQuality(clusters: DataFrame, quality: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("quality_score").desc, col("doc_id").asc)
    clusters.join(quality, "doc_id")
      .withColumn("kept", row_number().over(w) === 1)
      .select("doc_id", "cluster_id", "cluster_size", "quality_score", "kept")
  }

  /** `dedup_decontaminate_spans`: contamination AUDIT EVIDENCE — for
    * every (training doc, benchmark doc) pair, the exact token spans of
    * the training doc covered by shared rare n-grams, merged into
    * maximal intervals the gaps-and-islands way. [[decontaminate]]
    * answers "is it contaminated"; this answers "show me where" — the
    * removal/masking pass and the human audit both key on positions.
    *
    * Same shapes as the rest of the family: positional grams through the
    * shared cache, df cap as the skew guard (rarity counted over distinct
    * docs, exactly [[contaminationPairs]]'s statistic), benchmark side
    * broadcast (eval sets are bounded by construction), island windows
    * partitioned by (doc, bench) — bounded by doc length.
    */
  def contaminationSpans(
      docs: DataFrame, textCol: String, benchPred: Column,
      spanTokens: Int = 13, maxDf: Int = 20): DataFrame = {
    val grams = sharedWindowGrams(docs, textCol, spanTokens)
    val rare = grams.select(col("doc_id"), col("g")).distinct()
      .groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf).select("g")
    val rareGrams = grams.join(rare, "g")
    val bench = rareGrams.filter(benchPred)
      .select(col("doc_id").as("bench_id"), col("g")).distinct()
    val hits = rareGrams.filter(!benchPred)
      .join(broadcast(bench), "g")
      .select(col("doc_id"), col("bench_id"), col("pos")).distinct()
    mergeSpans(hits, Seq("doc_id", "bench_id"), spanTokens)
  }

  /** `dedup_substring_apply`: the span-cut rewrite — every token covered
    * by a [[substringSpans]] duplicated span is removed and the survivors
    * rejoin in order (Lee et al. 2022 apply their suffix-array spans the
    * same way before tokenization). Every input doc gets an output row; a
    * fully-duplicated doc comes back empty rather than disappearing (the
    * downstream length filter decides its fate, not the dedup op).
    *
    * Scale: the anti join is doc_id-equi with a positional range residual
    * — co-partitioned with the token view, never all-pairs; the rebuild
    * groups by doc_id with collect bounded by document length.
    */
  def substringApply(df: DataFrame, textCol: String = "text", w: Int = 12): DataFrame = {
    val spans = substringSpans(df, textCol, w)
      .select(col("doc_id"), col("span_start"), col("span_end"))
    val toks = df.select(col("doc_id"),
      posexplode(TextAnalysis.tokens(col(textCol)))).toDF("doc_id", "pos", "tok")
    val kept = toks.join(spans,
        toks("doc_id") === spans("doc_id") &&
          col("pos") >= col("span_start") && col("pos") < col("span_end"),
        "left_anti")
      .groupBy(col("doc_id"))
      .agg(
        concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok"))).as("clean_text"),
        count(lit(1)).as("kept_tokens"))
    df.select(col("doc_id"), size(TextAnalysis.tokens(col(textCol))).as("n_tokens"))
      .join(kept, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("kept_tokens"), lit(0L)).as("kept_tokens"),
        col("n_tokens"))
  }

  /** `dedup_substring_stats`: per-document duplicated-token coverage
    * under [[substringSpans]] — every doc gets a row (clean docs report
    * 0 / 0.0), dup_ratio = covered tokens / total tokens at 6 dp. The
    * corpus-health readout that decides whether span-cutting is worth a
    * rewrite pass at all.
    */
  def substringStats(df: DataFrame, textCol: String = "text", w: Int = 12): DataFrame = {
    val spans = substringSpans(df, textCol, w)
      .groupBy(col("doc_id")).agg(sum(col("span_tokens")).as("dup_tokens"))
    val sizes = df.select(col("doc_id"),
      size(TextAnalysis.tokens(col(textCol))).as("n_tokens"))
    sizes.join(spans, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_ratio",
        round(col("dup_tokens").cast("double") / col("n_tokens"), 6))
  }
}
