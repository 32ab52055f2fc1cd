package graft.dedup

import graft.text.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines: exact, n-gram
  * Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design (the whole point of these ops is the 100 TB case):
  *  - NOTHING does a cross join. Candidate generation is always an
  *    inverted-index / bucket equi-join: explode a bounded key (shingle,
  *    LSH band signature, blocking key), shuffle once on that key, and
  *    only compare documents that collide.
  *  - Frequent shingles are capped (`maxDf`): a shingle appearing in huge
  *    numbers of documents contributes no discriminative signal but
  *    produces O(df²) candidate pairs — the classic skew bomb. Dropping
  *    them bounds every posting list.
  *  - Signatures (minhash/simhash) are fixed-width per document, computed
  *    in one narrow pass (higher-order array expressions, codegen, no
  *    UDF), so signature generation streams at scan speed and the
  *    pair-generation shuffle carries K longs per doc, not the text.
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

  /** `dedup_exact`: group by content hash, keep the lowest doc_id as the
    * canonical representative. One hash-shuffle; the text itself never
    * shuffles (hash + id only).
    */
  def exact(df: DataFrame, textCol: String): DataFrame =
    df.select(md5(col(textCol)).as("content_hash"), col("doc_id"))
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("copies"))

  /** Distinct word n-gram shingles per document: (doc_id, shingles). */
  def shingled(df: DataFrame, textCol: String, n: Int = 3): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    // guard: Spark's sequence(1, k) is DESCENDING for k < 1, so short
    // documents must produce an explicitly empty shingle set
    val grams = when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
      .otherwise(array().cast("array<string>"))
    df.select(col("doc_id"), array_distinct(grams).as("shingles"))
  }

  /** `dedup_ngram_jaccard`: exact Jaccard over shingle sets via an
    * inverted-index self-join — candidates share >=1 shingle; shingles
    * with document frequency > maxDf are dropped (skew cap).
    */
  def jaccardPairs(sh: DataFrame, minJaccard: Double, maxDf: Int = 10): DataFrame = {
    val postings = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val rare = postings.groupBy("sh").count().filter(col("count") <= maxDf).select("sh")
    val p = postings.join(rare, "sh")
    val common = p.as("a").join(p.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("n"))
    common
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        round(col("common").cast("double") / (col("na") + col("nb") - col("common")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "common", "jaccard")
  }

  /** K-wide minhash signature per document (K = A.size). */
  def minhashSignature(sh: DataFrame): DataFrame = {
    val hashes = transform(col("shingles"), s => TextAnalysis.hash60(s) % P)
    val sig = array(A.indices.map { i =>
      array_min(transform(hashes, h => (lit(A(i)) * h + lit(B(i))) % P))
    }: _*)
    sh.select(col("doc_id"), sig.as("sig"))
  }

  /** `dedup_minhash`: LSH banding over minhash signatures (bands of
    * `rowsPerBand` sig entries), candidate pairs from band-bucket
    * collisions, verified with exact Jaccard. Collision probability for
    * similarity s is 1-(1-s^r)^b — with K=8, r=2, b=4 the S-curve centers
    * near s=0.5.
    */
  def minhashLshPairs(
      df: DataFrame, textCol: String, n: Int = 3,
      rowsPerBand: Int = 2, minJaccard: Double = 0.4): DataFrame = {
    val sh = shingled(df, textCol, n).filter(size(col("shingles")) > 0)
    val sigs = minhashSignature(sh)
    val bands = A.size / rowsPerBand
    val banded = sigs.select(
      col("doc_id"),
      posexplode(array((0 until bands).map { b =>
        concat_ws(":", (0 until rowsPerBand).map(r =>
          element_at(col("sig"), b * rowsPerBand + r + 1)): _*)
      }: _*)))
      .toDF("doc_id", "band", "bucket")
    val candidates = banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    val withSets = candidates
      .join(sh.select(col("doc_id").as("doc_a"), col("shingles").as("sa")), "doc_a")
      .join(sh.select(col("doc_id").as("doc_b"), col("shingles").as("sb")), "doc_b")
    withSets
      .withColumn("common", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        round(col("common").cast("double") /
          (size(col("sa")) + size(col("sb")) - col("common")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** `dedup_simhash`: 32-bit SimHash over word tokens — per-bit majority
    * vote of token hashes. Near-dup docs land within small Hamming
    * distance; identical signature = near-certain duplicate.
    */
  def simhash(df: DataFrame, textCol: String): DataFrame =
    df.select(col("doc_id"), TextAnalysis.wordTokens(col(textCol)).as("_w"))
      .withColumn("_th", transform(col("_w"), t => TextAnalysis.hash60(t) % 4294967296L))
      .withColumn("simhash", expr(
        """aggregate(sequence(0, 31), 0L, (acc, b) -> acc +
          |  IF(aggregate(_th, 0L, (a, h) ->
          |       a + IF((h div CAST(pow(2, b) AS BIGINT)) % 2 = 1, 1, -1)) > 0,
          |     CAST(pow(2, b) AS BIGINT), 0L))""".stripMargin))
      .select("doc_id", "simhash")

  /** Cosine similarity of two double arrays, sequential fold (matches the
    * oracle's fold order; rounded by callers before any comparison).
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (s, v) => s + v)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), (s, v) => s + v))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), (s, v) => s + v))
    dot / (na * nb)
  }

  /** `dedup_embedding`: cosine near-duplicate pairs within a blocking key
    * (here a label/cluster column — at scale this is the coarse-quantizer
    * cell of an IVF index). Pairs only form inside a block: the shuffle
    * is on the block key, never all-pairs.
    */
  def embeddingPairs(emb: DataFrame, blockCol: String, minCos: Double): DataFrame = {
    val e = emb.select(col("vec_id"), col(blockCol).as("block"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    e.as("a").join(e.as("b"),
        col("a.block") === col("b.block") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.block").as("block"),
        round(cosine(col("a.v"), col("b.v")), 4).as("cos"))
      .filter(col("cos") >= minCos)
  }
}
