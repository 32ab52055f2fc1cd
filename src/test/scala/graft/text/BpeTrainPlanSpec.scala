package graft.text

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The batched BPE trainer's SCALE contract (r17 verdict "what's wrong
  * #1"): per-round plan depth must be O(batch), not O(accumulated
  * merges). The trainer re-materializes its working frame every round
  * (`localCheckpoint`, predecessor blocks released), so round r's
  * candidate aggregation plans over a flat RDD leaf + one batch of
  * replaces — where the pre-r18 fold accumulated EVERY accepted merge
  * as a nested `replace` on one lineage and round r planned an
  * ~r·batch-deep expression (quadratic total planning cost; hopeless at
  * the K = 32 000 the scaladoc targets).
  *
  * Pinned at R = 64 rounds / K ≥ 256 merges (the corpus vocabulary is
  * 31 words and saturates ~89 merges, so the word-count fixture extends
  * it with deterministic compounds — same construction as
  * BpeScaledSpec's scale leg):
  *
  *  1. FLATNESS: the working frame's analyzed-plan expression count is
  *     CONSTANT from round 2 on (round 1 reads the raw word-count
  *     projection, so it differs) — not merely sub-linear;
  *  2. SENSITIVITY: the unmaterialized fold's expression count GROWS
  *     monotonically round over round (≥ batch new replace nodes per
  *     accepted round), so the flatness assertion cannot be satisfied
  *     vacuously by the measurement being wrong;
  *  3. EQUALITY: materialized and unmaterialized trainers produce the
  *     IDENTICAL merge list — re-materialization is a pure plan-shape
  *     change, bit-level semantics untouched.
  */
class BpeTrainPlanSpec extends SparkSpec {

  import spark.implicits._

  private val Rounds = 64
  private val Batch = 4
  private val Pool = 256

  /** sf0.001 vocabulary with real counts + deterministic two/three-word
    * compounds: once the 31 base words collapse to single tokens, the
    * compound-boundary pairs keep supplying merges well past 256 — the
    * long-tail shape of a real 32k vocab.
    */
  private lazy val wordCounts: DataFrame = {
    val realWc = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(explode(Bpe.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val rnd = new scala.util.Random(18)
    val compounds = (1 to 3000).map { i =>
      val w = realWc(rnd.nextInt(realWc.length))._1 +
        realWc(rnd.nextInt(realWc.length))._1 +
        (if (i % 4 == 0) realWc(rnd.nextInt(realWc.length))._1 else "")
      (w, 1L + rnd.nextInt(20))
    }.groupBy(_._1).map { case (w, vs) => (w, vs.head._2) }.toSeq
    (realWc.toSeq ++ compounds).toDF("word", "cnt")
  }

  /** Total expression-node count of the frame's analyzed plan — the
    * quantity the nested-replace fold grows by ~batch per round and the
    * checkpointing trainer holds flat.
    */
  private def exprNodes(df: DataFrame): Long = {
    var n = 0L
    df.queryExecution.analyzed.foreach(node =>
      node.expressions.foreach(e => e.foreach(_ => n += 1)))
    n
  }

  test(s"R=$Rounds rounds: materialized plan depth flat, fold grows, merge lists identical") {
    val flat = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val matMerges = Bpe.trainBatchedImpl(wordCounts, Rounds, Batch, Pool,
      materialize = true, probe = (r, df) => flat += ((r, exprNodes(df))))

    val grown = scala.collection.mutable.ArrayBuffer.empty[(Int, Long)]
    val foldMerges = Bpe.trainBatchedImpl(wordCounts, Rounds, Batch, Pool,
      materialize = false, probe = (r, df) => grown += ((r, exprNodes(df))))

    // the fixture must actually sustain the full R rounds at K >= 256,
    // or the flatness claim is tested on a toy prefix
    assert(matMerges.size >= 256, s"expected >=256 merges, got ${matMerges.size}")
    assert(matMerges.map(_.round).max >= Rounds,
      s"trainer exhausted before round $Rounds - extend the compound fixture")

    // 3. EQUALITY: same merges, same order, same counts
    assert(foldMerges == matMerges,
      "re-materialization changed the learned merge list")

    // 1. FLATNESS: from round 2 every frame is (RDD leaf + one batch of
    // replaces) - expression counts are exactly constant
    val steady = flat.filter(_._1 >= 2).map(_._2)
    assert(steady.size >= Rounds - 1)
    assert(steady.distinct.size == 1,
      s"materialized per-round plan size is not flat: ${flat.take(8)}...${flat.takeRight(3)}")

    // 2. SENSITIVITY: the fold's lineage grows by >= batch replace nodes
    // per accepted round (each replace adds >= 3 expression nodes: the
    // call + two literals), monotonically
    val g = grown.map(_._2)
    assert(g.zip(g.tail).forall { case (a, b) => b > a },
      "unmaterialized fold's plan size is not strictly growing - probe is broken")
    assert(g.last - g.head >= (Rounds - 1).toLong * Batch,
      s"fold grew too little (${g.head} -> ${g.last}) - probe is not seeing the replace chain")
    // and the flat trainer's steady size must be BELOW even the fold's
    // round-3 size: the checkpoint really truncated the lineage
    assert(steady.head < g(2),
      s"flat steady size ${steady.head} not below fold round-3 size ${g(2)}")
  }
}
