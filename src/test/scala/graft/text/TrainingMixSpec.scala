package graft.text

import graft.{Queries, SparkSpec}
import org.apache.spark.sql.functions.col

class TrainingMixSpec extends SparkSpec {

  import spark.implicits._

  val dir = "/root/testdata/sf0.001"
  def docs = Queries.tbl(spark, dir, "documents")

  test("packSequences: shard count is a parameter; packing invariants hold at any count") {
    for (shards <- Seq(4, 16)) {
      val rows = TrainingMix.packSequences(docs, "text", budget = 2048, shards = shards)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      assert(rows.length == docs.count())
      assert(rows.map(_._3).forall(s => s >= 0 && s < shards))
      // within each shard, replay the cumulative packing in doc_id order
      // and check every bin assignment: bin = floor((cum - n) / budget)
      for ((_, inShard) <- rows.groupBy(_._3)) {
        var cum = 0L
        for ((_, n, _, bin) <- inShard.sortBy(_._1)) {
          assert(bin == cum / 2048, s"bin mismatch at cum=$cum n=$n")
          cum += n
        }
      }
    }
    // token counts per doc are shard-count independent
    val a = TrainingMix.packSequences(docs, "text", 2048, 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = TrainingMix.packSequences(docs, "text", 2048, 16)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a == b)
  }

  test("sampleByRate: rate 0 drops all, rate 1 keeps all, draws are deterministic") {
    val rates = Map("src0" -> 0.0, "src3" -> 1.0)
    val out = TrainingMix.sampleByRate(docs, "source", rates, defaultRate = 0.5)
    val bySource = out.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySource.contains("src0"))
    assert(bySource("src3") == totals("src3"))
    // default-rate sources keep a strict, nonzero subset
    val tail = (totals.keySet -- rates.keySet).toSeq
    assert(tail.exists(s => bySource.getOrElse(s, 0L) > 0))
    assert(tail.map(s => bySource.getOrElse(s, 0L)).sum <
      tail.map(totals).sum)
    // deterministic: a second run selects the identical doc set
    val again = TrainingMix.sampleByRate(docs, "source", rates, defaultRate = 0.5)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    val bad = intercept[IllegalArgumentException] {
      TrainingMix.sampleByRate(docs, "source", Map("x" -> 1.5), 0.5)
    }
    assert(bad.getMessage.contains("[0, 1]"))
  }

  test("sampleToTargetMix: rate caps at supply, zero-weight excluded, nested budgets") {
    import org.apache.spark.sql.functions.col
    val totals = docs.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // src0 weighted far above its supply -> rate caps at 1 (ALL docs kept);
    // src1 gets a fractional rate; everything else is excluded
    val out = TrainingMix.sampleToTargetMix(
        docs, "source", "text",
        targetWeights = Map("src0" -> 0.9, "src1" -> 0.1), budgetTokens = 100000L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySource = out.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    assert(bySource("src0") == totals("src0"), "over-budgeted source must cap at keep-all")
    assert(bySource.keySet == Set("src0", "src1"), s"unweighted sources leaked: $bySource")

    // nested: a larger budget's sample contains the smaller one's
    // (hash thresholds grow monotonically with budget)
    def ids(budget: Long) = TrainingMix.sampleToTargetMix(
        docs, "source", "text", Map("src1" -> 0.5), budget)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val small = ids(500); val big = ids(2000)
    assert(small.nonEmpty && small.size < totals("src1"), "fixture should sample strictly")
    assert(small.subsetOf(big), "budgets must nest")

    // invariant under partitioning
    val repart = TrainingMix.sampleToTargetMix(
        docs.repartition(7, col("doc_id")), "source", "text",
        Map("src0" -> 0.9, "src1" -> 0.1), 100000L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(repart.toSet == out.toSet)
  }

  test("sampleTemperature: low-resource sources sample at a higher rate (flattening)") {
    import org.apache.spark.sql.functions._
    // big: ~9x the tokens of small -> temperature rates differ by ~sqrt(9)=3
    val rows = ((0 until 900).map(i => (i.toLong, "big", "w " * 10)) ++
      (0 until 100).map(i => (1000L + i, "small", "w " * 10))).toList
    val docs = rows.toDF("doc_id", "source", "text")
    val out = TrainingMix.sampleTemperature(docs, "source", "text", budgetTokens = 2000L)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val by = out.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val rateBig = by.getOrElse("big", 0.0) / 900
    val rateSmall = by.getOrElse("small", 0.0) / 100
    assert(rateSmall > rateBig * 1.8,
      s"temperature should upsample the small source: big=$rateBig small=$rateSmall")

    // nested in budget and invariant under partitioning
    def ids(budget: Long, parts: Int) = TrainingMix.sampleTemperature(
        docs.repartition(parts, col("doc_id")), "source", "text", budget)
      .collect().map(_.getLong(0)).toSet
    assert(ids(1000L, 3).subsetOf(ids(2000L, 7)))
    assert(ids(2000L, 3) == ids(2000L, 7))
  }

  test("sampleStratified: exact counts, supply cap, nesting, partition invariance") {
    import org.apache.spark.sql.functions.col
    val out = TrainingMix.sampleStratified(
      docs, "source", Map("src0" -> 1000L, "src1" -> 3L, "src2" -> 0L),
      defaultCount = 5L, nParts = 8)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val bySource = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val supply = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource("src0") == supply("src0"), "count above supply takes the whole stratum")
    assert(bySource("src1") == 3L)
    assert(!bySource.contains("src2"), "zero-count stratum drops entirely")
    assert((bySource.keySet - "src0" - "src1").forall(bySource(_) == 5L))

    // nested: raising a stratum's count extends its sample, keeps the rest
    val smaller = TrainingMix.sampleStratified(
      docs, "source", Map("src1" -> 2L), defaultCount = 5L, nParts = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val larger = TrainingMix.sampleStratified(
      docs, "source", Map("src1" -> 3L), defaultCount = 5L, nParts = 8)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(smaller.subsetOf(larger))

    // deterministic under any input partitioning and rank parallelism
    val repart = TrainingMix.sampleStratified(
      docs.repartition(7, col("doc_id")), "source",
      Map("src0" -> 1000L, "src1" -> 3L, "src2" -> 0L),
      defaultCount = 5L, nParts = 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(repart.toSet == out.toSet)
  }

  test("interleave: output is identical for any partition count (parallelism knob only)") {
    val at3 = TrainingMix.interleave(docs, "source", nParts = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val at32 = TrainingMix.interleave(docs, "source", nParts = 32)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(at3 == at32)
    // read positions are collision-free
    assert(at3.values.toSet.size == at3.size)
  }

  test("capPerStratum: exactly the top-N per stratum, partition invariant") {
    import org.apache.spark.sql.functions.{col, length}
    val keyed = docs.select(col("doc_id"), col("source"), length(col("text")).as("len"))
    val out = TrainingMix.capPerStratum(
        keyed, "source", Seq(col("len").desc, col("doc_id").asc),
        n = 4L, nParts = 8, keep = Seq("doc_id", "source"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // replicate locally: longest 4 per source, doc_id tiebreak
    val expected = keyed.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .groupBy(_._2).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._3, r._1)).take(4).map(r => (r._1, r._2)).toSeq
      }.toSet
    assert(out.toSet == expected, s"got ${out.length}, expected ${expected.size}")
    assert(out.groupBy(_._2).values.forall(_.length <= 4))
    // deterministic under any input partitioning / rank parallelism
    val repart = TrainingMix.capPerStratum(
        keyed.repartition(7, col("doc_id")), "source",
        Seq(col("len").desc, col("doc_id").asc),
        n = 4L, nParts = 3, keep = Seq("doc_id", "source"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(repart == expected)
  }

  test("dsirWeights: target-like vocabulary ranks first, invariant to partitioning") {
    val docs = Seq(
      (1L, "aa aa aa aa", true),
      (2L, "aa aa bb bb", true),
      (3L, "aa aa aa bb", false),
      (4L, "bb bb bb bb", false),
      (5L, "cc cc cc cc", false))
      .toDF("doc_id", "text", "tgt")
    val out = TrainingMix.dsirWeights(docs, "text", col("tgt"),
        buckets = 4096, nParts = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(out.size == 5 && out.values.forall(_._1 == 4L))
    // target model is 'aa'-heavy -> more 'aa' means higher weight; the
    // never-seen-in-target vocabulary ('cc') ranks dead last
    assert(out.toSeq.sortBy(_._2._3).map(_._1) == Seq(1L, 3L, 2L, 4L, 5L))
    assert(out(1L)._2 > out(3L)._2 && out(4L)._2 > out(5L)._2)
    val repart = TrainingMix.dsirWeights(docs.repartition(7, col("doc_id")),
        "text", col("tgt"), buckets = 4096, nParts = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getInt(3)))).toMap
    assert(repart == out)
  }

  test("gumbelTopK: T->0 is greedy; the draw is reproducible under repartitioning") {
    val docs = Seq(
      (1L, "aa aa aa aa", true),
      (2L, "aa aa bb bb", true),
      (3L, "aa aa aa bb", false),
      (4L, "bb bb bb bb", false),
      (5L, "cc cc cc cc", false))
      .toDF("doc_id", "text", "tgt")
    val scored = TrainingMix.dsirScores(docs, "text", col("tgt"), buckets = 4096)
    // near-zero temperature: logw/T dominates any Gumbel draw -> the
    // selection is exactly the greedy weight ranking
    val greedy = TrainingMix.gumbelTopK(scored, temperature = 1e-6, k = 3)
      .orderBy(col("rank")).collect().map(_.getLong(0)).toSeq
    assert(greedy == Seq(1L, 3L, 2L))
    val draw = TrainingMix.gumbelTopK(scored, temperature = 1.0, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3))).toSet
    assert(draw.size == 3)
    val redraw = TrainingMix.gumbelTopK(
        scored.repartition(5, col("doc_id")), temperature = 1.0, k = 3)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getInt(3))).toSet
    assert(redraw == draw)
  }

  test("epochBudget: full copies exact, tail deterministic, cap binds") {
    // 10 docs x 4 tokens = 40 unique tokens
    val docs = (1L to 10L).map(d => (d, "web", "a b c d")).toDF("doc_id", "source", "text")
    // budget 100 = 2.5 epochs: 2 full copies of everything + ~half a tail
    val out = TrainingMix.epochBudget(docs, "source", "text", budgetTokens = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val full = out.filter(_._2 <= 2L)
    assert(full.size == 20, "every doc must appear in both full epochs")
    val tail = out.filter(_._2 == 3L).map(_._1).toSet
    assert(tail.nonEmpty && tail.size < 10, s"tail must be a strict sample: $tail")
    // deterministic under repartitioning
    val again = TrainingMix.epochBudget(docs.repartition(7), "source", "text", 100L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(again.toSet == out.toSet)
    // budget below unique: single fractional epoch = plain subsample
    val sub = TrainingMix.epochBudget(docs, "source", "text", budgetTokens = 20L)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(sub.forall(_._2 == 1L) && sub.size < 10 && sub.nonEmpty)
    // budget far past the cap: exactly maxEpochs full copies, no tail
    val capped = TrainingMix.epochBudget(docs, "source", "text",
      budgetTokens = 4000L, maxEpochs = 4)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(capped.size == 40 && capped.map(_._2).max == 4L,
      "excess budget past maxEpochs*unique must stay unspent")
  }
}
