package graft.text

import graft.plans.DistributedRank
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix assembly operators: sequence packing and deterministic
  * source interleaving (north-star LLM-pipeline surface; the reference
  * has no analogue — cited design rationale in SURVEY.md §6).
  */
object TrainingMix {

  /** Default shard/partition count for the sharded operators: the
    * session's shuffle parallelism. The right value at real scale is
    * CORPUS-sized, not cluster-sized — for packing, aim for
    * `total_tokens / (budget * shards)` around 10^4..10^5 bins per
    * shard (thousands of shards at 100 TB), so one task's window
    * stays comfortably in memory while fragmentation (bounded below)
    * stays negligible.
    */
  def defaultShards(spark: SparkSession): Int =
    spark.conf.get("spark.sql.shuffle.partitions").toInt

  /** Concat-and-chunk packing: assign documents to fixed token-budget
    * bins. Packing is inherently sequential (each bin's content depends
    * on every earlier document), so a single global cumulative sum would
    * serialize the whole corpus through one partition — instead docs
    * hash into `shards` independent shards and pack within each
    * (shard, bin) in deterministic doc_id order.
    *
    * Shards-vs-fragmentation tradeoff: each shard packs independently,
    * so only its LAST bin can be under-filled — wasted capacity is
    * bounded by `shards * (budget - 1)` tokens across the whole corpus,
    * i.e. a fraction `shards * budget / total_tokens`. More shards =
    * more parallelism at that (tiny) bounded cost; the output bin ids
    * themselves depend on the shard count, so pipelines must pin it for
    * reproducibility (the registry pins 16 to match the oracle).
    */
  def packSequences(docs: DataFrame, textCol: String, budget: Int, shards: Int): DataFrame =
    packCounts(docs.select(
      col("doc_id"),
      size(TextAnalysis.wordTokens(col(textCol))).as("n_tokens")), budget, shards)

  /** The packing rule over a pre-counted (doc_id, n_tokens) frame — the
    * seam `text_pack_bpe` shares: token counting is the tokenizer's
    * job (whitespace, BPE, anything), binning is this one sharded
    * cumsum regardless.
    */
  def packCounts(counted: DataFrame, budget: Int, shards: Int): DataFrame = {
    require(budget > 0 && shards > 0, "budget and shards must be positive")
    val d = counted.select(
      col("doc_id"), col("n_tokens"),
      pmod(TextAnalysis.hash60(concat(lit("shard:"), col("doc_id"))), lit(shards.toLong)).as("shard"))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    d.withColumn("cum", sum(col("n_tokens")).over(w))
      // integral `div`, mirroring the oracle's `//`: double division
      // loses mantissa bits once a shard's cumulative tokens pass
      // 2^53 — exactly the scale this formulation exists for
      .select(col("doc_id"), col("n_tokens"), col("shard"),
        expr(s"(cum - n_tokens) div $budget").as("bin"))
  }

  /** Deterministic per-source rate sampling — domain REWEIGHTING for a
    * training mix (down-sample over-represented sources, keep rare ones
    * whole). A doc survives iff
    * `hash("sample:" ++ doc_id) mod 1e6 < rate(source) * 1e6`:
    * stable under any partitioning, re-run, or reshuffle (no random()),
    * and independent draws across docs. Rates are fractions in [0, 1];
    * sources missing from `rates` use `defaultRate`.
    *
    * Scale: a pure narrow filter over one scan — no shuffle, no join
    * (the rate table rides along as a literal CASE expression; for
    * thousands of sources switch to a broadcast-joined rate dimension).
    */
  def sampleByRate(
      docs: DataFrame, sourceCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0.0 && r <= 1.0),
      "sampling rates must be in [0, 1]")
    val M = 1000000L
    val threshold = rates.toSeq.sortBy(_._1).foldRight(
      lit(math.round(defaultRate * M)): org.apache.spark.sql.Column) {
      case ((s, r), acc) => when(col(sourceCol) === s, lit(math.round(r * M))).otherwise(acc)
    }
    docs.filter(
      pmod(TextAnalysis.hash60(concat(lit("sample:"), col("doc_id"))), lit(M)) < threshold)
      .select(col("doc_id"), col(sourceCol))
  }

  /** `sample_target_mix`: domain reweighting toward a TARGET token
    * budget — the production form of mix sampling where the input is
    * "40% web, 30% code, ..." plus a total token budget, not hand-tuned
    * per-source rates. Per-source rate = min(1, budget·w_s / tokens_s),
    * realized through the same deterministic hash-threshold draw as
    * [[sampleByRate]] (sample invariant under partitioning/re-runs, and
    * NESTED across budgets: a bigger budget's sample contains a smaller
    * one's, so curriculum re-cuts don't reshuffle what's already in).
    *
    * Weights are taken in basis points (w rounded to 1/10000) and the
    * threshold is computed in exact integer arithmetic, so any engine
    * reproduces the cut bit-for-bit — no floating-point knife edges.
    * Sources without a weight are excluded (rate 0).
    *
    * Scale: one column-pruned scan aggregates per-source token totals
    * (|sources| rows collected — bounded by source cardinality, the
    * same bounded-dimension assumption the interleave offsets make),
    * then one narrow filter over the corpus. No join, no shuffle of
    * documents.
    */
  /** `sample_stratified`: EXACT per-stratum sample sizes — the eval-set /
    * ablation-corpus cut where "about 10%" (Bernoulli `sampleBy`) is not
    * acceptable: exactly `counts(stratum)` docs per stratum (all of them
    * when a stratum is smaller), chosen by deterministic hash order so
    * the draw is uniform, stable under any partitioning or re-run, and
    * NESTED (a larger count's sample contains a smaller one's — same
    * curriculum-re-cut property as the budget sampler).
    *
    * Scale: ranking within strata goes through [[DistributedRank]]'s
    * two-pass range-partitioned rank — a plain
    * `Window.partitionBy(stratum)` would funnel each stratum through ONE
    * task (a 20%-of-corpus stratum on one executor at 100 TB); here no
    * task ever holds more than ~1/nParts of the data regardless of
    * stratum skew. The filter then keeps rank <= count via a literal
    * CASE (broadcast a count dimension instead beyond thousands of
    * strata).
    */
  def sampleStratified(
      docs: DataFrame, stratumCol: String,
      counts: Map[String, Long], defaultCount: Long, nParts: Int): DataFrame = {
    require((counts.values ++ Seq(defaultCount)).forall(_ >= 0), "counts must be >= 0")
    require(nParts > 0, "nParts must be positive")
    val limit = counts.toSeq.sortBy(_._1).foldRight(
      lit(defaultCount): org.apache.spark.sql.Column) {
      case ((s, n), acc) => when(col(stratumCol) === s, lit(n)).otherwise(acc)
    }
    val keyed = docs.select(
      col("doc_id"), col(stratumCol),
      TextAnalysis.hash60(concat(lit("strat:"), col("doc_id"))).as("_h"))
    DistributedRank.withGlobalRank(
        keyed, keyCols = Seq(stratumCol),
        order = Seq(col("_h").asc, col("doc_id").asc), nParts = nParts)
      .filter(col("_rk") <= limit)
      .select(col("doc_id"), col(stratumCol))
  }

  /** Quality-ranked per-stratum cap — the domain-balancing stage of a
    * web-corpus pipeline (RefinedWeb/FineWeb keep the best documents of
    * each domain rather than letting one boilerplate-heavy domain
    * dominate the mix): EXACTLY the top `n` rows of each stratum by
    * `order`, via the two-pass [[DistributedRank]] — no per-stratum
    * single-task window, so a million-domain corpus ranks in parallel.
    */
  def capPerStratum(
      docs: DataFrame, stratumCol: String,
      order: Seq[org.apache.spark.sql.Column],
      n: Long, nParts: Int,
      keep: Seq[String]): DataFrame = {
    require(n >= 0, "cap must be >= 0")
    require(nParts > 0, "nParts must be positive")
    DistributedRank.withGlobalRank(docs, keyCols = Seq(stratumCol), order, nParts)
      .filter(col("_rk") <= n)
      .select(keep.map(col): _*)
  }

  def sampleToTargetMix(
      docs: DataFrame, sourceCol: String, textCol: String,
      targetWeights: Map[String, Double], budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be non-negative")
    require(targetWeights.values.forall(w => w >= 0.0 && w <= 1.0),
      "target weights must be in [0, 1]")
    val M = 1000000L
    val tokensPerSource = docs
      .groupBy(col(sourceCol))
      .agg(sum(size(TextAnalysis.tokens(col(textCol))).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val thresholds = targetWeights.map { case (s, w) =>
      val bp = math.round(w * 10000) // basis points
      val t = tokensPerSource.getOrElse(s, 0L)
      // exact integer math, same operation order as the SQL oracle:
      // min(M, budget * bp * M / (10000 * tokens)). BigInt because the
      // production inputs are multi-trillion-token budgets, where
      // budget*bp*M overflows Long (negative threshold = source silently
      // sampled at rate 0); driver-side, |sources| iterations.
      val thr =
        if (t == 0L) M
        else (BigInt(budgetTokens) * BigInt(bp) * BigInt(M) /
          (BigInt(10000L) * BigInt(t))).min(BigInt(M)).toLong
      s -> thr
    }
    val thrExpr = thresholds.toSeq.sortBy(_._1).foldRight(lit(0L): org.apache.spark.sql.Column) {
      case ((s, thr), acc) => when(col(sourceCol) === s, lit(thr)).otherwise(acc)
    }
    docs.filter(
      pmod(TextAnalysis.hash60(concat(lit("sample:"), col("doc_id"))), lit(M)) < thrExpr)
      .select(col("doc_id"), col(sourceCol))
  }

  /** `sample_temperature`: temperature-scaled mix reweighting (the
    * T5/mT5 α-multinomial, Raffel et al. 2020 §3.4.2 / Xue et al. 2021
    * §3.1): source weights ∝ tokens^α with α < 1 FLATTEN the natural
    * distribution, upsampling low-resource sources relative to their
    * share — the standard fix for high-resource domination in a
    * multi-source training mix. α = 1/2 here (the T5 report's value),
    * realized EXACTLY across engines: the weight is the integer sqrt of
    * the source's token count (IEEE sqrt of an exactly-representable
    * long is correctly rounded, so floor(sqrt(t)) agrees everywhere),
    * feeding the same BigInt threshold arithmetic and deterministic
    * hash draw as [[sampleToTargetMix]] (independently salted). Rates
    * keep the relative ordering r_small/r_big = (iw_small/t_small) /
    * (iw_big/t_big) ≈ sqrt(t_big/t_small) — the flattening, exact.
    *
    * Scale: one column-pruned stats agg (|sources| rows collected) +
    * one narrow filter; no shuffle of documents.
    */
  def sampleTemperature(
      docs: DataFrame, sourceCol: String, textCol: String,
      budgetTokens: Long): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be non-negative")
    val M = 1000000L
    val tokensPerSource = docs
      .groupBy(col(sourceCol))
      .agg(sum(size(TextAnalysis.tokens(col(textCol))).cast("long")).as("t"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val iw = tokensPerSource.map { case (s, t) =>
      s -> BigInt(math.sqrt(t.toDouble).toLong) // floor; exact cross-engine
    }
    val totalW = iw.values.sum
    val thresholds = tokensPerSource.map { case (s, t) =>
      val thr =
        if (t == 0L || totalW == 0) BigInt(0)
        else (BigInt(budgetTokens) * iw(s) * BigInt(M) /
          (totalW * BigInt(t))).min(BigInt(M))
      s -> thr.toLong
    }
    val thrExpr = thresholds.toSeq.sortBy(_._1).foldRight(lit(0L): org.apache.spark.sql.Column) {
      case ((s, thr), acc) => when(col(sourceCol) === s, lit(thr)).otherwise(acc)
    }
    docs.filter(
      pmod(TextAnalysis.hash60(concat(lit("tsample:"), col("doc_id"))), lit(M)) < thrExpr)
      .select(col("doc_id"), col(sourceCol))
  }

  /** Deterministic source interleaving: each source's docs get a stable
    * pseudo-random order (hash-ranked) and global read position
    * `rank * S + source_idx` — a round-robin mix of sources,
    * reproducible under any partitioning.
    *
    * The per-source rank runs through [[DistributedRank]]: a handful of
    * sources means a plain per-source window would pull `corpus / S`
    * onto single tasks. `nParts` is a parallelism knob only — the ranks,
    * and therefore the output, are IDENTICAL for any value (the order is
    * total: hash, then doc_id).
    */
  def interleave(docs: DataFrame, sourceCol: String, nParts: Int): DataFrame = {
    require(nParts > 0, "nParts must be positive")
    // NULL sources group under a sentinel key instead of silently
    // falling out of the inner join (dropping training docs) or
    // diverging on NULL sort order (Spark nulls-first vs DuckDB
    // nulls-last); the original source value is preserved in output
    val srcKey = coalesce(col(sourceCol), lit("<none>"))
    // the global (unpartitioned) window below runs over the DISTINCT
    // source names only — |sources| rows, bounded by source cardinality
    // (the same assumption sampleToTargetMix's driver-side map makes),
    // never the corpus. Spark's "No Partition Defined" warning for it
    // is expected and harmless at any scale.
    val sources = docs.select(srcKey.as("_src")).distinct()
      .withColumn("source_idx",
        (row_number().over(Window.orderBy(col("_src"))) - 1).cast("long"))
      .withColumn("n_sources", count(lit(1)).over())
    val ranked = DistributedRank.withGlobalRank(
        docs.select(col("doc_id"), col(sourceCol).as("source"), srcKey.as("_src"),
          TextAnalysis.hash60(concat(lit("interleave:"), col("doc_id"))).as("_h")),
        keyCols = Seq("_src"),
        order = Seq(col("_h").asc, col("doc_id").asc),
        nParts = nParts)
      .withColumn("rk", (col("_rk") - 1).cast("long"))
    ranked.join(broadcast(sources), "_src")
      .select(col("doc_id"), col("source"),
        (col("rk") * col("n_sources") + col("source_idx")).cast("long").as("pos"))
  }

  /** `sample_dsir_weights`: Data Selection via Importance Resampling
    * (Xie et al. 2023, "Data Selection for Language Models via Importance
    * Resampling"): score every document by its log importance weight
    * under hashed-unigram bag-of-words models of a TARGET slice vs the
    * whole raw corpus,
    *
    *   log w(doc) = sum_b n(doc, b) * (ln p_target(b) - ln p_raw(b))
    *
    * with add-one smoothing over `buckets` hash buckets. Ranking by
    * log-weight is the deterministic (temperature-0 Gumbel-top-k)
    * selection variant — the pipeline keeps the top token budget.
    *
    * Scale: the token->bucket map is a pure projection; both feature
    * models are `buckets`-row aggregates (one hash shuffle each with
    * map-side partial counts — model state is bounded by B, never
    * corpus-sized); per-doc scoring joins (doc, bucket) counts against
    * the broadcast B-row log-ratio table; the final rank is a two-pass
    * [[DistributedRank]], never a single-task global window. Bucket hash
    * is md5-derived for oracle bit-parity (production swaps xxhash64).
    *
    * @param target  boolean Column marking the target-distribution docs
    *                (they stay in the scored output — DSIR scores the
    *                raw corpus, which includes them)
    * @return (doc_id, n_tokens, logw, rank) — rank 1 = most target-like.
    */
  def dsirWeights(
      docs: DataFrame, textCol: String, target: Column,
      buckets: Int, nParts: Int): DataFrame =
    DistributedRank.withGlobalRank(dsirScores(docs, textCol, target, buckets),
        keyCols = Seq.empty,
        order = Seq(col("logw").desc, col("doc_id").asc), nParts = nParts)
      .select(col("doc_id"), col("n_tokens"), col("logw"),
        col("_rk").cast("int").as("rank"))

  /** `sample_epoch_budget`: data-constrained scaling (Muennighoff et
    * al. 2023, arXiv:2305.16264). When the token budget EXCEEDS the
    * corpus's unique supply, repeating data is near-full value up to
    * ~4 epochs and near-worthless past that — so the allocator plans
    * `epochs = min(maxEpochs, budget / unique)` in exact ppm integer
    * math (BigInt: multi-trillion-token budgets overflow Long), and
    * every doc materializes floor(epochs) full copies plus membership
    * in ONE fractional tail epoch decided by the same deterministic
    * salted hash draw the samplers use — reproducible under any
    * partitioning, no random(). Budget past maxEpochs·unique is
    * deliberately left unspent (the paper's decay cliff). Output:
    * (doc_id, source, epoch) — the repeated-data training mix.
    *
    * Scale: one column-pruned stats agg (1 row collected), then a
    * map-side explode(sequence)+filter; documents never shuffle.
    */
  def epochBudget(
      docs: DataFrame, sourceCol: String, textCol: String,
      budgetTokens: Long, maxEpochs: Int = 4): DataFrame = {
    require(budgetTokens >= 0, "budgetTokens must be non-negative")
    require(maxEpochs >= 1, "maxEpochs must be at least 1")
    val M = 1000000L
    val unique = Option(
      docs.agg(sum(size(TextAnalysis.tokens(col(textCol))).cast("long")))
        .head().get(0)).map(_.asInstanceOf[Long]).getOrElse(0L)
    val epochsPpm =
      if (unique == 0L) 0L
      else (BigInt(budgetTokens) * BigInt(M) / BigInt(unique))
        .min(BigInt(maxEpochs) * BigInt(M)).toLong
    val full = epochsPpm / M
    val tailPpm = epochsPpm % M
    docs
      .select(col("doc_id"), col(sourceCol),
        explode(sequence(lit(1L), lit(full + 1L))).as("epoch"))
      .filter(col("epoch") <= lit(full) ||
        pmod(TextAnalysis.hash60(concat(lit("epoch:"), col("doc_id"))),
          lit(M)) < lit(tailPpm))
  }

  /** The unranked DSIR scoring stage (doc_id, n_tokens, logw) — consumed
    * directly by [[gumbelTopK]], which computes its own selection key
    * and must not pay the two-pass global rank just to discard it.
    */
  def dsirScores(
      docs: DataFrame, textCol: String, target: Column, buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val toks = docs
      .select(col("doc_id"), target.as("is_target"),
        explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .withColumn("b",
        // native 24-bit md5 prefix (== the former conv(substring(md5)))
        pmod(graft.functions.TextHashScan.md5Prefix(col("tok"), 6).cast("int"),
          lit(buckets)))
    // ONE pass builds the per-doc feature counts; both models and the
    // totals derive from it (is_target is constant per doc, so the extra
    // grouping key changes nothing) — a per-aggregate formulation
    // re-executed the scan + tokenize subtree once per consumer (4 full
    // corpus passes in the original plan).
    val docBuckets = toks.groupBy(col("doc_id"), col("is_target"), col("b"))
      .agg(count(lit(1)).as("c"))
    // B-row model table, raw and target counts in one aggregation; a
    // bucket absent from raw cannot occur in any doc, so it is complete.
    // localCheckpoint pins the tiny table: totals and lam below would
    // otherwise each re-run the corpus aggregation feeding it.
    val bAgg = docBuckets.groupBy(col("b"))
      .agg(sum(col("c")).as("cr"),
        coalesce(sum(when(col("is_target"), col("c"))), lit(0L)).as("ct"))
      .localCheckpoint()
    val totals = bAgg.agg(sum(col("cr")).as("nr"), sum(col("ct")).as("nt"))
    val lam = bAgg.crossJoin(totals)
      .select(col("b"),
        (log((col("ct") + lit(1L)).cast("double") /
            (col("nt") + lit(buckets.toLong)).cast("double")) -
          log((col("cr") + lit(1L)).cast("double") /
            (col("nr") + lit(buckets.toLong)).cast("double"))).as("lam"))
    docBuckets.join(broadcast(lam), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        (round(sum(col("c").cast("double") * col("lam")), 4) + lit(0.0)).as("logw"))
  }

  /** `sample_gumbel_topk`: the resampling step of DSIR proper — sampling
    * k docs WITHOUT replacement with probability proportional to
    * exp(logw / T) is exactly taking the top k of logw/T + Gumbel noise
    * (the Gumbel-top-k trick; Xie et al. 2023 §3 sample this way). The
    * noise is derived from an md5 hash of the doc id, so the draw is
    * reproducible across runs, engines, and partitionings — a training
    * pipeline must be able to re-materialize the exact mix it shipped.
    * Temperature interpolates between greedy top-k (T->0) and uniform
    * sampling (T->inf).
    *
    * Scale: one map-side expression over the scored table, then a
    * distributed top-k (TakeOrdered — per-partition heaps, never a
    * global sort).
    */
  def gumbelTopK(scored: DataFrame, temperature: Double, k: Int): DataFrame = {
    require(temperature > 0, "temperature must be positive")
    require(k > 0, "k must be positive")
    val u = ((TextAnalysis.hash60(concat(lit("gumbel:"), col("doc_id")))
      % lit(1000000L)).cast("double") + lit(0.5)) / lit(1000000.0)
    val key = round(col("logw") / lit(temperature) - log(-log(u)), 4) + lit(0.0)
    val top = scored.withColumn("key", key)
      .orderBy(col("key").desc, col("doc_id").asc).limit(k)
    // the k survivors are bounded and tiny: the global rank window here
    // runs over <= k rows, never the corpus
    top.withColumn("rank", row_number().over(
        Window.orderBy(col("key").desc, col("doc_id").asc)).cast("int"))
      .select(col("doc_id"), col("logw"), col("key"), col("rank"))
  }
}
