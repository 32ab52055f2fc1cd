package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * token counting, quality scoring, language identification, document
  * fingerprinting. These are extensions beyond the reference's own surface
  * (its `documents`-style payloads are opaque strings parsed downstream);
  * designed here as pure narrow transformations — no shuffle, no UDFs,
  * everything whole-stage-codegen'd `functions._` / higher-order array
  * expressions, so they stream over 100 TB of parquet at scan speed.
  */
object TextAnalysis {

  /** Cross-engine-stable 60-bit hash of a string (first 15 hex digits of
    * md5). Used for fingerprints/minhash so the DuckDB oracle can
    * reproduce values exactly; Spark's native murmur `hash()` is faster
    * but engine-private (use it when oracle parity is not required).
    * Native single pass — bit-identical (spec-pinned) to the former
    * `conv(substring(md5(c), 1, 15), 16, 10).cast("long")`, which paid
    * four string round-trips per row (hex render, substring, conv's
    * hex parse + decimal render, cast's decimal parse).
    */
  def hash60(c: Column): Column =
    graft.functions.TextHashScan.md5Prefix(c, 15)

  /** Whitespace tokens of a non-empty trimmed document. */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** Word tokens per a BPE-ish regex (runs of alphanumerics). */
  def wordTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z0-9]+"), lit(0))

  /** `text_token_count`: whitespace tokens, regex word tokens, chars. */
  def tokenCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(
      col("doc_id"),
      size(tokens(col(textCol))).as("ws_tokens"),
      size(wordTokens(col(textCol))).as("word_tokens"),
      length(col(textCol)).as("n_chars"))

  /** Composite [0,1] quality score as ONE column expression, so pipeline
    * stages (corpus_clean) can append it to an existing scan instead of
    * joining a separately-derived table. All ratios DECIMAL-rounded so
    * the score is bit-stable across engines.
    */
  def qualityScoreCol(text: Column): Column = {
    val toks = tokens(text)
    val nChars = length(text)
    val nTok = size(toks)
    val stopHits = graft.functions.CountIn.countIn(toks, StopwordsEn)
    val punct = nChars - length(regexp_replace(text, "[\\p{Punct}]", ""))
    def r6(c: Column) = round(c.cast("double"), 6)
    val stopRatio = r6(stopHits.cast("double") / nTok)
    val punctRatio = r6(punct.cast("double") / nChars)
    // composite: in-range token count, some stopwords, low punctuation
    r6(
      when(nTok.between(10, 100000), 0.4).otherwise(0.0) +
        when(stopRatio > 0.05, 0.3).otherwise(0.0) +
        when(punctRatio < 0.2, 0.3).otherwise(0.0))
  }

  /** `text_quality_score`: length/punctuation/stopword/word-shape signals
    * with the composite score — the standard cheap pre-filter stage of a
    * training-data pipeline.
    */
  def qualityScore(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val words = wordTokens(col(textCol))
    val nChars = length(col(textCol))
    val nTok = size(toks)
    val stopHits = graft.functions.CountIn.countIn(toks, StopwordsEn)
    val punct = nChars - length(regexp_replace(col(textCol), "[\\p{Punct}]", ""))
    def r6(c: Column) = round(c.cast("double"), 6)
    val stopRatio = r6(stopHits.cast("double") / nTok)
    val punctRatio = r6(punct.cast("double") / nChars)
    val meanWordLen = r6(
      aggregate(words, lit(0L), (acc, w) => acc + length(w)).cast("double") /
        greatest(size(words), lit(1)))
    df.select(
      col("doc_id"), nTok.as("n_tokens"), stopRatio.as("stop_ratio"),
      punctRatio.as("punct_ratio"), meanWordLen.as("mean_word_len"),
      qualityScoreCol(col(textCol)).as("quality_score"))
  }

  /** `quality_model_score`: logistic-model quality inference — the
    * classifier-filter stage of a training-data pipeline (production
    * runs a trained fasttext/linear model; the engine-native contract is
    * the INFERENCE plumbing: fixed published-style weights over the
    * [[qualityScore]] feature vector, scored entirely in column
    * expressions). score = sigmoid(w·x + b) on the 6-dp-rounded
    * features, rounded to 4 dp; `keep` gates on the rounded score so
    * the oracle's knife-edge behavior is identical.
    *
    * Shape: pure narrow projection over one scan — no shuffle, no UDF,
    * whole-stage codegen; at 100 TB this is a map-only pass, exactly
    * what classifier scoring must be.
    */
  def modelScore(df: DataFrame, textCol: String): DataFrame = {
    val f = qualityScore(df, textCol)
    // weights: favor stopword density, penalize punctuation noise and
    // extreme length; intercept centers mid-corpus docs near 0.5
    val z = lit(-0.8) +
      lit(6.0) * col("stop_ratio") -
      lit(4.0) * col("punct_ratio") +
      lit(0.2) * col("mean_word_len") -
      lit(0.004) * col("n_tokens").cast("double")
    val score = round(lit(1.0) / (lit(1.0) + exp(-z)), 4)
    f.select(col("doc_id"), score.as("model_score"),
      (score >= 0.5).as("keep"))
  }

  /** Tiny per-language function-word marker lists for the n-gram/stopword
    * language-ID heuristic. Whole-token matches only.
    */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr" -> Seq("le", "la", "de", "et", "un", "est", "que"),
    "zh" -> Seq("de", "shi", "le", "zai", "you", "wo", "ta"))

  val StopwordsEn: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "on", "is", "are")

  /** Predicted language as ONE column expression (argmax of marker hits,
    * marker-list-order tie-break, 'und' when no hits) — the fusable form
    * of [[languageId]] for pipeline stages.
    */
  def predictedLangCol(text: Column): Column = {
    val toks = tokens(lower(text))
    val bestStruct = Markers.zipWithIndex.map { case ((lang, words), i) =>
      struct(graft.functions.CountIn.countIn(toks, words).as("s"),
        lit(Markers.size - i).as("r"), lit(lang).as("l"))
    }
    val g = greatest(bestStruct: _*)
    when(g.getField("s") === 0, lit("und")).otherwise(g.getField("l"))
  }

  /** `text_language_id`: score = marker hits per language over lowercase
    * whitespace tokens; predict the argmax with lexicographic tie-break
    * ('und' = undetermined when no marker hits at all).
    */
  def languageId(df: DataFrame, textCol: String): DataFrame = {
    val toks = tokens(lower(col(textCol)))
    val scored = Markers.foldLeft(df.select(col("doc_id"), toks.as("_toks"))) {
      case (d, (lang, words)) =>
        d.withColumn(s"score_$lang", graft.functions.CountIn.countIn(col("_toks"), words))
    }
    val best = Markers.map { case (lang, _) => struct(col(s"score_$lang").as("s"), lit(lang).as("l")) }
    // greatest() on structs orders by score then language desc; we want
    // lexicographic-asc tie-break, so invert via negated-lang trick: order
    // structs by (score, reverse-rank) using the marker list order.
    val bestStruct = Markers.zipWithIndex.map { case ((lang, _), i) =>
      struct(col(s"score_$lang").as("s"), lit(Markers.size - i).as("r"), lit(lang).as("l"))
    }
    val outCols = col("doc_id") +:
      (Markers.map { case (l, _) => col(s"score_$l") } :+
        when(greatest(bestStruct: _*).getField("s") === 0, lit("und"))
          .otherwise(greatest(bestStruct: _*).getField("l")).as("predicted_lang"))
    scored.select(outCols: _*)
  }

  /** `text_fingerprint`: whole-document content hash + a winnowing-style
    * shingle fingerprint (min over k-char-shingle hashes) that is robust
    * to local edits — the standard rolling-hash document signature.
    *
    * Row-shaped (explode positions -> hash -> map-side min aggregation):
    * the array-lambda formulation (`transform(sequence(...))`) runs on
    * the interpreted expression path and was the registry's slowest
    * narrow op; only (doc_id, hash) pairs reach the shuffle.
    */
  /** `text_unigram_logprob`: per-document mean negative log-likelihood
    * under the corpus's own unigram language model — the
    * perplexity-filter quality signal (a production pipeline scores
    * against a pretrained LM, e.g. KenLM; self-trained unigram is the
    * engine-native, fully-reproducible form). High nll = tokens rare in
    * this corpus = boilerplate/garbage/outlier candidates; pairs with
    * [[qualityScore]]'s surface heuristics.
    *
    * Shape: tokenize once, count tokens (one shuffle with map-side
    * combine), join docs' tokens back to the frequency table (shuffle
    * on token), aggregate per doc. The frequency table is corpus-wide
    * vocabulary — at 100 TB you'd cap it to a top-V broadcast with an
    * OOV floor; the exact join form is kept here because it is the
    * oracle-verifiable contract and the join key (token) is
    * high-cardinality, well-distributed.
    */
  def unigramLogprob(df: DataFrame, textCol: String): DataFrame = {
    // NOTE (r20, examined and deliberately kept): a per-(doc, token)
    // pre-aggregation (score distinct pairs tf-weighted instead of
    // every instance) was measured at +39% on this key at sf0.1 — the
    // extra (doc, tok) hash-agg pays a full pass over all instances
    // while fixture docs repeat tokens too little for the join-volume
    // reduction to pay it back; kept as the instance-join shape
    val toks = df.select(col("doc_id"), explode(tokens(col(textCol))).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val total = freq.agg(sum(col("c")).as("n"))
    toks.join(freq, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg((round(-avg(log(col("c") / col("n"))), 4) + lit(0.0)).as("nll"),
        count(lit(1)).as("n_tokens"))
  }

  /** `corpus_zipf_fit`: least-squares fit of the token frequency
    * distribution against Zipf's law — slope of ln(freq) over ln(rank)
    * for the top-N tokens. A natural corpus sits near slope ≈ −1;
    * boilerplate-heavy or templated corpora flatten it, spammy
    * repetition steepens it, so the single number is a cheap
    * whole-corpus health gauge to trend per ingest batch.
    *
    * Scale: one token count (hash agg), a distributed top-N
    * (TakeOrdered — N caps the tail, so the fit frame is bounded at
    * any corpus size; the keyless rank window runs over exactly N
    * rows), and exact DECIMAL sums of the 10-dp-rounded log points so
    * the regression is bit-stable under any partitioning.
    */
  def zipfFit(df: DataFrame, textCol: String, topN: Int = 1000): DataFrame = {
    require(topN > 1, "the fit needs at least two points")
    import org.apache.spark.sql.expressions.Window
    val freq = df.select(explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val top = freq.orderBy(col("c").desc, col("tok").asc).limit(topN)
    val d10 = (e: Column) => round(e, 10).cast("decimal(18,10)")
    val pts = top
      .withColumn("r", row_number().over(
        Window.orderBy(col("c").desc, col("tok").asc)))
      .select(d10(log(col("r"))).as("x"), d10(log(col("c"))).as("y"))
    val s = pts.agg(
      count(lit(1)).cast("double").as("n"),
      sum(col("x")).cast("double").as("sx"),
      sum(col("y")).cast("double").as("sy"),
      sum(col("x") * col("x")).cast("double").as("sxx"),
      sum(col("x") * col("y")).cast("double").as("sxy"))
    val slope = (col("n") * col("sxy") - col("sx") * col("sy")) /
      (col("n") * col("sxx") - col("sx") * col("sx"))
    s.select(col("n").cast("long").as("n_fit"),
      (round(slope, 4) + lit(0.0)).as("zipf_slope"),
      (round((col("sy") - slope * col("sx")) / col("n"), 4) + lit(0.0))
        .as("intercept"))
  }

  /** `corpus_ppl_buckets`: CCNet's head/middle/tail corpus split
    * (Wenzek et al. 2020 §3 — each language's documents rank by LM
    * perplexity and cut into equal terciles; "head" is the most
    * fluent third, the slice most LLM pretraining mixes upsample).
    * The LM is the corpus's own unigram model ([[unigramLogprob]],
    * already 4-dp-rounded and sign-normalized, so the ORDERING the
    * cut depends on is bit-identical across engines); the tercile
    * assignment is pure integer rank math (rk*3 vs n), no floating
    * percentile to knife-edge on.
    *
    * Scale: the per-language rank is the two-pass
    * [[graft.plans.DistributedRank]] — a plain per-language window
    * would pull corpus/|languages| onto single tasks. Everything else
    * is the unigram scorer's two hash aggs + one doc-keyed join.
    */
  def pplBuckets(df: DataFrame, textCol: String, nParts: Int): DataFrame = {
    val nll = unigramLogprob(df, textCol).select(col("doc_id"), col("nll"))
    val scored = df.select(col("doc_id"),
        coalesce(col("lang"), lit("<none>")).as("lang"))
      .join(nll, "doc_id")
    graft.plans.DistributedRank.withGlobalRank(
        scored, Seq("lang"), Seq(col("nll").asc, col("doc_id").asc), nParts)
      .select(col("doc_id"), col("lang"), col("nll"),
        when(col("_rk") * 3 <= col("_n"), "head")
          .when(col("_rk") * 3 <= col("_n") * 2, "middle")
          .otherwise("tail").as("bucket"))
  }

  /** `corpus_line_dedup`: C4's line-level dedup (Raffel et al. 2020
    * §2.2 — "we discarded all but one of any three-sentence span
    * occurring more than once", realized here at line granularity, the
    * common production variant): every line of `minWords`+ words that
    * occurs anywhere else in the corpus keeps only its FIRST occurrence
    * (by (doc_id, position) — deterministic under any partitioning);
    * shorter lines always keep (boilerplate-length fragments like ""
    * or "Home" would otherwise destroy every document). Docs reassemble
    * in original line order.
    *
    * Scale: posexplode lines (linear), ONE hash shuffle keyed by line
    * content with map-side partial min for the first-occurrence
    * resolution, one doc-keyed reassembly agg bounded by doc length.
    * No all-pairs stage, nothing driver-side.
    */
  def lineDedup(df: DataFrame, textCol: String, minWords: Int = 5): DataFrame = {
    val lines = df
      .select(col("doc_id"), posexplode(split(col(textCol), "\n")))
      .toDF("doc_id", "pos", "line")
      .withColumn("eligible", size(tokens(col("line"))) >= minWords &&
        length(trim(col("line"))) > 0)
    // first occurrence per eligible line: lexicographic struct min over
    // (doc_id, pos) — collision-free at ANY doc count or length (a
    // packed arithmetic key silently collides past its digit budget)
    val first = lines.filter(col("eligible"))
      .groupBy(col("line"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("first_at"))
    val kept = lines
      .join(first, Seq("line"), "left")
      .filter(!col("eligible") ||
        (col("doc_id") === col("first_at.doc_id") && col("pos") === col("first_at.pos")))
    kept.groupBy(col("doc_id"))
      .agg(
        concat_ws("\n", transform(
          array_sort(collect_list(struct(col("pos"), col("line")))),
          s => s.getField("line"))).as("clean_text"),
        count(lit(1)).as("n_lines_kept"))
      .join(
        lines.groupBy(col("doc_id")).agg(count(lit(1)).as("n_lines")),
        Seq("doc_id"))
      .select(col("doc_id"), col("clean_text"),
        col("n_lines_kept"), (col("n_lines") - col("n_lines_kept")).as("n_lines_dropped"))
  }

  /** `quality_topfrac_gate`: calibrate the model-score gate to a target
    * KEEP RATE instead of a fixed score — "keep the top 60%" survives
    * corpus drift where "keep score >= 0.5" silently changes its keep
    * rate every refresh. The threshold is the exact (1 − keepFrac)
    * quantile of the model scores (one aggregate, broadcast back; the
    * scores are already 4-dp-rounded so the quantile interpolates
    * between stable values — at 100 TB swap the exact percentile for
    * approx_percentile, same plan shape), rounded to 6 dp on BOTH the
    * threshold and the comparison so the gate has no float knife edge.
    */
  def topFracGate(df: DataFrame, textCol: String, keepFrac: Double): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0, "keepFrac must be in (0, 1]")
    val scored = modelScore(df, textCol).select(col("doc_id"), col("model_score"))
    val thr = scored.agg(
      round(expr(s"percentile(model_score, ${1.0 - keepFrac})"), 6).as("thr"))
    scored.crossJoin(broadcast(thr))
      .select(col("doc_id"), col("model_score"), col("thr"),
        (col("model_score") >= col("thr")).as("kept"))
  }

  /** `text_bigram_logprob`: per-document mean NLL under the corpus's own
    * INTERPOLATED bigram LM — `p(w|prev) = λ·c(prev w)/c(prev) +
    * (1−λ)·c(w)/N` (Jelinek-Mercer smoothing, λ = 0.75). The bigram
    * refinement of [[unigramLogprob]]'s perplexity-filter signal: a doc
    * of common words in an uncommon ORDER scores high here where the
    * unigram model cannot see the disorder (shuffled-text spam, n-gram
    * keyword stuffing). Shape: tokenize once; bigrams build array-side
    * (zip of shifted slices, no per-token window); counts are two hash
    * aggregations with map-side partials; scoring joins doc bigrams to
    * the count tables on their keys — every stage linear in corpus
    * tokens, no all-pairs, nothing driver-side. Docs with < 2 tokens
    * carry nll = 0 with n_bigrams = 0 (no bigram evidence — gate those
    * by length upstream, not perplexity). The interpolation keeps every
    * probability strictly positive without held-out tuning: both terms
    * come from the same corpus the filter runs over.
    */
  def bigramLogprob(df: DataFrame, textCol: String, lambda: Double = 0.75): DataFrame = {
    val toks = df.select(col("doc_id"), tokens(col(textCol)).as("toks"))
    val uni = toks.select(col("doc_id"), explode(col("toks")).as("tok"))
    val freq = uni.groupBy(col("tok")).agg(count(lit(1)).as("c1"))
    val total = freq.agg(sum(col("c1")).as("n"))
    val bg = toks
      // native one-pass adjacent-pair assembly (== the former zip_with
      // of shifted slices guarded by size >= 2: empty below 2 tokens,
      // spec-pinned in WordGramScanSpec); the zip_with paid an
      // interpreted lambda plus two slice copies per document
      .select(col("doc_id"),
        explode(graft.functions.WordGramScan.wordPairs(col("toks"))).as("b"))
      .select(col("doc_id"), col("b.prev").as("prev"), col("b.tok").as("tok"))
    // NOTE (r20, examined and deliberately kept): a per-(doc, prev,
    // tok) pre-aggregation (score distinct triples weighted) was
    // measured at +15% on this key at sf0.1 — bigrams are nearly
    // unique within a document, so the extra hash-agg compresses
    // nothing; kept as the instance-join shape
    val bfreq = bg.groupBy(col("prev"), col("tok")).agg(count(lit(1)).as("c2"))
    val scored = bg
      .join(bfreq, Seq("prev", "tok"))
      .join(freq.select(col("tok").as("prev"), col("c1").as("cprev")), Seq("prev"))
      .join(freq, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(
        (-avg(log(lit(lambda) * col("c2") / col("cprev") +
          lit(1.0 - lambda) * col("c1") / col("n")))).as("raw"),
        count(lit(1)).as("nb"))
    df.select(col("doc_id")).join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        (round(coalesce(col("raw"), lit(0.0)), 4) + lit(0.0)).as("nll"),
        coalesce(col("nb"), lit(0L)).as("n_bigrams"))
  }

  /** `text_repetition_stats`: per-document repetition quality signals in
    * the Gopher-rules family (Rae et al. 2021, arXiv:2112.11446 §A1.1 —
    * the reference has no analogue; these are the filters a training
    * corpus is actually cleaned with):
    *   - `dup_word_frac`  — 1 - distinct/total words (repeated-token mass),
    *   - `top2gram_frac`  — share of word-2-grams taken by the most
    *     frequent one (loops/boilerplate pump this),
    *   - `word_entropy`   — Shannon entropy of the word distribution in
    *     nats, via H = ln(n) - sum(c·ln c)/n (degenerate docs → 0),
    *   - `repetitive`     — the gate: top2gram_frac >= `maxTop2` OR
    *     dup_word_frac >= `maxDupWord`, both compared on the ROUNDED
    *     values so the oracle's knife-edge behavior is identical.
    *
    * Shape: tokenize once; 2-grams are built array-side (one O(n)
    * per-doc transform, no window sort — a lead() window would shuffle
    * AND sort every token row by (doc_id, pos) for what a local
    * adjacency zip gives for free); both count aggregations are
    * doc-keyed groupBys with map-side partial combine, so the shuffle
    * carries per-partition distinct (doc, gram) partials, bounded by doc
    * length. Nothing is corpus-global — scales linearly at 100 TB.
    */
  def repetitionStats(
      df: DataFrame, textCol: String,
      maxTop2: Double = 0.08, maxDupWord: Double = 0.6): DataFrame = {
    val base = df.select(col("doc_id"), tokens(col(textCol)).as("toks"))
    // ONE corpus pass feeds BOTH signal families: words and 2-grams
    // (native one-pass assembly, spec-pinned in WordGramScanSpec)
    // explode together — they are textually disjoint, a token never
    // contains a space and a 2-gram always contains exactly one — count
    // in one (doc, element) aggregation, then split back with
    // conditional aggregates over the space discriminator. The former
    // shape tokenized and scanned the corpus twice and joined two
    // doc-keyed aggregates back together (2 scans + 4 exchanges +
    // 1 join → 1 scan + 2 exchanges); values are unchanged: each
    // conditional aggregate sees exactly the rows its family's
    // aggregation saw, and docs with no 2-gram (single-token docs)
    // yield null max_bg/n_bg exactly as the former left join did.
    val isWord = !col("e").contains(" ")
    val stats = base
      .select(col("doc_id"),
        explode(concat(col("toks"),
          graft.functions.WordGramScan.wordGrams(col("toks"), 2))).as("e"))
      .groupBy(col("doc_id"), col("e")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(
        sum(when(isWord, col("c"))).as("n_words"),
        count(when(isWord, lit(1))).as("n_distinct"),
        sum(when(isWord,
          col("c").cast("double") * log(col("c").cast("double")))).as("clnc"),
        max(when(!isWord, col("c"))).as("max_bg"),
        sum(when(!isWord, col("c"))).as("n_bg"))
    val dupWordFrac =
      round(lit(1.0) - col("n_distinct").cast("double") / col("n_words"), 4)
    val top2Frac = round(
      coalesce(col("max_bg").cast("double") / col("n_bg"), lit(0.0)), 4)
    stats
      .select(col("doc_id"), col("n_words"),
        dupWordFrac.as("dup_word_frac"),
        top2Frac.as("top2gram_frac"),
        (round(log(col("n_words").cast("double")) -
          col("clnc") / col("n_words"), 4) + lit(0.0)).as("word_entropy"),
        (top2Frac >= maxTop2 || dupWordFrac >= maxDupWord).as("repetitive"))
  }

  /** `corpus_boilerplate`: per-document boilerplate coverage — the
    * fraction of a doc's tokens covered by any word n-gram that occurs
    * in at least `minDf` documents (headers, footers, cookie banners,
    * license blurbs: the spans C4/CCNet-style pipelines strip because
    * they repeat across the corpus rather than within a doc — the
    * CROSS-document counterpart of [[repetitionStats]]' within-doc
    * signals).
    *
    * Shape: positional n-grams are built array-side as a zip of
    * shifted slices (the [[repetitionStats]] discipline — no per-token
    * window sort, and crucially no per-element lambda over an index
    * sequence: a `transform(sequence(...), i -> struct(..))` variant
    * measured ~60 µs/element interpreted, 15 s at sf0.1, vs sub-second
    * for the slice zip); `posexplode` yields the window start for free.
    * Document frequency is a count over distinct (doc, gram), the same
    * inverted-index aggregation as the dedup family; frequent grams
    * join back to the positional windows (Catalyst picks broadcast when
    * the frequent set is small, shuffle join otherwise — not forced)
    * and covered token positions are de-duplicated per doc before
    * counting, so overlapping frequent spans never double-count.
    * Everything is doc-keyed or gram-keyed — linear at 100 TB.
    */
  def boilerplateCoverage(
      df: DataFrame, textCol: String, n: Int, minDf: Long): DataFrame = {
    require(n >= 1, "n must be positive")
    require(minDf >= 1, "minDf must be positive")
    val toks = col("_toks")
    val base = df.select(col("doc_id"), tokens(col(textCol)).as("_toks"))
      // native one-pass gram assembly (value-identical to the former
      // zip-of-shifted-slices: space-joined windows, empty below n —
      // see WordGramScanSpec); the zip_with chain paid n-1 interpreted
      // lambda passes over every window
      .withColumn("_grams", graft.functions.WordGramScan.wordGrams(toks, n))
    // three consumers read the positional windows (df count, join probe,
    // coverage) — persist once through the plan-keyed cache instead of
    // re-tokenizing the corpus per consumer
    val windows = gramCache.getOrBuild(df, s"boilerplate:$textCol", n) {
      base.select(col("doc_id"), posexplode(col("_grams")))
        .toDF("doc_id", "s", "sh")
    }
    val frequent = windows.select(col("doc_id"), col("sh")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("_df"))
      .filter(col("_df") >= minDf).select("sh")
    val covered = windows.join(frequent, "sh")
      .select(col("doc_id"),
        explode(sequence(col("s"), col("s") + lit(n - 1))).as("p"))
      .distinct()
      .groupBy(col("doc_id")).agg(count(lit(1)).as("covered_tokens"))
    base.select(col("doc_id"), size(col("_toks")).cast("long").as("n_tokens"))
      .join(covered, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("covered_tokens"), lit(0L)).as("covered_tokens"))
      .withColumn("covered_frac",
        round(col("covered_tokens").cast("double") /
          greatest(col("n_tokens"), lit(1L)), 6))
  }

  /** Plan-keyed cache for [[boilerplateCoverage]]'s positional window
    * index (same pattern as the dedup postings caches).
    */
  private val gramCache = new graft.util.KeyedCache

  /** Drop cached window indexes (see [[graft.dedup.Dedup.clearCaches]]). */
  def clearCaches(): Unit = gramCache.clear()

  /** BM25 relevance of every document against a (small) bag of query
    * terms — the retrieval primitive behind corpus search and RAG
    * harvesting. Okapi/Lucene form:
    * {{{
    *   score(d,q) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1−b+b·|d|/avgdl))
    *   idf(t)     = ln( (N − df(t) + 0.5) / (df(t) + 0.5) + 1 )
    * }}}
    * Distributed shape, 100 TB-safe: ONE pass tokenizes and keeps only
    * query-term hits (a partition-local `isin` filter — the posting
    * explosion never materializes non-query tokens); tf is a
    * (doc, term) groupBy over that filtered sliver; df/N/avgdl reduce
    * to |q|+2 scalars BROADCAST back (no second scan of the corpus, no
    * driver loop); the final per-doc score is one more groupBy over
    * O(matching docs × |q|) rows. Never all-pairs, never a cartesian.
    * Per-term contributions go through DECIMAL(18,6) so the sum is
    * exact and engine-independent (a rounded-double sum manufactures
    * half-way ties that Spark and DuckDB break differently).
    */
  def bm25Score(
      df: DataFrame, textCol: String, queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "bm25Score needs at least one query term")
    val toks = df.select(col("doc_id"),
      tokens(lower(col(textCol))).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).as("dl"),
        explode(col("_toks")).as("tok"))
      .filter(col("tok").isin(queryTerms: _*))
    val tf = toks.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    // corpus constants: N and avgdl over ALL docs (one narrow agg),
    // df per query term over the filtered sliver — |q|+1 tiny frames,
    // broadcast into the scoring join
    val corpus = df.select(size(tokens(lower(col(textCol)))).as("dl"))
      .agg(count(lit(1)).as("n_docs"), avg(col("dl")).as("avgdl"))
    val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val contrib = tf
      .join(broadcast(dfreq), "tok")
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("contrib",
        (col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
          .cast("decimal(18,6)"))
    contrib.groupBy(col("doc_id"))
      .agg(sum(col("contrib")).cast("double").as("bm25"),
        count(lit(1)).as("n_matched_terms"))
  }

  /** Top-k characteristic terms per document by tf-idf — the keyword /
    * topic-signal extractor: `tfidf(t,d) = (tf/|d|) · ln((N+1)/(df+1))`,
    * scores quantized through DECIMAL(18,6) and ranked
    * (score desc, term asc) so the top-k cut is bit-deterministic
    * cross-engine (a raw-double ordering would tie-break on ulps).
    * Distributed shape: tf = (doc, term) groupBy over the exploded
    * tokens; df = term groupBy over tf (document frequency needs the
    * FULL vocabulary, unlike BM25's query sliver — this is the one
    * extra shuffle); N broadcasts as a scalar; the rank window
    * partitions by doc_id, which distributes over however many
    * documents exist — never a single-task window.
    */
  def keywordsTfidf(df: DataFrame, textCol: String, k: Int = 3): DataFrame = {
    require(k > 0, "keywordsTfidf needs k > 0")
    import org.apache.spark.sql.expressions.Window
    val tf = df.select(col("doc_id"), tokens(lower(col(textCol))).as("_toks"))
      .select(col("doc_id"), size(col("_toks")).as("dl"),
        explode(col("_toks")).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nDocs = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfreq, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        ((col("tf").cast("double") / col("dl")) *
          log((col("n_docs") + lit(1.0)) / (col("df") + lit(1.0))))
          .cast("decimal(18,6)"))
    scored
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("term"),
        col("tfidf").cast("double").as("tfidf"),
        col("rank").cast("int").as("rank"))
  }

  /** Content-defined chunking (basic Rabin-style CDC): a chunk boundary
    * falls after every character position whose trailing k-gram hashes
    * to 0 (mod `divisor`) — a POSITION-LOCAL rule, so boundaries (and
    * therefore per-chunk hashes, the dedup payload) survive insertions
    * and deletions elsewhere in the document, where fixed windows
    * reshift everything downstream of an edit. Two documents sharing a
    * run of content share its chunks' md5s at ANY offset — the
    * shift-robust near-dup primitive fixed-window shingling is not.
    * Expected chunk length ≈ `divisor` chars. Position-locality is also
    * what makes it embarrassingly parallel: no sequential min/max-size
    * state (the one deviation from production CDC chunkers, which add
    * bounds at the cost of a sequential scan); one map-side pass,
    * higher-order expressions only. Docs shorter than k (or empty)
    * yield a single chunk (none when empty).
    */
  def cdcChunks(
      df: DataFrame, textCol: String, k: Int = 8, divisor: Int = 64): DataFrame =
    cdcChunksWith(df, textCol, k, divisor,
      md5Mode = true, keyName = "chunk_md5")

  /** [[cdcChunks]] with the ENGINE-DEFAULT hash: xxhash64 for both the
    * boundary rule and the chunk key (a codegen'd native long hash vs
    * md5's per-gram digest+hex+conv chain — the md5 variant exists only
    * because DuckDB can replicate it bit-exactly for the oracle; a
    * production pipeline has no reason to pay ~2-4× for it). Boundary
    * POSITIONS differ from the md5 variant (different hash, same
    * expected chunk length and the same shift-robustness class); the
    * CDC properties are spec-pinned instead of oracle-compared.
    */
  def cdcChunksFast(
      df: DataFrame, textCol: String, k: Int = 8, divisor: Int = 64): DataFrame =
    cdcChunksWith(df, textCol, k, divisor,
      md5Mode = false, keyName = "chunk_hash")

  /** Candidate boundary positions: i in [k, len) with
    * gramHash(trailing k-gram) % divisor == 0, ascending (a boundary at
    * exactly len would duplicate the end sentinel — dropped). ONE native
    * single-pass scan per document ([[graft.functions.TextHashScan]]) —
    * value-identical to the former
    * `filter(transform(sequence(k, len), i => when(hash(substr) % d ===
    * 0, i)), ...)` HOF shape (spec-pinned), which paid an interpreted
    * lambda + an O(position) substr byte re-scan + a UTF8String
    * allocation per char position (O(len²) per doc). A null document
    * yields the same empty candidate array the `when`-otherwise yielded.
    */
  private def cdcCandidates(
      textCol: String, k: Int, divisor: Int,
      md5Mode: Boolean): Column =
    coalesce(
      graft.functions.TextHashScan.cdcBoundaries(col(textCol), k, divisor, md5Mode),
      array().cast("array<int>"))

  /** Chunk rows from a per-doc boundary array `_b` (0 and len sentinels
    * included): consecutive boundary pairs become (chunk_id, start_char
    * 1-based, chunk_len, key) rows — shared by the unbounded and bounded
    * chunkers.
    */
  private def emitChunks(
      withBounds: DataFrame, md5HexMode: Boolean,
      keyName: String): DataFrame =
    // ONE native O(len) walk per document produces every chunk's
    // (start, len, content key) — the former per-chunk
    // `chunkKey(_t.substr(s + 1, l))` paid an O(start) byte re-scan per
    // chunk to relocate its char offset (Σ = O(len²/chunk-len) per doc;
    // a 100 kB document wasted ~39 M byte-scans), plus the interpreted
    // `transform` lambda that assembled the (s, l) pairs. Values are
    // bit-identical (spec-pinned in TextHashScanSpec, oracle-replayed
    // for the md5 twins).
    withBounds
      .select(col("doc_id"),
        posexplode(graft.functions.TextHashScan.chunkSlices(
          col("_t"), col("_b"), md5HexMode)))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_id"),
        (col("col.s") + 1).cast("int").as("start_char"),
        col("col.l").cast("int").as("chunk_len"),
        col("col.k").as(keyName))

  private def cdcChunksWith(
      df: DataFrame, textCol: String, k: Int, divisor: Int,
      md5Mode: Boolean,
      keyName: String): DataFrame = {
    require(k > 0 && divisor > 0, s"need k > 0 and divisor > 0, got $k/$divisor")
    val len = length(col(textCol))
    val bounds = cdcCandidates(textCol, k, divisor, md5Mode)
    val withBounds = df.select(col("doc_id"), col(textCol).as("_t"),
      concat(array(lit(0)), bounds, array(len)).as("_b"))
    emitChunks(withBounds, md5Mode, keyName)
  }

  /** [[cdcChunks]] with SIZE BOUNDS — the production-chunker rule the
    * unbounded variant documents as its one deviation: chunk lengths are
    * confined to [minLen, maxLen] (except a possibly-short FINAL chunk)
    * via the standard cut-at-max / suppress-below-min walk over the same
    * hash-rule candidate boundaries:
    *
    *  - from the last boundary p, candidates closer than `minLen` are
    *    SUPPRESSED (no pathological splinter chunks where the hash rule
    *    fires densely);
    *  - if no candidate lands within `maxLen`, a cut is FORCED at
    *    p + maxLen (no unbounded chunk where the rule never fires);
    *  - the final chunk ends at len and may be shorter than minLen.
    *
    * Boundaries are no longer strictly position-local — they depend on
    * the previous boundary — but RESYNCHRONIZE the standard CDC way:
    * after an edit, as soon as both versions accept the same candidate
    * (at most a few chunks downstream), all later boundaries coincide
    * again, so shift-robust dedup power is retained (spec-pinned).
    * Still embarrassingly parallel and one map-side pass: the walk is a
    * per-DOC `aggregate` fold over that doc's candidate array (state:
    * last boundary + emitted boundary list — bounded by the doc), never
    * a cross-row scan. Invariants (every non-final chunk in
    * [minLen, maxLen]; shorter-than-max non-final chunks end ON a hash
    * boundary; forced cuts are exactly maxLen) are pinned in
    * CdcInvariantSpec; the md5 twin is bit-compared against a DuckDB
    * replay of the same walk.
    */
  def cdcChunksBounded(
      df: DataFrame, textCol: String, k: Int = 8, divisor: Int = 64,
      minLen: Int = 32, maxLen: Int = 128): DataFrame =
    cdcChunksBoundedWith(df, textCol, k, divisor, minLen, maxLen,
      md5Mode = true, keyName = "chunk_md5")

  /** [[cdcChunksBounded]] with the ENGINE-DEFAULT hash (xxhash64 — see
    * [[cdcChunksFast]]); same size-bound walk, invariant-oracled.
    */
  def cdcChunksBoundedFast(
      df: DataFrame, textCol: String, k: Int = 8, divisor: Int = 64,
      minLen: Int = 32, maxLen: Int = 128): DataFrame =
    cdcChunksBoundedWith(df, textCol, k, divisor, minLen, maxLen,
      md5Mode = false, keyName = "chunk_hash")

  private def cdcChunksBoundedWith(
      df: DataFrame, textCol: String, k: Int, divisor: Int,
      minLen: Int, maxLen: Int,
      md5Mode: Boolean,
      keyName: String): DataFrame = {
    require(k > 0 && divisor > 0, s"need k > 0 and divisor > 0, got $k/$divisor")
    require(minLen > 0 && minLen <= maxLen,
      s"need 0 < minLen <= maxLen, got $minLen/$maxLen")
    val len = length(col(textCol))
    val cands = cdcCandidates(textCol, k, divisor, md5Mode)
    val emptyBs = array().cast("array<int>")
    // forced cuts between boundary p and the next stop s (candidate or
    // len): one at p + maxLen, p + 2·maxLen, ... while the gap exceeds
    // maxLen — f = floor((s - p - 1) / maxLen) cuts (0 when s - p <= maxLen)
    def forcedCount(p: Column, s: Column): Column =
      floor((s - p - lit(1)).cast("double") / lit(maxLen)).cast("int")
    def forcedCuts(p: Column, f: Column): Column =
      when(f > 0, transform(sequence(lit(1), f), j => p + j * lit(maxLen)))
        .otherwise(emptyBs)
    // the walk: fold ascending candidates carrying (last boundary p,
    // emitted boundaries bs); per candidate c — force cuts across any
    // over-max gap first, then accept c iff it clears minLen from the
    // (possibly advanced) last boundary
    val walked = aggregate(
      cands,
      struct(lit(0).as("p"), emptyBs.as("bs")),
      (acc, c) => {
        val p = acc.getField("p")
        val f = forcedCount(p, c)
        val np = p + f * lit(maxLen)
        val withForced = concat(acc.getField("bs"), forcedCuts(p, f))
        when(c - np >= minLen,
          struct(c.as("p"), concat(withForced, array(c)).as("bs")))
          .otherwise(struct(np.as("p"), withForced.as("bs")))
      },
      acc => {
        // tail: force cuts across the last gap, then the len sentinel
        // (the final chunk may undershoot minLen — standard CDC rule)
        val p = acc.getField("p")
        val f = forcedCount(p, len)
        concat(array(lit(0)), acc.getField("bs"), forcedCuts(p, f), array(len))
      })
    // empty docs chunk to nothing: a lone [0] sentinel emits no pairs
    val withBounds = df.select(col("doc_id"), col(textCol).as("_t"),
      when(len > 0, walked).otherwise(array(lit(0))).as("_b"))
    emitChunks(withBounds, md5Mode, keyName)
  }

  /** Per-doc CDC invariant audit over a chunk frame — the oracle shape
    * for the engine-default (xxhash64) chunker whose hash values DuckDB
    * cannot bit-replicate: instead of comparing hashes, verify the
    * properties that MAKE the frame a valid chunking of `docs`:
    *
    *  - `reassembled_md5`: the chunk texts, concatenated in chunk_id
    *    order, md5-hash to the source text — coverage, order, and
    *    non-overlap in one equality (any gap, overlap, or reorder
    *    changes the digest);
    *  - `covered_len` / `first_start` / `last_end`: the frame edges;
    *  - `keys_injective`: distinct chunk keys == distinct chunk texts
    *    per doc (a collapsed or duplicated key breaks dedup payloads);
    *  - `boundaries_valid`: every non-final chunk really ends where the
    *    engine hash of its trailing k-gram is ≡ 0 (mod divisor).
    *
    * CdcInvariantSpec pins SENSITIVITY: each planted corruption class
    * (dropped chunk, shifted boundary, reordered ids, gap+overlap that
    * cancel in the length sum) flips at least one output column. One
    * doc_id-keyed join + one per-doc aggregation; the per-group
    * collect_list is the doc's own text — never more state than one
    * document per task.
    */
  def cdcInvariants(
      chunks: DataFrame, docs: DataFrame, textCol: String,
      k: Int, divisor: Int, keyCol: String,
      // the boundary re-check must hash with the CHUNKER's gram hash:
      // default matches cdcChunksFast (xxhash64); pass hash60 to audit
      // an md5-variant frame
      gramHash: Column => Column = xxhash64(_)): DataFrame = {
    val j = chunks
      .join(docs.select(col("doc_id"), col(textCol).as("_t")), "doc_id")
      .select(col("doc_id"), col("chunk_id"), col("start_char"),
        col("chunk_len"), col(keyCol).as("_key"),
        col("_t").substr(col("start_char"), col("chunk_len")).as("_ct"),
        ((col("start_char") + col("chunk_len") - 1 === length(col("_t"))) ||
          (gramHash(col("_t").substr(
            col("start_char") + col("chunk_len") - k, lit(k))) % divisor === 0))
          .as("_bok"))
    j.groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(struct(col("chunk_id"), col("_ct")))).as("_cs"),
        sum(col("chunk_len")).as("_cov"),
        min(col("start_char")).as("first_start"),
        max(col("start_char") + col("chunk_len") - 1).as("_end"),
        countDistinct(col("_key")).as("_nk"),
        countDistinct(col("_ct")).as("_nt"),
        min(col("_bok")).as("boundaries_valid"))
      .select(col("doc_id"),
        md5(array_join(transform(col("_cs"), c => c.getField("_ct")), ""))
          .as("reassembled_md5"),
        col("_cov").cast("int").as("covered_len"),
        col("first_start"),
        col("_end").cast("int").as("last_end"),
        (col("_nk") === col("_nt")).as("keys_injective"),
        col("boundaries_valid"))
  }

  /** [[cdcInvariants]] for a BOUNDED chunk frame
    * ([[cdcChunksBoundedFast]]): same reassembly/coverage/injectivity
    * audit, with the boundary rule adjusted for the size-bound walk —
    * every NON-FINAL chunk must (a) have length in [minLen, maxLen] and
    * (b) end on an engine hash boundary OR be a forced cut of exactly
    * maxLen; the final chunk must not exceed maxLen (it may undershoot
    * minLen). `boundaries_valid` carries (b), `sizes_valid` carries the
    * length windows — a chunker that stopped suppressing short
    * candidates or capping long gaps flips one of them (sensitivity
    * planted in CdcInvariantSpec).
    */
  def cdcInvariantsBounded(
      chunks: DataFrame, docs: DataFrame, textCol: String,
      k: Int, divisor: Int, minLen: Int, maxLen: Int,
      keyCol: String,
      // the boundary re-check must hash with the CHUNKER's gram hash:
      // default matches cdcChunksBoundedFast (xxhash64); pass hash60 to
      // audit an md5-variant frame (cdcChunksBounded)
      gramHash: Column => Column = xxhash64(_)): DataFrame = {
    val j = chunks
      .join(docs.select(col("doc_id"), col(textCol).as("_t")), "doc_id")
      .select(col("doc_id"), col("chunk_id"), col("start_char"),
        col("chunk_len"), col(keyCol).as("_key"),
        col("_t").substr(col("start_char"), col("chunk_len")).as("_ct"),
        (col("start_char") + col("chunk_len") - 1 === length(col("_t"))).as("_fin"),
        (gramHash(col("_t").substr(
          col("start_char") + col("chunk_len") - k, lit(k))) % divisor === 0)
          .as("_hok"))
      .select(col("doc_id"), col("chunk_id"), col("_key"), col("_ct"),
        col("chunk_len"), col("start_char"),
        (col("_fin") || col("_hok") || col("chunk_len") === maxLen).as("_bok"),
        (when(col("_fin"), col("chunk_len") <= maxLen)
          .otherwise(col("chunk_len").between(minLen, maxLen))).as("_sok"))
    j.groupBy(col("doc_id"))
      .agg(
        sort_array(collect_list(struct(col("chunk_id"), col("_ct")))).as("_cs"),
        sum(col("chunk_len")).as("_cov"),
        min(col("start_char")).as("first_start"),
        max(col("start_char") + col("chunk_len") - 1).as("_end"),
        countDistinct(col("_key")).as("_nk"),
        countDistinct(col("_ct")).as("_nt"),
        min(col("_bok")).as("boundaries_valid"),
        min(col("_sok")).as("sizes_valid"))
      .select(col("doc_id"),
        md5(array_join(transform(col("_cs"), c => c.getField("_ct")), ""))
          .as("reassembled_md5"),
        col("_cov").cast("int").as("covered_len"),
        col("first_start"),
        col("_end").cast("int").as("last_end"),
        (col("_nk") === col("_nt")).as("keys_injective"),
        col("boundaries_valid"),
        col("sizes_valid"))
  }

  /** Overlapping token-window chunks — the RAG / context-length
    * preprocessing step: each document's whitespace tokens split into
    * windows of `window` tokens starting every `window − overlap`
    * tokens (the final window may be shorter; a doc shorter than one
    * window yields exactly one chunk). Pure map-side explode over a
    * `sequence()` of starts — linear in corpus size, no shuffle, no
    * state; chunk ids are deterministic (doc_id, start offset).
    */
  def chunkWindows(
      df: DataFrame, textCol: String, window: Int, overlap: Int): DataFrame = {
    require(window > 0 && overlap >= 0 && overlap < window,
      s"need 0 <= overlap < window, got window=$window overlap=$overlap")
    val stride = window - overlap
    df.select(col("doc_id"), tokens(col(textCol)).as("_toks"))
      .select(col("doc_id"), col("_toks"),
        posexplode(sequence(lit(0),
          greatest(size(col("_toks")) - 1, lit(0)), lit(stride))))
      .select(col("doc_id"), col("col").as("start_tok"),
        col("pos").cast("int").as("chunk_id"),
        slice(col("_toks"), col("col") + 1, lit(window)).as("_chunk"))
      .select(col("doc_id"), col("chunk_id"), col("start_tok"),
        size(col("_chunk")).as("n_tokens"),
        array_join(col("_chunk"), " ").as("chunk_text"))
  }

  def fingerprint(df: DataFrame, textCol: String, k: Int = 8): DataFrame =
    // ONE map-side pass: the min-shingle rolling hash is a native
    // single-scan expression (TextHashScan), so the former
    // explode(sequence) + groupBy(min) + join — len rows per doc through
    // an aggregate plus a doc_id shuffle join — reduces to a projection
    // with NO exchange at all. Values are bit-identical (spec-pinned;
    // the DuckDB oracle is unchanged).
    df.select(col("doc_id"), md5(col(textCol)).as("content_md5"),
      graft.functions.TextHashScan.minShingleHash(col(textCol), k, md5Mode = true)
        .as("min_shingle_hash"))

  /** [[fingerprint]] with the ENGINE-DEFAULT hash (xxhash64 content key
    * + min-xxhash64 shingle, no digest/hex/conv chain) — same rolling-
    * fingerprint structure and dedup power, ~2-4× cheaper per position;
    * the md5 variant exists for bit-exact DuckDB oracle parity only.
    * Shingle hashing stays map-side; the only shuffle is the per-doc
    * min aggregate, identical to the md5 variant's plan.
    */
  def fingerprintFast(df: DataFrame, textCol: String, k: Int = 8): DataFrame =
    // same one-pass map-side shape as [[fingerprint]] (see there). The
    // coalesce preserves the former shape's null-text value: Spark's
    // hash functions return the SEED (42) for null input, so the old
    // min-over-xxhash64 produced 42 for a null document, never null.
    df.select(col("doc_id"), xxhash64(col(textCol)).as("content_hash"),
      coalesce(
        graft.functions.TextHashScan.minShingleHash(col(textCol), k, md5Mode = false),
        lit(42L)).as("min_shingle_hash"))

  /** `text_gopher_rules`: the Gopher/MassiveText repetition-and-shape
    * rule suite (Rae et al. 2021, §A.1.1) — the canonical cheap
    * DOCUMENT-level filter a web-scale training pipeline applies before
    * any model-based scoring: word-count window, mean word length,
    * bullet/ellipsis line ratios, symbol-to-word ratio, alphabetic-word
    * ratio, plus the conjunctive keep flag. One map-side pass over the
    * text column (per-doc HOFs, no shuffle, no UDF); every ratio is
    * rounded to 6 dp so the flags are bit-stable cross-engine.
    */
  def gopherRules(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nWords = size(toks) // trim+split never yields 0 elements
    val lines = split(t, "\n")
    val nLines = size(lines)
    def r6(c: Column) = round(c.cast("double"), 6)
    def occurrences(pattern: String, width: Int) =
      (length(t) - length(regexp_replace(t, pattern, ""))) / width
    val meanWordLen = r6(
      aggregate(transform(toks, w => length(w)), lit(0), (a, x) => a + x)
        .cast("double") / nWords)
    val pctAlpha = r6(
      size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("double") / nWords)
    val pctBullet = r6(
      size(filter(lines, l => l.rlike("^\\s*[-*•]"))).cast("double") / nLines)
    val pctEllipsis = r6(
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)\\s*$"))).cast("double") / nLines)
    val symbolRatio = r6(
      (occurrences("#", 1) + occurrences("\\.\\.\\.", 3) + occurrences("…", 1))
        .cast("double") / nWords)
    df.select(
      col("doc_id"),
      nWords.as("n_words"),
      meanWordLen.as("mean_word_len"),
      pctAlpha.as("pct_alpha_words"),
      pctBullet.as("pct_bullet_lines"),
      pctEllipsis.as("pct_ellipsis_lines"),
      symbolRatio.as("symbol_ratio"))
      .withColumn("keep",
        col("n_words").between(50, 100000) &&
          col("mean_word_len").between(3.0, 10.0) &&
          col("pct_bullet_lines") <= 0.9 &&
          col("pct_ellipsis_lines") <= 0.3 &&
          col("symbol_ratio") < 0.1 &&
          col("pct_alpha_words") >= 0.8)
  }
}
