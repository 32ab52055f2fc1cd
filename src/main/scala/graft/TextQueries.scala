package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (north-star
  * LLM-pipeline surface): token counting, quality scoring, language ID,
  * document fingerprinting. Every query is a narrow no-shuffle projection;
  * oracles mirror the exact arithmetic in DuckDB (shared md5-based
  * hashing, rounded ratios).
  */
object TextQueries {

  import Queries.tbl

  /** DuckDB fragment: lowercase whitespace tokens. */
  private val ToksSql = "regexp_split_to_array(trim(lower(text)), '\\s+')"

  /** DuckDB CTE chain ending in `sc(doc_id, n_tokens, logw)`: the DSIR
    * hashed-unigram log importance weights, mirroring
    * [[graft.text.TrainingMix.dsirWeights]] (shared by the weights query
    * and the Gumbel-top-k resampler).
    */
  private val DsirScoreSql: String =
    """t AS (
      |  SELECT doc_id, lang = 'en' AS is_target,
      |    unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
      |  FROM documents),
      |tb AS (SELECT doc_id, is_target,
      |  CAST(CONCAT('0x', substr(md5(tok), 1, 6)) AS INT) % 4096 AS b FROM t),
      |db AS (SELECT doc_id, b, count(*) AS c FROM tb GROUP BY 1, 2),
      |tgt AS (SELECT b, count(*) AS ct FROM tb WHERE is_target GROUP BY 1),
      |raw AS (SELECT b, count(*) AS cr FROM tb GROUP BY 1),
      |tot AS (SELECT CAST(count(*) AS BIGINT) AS nr,
      |  CAST(count(*) FILTER (WHERE is_target) AS BIGINT) AS nt FROM tb),
      |lam AS (
      |  SELECT raw.b,
      |    ln((coalesce(tgt.ct, 0) + 1) / CAST(tot.nt + 4096 AS DOUBLE))
      |    - ln((raw.cr + 1) / CAST(tot.nr + 4096 AS DOUBLE)) AS lam
      |  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tot),
      |sc AS (
      |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |    round(sum(c * lam), 4) AS logw
      |  FROM db JOIN lam USING (b) GROUP BY 1)""".stripMargin

  /** DuckDB CTE chain ending in `qscore(doc_id, quality_score)` — the
    * ONE copy of the composite quality gate's SQL, consumed by the
    * `text_quality_score` oracle itself and by every op that ranks or
    * canonicalizes on quality (cluster canonicalization). `qsrc` also
    * exposes the raw features (toks/words/n_chars/punct) so feature
    * projections build on the same expressions. Names are prefixed so
    * the chain composes into oracles that already bind `t`.
    */
  private[graft] lazy val QualityScoreCte: String =
    s"""qsrc AS (SELECT doc_id,
       |    regexp_split_to_array(trim(text), '\\s+') AS toks,
       |    regexp_extract_all(text, '[A-Za-z0-9]+') AS words,
       |    length(text) AS n_chars,
       |    length(text) - length(regexp_replace(text, '[!"#$$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g')) AS punct
       |  FROM documents),
       |qscore AS (SELECT doc_id, round(CAST(
       |    (CASE WHEN len(toks) BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END) +
       |    (CASE WHEN round(CAST(len(list_filter(toks, x -> list_contains(${markerSql(TextAnalysis.StopwordsEn)}, x))) AS DOUBLE) / len(toks), 6) > 0.05 THEN 0.3 ELSE 0.0 END) +
       |    (CASE WHEN round(CAST(punct AS DOUBLE) / n_chars, 6) < 0.2 THEN 0.3 ELSE 0.0 END) AS DOUBLE), 6) AS quality_score
       |  FROM qsrc)""".stripMargin

  private def markerSql(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("[", ", ", "]")

  /** BPE train/encode fixtures share the learned model: the train
    * corpus is the doc_id % 3 == 0 slice, K = 8 merges, and the model
    * memoizes per (sfDir) so the encode key never re-trains.
    */
  private val BpeK = 8

  private def bpeMerges(s: org.apache.spark.sql.SparkSession, dir: String): Seq[graft.text.Bpe.Merge] =
    MetaQueries.memoFixture("text_bpe_merges", dir) {
      val wc = tbl(s, dir, "documents")
        .filter(col("doc_id") % 3 === 0)
        .select(explode(graft.text.Bpe.words(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      val m = graft.text.Bpe.train(wc, BpeK)
      // the unrolled oracle states exactly K merges; a thinner corpus
      // would silently desynchronize the two — fail loudly instead
      require(m.size == BpeK,
        s"BPE fixture corpus yielded only ${m.size}/$BpeK merges")
      m
    }

  /** Batched-BPE fixture: same training slice, `BpeBatchRounds` rounds
    * of up to `BpeBatchM` non-interacting merges greedily accepted from
    * a `BpeBatchPool`-candidate pool — the production-vocab-scale
    * relaxation (at K = 32000 the exact one-merge-per-round trainer is
    * driver-round-trip bound; batching cuts rounds by ~M).
    */
  private val BpeBatchRounds = 3
  private val BpeBatchM = 4
  private val BpeBatchPool = 16

  private def bpeBatchedMerges(
      s: org.apache.spark.sql.SparkSession, dir: String): Seq[graft.text.Bpe.BatchedMerge] =
    MetaQueries.memoFixture("text_bpe_batched_merges", dir) {
      val wc = tbl(s, dir, "documents")
        .filter(col("doc_id") % 3 === 0)
        .select(explode(graft.text.Bpe.words(col("text"))).as("word"))
        .groupBy("word").agg(count(lit(1)).as("cnt"))
      val m = graft.text.Bpe.trainBatched(
        wc, BpeBatchRounds, BpeBatchM, BpeBatchPool)
      require(m.nonEmpty, "batched BPE fixture corpus yielded no merges")
      m
    }

  /** The unrolled DuckDB replica of Bpe.trainBatched: per round, the
    * pair-count CTE, a ranked candidate pool, a RECURSIVE greedy
    * selection walking the pool in rank order carrying the used-token
    * list (accept iff left, right, and left+right are all unseen —
    * exactly the trainer's non-interaction rule), and a list_reduce
    * applying the whole accepted batch in one pass.
    */
  private def bpeBatchedCtes: String = {
    val head =
      """words AS MATERIALIZED (
        |  SELECT w AS word, count(*) AS cnt FROM (
        |    SELECT unnest(string_split_regex(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' +')) AS w
        |    FROM documents WHERE doc_id % 3 = 0) WHERE w <> '' GROUP BY 1),
        |w0 AS MATERIALIZED (SELECT cnt, regexp_replace(word, '(.)', '<\1>', 'g') AS ts FROM words)""".stripMargin
    val accept = s"""len(s.acc) < $BpeBatchM AND NOT list_contains(s.used, c.l)
         |              AND NOT list_contains(s.used, c.r)
         |              AND NOT list_contains(s.used, c.l || c.r)""".stripMargin
    val rounds = (1 to BpeBatchRounds).map { n =>
      val m = n - 1
      s"""p$n AS MATERIALIZED (
         |  SELECT t[i] AS l, t[i+1] AS r, sum(cnt) AS c
         |  FROM (SELECT cnt, string_split(ts[2:len(ts)-1], '><') AS t FROM w$m) s,
         |       UNNEST(range(1, len(s.t))) AS u(i)
         |  GROUP BY 1, 2),
         |c$n AS MATERIALIZED (
         |  SELECT l, r, c, row_number() OVER (ORDER BY c DESC, l, r) AS rk
         |  FROM (SELECT * FROM p$n ORDER BY c DESC, l, r LIMIT $BpeBatchPool)),
         |s$n(rk, acc, used) AS (
         |  SELECT 0, CAST([] AS VARCHAR[]), CAST([] AS VARCHAR[])
         |  UNION ALL
         |  SELECT c.rk,
         |    CASE WHEN $accept
         |         THEN list_append(s.acc, c.l || '|' || c.r) ELSE s.acc END,
         |    CASE WHEN $accept
         |         THEN list_concat(s.used, [c.l, c.r, c.l || c.r]) ELSE s.used END
         |  FROM s$n s JOIN c$n c ON c.rk = s.rk + 1),
         |sel$n AS MATERIALIZED (SELECT acc FROM s$n ORDER BY rk DESC LIMIT 1),
         |w$n AS MATERIALIZED (
         |  SELECT cnt, list_reduce(list_concat([ts], acc), (a, x) ->
         |    replace(a, '<' || split_part(x, '|', 1) || '><' || split_part(x, '|', 2) || '>',
         |               '<' || split_part(x, '|', 1) || split_part(x, '|', 2) || '>')) AS ts
         |  FROM w$m, sel$n)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  /** The train-replay + apply-chain CTE prefix over the %3==1 encode
    * slice, ending in `ap(doc_id, ts)` — shared by the encode,
    * persisted-vocab (which must be bit-identical to encode by
    * contract), and BPE-packing oracles.
    */
  private def bpeApplyCtes: String =
    s"""$bpeTrainCtes,
       |m AS MATERIALIZED (SELECT ${(1 to BpeK).map(n =>
          s"b$n.l AS l$n, b$n.r AS r$n").mkString(", ")}
       |  FROM ${(1 to BpeK).map(n => s"b$n").mkString(", ")}),
       |ew AS (SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(string_split_regex(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' +')) AS w
       |    FROM documents WHERE doc_id % 3 = 1) WHERE w <> ''),
       |ap AS (SELECT doc_id, ${(1 to BpeK).foldLeft(
          "regexp_replace(w, '(.)', '<\\1>', 'g')") { (acc, n) =>
          s"replace($acc, '<' || l$n || '><' || r$n || '>', '<' || l$n || r$n || '>')"
        }} AS ts
       |  FROM ew, m)""".stripMargin

  private def bpeEncodeOracle: String =
    s"""WITH $bpeApplyCtes
       |SELECT doc_id, CAST(count(*) AS INT) AS n_words,
       |  CAST(sum(len(string_split(ts[2:len(ts)-1], '><'))) AS INT) AS n_tokens
       |FROM ap GROUP BY 1""".stripMargin

  /** The unrolled DuckDB replica of Bpe.train: K chained
    * (pair-count → argmax → replace) rounds over the same word-count
    * table, every CTE MATERIALIZED (the chain re-references each round
    * several times; inlining would re-evaluate it exponentially).
    */
  private def bpeTrainCtes: String = {
    val head =
      """words AS MATERIALIZED (
        |  SELECT w AS word, count(*) AS cnt FROM (
        |    SELECT unnest(string_split_regex(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' +')) AS w
        |    FROM documents WHERE doc_id % 3 = 0) WHERE w <> '' GROUP BY 1),
        |w0 AS MATERIALIZED (SELECT cnt, regexp_replace(word, '(.)', '<\1>', 'g') AS ts FROM words)""".stripMargin
    val rounds = (1 to BpeK).map { n =>
      val m = n - 1
      s"""p$n AS MATERIALIZED (
         |  SELECT t[i] AS l, t[i+1] AS r, sum(cnt) AS c
         |  FROM (SELECT cnt, string_split(ts[2:len(ts)-1], '><') AS t FROM w$m) s,
         |       UNNEST(range(1, len(s.t))) AS u(i)
         |  GROUP BY 1, 2),
         |b$n AS MATERIALIZED (SELECT l, r, c FROM p$n ORDER BY c DESC, l, r LIMIT 1),
         |w$n AS MATERIALIZED (
         |  SELECT cnt, replace(ts, '<' || b.l || '><' || b.r || '>',
         |                          '<' || b.l || b.r || '>') AS ts
         |  FROM w$m, b$n b)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  def defs: Map[String, QueryDef] = Map(

    "text_bpe_train" -> QueryDef(
      (s, dir) => {
        // distributed BPE tokenizer TRAINING (Sennrich et al. 2016):
        // state is the word-count table (vocab-sized, never the
        // corpus); each of the 8 rounds is one vocab-sized pair-count
        // aggregation + a single-row argmax collect + a map-side
        // replace — the word-count-keyed sharding real distributed BPE
        // trainers use. The result IS the model: the rank-ordered merge
        // table, which the oracle re-derives round by round.
        import s.implicits._
        bpeMerges(s, dir)
          .map(m => (m.rank, m.left, m.right, m.pairCount))
          .toDF("rank", "merge_left", "merge_right", "pair_count")
      },
      Some(s"""WITH $bpeTrainCtes
              |SELECT * FROM (
              |${(1 to BpeK).map(n =>
                 s"  SELECT $n AS rank, l AS merge_left, r AS merge_right, CAST(c AS BIGINT) AS pair_count FROM b$n")
                 .mkString(" UNION ALL\n")})""".stripMargin),
      doc = "BPE tokenizer training (Sennrich et al. 2016) as a distributed " +
        "word-count-keyed loop: corpus pass once, then K vocab-sized " +
        "pair-count rounds with deterministic tie-breaks; the merge table " +
        "is the model and the oracle replays every round"),

    "text_bpe_encode" -> QueryDef(
      (s, dir) => {
        // the broadcast-merges ENCODER: the 8 learned merges compile
        // into a chain of codegen'd string replaces applied per word —
        // pure map-side (higher-order aggregate, no explode, no
        // shuffle), linear in the corpus. Encodes the doc_id % 3 == 1
        // slice, DISJOINT from the training slice, so unseen words
        // exercise real subword segmentation.
        val docs = tbl(s, dir, "documents").filter(col("doc_id") % 3 === 1)
        graft.text.Bpe.encodeCounts(docs, "text", "doc_id", bpeMerges(s, dir))
      },
      Some(bpeEncodeOracle),
      doc = "BPE encode with broadcast merges: rank-ordered replace chain per " +
        "word, map-side only (no shuffle); per-doc word + token counts over a " +
        "slice disjoint from training, oracle replays train + apply"),

    "text_bpe_encode_scaled" -> QueryDef(
      (s, dir) => {
        // the VOCAB-SCALE encoder: identical output contract to
        // text_bpe_encode (same slice, same trained model, same
        // counts), but the model rides as ONE reference object inside
        // a native codegen expression doing min-rank-first merging per
        // word — plan size independent of K. At the fixture's K = 8 it
        // must reproduce the replace-chain encoder bit for bit (same
        // oracle); BpeScaledSpec additionally exercises it at K ≥ 256,
        // where the chain encoder's expression tree stops being viable.
        val docs = tbl(s, dir, "documents").filter(col("doc_id") % 3 === 1)
        graft.text.Bpe.encodeCountsScaled(docs, "text", "doc_id", bpeMerges(s, dir))
      },
      Some(bpeEncodeOracle),
      doc = "BPE encode at production vocab scale: broadcast merge-rank table " +
        "+ min-rank-first per-word merging in one native codegen expression " +
        "(plan cost independent of K, unlike the K-deep replace chain); " +
        "bit-identical to text_bpe_encode on the trained model, oracle " +
        "replays train + apply"),

    "text_bpe_vocab_persisted" -> QueryDef(
      (s, dir) => {
        // the production tokenizer-serving shape (mirrors
        // similarity_pq_persisted): the trained merge table PERSISTS
        // once as a snapshot table — the vocab artifact every pipeline
        // stage shares — and the encode path LOADS it from storage
        // (rank-ordered read, bounded K-row collect), never retrains.
        // Encoding the same slice as text_bpe_encode pins the contract:
        // a loaded vocab must reproduce the in-memory model bit for bit
        // (strings and longs parquet-round-trip exactly).
        import s.implicits._
        val wh = MetaQueries.warmBaseDir("text_bpe_vocab", dir) { b =>
          val df = bpeMerges(s, dir)
            .map(m => (m.rank, m.left, m.right, m.pairCount))
            .toDF("rank", "merge_left", "merge_right", "pair_count")
          graft.sink.SnapshotTable(b, "testdata", "bpe_vocab").overwrite(df): Unit
        }
        val loaded = graft.sink.SnapshotTable(wh, "testdata", "bpe_vocab")
          .read(s).orderBy("rank").collect() // bounded: the K-row vocab
          .map(r => graft.text.Bpe.Merge(
            r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
          .toSeq
        val docs = tbl(s, dir, "documents").filter(col("doc_id") % 3 === 1)
        graft.text.Bpe.encodeCounts(docs, "text", "doc_id", loaded)
      },
      Some(bpeEncodeOracle),
      doc = "BPE vocab persisted as a snapshot table and served from storage: " +
        "the encode path loads the rank-ordered merge artifact (never " +
        "retrains) and must reproduce the in-memory model's encoding exactly"),

    "text_bpe_fertility" -> QueryDef(
      (s, dir) => {
        // tokenizer FERTILITY audit: per-language tokens-per-word and
        // chars-per-token under the learned merges — the metric that
        // decides whether a tokenizer is fit for a language mix (high
        // fertility = the language pays more sequence length per word,
        // skewing effective epoch budgets). Exact integer sums per
        // language, two divisions at the end; everything before the
        // one language-keyed aggregation is map-side.
        val docs = tbl(s, dir, "documents").filter(col("doc_id") % 3 === 1)
        val enc = graft.text.Bpe.encodeCounts(
          docs, "text", "doc_id", bpeMerges(s, dir))
        val chars = docs.select(col("doc_id"),
          aggregate(graft.text.Bpe.words(col("text")), lit(0L),
            (a, w) => a + length(w)).as("n_chars"))
        enc.join(chars, "doc_id")
          .join(docs.select(col("doc_id"),
            coalesce(col("lang"), lit("<none>")).as("lang")), "doc_id")
          .groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_words"),
            sum("n_tokens").as("n_tokens"), sum("n_chars").as("n_chars"))
          .select(col("lang"), col("n_docs"), col("n_words"),
            col("n_tokens"), col("n_chars"),
            (round(col("n_tokens") / col("n_words").cast("double"), 6) + lit(0.0))
              .as("fertility"),
            (round(col("n_chars") / col("n_tokens").cast("double"), 6) + lit(0.0))
              .as("chars_per_token"))
      },
      Some(s"""WITH $bpeTrainCtes,
              |m AS MATERIALIZED (SELECT ${(1 to BpeK).map(n =>
                 s"b$n.l AS l$n, b$n.r AS r$n").mkString(", ")}
              |  FROM ${(1 to BpeK).map(n => s"b$n").mkString(", ")}),
              |ew AS (SELECT doc_id, w FROM (
              |    SELECT doc_id, unnest(string_split_regex(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' +')) AS w
              |    FROM documents WHERE doc_id % 3 = 1) WHERE w <> ''),
              |ap AS (SELECT doc_id, w, ${(1 to BpeK).foldLeft(
                 "regexp_replace(w, '(.)', '<\\1>', 'g')") { (acc, n) =>
                 s"replace($acc, '<' || l$n || '><' || r$n || '>', '<' || l$n || r$n || '>')"
               }} AS ts
              |  FROM ew, m),
              |per AS (SELECT doc_id, count(*) AS n_words,
              |    sum(len(string_split(ts[2:len(ts)-1], '><'))) AS n_tokens,
              |    sum(len(w)) AS n_chars
              |  FROM ap GROUP BY 1)
              |SELECT coalesce(d.lang, '<none>') AS lang,
              |  count(*) AS n_docs,
              |  CAST(sum(per.n_words) AS BIGINT) AS n_words,
              |  CAST(sum(per.n_tokens) AS BIGINT) AS n_tokens,
              |  CAST(sum(per.n_chars) AS BIGINT) AS n_chars,
              |  (round(CAST(sum(per.n_tokens) AS BIGINT) / CAST(sum(per.n_words) AS DOUBLE), 6) + 0.0) AS fertility,
              |  (round(CAST(sum(per.n_chars) AS BIGINT) / CAST(sum(per.n_tokens) AS DOUBLE), 6) + 0.0) AS chars_per_token
              |FROM per JOIN documents d USING (doc_id)
              |GROUP BY 1""".stripMargin),
      doc = "per-language tokenizer fertility audit under the trained BPE: " +
        "tokens-per-word and chars-per-token from exact per-language sums " +
        "— the language-mix fitness signal for packing and epoch budgets"),

    "text_pack_bpe" -> QueryDef(
      (s, dir) => {
        // packing budgets are TOKENIZER-token budgets in production —
        // whitespace counts misprice dense scripts, code, and URL-heavy
        // text. Count each doc under the TRAINED merges (the map-side
        // encode), then the same sharded concat-and-chunk rule as
        // text_pack_sequences (a global cumsum would serialize the
        // corpus through one partition; bin ids depend on the pinned
        // shard count 16, and the oracle packs with 16).
        val docs = tbl(s, dir, "documents").filter(col("doc_id") % 3 === 1)
        val enc = graft.text.Bpe.encodeCounts(
          docs, "text", "doc_id", bpeMerges(s, dir))
        graft.text.TrainingMix.packCounts(
          enc.select(col("doc_id"), col("n_tokens")), budget = 512, shards = 16)
      },
      Some(s"""WITH $bpeApplyCtes,
              |per AS (SELECT doc_id,
              |    CAST(sum(len(string_split(ts[2:len(ts)-1], '><'))) AS INT) AS n_tokens
              |  FROM ap GROUP BY 1),
              |d AS (SELECT doc_id, n_tokens,
              |    CAST(CONCAT('0x', substr(md5('shard:' || doc_id), 1, 15)) AS BIGINT) % 16 AS shard
              |  FROM per)
              |SELECT doc_id, n_tokens, shard,
              |  CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens)
              |    // 512 AS BIGINT) AS bin
              |FROM d""".stripMargin),
      doc = "sequence packing under the TRAINED tokenizer: per-doc BPE token " +
        "counts (map-side encode) feed the sharded concat-and-chunk binning " +
        "— budgets priced in the tokens the model will actually see"),

    "text_bpe_train_batched" -> QueryDef(
      (s, dir) => {
        // BATCHED BPE training — the production-vocab-scale shape: each
        // round accepts up to M non-interacting merges from a bounded
        // candidate pool and applies them in ONE map-side pass, so K
        // merges cost ~K/M driver round-trips instead of K (the exact
        // trainer is round-trip bound at K = 32000). Non-interaction
        // (left, right, and produced token unseen among earlier
        // accepts) makes the simultaneous application order-free; the
        // recorded counts are the pre-round pair counts — the standard
        // documented relaxation. The oracle replays the pool ranking,
        // the greedy scan (recursive CTE carrying the used-token
        // list), and the batch application round by round.
        import s.implicits._
        bpeBatchedMerges(s, dir)
          .map(m => (m.round, m.idx, m.left, m.right, m.pairCount))
          .toDF("round", "idx", "merge_left", "merge_right", "pair_count")
      },
      Some(s"""WITH RECURSIVE $bpeBatchedCtes
              |SELECT * FROM (
              |${(1 to BpeBatchRounds).map(n =>
                 s"""  SELECT $n AS round, CAST(u.i AS INT) AS idx,
                    |    split_part(acc[u.i], '|', 1) AS merge_left,
                    |    split_part(acc[u.i], '|', 2) AS merge_right,
                    |    (SELECT CAST(c AS BIGINT) FROM c$n
                    |      WHERE l = split_part(acc[u.i], '|', 1)
                    |        AND r = split_part(acc[u.i], '|', 2)) AS pair_count
                    |  FROM sel$n, unnest(range(1, len(acc) + 1)) AS u(i)""".stripMargin)
                 .mkString(" UNION ALL\n")})""".stripMargin),
      doc = "batched BPE training (top-M non-interacting merges per round — " +
        "the distributed-BPE relaxation for production vocab sizes): bounded " +
        "candidate-pool collect, greedy token-disjoint acceptance, one " +
        "map-side application per round; oracle replays pool, greedy scan, " +
        "and batch application exactly"),

    "text_bpe_encode_batched" -> QueryDef(
      (s, dir) => {
        // the encoder under the BATCHED model, over the third corpus
        // slice (disjoint from both the training slice %3==0 and the
        // exact-model encode slice %3==1): merges compile into the
        // same rank-ordered codegen replace chain — map-side only.
        val docs = tbl(s, dir, "documents").filter(col("doc_id") % 3 === 2)
        val merges = bpeBatchedMerges(s, dir).zipWithIndex.map { case (b, i) =>
          graft.text.Bpe.Merge(i + 1, b.left, b.right, b.pairCount)
        }
        graft.text.Bpe.encodeCounts(docs, "text", "doc_id", merges)
      },
      Some(s"""WITH RECURSIVE $bpeBatchedCtes,
              |allm AS (SELECT ${(1 to BpeBatchRounds).map(n => s"sel$n.acc")
                 .reduceLeft((a, b) => s"list_concat($a, $b)")} AS acc
              |  FROM ${(1 to BpeBatchRounds).map(n => s"sel$n").mkString(", ")}),
              |ew AS (SELECT doc_id, w FROM (
              |    SELECT doc_id, unnest(string_split_regex(regexp_replace(lower(text), '[^a-z ]', ' ', 'g'), ' +')) AS w
              |    FROM documents WHERE doc_id % 3 = 2) WHERE w <> ''),
              |ap AS (SELECT doc_id,
              |    list_reduce(list_concat([regexp_replace(w, '(.)', '<\\1>', 'g')], acc), (a, x) ->
              |      replace(a, '<' || split_part(x, '|', 1) || '><' || split_part(x, '|', 2) || '>',
              |                 '<' || split_part(x, '|', 1) || split_part(x, '|', 2) || '>')) AS ts
              |  FROM ew, allm)
              |SELECT doc_id, CAST(count(*) AS INT) AS n_words,
              |  CAST(sum(len(string_split(ts[2:len(ts)-1], '><'))) AS INT) AS n_tokens
              |FROM ap GROUP BY 1""".stripMargin),
      doc = "BPE encode under the batched-trained model over a slice disjoint " +
        "from both training and the exact-model encode: same broadcast " +
        "replace-chain encoder, map-side only; oracle replays batched train " +
        "+ apply"),

    "text_normalize_unicode" -> QueryDef(
      (s, dir) => {
        // Unicode NFC canonicalization (the first multi-source cleaning
        // step: composed vs decomposed graphemes break dedup hashes and
        // tokenizer merges). The fixture PREPENDS a decomposed sequence
        // ("A" + combining ring U+030A -> "Å" under NFC) to every doc so
        // the oracle exercises real recomposition, not the ASCII
        // identity path; outputs pin the char-count contraction (2
        // code points -> 1) and a stable content hash of the normalized
        // text. Map-side codegen'd expression, no shuffle.
        val docs = tbl(s, dir, "documents")
        // decomposed on purpose: "A" + combining ring (U+030A), written
        // as an escape so no editor silently recomposes the fixture
        val raw = concat(lit("A\u030A "), col("text"))
        val nfc = graft.functions.NormalizeNFC.normalizeNfc(raw)
        docs.select(
          col("doc_id"),
          length(raw).as("n_raw_chars"),
          length(nfc).as("n_nfc_chars"),
          md5(nfc).as("nfc_hash"))
      },
      Some("""SELECT doc_id,
             |  CAST(length('A' || chr(778) || ' ' || text) AS INT) AS n_raw_chars,
             |  CAST(length(nfc_normalize('A' || chr(778) || ' ' || text)) AS INT) AS n_nfc_chars,
             |  md5(nfc_normalize('A' || chr(778) || ' ' || text)) AS nfc_hash
             |FROM documents""".stripMargin),
      doc = "Unicode NFC normalization as a codegen'd native expression " +
        "(java.text.Normalizer == standard NFC == DuckDB nfc_normalize, " +
        "bit-identical): decomposed graphemes recompose, ASCII short-circuits " +
        "on a byte scan; map-side, no shuffle"),

    "text_gopher_rules" -> QueryDef(
      (s, dir) => TextAnalysis.gopherRules(tbl(s, dir, "documents"), "text"),
      Some("""WITH d AS (
             |  SELECT doc_id, text,
             |    regexp_split_to_array(trim(text), '\s+') AS toks,
             |    regexp_split_to_array(text, '\n') AS lines
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(toks) AS INT) AS n_words,
             |  round(CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
             |    / len(toks), 6) AS mean_word_len,
             |  round(CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
             |    AS DOUBLE) / len(toks), 6) AS pct_alpha_words,
             |  round(CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]')))
             |    AS DOUBLE) / len(lines), 6) AS pct_bullet_lines,
             |  round(CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
             |    AS DOUBLE) / len(lines), 6) AS pct_ellipsis_lines,
             |  round(CAST((length(text) - length(regexp_replace(text, '#', '', 'g')))
             |      + (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) / 3
             |      + (length(text) - length(regexp_replace(text, '…', '', 'g')))
             |    AS DOUBLE) / len(toks), 6) AS symbol_ratio,
             |  (len(toks) BETWEEN 50 AND 100000)
             |    AND (round(CAST(list_sum(list_transform(toks, w -> length(w))) AS DOUBLE)
             |      / len(toks), 6) BETWEEN 3.0 AND 10.0)
             |    AND round(CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]')))
             |      AS DOUBLE) / len(lines), 6) <= 0.9
             |    AND round(CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$')))
             |      AS DOUBLE) / len(lines), 6) <= 0.3
             |    AND round(CAST((length(text) - length(regexp_replace(text, '#', '', 'g')))
             |        + (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) / 3
             |        + (length(text) - length(regexp_replace(text, '…', '', 'g')))
             |      AS DOUBLE) / len(toks), 6) < 0.1
             |    AND round(CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
             |      AS DOUBLE) / len(toks), 6) >= 0.8 AS keep
             |FROM d""".stripMargin),
      doc = "Gopher/MassiveText document-shape rule suite (word-count window, " +
        "mean word length, bullet/ellipsis line ratios, symbol and alpha-word " +
        "ratios + conjunctive keep) - the canonical pre-model web filter; one " +
        "map-side pass, ratios DECIMAL-stable cross-engine"),

    "text_bm25_rank" -> QueryDef(
      (s, dir) => TextAnalysis.bm25Score(
        tbl(s, dir, "documents"), "text", Seq("vector", "hash", "stream", "spark")),
      Some("""WITH toks AS (
             |  SELECT doc_id, len(regexp_split_to_array(trim(lower(text)), '\s+')) AS dl,
             |         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
             |  FROM documents),
             |tf AS (SELECT doc_id, tok, count(*) AS tf, min(dl) AS dl
             |       FROM toks WHERE tok IN ('vector','hash','stream','spark')
             |       GROUP BY 1, 2),
             |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
             |corpus AS (SELECT count(*) AS n_docs,
             |    avg(len(regexp_split_to_array(trim(lower(text)), '\s+'))) AS avgdl
             |  FROM documents),
             |contrib AS (
             |  SELECT doc_id,
             |    CAST(ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             |      * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
             |      AS DECIMAL(18,6)) AS c
             |  FROM tf JOIN dfreq USING (tok) CROSS JOIN corpus)
             |SELECT doc_id, CAST(sum(c) AS DOUBLE) AS bm25, count(*) AS n_matched_terms
             |FROM contrib GROUP BY 1""".stripMargin),
      doc = "BM25 relevance (Okapi k1=1.2 b=0.75) of every doc against a query " +
        "term bag - the retrieval/RAG-harvest primitive; one tokenizing pass " +
        "keeps only query-term hits, df/N/avgdl broadcast back as scalars"),

    "text_chunk_windows" -> QueryDef(
      (s, dir) => TextAnalysis.chunkWindows(
        tbl(s, dir, "documents"), "text", window = 20, overlap = 5),
      Some("""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
             |  FROM documents),
             |starts AS (SELECT doc_id, toks,
             |    unnest(generate_series(0, len(toks) - 1, 15)) AS st
             |  FROM t)
             |SELECT doc_id, CAST(st // 15 AS INT) AS chunk_id, CAST(st AS INT) AS start_tok,
             |  CAST(len(toks[st + 1 : st + 20]) AS INT) AS n_tokens,
             |  array_to_string(toks[st + 1 : st + 20], ' ') AS chunk_text
             |FROM starts""".stripMargin),
      doc = "overlapping token-window chunking (window=20, overlap=5) - the " +
        "RAG/context-length preprocessing step; map-side sequence+explode, " +
        "linear, deterministic chunk ids"),

    "text_keywords_tfidf" -> QueryDef(
      (s, dir) => TextAnalysis.keywordsTfidf(tbl(s, dir, "documents"), "text", k = 3),
      Some("""WITH toks AS (
             |  SELECT doc_id, len(regexp_split_to_array(trim(lower(text)), '\s+')) AS dl,
             |         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, count(*) AS tf, min(dl) AS dl
             |       FROM toks GROUP BY 1, 2),
             |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT count(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT doc_id, term,
             |    CAST((CAST(tf AS DOUBLE) / dl) * ln((n_docs + 1.0) / (df + 1.0))
             |      AS DECIMAL(18,6)) AS score
             |  FROM tf JOIN dfreq USING (term) CROSS JOIN n),
             |ranked AS (SELECT doc_id, term, score,
             |    row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rn
             |  FROM scored)
             |SELECT doc_id, term, CAST(score AS DOUBLE) AS tfidf, CAST(rn AS INT) AS rank
             |FROM ranked WHERE rn <= 3""".stripMargin),
      doc = "top-3 characteristic terms per doc by tf-idf ((tf/dl)*ln((N+1)/(df+1)))" +
        " - keyword extraction; scores quantized via DECIMAL(18,6), rank ties " +
        "broken by term so the cut is bit-deterministic cross-engine"),

    "text_cdc_chunks" -> QueryDef(
      // ENGINE-DEFAULT mode: xxhash64 boundaries + chunk keys (codegen'd
      // native hash; no per-gram digest/hex/conv chain). DuckDB cannot
      // replicate xxhash64 bit-for-bit, but the CDC contract is still
      // fully oracle-checkable as INVARIANTS over the chunk frame: the
      // chunks, concatenated back in chunk_id order, md5-hash to the
      // source text (coverage + order + non-overlap in one equality);
      // the summed lengths and boundary positions pin the frame edges;
      // chunk keys are injective per doc (distinct keys == distinct
      // chunk texts); and every non-final chunk really ends where the
      // engine hash of its trailing 8-gram is ≡ 0 (mod 64). The
      // bit-exact boundary/key oracle lives on the md5 variant below.
      (s, dir) => {
        // scoped to non-null, NON-EMPTY texts on BOTH sides: a NULL text
        // has no chunking semantics, null-vs-empty behavior diverges
        // between xxhash64 (seed for both) and md5 (NULL vs a digest),
        // and an EMPTY doc yields zero chunks (so cdcInvariants emits no
        // group row) while the oracle would emit an md5('')/covered_len-0
        // row — the operator's own null/empty handling is spec'd on the
        // operator
        val docs = tbl(s, dir, "documents")
          .filter(col("text").isNotNull && length(col("text")) > 0)
        TextAnalysis.cdcInvariants(
          TextAnalysis.cdcChunksFast(docs, "text", 8, 64),
          docs, "text", k = 8, divisor = 64, keyCol = "chunk_hash")
      },
      Some("""SELECT doc_id, md5(text) AS reassembled_md5,
             |  CAST(length(text) AS INT) AS covered_len,
             |  CAST(1 AS INT) AS first_start,
             |  CAST(length(text) AS INT) AS last_end,
             |  TRUE AS keys_injective,
             |  TRUE AS boundaries_valid
             |FROM documents WHERE text IS NOT NULL AND length(text) > 0""".stripMargin),
      doc = "content-defined chunking, engine default (xxhash64 Rabin-style " +
        "boundaries, ~64-char expected chunks): shift-robust per-chunk keys " +
        "for offset-independent dedup; map-only, position-local. Oracle " +
        "verifies the CDC invariants (ordered reassembly md5 == md5(text), " +
        "full coverage, boundary rule, per-doc key injectivity); bit-exact " +
        "boundaries/keys on text_cdc_chunks_md5"),

    "text_cdc_chunks_md5" -> QueryDef(
      (s, dir) => TextAnalysis.cdcChunks(tbl(s, dir, "documents"), "text"),
      Some("""WITH d AS (SELECT doc_id, text, CAST(length(text) AS INT) AS len
             |  FROM documents),
             |b AS (SELECT doc_id, text, len,
             |  CASE WHEN len >= 8 THEN list_filter(
             |    list_transform(range(8, len + 1), i ->
             |      CASE WHEN CAST(CONCAT('0x',
             |          substr(md5(substr(text, CAST(i - 7 AS INT), 8)), 1, 15))
             |        AS BIGINT) % 64 = 0 THEN CAST(i AS INT) END),
             |    x -> x IS NOT NULL AND x < len)
             |  ELSE [] END AS bs
             |  FROM d),
             |ab AS (SELECT doc_id, text,
             |    list_concat(list_concat([0], bs), [len]) AS allb FROM b),
             |j AS (SELECT doc_id, text, allb,
             |    unnest(range(1, len(allb))) AS jj FROM ab)
             |SELECT doc_id, CAST(jj - 1 AS INT) AS chunk_id,
             |  CAST(allb[jj] + 1 AS INT) AS start_char,
             |  CAST(allb[jj + 1] - allb[jj] AS INT) AS chunk_len,
             |  md5(substr(text, CAST(allb[jj] + 1 AS INT),
             |    CAST(allb[jj + 1] - allb[jj] AS INT))) AS chunk_md5
             |FROM j""".stripMargin),
      doc = "content-defined chunking, md5 ORACLE variant (boundaries where the " +
        "trailing 8-gram md5-hash % 64 = 0): bit-exact DuckDB replication of " +
        "boundaries and per-chunk md5s; the engine default is text_cdc_chunks"),

    "text_cdc_chunks_bounded" -> QueryDef(
      // BOUNDED CDC, engine default (xxhash64): the production-chunker
      // size rule — suppress candidates closer than 32 chars to the last
      // boundary, force a cut at 128 when the hash rule stays silent —
      // closing the unbounded variant's documented deviation. Verified
      // as INVARIANTS like text_cdc_chunks, extended with the size
      // window: every non-final chunk in [32,128] and either on an
      // engine hash boundary or a forced 128-cut; final chunk <= 128.
      (s, dir) => {
        val docs = tbl(s, dir, "documents")
          .filter(col("text").isNotNull && length(col("text")) > 0)
        TextAnalysis.cdcInvariantsBounded(
          TextAnalysis.cdcChunksBoundedFast(docs, "text", 8, 64, 32, 128),
          docs, "text", k = 8, divisor = 64, minLen = 32, maxLen = 128,
          keyCol = "chunk_hash")
      },
      Some("""SELECT doc_id, md5(text) AS reassembled_md5,
             |  CAST(length(text) AS INT) AS covered_len,
             |  CAST(1 AS INT) AS first_start,
             |  CAST(length(text) AS INT) AS last_end,
             |  TRUE AS keys_injective,
             |  TRUE AS boundaries_valid,
             |  TRUE AS sizes_valid
             |FROM documents WHERE text IS NOT NULL AND length(text) > 0""".stripMargin),
      doc = "size-bounded content-defined chunking, engine default: chunk " +
        "lengths confined to [32,128] via suppress-below-min / cut-at-max " +
        "over the xxhash64 boundary rule (boundaries resynchronize after " +
        "edits the standard CDC way); oracle verifies reassembly, coverage, " +
        "the adjusted boundary rule, and the size window; bit-exact " +
        "boundaries on text_cdc_chunks_bounded_md5"),

    "text_cdc_chunks_bounded_md5" -> QueryDef(
      (s, dir) => TextAnalysis.cdcChunksBounded(
        tbl(s, dir, "documents")
          .filter(col("text").isNotNull && length(col("text")) > 0),
        "text", 8, 64, 32, 128),
      // the oracle replays the SAME walk as a per-doc recursive descent:
      // next boundary = LEAST(p + 128, first hash candidate >= p + 32,
      // falling back to len) — provably the closed form of the engine's
      // suppress/force fold (candidates below p+32 are suppressed, a
      // candidate beyond p+128 yields the forced cut first)
      Some("""WITH RECURSIVE d AS (
             |  SELECT doc_id, text, CAST(length(text) AS INT) AS len
             |  FROM documents WHERE text IS NOT NULL AND length(text) > 0),
             |b AS (SELECT doc_id, text, len,
             |  CASE WHEN len >= 8 THEN list_filter(
             |    list_transform(range(8, len + 1), i ->
             |      CASE WHEN CAST(CONCAT('0x',
             |          substr(md5(substr(text, CAST(i - 7 AS INT), 8)), 1, 15))
             |        AS BIGINT) % 64 = 0 THEN CAST(i AS INT) END),
             |    x -> x IS NOT NULL AND x < len)
             |  ELSE [] END AS cs
             |  FROM d),
             |walk AS (
             |  SELECT doc_id, text, len, cs,
             |    0 AS s, 0 AS e, 0 AS ord FROM b
             |  UNION ALL
             |  SELECT doc_id, text, len, cs, e AS s,
             |    LEAST(e + 128,
             |      COALESCE(list_min(list_filter(cs, c -> c >= e + 32)), len)) AS e,
             |    ord + 1
             |  FROM walk WHERE e < len)
             |SELECT doc_id, CAST(ord - 1 AS INT) AS chunk_id,
             |  CAST(s + 1 AS INT) AS start_char,
             |  CAST(e - s AS INT) AS chunk_len,
             |  md5(substr(text, CAST(s + 1 AS INT), CAST(e - s AS INT))) AS chunk_md5
             |FROM walk WHERE ord >= 1""".stripMargin),
      doc = "size-bounded CDC, md5 ORACLE variant: bit-exact DuckDB replay of " +
        "the suppress-below-32 / force-at-128 walk (recursive descent over " +
        "the same md5 boundary candidates); the engine default is " +
        "text_cdc_chunks_bounded"),

    "text_token_count" -> QueryDef(
      (s, dir) => TextAnalysis.tokenCounts(tbl(s, dir, "documents"), "text"),
      Some("""SELECT doc_id,
             |  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INT) AS ws_tokens,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT) AS word_tokens,
             |  CAST(length(text) AS INT) AS n_chars
             |FROM documents""".stripMargin),
      doc = "whitespace + word-regex token counts; no shuffle, codegen only"),

    "text_unigram_logprob" -> QueryDef(
      (s, dir) => TextAnalysis.unigramLogprob(tbl(s, dir, "documents"), "text"),
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
             |  FROM documents),
             |f AS (SELECT tok, count(*) AS c FROM t GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM f)
             |SELECT doc_id, round(-avg(ln(f.c / tot.n)), 4) AS nll,
             |  count(*) AS n_tokens
             |FROM t JOIN f USING (tok) CROSS JOIN tot
             |GROUP BY 1""".stripMargin),
      doc = "per-doc mean NLL under the corpus's own unigram LM - the " +
        "perplexity-filter quality signal, fully reproducible"),

    "text_bigram_logprob" -> QueryDef(
      (s, dir) => TextAnalysis.bigramLogprob(tbl(s, dir, "documents"), "text"),
      Some("""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
             |  FROM documents),
             |u AS (SELECT doc_id, unnest(toks) AS tok FROM t),
             |f AS (SELECT tok, count(*) AS c1 FROM u GROUP BY 1),
             |tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n FROM f),
             |bge AS (SELECT doc_id,
             |    unnest(toks[1:len(toks)-1]) AS prev,
             |    unnest(toks[2:len(toks)]) AS tok
             |  FROM t WHERE len(toks) >= 2),
             |bf AS (SELECT prev, tok, count(*) AS c2 FROM bge GROUP BY 1, 2),
             |sc AS (SELECT doc_id,
             |    -avg(ln(0.75 * bf.c2 / fp.c1 + 0.25 * fw.c1 / tot.n)) AS raw,
             |    count(*) AS nb
             |  FROM bge JOIN bf USING (prev, tok)
             |  JOIN f fp ON fp.tok = bge.prev
             |  JOIN f fw ON fw.tok = bge.tok
             |  CROSS JOIN tot GROUP BY 1)
             |SELECT d.doc_id, round(coalesce(sc.raw, 0), 4) AS nll,
             |  coalesce(sc.nb, 0) AS n_bigrams
             |FROM documents d LEFT JOIN sc USING (doc_id)""".stripMargin),
      doc = "per-doc mean NLL under the corpus's own Jelinek-Mercer bigram LM " +
        "(lambda=0.75): the word-ORDER-aware perplexity filter - shuffled-text " +
        "spam scores high where the unigram model cannot see the disorder; " +
        "bigrams array-side, counts two hash aggs, scoring a key join"),

    "text_repetition_stats" -> QueryDef(
      (s, dir) => TextAnalysis.repetitionStats(tbl(s, dir, "documents"), "text"),
      Some("""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
             |  FROM documents),
             |w AS (SELECT doc_id, unnest(toks) AS w FROM t),
             |wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
             |n AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
             |  count(*) AS n_distinct, sum(c * ln(c)) AS clnc FROM wc GROUP BY 1),
             |bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)),
             |  i -> toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1])) AS bg FROM t),
             |bgc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY 1, 2),
             |top AS (SELECT doc_id, max(c) AS max_bg, CAST(sum(c) AS BIGINT) AS n_bg
             |  FROM bgc GROUP BY 1)
             |SELECT n.doc_id, n.n_words,
             |  round(1 - n.n_distinct / CAST(n.n_words AS DOUBLE), 4) AS dup_word_frac,
             |  round(coalesce(top.max_bg / CAST(top.n_bg AS DOUBLE), 0), 4) AS top2gram_frac,
             |  round(ln(n.n_words) - n.clnc / n.n_words, 4) AS word_entropy,
             |  (round(coalesce(top.max_bg / CAST(top.n_bg AS DOUBLE), 0), 4) >= 0.08
             |   OR round(1 - n.n_distinct / CAST(n.n_words AS DOUBLE), 4) >= 0.6) AS repetitive
             |FROM n LEFT JOIN top USING (doc_id)""".stripMargin),
      doc = "Gopher-family repetition filters: dup-word fraction, top-2gram share, " +
        "word entropy, composite repetitive gate"),

    "corpus_boilerplate" -> QueryDef(
      (s, dir) => TextAnalysis.boilerplateCoverage(
        tbl(s, dir, "documents"), "text", n = 3, minDf = 10),
      Some("""WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
             |  FROM documents),
             |ws AS (SELECT doc_id,
             |  unnest(list_transform(range(1, len(toks) - 1),
             |    i -> {'s': i, 'sh': toks[CAST(i AS INT)] || ' ' ||
             |      toks[CAST(i AS INT) + 1] || ' ' || toks[CAST(i AS INT) + 2]})) AS u
             |  FROM t),
             |w AS (SELECT doc_id, u.s AS s, u.sh AS sh FROM ws),
             |freq AS (SELECT sh FROM (SELECT DISTINCT doc_id, sh FROM w)
             |  GROUP BY sh HAVING count(*) >= 10),
             |cov AS (SELECT DISTINCT doc_id, s + o.o AS p
             |  FROM w JOIN freq USING (sh), unnest([0, 1, 2]) AS o(o)),
             |cnt AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS covered_tokens
             |  FROM cov GROUP BY 1)
             |SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
             |  coalesce(cnt.covered_tokens, 0) AS covered_tokens,
             |  round(coalesce(cnt.covered_tokens, 0) /
             |    CAST(greatest(len(t.toks), 1) AS DOUBLE), 6) AS covered_frac
             |FROM t LEFT JOIN cnt USING (doc_id)""".stripMargin),
      doc = "cross-document boilerplate coverage: tokens covered by word " +
        "3-grams occurring in >= 10 docs (the C4/CCNet strip-repeated-spans " +
        "signal); overlapping spans count positions once"),

    "text_quality_score" -> QueryDef(
      (s, dir) => TextAnalysis.qualityScore(tbl(s, dir, "documents"), "text"),
      Some(s"""WITH $QualityScoreCte
              |SELECT s.doc_id, CAST(len(s.toks) AS INT) AS n_tokens,
              |  round(CAST(len(list_filter(s.toks, x -> list_contains(${markerSql(TextAnalysis.StopwordsEn)}, x))) AS DOUBLE) / len(s.toks), 6) AS stop_ratio,
              |  round(CAST(s.punct AS DOUBLE) / s.n_chars, 6) AS punct_ratio,
              |  round(CAST(list_sum(list_transform(s.words, w -> length(w))) AS DOUBLE) / greatest(len(s.words), 1), 6) AS mean_word_len,
              |  q.quality_score
              |FROM qsrc s JOIN qscore q USING (doc_id)""".stripMargin),
      doc = "length/punct/stopword quality signals + composite score"),

    "quality_model_score" -> QueryDef(
      (s, dir) => TextAnalysis.modelScore(tbl(s, dir, "documents"), "text"),
      Some(s"""WITH $QualityScoreCte,
              |f AS (SELECT doc_id,
              |  CAST(len(toks) AS INT) AS n_tokens,
              |  round(CAST(len(list_filter(toks, x -> list_contains(${markerSql(TextAnalysis.StopwordsEn)}, x))) AS DOUBLE) / len(toks), 6) AS stop_ratio,
              |  round(CAST(punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
              |  round(CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE) / greatest(len(words), 1), 6) AS mean_word_len
              |FROM qsrc),
              |z AS (SELECT doc_id,
              |  -0.8 + 6.0 * stop_ratio - 4.0 * punct_ratio + 0.2 * mean_word_len - 0.004 * n_tokens AS z
              |FROM f)
              |SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS model_score,
              |  (round(1.0 / (1.0 + exp(-z)), 4) >= 0.5) AS keep
              |FROM z""".stripMargin),
      doc = "logistic quality-classifier inference over the surface features " +
        "(the fasttext-filter stage as pure column math; map-only, no shuffle)"),

    "corpus_line_dedup" -> QueryDef(
      (s, dir) => TextAnalysis.lineDedup(tbl(s, dir, "documents"), "text"),
      Some("""WITH t AS (SELECT doc_id, regexp_split_to_array(text, '\n') AS lines
             |  FROM documents),
             |l AS (SELECT doc_id, CAST(gs.i AS INT) AS pos,
             |    lines[CAST(gs.i AS INT) + 1] AS line
             |  FROM t, LATERAL (SELECT unnest(range(len(lines))) AS i) gs),
             |e AS (SELECT doc_id, pos, line,
             |    len(regexp_split_to_array(trim(line), '\s+')) >= 5
             |      AND length(trim(line)) > 0 AS eligible
             |  FROM l),
             |f AS (SELECT line, min(struct_pack(d := doc_id, p := pos)) AS fk
             |  FROM e WHERE eligible GROUP BY line),
             |k AS (SELECT e.doc_id, e.pos, e.line
             |  FROM e LEFT JOIN f USING (line)
             |  WHERE NOT e.eligible OR (e.doc_id = f.fk.d AND e.pos = f.fk.p)),
             |agg AS (SELECT doc_id,
             |    string_agg(line, chr(10) ORDER BY pos) AS clean_text,
             |    count(*) AS n_lines_kept
             |  FROM k GROUP BY 1),
             |tot AS (SELECT doc_id, count(*) AS n FROM l GROUP BY 1)
             |SELECT agg.doc_id, agg.clean_text, agg.n_lines_kept,
             |  tot.n - agg.n_lines_kept AS n_lines_dropped
             |FROM agg JOIN tot USING (doc_id)""".stripMargin),
      doc = "C4-style corpus-wide line dedup: every 5+-word line keeps only " +
        "its FIRST (doc_id, pos) occurrence corpus-wide; short lines always " +
        "keep; docs reassemble in order. One content-keyed hash shuffle with " +
        "map-side partial min + one doc-keyed reassembly - linear; a doc " +
        "losing every line drops from the output (C4 drops empty docs)"),

    "quality_topfrac_gate" -> QueryDef(
      (s, dir) => TextAnalysis.topFracGate(tbl(s, dir, "documents"), "text",
        keepFrac = 0.6),
      Some(s"""WITH $QualityScoreCte,
              |f AS (SELECT doc_id,
              |  CAST(len(toks) AS INT) AS n_tokens,
              |  round(CAST(len(list_filter(toks, x -> list_contains(${markerSql(TextAnalysis.StopwordsEn)}, x))) AS DOUBLE) / len(toks), 6) AS stop_ratio,
              |  round(CAST(punct AS DOUBLE) / n_chars, 6) AS punct_ratio,
              |  round(CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE) / greatest(len(words), 1), 6) AS mean_word_len
              |FROM qsrc),
              |z AS (SELECT doc_id,
              |  -0.8 + 6.0 * stop_ratio - 4.0 * punct_ratio + 0.2 * mean_word_len - 0.004 * n_tokens AS z
              |FROM f),
              |sc AS (SELECT doc_id, round(1.0 / (1.0 + exp(-z)), 4) AS model_score FROM z),
              |thr AS (SELECT round(quantile_cont(model_score, 0.4), 6) AS thr FROM sc)
              |SELECT sc.doc_id, sc.model_score, thr.thr,
              |  sc.model_score >= thr.thr AS kept
              |FROM sc CROSS JOIN thr""".stripMargin),
      doc = "keep-rate-calibrated quality gate: threshold = exact (1-frac) " +
        "quantile of the model score (one agg, broadcast back; approx_percentile " +
        "at 100 TB, same plan shape), 6-dp-rounded on both sides so the gate " +
        "has no float knife edge"),

    "text_language_id" -> QueryDef(
      (s, dir) => TextAnalysis.languageId(tbl(s, dir, "documents"), "text"),
      Some {
        val scores = TextAnalysis.Markers.map { case (l, ws) =>
          s"CAST(len(list_filter(toks, x -> list_contains(${markerSql(ws)}, x))) AS INT) AS score_$l"
        }.mkString(",\n  ")
        s"""WITH t AS (SELECT doc_id, $ToksSql AS toks FROM documents),
           |s AS (SELECT doc_id,
           |  $scores
           |FROM t)
           |SELECT doc_id, score_en, score_es, score_de, score_fr, score_zh,
           |  CASE
           |    WHEN score_en = 0 AND score_es = 0 AND score_de = 0
           |     AND score_fr = 0 AND score_zh = 0 THEN 'und'
           |    WHEN score_en >= greatest(score_es, score_de, score_fr, score_zh) THEN 'en'
           |    WHEN score_es >= greatest(score_de, score_fr, score_zh) THEN 'es'
           |    WHEN score_de >= greatest(score_fr, score_zh) THEN 'de'
           |    WHEN score_fr >= score_zh THEN 'fr'
           |    ELSE 'zh'
           |  END AS predicted_lang
           |FROM s""".stripMargin
      },
      doc = "marker-word language ID with deterministic argmax tie-break"),

    "text_lang_confusion" -> QueryDef(
      (s, dir) => {
        // declared-vs-predicted language confusion matrix — the metadata
        // trust audit: a corpus whose declared labels disagree with the
        // content signal gets its language FILTERS routed to the
        // predictor instead. Pure narrow projection + one bounded
        // (|langs|^2-row) aggregation.
        val docs = tbl(s, dir, "documents")
        docs.select(
            coalesce(col("lang"), lit("<none>")).as("declared_lang"),
            TextAnalysis.predictedLangCol(col("text")).as("predicted_lang"))
          .groupBy(col("declared_lang"), col("predicted_lang"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("is_match", col("declared_lang") === col("predicted_lang"))
      },
      Some {
        val scores = TextAnalysis.Markers.map { case (l, ws) =>
          s"CAST(len(list_filter(toks, x -> list_contains(${markerSql(ws)}, x))) AS INT) AS score_$l"
        }.mkString(",\n  ")
        s"""WITH t AS (SELECT doc_id, lang, $ToksSql AS toks FROM documents),
           |s AS (SELECT doc_id, lang,
           |  $scores
           |FROM t),
           |p AS (SELECT coalesce(lang, '<none>') AS declared_lang,
           |  CASE
           |    WHEN score_en = 0 AND score_es = 0 AND score_de = 0
           |     AND score_fr = 0 AND score_zh = 0 THEN 'und'
           |    WHEN score_en >= greatest(score_es, score_de, score_fr, score_zh) THEN 'en'
           |    WHEN score_es >= greatest(score_de, score_fr, score_zh) THEN 'es'
           |    WHEN score_de >= greatest(score_fr, score_zh) THEN 'de'
           |    WHEN score_fr >= score_zh THEN 'fr'
           |    ELSE 'zh'
           |  END AS predicted_lang
           |FROM s)
           |SELECT declared_lang, predicted_lang,
           |  CAST(count(*) AS BIGINT) AS n_docs,
           |  declared_lang = predicted_lang AS is_match
           |FROM p GROUP BY 1, 2""".stripMargin
      },
      doc = "declared-vs-predicted language confusion matrix - the metadata " +
        "trust audit deciding whether language filters key on labels or " +
        "the content signal"),

    "text_ngram_freq" -> QueryDef(
      (s, dir) => {
        // corpus vocabulary building: term-frequency table of word
        // bigrams (duplicates counted), top 50. Row-shaped: explode +
        // window lead + count, then TakeOrdered — the frequency pass of
        // a tokenizer-training pipeline.
        import org.apache.spark.sql.expressions.Window
        val toks = tbl(s, dir, "documents").select(col("doc_id"),
          posexplode(graft.text.TextAnalysis.tokens(col("text")))).toDF("doc_id", "pos", "tok")
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        toks.withColumn("nxt", lead(col("tok"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
          .groupBy(col("bigram")).agg(count(lit(1)).as("freq"))
          .orderBy(col("freq").desc, col("bigram").asc)
          .limit(50)
      },
      Some("""WITH t AS (
             |  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents),
             |b AS (
             |  SELECT toks[CAST(i AS INT)] || ' ' || toks[CAST(i AS INT) + 1] AS bigram
             |  FROM t, unnest(range(1, len(toks))) AS u(i))
             |SELECT bigram, count(*) AS freq FROM b
             |GROUP BY bigram ORDER BY freq DESC, bigram ASC LIMIT 50""".stripMargin),
      doc = "bigram term-frequency vocabulary (top-50, deterministic tie-break)"),

    "text_pii_redact" -> QueryDef(
      (s, dir) => {
        // Inject deterministic synthetic PII (the corpus has none), then
        // redact emails/phones with portable regexes — the text-scrub
        // stage of a training pipeline. Narrow, codegen'd, no shuffle.
        val withPii = tbl(s, dir, "documents").select(
          col("doc_id"),
          concat(col("text"), lit(" contact: user"), col("doc_id"),
            lit("@example.com or +1-555-"), col("doc_id")).as("text"))
        val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+"
        val phone = "\\+1-555-[0-9]+"
        withPii.select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit(email), lit(0))).as("n_emails"),
          size(regexp_extract_all(col("text"), lit(phone), lit(0))).as("n_phones"),
          md5(regexp_replace(regexp_replace(col("text"), email, "<EMAIL>"),
            phone, "<PHONE>")).as("redacted_md5"))
      },
      Some("""WITH w AS (
             |  SELECT doc_id,
             |    text || ' contact: user' || doc_id || '@example.com or +1-555-' || doc_id AS text
             |  FROM documents)
             |SELECT doc_id,
             |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+')) AS INT) AS n_emails,
             |  CAST(len(regexp_extract_all(text, '\+1-555-[0-9]+')) AS INT) AS n_phones,
             |  md5(regexp_replace(regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+', '<EMAIL>', 'g'),
             |    '\+1-555-[0-9]+', '<PHONE>', 'g')) AS redacted_md5
             |FROM w""".stripMargin),
      doc = "email/phone redaction: the PII-scrub stage, pure narrow map"),

    "sample_split" -> QueryDef(
      (s, dir) =>
        // Deterministic hash-based train/val/test assignment: stable
        // under any partitioning, reshuffling, or re-run — the property
        // a 100 TB pipeline needs (no random() anywhere).
        tbl(s, dir, "documents").select(
          col("doc_id"),
          pmod(graft.text.TextAnalysis.hash60(concat(lit("split:"), col("doc_id"))), lit(10L)).as("bucket"))
          .withColumn("split",
            when(col("bucket") < 8, "train").when(col("bucket") < 9, "val").otherwise("test")),
      Some("""SELECT doc_id,
             |  CAST(CONCAT('0x', substr(md5('split:' || doc_id), 1, 15)) AS BIGINT) % 10 AS bucket,
             |  CASE WHEN CAST(CONCAT('0x', substr(md5('split:' || doc_id), 1, 15)) AS BIGINT) % 10 < 8 THEN 'train'
             |       WHEN CAST(CONCAT('0x', substr(md5('split:' || doc_id), 1, 15)) AS BIGINT) % 10 < 9 THEN 'val'
             |       ELSE 'test' END AS split
             |FROM documents""".stripMargin),
      doc = "deterministic hash-based train/val/test split (no random())"),

    "text_pack_sequences" -> QueryDef(
      (s, dir) =>
        // graft.text.TrainingMix.packSequences: sharded concat-and-chunk
        // (a global cumsum would serialize the corpus through one
        // partition). Shard count is a parameter with a size-based
        // default; 16 is PINNED here because bin ids depend on it and
        // the oracle packs with 16.
        graft.text.TrainingMix.packSequences(
          tbl(s, dir, "documents"), "text", budget = 2048, shards = 16),
      Some("""WITH d AS (
             |  SELECT doc_id,
             |    CAST(len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS INT) AS n_tokens,
             |    CAST(CONCAT('0x', substr(md5('shard:' || doc_id), 1, 15)) AS BIGINT) % 16 AS shard
             |  FROM documents)
             |SELECT doc_id, n_tokens, shard,
             |  CAST((sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) - n_tokens)
             |    // 2048 AS BIGINT) AS bin
             |FROM d""".stripMargin),
      doc = "sharded concat-and-chunk packing into fixed token-budget bins"),

    "sample_weighted" -> QueryDef(
      (s, dir) =>
        // domain reweighting: drop src0, thin src1/src2, keep src3
        // whole, 0.75 for the long tail — deterministic hash draws, so
        // the sample is identical under any partitioning or re-run
        graft.text.TrainingMix.sampleByRate(
          tbl(s, dir, "documents"), "source",
          rates = Map("src0" -> 0.0, "src1" -> 0.25, "src2" -> 0.5, "src3" -> 1.0),
          defaultRate = 0.75),
      Some("""SELECT doc_id, source FROM documents
             |WHERE CAST(CONCAT('0x', substr(md5('sample:' || doc_id), 1, 15)) AS BIGINT) % 1000000
             |  < (CASE source WHEN 'src0' THEN 0 WHEN 'src1' THEN 250000
             |     WHEN 'src2' THEN 500000 WHEN 'src3' THEN 1000000 ELSE 750000 END)""".stripMargin),
      doc = "deterministic per-source rate sampling (training-mix domain reweighting)"),

    "sample_temperature" -> QueryDef(
      (s, dir) => {
        // T5-style temperature reweighting (weights ∝ tokens^(1/2)):
        // three sources merge into one 'big' domain (~3x the tokens of
        // each small one) and the flattened weights sample it at ~1/√3
        // of proportional — low-resource sources are upsampled. Integer
        // sqrt + BigInt thresholds keep the cut bit-exact cross-engine.
        val docs = tbl(s, dir, "documents").withColumn("src_group",
          when(col("source").isin("src0", "src1", "src2"), lit("big"))
            .otherwise(col("source")))
        graft.text.TrainingMix.sampleTemperature(docs, "src_group", "text", 3000L)
      },
      Some("""WITH d AS (
             |  SELECT doc_id, text,
             |    CASE WHEN source IN ('src0','src1','src2') THEN 'big'
             |         ELSE source END AS src_group
             |  FROM documents),
             |toks AS (
             |  SELECT src_group,
             |    sum(len(regexp_split_to_array(trim(text), '\s+'))) AS t
             |  FROM d GROUP BY 1),
             |w AS (SELECT src_group, t, CAST(floor(sqrt(t)) AS BIGINT) AS iw FROM toks),
             |tot AS (SELECT sum(iw) AS tw FROM w),
             |thr AS (
             |  SELECT src_group,
             |    LEAST(1000000, (3000 * iw * 1000000) // (tw * t)) AS thr
             |  FROM w, tot)
             |SELECT d.doc_id, d.src_group
             |FROM d JOIN thr USING (src_group)
             |WHERE CAST(CONCAT('0x', substr(md5('tsample:' || d.doc_id), 1, 15)) AS BIGINT)
             |  % 1000000 < thr""".stripMargin),
      doc = "temperature-scaled mix sampling (weights ~ tokens^0.5, T5/mT5): " +
        "low-resource sources upsampled, integer-exact thresholds"),

    "corpus_source_cap" -> QueryDef(
      (s, dir) => {
        // quality-ranked per-source cap (the domain-balancing stage:
        // RefinedWeb/FineWeb keep the BEST docs of each domain instead
        // of letting one boilerplate-heavy domain dominate): exactly
        // the top 20 docs per source by (quality desc, length desc),
        // scored in the SAME scan that ranks (qualityScoreCol appends
        // to the projection — no join), ranked by the two-pass
        // DistributedRank — no per-source single-task windows at a
        // million domains.
        val docs = tbl(s, dir, "documents").select(
          col("doc_id"), col("source"), col("n_chars"),
          graft.text.TextAnalysis.qualityScoreCol(col("text")).as("quality_score"))
        graft.text.TrainingMix.capPerStratum(
          docs, "source",
          order = Seq(col("quality_score").desc, col("n_chars").desc,
            col("doc_id").asc),
          n = 20L, nParts = 16,
          keep = Seq("doc_id", "source", "quality_score"))
      },
      Some(s"""WITH q AS (
              |  SELECT doc_id, source, n_chars,
              |    round(CAST(
              |      (CASE WHEN len(regexp_split_to_array(trim(text), '\\s+')) BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END) +
              |      (CASE WHEN round(CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> list_contains(${markerSql(TextAnalysis.StopwordsEn)}, x))) AS DOUBLE) / len(regexp_split_to_array(trim(text), '\\s+')), 6) > 0.05 THEN 0.3 ELSE 0.0 END) +
              |      (CASE WHEN round(CAST(length(text) - length(regexp_replace(text, '[!"#$$%&''()*+,\\-./:;<=>?@\\[\\\\\\]^_`{|}~]', '', 'g')) AS DOUBLE) / length(text), 6) < 0.2 THEN 0.3 ELSE 0.0 END)
              |      AS DOUBLE), 6) AS quality_score
              |  FROM documents)
              |SELECT doc_id, source, quality_score FROM (
              |  SELECT doc_id, source, quality_score,
              |    row_number() OVER (PARTITION BY source
              |      ORDER BY quality_score DESC, n_chars DESC, doc_id) AS rk
              |  FROM q)
              |WHERE rk <= 20""".stripMargin),
      doc = "quality-ranked per-source cap (domain balancing): top 20 docs per " +
        "source by composite quality, one scan, distributed rank"),

    "sample_stratified" -> QueryDef(
      (s, dir) =>
        // exact per-stratum counts (not Bernoulli): src0's 40 exceeds its
        // 25-doc supply (take all), src1 cuts to 10, src2 drops to 0, the
        // long tail cuts to 15 — all chosen by deterministic hash order,
        // ranked via the two-pass DistributedRank (no per-stratum
        // single-task window)
        graft.text.TrainingMix.sampleStratified(
          tbl(s, dir, "documents"), "source",
          counts = Map("src0" -> 40L, "src1" -> 10L, "src2" -> 0L),
          defaultCount = 15L, nParts = 16),
      Some("""SELECT doc_id, source FROM (
             |  SELECT doc_id, source, row_number() OVER (PARTITION BY source
             |    ORDER BY CAST(CONCAT('0x', substr(md5('strat:' || doc_id), 1, 15)) AS BIGINT),
             |      doc_id) AS rk
             |  FROM documents)
             |WHERE rk <= CASE source WHEN 'src0' THEN 40 WHEN 'src1' THEN 10
             |  WHEN 'src2' THEN 0 ELSE 15 END""".stripMargin),
      doc = "exact stratified sampling: deterministic hash-ordered rank per stratum, " +
        "precise per-stratum counts"),

    "sample_epoch_budget" -> QueryDef(
      (s, dir) => {
        // data-constrained scaling (Muennighoff 2023): budget = 2.5x the
        // corpus's unique tokens, cap 4 epochs -> every doc repeats
        // twice in full, and one fractional tail epoch samples ~50% by
        // the deterministic hash draw. The budget derives from the
        // corpus itself so the fixture holds at every SF.
        val docs = tbl(s, dir, "documents")
        val unique = docs.agg(
          sum(size(graft.text.TextAnalysis.tokens(col("text"))).cast("long")))
          .head().getLong(0)
        graft.text.TrainingMix.epochBudget(docs, "source", "text",
          budgetTokens = unique * 5L / 2L, maxEpochs = 4)
      },
      Some("""WITH u AS (SELECT CAST(sum(len(regexp_split_to_array(trim(text), '\s+')))
             |    AS BIGINT) AS ut FROM documents),
             |p AS (SELECT LEAST(CAST(4 AS HUGEINT) * 1000000,
             |    (CAST(ut AS HUGEINT) * 5 // 2) * 1000000 // ut) AS e_ppm
             |  FROM u),
             |eps AS (SELECT CAST(unnest(range(1,
             |    CAST(e_ppm // 1000000 AS BIGINT) + 2)) AS BIGINT) AS epoch FROM p)
             |SELECT d.doc_id, d.source, e.epoch
             |FROM documents d CROSS JOIN eps e CROSS JOIN p
             |WHERE e.epoch <= CAST(p.e_ppm // 1000000 AS BIGINT)
             |   OR CAST(CONCAT('0x', substr(md5('epoch:' || d.doc_id), 1, 15)) AS BIGINT)
             |      % 1000000 < CAST(p.e_ppm % 1000000 AS BIGINT)""".stripMargin),
      doc = "data-constrained epoch allocation (Muennighoff 2023): " +
        "epochs = min(maxEpochs, budget/unique) in exact ppm integer math; " +
        "floor(epochs) full copies + one hash-sampled fractional tail epoch; " +
        "map-side explode, documents never shuffle"),

    "sample_target_mix" -> QueryDef(
      (s, dir) =>
        // target-composition form: 50/30/15/5 across four sources under
        // a 4000-token budget (src0's share exceeds its supply at
        // sf0.01, exercising the rate cap); other sources excluded
        graft.text.TrainingMix.sampleToTargetMix(
          tbl(s, dir, "documents"), "source", "text",
          targetWeights = Map(
            "src0" -> 0.5, "src1" -> 0.3, "src2" -> 0.15, "src3" -> 0.05),
          budgetTokens = 4000L),
      Some("""WITH toks AS (
             |  SELECT source,
             |    sum(len(regexp_split_to_array(trim(text), '\s+'))) AS t
             |  FROM documents GROUP BY 1),
             |thr AS (
             |  SELECT source,
             |    LEAST(1000000, (4000::BIGINT * (CASE source
             |      WHEN 'src0' THEN 5000 WHEN 'src1' THEN 3000
             |      WHEN 'src2' THEN 1500 WHEN 'src3' THEN 500 END) * 1000000::BIGINT)
             |      // (10000::BIGINT * t)) AS thr
             |  FROM toks
             |  WHERE source IN ('src0', 'src1', 'src2', 'src3'))
             |SELECT d.doc_id, d.source FROM documents d JOIN thr USING (source)
             |WHERE CAST(CONCAT('0x', substr(md5('sample:' || d.doc_id), 1, 15)) AS BIGINT)
             |  % 1000000 < thr.thr""".stripMargin),
      doc = "domain reweighting to a TARGET token budget: rate = min(1, budget*w/tokens), " +
        "exact integer thresholds, nested samples across budgets"),

    "sample_interleave" -> QueryDef(
      (s, dir) =>
        // graft.text.TrainingMix.interleave: per-source ranks go through
        // the two-pass DistributedRank (a plain per-source window pulls
        // corpus/S onto one task). The partition count is parallelism
        // only — output is identical for any value.
        graft.text.TrainingMix.interleave(
          tbl(s, dir, "documents"), "source",
          nParts = graft.text.TrainingMix.defaultShards(s)),
      Some("""WITH s AS (
             |  SELECT src, row_number() OVER (ORDER BY src) - 1 AS source_idx,
             |    count(*) OVER () AS n_sources
             |  FROM (SELECT DISTINCT coalesce(source, '<none>') AS src FROM documents)),
             |r AS (
             |  SELECT doc_id, source, coalesce(source, '<none>') AS src,
             |    row_number() OVER (PARTITION BY coalesce(source, '<none>')
             |      ORDER BY CAST(CONCAT('0x', substr(md5('interleave:' || doc_id), 1, 15)) AS BIGINT),
             |        doc_id) - 1 AS rk
             |  FROM documents)
             |SELECT doc_id, r.source,
             |  CAST(rk * n_sources + source_idx AS BIGINT) AS pos
             |FROM r JOIN s USING (src)""".stripMargin),
      doc = "deterministic round-robin source interleaving (training-mix ordering)"),

    "sample_dsir_weights" -> QueryDef(
      (s, dir) =>
        // DSIR (Xie et al. 2023): hashed-unigram importance weights of
        // every doc toward the English slice as target distribution;
        // rank 1 = most target-like. B-row model state, broadcast
        // log-ratio table, two-pass distributed rank — see
        // graft.text.TrainingMix.dsirWeights scale notes.
        graft.text.TrainingMix.dsirWeights(
          tbl(s, dir, "documents"), "text", col("lang") === "en",
          buckets = 4096, nParts = graft.text.TrainingMix.defaultShards(s)),
      Some(s"""WITH $DsirScoreSql
              |SELECT doc_id, n_tokens, logw,
              |  CAST(row_number() OVER (ORDER BY logw DESC, doc_id ASC) AS INT) AS rank
              |FROM sc""".stripMargin),
      doc = "DSIR importance weights (Xie et al. 2023): hashed-unigram " +
        "log-likelihood ratio of a target slice vs the raw corpus, " +
        "deterministic top-rank selection - the data-selection stage " +
        "between quality filtering and sampling"),

    "sample_gumbel_topk" -> QueryDef(
      (s, dir) => {
        // DSIR's resampling step proper: top-k of logw/T + Gumbel noise
        // == sampling w/o replacement proportional to exp(logw/T); the
        // noise hashes off the doc id, so the draw re-materializes
        // identically anywhere. The UNRANKED scoring stage is this key's
        // INPUT FIXTURE (scoring is `sample_dsir_weights`' operator, not
        // this one's), so it materializes once per session as a warm
        // parquet — doubles round-trip parquet bit-exactly, so the
        // resample is bit-identical to scoring inline — and the bench
        // measures the resampling: map-side keys + distributed
        // TakeOrdered over the (doc_id, logw) score table.
        val scores = MetaQueries.warmBaseDir("dsir_scores", dir) { b =>
          graft.text.TrainingMix.dsirScores(
            tbl(s, dir, "documents"), "text", col("lang") === "en",
            buckets = 4096).write.parquet(s"$b/scores")
        } + "/scores"
        graft.text.TrainingMix.gumbelTopK(s.read.parquet(scores),
          temperature = 1.0, k = 50)
      },
      Some(s"""WITH $DsirScoreSql,
              |keyed AS (
              |  SELECT doc_id, logw,
              |    (round(logw / 1.0 - ln(-ln(
              |      (CAST(CONCAT('0x', substr(md5('gumbel:' || doc_id), 1, 15)) AS BIGINT)
              |        % 1000000 + 0.5) / 1000000.0)), 4) + 0.0) AS key
              |  FROM sc),
              |top AS (SELECT doc_id, logw, key FROM keyed
              |  ORDER BY key DESC, doc_id ASC LIMIT 50)
              |SELECT doc_id, logw, key,
              |  CAST(row_number() OVER (ORDER BY key DESC, doc_id ASC) AS INT) AS rank
              |FROM top""".stripMargin),
      doc = "Gumbel-top-k resampling over DSIR weights: deterministic " +
        "hash-derived noise makes the without-replacement draw " +
        "reproducible across runs, engines, and partitionings"),

    "corpus_zipf_fit" -> QueryDef(
      (s, dir) =>
        // whole-corpus Zipf health gauge: ln(freq)-vs-ln(rank) slope
        // over the top-1000 tokens — see TextAnalysis.zipfFit for the
        // bounded-fit-frame and exact-decimal-sum scale notes.
        TextAnalysis.zipfFit(tbl(s, dir, "documents"), "text", topN = 1000),
      Some("""WITH t AS (
             |  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
             |  FROM documents),
             |f AS (SELECT tok, count(*) AS c FROM t GROUP BY 1),
             |top AS (SELECT c, row_number() OVER (ORDER BY c DESC, tok ASC) AS r
             |  FROM f ORDER BY c DESC, tok ASC LIMIT 1000),
             |p AS (SELECT CAST(round(ln(r), 10) AS DECIMAL(18,10)) AS x,
             |             CAST(round(ln(c), 10) AS DECIMAL(18,10)) AS y FROM top),
             |s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
             |             CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
             |             CAST(sum(x*x) AS DOUBLE) AS sxx, CAST(sum(x*y) AS DOUBLE) AS sxy
             |      FROM p)
             |SELECT CAST(n AS BIGINT) AS n_fit,
             |  (round((n*sxy - sx*sy) / (n*sxx - sx*sx), 4) + 0.0) AS zipf_slope,
             |  (round((sy - ((n*sxy - sx*sy) / (n*sxx - sx*sx)) * sx) / n, 4) + 0.0) AS intercept
             |FROM s""".stripMargin),
      doc = "Zipf-law fit of the token frequency distribution (slope of " +
        "ln-freq over ln-rank, top-1000 tokens): the one-number corpus " +
        "health gauge — natural text sits near -1, boilerplate flattens it"),

    "text_batch_bucketing" -> QueryDef(
      (s, dir) => {
        // LENGTH-GROUPED BATCHING (sorted batching): rank the corpus by
        // token length desc, cut into fixed-size batches of B=32, and
        // report each batch's padding fraction — the padding a trainer
        // pays when it pads every sequence in a batch to the batch max.
        // Length-sorted batches put like-sized docs together, so the
        // metric is the evidence that bucketing works (near-0 padding
        // except at length cliffs). The global rank is the two-pass
        // DistributedRank: a keyless row_number window would pull the
        // whole corpus onto one task.
        val docs = tbl(s, dir, "documents")
          .select(col("doc_id"),
            size(TextAnalysis.tokens(col("text"))).cast("long").as("n"))
        val b = 32
        graft.plans.DistributedRank.withGlobalRank(
            docs, Seq.empty, Seq(col("n").desc, col("doc_id").asc),
            nParts = graft.text.TrainingMix.defaultShards(s))
          .withColumn("batch_id", ((col("_rk") - 1) / b).cast("long"))
          .groupBy(col("batch_id"))
          .agg(count(lit(1)).as("n_docs"), max(col("n")).as("max_tokens"),
            sum(col("n")).as("sum_tokens"))
          .select(col("batch_id"), col("n_docs"), col("max_tokens"),
            col("sum_tokens"),
            (round(lit(1.0) - col("sum_tokens") /
              (col("max_tokens") * col("n_docs").cast("double")), 6) + lit(0.0))
              .as("padding_frac"))
      },
      Some("""WITH t AS (SELECT doc_id,
             |    CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
             |  FROM documents),
             |r AS (SELECT doc_id, n,
             |    row_number() OVER (ORDER BY n DESC, doc_id) - 1 AS rk FROM t)
             |SELECT CAST(rk // 32 AS BIGINT) AS batch_id,
             |  count(*) AS n_docs,
             |  max(n) AS max_tokens,
             |  CAST(sum(n) AS BIGINT) AS sum_tokens,
             |  (round(1.0 - CAST(sum(n) AS BIGINT) / (max(n) * CAST(count(*) AS DOUBLE)), 6) + 0.0) AS padding_frac
             |FROM r GROUP BY 1""".stripMargin),
      doc = "length-grouped (sorted) batching: global length rank cut into " +
        "fixed batches with per-batch padding fraction — the pad-to-max " +
        "waste metric bucketed batching exists to minimize; distributed " +
        "rank, no single-task window"),

    "corpus_ppl_buckets" -> QueryDef(
      (s, dir) =>
        // CCNet's head/middle/tail split: per-language perplexity
        // terciles under the corpus's own unigram LM; integer rank
        // math for the cut, two-pass distributed rank for the
        // per-language ordering — see TextAnalysis.pplBuckets.
        TextAnalysis.pplBuckets(tbl(s, dir, "documents"), "text",
          nParts = graft.text.TrainingMix.defaultShards(s)),
      Some("""WITH t AS (
             |  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS tok
             |  FROM documents),
             |f AS (SELECT tok, count(*) AS c FROM t GROUP BY 1),
             |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM f),
             |sc AS (SELECT doc_id, (round(-avg(ln(f.c / tot.n)), 4) + 0.0) AS nll
             |  FROM t JOIN f USING (tok) CROSS JOIN tot GROUP BY 1),
             |j AS (SELECT d.doc_id, coalesce(d.lang, '<none>') AS lang, sc.nll
             |  FROM documents d JOIN sc USING (doc_id)),
             |r AS (SELECT doc_id, lang, nll,
             |    row_number() OVER (PARTITION BY lang ORDER BY nll, doc_id) AS rk,
             |    count(*) OVER (PARTITION BY lang) AS n
             |  FROM j)
             |SELECT doc_id, lang, nll,
             |  CASE WHEN rk * 3 <= n THEN 'head'
             |       WHEN rk * 3 <= n * 2 THEN 'middle' ELSE 'tail' END AS bucket
             |FROM r""".stripMargin),
      doc = "CCNet head/middle/tail buckets (Wenzek et al. 2020): " +
        "per-language perplexity terciles under the corpus's own unigram " +
        "LM — the fluency-sliced sampling stage; distributed rank, " +
        "integer-exact cuts"),

    "corpus_length_hist" -> QueryDef(
      (s, dir) => {
        // per-source token-length histogram on log2 buckets — the
        // sequence-length distribution a packing/batching stage is tuned
        // against. Bucket = floor(log2(n_tokens)) computed as
        // length(bin(n)) - 1: pure integer/string math, so there is no
        // floating log2 to knife-edge on exact powers of two in either
        // engine. Two tiny aggregations; the share join is on the
        // ~|sources| row totals table.
        val docs = tbl(s, dir, "documents")
        val h = docs.select(col("source"),
            (length(bin(size(TextAnalysis.tokens(col("text"))))) - 1)
              .cast("int").as("bucket"))
          .groupBy(col("source"), col("bucket"))
          .agg(count(lit(1)).as("n_docs"))
        val totals = h.groupBy(col("source")).agg(sum(col("n_docs")).as("_t"))
        h.join(broadcast(totals), "source")
          .select(col("source"), col("bucket"), col("n_docs"),
            round(col("n_docs").cast("double") / col("_t"), 4).as("share"))
      },
      Some("""WITH d AS (SELECT source,
             |  CAST(length(bin(len(regexp_split_to_array(trim(text), '\s+')))) - 1 AS INT) AS bucket
             |  FROM documents),
             |h AS (SELECT source, bucket, count(*) AS n_docs FROM d GROUP BY 1, 2),
             |t AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS total FROM h GROUP BY 1)
             |SELECT h.source, h.bucket, h.n_docs,
             |  round(h.n_docs / CAST(t.total AS DOUBLE), 4) AS share
             |FROM h JOIN t USING (source)""".stripMargin),
      doc = "per-source log2 token-length histogram (integer bit-length buckets, " +
        "no float log2) — the packing/batching tuning signal"),

    "corpus_stats" -> QueryDef(
      (s, dir) => {
        // training-mix composition report: docs / tokens / quality mass
        // per (source, predicted language) — ONE scan, narrow derivations,
        // one aggregation. Quality mass goes through DECIMAL so the sum
        // is exact (a double sum is partition-order-dependent and would
        // flake against the oracle's sequential fold).
        val docs = tbl(s, dir, "documents")
        docs.select(
            col("source"),
            TextAnalysis.predictedLangCol(col("text")).as("predicted_lang"),
            size(TextAnalysis.wordTokens(col("text"))).as("n_tokens"),
            TextAnalysis.qualityScoreCol(col("text")).cast("decimal(9,6)").as("q"))
          .groupBy(col("source"), col("predicted_lang"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens")).as("total_tokens"),
            sum(col("q")).cast("double").as("total_quality"))
      },
      Some("""WITH lt AS (
             |  SELECT source, regexp_split_to_array(trim(lower(text)), '\s+') AS toks,
             |    regexp_split_to_array(trim(text), '\s+') AS rtoks,
             |    len(regexp_extract_all(text, '[A-Za-z0-9]+')) AS n_tokens,
             |    length(text) AS n_chars,
             |    length(text) - length(regexp_replace(text, '[!"#$%&''()*+,\-./:;<=>?@\[\\\]^_`{|}~]', '', 'g')) AS punct
             |  FROM documents),
             |ls AS (SELECT source, n_tokens,
             |  len(list_filter(toks, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS s_en,
             |  len(list_filter(toks, x -> list_contains(['el','la','de','que','y','en','un'], x))) AS s_es,
             |  len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','ein','zu'], x))) AS s_de,
             |  len(list_filter(toks, x -> list_contains(['le','la','de','et','un','est','que'], x))) AS s_fr,
             |  len(list_filter(toks, x -> list_contains(['de','shi','le','zai','you','wo','ta'], x))) AS s_zh,
             |  round(CAST(
             |    (CASE WHEN len(rtoks) BETWEEN 10 AND 100000 THEN 0.4 ELSE 0.0 END) +
             |    (CASE WHEN round(CAST(len(list_filter(rtoks, x -> list_contains(['the','a','an','of','and','or','to','in','on','is','are'], x))) AS DOUBLE) / len(rtoks), 6) > 0.05 THEN 0.3 ELSE 0.0 END) +
             |    (CASE WHEN round(CAST(punct AS DOUBLE) / n_chars, 6) < 0.2 THEN 0.3 ELSE 0.0 END) AS DOUBLE), 6) AS q
             |  FROM lt),
             |p AS (SELECT source, n_tokens, CAST(q AS DECIMAL(9,6)) AS q,
             |  CASE WHEN s_en = 0 AND s_es = 0 AND s_de = 0 AND s_fr = 0 AND s_zh = 0 THEN 'und'
             |       WHEN s_en >= s_es AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_zh THEN 'en'
             |       WHEN s_es >= s_de AND s_es >= s_fr AND s_es >= s_zh THEN 'es'
             |       WHEN s_de >= s_fr AND s_de >= s_zh THEN 'de'
             |       WHEN s_fr >= s_zh THEN 'fr'
             |       ELSE 'zh' END AS predicted_lang
             |  FROM ls)
             |SELECT source, predicted_lang, count(*) AS n_docs,
             |  CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
             |  CAST(sum(q) AS DOUBLE) AS total_quality
             |FROM p GROUP BY source, predicted_lang""".stripMargin),
      doc = "per-(source, language) corpus composition: docs, tokens, exact quality mass"),

    "text_fingerprint" -> QueryDef(
      // ENGINE-DEFAULT mode: xxhash64 content key + min-xxhash64 shingle
      // (same structure, no digest/hex/conv chain). The VALUES can't be
      // DuckDB-replicated, but the fingerprint's dedup power is its
      // EQUALITY PARTITION — and that is oracle-checkable: grouping docs
      // by the engine content key must induce exactly the partition
      // DuckDB gets grouping by md5(text) (same representative, same
      // class size — a merge OR a split on either side reds the row),
      // and within a content class the min-shingle must be constant
      // (identical text ⇒ identical shingle set ⇒ identical min). The
      // bit-exact value oracle lives on the md5 variant below.
      (s, dir) => {
        // non-null texts only, both sides: xxhash64 collapses NULL and
        // "" onto the seed while md5(NULL) is NULL (the oracle's join
        // would silently drop the row) — the operator's own null path
        // (left_outer, null min-shingle) is spec'd on the operator
        val fp = TextAnalysis.fingerprintFast(
          tbl(s, dir, "documents").filter(col("text").isNotNull), "text", k = 8)
        // class stats via a window over content_hash, NOT a
        // groupBy-and-join-back: the join-back shape evaluates the fp
        // lineage twice, and at corpus scale the min-shingle explode IS
        // the cost — one pass + one hash shuffle instead. The window
        // partitions are duplicate classes (bounded by dup multiplicity,
        // never corpus-sized), so no single-task funnel.
        val w = org.apache.spark.sql.expressions.Window.partitionBy(col("content_hash"))
        fp.select(col("doc_id"),
          min(col("doc_id")).over(w).as("content_rep"),
          count(lit(1)).over(w).as("n_same_content"),
          (size(collect_set(col("min_shingle_hash")).over(w)) === 1)
            .as("minsh_consistent"))
      },
      Some("""WITH nn AS (SELECT * FROM documents WHERE text IS NOT NULL),
             |g AS (
             |  SELECT md5(text) AS h, min(doc_id) AS content_rep,
             |    CAST(count(*) AS BIGINT) AS n_same_content
             |  FROM nn GROUP BY 1)
             |SELECT d.doc_id, g.content_rep, g.n_same_content,
             |  TRUE AS minsh_consistent
             |FROM nn d JOIN g ON md5(d.text) = g.h""".stripMargin),
      doc = "content hash + winnowing-style min-shingle rolling fingerprint, " +
        "engine default (xxhash64). Oracle verifies the equality-class " +
        "invariants: the content-key partition matches md5(text)'s exactly " +
        "and min-shingles are constant within a class; bit-exact values on " +
        "text_fingerprint_md5"),

    "text_fingerprint_md5" -> QueryDef(
      (s, dir) => TextAnalysis.fingerprint(tbl(s, dir, "documents"), "text", k = 8),
      Some("""SELECT doc_id, md5(text) AS content_md5,
             |  list_min(list_transform(
             |    range(1, greatest(length(text) - 7, 1) + 1),
             |    i -> CAST(CONCAT('0x', substr(md5(substr(text, CAST(i AS INT), 8)), 1, 15)) AS BIGINT)
             |  )) AS min_shingle_hash
             |FROM documents""".stripMargin),
      doc = "content hash + min-shingle rolling fingerprint, md5 ORACLE variant " +
        "(DuckDB-replicable bit-exact); the engine default is text_fingerprint")
  )
}
