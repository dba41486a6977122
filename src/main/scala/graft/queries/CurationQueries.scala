package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.Tables
import graft.ops.KeyOps
import graft.text.{Curation, TextAnalysis}

/** Corpus-management queries over `documents`: reproducible splits,
  * stratified sampling, repetition filtering, mixture reweighting.
  * All per-row map work plus tiny aggregations — the shapes that stay
  * flat at 100 TB (no corpus-keyed shuffle anywhere except the
  * final per-group counts).
  *
  * The deterministic hash both engines compute identically:
  * ((id % 999999937) * 2654435761) % buckets — see
  * [[graft.text.Curation]] for why engine hash builtins and rand()
  * are both wrong here.
  */
object CurationQueries {

  private val hashSql = "((doc_id % 999999937) * 2654435761)"
  /** Sign-safe mirror of [[graft.text.Curation.priorityMicros]]'s pmod
    * mixing: DuckDB's `%` follows the dividend's sign, so the signed
    * [[hashSql]] only coincides with the engine for nonnegative ids.
    * Used where the oracle must express the any-sign contract, not
    * merely agree with it on the testdata domain.
    */
  private val pmodHashSql =
    "(((doc_id % 999999937 + 999999937) % 999999937) * 2654435761)"

  /** Reproducible 90/5/5 train/val/test split, reported as per-split
    * document and character totals.
    */
  val qSplitAssign = Q(
    "q_split_assign",
    (s, d) => Tables.documents(s, d)
      .select(col("n_chars"),
        Curation.splitAssign(col("doc_id"), 900, 50).as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
      .orderBy(col("split")),
    Some(s"""
      WITH h AS (
        SELECT n_chars, $hashSql % 1000 AS hb FROM documents)
      SELECT CASE WHEN hb < 900 THEN 'train'
                  WHEN hb < 950 THEN 'val'
                  ELSE 'test' END AS split,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars_total
      FROM h GROUP BY 1 ORDER BY 1"""))

  /** Stratified deterministic downsample: keep 5% of the dominant
    * language, 50% of everything else — the language-rebalancing move.
    * Shuffle-free: the keep decision is a per-row predicate, no
    * window, no per-stratum count pass.
    */
  val qStratifiedSample = Q(
    "q_stratified_sample",
    (s, d) => Tables.documents(s, d)
      .filter(Curation.sampledAt(col("doc_id"),
        when(col("lang") === "en", lit(0.05)).otherwise(lit(0.5))))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")),
    Some(s"""
      SELECT doc_id, lang FROM documents
      WHERE $hashSql % 1000000
            < (CASE WHEN lang = 'en' THEN 0.05 ELSE 0.5 END) * 1000000
      ORDER BY doc_id"""))

  /** Gopher-style repetition signal: per document, the fraction of
    * word 2-gram occurrences that are duplicates, plus the boolean
    * filter verdict at the 0.2 threshold.
    */
  val qNgramRepetition = Q(
    "q_ngram_repetition",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"),
        Curation.ngramCount(col("text"), 2).as("n_2grams"),
        Curation.duplicateNgramFraction(col("text"), 2).as("dup_frac"))
      .withColumn("repetitive", col("dup_frac") > 0.2)
      .orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text),'\s+'), w -> len(w)>0) AS toks
        FROM documents),
      g AS (
        SELECT doc_id,
               CASE WHEN len(toks) < 2
                    THEN [coalesce(array_to_string(toks, ' '), '')]
                    ELSE list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i+1])
               END AS grams
        FROM t)
      SELECT doc_id,
             CAST(len(grams) AS INTEGER) AS n_2grams,
             floor((2.0 * (len(grams) - len(list_distinct(grams))) * 1000000
                    + len(grams)) / (2.0 * len(grams))) / 1000000 AS dup_frac,
             floor((2.0 * (len(grams) - len(list_distinct(grams))) * 1000000
                    + len(grams)) / (2.0 * len(grams))) / 1000000 > 0.2 AS repetitive
      FROM g ORDER BY doc_id"""))

  /** Mixture reweighting: per source, its corpus share and the
    * uniform-target sampling weight (target share / actual share).
    * Per-source counts are the only shuffle; the totals row is a
    * broadcast. weight * n_docs = total/n_sources for every source,
    * i.e. applying the weights yields the uniform mix.
    */
  val qSourceMix = Q(
    "q_source_mix",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val totals = counts.agg(
        sum(col("n_docs")).as("total"), count(lit(1)).as("n_sources"))
      counts.crossJoin(broadcast(totals))
        .select(col("source"), col("n_docs"),
          graft.functions.DetMath.ratio6(col("n_docs"), col("total")).as("frac"),
          graft.functions.DetMath.ratio6(col("total"),
            col("n_sources") * col("n_docs")).as("weight"))
        .orderBy(col("source"))
    },
    Some(s"""
      WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
                   count(*) AS n_sources FROM c)
      SELECT source, n_docs,
             ${graft.functions.DetMath.ratio6Sql("n_docs", "total")} AS frac,
             ${graft.functions.DetMath.ratio6Sql("total", "n_sources * n_docs")} AS weight
      FROM c, t ORDER BY source"""))

  /** Temperature-weighted mixture (T = 0.5): per-source sampling share
    * ∝ n_docs^T — the standard move for upweighting low-resource
    * sources (multilingual/multi-domain training mixes) without going
    * fully uniform. Cross-engine determinism: sqrt is IEEE-exact in
    * both engines, and the normalizer Σ√n is summed as a SORTED fold
    * (sort_array + aggregate here, list_sort + list_aggregate in
    * DuckDB), so partial-agg order can never flip a bit; the final
    * share/weight are organic doubles where round(,6) is safe. The
    * per-source counts are the only shuffle — the normalizer row is a
    * broadcast, same shape as q_source_mix.
    */
  val qSourceMixTemperature = Q(
    "q_source_mix_temperature",
    (s, d) => {
      val counts = Tables.documents(s, d)
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
      val totals = counts.agg(
        sum(col("n_docs")).as("total"),
        aggregate(sort_array(collect_list(sqrt(col("n_docs")))), lit(0.0),
          (acc, x) => acc + x).as("z"))
      counts.crossJoin(broadcast(totals))
        .select(col("source"), col("n_docs"),
          round(sqrt(col("n_docs")) / col("z"), 6).as("share_t"),
          round(col("total") / (col("z") * sqrt(col("n_docs"))), 6).as("weight_t"))
        .orderBy(col("source"))
    },
    Some("""
      WITH c AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
      t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total,
                   list_aggregate(list_sort(list(sqrt(n_docs))), 'sum') AS z FROM c)
      SELECT source, n_docs,
             round(sqrt(n_docs) / z, 6) AS share_t,
             round(total / (z * sqrt(n_docs)), 6) AS weight_t
      FROM c, t ORDER BY source"""))

  /** Exact-k quota sample per stratum (20 docs per language),
    * deterministic: docs rank by the Knuth scramble of their id, the
    * TopKAggregator keeps each stratum's k smallest — O(strata·k)
    * through the shuffle, never a per-stratum sort (the window
    * rendition sorts the dominant language's whole corpus in one
    * task). Complement of [[qStratifiedSample]]'s rate-based sampler:
    * quotas when the downstream needs exact counts, rates when it
    * needs shuffle-free throughput.
    */
  val qQuotaSample = Q(
    "q_quota_sample",
    (s, d) => {
      val topk = graft.functions.TopKAggregator.topk(20)
      Tables.documents(s, d)
        .select(col("lang"), col("doc_id"),
          // aggregator keeps highest scores; negate the scramble so
          // "smallest hash wins" — ties break toward the lower doc_id
          (-Curation.bucketHash(col("doc_id"), 1000000).cast("double")).as("score"))
        .groupBy(col("lang"))
        .agg(topk(col("score"), col("doc_id")).as("top"))
        .select(col("lang"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
          col("t.id").as("doc_id"))
        .orderBy(col("lang"), col("rank"))
    },
    Some(s"""
      SELECT lang, CAST(rn AS INTEGER) AS rank, doc_id FROM (
        SELECT lang, doc_id,
               row_number() OVER (PARTITION BY lang
                 ORDER BY $hashSql % 1000000, doc_id) AS rn
        FROM documents)
      WHERE rn <= 20 ORDER BY lang, rank"""))

  /** The full preprocessing pipeline as ONE composition — the actual
    * use case every individual operator exists for:
    * quality/language curation → exact dedup (canonical doc per
    * fingerprint) → reproducible split assignment → per-split account.
    * Each stage is an operator already oracle-proven in isolation;
    * this query proves they compose (filters push through, the dedup
    * group-by keys on the fingerprint of the CURATED set, the split is
    * a pure function of the surviving ids).
    */
  val qPipelineE2e = Q(
    "q_pipeline_e2e",
    (s, d) => {
      import graft.text.TextAnalysis
      val docs = Tables.documents(s, d)
      val curated = docs
        .select(col("doc_id"), col("n_chars"), col("text"),
          explode(array(TextAnalysis.docMetrics(col("text")))).as("m"))
        .filter(round(col("m.quality"), 6) >= 0.5 && col("m.pred_lang") === "en")
      val canonical = curated
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
        .withColumn("keep",
          col("doc_id") === min(col("doc_id"))
            .over(org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
        .filter(col("keep"))
      canonical
        .select(col("n_chars"),
          Curation.splitAssign(col("doc_id"), 900, 50).as("split"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("n_chars_total"))
        .orderBy(col("split"))
    },
    Some(s"""
      WITH m AS (
        SELECT doc_id, n_chars, text,
               CAST(len(list_filter(string_split_regex(text,'\\s+'), w -> len(w)>0)) AS DOUBLE) AS n_tok,
               CAST(length(text) AS DOUBLE) AS nc,
               CAST(len(regexp_extract_all(text, '[.,!?;:''"()-]')) AS DOUBLE) AS n_punct,
               CAST(len(list_filter(string_split_regex(lower(text),'\\s+'), w -> len(w)>0 AND w IN ('the','a','of','and','to','in','is','that'))) AS DOUBLE) AS stop_h,
               len(list_filter(string_split_regex(lower(text),'\\s+'), w -> len(w)>0 AND w IN ('the','a','of','and','to','in','is','that'))) AS en_h,
               len(list_filter(string_split_regex(lower(text),'\\s+'), w -> len(w)>0 AND w IN ('der','die','das','und','ist','nicht','ein','zu'))) AS de_h,
               len(list_filter(string_split_regex(lower(text),'\\s+'), w -> len(w)>0 AND w IN ('el','la','de','y','que','en','un','es'))) AS es_h,
               len(list_filter(string_split_regex(lower(text),'\\s+'), w -> len(w)>0 AND w IN ('le','la','et','les','des','un','une','est'))) AS fr_h,
               regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS cjk
        FROM documents),
      curated AS (
        SELECT doc_id, n_chars, text FROM m
        WHERE round(least(n_tok / 64.0, 1.0) * 0.5
                    + (1.0 - n_punct / greatest(nc, 1.0)) * 0.25
                    + least(stop_h / greatest(n_tok, 1.0) * 4.0, 1.0) * 0.25, 6) >= 0.5
          AND NOT cjk
          AND greatest(en_h, de_h, es_h, fr_h) > 0
          AND en_h = greatest(en_h, de_h, es_h, fr_h)),
      canonical AS (
        SELECT doc_id, n_chars,
               md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp,
               min(doc_id) OVER (PARTITION BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))) AS keeper
        FROM curated)
      SELECT CASE WHEN $hashSql % 1000 < 900 THEN 'train'
                  WHEN $hashSql % 1000 < 950 THEN 'val'
                  ELSE 'test' END AS split,
             count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_chars_total
      FROM canonical WHERE doc_id = keeper
      GROUP BY 1 ORDER BY 1"""),
    headline = true)

  /** Deterministic global training order ("corpus shuffle"): every doc
    * gets a dense 1-based position ordered by the Knuth hash of its id
    * (doc_id tie-break for ids that collide mod the bucket count). The
    * hash decorrelates position from ingest order — the property
    * shuffled training data needs — while staying reproducible across
    * runs, engines, and partitionings, unlike ORDER BY rand().
    *
    * Scale shape: one range-shuffle sort on (h, doc_id) + zipWithIndex
    * (every partition stays parallel; see KeyOps.scalableSurrogateKey) —
    * NOT a global row_number window, which would drag the corpus
    * through one WindowExec partition.
    */
  val qShuffleOrder = Q(
    "q_shuffle_order",
    (s, d) => {
      val hashed = Tables.documents(s, d)
        .select(col("doc_id"), Curation.bucketHash(col("doc_id"), 1000000L).as("h"))
      KeyOps.scalableSurrogateKey(hashed, "position", "h", "doc_id")
        .select(col("doc_id"), col("position"))
        .orderBy(col("position"))
    },
    Some(s"""
      SELECT doc_id,
             row_number() OVER (ORDER BY $hashSql % 1000000, doc_id) AS position
      FROM documents ORDER BY position"""))

  /** Per-epoch training orders (epochs 0 and 1): the q_shuffle_order
    * permutation under [[graft.text.Curation.epochHash]]'s epoch salt —
    * every epoch a different deterministic shuffle, every rerun of an
    * epoch identical. Same scalable shape per epoch (range-sort +
    * zipWithIndex, no global window); the epochs are independent
    * sorts, so a loader materializes only the epoch it needs.
    */
  val qEpochOrders = Q(
    "q_epoch_orders",
    (s, d) => {
      val epochs = (0 until 2).map { e =>
        val hashed = Tables.documents(s, d)
          .select(col("doc_id"),
            Curation.epochHash(col("doc_id"), e, 1000000L).as("h"))
        KeyOps.scalableSurrogateKey(hashed, "position", "h", "doc_id")
          .select(col("doc_id"), lit(e).as("epoch"), col("position"))
      }
      epochs.reduce(_.unionByName(_)).orderBy(col("epoch"), col("position"))
    },
    Some("""
      WITH e0 AS (
        SELECT doc_id, 0 AS epoch,
               row_number() OVER (ORDER BY ((doc_id % 999999937) * 2654435761) % 1000000, doc_id) AS position
        FROM documents),
      e1 AS (
        SELECT doc_id, 1 AS epoch,
               row_number() OVER (ORDER BY (((doc_id + 1000003) % 999999937) * 2654435761) % 1000000, doc_id) AS position
        FROM documents)
      SELECT * FROM e0 UNION ALL SELECT * FROM e1 ORDER BY epoch, position"""))

  /** Shard manifest over the deterministic training order: 64-row
    * shards, each row the shard's row count and inclusive position
    * range — the index a sequential training reader uses to address
    * shard files without opening them. Shard id is pure arithmetic on
    * the position ([[graft.ops.Sharding.shardId]]), so the manifest is
    * as reproducible as the order; the FS-level export of the same
    * layout is [[graft.ops.Sharding.exportShards]] (spec-tested —
    * file layout is not oracle-expressible).
    */
  val qShardManifest = Q(
    "q_shard_manifest",
    (s, d) => {
      val hashed = Tables.documents(s, d)
        .select(col("doc_id"), Curation.bucketHash(col("doc_id"), 1000000L).as("h"))
      KeyOps.scalableSurrogateKey(hashed, "position", "h", "doc_id")
        .withColumn("shard", graft.ops.Sharding.shardId(col("position"), 64L))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_rows"),
          min(col("position")).as("first_pos"),
          max(col("position")).as("last_pos"))
        .orderBy(col("shard"))
    },
    Some(s"""
      WITH p AS (
        SELECT doc_id,
               row_number() OVER (ORDER BY $hashSql % 1000000, doc_id) AS position
        FROM documents)
      SELECT CAST(floor((position - 1) / 64.0) AS BIGINT) AS shard,
             count(*) AS n_rows,
             min(position) AS first_pos, max(position) AS last_pos
      FROM p GROUP BY 1 ORDER BY 1"""))

  /** Token-budget corpus selection: take the highest-quality documents
    * until an 8000-token budget is filled — "best N tokens", the
    * selection move data-constrained training runs make.
    *
    * The naive rendition is a prefix over a GLOBAL quality sort
    * (cumulative-sum window over the whole corpus — one WindowExec
    * partition, a scale-killer). Instead: quality is bucketed into
    * ≤1001 integer bands (q_micros DIV 1000); per-bucket token totals
    * (a ≤1001-row aggregate — metadata, collected driver-side like the
    * k-means centroids) give each bucket its tokens-before prefix; the
    * in-bucket cumulative sum is a window PARTITIONED by bucket, so no
    * partition sees more than one band's docs. Global prefix = bucket
    * prefix + in-bucket prefix, exactly — because the selection order
    * (bucket desc, q_micros desc, doc_id) equals the total order
    * (q_micros desc, doc_id): the bucket is monotone in q_micros.
    * The oracle computes the same prefix with one flat window.
    */
  val qBudgetSelect = Q(
    "q_budget_select",
    (s, d) => {
      val m = Tables.documents(s, d).select(
        col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tok"),
        round(round(TextAnalysis.qualityScore(col("text")), 6) * 1000000, 0)
          .cast(LongType).as("q_micros"))
      Curation.budgetSelect(m, "doc_id", "n_tok", "q_micros", budget = 8000L)
        .select(col("doc_id"), col("n_tok"), col("q_micros"), col("cum_tok"))
        .orderBy(col("doc_id"))
    },
    Some("""
      WITH m AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text,'\s+'), w -> len(w)>0)) AS INTEGER) AS n_tok,
               CAST(round(round(
                 least(CAST(len(list_filter(string_split_regex(text,'\s+'), w -> len(w)>0)) AS DOUBLE) / 64.0, 1.0) * 0.5
                 + (1.0 - CAST(len(regexp_extract_all(text, '[.,!?;:''"()-]')) AS DOUBLE)
                          / greatest(CAST(length(text) AS DOUBLE), 1.0)) * 0.25
                 + least(CAST(len(list_filter(string_split_regex(lower(text),'\s+'), w -> len(w)>0 AND w IN ('the','a','of','and','to','in','is','that'))) AS DOUBLE)
                         / greatest(CAST(len(list_filter(string_split_regex(text,'\s+'), w -> len(w)>0)) AS DOUBLE), 1.0) * 4.0, 1.0) * 0.25,
                 6) * 1000000, 0) AS BIGINT) AS q_micros
        FROM documents),
      sel AS (
        SELECT doc_id, n_tok, q_micros,
               CAST(sum(n_tok) OVER (ORDER BY q_micros DESC, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
        FROM m)
      SELECT doc_id, n_tok, q_micros, cum_tok
      FROM sel WHERE cum_tok <= 8000 ORDER BY doc_id"""),
    // headline: band-partitioned cumulative sum + driver-side band
    // histogram — the scalable global-prefix-sum shape, unlike any
    // other benched window
    headline = true)

  /** GPT-style sequence packing manifest: the corpus token stream in
    * doc_id order, chopped into 512-token training sequences; one row
    * per document giving its (seq_first, seq_last, seq_offset) span.
    * Scalable prefix-sum shape (band histogram + band-partitioned
    * window — see [[graft.text.Curation.packSequences]]); the oracle
    * computes the same stream positions with one flat window.
    */
  val qPackSequences = Q(
    "q_pack_sequences",
    (s, d) => Curation.packSequences(
        Tables.documents(s, d).select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tok")),
        "doc_id", "n_tok", seqLen = 512L, bucketWidth = 500L)
      .orderBy(col("doc_id")),
    Some("""
      WITH t AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text,'\s+'), w -> len(w)>0)) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT doc_id, n_tok,
               sum(n_tok) OVER (ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM t WHERE n_tok > 0)
      SELECT doc_id, n_tok AS tokens,
             CAST((cum - n_tok) // 512 AS BIGINT) AS seq_first,
             CAST((cum - 1) // 512 AS BIGINT) AS seq_last,
             CAST((cum - n_tok) % 512 AS BIGINT) AS seq_offset
      FROM c ORDER BY doc_id"""),
    headline = true)

  /** Length-bucketed inference batching manifest — the serving-side
    * complement of q_pack_sequences: each document joins a (16-token
    * padding band, ≤ 8-doc batch) with its padding waste reported,
    * the assignment an embedding/scoring pass over the corpus uses to
    * avoid paying the longest document's padding in every batch. The
    * within-band ordinal is [[graft.ops.Ranking.rankByGroup]]'s band
    * decomposition — corpora are length-skewed, so a flat per-band
    * row_number is a single-task sort of the dominant band at scale;
    * the oracle computes the identical manifest with the flat window.
    */
  val qInferBatches = Q(
    "q_infer_batches",
    (s, d) => Curation.batchManifest(
        Tables.documents(s, d)
          .select(col("doc_id"), TextAnalysis.tokenCount(col("text")).as("n_tok")),
        "doc_id", "n_tok", padQuantum = 16L, maxBatchRows = 8L)
      .orderBy(col("doc_id")),
    Some("""
      WITH m AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text,'\s+'), w -> len(w)>0)) AS BIGINT) AS n_tokens
        FROM documents),
      f AS (SELECT doc_id, n_tokens, (n_tokens + 15) // 16 AS len_band
            FROM m WHERE n_tokens > 0),
      r AS (SELECT doc_id, n_tokens, len_band,
                   row_number() OVER (PARTITION BY len_band ORDER BY doc_id) AS rn
            FROM f)
      SELECT doc_id, n_tokens, CAST(len_band AS BIGINT) AS len_band,
             CAST((rn - 1) // 8 AS BIGINT) AS batch_idx,
             CAST(len_band * 16 AS BIGINT) AS padded_len,
             CAST(len_band * 16 - n_tokens AS BIGINT) AS waste
      FROM r ORDER BY doc_id"""))

  /** Curriculum training order: documents sorted easy→hard by a
    * difficulty band (token-count bucket, width 50, capped at band 5)
    * with a deterministic salted shuffle WITHIN each band — the
    * curriculum-learning loader contract (short/simple samples first,
    * but no systematic ordering inside a difficulty level that the
    * model could latch onto).
    *
    * Scale shape: one composite range-sort (band, salt, doc_id)
    * through [[graft.ops.KeyOps.scalableSurrogateKey]] — range
    * partitioning + per-partition zipWithIndex, the same no-global-
    * window machinery as q_shuffle_order/q_epoch_orders, so the
    * position assignment is embarrassingly parallel at any corpus
    * size. Null-text docs are excluded on both engines (a curriculum
    * over undecodable documents is meaningless).
    */
  val qCurriculumOrder = Q(
    "q_curriculum_order",
    (s, d) => {
      val banded = Tables.documents(s, d)
        .where(col("text").isNotNull)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("nt"))
        .withColumn("band",
          least(expr("nt div 50"), lit(5)).cast("int"))
        .withColumn("h", Curation.bucketHash(col("doc_id"), 1000000L))
      KeyOps.scalableSurrogateKey(banded, "curriculum_pos", "band", "h", "doc_id")
        .select(col("doc_id"), col("band"), col("curriculum_pos"))
        .orderBy(col("curriculum_pos"))
    },
    Some(s"""
      WITH banded AS (
        SELECT doc_id,
               CAST(least(len(list_filter(string_split_regex(text, '\\s+'),
                                          w -> len(w) > 0)) // 50, 5) AS INT) AS band
        FROM documents WHERE text IS NOT NULL)
      SELECT doc_id, band,
             row_number() OVER (ORDER BY band, $hashSql % 1000000, doc_id)
               AS curriculum_pos
      FROM banded ORDER BY curriculum_pos"""))

  /** Weight-proportional EXACT-k corpus sample via priority sampling
    * (Duffield, Lund & Thorup, "Priority sampling for estimation of
    * arbitrary subset sums", JACM 2007): each doc gets priority
    * w/u for a uniform u, the k largest priorities are the sample —
    * inclusion probability ∝ weight (here n_chars: a
    * proportional-to-size sample for byte-budgeted downstream stages),
    * yet the pass is a pure map + global top-k. Unlike the per-row
    * Bernoulli samplers (q_stratified_sample, q_weighted_sample) the
    * output size is EXACTLY k, not merely k in expectation — the
    * contract a fixed eval-set builder needs.
    *
    * Determinism: u is the Knuth bucket hash in [1, 1e6] (never 0),
    * priority an exact BIGINT w·1e6 div u — both engines compute the
    * identical integer, every rerun/repartition picks the identical k
    * docs. Plan shape: TakeOrderedAndProject — per-partition top-k, a
    * k-row merge on the driver, NO global sort, no corpus shuffle.
    */
  val qPrioritySample = Q(
    "q_priority_sample",
    (s, d) => Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        Curation.priorityMicros("doc_id", "n_chars").as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(100),
    Some(s"""
      WITH p AS (
        SELECT doc_id, n_chars,
               CASE WHEN n_chars >= 0 THEN
                 CAST(n_chars * 1000000 // ($pmodHashSql % 1000000 + 1) AS BIGINT)
               END AS priority
        FROM documents)
      SELECT doc_id, n_chars, priority FROM p
      ORDER BY priority DESC, doc_id LIMIT 100"""))

  /** Iterative proportional fitting (raking, Deming & Stephan 1940) of
    * per-(source, lang) sampling weights so BOTH marginals
    * simultaneously approach uniform — the two-constraint dataset
    * balancing q_source_mix (one margin) can't do: scaling sources
    * alone skews the language mix and vice versa; IPF alternates the
    * two scalings and converges geometrically. Two unrolled rounds
    * (source-fit, lang-fit, source-fit, lang-fit), every step exact
    * integer micros with DECIMAL(38,0)/HUGEINT intermediates and
    * div-rounded per cell in the same order on both engines.
    *
    * Scale shape: ONE corpus-keyed count produces the |S|×|L| cell
    * relation; every subsequent aggregation/join is catalog-sized
    * metadata (broadcast), so rounds cost nothing at any corpus size.
    */
  val qRakingWeights = Q(
    "q_raking_weights",
    (s, d) => {
      import org.apache.spark.sql.DataFrame
      val cells = Tables.documents(s, d)
        .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("n"))
      // one scaling step: weights *= (T / (k · margin_total)) in micros
      def fit(w: DataFrame, margin: String): DataFrame = {
        val mt = w.groupBy(col(margin)).agg(
          sum(expr("n * wm")).as("mtot"))
        val k = mt.count()
        val t = w.agg(sum(expr("n * wm")).as("t"))
        w.join(broadcast(mt), margin).crossJoin(broadcast(t))
          .withColumn("wm", expr(
            s"""CAST((CAST(wm AS DECIMAL(38,0)) *
                      ((CAST(t AS DECIMAL(38,0)) * 1000000) div ($k * CAST(mtot AS DECIMAL(38,0)))))
                     div 1000000 AS BIGINT)"""))
          .select(col("source"), col("lang"), col("n"), col("wm"))
      }
      // cache the cell relation: it is (sources × langs)-sized — a few
      // rows — but every raking round runs a driver-side count() whose
      // lineage otherwise roots in the PARQUET SCAN, so the 4-round
      // unroll re-read documents ~81 times (plan-audited r12; the
      // iterative-operator persist discipline of dedupClusters). With
      // the root cached, each round's arithmetic is bounded by the
      // cell count regardless of corpus size.
      val w0 = graft.ops.Caching.cachedOnce(
        cells.withColumn("wm", lit(1000000L)))
      val fitted = Seq("source", "lang", "source", "lang").foldLeft(w0)(fit)
      fitted
        .select(col("source"), col("lang"), col("n"), col("wm").as("weight_micros"))
        .orderBy(col("source"), col("lang"))
    },
    Some {
      // the same four scalings unrolled; S/L counts are data-derived
      // subqueries so the SQL needs no literals
      def round(prev: String, margin: String, out: String): String =
        s"""$out AS (
             SELECT p.source, p.lang, p.n,
                    CAST((CAST(p.wm AS HUGEINT) *
                          ((CAST(t.t AS HUGEINT) * 1000000)
                           // ((SELECT count(DISTINCT $margin) FROM $prev) * CAST(m.mtot AS HUGEINT))))
                         // 1000000 AS BIGINT) AS wm
             FROM $prev p
             JOIN (SELECT $margin, sum(n * wm) AS mtot FROM $prev GROUP BY 1) m
               ON p.$margin = m.$margin
             CROSS JOIN (SELECT sum(n * wm) AS t FROM $prev) t)"""
      s"""
      WITH cells AS (
        SELECT source, lang, count(*) AS n, CAST(1000000 AS BIGINT) AS wm
        FROM documents GROUP BY 1, 2),
      ${round("cells", "source", "r1")},
      ${round("r1", "lang", "r2")},
      ${round("r2", "source", "r3")},
      ${round("r3", "lang", "r4")}
      SELECT source, lang, n, wm AS weight_micros
      FROM r4 ORDER BY source, lang"""
    })

  /** k-anonymity audit over quasi-identifiers (Sweeney 2002): how many
    * documents sit in a (source, lang, length-band) equivalence class
    * smaller than k — each such row is re-identifiable by its metadata
    * alone, the release-gate complement to content-level PII scrubbing
    * (which would remove identifiers IN the text — this corpus carries
    * none, so that stage has no non-vacuous oracle here; this catches
    * the identifying power OF the metadata). One keyed aggregation; the
    * summary reduces FROM the class relation, so the corpus is scanned
    * once.
    */
  val qKAnonymity = Q(
    "q_k_anonymity",
    (s, d) => {
      val k = 5
      val classes = Tables.documents(s, d)
        .groupBy(col("source"), col("lang"),
          expr("n_chars div 100").as("len_band"))
        .agg(count(lit(1)).as("n"))
      classes.agg(
        count(lit(1)).as("n_classes"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_small_classes"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("n_at_risk_docs"),
        min(col("n")).as("min_class_size"))
        .select(lit(k).cast("int").as("k"), col("n_classes"),
          col("n_small_classes"), col("n_at_risk_docs"), col("min_class_size"))
    },
    Some("""
      WITH c AS (
        SELECT source, lang, n_chars // 100 AS len_band, count(*) AS n
        FROM documents GROUP BY 1, 2, 3)
      SELECT CAST(5 AS INTEGER) AS k,
             CAST(count(*) AS BIGINT) AS n_classes,
             CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
             CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS n_at_risk_docs,
             CAST(min(n) AS BIGINT) AS min_class_size
      FROM c"""))

  /** Per-source distribution drift vs the corpus: total-variation
    * distance between each source's doc-length histogram (256-char
    * bands, capped at 20) and the corpus-wide one — the batch-QA gate
    * that flags a crawl source whose length profile shifted before it
    * contaminates a training mix. TVD over fixed bands is the
    * scale-safe, transcendental-free drift statistic (PSI/KL need
    * ln(), which is not correctly-rounded-portable across engines —
    * see [[graft.functions.DetMath]]); per-band shares are exact
    * integer micros, so the per-source sum is an exact integer and
    * the single final division is deterministic.
    *
    * Scale shape: ONE corpus-keyed shuffle (the (source, band) count);
    * everything after is catalog-sized (sources × 21 bands), with the
    * band marginals re-aggregated from the tiny cell relation and the
    * grand total entering as a 1-row broadcast.
    */
  val qDistDrift = Q(
    "q_dist_drift",
    (s, d) => {
      // pure LONG arithmetic (Spark `div` ≡ DuckDB `//` integer
      // division): exact to n ≈ 4.6e12 rows per band, the same bound
      // the streaming tvdMicros documents. A double rendition of this
      // formula loses exactness three orders of magnitude earlier
      // (2·n·10⁶ exceeds 2^53 at n ≈ 4.5e9).
      def micros(num: String, den: String) =
        expr(s"(2 * $num * 1000000 + $den) div (2 * $den)")
      // the (source × band) cell relation is tiny but feeds three
      // marginal branches plus the grid join; cached → one corpus scan
      // (r12 scan sweep)
      val cell = graft.ops.Caching.cachedOnce(Tables.documents(s, d)
        .select(col("source"),
          least(floor(col("n_chars") / lit(256)).cast(LongType), lit(20L)).as("band"))
        .groupBy(col("source"), col("band")).agg(count(lit(1)).as("n_sb")))
      val srcTot = cell.groupBy(col("source")).agg(sum(col("n_sb")).as("n_s"))
      val bandTot = cell.groupBy(col("band")).agg(sum(col("n_sb")).as("n_b"))
      val grand = cell.agg(sum(col("n_sb")).as("n"))
      srcTot.crossJoin(broadcast(bandTot))
        .join(cell, Seq("source", "band"), "left")
        .na.fill(0L, Seq("n_sb"))
        .crossJoin(broadcast(grand))
        .groupBy(col("source"))
        .agg((sum(abs(micros("n_sb", "n_s")
          - micros("n_b", "n"))).cast("double") / lit(2000000.0))
          .as("tvd"))
        .orderBy(col("source"))
    },
    Some("""
      WITH cell AS (
        SELECT source, least(CAST(floor(n_chars / 256) AS BIGINT), 20) AS band,
               count(*) AS n_sb
        FROM documents GROUP BY 1, 2),
      src AS (SELECT source, sum(n_sb) AS n_s FROM cell GROUP BY 1),
      band AS (SELECT band, sum(n_sb) AS n_b FROM cell GROUP BY 1),
      grand AS (SELECT sum(n_sb) AS n FROM cell)
      SELECT source,
             CAST(sum(abs(
               ((2 * coalesce(n_sb, 0) * 1000000 + n_s) // (2 * n_s))
               - ((2 * n_b * 1000000 + n) // (2 * n))
             )) AS DOUBLE) / 2000000.0 AS tvd
      FROM (SELECT source, n_s, band, n_b FROM src CROSS JOIN band) combos
      LEFT JOIN cell USING (source, band)
      CROSS JOIN grand
      GROUP BY source ORDER BY source"""))

  val all: Seq[Q] = Seq(qSplitAssign, qStratifiedSample, qNgramRepetition,
    qSourceMix, qSourceMixTemperature, qQuotaSample, qShuffleOrder,
    qShardManifest, qBudgetSelect, qPipelineE2e, qPackSequences,
    qInferBatches, qEpochOrders, qCurriculumOrder, qPrioritySample,
    qRakingWeights, qKAnonymity, qDistDrift)
}
