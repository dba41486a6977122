package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DoubleType, IntegerType, LongType, ShortType}

/** Corpus-curation operators a training-data pipeline runs after
  * cleaning/dedup: reproducible split assignment, stratified
  * downsampling, repetition scoring, and mixture reweighting.
  *
  * Everything is a pure `Column => Column` builder (no UDFs, no state),
  * so each op is a shuffle-free map stage fused into the scan — the
  * property that matters at 100 TB. Reproducibility comes from
  * arithmetic the oracle engine computes bit-identically: a Knuth
  * multiplicative hash on the document id, NOT an engine hash builtin
  * (xxhash64/hash never match across engines) and NOT rand() (not
  * deterministic across runs, retries, or partitionings).
  */
object Curation {

  /** Pre-mod keeps the multiply inside Long range for ANY nonnegative
    * id: (PreMod-1) * Knuth ≈ 2.65e18 < 2^63-1. [[bucketHash]] and the
    * SQL oracle mirrors assume nonnegative ids (both engines' `%`
    * follow the dividend's sign); [[priorityMicros]] is the exception —
    * it pmod-mixes, so its u lands in [1, 1e6] for ANY id sign.
    */
  private val PreMod = 999999937L // largest prime below 10^9
  private val Knuth = 2654435761L // Knuth's multiplicative constant, ⌊2^32/φ⌋

  /** Deterministic scramble of `id` into [0, buckets). The same doc
    * lands in the same bucket on every run, engine, and partitioning —
    * the foundation for splits and samples that survive pipeline
    * re-runs without a stored assignment table.
    */
  def bucketHash(id: Column, buckets: Long): Column =
    pmod(pmod(id, lit(PreMod)) * lit(Knuth), lit(buckets))

  /** Epoch-salted [[bucketHash]]: a DIFFERENT reproducible scramble per
    * training epoch — the loader property that every epoch reshuffles
    * the corpus while any rerun of an epoch replays its order exactly.
    * The salt shifts the id by a prime multiple of the epoch before
    * the Knuth scramble; ids stay nonnegative, so the SQL mirror's `%`
    * agrees.
    */
  def epochHash(id: Column, epoch: Int, buckets: Long): Column = {
    require(epoch >= 0, s"epochHash: epoch must be nonnegative: $epoch")
    bucketHash(id + lit(EpochSalt * epoch), buckets)
  }
  private[text] val EpochSalt = 1000003L // prime

  /** Train/val/test assignment from per-mille cut points:
    * bucket < trainPerMille → "train", < trainPerMille+valPerMille →
    * "val", else "test". Membership is a pure function of the id, so
    * test-set contamination can't creep in when the corpus is re-read,
    * re-partitioned, or incrementally extended.
    */
  def splitAssign(id: Column, trainPerMille: Int, valPerMille: Int): Column =
    when(bucketHash(id, 1000) < trainPerMille, lit("train"))
      .when(bucketHash(id, 1000) < trainPerMille + valPerMille, lit("val"))
      .otherwise(lit("test"))

  /** Priority-sampling priority (Duffield, Lund & Thorup, JACM 2007):
    * w/u for a uniform u, here the Knuth bucket hash in [1, 1e6] so
    * both engines and every rerun derive the identical exact BIGINT
    * w·1e6 div u. The k largest priorities are a weight-proportional
    * exact-k sample; top-k by priority is MERGEABLE
    * (topk(A∪B) = topk(topk(A)∪B)), which is what lets the streaming
    * absorb sink maintain the sample incrementally. Takes column NAMES
    * (not Columns): the integer `div` only exists as a SQL operator.
    *
    * u is pmod-mixed (as [[bucketHash]] is), so it lands in [1, 1e6]
    * for ANY id sign — a signed `%` here would make a negative id's
    * divisor ≤ 0 (NULL or sign-flipped priority, the row silently
    * vanishing from every sample). A negative weight is a contract
    * violation and yields an explicit NULL (sorted last under
    * `priority DESC`, i.e. never sampled) rather than a nonsense rank.
    */
  def priorityMicros(idName: String, weightName: String): Column = {
    val u = s"(pmod(pmod($idName, ${PreMod}L) * ${Knuth}L, 1000000L) + 1)"
    expr(s"CASE WHEN ($weightName) >= 0 " +
      s"THEN (($weightName) * 1000000) div $u END")
  }

  /** Deterministic Bernoulli keep-decision at `rate` (a fraction of
    * 1e6 buckets — rates with ≤ 6 decimals are exact in double, so the
    * integer threshold compare can never straddle an engine's last
    * bit). Stratified sampling = a per-row rate expression, e.g.
    * downsample only the dominant language.
    */
  def sampledAt(id: Column, rate: Column): Column =
    bucketHash(id, 1000000).cast(DoubleType) < rate * lit(1000000.0)

  /** Duplicate n-gram fraction (Gopher-style repetition signal):
    * 1 − distinct/total over word n-grams — 0 for repetition-free text,
    * → 1 as the document degenerates into a loop. Documents shorter
    * than n tokens yield one whole-document gram (fraction 0).
    */
  def duplicateNgramFraction(text: Column, n: Int): Column = {
    // bind the gram array once; referencing the shingle expression
    // twice would re-tokenize the document per reference
    element_at(transform(array(TextAnalysis.shingles(text, n)), g =>
      graft.functions.DetMath.ratio6(
        size(g) - size(array_distinct(g)), size(g))), 1)
  }

  /** n-gram count matching [[duplicateNgramFraction]]'s denominator. */
  def ngramCount(text: Column, n: Int): Column =
    size(TextAnalysis.shingles(text, n)).cast(IntegerType)

  /** Token-budget selection: the rows of `df` whose global prefix sum of
    * `tokenCol` — in (`rankCol` desc, `idCol` asc) order — stays within
    * `budget`, with that prefix sum attached as `cumCol`. "Take the best
    * documents until the budget is full."
    *
    * The naive form is a cumulative-sum window over a GLOBAL sort — one
    * WindowExec partition holding the corpus. Instead the rank is
    * bucketed into ≤ `buckets`+1 integer bands (`rankCol` DIV width);
    * per-band token totals (a `buckets`-row aggregate — metadata scale,
    * collected driver-side like a fitted model) give every band its
    * tokens-before offset, and the in-band cumulative sum runs in a
    * window PARTITIONED by band. Global prefix = band offset + in-band
    * prefix, exactly, because (band desc, rank desc, id) is the same
    * total order as (rank desc, id) — the band is monotone in the rank.
    *
    * `rankCol` must be a nonnegative integral column bounded by
    * `buckets * bucketWidth`; `idCol` must be unique (makes the order
    * total, so the selected set is engine- and partitioning-stable).
    */
  def budgetSelect(df: DataFrame, idCol: String, tokenCol: String,
                   rankCol: String, budget: Long,
                   bucketWidth: Long = 1000L): DataFrame = {
    // enforce the documented preconditions instead of failing later with
    // a ClassCastException (double token sums) or a DIV on non-integral
    // ranks: both columns must be integral; rank nonnegativity is
    // data-dependent and is checked for free on the collected histogram
    def requireIntegral(name: String): Unit = df.schema(name).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"budgetSelect: column '$name' must be integral, got $t " +
          "(cast token counts / ranks to int or long upstream)")
    }
    requireIntegral(tokenCol)
    requireIntegral(rankCol)
    // a row with an unknown rank or token count cannot be ordered or
    // budgeted — it never competes for the budget (NULL text rows
    // upstream of a quality score land here)
    // the banded relation feeds the histogram collect AND the final
    // join — persist so the caller's metric expressions (often a full
    // tokenize+score pass) run once, not twice; the ContextCleaner
    // drops the cache when the plan is GC'd
    val banded = graft.ops.Caching.cachedOnce(
      df.filter(col(rankCol).isNotNull && col(tokenCol).isNotNull)
        .withColumn("__band", expr(s"$rankCol DIV $bucketWidth")))
    val hist = banded.groupBy(col("__band"))
      .agg(sum(col(tokenCol)).as("__t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(-_._1)
    require(hist.forall(_._1 >= 0),
      s"budgetSelect: rankCol '$rankCol' must be nonnegative " +
        s"(found a negative band in the rank histogram)")
    var acc = 0L
    val offsets = hist.map { case (b, t) => val before = acc; acc += t; (b, before) }
    val offsetDf = df.sparkSession
      .createDataFrame(offsets.toIndexedSeq).toDF("__band", "__before")
    val w = Window.partitionBy(col("__band"))
      .orderBy(col(rankCol).desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    banded.join(broadcast(offsetDf), "__band")
      .withColumn("cum_tok", col("__before") + sum(col(tokenCol)).over(w))
      .filter(col("cum_tok") <= budget)
      .drop("__band", "__before")
  }

  /** Sliding-window document chunking: each document's token stream is
    * cut into windows of `chunkLen` tokens advancing by
    * `chunkLen − overlap` (the RAG / long-context prep that turns one
    * document row into its trainable pieces, each carrying `overlap`
    * tokens of left context). One output row per (doc, window):
    * `chunk_idx`, `chunk_tokens` (window size — only the final window
    * is shorter), `chunk_text` (space-rejoined). Zero-token documents
    * produce no rows; a final window that would START past
    * `n − overlap` is never emitted (it would be pure overlap, fully
    * contained in its predecessor).
    *
    * Pure per-row map + explode — fused into the scan, shuffle-free,
    * the shape that stays flat at 100 TB. Row growth is
    * ~n/(chunkLen−overlap) per doc, bounded and predictable.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     chunkLen: Int, overlap: Int): DataFrame = {
    require(chunkLen > 0, s"chunkDocuments: chunkLen must be positive: $chunkLen")
    require(overlap >= 0 && overlap < chunkLen,
      s"chunkDocuments: overlap must be in [0, chunkLen): $overlap")
    val step = chunkLen - overlap
    val n = size(col("__t"))
    // integer ceil: windows = ((n − chunkLen) + step − 1) DIV step + 1,
    // clamped to 1 when the doc fits in a single window
    val nChunks = when(n <= chunkLen, lit(1)).otherwise(
      floor((n - chunkLen + step - 1) / lit(step)).cast(IntegerType) + 1)
    df.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("__t"))
      .filter(n > 0)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(col("__t"), i * step + 1, lit(chunkLen)))).as(Seq("chunk_idx", "__c")))
      .select(col(idCol), col("chunk_idx"),
        size(col("__c")).as("chunk_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** GPT-style sequence packing: concatenate documents in `idCol` order
    * and chop the token stream into training sequences of exactly
    * `seqLen` tokens (documents span sequence boundaries — no padding,
    * no per-sequence bin packing). Returns one row per input document
    * with its span in the packed stream:
    *
    *   `tokens`     — the document's token count (rows with 0 or NULL
    *                  tokens occupy no stream positions and are dropped)
    *   `seq_first`  — id of the sequence holding the doc's first token
    *   `seq_last`   — id of the sequence holding its last token
    *   `seq_offset` — position of the first token within `seq_first`
    *
    * This is the writer-side manifest a packed-tfrecord/parquet export
    * needs: every doc knows exactly which shard-sequences it lands in
    * and where, so the export is an embarrassingly-parallel slice per
    * sequence range.
    *
    * Scale shape: the global running token total is NOT a global-window
    * cum-sum (single-partition sort at 100 TB) — it is the
    * [[budgetSelect]] band decomposition on `idCol DIV bucketWidth`:
    * per-band token sums (one aggregation, `O(maxId / bucketWidth)`
    * rows to the driver), prefix offsets broadcast back, in-band
    * cum-sum under a window PARTITIONED by band. `(band asc, id asc)`
    * equals `(id asc)` because the band is monotone in the id, so the
    * in-band prefix plus the band offset is the exact global prefix.
    * Size `bucketWidth` so the histogram stays driver-bounded (1e6
    * bands ≈ 16 MB at a trillion docs with width 1e6).
    *
    * `idCol` must be a unique nonnegative integral column (the pack
    * order); `tokenCol` integral. Both preconditions are enforced.
    */
  /** Length-bucketed inference batching manifest — the serving-side
    * twin of [[packSequences]] (which concatenates for training;
    * inference PADS, so batch members should share a length band or
    * the short ones pay the longest one's padding). Each document with
    * tokens > 0 gets:
    *
    *   `len_band`   — ⌈tokens / padQuantum⌉, the padding bucket
    *   `padded_len` — len_band · padQuantum, the batch's padded width
    *   `batch_idx`  — 0-based batch within the band: documents are
    *                  ordered by `idCol` (deterministic across runs and
    *                  partitionings) and grouped `maxBatchRows` at a
    *                  time
    *   `waste`      — padded_len − tokens, the padding FLOPs the
    *                  manifest exists to minimize
    *
    * Scale shape: the within-band ordinal is NOT a
    * `Window.partitionBy(len_band)` row_number — real corpora are
    * length-skewed, so one band holds a large fraction of the docs and
    * that window is a single-task sort. It is
    * [[graft.ops.Ranking.rankByGroup]]'s band decomposition (group =
    * len_band, value = id): a bands×1024 count histogram to the
    * driver, offsets broadcast back, ordinal under a (band, id-band)
    * partitioned window. Ids are unique, so rank = row_number.
    */
  def batchManifest(df: DataFrame, idCol: String, tokenCol: String,
                    padQuantum: Long = 16L, maxBatchRows: Long = 8L): DataFrame = {
    require(padQuantum > 0, s"batchManifest: padQuantum must be positive: $padQuantum")
    require(maxBatchRows > 0, s"batchManifest: maxBatchRows must be positive: $maxBatchRows")
    val base = df
      .filter(col(tokenCol).isNotNull && col(tokenCol) > 0 && col(idCol).isNotNull)
      .withColumn("__lb", expr(s"($tokenCol + ${padQuantum - 1}) DIV $padQuantum"))
    graft.ops.Ranking.rankByGroup(base, "__lb", idCol)
      .select(col(idCol),
        col(tokenCol).cast(LongType).as("n_tokens"),
        col("__lb").as("len_band"),
        expr(s"(__rk - 1) DIV $maxBatchRows").as("batch_idx"),
        (col("__lb") * padQuantum).as("padded_len"),
        (col("__lb") * padQuantum - col(tokenCol)).as("waste"))
  }

  def packSequences(df: DataFrame, idCol: String, tokenCol: String,
                    seqLen: Long, bucketWidth: Long = 8192L): DataFrame = {
    require(seqLen > 0, s"packSequences: seqLen must be positive: $seqLen")
    def requireIntegral(name: String): Unit = df.schema(name).dataType match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case t => throw new IllegalArgumentException(
        s"packSequences: column '$name' must be integral, got $t")
    }
    requireIntegral(idCol)
    requireIntegral(tokenCol)
    val banded = graft.ops.Caching.cachedOnce(df
      .filter(col(tokenCol).isNotNull && col(tokenCol) > 0 && col(idCol).isNotNull)
      .withColumn("__band", expr(s"$idCol DIV $bucketWidth")))
    val hist = banded.groupBy(col("__band"))
      .agg(sum(col(tokenCol).cast(LongType)).as("__t"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    require(hist.forall(_._1 >= 0),
      s"packSequences: idCol '$idCol' must be nonnegative")
    var acc = 0L
    val offsets = hist.map { case (b, t) => val before = acc; acc += t; (b, before) }
    val offsetDf = df.sparkSession
      .createDataFrame(offsets.toIndexedSeq).toDF("__band", "__before")
    val w = Window.partitionBy(col("__band")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tok = col(tokenCol).cast(LongType)
    banded.join(broadcast(offsetDf), "__band")
      .withColumn("__cum", col("__before") + sum(tok).over(w))
      // integer DIV, not `/`: Long / Long is a DOUBLE in Spark, and a
      // packed stream past 2^53 tokens would round its sequence ids
      .withColumn("__start", col("__cum") - tok)
      .select(
        col(idCol),
        tok.as("tokens"),
        expr(s"__start DIV $seqLen").as("seq_first"),
        expr(s"(__cum - 1) DIV $seqLen").as("seq_last"),
        pmod(col("__start"), lit(seqLen)).as("seq_offset"))
  }
}
