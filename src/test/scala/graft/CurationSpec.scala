package graft

import org.apache.spark.sql.functions._
import graft.text.Curation

class CurationSpec extends SparkSpec {
  import spark.implicits._

  private val docs = (0L until 2000L).map(i => (i, s"doc $i lang"))
    .toDF("doc_id", "text")

  test("splitAssign partitions every doc, near the 90/5/5 target, reproducibly") {
    val assigned = docs.select(col("doc_id"),
      Curation.splitAssign(col("doc_id"), 900, 50).as("split"))
    val counts = assigned.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 2000L, "every doc gets exactly one split")
    assert(counts("train") > 1700 && counts("train") < 1900)
    assert(counts("val") > 50 && counts("val") < 150)
    assert(counts("test") > 50 && counts("test") < 150)
    // reproducible: the same ids land in the same split on a re-run
    val again = docs.select(col("doc_id"),
      Curation.splitAssign(col("doc_id"), 900, 50).as("split"))
    assert(assigned.except(again).isEmpty && again.except(assigned).isEmpty)
  }

  test("splitAssign is a pure function of id: extending the corpus never reassigns") {
    val before = docs.filter(col("doc_id") < 100)
      .select(col("doc_id"), Curation.splitAssign(col("doc_id"), 900, 50).as("s"))
    val after = docs // 20x more docs
      .select(col("doc_id"), Curation.splitAssign(col("doc_id"), 900, 50).as("s"))
      .filter(col("doc_id") < 100)
    assert(before.except(after).isEmpty && after.except(before).isEmpty)
  }

  test("cluster-keyed split co-locates near-dups that doc-keyed hashing would leak") {
    // pair i with i+777 as near-dup clusters; with per-doc hashing some
    // pairs straddle train/test (that's the leak), with cluster hashing
    // none can — and the fixture must actually CONTAIN leaking pairs or
    // the test proves nothing. (An offset of 1000 would prove nothing:
    // Knuth·1000 ≡ 0 mod 1000, so i and i+1000 always share a bucket.)
    val off = 777L
    val pairs = (0L until 1000L).map(i => (i, i + off)).toDF("doc_a", "doc_b")
    val byDoc = docs
      .select(col("doc_id"), Curation.splitAssign(col("doc_id"), 900, 50).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val leakingPairs = (0L until 1000L).count(i => byDoc(i) != byDoc(i + off))
    assert(leakingPairs > 0, "fixture must contain doc-hash-split pairs")

    val clusters = graft.dedup.Dedup.dedupClusters(docs, "doc_id", pairs)
    val splitOf = clusters
      .select(col("doc_id"), Curation.splitAssign(col("cluster_id"), 900, 50).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    (0L until 1000L).foreach { i =>
      assert(splitOf(i) == splitOf(i + off),
        s"cluster {$i, ${i + off}} split across ${splitOf(i)}/${splitOf(i + off)}")
    }
  }

  test("sampledAt keeps a deterministic subset at roughly the rate") {
    val kept = docs.filter(Curation.sampledAt(col("doc_id"), lit(0.1)))
    val n = kept.count()
    assert(n > 120 && n < 280, s"~10% of 2000 expected, got $n") // hash, not iid
    // monotone: raising the rate only adds docs, never swaps any
    val keptMore = docs.filter(Curation.sampledAt(col("doc_id"), lit(0.3)))
    assert(kept.except(keptMore).isEmpty, "rate 0.1 sample must be a subset of rate 0.3")
  }

  test("duplicateNgramFraction: 0 for distinct grams, high for a loop, 0 for short docs") {
    val cases = Seq(
      (1L, "a b c d e"),        // 4 distinct 2-grams
      (2L, "spam spam spam spam spam"), // one gram repeated 4x
      (3L, "single")            // < n tokens -> whole-doc gram
    ).toDF("doc_id", "text")
    val got = cases.select(col("doc_id"),
      Curation.duplicateNgramFraction(col("text"), 2).as("f"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got(1L) == 0.0)
    assert(got(2L) == 0.75) // 4 occurrences, 1 distinct
    assert(got(3L) == 0.0)
  }

  test("quota sample plan uses the top-k aggregator, never a Window sort") {
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = graft.queries.CurationQueries.qQuotaSample
        .run(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      val hasWindow = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }.nonEmpty
      assert(!hasWindow, "quota sampling must not sort whole strata in a window")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  test("pii scrub masks emails and long digit runs, leaves short numbers alone") {
    val fixture = Seq(
      (1L, "contact bob.smith+x@example.co.uk or call 5551234567 now"),
      (2L, "version 2 of chapter 3 has 42 pages")).toDF("doc_id", "text")
    fixture.createOrReplaceTempView("documents_pii_fixture")
    val emailRe = "[A-Za-z0-9._+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val masked = fixture.select(col("doc_id"),
      regexp_replace(regexp_replace(col("text"), emailRe, "<EMAIL>"),
        "[0-9]{4,}", "<NUM>").as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(masked(1L) == "contact <EMAIL> or call <NUM> now")
    assert(masked(2L) == "version 2 of chapter 3 has 42 pages")
  }

  test("source mix weights rebalance to uniform: weight * n_docs equal across sources") {
    val skewed = ((0 until 600).map(i => (i.toLong, "s0")) ++
      (600 until 800).map(i => (i.toLong, "s1")) ++
      (800 until 1000).map(i => (i.toLong, "s2"))).toDF("doc_id", "source")
    val counts = skewed.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val totals = counts.agg(sum("n_docs").as("total"), count(lit(1)).as("n_sources"))
    val weighted = counts.crossJoin(broadcast(totals))
      .select((col("n_docs") * col("total") / (col("n_sources") * col("n_docs")))
        .as("mass"))
      .collect().map(_.getDouble(0))
    assert(weighted.forall(m => math.abs(m - 1000.0 / 3) < 1e-9))
  }

  test("shuffle order is a dense 1..n permutation, reproducible, not ingest order") {
    val run = graft.queries.CurationQueries.qShuffleOrder
      .run(spark, "/root/testdata/sf0.001")
    val pos = run.collect().map(r => r.getLong(0) -> r.getLong(1))
    val n = pos.length
    assert(pos.map(_._2).sorted.toSeq == (1L to n.toLong).toSeq,
      "positions must be exactly 1..n")
    // decorrelated from ingest order: the id-sorted position sequence is
    // far from monotone (a sorted corpus would have 0 inversions-free
    // violation; a shuffled one has ~half of adjacent pairs inverted)
    val byId = pos.sortBy(_._1).map(_._2)
    val inversions = byId.sliding(2).count { case Array(a, b) => a > b }
    assert(inversions > n / 4, s"only $inversions adjacent inversions in $n: not shuffled")
    val again = graft.queries.CurationQueries.qShuffleOrder
      .run(spark, "/root/testdata/sf0.001")
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(pos.toSeq == again.toSeq, "order must be identical across runs")
  }

  test("budget select equals the brute-force global quality-order prefix") {
    import graft.text.TextAnalysis
    val sf = "/root/testdata/sf0.001"
    val selected = graft.queries.CurationQueries.qBudgetSelect.run(spark, sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    assert(selected.nonEmpty, "budget must admit at least one doc")
    assert(selected.forall(_._3 <= 8000L), "every selected prefix sum within budget")
    // brute force: collect all metrics, sort by (quality desc, id), take
    // the prefix — must be the identical doc set
    val all = graft.Tables.documents(spark, sf).select(
      col("doc_id"),
      TextAnalysis.tokenCount(col("text")).as("n_tok"),
      round(round(TextAnalysis.qualityScore(col("text")), 6) * 1000000, 0)
        .cast("long").as("q_micros"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .sortBy { case (id, _, q) => (-q, id) }
    var acc = 0L
    val expect = all.takeWhile { case (_, t, _) => { acc += t; acc <= 8000L } }
      .map(_._1).toSet
    assert(selected.map(_._1).toSet == expect,
      "histogram+boundary path must equal the global prefix")
  }

  test("budgetSelect edges: zero budget, full budget, exact boundary, rank ties") {
    // ranks straddle band edges (999/1000) and tie (id 3,4) on purpose
    val m = Seq((1L, 10, 2500L), (2L, 20, 1000L), (3L, 30, 999L),
      (4L, 40, 999L), (5L, 50, 0L)).toDF("id", "tok", "rank")
    def sel(budget: Long) = Curation.budgetSelect(m, "id", "tok", "rank", budget)
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(sel(0L) == Seq(), "zero budget selects nothing")
    assert(sel(9L) == Seq(), "budget below the best doc selects nothing")
    assert(sel(150L) == Seq(1L, 2L, 3L, 4L, 5L), "full budget selects all")
    assert(sel(30L) == Seq(1L, 2L), "exact boundary included")
    assert(sel(60L) == Seq(1L, 2L, 3L), "tie broken by id: 3 before 4")
  }

  test("epoch orders: each epoch a dense permutation, epochs differ, reruns identical") {
    def order(epoch: Int): Seq[Long] = {
      val hashed = docs.select(col("doc_id"),
        Curation.epochHash(col("doc_id"), epoch, 1000000L).as("h"))
      graft.ops.KeyOps.scalableSurrogateKey(hashed, "position", "h", "doc_id")
        .orderBy(col("position")).select(col("doc_id"))
        .collect().map(_.getLong(0)).toSeq
    }
    val e0 = order(0); val e1 = order(1)
    assert(e0.sorted == (0L until 2000L) && e1.sorted == (0L until 2000L),
      "each epoch must be a permutation of the corpus")
    assert(e0 != e1, "different epochs must shuffle differently")
    assert(order(0) == e0, "rerunning an epoch must replay its order")
  }

  test("batchManifest: skewed band batches in id order, quantum padding, " +
       "zero/NULL-token docs drop") {
    // 17 docs in the dominant 1-16-token band (skew), 2 in band 2, plus
    // a zero-token and a NULL-token doc that must not appear
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}
    import scala.jdk.CollectionConverters._
    val rows = ((1L to 17L).map(i => Row(i, 16 - (i % 3).toInt)) ++
      Seq(Row(18L, 20), Row(19L, 31), Row(20L, 0), Row(21L, null))).asJava
    val m = spark.createDataFrame(rows, StructType(Seq(
      StructField("id", LongType), StructField("tok", IntegerType))))
    val got = Curation.batchManifest(m, "id", "tok",
        padQuantum = 16L, maxBatchRows = 8L)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got.size == 19, "zero/NULL-token docs dropped")
    // band 1: ids 1..17 in id order -> batches of 8: ids 1-8, 9-16, 17
    assert((1L to 8L).forall(i => got(i)._2 == 0L))
    assert((9L to 16L).forall(i => got(i)._2 == 1L))
    assert(got(17L)._2 == 2L)
    // padding: tok=14 (id 2) pads to 16, waste 2; tok=16 (id 3) waste 0
    assert(got(2L) == ((1L, 0L, 16L, 2L)))
    assert(got(3L) == ((1L, 0L, 16L, 0L)))
    // band 2 holds both longer docs in one batch
    assert(got(18L) == ((2L, 0L, 32L, 12L)))
    assert(got(19L) == ((2L, 0L, 32L, 1L)))
  }

  test("packSequences: spans match a sequential pack; zero/NULL-token docs drop") {
    // ids straddle band edges (width 3) and include a doc that itself
    // spans two sequences (id 5: stream [7,15) over seqLen 8 → 0..1)
    val docs = Seq(
      (0L, Some(3)), (1L, Some(4)), (2L, Some(0)),   // band 0; id 2 drops
      (3L, None), (4L, Some(5)), (5L, Some(8)),      // band 1; id 3 drops
      (9L, Some(1))                                  // band 3 (gap is fine)
    ).toDF("id", "tok")
    val got = Curation.packSequences(docs, "id", "tok", seqLen = 8L, bucketWidth = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    // sequential oracle: cum stream positions [start, start+tok)
    val expect = Seq(
      (0L, 3L, 0L, 0L, 0L),   // [0,3)
      (1L, 4L, 0L, 0L, 3L),   // [3,7)
      (4L, 5L, 0L, 1L, 7L),   // [7,12) spans seqs 0-1
      (5L, 8L, 1L, 2L, 4L),   // [12,20) spans seqs 1-2
      (9L, 1L, 2L, 2L, 4L))   // [20,21)
    assert(got == expect, s"pack spans must equal the sequential pack: $got")
  }

  test("chunkDocuments: window starts/sizes, pure-overlap tail suppressed, empty doc drops") {
    def doc(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, doc(10)), (2L, doc(8)), (3L, doc(13)), (4L, "  "), (5L, doc(3)))
      .toDF("id", "text")
    val got = Curation.chunkDocuments(docs, "id", "text", chunkLen = 8, overlap = 4)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got.map(t => (t._1, t._2, t._3)) == Seq(
      (1L, 0, 8), (1L, 1, 6),              // [1..8], [5..10]
      (2L, 0, 8),                          // exactly one window, no tail
      (3L, 0, 8), (3L, 1, 8), (3L, 2, 5),  // [1..8], [5..12], [9..13]
      (5L, 0, 3)                           // short doc: single partial window
    ), s"window layout wrong: $got")
    assert(got(1)._4 == "w5 w6 w7 w8 w9 w10", "overlap must carry left context")
  }

  test("packSequences: exact seq boundary lands the next doc at offset 0") {
    val docs = Seq((1L, 8), (2L, 8), (3L, 16)).toDF("id", "tok")
    val got = Curation.packSequences(docs, "id", "tok", seqLen = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L, 0L, 0L), (2L, 1L, 1L, 0L), (3L, 2L, 3L, 0L)),
      s"aligned docs must fill whole sequences: $got")
  }

  test("raking: both weighted marginals converge near uniform after two rounds") {
    val d = "/root/testdata/sf0.001"
    val w = graft.queries.CurationQueries.qRakingWeights.run(spark, d)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def shares(key: ((String, String, Long, Long)) => String): Seq[Double] = {
      val tot = w.map(c => c._3 * c._4.toDouble).sum
      w.groupBy(key).values.map(_.map(c => c._3 * c._4.toDouble).sum / tot).toSeq
    }
    val srcShares = shares(_._1)
    val langShares = shares(_._2)
    val srcTarget = 1.0 / srcShares.size
    val langTarget = 1.0 / langShares.size
    assert(srcShares.forall(s => math.abs(s - srcTarget) < 0.02 * srcTarget),
      s"source marginals not balanced: $srcShares")
    assert(langShares.forall(s => math.abs(s - langTarget) < 0.02 * langTarget),
      s"lang marginals not balanced: $langShares")
    // sanity: the RAW corpus is NOT balanced on both margins, or the
    // test proves nothing
    val raw = w.groupBy(_._1).values.map(_.map(_._3.toDouble).sum).toSeq
    val rawTot = raw.sum
    assert(raw.exists(s => math.abs(s / rawTot - srcTarget) > 0.02 * srcTarget)
      || w.groupBy(_._2).values.map(_.map(_._3.toDouble).sum).toSeq
           .exists(s => math.abs(s / rawTot - langTarget) > 0.02 * langTarget),
      "fixture already uniform — the convergence pin is vacuous")
  }

  test("priority sample: exactly k, partitioning-invariant, weight-biased") {
    val d = "/root/testdata/sf0.001"
    val q = graft.queries.CurationQueries.qPrioritySample
    val a = q.run(spark, d).collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(a.size == 100, s"exact-k contract: got ${a.size}")
    // same selection under a different physical layout
    val repart = graft.Tables.documents(spark, d).repartition(17)
    repart.createOrReplaceTempView("__prio_docs")
    val b = repart
      .select(col("doc_id"), col("n_chars"),
        (Curation.bucketHash(col("doc_id"), 1000000L) + lit(1L)).as("u"))
      .select(col("doc_id"), expr("(n_chars * 1000000) div u").as("priority"))
      .orderBy(col("priority").desc, col("doc_id")).limit(100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(a == b, "selection must not depend on partitioning")
    // proportional-to-size bias: sampled docs are longer than the corpus mean
    val sampleMean = q.run(spark, d).agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    val corpusMean = graft.Tables.documents(spark, d)
      .agg(avg(col("n_chars"))).collect()(0).getDouble(0)
    assert(sampleMean > corpusMean,
      f"weight-proportional sample must skew long: $sampleMean%.0f !> $corpusMean%.0f")
  }

  test("priorityMicros: negative ids rank normally, negative weights go NULL") {
    import spark.implicits._
    // pre-fix a negative id made the divisor ≤ 0 (NULL or sign-flipped
    // priority) and the row silently vanished from every top-k sample
    val rows = Seq((-3L, 10L), (-1L, 10L), (4L, 10L), (7L, -5L))
      .toDF("id", "w")
      .select(col("id"), col("w"),
        Curation.priorityMicros("id", "w").as("p"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    // u ∈ [1, 1e6] ⇒ priority ∈ [w, w·1e6] for nonnegative weights
    for (id <- Seq(-3L, -1L, 4L)) {
      val p = rows(id)
      assert(p.isDefined && p.get >= 10L && p.get <= 10L * 1000000L,
        s"id=$id priority=$p out of [w, w*1e6]")
    }
    assert(rows(7L).isEmpty, "negative weight must yield explicit NULL")
    // exact-value pin of the pmod mixing the oracle SQL mirrors:
    // u = ((id % P + P) % P * K) % 1e6 + 1, priority = w*1e6 div u
    val P = BigInt(999999937L); val K = BigInt(2654435761L)
    for (id <- Seq(-3L, -1L, 4L)) {
      val u = ((((BigInt(id) mod P) + P) mod P) * K mod BigInt(1000000)) + 1
      val want = (BigInt(10L) * 1000000) / u
      assert(rows(id) == Some(want.toLong),
        s"id=$id priority=${rows(id)} != pmod-formula $want")
    }
  }
}
