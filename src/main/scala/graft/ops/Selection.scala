package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact distributed order statistics by iterative histogram
  * narrowing — the scale-safe answer to "I need the EXACT median/p99,
  * not a sketch", without the exact-`percentile` aggregate's
  * value→count buffer (which approaches the full column on one reducer
  * when the column is near-unique).
  *
  * Each round partitions the live value range into equal-width buckets,
  * counts them in ONE codegen'd aggregation (map-side partials, a
  * bucket-count-sized exchange), descends into the bucket holding the
  * k-th value, and repeats; when at most `collectThreshold` candidates
  * remain they are collected and selected exactly. Rounds are
  * O(log_buckets(range/resolution)) — 2-3 passes in practice — and the
  * driver only ever sees bucket counts plus the final tail.
  */
object Selection {

  /** Largest single driver collect (rows) performed by the most recent
    * [[kthSmallestByGroupMulti]] call — observability for its
    * driverRowBudget contract (spec-asserted; per-call, not
    * thread-safe).
    */
  @volatile private[graft] var lastMaxCollectRows: Long = 0L

  /** The k-th smallest value (1-based) of a numeric column. NULL and
    * NaN values are excluded (NaN has no order statistics rank);
    * ±Infinity values are ranked directly, so the bucket math only
    * ever sees a finite range.
    */
  def kthSmallest(df: DataFrame, valueCol: Column, k: Long,
                  buckets: Int = 1024, collectThreshold: Long = 65536): Double = {
    require(k >= 1, "k is 1-based")
    val vals0 = df.select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
    val firstRow = vals0.agg(
      min(col("v")), max(col("v")), count(lit(1)),
      count(when(col("v") === Double.NegativeInfinity, 1)),
      count(when(col("v") === Double.PositiveInfinity, 1))).head()
    val total = firstRow.getLong(2)
    require(k <= total, s"k=$k exceeds $total rows")
    val nNegInf = firstRow.getLong(3)
    val nPosInf = firstRow.getLong(4)
    // infinite values break equal-width bucketing (width overflows or
    // floor() yields NaN) — but their ranks are known without any
    // narrowing: they ARE the two ends of the order
    if (k <= nNegInf) return Double.NegativeInfinity
    if (k > total - nPosInf) return Double.PositiveInfinity
    var lo = if (nNegInf > 0)
      vals0.filter(col("v") =!= Double.NegativeInfinity).agg(min(col("v"))).head().getDouble(0)
    else firstRow.getDouble(0)
    var hi = if (nPosInf > 0)
      vals0.filter(col("v") =!= Double.PositiveInfinity).agg(max(col("v"))).head().getDouble(0)
    else firstRow.getDouble(1)
    var vals = vals0.filter(!col("v").isin(
      Double.NegativeInfinity, Double.PositiveInfinity))
    var kk = k - nNegInf
    var n = total - nNegInf - nPosInf
    // each round divides the range by `buckets`; 64 rounds bottoms out
    // double precision long before this guard can trigger
    var rounds = 0
    // width underflow: when the live range narrows to a few ulps,
    // hi/buckets - lo/buckets can round to 0.0 while lo < hi (always
    // possible for non-power-of-two buckets; for powers of two only in
    // the subnormal range). Bucketing would then degenerate (NaN/Inf
    // indices, no narrowing) — break to the exact distinct-value tail,
    // which is a handful of doubles precisely because the range is
    // ulp-wide.
    var widthUnderflow = false
    while (!widthUnderflow && n > collectThreshold && lo < hi && rounds < 64) {
      // divide-then-subtract keeps the width finite even when hi - lo
      // would overflow (lo near -MAX, hi near +MAX)
      val width = hi / buckets - lo / buckets
      if (!(width > 0)) { widthUnderflow = true } else {
      // clamp: v == hi would index one past the end
      val bucketOf = least(floor((col("v") - lit(lo)) / lit(width)), lit(buckets - 1))
      val counts = vals.groupBy(bucketOf.cast("int").as("b"))
        .agg(count(lit(1)).as("c"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
      var acc = 0L
      val (bSel, cSel) = counts.find { case (_, c) =>
        val hit = acc + c >= kk; if (!hit) acc += c; hit
      }.get
      kk -= acc
      n = cSel
      // barycentric form: each term stays within ±MAX even when the
      // naive lo + bSel*width would overflow on a full-double-range lo
      def edge(b: Int): Double =
        (lo / buckets) * (buckets - b) + (hi / buckets) * b
      val newLo = edge(bSel)
      val newHi = if (bSel == buckets - 1) hi else edge(bSel + 1)
      // the k-th value is in [newLo, newHi] (upper edge inclusive only
      // for the clamped last bucket); keep rows by the SAME bucket
      // predicate used for counting so the count and the filter agree
      vals = vals.filter(least(floor((col("v") - lit(lo)) / lit(width)), lit(buckets - 1)) === bSel)
      lo = newLo
      hi = newHi
      rounds += 1
      }
    }
    // a range collapsed to one representable double IS the answer —
    // never collect a (possibly huge) constant column
    if (lo == hi) lo
    else {
      // bounded tail: (value, count) per DISTINCT value walked in order
      // — bounded by distinct values, not rows, so the underflow path
      // (ulp-wide range, possibly millions of equal rows) stays tiny
      val tail = vals.groupBy(col("v")).agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      tail.find { case (_, c) => acc += c; acc >= kk }.get._1
    }
  }

  /** EXACT weighted quantile by the same histogram-narrowing
    * discipline as [[kthSmallest]], with per-bucket COUNTS replaced by
    * per-bucket WEIGHT SUMS: the smallest v whose cumulative weight
    * (value-ascending) reaches `targetWeight` — the "value below which
    * p% of the TOKENS/BYTES sit" question that row-quantiles get wrong
    * whenever documents differ in size. Weights must be nonnegative
    * integers (exact BIGINT accumulation; fractional weights belong in
    * micro-units). Driver sees only bucket weight sums per round plus
    * one bounded tail — never a value buffer. NULL/NaN values and
    * null weights are excluded, SQL-aggregate style.
    */
  def weightedKth(df: DataFrame, valueCol: Column, weightCol: Column,
                  targetWeight: Long, buckets: Int = 1024,
                  collectThreshold: Long = 65536): Double = {
    require(targetWeight >= 1, "targetWeight is 1-based cumulative weight")
    val vals0 = df.select(valueCol.cast("double").as("v"),
        weightCol.cast("long").as("w"))
      .filter(col("v").isNotNull && !isnan(col("v")) &&
        !col("v").isin(Double.NegativeInfinity, Double.PositiveInfinity) &&
        col("w").isNotNull && col("w") > 0)
    val first = vals0.agg(min(col("v")), max(col("v")),
      sum(col("w")), count(lit(1))).head()
    require(!first.isNullAt(2) && first.getLong(2) >= targetWeight,
      s"targetWeight=$targetWeight exceeds total weight")
    var lo = first.getDouble(0)
    var hi = first.getDouble(1)
    var vals = vals0
    var tw = targetWeight
    var n = first.getLong(3)
    var rounds = 0
    // same width-underflow break as kthSmallest: the exact tail below
    // is distinct-value-bounded, so it IS the right fallback
    var widthUnderflow = false
    while (!widthUnderflow && n > collectThreshold && lo < hi && rounds < 64) {
      val width = hi / buckets - lo / buckets
      if (!(width > 0)) { widthUnderflow = true } else {
      val bucketOf = least(floor((col("v") - lit(lo)) / lit(width)), lit(buckets - 1))
      val sums = vals.groupBy(bucketOf.cast("int").as("b"))
        .agg(sum(col("w")).as("ws"), count(lit(1)).as("c"))
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      var acc = 0L
      val (bSel, _, cSel) = sums.find { case (_, ws, _) =>
        val hit = acc + ws >= tw; if (!hit) acc += ws; hit
      }.get
      tw -= acc
      n = cSel
      def edge(b: Int): Double =
        (lo / buckets) * (buckets - b) + (hi / buckets) * b
      val newLo = edge(bSel)
      val newHi = if (bSel == buckets - 1) hi else edge(bSel + 1)
      vals = vals.filter(least(floor((col("v") - lit(lo)) / lit(width)), lit(buckets - 1)) === bSel)
      lo = newLo
      hi = newHi
      rounds += 1
      }
    }
    if (lo == hi) lo
    else {
      // bounded tail: (value, weight-sum) per DISTINCT value, walked in
      // order until the remaining target is covered
      val tail = vals.groupBy(col("v")).agg(sum(col("w")).as("ws"))
        .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      tail.find { case (_, ws) => acc += ws; acc >= tw }.get._1
    }
  }

  /** Exact lower median: the ⌈n/2⌉-th smallest value. */
  def exactMedian(df: DataFrame, valueCol: Column): Double = {
    val n = df.select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull).count()
    require(n > 0, "median of an empty relation")
    kthSmallest(df, valueCol, (n + 1) / 2)
  }

  /** Per-group exact k-th smallest, ALL groups (and ALL requested
    * ranks) narrowed SIMULTANEOUSLY: each round is ONE aggregation over
    * the fact relation — per-(group, rank) bucket edges ride in on a
    * broadcast of the driver's O(groups·ranks) state, the exchange
    * carries ≤ states×buckets count rows, and states that finish (or
    * drop under the collect threshold) stop contributing. This is the
    * grouped rendition of [[kthSmallest]] (the q_winsorize scale path:
    * per-type P1 AND P99 over a 100 TB fact table in one shared scan
    * per round, no per-type sort), with the same driver discipline —
    * bucket counts and a bounded final tail, never a value buffer.
    *
    * Two invariants kill floating-point edge ambiguity:
    *   - k stays ABSOLUTE within each group's finite value set, and
    *     rows below the live range are recounted fresh each round
    *     (bucket −1) — no carried filter whose membership could
    *     disagree with a count;
    *   - the narrowed range is DATA-DEFINED: each bucket's actual
    *     min/max ride along in the same aggregation, and the selected
    *     bucket's [min, max] becomes the next range. Bucket assignment
    *     is monotone in v, so every earlier-bucket row is < that min
    *     and every later-bucket row is > that max — the k-th value can
    *     never be stranded outside the carried interval by an
    *     arithmetic-vs-assignment ulp mismatch (the hazard the global
    *     path dodges by filtering with its own bucket predicate).
    *
    * `kOfs` are the 1-based rank pickers, each a function of the
    * group's row count (e.g. `n => (99 * n + 99) / 100` for P99).
    * NULL/NaN excluded; ±∞ resolved from the endpoint counts without
    * narrowing. The final tail resolve is per-(state, value) counts,
    * bounded by the distinct candidates in each narrowed range even
    * under huge duplicate mass.
    *
    * Driver discipline under HIGH GROUP CARDINALITY: no single collect
    * ever exceeds `driverRowBudget` rows. Live states are processed in
    * deterministic cohorts sized so the worst case fits the budget —
    * budget/`buckets` states per narrowing pass, budget/
    * `collectThreshold` per final-resolve pass — so a million-group
    * call degrades to more passes, never to a driver OOM. (The initial
    * per-group stats and the returned map are O(groups·ranks) by
    * definition — the result itself; the budget governs the
    * intermediate histogram traffic, which is the part that multiplies
    * by `buckets`.) The largest single collect actually performed is
    * recorded in [[lastMaxCollectRows]] for observability.
    *
    * @return (group, rank-index-into-kOfs) → value
    */
  def kthSmallestByGroupMulti(df: DataFrame, groupCol: String, valueCol: Column,
                              kOfs: Seq[Long => Long], buckets: Int = 1024,
                              collectThreshold: Long = 4096,
                              driverRowBudget: Long = 1L << 20)
      : Map[(String, Int), Double] = {
    require(kOfs.nonEmpty, "at least one rank function")
    require(driverRowBudget >= math.max(buckets.toLong, collectThreshold),
      s"driverRowBudget $driverRowBudget below one state's worst case " +
        s"(max(buckets=$buckets, collectThreshold=$collectThreshold))")
    lastMaxCollectRows = 0L
    def tally[T](rows: Array[T]): Array[T] = {
      lastMaxCollectRows = math.max(lastMaxCollectRows, rows.length.toLong)
      rows
    }
    val vals0 = df.select(col(groupCol).cast("string").as("g"),
        valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull && !isnan(col("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val init = vals0.groupBy(col("g")).agg(
      count(lit(1)).as("n"),
      count(when(col("v") === Double.NegativeInfinity, 1)).as("nneg"),
      count(when(col("v") === Double.PositiveInfinity, 1)).as("npos"),
      min(when(!col("v").isin(Double.NegativeInfinity, Double.PositiveInfinity),
        col("v"))).as("flo"),
      max(when(!col("v").isin(Double.NegativeInfinity, Double.PositiveInfinity),
        col("v"))).as("fhi")).collect()
    val done = scala.collection.mutable.Map[(String, Int), Double]()
    // live state per (group, rank): (lo, hi, k within the finite set,
    // candidate count in [lo, hi])
    val state =
      scala.collection.mutable.Map[(String, Int), (Double, Double, Long, Long)]()
    init.foreach { r =>
      val g = r.getString(0)
      val n = r.getLong(1); val nneg = r.getLong(2); val npos = r.getLong(3)
      kOfs.zipWithIndex.foreach { case (kOf, i) =>
        val k = kOf(n)
        require(k >= 1 && k <= n, s"kOf($n) = $k out of range for group $g")
        if (k <= nneg) done((g, i)) = Double.NegativeInfinity
        else if (k > n - npos) done((g, i)) = Double.PositiveInfinity
        else {
          val lo = r.getDouble(4); val hi = r.getDouble(5)
          if (lo == hi) done((g, i)) = lo
          else state((g, i)) = (lo, hi, k - nneg, n - nneg - npos)
        }
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    // worst-case rows per state: `buckets` histogram rows (narrowing)
    // or `collectThreshold` candidate rows (final resolve)
    val narrowCohort = math.max(1L, driverRowBudget / buckets).toInt
    val resolveCohort = math.max(1L, driverRowBudget / collectThreshold).toInt
    var rounds = 0
    // the rounds guard scales with cohorting: a cohort pass narrows only
    // its members, so a million-group call legitimately needs
    // groups/cohort passes on top of the per-state log(range) rounds
    val maxRounds = 64 + 64 * (init.length / narrowCohort)
    // a state whose bucket width underflows to 0 (ulp-wide [lo, hi])
    // cannot narrow further — NULL bucket indices would poison the
    // count walk — but its range holds only a handful of distinct
    // doubles, so the distinct-value-bounded resolve below is exact
    def canNarrow(s: ((String, Int), (Double, Double, Long, Long))): Boolean =
      s._2._4 > collectThreshold && (s._2._2 / buckets - s._2._1 / buckets) > 0
    while (state.exists(canNarrow) && rounds < maxRounds) {
      // only states still above the collect threshold narrow further;
      // finished/small states wait for the final resolve. Deterministic
      // cohort: the budget bounds how many states one pass may touch
      val narrowing = state.filter(canNarrow).toSeq
        .sortBy(_._1).take(narrowCohort)
      val live = narrowing
        .map { case ((g, i), (lo, hi, _, _)) => (g, i, lo, hi) }
        .toDF("g", "__i", "__lo", "__hi")
      // same divide-then-subtract width and clamped bucket as the
      // global path, per state via the broadcast join; rows below lo
      // land in bucket −1 (the "already ranked before this range"
      // count), rows above hi rank after and drop
      val b = when(col("v") < col("__lo"), lit(-1)).otherwise(
        greatest(least(floor((col("v") - col("__lo")) /
          (col("__hi") / buckets - col("__lo") / buckets)), lit(buckets - 1)),
          lit(0))).cast("int")
      val counts = tally(vals0.join(broadcast(live), "g")
        .filter(col("v") <= col("__hi"))
        .groupBy(col("g"), col("__i"), b.as("b"))
        .agg(count(lit(1)).as("c"), min(col("v")).as("bmin"), max(col("v")).as("bmax"))
        .collect())
        .groupBy(r => (r.getString(0), r.getInt(1)))
        .map { case (key, rows) =>
          key -> rows.map(r => (r.getInt(2), r.getLong(3),
            r.getDouble(4), r.getDouble(5))).sortBy(_._1) }
      counts.foreach { case (key, bs) =>
        val (_, _, k, _) = state(key)
        val below = bs.find(_._1 == -1).map(_._2).getOrElse(0L)
        var acc = below
        val (_, cSel, bMin, bMax) = bs.filter(_._1 >= 0).find { case (_, c, _, _) =>
          val hit = acc + c >= k; if (!hit) acc += c; hit
        }.get
        // the selected bucket's ACTUAL min/max: the k-th value is one
        // of its members, so [bMin, bMax] provably contains it
        if (bMin == bMax) { done(key) = bMin; state.remove(key) }
        else state(key) = (bMin, bMax, k, cSel)
      }
      rounds += 1
    }
    // final resolve, in driver-bounded cohorts: below-range mass folds
    // into a NULL key, in-range candidates come back as per-(state,
    // value) counts — bounded by the distinct candidates inside each
    // narrowed range even under huge duplicate mass, so a cohort's
    // collect is ≤ cohort×collectThreshold ≤ driverRowBudget rows
    state.toSeq.sortBy(_._1).grouped(resolveCohort).foreach { cohort =>
      val fin = cohort.map { case ((g, i), (lo, hi, _, _)) => (g, i, lo, hi) }
        .toDF("g", "__i", "__lo", "__hi")
      val cv = when(col("v") < col("__lo"), lit(null).cast("double"))
        .otherwise(col("v"))
      val tails = tally(vals0.join(broadcast(fin), "g")
        .filter(col("v") <= col("__hi"))
        .groupBy(col("g"), col("__i"), cv.as("cv")).agg(count(lit(1)).as("c"))
        .collect())
        .groupBy(r => (r.getString(0), r.getInt(1)))
      cohort.foreach { case (key, (_, _, k, _)) =>
        val rows = tails(key)
        val below = rows.find(_.isNullAt(2)).map(_.getLong(3)).getOrElse(0L)
        val sorted = rows.filterNot(_.isNullAt(2))
          .map(r => r.getDouble(2) -> r.getLong(3)).sortBy(_._1)
        var acc = below
        done(key) = sorted.find { case (_, c) =>
          val hit = acc + c >= k; if (!hit) acc += c; hit
        }.get._1
      }
    }
    vals0.unpersist()
    done.toMap
  }

  /** Single-rank convenience over [[kthSmallestByGroupMulti]]. */
  def kthSmallestByGroup(df: DataFrame, groupCol: String, valueCol: Column,
                         kOf: Long => Long, buckets: Int = 1024,
                         collectThreshold: Long = 4096): Map[String, Double] =
    kthSmallestByGroupMulti(df, groupCol, valueCol, Seq(kOf),
      buckets, collectThreshold)
      .map { case ((g, _), v) => g -> v }
}
