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
    while (n > collectThreshold && lo < hi && rounds < 64) {
      // divide-then-subtract keeps the width finite even when hi - lo
      // would overflow (lo near -MAX, hi near +MAX)
      val width = hi / buckets - lo / buckets
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
    // a range collapsed to one representable double IS the answer —
    // never collect a (possibly huge) constant column
    if (lo == hi) lo
    else {
      val tail = vals.select(col("v")).collect().map(_.getDouble(0)).sorted
      tail((kk - 1).toInt)
    }
  }

  /** Exact lower median: the ⌈n/2⌉-th smallest value. */
  def exactMedian(df: DataFrame, valueCol: Column): Double = {
    val n = df.select(valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull).count()
    require(n > 0, "median of an empty relation")
    kthSmallest(df, valueCol, (n + 1) / 2)
  }

  /** Per-group exact k-th smallest, ALL groups narrowed SIMULTANEOUSLY:
    * each round is ONE aggregation over the still-live rows — per-group
    * bucket edges ride in on a broadcast of the driver's O(groups)
    * state, the exchange carries ≤ groups×buckets counts, and groups
    * that finish early simply stop contributing rows. This is the
    * grouped rendition of [[kthSmallest]] (the q_winsorize scale path:
    * per-type P99 over a 100 TB fact table without a per-type sort),
    * with the same driver discipline — bucket counts and a bounded
    * final tail, never a value buffer.
    *
    * `kOf(n)` picks each group's 1-based rank from its row count
    * (e.g. `n => (99 * n + 99) / 100` for the P99 rank). NULL/NaN
    * excluded; ±∞ resolved from the endpoint counts without narrowing.
    * The final tail resolve is per-(group, value) counts, so even a
    * range collapsed to a couple of representable doubles with a huge
    * duplicate mass collects a handful of rows.
    */
  def kthSmallestByGroup(df: DataFrame, groupCol: String, valueCol: Column,
                         kOf: Long => Long, buckets: Int = 1024,
                         collectThreshold: Long = 4096): Map[String, Double] = {
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
    val done = scala.collection.mutable.Map[String, Double]()
    // live state per group: (lo, hi, k within the finite range, n live)
    val state = scala.collection.mutable.Map[String, (Double, Double, Long, Long)]()
    init.foreach { r =>
      val g = r.getString(0)
      val n = r.getLong(1); val nneg = r.getLong(2); val npos = r.getLong(3)
      val k = kOf(n)
      require(k >= 1 && k <= n, s"kOf($n) = $k out of range for group $g")
      if (k <= nneg) done(g) = Double.NegativeInfinity
      else if (k > n - npos) done(g) = Double.PositiveInfinity
      else {
        val lo = r.getDouble(4); val hi = r.getDouble(5)
        if (lo == hi) done(g) = lo
        else state(g) = (lo, hi, k - nneg, n - nneg - npos)
      }
    }
    val spark = df.sparkSession
    import spark.implicits._
    // INVARIANT: k stays ABSOLUTE within the group's finite value set;
    // each round recounts `v < lo` fresh (bucket −1) instead of
    // filtering to a carried range. The (v < lo) / (lo ≤ v ≤ hi)
    // partition is exact arithmetic on the current lo — no
    // edge-vs-filter ulp ambiguity can drop or double-count a
    // boundary value the way a carried closed-interval filter could.
    var rounds = 0
    while (state.nonEmpty && state.values.exists(_._4 > collectThreshold)
      && rounds < 64) {
      val live = state.toSeq.map { case (g, (lo, hi, _, _)) => (g, lo, hi) }
        .toDF("g", "__lo", "__hi")
      // same divide-then-subtract width and clamped bucket as the
      // global path, but per group via the broadcast state join;
      // rows below lo land in bucket −1 (the running "already ranked
      // before this range" count), rows above hi rank after and drop
      val b = when(col("v") < col("__lo"), lit(-1)).otherwise(
        greatest(least(floor((col("v") - col("__lo")) /
          (col("__hi") / buckets - col("__lo") / buckets)), lit(buckets - 1)),
          lit(0))).cast("int")
      val counts = vals0.join(broadcast(live), "g")
        .filter(col("v") <= col("__hi"))
        .groupBy(col("g"), b.as("b")).agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getString(0))
        .map { case (g, rows) =>
          g -> rows.map(r => r.getInt(1) -> r.getLong(2)).sortBy(_._1) }
      counts.foreach { case (g, bs) =>
        val (lo, hi, k, _) = state(g)
        val below = bs.find(_._1 == -1).map(_._2).getOrElse(0L)
        var acc = below
        val (bSel, cSel) = bs.filter(_._1 >= 0).find { case (_, c) =>
          val hit = acc + c >= k; if (!hit) acc += c; hit
        }.get
        def edge(bi: Int): Double =
          (lo / buckets) * (buckets - bi) + (hi / buckets) * bi
        val newLo = edge(bSel)
        val newHi = if (bSel == buckets - 1) hi else edge(bSel + 1)
        if (newLo == newHi) { done(g) = newLo; state.remove(g) }
        else state(g) = (newLo, newHi, k, cSel)
      }
      rounds += 1
    }
    if (state.nonEmpty) {
      // one final pass resolves EVERY remaining group: below-range mass
      // folds into a NULL key, in-range candidates come back as
      // per-(g, v) counts — bounded by the distinct candidates inside
      // each narrowed range even under huge duplicate mass
      val fin = state.toSeq.map { case (g, (lo, hi, _, _)) => (g, lo, hi) }
        .toDF("g", "__lo", "__hi")
      val cv = when(col("v") < col("__lo"), lit(null).cast("double"))
        .otherwise(col("v"))
      val tails = vals0.join(broadcast(fin), "g")
        .filter(col("v") <= col("__hi"))
        .groupBy(col("g"), cv.as("cv")).agg(count(lit(1)).as("c"))
        .collect()
        .groupBy(_.getString(0))
      state.foreach { case (g, (_, _, k, _)) =>
        val rows = tails(g)
        val below = rows.find(_.isNullAt(1)).map(_.getLong(2)).getOrElse(0L)
        val sorted = rows.filterNot(_.isNullAt(1))
          .map(r => r.getDouble(1) -> r.getLong(2)).sortBy(_._1)
        var acc = below
        done(g) = sorted.find { case (_, c) =>
          val hit = acc + c >= k; if (!hit) acc += c; hit
        }.get._1
      }
    }
    vals0.unpersist()
    done.toMap
  }
}
