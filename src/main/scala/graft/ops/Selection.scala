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
}
