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

  /** The k-th smallest value (1-based) of a numeric column. */
  def kthSmallest(df: DataFrame, valueCol: Column, k: Long,
                  buckets: Int = 1024, collectThreshold: Long = 65536): Double = {
    require(k >= 1, "k is 1-based")
    val vals0 = df.select(valueCol.cast("double").as("v")).filter(col("v").isNotNull)
    val firstRow = vals0.agg(min(col("v")), max(col("v")), count(lit(1))).head()
    require(k <= firstRow.getLong(2), s"k=$k exceeds ${firstRow.getLong(2)} rows")
    var lo = firstRow.getDouble(0)
    var hi = firstRow.getDouble(1)
    var vals = vals0
    var kk = k
    var n = firstRow.getLong(2)
    // each round divides the range by `buckets`; 64 rounds bottoms out
    // double precision long before this guard can trigger
    var rounds = 0
    while (n > collectThreshold && lo < hi && rounds < 64) {
      val width = (hi - lo) / buckets
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
      val newLo = lo + bSel * width
      val newHi = if (bSel == buckets - 1) hi else lo + (bSel + 1) * width
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
