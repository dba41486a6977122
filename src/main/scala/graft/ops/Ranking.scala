package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group rank without a group-partitioned sort — the
  * scale-safe shape for "percentile-rank every row within its source"
  * when one group dominates the corpus (a web crawl is easily 80-90%
  * of a 100 TB mix, so `Window.partitionBy(source)` plans a
  * single-task sort of most of the data).
  *
  * Band decomposition, the same discipline as
  * [[graft.text.Curation.budgetSelect]]: values are bucketed into
  * `bands` equal-width integer bands (a monotone function of the
  * value, so ties always share a band); ONE aggregation counts rows
  * per (group, band) — a ≤ groups×bands histogram, metadata scale,
  * collected driver-side like a fitted model; each band's
  * rows-strictly-below offset and its group's total broadcast back;
  * and the in-band `rank()` runs under a window PARTITIONED BY
  * (group, band) — per-partition state is one band of one group, not
  * a whole source. Global rank = band offset + in-band rank, exactly,
  * because the band is monotone in the value and tied values (rank
  * peers) can never straddle a band boundary.
  */
object Ranking {

  /** Appends `__rk` (1-based competition rank of `valueCol` ascending
    * within `groupCol`; ties are peers, like SQL `rank()`) and `__n`
    * (the group's row count) to every row of `df`.
    *
    * Driver discipline: only the (group, band) count histogram is
    * collected — callers must keep groups×`bands` driver-bounded (the
    * [[Selection.kthSmallestByGroupMulti]] contract; source/event-type
    * cardinalities are fine, a million-group call is not).
    *
    * Null tolerance: rows with a NULL group, NULL/NaN value, or ±∞
    * value are unrankable under equal-width banding. They pass through
    * with null `__rk`/`__n` — degrade, don't abort: one dirty row in a
    * 100 TB corpus must not kill the whole rank (and NullInputSpec
    * sweeps exactly this). Clean rows rank against clean rows only
    * (`__n` counts the group's RANKED rows, SQL's nulls-excluded
    * aggregate convention).
    */
  def rankByGroup(df: DataFrame, groupCol: String, valueCol: String,
                  bands: Int = 1024): DataFrame = {
    require(bands >= 1, s"rankByGroup: bands must be positive: $bands")
    val spark = df.sparkSession
    val v = col(valueCol).cast("double")
    // never NULL under three-valued logic: if v is null, v.isNull is
    // true and true OR null = true; all terms are non-null otherwise
    val dirty = col(groupCol).isNull || v.isNull || isnan(v) ||
      v.isin(Double.NegativeInfinity, Double.PositiveInfinity)
    def passThrough(x: DataFrame): DataFrame =
      x.withColumn("__rk", lit(null).cast("long"))
        .withColumn("__n", lit(null).cast("long"))
    val mm = df.agg(min(when(!dirty, v)), max(when(!dirty, v)),
      count(when(!dirty, 1))).head()
    if (mm.getLong(2) == 0L) return passThrough(df)
    val lo = mm.getDouble(0)
    val hi = mm.getDouble(1)
    // divide-then-subtract keeps the width finite on extreme ranges
    // (the Selection.kthSmallest precedent); a constant column (lo ==
    // hi) has width 0 — every row is band 0 and in-band rank IS the rank
    val width = hi / bands - lo / bands
    val bandCol =
      if (width == 0.0) lit(0)
      else greatest(least(floor((v - lit(lo)) / lit(width)),
        lit(bands - 1)), lit(0)).cast("int")
    val banded = df.filter(!dirty).withColumn("__band", bandCol)
    val hist = banded
      .groupBy(col(groupCol).cast("string").as("__g"), col("__band"))
      .agg(count(lit(1)).as("__c"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    val offsets = hist.groupBy(_._1).iterator.flatMap { case (g, rows) =>
      val total = rows.map(_._3).sum
      var acc = 0L
      rows.sortBy(_._2).map { case (_, b, c) =>
        val before = acc; acc += c; (g, b, before, total)
      }
    }.toIndexedSeq
    val offsetDf = spark.createDataFrame(offsets)
      .toDF("__g", "__ob", "__before", "__n")
    val w = Window.partitionBy(col(groupCol), col("__band")).orderBy(v)
    val ranked = banded
      .join(broadcast(offsetDf),
        col(groupCol).cast("string") === col("__g") &&
          col("__band") === col("__ob"))
      .withColumn("__rk", col("__before") + rank().over(w))
      .drop("__g", "__ob", "__band", "__before")
    ranked.unionByName(passThrough(df.filter(dirty)))
  }
}
