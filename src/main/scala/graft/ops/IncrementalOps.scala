package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The incremental-idempotency primitive of the reference pipeline.
  *
  * Every append first diffs the candidate batch against what the target
  * partition already holds (reference: extract_flights.py:87;
  * load_dim_dates.py:35; load_fct_flights.py:105), so re-running a day
  * appends zero rows. `Dataset.except` is EXCEPT DISTINCT and resolves
  * columns POSITIONALLY — the reference reorders columns by hand before
  * every subtract (reference: load_fct_flights.py:92-100). We centralize
  * that here so column order can never silently drift.
  */
object IncrementalOps {

  /** `batch EXCEPT DISTINCT alreadyLoaded`, with both sides first
    * normalized to `alreadyLoaded`'s column order (by NAME, then applied
    * positionally — the safe rendition of the reference's manual reorder).
    *
    * NOTE (EXCEPT DISTINCT): duplicate rows inside `batch` are collapsed
    * by this path; they survive only on a first-ever write that skips the
    * diff (reference: extract_flights.py:87-92). Tests cover both branches.
    */
  def exceptNew(batch: DataFrame, alreadyLoaded: DataFrame): DataFrame = {
    val ordered = alreadyLoaded.columns.map(col).toSeq
    batch.select(ordered: _*).except(alreadyLoaded.select(ordered: _*))
  }

  /** True when the two frames hold the same row multiset — the *fixed*
    * rendition of the reference's dead object-identity comparison
    * (reference: load_dim_aircrafts.py:126, load_dim_airports.py:54,
    * always-false `==` on DataFrame objects). Used to skip dim rewrites.
    */
  def sameContent(a: DataFrame, b: DataFrame): Boolean = {
    val ordered = a.columns.sorted.map(col).toSeq
    val x = a.select(ordered: _*)
    val y = b.select(ordered: _*)
    // exceptAll both ways = multiset equality without a full sort
    x.exceptAll(y).isEmpty && y.exceptAll(x).isEmpty
  }

  /** Incremental aggregate maintenance: merge an existing aggregate
    * with a delta aggregate over the same keys by re-summing the
    * mergeable measure columns. For sums/counts (and any commutative
    * monoid) this equals the from-scratch aggregate over the combined
    * input — the property that lets a daily rollup absorb one day's
    * partial instead of rescanning the full history at every load.
    * The merge input is two aggregate relations (keys-cardinality
    * rows), so the shuffle is tiny regardless of fact size.
    */
  def mergeAggregates(existing: DataFrame, delta: DataFrame,
                      keys: Seq[String], measures: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.sum
    val aggs = measures.map(m => sum(col(m)).as(m))
    existing.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
  }
}
