package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type 2 maintenance — the history-keeping
  * upgrade of the reference's full-snapshot dim replace
  * (load_dim_airports.py/load_dim_aircrafts.py overwrite the dim each
  * run; SCD2 keeps every version with a validity interval instead).
  *
  * Scale shape: one full outer join of the OPEN slice against the new
  * snapshot on the business key — closed history rows pass through
  * untouched (never shuffled), and all row fates (keep / close /
  * insert) are decided from that single join with null-safe attribute
  * comparison. No window functions, no per-key sort.
  */
object ScdOps {

  /** Merge a new full snapshot into an SCD2 dimension.
    *
    * @param current  SCD2 table: key, attrs..., valid_from DATE,
    *                 valid_to DATE (null = open/current version)
    * @param snapshot new full snapshot: key, attrs...
    * @param key      business key column
    * @param attrs    tracked attribute columns (a change in ANY opens
    *                 a new version)
    * @param effectiveDate close/open boundary for this run
    *
    * Semantics per open row: attrs unchanged → row kept as-is; attrs
    * changed → row closed at effectiveDate AND a new open row inserted;
    * key absent from the snapshot → row kept open (dims rarely
    * hard-delete; compose with a delete feed if they do). Keys new in
    * the snapshot insert as open rows. Closed rows are immutable.
    */
  def scd2Merge(current: DataFrame, snapshot: DataFrame, key: String,
                attrs: Seq[String], effectiveDate: String): DataFrame = {
    val eff = to_date(lit(effectiveDate))
    // presence markers, NOT attribute nullness: an all-null-attrs row
    // on either side is still present
    val open = current.filter(col("valid_to").isNull)
      .withColumn("__open_present", lit(1))
    val closedHist = current.filter(col("valid_to").isNotNull)
    val snapCols = snapshot.select(
      col(key) +: attrs.map(a => col(a).as(s"__snap_$a")): _*)
      .withColumn("__snap_present", lit(1))
    val j = open.join(snapCols, Seq(key), "full")
    // null-safe: a null attribute value is a value, not a wildcard
    val changed: Column = attrs.map(a => !(col(a) <=> col(s"__snap_$a")))
      .reduce(_ || _)
    val inSnap = col("__snap_present").isNotNull
    val inOpen = col("__open_present").isNotNull
    // all three row fates in ONE pass over the join: a per-row
    // conditional array of output structs, exploded, nulls dropped.
    // Filtering the join three times re-EXECUTED it three times (no
    // subplan sharing across branches — six base-table scans for a
    // dim merge, plan-audited r12); a changed row legitimately emits
    // two outputs (close + insert), which is exactly the explode.
    // array(when(...)) keeps everything codegen (no higher-order
    // filter); the null placeholders drop in a plain post-explode
    // filter.
    val keepS = struct((col(key) +: attrs.map(col) :+ col("valid_from") :+
      col("valid_to")).zip(key +: attrs :+ "valid_from" :+ "valid_to")
      .map { case (c, n) => c.as(n) }: _*)
    val closeS = struct((col(key) +: attrs.map(col) :+ col("valid_from") :+
      eff).zip(key +: attrs :+ "valid_from" :+ "valid_to")
      .map { case (c, n) => c.as(n) }: _*)
    val insertS = struct((col(key) +: attrs.map(a => col(s"__snap_$a")) :+
      eff :+ lit(null).cast("date")).zip(key +: attrs :+ "valid_from" :+ "valid_to")
      .map { case (c, n) => c.as(n) }: _*)
    val merged = j.select(explode(array(
        when(inOpen && (!inSnap || !changed), keepS),
        when(inOpen && inSnap && changed, closeS),
        when(inSnap && (!inOpen || changed), insertS))).as("__r"))
      .filter(col("__r").isNotNull)
      .select(col("__r.*"))
    closedHist.select(col(key) +: attrs.map(col)
        :+ col("valid_from") :+ col("valid_to"): _*)
      .unionByName(merged)
  }
}
