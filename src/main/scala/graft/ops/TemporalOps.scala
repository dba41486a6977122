package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no native rendition of.
  *
  * The classic as-of join (each left row picks the latest right row with
  * `right.ts <= left.ts` per key) is usually written as a range join —
  * which Spark would execute as a broadcast-nested-loop or a cross
  * product with a filter, both quadratic per key. The scalable plan is
  * union + carry-forward: tag both sides, sort each key's timeline once,
  * and let `last(_, ignoreNulls)` propagate the right payload down to
  * each left row. ONE shuffle on the key, O(n log n) per key, no range
  * scan — and every window is keyed, never global.
  */
object TemporalOps {

  /** As-of (backward) join: every `left` row gains the payload of the
    * most recent `right` row with `rightTs <= leftTs` on the same key,
    * or NULLs when no such row exists. Ties on the timestamp include the
    * right row (`>=`, the DuckDB/pandas convention).
    *
    * The matched right timestamp is surfaced as `<prefix>ts` alongside
    * the requested payload columns (renamed `<prefix><name>`).
    *
    * Right rows should be unique per (key, rightTs) — pre-aggregate
    * otherwise (e.g. `max_by`), or the carried payload among equal
    * timestamps is tie-broken arbitrarily.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String, rightPayload: Seq[String],
               prefix: String = "asof_",
               toleranceMicros: Option[Long] = None): DataFrame =
    withTolerance(
      asofCore(left, right, keys, leftTs, rightTs, rightPayload, prefix,
        forward = false),
      leftTs, prefix, rightPayload, forward = false, toleranceMicros)

  /** Forward as-of join: every `left` row gains the payload of the
    * EARLIEST `right` row with `rightTs >= leftTs` on the same key —
    * "the next event after": next price tick, next maintenance slot,
    * first response after a request. Equal timestamps match (the `<=`
    * mirror of [[asofJoin]]'s convention); same output naming.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                      leftTs: String, rightTs: String, rightPayload: Seq[String],
                      prefix: String = "asof_",
                      toleranceMicros: Option[Long] = None): DataFrame =
    withTolerance(
      asofCore(left, right, keys, leftTs, rightTs, rightPayload, prefix,
        forward = true),
      leftTs, prefix, rightPayload, forward = true, toleranceMicros)

  /** As-of join through the NATIVE physical operator
    * (graft.plans.AsOfJoinExec, planned via the AsOfJoinStrategy that
    * GraftExtensions injects): same contract as [[asofJoin]] /
    * [[asofJoinForward]], but each side shuffles once on its own key
    * and the match is a per-partition two-pointer merge — no unioned
    * relation, no carry-forward window over the merged width. Prefer
    * this at scale; the declarative spelling remains the pure-DataFrame
    * rendition (and this operator's differential oracle).
    *
    * NULL-timestamp right rows are dropped up front (they can never be
    * the match) — same normalization as the declarative core.
    */
  def asofJoinNative(left: DataFrame, right: DataFrame, keys: Seq[String],
                     leftTs: String, rightTs: String, rightPayload: Seq[String],
                     prefix: String = "asof_", forward: Boolean = false,
                     broadcastRight: Boolean = false,
                     toleranceMicros: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.GraftColumnShim
    val r2 = right.filter(col(rightTs).isNotNull)
    withTolerance(
      GraftColumnShim.ofRows(left.sparkSession,
        graft.plans.AsOfJoinPlan.resolved(
          GraftColumnShim.planOf(left), GraftColumnShim.planOf(r2),
          keys, leftTs, rightTs, rightPayload, prefix, forward,
          broadcast = broadcastRight)),
      leftTs, prefix, rightPayload, forward, toleranceMicros)
  }

  /** STALENESS BOUND (the pandas `merge_asof(tolerance=...)` contract):
    * a match farther than `toleranceMicros` from the probe instant is
    * no match — every output column of the as-of (payload + matched
    * ts) nulls out, exactly as if no right row existed. Applied as a
    * single post-projection over the join result, so ALL renditions
    * (declarative window, shuffle merge, broadcast probe, grouped) get
    * identical semantics with no exec change and no codegen break.
    * Inclusive boundary (distance == tolerance matches), mirroring the
    * inclusive instant-match convention of the joins themselves.
    * Timestamp columns compare in microseconds; numeric timeline
    * columns compare in their own units.
    */
  private def withTolerance(joined: DataFrame, leftTs: String, prefix: String,
                            rightPayload: Seq[String], forward: Boolean,
                            toleranceMicros: Option[Long]): DataFrame =
    toleranceMicros match {
      case None => joined
      case Some(tol) =>
        require(tol >= 0, "tolerance must be nonnegative")
        def us(c: Column): Column =
          if (joined.schema(leftTs).dataType ==
            org.apache.spark.sql.types.TimestampType) unix_micros(c)
          else c.cast("long")
        val dist =
          if (forward) us(col(s"${prefix}ts")) - us(col(leftTs))
          else us(col(leftTs)) - us(col(s"${prefix}ts"))
        val within = dist <= tol
        (rightPayload.map(c => s"$prefix$c") :+ s"${prefix}ts")
          .foldLeft(joined)((df, c) =>
            df.withColumn(c, when(within, col(c))))
    }

  /** GROUPED as-of (point-in-time feature join) — the feature-store
    * workload: ONE spine (entity, ts) relation picks up the latest
    * value from EACH of k feature tables (`featTs <= spineTs` per key,
    * ties included) in a SINGLE pass. Composing k two-sided as-of
    * joins would shuffle the spine k times (and the declarative
    * spelling would union+window k times); here ALL sides union into
    * one relation and ONE keyed window carries k payload structs down
    * the merged timeline — one exchange and one sort TOTAL, however
    * many feature tables join (plan-pinned in AsOfNativeSpec).
    *
    * `features` = (name, table, payload columns); each table needs
    * `keys` and a `featTs` timestamp column, and should be unique per
    * (keys, featTs) — pre-aggregate otherwise (same contract as
    * [[asofJoin]]). Output adds `<name>_<payload>` and `<name>_ts`
    * (the matched feature timestamp), NULLs where a feature has no
    * row at-or-before the spine instant. NULL keys / NULL timestamps
    * match nothing on any side.
    */
  def asofJoinFeatures(spine: DataFrame,
                       features: Seq[(String, DataFrame, Seq[String])],
                       keys: Seq[String], spineTs: String,
                       featTs: String): DataFrame = {
    require(features.nonEmpty, "need at least one feature table")
    require(features.map(_._1).distinct.size == features.size,
      "feature names must be unique")
    val packCols = features.map { case (n, _, _) => s"__pack_$n" }
    // each feature table contributes (keys, __ts, __side=0, its pack);
    // NULL-key / NULL-ts feature rows can never be "the latest match"
    // — drop them up front (same normalization as asofCore)
    val featSides = features.map { case (n, df, payload) =>
      val outCols = payload.map(c => c -> s"${n}_$c") :+ (featTs -> s"${n}_ts")
      df.filter(keys.foldLeft(col(featTs).isNotNull)(_ && col(_).isNotNull))
        .select(keys.map(col) :+ col(featTs).as("__ts") :+
          lit(0).as("__side") :+
          struct(outCols.map { case (c, o) => col(c).as(o) }: _*)
            .as(s"__pack_$n"): _*)
    }
    val spineSide = spine.withColumn("__ts", col(spineTs))
      .withColumn("__side", lit(1))
    val merged = featSides.foldLeft(spineSide)(
      _.unionByName(_, allowMissingColumns = true))
    // feature rows sort BEFORE spine rows at the same instant (ties
    // match); packs in the ordering make equal-(key, ts) duplicates
    // within one feature table carry deterministically
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts").asc +: col("__side") +:
        packCols.map(col(_).asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ALL k carries in one select over the IDENTICAL window spec — a
    // withColumn-per-pack chain would order each carry by the PREVIOUS
    // carry's output and plan k separate WindowExecs (k extra sorts);
    // a shared spec collapses to ONE WindowExec after the one exchange
    val carried = merged.select(
      merged.columns.filterNot(packCols.contains).map(col) ++
        packCols.map(p => last(col(p), ignoreNulls = true).over(w).as(p)): _*)
    val extracted = features.foldLeft(carried) { case (df, (n, _, payload)) =>
      (payload.map(c => s"${n}_$c") :+ s"${n}_ts").foldLeft(df)((d, o) =>
        d.withColumn(o, col(s"__pack_$n").getField(o)))
    }
    extracted.filter(col("__side") === 1)
      .drop("__ts" +: "__side" +: packCols: _*)
  }

  private def asofCore(left: DataFrame, right: DataFrame, keys: Seq[String],
                       leftTs: String, rightTs: String, rightPayload: Seq[String],
                       prefix: String, forward: Boolean): DataFrame = {
    val outCols = rightPayload.map(c => c -> s"$prefix$c") :+ (rightTs -> s"${prefix}ts")
    // The whole right payload rides in ONE struct carried by a single
    // last(_, ignoreNulls): the struct is non-NULL for every right row
    // even when payload fields inside it are NULL, so a NULL field of the
    // latest match stays NULL instead of being backfilled from an older
    // right row (per-column carries would mix values across right rows).
    // a NULL-timestamp right row can never be "the latest/next match"
    // (the SQL comparison is NULL) — drop it here, or null-ordering
    // would sort it to one end of the timeline and leak its payload.
    // Same for NULL-KEY right rows: SQL equi-join semantics say NULL
    // never matches, but Window.partitionBy groups NULLs into one
    // partition, so without this filter a NULL-key left row would
    // carry a NULL-key right row's payload (latent until r13, when
    // the native AsOfJoinExec's differential spec exposed it — the
    // harness events table has no NULL user_ids, so the oracle gate
    // never exercised the case)
    val r2 = right
      .filter(keys.foldLeft(col(rightTs).isNotNull)(_ && col(_).isNotNull))
      .select(
      (keys.map(col) :+ col(rightTs).as("__ts") :+ lit(0).as("__side")) :+
        struct(outCols.map { case (c, o) => col(c).as(o) }: _*).as("__pack"): _*)
    val l2 = left.withColumn("__ts", col(leftTs)).withColumn("__side", lit(1))
    // right rows sort BEFORE left rows at the same instant, so an equal
    // timestamp is visible to the left row (the >= contract); the
    // forward variant walks the timeline in reverse, which turns the
    // same carry into "earliest right row at or after". NULL-timestamp
    // LEFT rows must sort before every right row in BOTH walks (they
    // match nothing) — asc puts nulls first already; desc must say so.
    val ts = if (forward) col("__ts").desc_nulls_first else col("__ts").asc
    // __pack as the final key makes the tie-break DETERMINISTIC when
    // several right rows share (key, rightTs): last() then always
    // carries the struct-wise maximum payload instead of whichever row
    // the shuffle happened to order last (struct ordering is
    // field-by-field, so the first payload column decides)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(ts, col("__side"), col("__pack"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l2.unionByName(r2, allowMissingColumns = true)
      .withColumn("__pack", last(col("__pack"), ignoreNulls = true).over(w))
    outCols.foldLeft(carried) {
      case (df, (_, o)) => df.withColumn(o, col("__pack").getField(o))
    }.filter(col("__side") === 1).drop("__ts", "__side", "__pack")
  }

  /** Range (interval) join: inner-join each point row to every interval
    * row on the same key with `start <= point <= end` (inclusive).
    *
    * Spark plans a raw inequality join as broadcast-nested-loop — a per
    * key cross product. Bucketizing turns it into an EQUI-join: each
    * interval explodes to the `bucketWidth`-sized buckets it covers,
    * each point belongs to exactly ONE bucket (so no pair can meet
    * twice and no dedup is needed), the join runs hash-partitioned on
    * (key, bucket), and the residual between-filter trims the bucket
    * edges. Pick `bucketWidth` near the typical interval length: shuffle
    * grows with intervalLength/bucketWidth replicas per interval, while
    * huge buckets degrade toward the cross product.
    *
    * Columns are numeric (e.g. epoch micros) — convert timestamps first.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keys: Seq[String],
                pointCol: String, startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val pb = points.withColumn("__bucket",
      expr(s"`$pointCol` div $bucketWidth"))
    val ib = intervals.withColumn("__bucket",
      explode(sequence(
        expr(s"`$startCol` div $bucketWidth"),
        expr(s"`$endCol` div $bucketWidth"))))
    pb.join(ib, keys :+ "__bucket")
      .filter(col(pointCol).between(col(startCol), col(endCol)))
      .drop("__bucket")
  }
}
