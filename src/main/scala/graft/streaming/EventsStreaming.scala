package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.StructType
import graft.ops.IncrementalOps

/** Structured Streaming rendition of the engine's event pipelines
  * (SURVEY §2.10): the reference achieves streaming semantics with
  * Airflow-driven daily batch + subtract-idempotent appends; here the
  * same transforms run as real streams — file source, event-time
  * watermark, windowed aggregation, keyed custom state, and a
  * foreachBatch sink that reuses the exact batch EXCEPT-DISTINCT
  * primitive for idempotent appends.
  *
  * Everything is keyed (user_id / window) — state scales horizontally
  * with the key space, never a global window.
  */
object EventsStreaming {

  final case class Event(event_id: Long, ts: java.sql.Timestamp,
                         user_id: Long, event_type: String, value: Double)

  final case class UserStats(user_id: Long, n_events: Long, total_value: Double,
                             first_ts: java.sql.Timestamp, last_ts: java.sql.Timestamp)

  /** Parquet-directory file source (the streaming twin of Tables.events). */
  def readEvents(spark: SparkSession, dir: String, schema: StructType): DataFrame =
    spark.readStream.schema(schema).parquet(dir)

  /** Tumbling event-time window aggregation with a watermark: the
    * streaming twin of EventQueries.qEventsTumbling. Late data beyond
    * the watermark is dropped instead of re-folded — the stream-native
    * replacement for the reference's re-run-the-day batch fold.
    */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours",
                     window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /** Declarative sessionization via the native session_window
    * aggregate — the built-in alternative to [[sessionizeStream]]'s
    * explicit flatMapGroupsWithState machine: Spark merges overlapping
    * per-key gap windows and the WATERMARK is what closes a session
    * (Append emits it only once event time passes session end). Use
    * this form when per-session output is plain aggregates; the state
    * machine remains for custom split/emission logic.
    */
  def sessionWindowStats(events: DataFrame, gap: String = "30 minutes",
                         watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  final case class StaleKey(user_id: Long, last_ts: java.sql.Timestamp)

  /** Absence (missed-heartbeat) detection: emits one StaleKey record
    * when a key that HAS been seen goes silent for `horizonSeconds` of
    * EVENT time — monitoring's "host stopped reporting", the inverse of
    * every presence-triggered operator here. Timeouts fire off the
    * watermark, so silence is judged by the stream's own clock, not
    * wall-clock; a flagged key's state is dropped (re-appearing later
    * re-arms detection from scratch). State per live key is one
    * timestamp — O(keys), bounded.
    *
    * Restart posture: the per-key timestamp and armed timeout live in
    * the checkpointed state store; a crash between a batch's state
    * write and its commit marker replays that batch bit-identically
    * against the prior state version (StreamingSpec pins
    * kill-and-restart: no double flag, re-arm preserved).
    */
  def staleKeys(events: Dataset[Event], horizonSeconds: Long,
                watermark: String = "0 seconds"): Dataset[StaleKey] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Long, StaleKey](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator.single(StaleKey(userId, new java.sql.Timestamp(last)))
          } else {
            val latest = (batch.map(_.ts.getTime) ++ state.getOption.iterator).max
            state.update(latest)
            state.setTimeoutTimestamp(latest + horizonSeconds * 1000)
            Iterator.empty
          }
      }
  }

  /** Keyed custom state via mapGroupsWithState: per-user running stats
    * that survive across micro-batches (processing-time timeout left to
    * the caller's trigger cadence).
    */
  def userStats(events: Dataset[Event]): Dataset[UserStats] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserStats, UserStats](GroupStateTimeout.NoTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserStats]) =>
          val prev = state.getOption.getOrElse(
            UserStats(userId, 0L, 0.0, null, null))
          val evs = batch.toSeq
          val next = UserStats(
            userId,
            prev.n_events + evs.size,
            prev.total_value + evs.map(_.value).sum,
            Seq(Option(prev.first_ts), evs.map(_.ts).minOption)
              .flatten.minBy(_.getTime),
            Seq(Option(prev.last_ts), evs.map(_.ts).maxOption)
              .flatten.maxBy(_.getTime))
          state.update(next)
          next
      }
  }

  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
                           session_end: java.sql.Timestamp,
                           n_events: Long, total_value: Double)

  /** Ingest-time exact dedup with BOUNDED state:
    * dropDuplicatesWithinWatermark keeps an event_id only until the
    * watermark passes its event time, so replayed/duplicated deliveries
    * inside the lateness horizon collapse while state stays O(window),
    * not O(stream) — the streaming twin of Dedup.exactGroups for the
    * ingest edge of a training-data pipeline.
    */
  def dedupStream(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("event_id")

  /** Gap-based sessionization as a stream: flatMapGroupsWithState with
    * an EVENT-TIME timeout. Events accumulate per user; when the
    * watermark passes last-event + gap the state times out and the
    * closed session is emitted (Append mode — sessions are immutable
    * once out). The batch twin is EventQueries.qEventsSessionize; state
    * is strictly per-user and bounded by the gap.
    */
  def sessionizeStream(events: Dataset[Event],
                       gapSeconds: Long = 1800,
                       watermark: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Session, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, batch: Iterator[Event], state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val closed = state.get
            state.remove()
            Iterator.single(closed)
          } else {
            // fold the open session + this batch (event-time order) into
            // session runs, splitting wherever the gap is exceeded —
            // a single batch spanning several sessions emits the inner
            // ones immediately and only the trailing one stays open
            val closed = scala.collection.mutable.ListBuffer[Session]()
            var open = state.getOption
            batch.toSeq.sortBy(_.ts.getTime).foreach { e =>
              open match {
                case Some(s) if e.ts.getTime - s.session_end.getTime <= gapSeconds * 1000 =>
                  // an in-watermark event may still precede the open
                  // session's start (out-of-order across micro-batches —
                  // sorting is per-batch only): widen the start too
                  open = Some(s.copy(
                    session_start =
                      if (e.ts.getTime < s.session_start.getTime) e.ts else s.session_start,
                    session_end = if (e.ts.getTime > s.session_end.getTime) e.ts else s.session_end,
                    n_events = s.n_events + 1,
                    total_value = s.total_value + e.value))
                case Some(s) =>
                  closed += s
                  open = Some(Session(userId, e.ts, e.ts, 1L, e.value))
                case None =>
                  open = Some(Session(userId, e.ts, e.ts, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              // close when the event-time watermark passes end + gap
              state.setTimeoutTimestamp(s.session_end.getTime + gapSeconds * 1000)
            }
            closed.iterator
          }
      }
  }

  /** Streaming throttle — the ANCHOR-based rate limit q_event_debounce's
    * scaladoc defers here: per (user, event_type), emit an event only
    * when at least `horizonSeconds` have passed since the last EMITTED
    * event (not merely the previous event — a steady sub-horizon drizzle
    * is suppressed entirely after its first event, which the lag-based
    * batch debounce cannot express without iterative state). State is
    * ONE timestamp per live key, evicted by event-time timeout once the
    * watermark passes a full quiet horizon — O(active keys), never
    * O(stream). Within a batch the group iterates in event-time order,
    * so a batch spanning several horizons emits each window's anchor.
    *
    * Restart posture: the anchor is checkpointed state — recovery from
    * a crash before a batch's commit marker replays it against the
    * prior state version, so the anchor neither resets nor
    * double-advances (StreamingSpec pins kill-and-restart).
    */
  def throttleStream(events: Dataset[Event], horizonSeconds: Long,
                     watermark: String = "0 seconds"): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[java.sql.Timestamp, Event](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (_: (Long, String), batch: Iterator[Event],
         state: GroupState[java.sql.Timestamp]) =>
          if (state.hasTimedOut) {
            // quiet for a full horizon: forget the anchor — the next
            // event starts a fresh window (and is emitted)
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ListBuffer[Event]()
            var anchor = state.getOption.map(_.getTime)
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              // >= : "at least horizonSeconds have passed" admits an
              // event landing exactly on the horizon boundary
              if (anchor.forall(a => e.ts.getTime - a >= horizonSeconds * 1000)) {
                out += e
                anchor = Some(e.ts.getTime)
              }
            }
            anchor.foreach { a =>
              state.update(new java.sql.Timestamp(a))
              state.setTimeoutTimestamp(a + horizonSeconds * 1000)
            }
            out.iterator
          }
      }
  }

  /** Stream-stream event-time interval join (impression→conversion
    * attribution): each conversion joins the same user's impressions
    * whose timestamp lies in [conv_ts − horizon, conv_ts]. Both sides
    * carry watermarks and the join condition bounds the time range, so
    * the symmetric hash join can EVICT state as the watermark advances
    * — state is O(keys · horizon), never O(stream). Inner join: an
    * attribution row exists only once both sides have arrived.
    */
  /** @param joinType "inner" (attributions only) or "left_outer" —
    *   unconverted impressions emit with null conversion columns once
    *   the watermark passes their horizon, so conversion RATE is
    *   computable from the stream itself. Outer rows only materialize
    *   as the watermark advances: state must expire before Spark can
    *   prove no match is coming.
    */
  def attributionJoin(impressions: DataFrame, conversions: DataFrame,
                      horizonSeconds: Long = 1800,
                      watermark: String = "1 hour",
                      joinType: String = "inner"): DataFrame = {
    val imp = impressions
      .select(col("event_id").as("imp_id"), col("user_id").as("imp_user"),
        col("ts").as("imp_ts"))
      .withWatermark("imp_ts", watermark)
    val conv = conversions
      .select(col("event_id").as("conv_id"), col("user_id").as("conv_user"),
        col("ts").as("conv_ts"), col("value"))
      .withWatermark("conv_ts", watermark)
    imp.join(conv,
      col("imp_user") === col("conv_user") &&
        col("conv_ts") >= col("imp_ts") &&
        col("conv_ts") <= col("imp_ts") + expr(s"interval $horizonSeconds seconds"),
      joinType)
      .select(col("imp_user").as("user_id"), col("imp_id"), col("conv_id"),
        col("imp_ts"), col("conv_ts"), col("value"))
  }

  /** Stream-static enrichment join: a stream joined to a batch
    * dimension broadcasts the dim into every micro-batch — no state
    * store at all (unlike stream-stream joins), and the dim is re-read
    * per trigger so slowly-updated reference tables stay current
    * without restarting the query. The left join keeps events whose
    * key is missing from the dim (late dim arrival must not drop
    * facts — same posture as the batch J3 left-joins).
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
                   key: String): DataFrame =
    events.join(broadcast(dim), Seq(key), "left")

  /** Stream-static AS-OF enrichment: each streaming event picks the
    * dimension version valid AT ITS EVENT TIME (latest `dimTs <=`
    * event time per key) — the point-in-time-correct rendition of
    * [[enrichStream]] for VERSIONED reference tables (price history,
    * config history, SCD2 dims). A plain equi-join would stamp every
    * event with today's row; replays would then enrich differently
    * than the live run did — the training-serving-skew bug the batch
    * `q_pit_join` exists to prevent, now closed on the streaming path.
    *
    * Mechanics: the native broadcast as-of exec
    * ([[graft.plans.AsOfBroadcastJoinExec]]) probes each micro-batch
    * IN PLACE — stateless (no state store), zero stream-side shuffle,
    * and the per-key timeline index is memoized per executor across
    * batches of the same broadcast. The dim is re-broadcast per
    * trigger, so an updated history takes effect on the next batch
    * without a query restart.
    */
  def asofEnrichStream(events: DataFrame, versionedDim: DataFrame,
                       keys: Seq[String], eventTs: String, dimTs: String,
                       payload: Seq[String],
                       prefix: String = "asof_"): DataFrame =
    graft.ops.TemporalOps.asofJoinNative(events, versionedDim, keys,
      eventTs, dimTs, payload, prefix, broadcastRight = true)

  /** Streaming GROUPED as-of enrichment — the online feature-store
    * shape: each streaming event reads the point-in-time-correct value
    * of K feature timelines at once (user spend history, session stats,
    * risk scores — each its own versioned table). Column contract
    * matches the batch [[graft.ops.TemporalOps.asofJoinFeatures]]
    * exactly (`<name>_<col>` payloads + `<name>_ts` match stamps), so a
    * training pipeline built on the batch op serves online from this
    * one with no renames — the training/serving-skew seam closed by
    * construction.
    *
    * Mechanics: K chained broadcast as-of probes
    * ([[graft.plans.AsOfBroadcastJoinExec]]), one per feature table.
    * Each probe is STATELESS map-side work inside the micro-batch —
    * zero stream-side shuffle, zero state store, one pass over the
    * events with K point lookups per row — and each table's per-key
    * timeline index is memoized per executor across triggers
    * (AsOfIndexCache). The batch op's union+single-window plan is the
    * right shape when spine AND features are both huge; on a stream
    * the features are dimension-sized by definition, so K probes beat
    * shuffling every micro-batch K+1 ways. Feature tables are re-read
    * and re-broadcast per trigger: a feature update takes effect on
    * the next batch without a query restart.
    */
  def asofEnrichStreamFeatures(events: DataFrame,
                               features: Seq[(String, DataFrame, Seq[String])],
                               keys: Seq[String], eventTs: String,
                               featTs: String): DataFrame = {
    require(features.nonEmpty, "need at least one feature table")
    require(features.map(_._1).distinct.size == features.size,
      "feature names must be unique")
    features.foldLeft(events) { case (df, (n, dim, payload)) =>
      graft.ops.TemporalOps.asofJoinNative(df, dim, keys, eventTs, featTs,
        payload, s"${n}_", broadcastRight = true)
    }
  }

  /** Idempotent streaming sink: every micro-batch is diffed against the
    * target (the U2 EXCEPT-DISTINCT primitive) before appending, so
    * replayed batches append zero rows — exactly the reference's
    * subtract-then-append contract, now per micro-batch.
    */
  def idempotentAppendSink(out: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val delta =
      if (!graft.ops.Fs.exists(out)) batch.dropDuplicates()
      else IncrementalOps.exceptNew(batch, spark.read.parquet(out))
    if (!delta.isEmpty)
      delta.write.mode("append").parquet(out)
  }

  /** Drain all available input once (batch-boundary streaming — the
    * Trigger.AvailableNow rendition of the reference's daily runs) into
    * an idempotent parquet sink. Returns after the stream finishes.
    *
    * Append output mode, deliberately: the sink is append-only, so for an
    * aggregated stream Update mode would persist earlier micro-batches'
    * partial aggregates alongside the later corrected rows (EXCEPT-
    * DISTINCT only removes exact duplicates). Under Append, a
    * watermarked aggregation emits only finalized windows, and a
    * non-watermarked one is rejected up front by Spark's unsupported-
    * operation check instead of silently corrupting the table.
    */
  def runAvailableNow(df: DataFrame, out: String, checkpoint: String): Unit = {
    val q = df.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch(idempotentAppendSink(out) _)
      .start()
    q.awaitTermination()
  }

  /** Streaming incremental-aggregate sink: each micro-batch's keyed
    * partial aggregate is absorbed into a persistent rollup via
    * [[IncrementalOps.mergeAggregates]] — the reference's @daily rollup
    * cadence made continuous. Only keys-cardinality relations ever
    * merge or rewrite; the fact stream is aggregated once, per batch,
    * and never rescanned.
    *
    * Exactly-once across replays WITHOUT a transactional store: the
    * rollup is written as a versioned directory `rollup-<batchId>`
    * (committed = has `_SUCCESS`), readers take the highest committed
    * version, and a batch whose id is ≤ the highest committed version
    * is skipped — foreachBatch re-delivers a replayed batch under the
    * SAME id, so a crash between write and GC can only leave a
    * superseded directory behind, never double-count a batch. A fresh
    * checkpoint restarts ids at 0, which the same guard turns into a
    * no-op replay (matching [[idempotentAppendSink]]'s contract).
    *
    * @param partial batch → its keyed partial aggregate; must emit
    *   `keys ++ measures`, measures mergeable by sum (counts, sums —
    *   any commutative monoid in sum form)
    */
  /** Versioned-directory absorb discipline shared by every absorb sink:
    * committed = `<prefix>-<version>` dirs carrying `_SUCCESS`; a batch
    * whose id is ≤ the highest committed version is skipped (replay
    * absorbs zero — foreachBatch re-delivers under the SAME id);
    * otherwise `merged(latestDir)` is written as the next version and
    * superseded versions are GC'd AFTER the commit (best-effort: a
    * crash strands a stale dir that readers ignore, never
    * double-counts).
    *
    * ID-REGRESSION guard: a skipped batch with id EQUAL to the
    * committed version is the normal crash-replay (same id, same
    * already-absorbed data). A skipped id STRICTLY BELOW it cannot
    * come from an intact checkpoint (ids are monotone) — it means the
    * checkpoint was reset while the absorb directory survived, and
    * whatever the restarted stream re-reads as batch 0..latest−1 may
    * include genuinely NEW input that is being dropped. That case is
    * counted in [[absorbIdRegressions]] and shouted to stderr so a
    * reset-against-live-sink misconfiguration is loud, not silent.
    */
  @volatile private[graft] var absorbIdRegressions: Long = 0L

  private def absorbVersioned(spark: SparkSession, out: String, prefix: String,
                              batchId: Long)
                             (merged: Option[String] => DataFrame): Unit = {
    import org.apache.hadoop.fs.Path
    val base = new Path(out)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val committed: Seq[(Long, Path)] =
      if (!fs.exists(base)) Seq.empty
      else fs.listStatus(base).toSeq.filter(_.isDirectory).flatMap { st =>
        st.getPath.getName.stripPrefix(s"$prefix-").toLongOption
          .filter(_ => st.getPath.getName.startsWith(s"$prefix-") &&
            fs.exists(new Path(st.getPath, "_SUCCESS")))
          .map(_ -> st.getPath)
      }.sortBy(_._1)
    val latest = committed.lastOption
    if (latest.exists(_._1 >= batchId)) { // replayed batch: already absorbed
      if (latest.exists(_._1 > batchId)) {
        absorbIdRegressions += 1
        System.err.println(
          s"[absorb] $out: batch $batchId skipped below committed $prefix " +
            s"version ${latest.get._1} — a RESET CHECKPOINT against a live " +
            "absorb directory drops re-read input; restore the checkpoint " +
            "or point the sink at a fresh directory")
      }
      return
    }
    merged(latest.map(_._2.toString))
      .write.mode("overwrite").parquet(s"$out/$prefix-$batchId")
    committed.foreach { case (_, p) => fs.delete(p, true) }
  }

  /** The highest committed `<prefix>-<version>` dir under `out`. */
  private def latestVersioned(spark: SparkSession, out: String,
                              prefix: String): Option[String] = {
    import org.apache.hadoop.fs.Path
    val base = new Path(out)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) None
    else fs.listStatus(base).toSeq.filter(_.isDirectory)
      .filter(st => st.getPath.getName.startsWith(s"$prefix-") &&
        fs.exists(new Path(st.getPath, "_SUCCESS")))
      .flatMap(st => st.getPath.getName.stripPrefix(s"$prefix-").toLongOption
        .map(_ -> st.getPath))
      .sortBy(_._1).lastOption.map(_._2.toString)
  }

  def rollupAbsorbSink(out: String, keys: Seq[String], measures: Seq[String],
                       partial: DataFrame => DataFrame)
                      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    absorbVersioned(spark, out, "rollup", batchId) { latest =>
      val delta = partial(batch)
      latest.fold(delta) { p =>
        IncrementalOps.mergeAggregates(
          spark.read.parquet(p), delta, keys, measures)
      }.select((keys ++ measures).map(col): _*)
    }
  }

  /** Streaming heavy-hitters absorb: each micro-batch is sketched
    * DISTRIBUTED into a capacity-m SpaceSaving summary (only ≤ m
    * finished items ever reach the driver — bounded metadata, the
    * k-means-centroid discipline), then merged with the persisted
    * sketch under the mergeable-summaries rule and re-persisted. The
    * continuous rendition of q_heavy_hitters: top tokens over the WHOLE
    * stream history in O(m) state, no token dictionary ever stored or
    * shuffled. Same versioned `sketch-<batchId>` replay guard as
    * [[rollupAbsorbSink]] — a replayed batch absorbs zero. In the
    * exact regime (observed distinct ≤ m, no evictions on any path)
    * the absorbed sketch carries the EXACT stream-total counts; in
    * general the SpaceSaving bounds hold (every item with true count
    * > n/m present, overestimate ≤ err < n/m).
    */
  def heavyHittersAbsorbSink(out: String, capacity: Int, tokenCol: String)
                            (batch: DataFrame, batchId: Long): Unit = {
    import graft.functions.SpaceSavingAggregator
    import SpaceSavingAggregator.Item
    val spark = batch.sparkSession
    import spark.implicits._
    absorbVersioned(spark, out, "sketch", batchId) { latest =>
      val delta: List[Item] = batch
        .agg(SpaceSavingAggregator.spaceSaving(capacity)(col(tokenCol)).as("sk"))
        .select(explode(col("sk")).as("it"))
        .select(col("it.token").as("token"), col("it.count").as("count"),
          col("it.err").as("err"))
        .as[Item].collect().toList
      val prior: List[Item] = latest
        .map(p => spark.read.parquet(p).as[Item].collect().toList)
        .getOrElse(Nil)
      new SpaceSavingAggregator.SpaceSaving(capacity)
        .merge(prior, delta).toDS().toDF().coalesce(1)
    }
  }

  /** The highest committed sketch written by
    * [[heavyHittersAbsorbSink]], as (token, count, err) rows sorted
    * heaviest-first (None before the first batch commits).
    */
  def currentHeavyHitters(spark: SparkSession, out: String): Option[DataFrame] =
    latestVersioned(spark, out, "sketch")
      .map(p => spark.read.parquet(p).orderBy(col("count").desc, col("token")))

  final case class WindowTop(window_start: java.sql.Timestamp, rank: Int,
                             event_type: String, n: Long, err: Long)

  /** Per-window top-k heavy hitters, emitted when the watermark CLOSES
    * the window — "top event types per hour" as an append-mode stream.
    * Chained stateful aggregations (window count → per-window rank)
    * are unsupported in Append mode, so this is one
    * flatMapGroupsWithState keyed by the window bucket whose state is
    * a capacity-m SpaceSaving summary: state stays O(m) per LIVE
    * window even over an unbounded type domain (the q_heavy_hitters
    * discipline made windowed), exact whenever a window's distinct
    * types fit in m. Event-time timeout at window end retires the
    * state — closed windows cost nothing.
    */
  def windowedTopKStream(events: Dataset[Event], k: Int = 3,
                         capacity: Int = 64, windowSeconds: Long = 3600,
                         watermark: String = "0 seconds"): Dataset[WindowTop] = {
    import events.sparkSession.implicits._
    import graft.functions.SpaceSavingAggregator
    import SpaceSavingAggregator.Item
    val wMs = windowSeconds * 1000
    events.withWatermark("ts", watermark)
      .groupByKey(e => math.floorDiv(e.ts.getTime, wMs))
      .flatMapGroupsWithState[List[Item], WindowTop](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (win: Long, batch: Iterator[Event], state: GroupState[List[Item]]) =>
          val sk = new SpaceSavingAggregator.SpaceSaving(capacity)
          if (state.hasTimedOut) {
            val top = state.get.sorted(Ordering.by((i: Item) => (-i.count, i.token)))
              .take(k)
            state.remove()
            top.iterator.zipWithIndex.map { case (i, r) =>
              WindowTop(new java.sql.Timestamp(win * wMs), r + 1,
                i.token, i.count, i.err)
            }
          } else {
            val delta = batch.foldLeft(List.empty[Item])(
              (b, e) => sk.reduce(b, e.event_type))
            state.update(sk.merge(state.getOption.getOrElse(Nil), delta))
            state.setTimeoutTimestamp((win + 1) * wMs)
            Iterator.empty
          }
      }
  }

  /** Streaming weight-proportional exact-k sample absorb: the
    * continuous rendition of q_priority_sample. Priority sampling's
    * selection is a mergeable top-k — topk(A∪B) = topk(topk(A)∪B) —
    * and each row's priority is a pure deterministic function of
    * (id, weight), so absorbing "union the persisted k rows with the
    * batch, keep the top k" maintains EXACTLY the sample a one-shot
    * pass over all history would pick, in O(k) state — scoped to
    * VALID-weight rows: negative-weight rows carry a NULL priority
    * (contract violation, see priorityMicros) and are dropped outright
    * here, whereas a one-shot orderBy-desc/limit-k (and batch
    * q_priority_sample) would retain them in the tail of an
    * under-filled sample. The merge-equals-one-shot law therefore
    * holds over the contract-respecting subset of history. The
    * per-batch top-k is computed distributed (TakeOrdered); only k
    * rows ever reach the sink state. Same versioned replay guard as
    * the other absorb sinks — a replayed batch absorbs zero.
    */
  def prioritySampleAbsorbSink(out: String, k: Int, idCol: String,
                               weightCol: String)
                              (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    absorbVersioned(spark, out, "sample", batchId) { latest =>
      val delta = batch.select(
        col(idCol).cast("long").as("id"),
        col(weightCol).cast("long").as("weight"))
        // priority over the CAST columns: `div` is integral-only, and a
        // double weight (e.g. Event.value) must truncate identically on
        // every path for the merge-equals-one-shot law to hold
        .withColumn("priority", graft.text.Curation.priorityMicros("id", "weight"))
        // negative-weight rows carry a NULL priority (contract
        // violation, see priorityMicros); desc only pushes NULLs last,
        // so when a batch has fewer than k valid rows they'd enter —
        // and then persist in — the sample state. Drop them outright.
        .filter(col("priority").isNotNull)
        .orderBy(col("priority").desc, col("id")).limit(k)
      latest.fold(delta)(p => spark.read.parquet(p).unionByName(delta))
        .orderBy(col("priority").desc, col("id")).limit(k)
        .coalesce(1)
    }
  }

  /** The highest committed sample written by
    * [[prioritySampleAbsorbSink]], heaviest-priority first (None before
    * the first batch commits).
    */
  def currentPrioritySample(spark: SparkSession, out: String): Option[DataFrame] =
    latestVersioned(spark, out, "sample")
      .map(p => spark.read.parquet(p).orderBy(col("priority").desc, col("id")))

  /** Streaming distinct-count absorb: per micro-batch the per-key HLL
    * registers are built DISTRIBUTED ([[graft.functions.Hll]] — 4 KiB
    * binary per key), merged register-wise with the persisted sketch
    * relation by one keyed `hll_merge` aggregation, and re-persisted
    * under the same versioned replay guard. The continuous "distinct
    * users per segment over all history" — the one rollup
    * [[rollupAbsorbSink]] CANNOT absorb (distinct is not a sum; naive
    * per-batch distinct counts double-count returners). Register
    * merge is idempotent AND associative, so the absorbed sketch is
    * byte-identical to the one-shot sketch over the whole history.
    */
  def distinctAbsorbSink(out: String, keys: Seq[String], valueCol: String)
                        (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    absorbVersioned(spark, out, "hll", batchId) { latest =>
      val delta = batch.groupBy(keys.map(col): _*)
        .agg(graft.functions.Hll.hll_sketch(col(valueCol)).as("sketch"))
      latest.fold(delta) { p =>
        spark.read.parquet(p).unionByName(delta)
          .groupBy(keys.map(col): _*)
          .agg(graft.functions.Hll.hll_merge(col("sketch")).as("sketch"))
      }
    }
  }

  /** The highest committed HLL relation written by
    * [[distinctAbsorbSink]], with the cardinality estimate projected
    * out per key (None before the first batch commits).
    */
  def currentDistinct(spark: SparkSession, out: String,
                      keys: Seq[String]): Option[DataFrame] =
    latestVersioned(spark, out, "hll").map { p =>
      spark.read.parquet(p)
        .select(keys.map(col) :+
          graft.functions.Hll.hll_estimate(col("sketch")).as("approx_distinct"): _*)
        .orderBy(keys.map(col): _*)
    }

  /** The highest committed rollup written by [[rollupAbsorbSink]]
    * (None before the first batch commits).
    */
  def currentRollup(spark: SparkSession, out: String): Option[DataFrame] =
    latestVersioned(spark, out, "rollup").map(p => spark.read.parquet(p))

  /** Streaming corpus ingest with a near-dup screen — the continuous
    * form of [[graft.dedup.Dedup.minhashPairsCross]]: every micro-batch
    * of candidate documents is screened (Jaccard ≥ tau) against the
    * standing corpus PLUS everything earlier batches admitted, then
    * screened against itself (within-batch near-dup groups keep their
    * min-id member), and only the survivors append to `out`.
    *
    * Admission monotonicity: once a doc is in the sink it becomes part
    * of the screen for every later batch, so a near-copy arriving in a
    * later crawl — or the same batch replayed after a crash — can never
    * be re-admitted (replay safety comes from the final id-level
    * anti-join against the sink). Per batch the cost is the cross
    * screen's O(batch bands + collisions), not corpus².
    */
  /** Streaming boilerplate-scrub ingest: each micro-batch's documents
    * are scrubbed of repeated spans (≥ `minSpanTokens` tokens whose
    * every `gramLen`-window occurs ≥ `minCount` times across the
    * PERSISTED gram index ∪ the batch), the cleaned rows append to
    * `out`, and the batch's gram counts merge into the versioned index
    * — [[graft.dedup.Dedup.repeatedSpansCross]] made continuous, with
    * the corpus-index-never-rescanned property intact: per batch the
    * work is batch grams + one dimension join against the index.
    *
    * Replay: the index is the replay authority (same versioned-dir
    * guard as every absorb sink); a replayed batch is skipped BEFORE
    * the append, so the cleaned rows land exactly once. Crash between
    * append and index commit re-delivers the batch, and the id-level
    * anti-join against the sink drops the already-appended rows.
    *
    * @return nothing; cleaned rows in `out`, gram index under
    *         `indexDir` as `grams-<batchId>` (gh, c)
    */
  def boilerplateScrubSink(idCol: String, textCol: String,
                           out: String, indexDir: String,
                           gramLen: Int = 8, minCount: Long = 2L,
                           minSpanTokens: Long = 16L)
                          (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import org.apache.spark.sql.expressions.Window
    val committedVersion = latestVersioned(spark, indexDir, "grams")
      .map(p => new org.apache.hadoop.fs.Path(p).getName
        .stripPrefix("grams-").toLong)
    if (committedVersion.exists(_ >= batchId)) return // replayed batch
    val b = batch.dropDuplicates(idCol)
    val bg = graft.dedup.Dedup.tokenGrams(b, idCol, textCol, gramLen)
      .persist()
    try {
      val batchCounts = bg.groupBy(col("gh")).agg(count(lit(1)).as("c"))
      val index = latestVersioned(spark, indexDir, "grams")
        .map(p => spark.read.parquet(p))
      val total = index.fold(batchCounts) { idx =>
        idx.unionByName(batchCounts)
          .groupBy(col("gh")).agg(sum(col("c")).as("c"))
      }.persist()
      val admitted = total.filter(col("c") >= minCount).select(col("gh"))
      val spans = graft.dedup.Dedup.islandSpans(bg.join(admitted, "gh"), gramLen)
        .filter(col("span_tokens") >= minSpanTokens)
        .groupBy(col("doc_id"))
        .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
      val cleaned = b
        .select(col(idCol), graft.text.TextAnalysis.tokens(col(textCol)).as("__t"))
        .filter(size(col("__t")) > 0)
        .join(spans.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
        .select(col(idCol),
          concat_ws(" ", graft.dedup.Dedup.keptTokens).as("clean_text"),
          (size(col("__t")) - size(graft.dedup.Dedup.keptTokens)).cast("bigint")
            .as("n_removed"))
      // id-level replay safety for the append (crash between append and
      // index commit re-delivers the batch); persisted so the emptiness
      // probe and the write share one execution of the scrub pipeline
      val delta = (
        if (graft.ops.Fs.exists(out))
          cleaned.join(spark.read.parquet(out).select(col(idCol)),
            Seq(idCol), "left_anti")
        else cleaned).persist()
      try {
        if (!delta.isEmpty) delta.write.mode("append").parquet(out)
        // commit the merged index LAST — it is the replay authority
        absorbVersioned(spark, indexDir, "grams", batchId)(_ => total)
      } finally delta.unpersist()
      total.unpersist()
    } finally bg.unpersist()
  }

  /** Streaming decontamination: scrub benchmark-overlapping spans from
    * every arriving document BEFORE it lands in the corpus sink —
    * [[graft.dedup.Dedup.scrubContaminatedSpans]] made continuous, so
    * benchmark leakage never enters the training corpus at all instead
    * of being hunted down later. `benchGrams` is the STATIC distinct
    * gram-hash index of the benchmark release
    * (`Dedup.tokenGrams(bench, ...).select("gh").distinct` — build once,
    * callers may cache); per batch the work is batch window hashes +
    * one semi dimension join + the per-doc islands window. Unlike
    * [[boilerplateScrubSink]] there is nothing to learn and no carried
    * state, so no versioned index: replay safety is the id-level
    * anti-join against the sink alone (a replayed batch's docs are all
    * already appended, so the delta is empty).
    *
    * @return nothing; (id, clean_text, n_removed) appended to `out`
    */
  def decontaminateScrubSink(benchGrams: DataFrame, idCol: String,
                             textCol: String, out: String, gramLen: Int = 8,
                             minSpanTokens: Long = 8L)
                            (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val b = batch.dropDuplicates(idCol)
    val bg = graft.dedup.Dedup.tokenGrams(b, idCol, textCol, gramLen)
    val spans = graft.dedup.Dedup.islandSpans(
        bg.join(benchGrams.select(col("gh")), Seq("gh"), "left_semi"), gramLen)
      .filter(col("span_tokens") >= minSpanTokens)
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    val cleaned = b
      .select(col(idCol), graft.text.TextAnalysis.tokens(col(textCol)).as("__t"))
      .filter(size(col("__t")) > 0)
      .join(spans.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .select(col(idCol),
        concat_ws(" ", graft.dedup.Dedup.keptTokens).as("clean_text"),
        (size(col("__t")) - size(graft.dedup.Dedup.keptTokens)).cast("bigint")
          .as("n_removed"))
    // persisted: the emptiness probe and the write share one execution
    val delta = (
      if (graft.ops.Fs.exists(out))
        cleaned.join(spark.read.parquet(out).select(col(idCol)),
          Seq(idCol), "left_anti")
      else cleaned).persist()
    try {
      if (!delta.isEmpty) delta.write.mode("append").parquet(out)
    } finally delta.unpersist()
  }

  /** Streaming cluster MAINTENANCE — the keep-everything dual of
    * [[nearDupScreenSink]]: every document is admitted, and the
    * near-dup component labeling is kept continuously correct by
    * [[graft.dedup.Dedup.dedupClustersIncremental]] — per batch, the
    * batch's intra- and cross-corpus near-dup edges contract against
    * the persisted labels (cost ∝ batch + touched components, never
    * the corpus graph), so the label store is an incrementally-
    * maintained materialized view of the full clustering. Labels
    * commit under the versioned replay guard; the text store appends
    * behind an id anti-join, so a replayed batch changes nothing. A
    * crash between the label commit and the text append leaves label
    * rows whose text lands on the batch's replay — labels never
    * regress, the text store catches up.
    */
  def clusterMaintainSink(idCol: String, textCol: String, out: String,
                          tau: Double = 0.6)
                         (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val docsStore = s"$out/docs"
    val b = batch.dropDuplicates(idCol).persist()
    try {
      val priorDocs =
        if (graft.ops.Fs.exists(docsStore)) Some(spark.read.parquet(docsStore))
        else None
      absorbVersioned(spark, s"$out/labels", "labels", batchId) { latest =>
        val intra = graft.dedup.Dedup
          .minhashPairs(b, idCol, textCol, tau = tau)
          .select(col("doc_a"), col("doc_b"))
        val cross = priorDocs.map { pd =>
          graft.dedup.Dedup
            .minhashPairsCross(pd.select(col(idCol), col(textCol)), b,
              idCol, textCol, tau = tau)
            .select(col("doc_a"), col("doc_b"))
        }
        val pairs = cross.fold(intra)(intra.unionByName(_))
        val prior = latest.map(spark.read.parquet)
          .getOrElse(Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id"))
        graft.dedup.Dedup
          .dedupClustersIncremental(prior, b.select(col(idCol)), idCol, pairs)
          .coalesce(1)
      }
      val delta = priorDocs.fold(b)(pd =>
        b.join(pd.select(col(idCol)), Seq(idCol), "left_anti"))
      if (!delta.isEmpty)
        delta.select(col(idCol), col(textCol)).write.mode("append").parquet(docsStore)
    } finally b.unpersist()
  }

  /** The highest committed labeling written by [[clusterMaintainSink]]
    * (None before the first batch commits).
    */
  def currentClusters(spark: SparkSession, out: String): Option[DataFrame] =
    latestVersioned(spark, s"$out/labels", "labels")
      .map(p => spark.read.parquet(p).orderBy(col("doc_id")))

  def nearDupScreenSink(staticCorpus: DataFrame, idCol: String, textCol: String,
                        out: String, tau: Double = 0.6)
                       (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val sunk =
      if (graft.ops.Fs.exists(out)) Some(spark.read.parquet(out)) else None
    val corpus = sunk.fold(staticCorpus.select(col(idCol), col(textCol))) { s =>
      staticCorpus.select(col(idCol), col(textCol))
        .unionByName(s.select(col(idCol), col(textCol)))
    }
    val b = batch.dropDuplicates(idCol)
    // within-batch screen: of each near-dup pair (doc_a < doc_b) the
    // higher id goes; transitively the min id of each group survives
    val intraDup = graft.dedup.Dedup.minhashPairs(b, idCol, textCol, tau = tau)
      .select(col("doc_b").as(idCol)).distinct()
    val crossDup = graft.dedup.Dedup.minhashPairsCross(corpus, b, idCol, textCol, tau = tau)
      .select(col("doc_b").as(idCol)).distinct()
    val admitted = b
      .join(intraDup, Seq(idCol), "left_anti")
      .join(crossDup, Seq(idCol), "left_anti")
    val delta = sunk.fold(admitted) { s =>
      admitted.join(s.select(col(idCol)), Seq(idCol), "left_anti")
    }.persist() // the screen plan feeds BOTH the emptiness probe and the
                // write — without a persist each would run the candidate
                // joins + exact verify end to end
    try {
      if (!delta.isEmpty)
        delta.write.mode("append").parquet(out)
    } finally delta.unpersist()
  }

  /** Exact total-variation distance in integer micros between two
    * count histograms — the same integer-micros discipline as
    * `q_dist_drift` / [[graft.functions.DetMath]]: each share rounds
    * to micros exactly (floor((2·n·10⁶ + tot) / (2·tot)) in Long),
    * absolute differences sum exactly, and the single final /2 floors.
    * An empty histogram has all-zero shares (TVD vs anything = that
    * side's mass/2).
    */
  private[graft] def tvdMicros(a: Map[Long, Long], b: Map[Long, Long]): Long = {
    def share(n: Long, tot: Long): Long =
      if (tot == 0L) 0L else (2L * n * 1000000L + tot) / (2L * tot)
    val (ta, tb) = (a.values.sum, b.values.sum)
    (a.keySet ++ b.keySet).toSeq
      .map(k => math.abs(share(a.getOrElse(k, 0L), ta)
        - share(b.getOrElse(k, 0L), tb))).sum / 2
  }

  /** Streaming distribution-drift monitor — the continuous rendition
    * of `q_dist_drift`: each micro-batch's banded histogram is
    * absorbed into a persisted cumulative histogram (same versioned
    * `hist-<batchId>` replay guard as [[rollupAbsorbSink]] — a
    * replayed batch absorbs zero), and a per-batch drift record
    * (batch_id, n_rows, tvd_batch_micros, tvd_cum_micros — both TVDs
    * against the pinned REFERENCE profile) is written to its own
    * `drift-<batchId>` dir, overwrite-idempotent under replay. The
    * batch TVD flags a poisoned ingest batch the moment it lands; the
    * cumulative TVD shows whether the whole stream is wandering off
    * the vetted profile. Driver traffic is bounded by the band count,
    * never the batch size — `bandOf` must clamp to a finite band
    * domain (the [[tvdMicros]] shares stay overflow-safe to ~4.6e12
    * rows per histogram).
    *
    * @param reference pinned (band → count) profile, e.g. a vetted
    *   corpus batch's histogram
    * @param bandOf    row → band expression, clamped to a small domain
    */
  def driftMonitorSink(out: String, reference: Map[Long, Long], bandOf: Column)
                      (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    absorbVersioned(spark, out, "hist", batchId) { latest =>
      // a NULL band (bandOf of a NULL value) carries no distribution
      // information — excluded from the histogram rather than NPE-ing
      // the driver-side collect
      val delta: Map[Long, Long] = batch.select(bandOf.cast("long").as("band"))
        .filter(col("band").isNotNull)
        .groupBy(col("band")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val prior: Map[Long, Long] = latest
        .map(p => spark.read.parquet(p).collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap)
        .getOrElse(Map.empty)
      val cum = (prior.keySet ++ delta.keySet)
        .map(b => b -> (prior.getOrElse(b, 0L) + delta.getOrElse(b, 0L))).toMap
      Seq((batchId, delta.values.sum, tvdMicros(delta, reference),
        tvdMicros(cum, reference)))
        .toDF("batch_id", "n_rows", "tvd_batch_micros", "tvd_cum_micros")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/drift-$batchId")
      cum.toSeq.sortBy(_._1).toDF("band", "n").coalesce(1)
    }
  }

  /** Streaming ANN-index maintenance: the PQ model is FIT ONCE on the
    * first non-empty batch and persisted as fitted parameters
    * (m·kw rows, driver-bounded); every batch after that is encoded
    * MAP-SIDE against the stored model and committed as its own
    * `index-<batchId>` segment — so the corpus-sized work per batch is
    * one narrow projection, never a refit or an index rewrite. A
    * replayed batch finds its segment committed (`_SUCCESS`) and
    * absorbs zero; a crash between model save and segment write
    * re-encodes with the SAME stored model, so the segment is
    * byte-stable under replay. An empty batch AFTER the model exists
    * commits an (empty) segment; empty batches BEFORE the first
    * non-empty one absorb nothing and commit nothing — the replay
    * guard is the segment-id HIGH-WATER mark, which both cases keep
    * monotone. Segment compaction is
    * the same small-files story as every append sink here
    * (ops/Layout); search = [[graft.similarity.Similarity.pqSearchEncoded]]
    * over the segment union, exact-reranked against the caller's
    * vector store.
    */
  def annIndexMaintainSink(out: String, idCol: String, vecCol: String,
                           m: Int = 16, kw: Int = 32)
                          (batch: DataFrame, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    import graft.similarity.Similarity
    val spark = batch.sparkSession
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // Replay guard is a HIGH-WATER MARK, not per-segment existence:
    // foreachBatch delivers ids in order, so any committed segment id
    // ≥ batchId proves this batch was already absorbed — and the guard
    // survives [[compactAnnIndex]] folding old segments away (a
    // per-directory probe would re-absorb a replayed batch whose
    // segment was compacted into a higher id).
    recoverAnnCompaction(fs, out)
    val committed = annSegmentIds(fs, out)
    if (committed.exists(_ >= batchId)) {
      // same id-regression discipline as absorbVersioned: an id
      // STRICTLY below the high-water mark cannot come from an intact
      // checkpoint — shout, because a reset checkpoint against a live
      // index silently drops whatever the re-read batches contain
      if (committed.exists(_ > batchId)) {
        absorbIdRegressions += 1
        System.err.println(
          s"[absorb] $out: batch $batchId skipped below committed index " +
            s"high-water ${committed.max} — a RESET CHECKPOINT against a " +
            "live ANN index drops re-read input; restore the checkpoint " +
            "or point the sink at a fresh directory")
      }
      return
    }
    val vecs = batch.filter(col(vecCol).isNotNull)
    val modelPath = s"$out/model"
    val books: Option[Seq[Seq[Array[Double]]]] =
      if (fs.exists(new Path(s"$modelPath/_SUCCESS")))
        Some(Similarity.loadPqModel(spark, modelPath))
      else if (vecs.isEmpty) None // nothing to fit on yet; no segment —
                                  // the first non-empty batch fits
      else {
        val b = Similarity.pqFit(vecs, idCol, vecCol, m, kw)
        Similarity.savePqModel(spark, modelPath, b)
        Some(b)
      }
    books.foreach { b =>
      Similarity.pqEncode(vecs, idCol, vecCol, b)
        .write.mode("overwrite").parquet(s"$out/index-$batchId")
    }
  }

  /** Committed `index-<id>` segment ids under `out`, ascending. */
  private def annSegmentIds(fs: org.apache.hadoop.fs.FileSystem,
                            out: String): Seq[Long] = {
    import org.apache.hadoop.fs.Path
    val base = new Path(out)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.filter(_.isDirectory)
      .filter(st => st.getPath.getName.startsWith("index-") &&
        fs.exists(new Path(st.getPath, "_SUCCESS")))
      .flatMap(_.getPath.getName.stripPrefix("index-").toLongOption)
      .sorted
  }

  /** The committed (id, codes) segment union written by
    * [[annIndexMaintainSink]], plus the stored model. */
  def currentAnnIndex(spark: SparkSession, out: String)
      : Option[(DataFrame, Seq[Seq[Array[Double]]])] = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAnnCompaction(fs, out)
    if (!fs.exists(new Path(s"$out/model/_SUCCESS"))) return None
    val segs = annSegmentIds(fs, out).map(i => s"$out/index-$i")
    if (segs.isEmpty) None
    else Some((spark.read.parquet(segs: _*),
      graft.similarity.Similarity.loadPqModel(spark, s"$out/model")))
  }

  /** Complete (or roll back) a crashed [[compactAnnIndex]]: the
    * `_COMPACT_APPLY` marker is the intent record — once it exists
    * with a committed `compact-tmp`, the swap MUST finish (tmp holds
    * the full union); without a committed tmp the attempt rolls back
    * and the original segments are untouched. Idempotent. */
  private def recoverAnnCompaction(fs: org.apache.hadoop.fs.FileSystem,
                                   out: String): Unit = {
    import org.apache.hadoop.fs.Path
    val marker = new Path(s"$out/_COMPACT_APPLY")
    if (!fs.exists(marker)) return
    val tmp = new Path(s"$out/compact-tmp")
    if (fs.exists(new Path(tmp, "_SUCCESS"))) {
      val in = fs.open(marker)
      val hi = try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
      annSegmentIds(fs, out)
        .foreach(i => fs.delete(new Path(s"$out/index-$i"), true))
      annCompactSwap(fs, out, tmp, hi, marker)
    } else {
      if (fs.exists(tmp)) fs.delete(tmp, true)
      fs.delete(marker, false)
    }
  }

  /** The swap tail shared by compactor and recovery: clear any partial
    * destination (a crashed delete can leave an UNCOMMITTED index-<hi>
    * that rename would otherwise collide with or nest into), rename
    * tmp in, and only then drop the intent marker. Filesystem verbs
    * report failure by RETURN VALUE, not exception — a swallowed false
    * here would strand the index unreadable while claiming success, so
    * both are checked and a failed rename keeps the marker for retry.
    */
  private def annCompactSwap(fs: org.apache.hadoop.fs.FileSystem, out: String,
                             tmp: org.apache.hadoop.fs.Path, hi: Long,
                             marker: org.apache.hadoop.fs.Path): Unit = {
    import org.apache.hadoop.fs.Path
    val dst = new Path(s"$out/index-$hi")
    if (fs.exists(dst) && !fs.delete(dst, true))
      throw new java.io.IOException(
        s"ANN compaction: cannot clear partial $dst; marker kept for retry")
    if (!fs.rename(tmp, dst))
      throw new java.io.IOException(
        s"ANN compaction: rename $tmp -> $dst failed; marker kept for retry")
    fs.delete(marker, false)
  }

  /** Compact the committed index segments into ONE segment carrying
    * the highest committed id — the small-files maintenance every
    * append sink eventually needs. The surviving id IS the high-water
    * mark the sink's replay guard checks, so compaction never enables
    * a replayed batch to re-absorb. Crash-safe two-phase swap: the
    * full union is first committed OUT OF the reader namespace
    * (`compact-tmp` — not an `index-*` name, so readers ignore it),
    * then an intent marker makes the swap mandatory, then originals
    * drop and tmp renames in; [[recoverAnnCompaction]] — run by the
    * sink, the readers and this method — completes or rolls back any
    * crash point without losing a row. Run while the maintenance
    * stream is idle (like any file-level maintenance on an append
    * sink); no-op below two segments.
    */
  def compactAnnIndex(spark: SparkSession, out: String): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(out).getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverAnnCompaction(fs, out)
    val ids = annSegmentIds(fs, out)
    if (ids.size < 2) return
    val hi = ids.max
    spark.read.parquet(ids.map(i => s"$out/index-$i"): _*)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/compact-tmp")
    val marker = new Path(s"$out/_COMPACT_APPLY")
    val os = fs.create(marker, true)
    try os.write(hi.toString.getBytes("UTF-8")) finally os.close()
    ids.foreach(i => fs.delete(new Path(s"$out/index-$i"), true))
    annCompactSwap(fs, out, new Path(s"$out/compact-tmp"), hi, marker)
  }

  /** Streaming EMBEDDING-drift monitor — the vector-modality twin of
    * [[driftMonitorSink]]: per batch, the centroid of the arriving
    * embeddings (per-dim sums of round(x·10⁶) — exact integer micros,
    * the labelCentroidMicros discipline) is compared to a pinned
    * REFERENCE centroid by SQUARED L2 distance in micros² — an exact
    * integer, no sqrt, no float drift — and the per-dim sums absorb
    * into a cumulative state so the whole-stream centroid shift is
    * tracked too. An embedding pipeline whose upstream encoder was
    * swapped or whose crawl mix moved shows up as a dist² step the
    * batch it lands. Driver traffic is dim-sized; replay guard and
    * drift-record idempotence exactly as the banded monitor.
    *
    * @param reference pinned per-dim centroid in integer micros
    */
  def embeddingDriftSink(out: String, reference: Array[Long], vecCol: String)
                        (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    def dist2(sums: Array[Long], n: Long): Long =
      if (n == 0L) -1L // no vectors yet: no defined centroid
      else reference.indices.map { d =>
        // mean in micros, round-half-AWAY-FROM-ZERO — the
        // labelCentroidMicros convention (plain integer division
        // truncates toward zero and would round negative sums wrong)
        val a = math.abs(sums(d))
        val m0 = (2L * a + n) / (2L * n)
        val m = if (sums(d) < 0L) -m0 else m0
        val diff = m - reference(d)
        diff * diff
      }.sum
    absorbVersioned(spark, out, "esum", batchId) { latest =>
      val rows = batch.filter(col(vecCol).isNotNull)
        .select(posexplode(col(vecCol)).as(Seq("d", "x")))
        .groupBy(col("d"))
        .agg(sum(expr("CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)"))
          .as("sm"), count(lit(1)).as("n"))
        .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
      val dim = reference.length
      val deltaSums = Array.tabulate(dim)(d => rows.get(d).map(_._1).getOrElse(0L))
      // the batch vector count is DIM 0's count — every non-empty
      // vector contributes there. An arbitrary map entry would be
      // wrong under ragged dimensionality (short vectors, or extra
      // dims beyond the reference after an encoder swap) — which is
      // also a drift signal in its own right, so shout it instead of
      // silently folding it into a polluted centroid
      val deltaN = rows.get(0).map(_._2).getOrElse(0L)
      val ragged = rows.exists { case (d, (_, n)) =>
        d >= dim || n != deltaN }
      if (ragged)
        System.err.println(
          s"[drift] $out batch $batchId: ragged embedding dimensionality " +
            s"(reference dim $dim; per-dim counts ${rows.toSeq.sortBy(_._1)
              .map { case (d, (_, n)) => s"$d:$n" }.mkString(",")}) — " +
            "upstream encoder change suspected; dims beyond the reference " +
            "are excluded from the distance")
      val (priorSums, priorN) = latest.map { p =>
        val prev = spark.read.parquet(p).collect()
          .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
        (Array.tabulate(dim)(d => prev.get(d).map(_._1).getOrElse(0L)),
          prev.headOption.map(_._2._2).getOrElse(0L))
      }.getOrElse((Array.fill(dim)(0L), 0L))
      val cumSums = Array.tabulate(dim)(d => priorSums(d) + deltaSums(d))
      val cumN = priorN + deltaN
      Seq((batchId, deltaN, dist2(deltaSums, deltaN), dist2(cumSums, cumN)))
        .toDF("batch_id", "n_vecs", "dist2_batch_micros2", "dist2_cum_micros2")
        .coalesce(1).write.mode("overwrite").parquet(s"$out/drift-$batchId")
      cumSums.indices.map(d => (d, cumSums(d), cumN)).toDF("d", "sm", "n")
        .coalesce(1)
    }
  }

  /** All drift records written by [[driftMonitorSink]], batch order. */
  def currentDriftLog(spark: SparkSession, out: String): Option[DataFrame] = {
    import org.apache.hadoop.fs.Path
    val base = new Path(out)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) None
    else {
      val dirs = fs.listStatus(base).toSeq.filter(_.isDirectory)
        .filter(st => st.getPath.getName.startsWith("drift-") &&
          fs.exists(new Path(st.getPath, "_SUCCESS")))
        .map(_.getPath.toString)
      if (dirs.isEmpty) None
      else Some(spark.read.parquet(dirs: _*).orderBy(col("batch_id")))
    }
  }

  /** The cumulative band histogram absorbed by [[driftMonitorSink]]. */
  def currentDriftHistogram(spark: SparkSession, out: String): Option[DataFrame] =
    latestVersioned(spark, out, "hist")
      .map(p => spark.read.parquet(p).orderBy(col("band")))
}
