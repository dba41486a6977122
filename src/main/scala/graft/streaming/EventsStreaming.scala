package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
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
}
