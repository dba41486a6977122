package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventsStreaming
import graft.streaming.EventsStreaming.Event

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val fixture = Seq(
    Event(1L, ts(0), 7L, "click", 1.0),
    Event(2L, ts(10), 7L, "click", 2.0),
    Event(3L, ts(20), 8L, "view", 5.0),
    Event(4L, ts(59), 7L, "click", 3.0))

  private def writeFixture(dir: String): Unit =
    fixture.toDS().write.mode("overwrite").parquet(dir)

  test("tumbling window stream aggregates by event time under a watermark") {
    val in = tmpDir("stream-in")
    writeFixture(in)
    val events = EventsStreaming.readEvents(spark, in, implicitly[org.apache.spark.sql.Encoder[Event]].schema)
    val agg = EventsStreaming.tumblingCounts(events)
    val q = agg.writeStream
      .format("memory").queryName("tumbling")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", tmpDir("ckpt1"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("tumbling").collect()
    val clicks = rows.find(_.getAs[String]("event_type") == "click").get
    assert(clicks.getAs[Long]("n") == 3L)
    assert(clicks.getAs[Double]("total_value") == 6.0)
    assert(rows.find(_.getAs[String]("event_type") == "view").get.getAs[Long]("n") == 1L)
  }

  test("mapGroupsWithState keeps per-user running stats") {
    val in = tmpDir("stream-in2")
    writeFixture(in)
    val events = EventsStreaming
      .readEvents(spark, in, implicitly[org.apache.spark.sql.Encoder[Event]].schema)
      .as[Event]
    val stats = EventsStreaming.userStats(events)
    val q = stats.writeStream
      .format("memory").queryName("userstats")
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", tmpDir("ckpt2"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val u7 = spark.table("userstats").filter($"user_id" === 7L).collect()(0)
    assert(u7.getAs[Long]("n_events") == 3L)
    assert(u7.getAs[Double]("total_value") == 6.0)
    assert(u7.getAs[java.sql.Timestamp]("first_ts") == ts(0))
    assert(u7.getAs[java.sql.Timestamp]("last_ts") == ts(59))
  }

  test("foreachBatch idempotent sink: replaying the same input appends zero") {
    val in = tmpDir("stream-in3")
    val out = tmpDir("stream-out") + "/events"
    writeFixture(in)
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema

    EventsStreaming.runAvailableNow(
      EventsStreaming.readEvents(spark, in, schema), out, tmpDir("ckpt3"))
    assert(spark.read.parquet(out).count() == 4)

    // fresh checkpoint -> the stream re-reads everything; sink must diff
    EventsStreaming.runAvailableNow(
      EventsStreaming.readEvents(spark, in, schema), out, tmpDir("ckpt4"))
    assert(spark.read.parquet(out).count() == 4)
  }
}
