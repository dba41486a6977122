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

  test("as-of enrichment: each streamed event reads the dim version valid at ITS event time") {
    val in = tmpDir("stream-asof-in")
    writeFixture(in)
    // versioned dim: user 7 changes tier at 10:15; user 8 has one
    // version from 10:30 (AFTER its only event — must enrich as NULL)
    val dim = Seq(
      (7L, ts(0), "bronze"), (7L, ts(15), "gold"), (8L, ts(30), "vip"))
      .toDF("user_id", "valid_from", "tier")
    val events = EventsStreaming.readEvents(spark, in,
      implicitly[org.apache.spark.sql.Encoder[Event]].schema)
    val enriched = EventsStreaming.asofEnrichStream(events, dim,
      Seq("user_id"), "ts", "valid_from", Seq("tier"))
    val q = enriched.writeStream
      .format("memory").queryName("asofenrich")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("ckpt-asof"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val got = spark.table("asofenrich")
      .select(col("event_id"), col("asof_tier"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === Map(
      1L -> Some("bronze"),  // 10:00 event: pre-change version
      2L -> Some("bronze"),  // 10:10: still bronze (gold starts 10:15)
      3L -> None,            // user 8 at 10:20: no version valid yet
      4L -> Some("gold")),   // 10:59: the 10:15 version
      "streaming enrichment must be point-in-time, not latest-row")
    // and it matches the BATCH as-of on the same data exactly
    val batch = graft.ops.TemporalOps.asofJoinNative(
      fixture.toDS().toDF(), dim, Seq("user_id"), "ts", "valid_from",
      Seq("tier"), broadcastRight = true)
      .select(col("event_id"), col("asof_tier"))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(got === batch, "stream and batch renditions must agree")
  }

  test("grouped as-of enrichment: K feature timelines per event across ≥2 batches, ≡ batch op, replay-zero") {
    val in = tmpDir("stream-pit-in")
    fixture.toDS().write.mode("overwrite").parquet(in)
    // two independent versioned feature tables (the online feature-
    // store shape): tier changes mid-stream; spend has an early and a
    // late version per user
    val tiers = Seq(
      (7L, ts(0), "bronze"), (7L, ts(15), "gold"), (8L, ts(30), "vip"))
      .toDF("user_id", "valid_from", "tier")
    val spend = Seq((7L, ts(5), 10.0), (7L, ts(55), 99.0), (8L, ts(0), 3.0))
      .toDF("user_id", "valid_from", "spend")
    val features = Seq(
      ("tier", tiers, Seq("tier")), ("spend", spend, Seq("spend")))
    val events = EventsStreaming.readEvents(spark, in,
      implicitly[org.apache.spark.sql.Encoder[Event]].schema)
    val enriched = EventsStreaming.asofEnrichStreamFeatures(
      events, features, Seq("user_id"), "ts", "valid_from")
    val q = enriched.writeStream
      .format("memory").queryName("pitfeat")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("ckpt-pitfeat"))
      .start()
    def canon(rows: Array[org.apache.spark.sql.Row]) = rows.map { r =>
      (r.getAs[Long]("event_id"),
        Option(r.getAs[String]("tier_tier")),
        Option(r.getAs[java.sql.Timestamp]("tier_ts")).map(_.getTime),
        Option(r.getAs[Any]("spend_spend")).map(_.asInstanceOf[Double]),
        Option(r.getAs[java.sql.Timestamp]("spend_ts")).map(_.getTime))
    }.toSet
    try {
      q.processAllAvailable()
      assert(spark.table("pitfeat").count() === 4, "batch 1: the fixture")
      // a second micro-batch: late events land as new input files
      val more = Seq(Event(5L, ts(30), 8L, "view", 1.0),
        Event(6L, ts(40), 7L, "click", 4.0))
      more.toDS().write.mode("append").parquet(in)
      q.processAllAvailable()
      val got = canon(spark.table("pitfeat").collect())
      // spot values: event 3 (user 8 @10:20) has NO tier yet but an
      // early spend; event 5 (user 8 @10:30) hits the vip tie exactly
      assert(got.find(_._1 == 3L).get._2 === None)
      assert(got.find(_._1 == 3L).get._4 === Some(3.0))
      assert(got.find(_._1 == 5L).get._2 === Some("vip"))
      // the stream result ≡ the batch grouped PIT join on ALL the data
      val batch = canon(graft.ops.TemporalOps.asofJoinFeatures(
        (fixture ++ more).toDS().toDF(), features,
        Seq("user_id"), "ts", "valid_from").collect())
      assert(got === batch,
        "streaming grouped enrichment must equal batch asofJoinFeatures")
      // replay-zero: nothing new ⇒ nothing re-emitted
      q.processAllAvailable()
      assert(spark.table("pitfeat").count() === 6)
    } finally q.stop()
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

  test("dedupStream drops in-horizon duplicate event_ids with bounded state") {
    val in = tmpDir("stream-in4")
    val dup = fixture ++ Seq(Event(1L, ts(0), 7L, "click", 1.0)) // exact replay of event 1
    dup.toDS().write.mode("overwrite").parquet(in)
    val events = EventsStreaming.readEvents(spark, in,
      implicitly[org.apache.spark.sql.Encoder[Event]].schema)
    val q = EventsStreaming.dedupStream(events).writeStream
      .format("memory").queryName("dedupst")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("ckpt5"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val ids = spark.table("dedupst").select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L, 4L)) // 5 inputs, dup of id 1 dropped
  }

  test("sessionizeStream: event-time timeout closes sessions across micro-batches") {
    val in = tmpDir("stream-in5")
    val ckpt = tmpDir("ckpt6")
    val out = tmpDir("sessions-out") + "/sessions"
    def run(): Unit = {
      val events = EventsStreaming.readEvents(spark, in,
        implicitly[org.apache.spark.sql.Encoder[Event]].schema).as[Event]
      // memory sink cannot recover a checkpoint; append closed sessions
      // to parquet instead (they are immutable once emitted)
      val q = EventsStreaming.sessionizeStream(events, gapSeconds = 600)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EventsStreaming.Session], _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(out); ()
        }
        .start()
      q.awaitTermination()
    }
    def sessions(): Array[EventsStreaming.Session] =
      if (!graft.ops.Fs.exists(out)) Array.empty
      else spark.read.parquet(out).as[EventsStreaming.Session].collect()
    // batch 1: two bursts for user 7 separated by > gap INSIDE the batch —
    // the first session closes immediately; the second stays open
    Seq(
      Event(1L, ts(0), 7L, "click", 1.0),
      Event(2L, ts(2), 7L, "click", 2.0),
      Event(3L, ts(30), 7L, "view", 5.0)
    ).toDS().write.mode("overwrite").parquet(in)
    run()
    val afterB1 = sessions()
    assert(afterB1.length == 1)
    assert(afterB1(0).n_events == 2 && afterB1(0).total_value == 3.0)
    assert(afterB1(0).session_start == ts(0) && afterB1(0).session_end == ts(2))

    // batch 2: a much later event advances the watermark past 10:30+gap —
    // the open session times out and is emitted; the new one stays open
    Seq(Event(4L, ts(59), 7L, "purchase", 9.0))
      .toDS().write.mode("append").parquet(in)
    run()
    val afterB2 = sessions()
    assert(afterB2.length == 2)
    val second = afterB2.filter(_.session_start == ts(30))
    assert(second.length == 1 && second(0).n_events == 1 && second(0).total_value == 5.0)
  }

  test("sessionizeStream: in-watermark out-of-order event widens session_start") {
    val in = tmpDir("stream-in6")
    val ckpt = tmpDir("ckpt7")
    val out = tmpDir("sessions-out2") + "/sessions"
    def run(): Unit = {
      val events = EventsStreaming.readEvents(spark, in,
        implicitly[org.apache.spark.sql.Encoder[Event]].schema).as[Event]
      val q = EventsStreaming
        .sessionizeStream(events, gapSeconds = 600, watermark = "30 minutes")
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EventsStreaming.Session], _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(out); ()
        }
        .start()
      q.awaitTermination()
    }
    // batch 1: user 7 session open at [10:08, 10:10]
    Seq(Event(1L, ts(8), 7L, "click", 1.0), Event(2L, ts(10), 7L, "click", 2.0))
      .toDS().write.mode("overwrite").parquet(in)
    run()
    // batch 2: out-of-order 10:05 event — inside the 30-min watermark, its
    // gap to the open session is negative, so it merges and must move
    // session_start EARLIER (the pre-fix code kept 10:08)
    Seq(Event(3L, ts(5), 7L, "view", 4.0)).toDS().write.mode("append").parquet(in)
    run()
    // batch 3: another user's 10:59 event pushes the watermark past
    // 10:10 + gap → user 7's session times out and is emitted
    Seq(Event(4L, ts(59), 8L, "click", 0.0)).toDS().write.mode("append").parquet(in)
    run()
    val s7 = spark.read.parquet(out).as[EventsStreaming.Session]
      .collect().filter(_.user_id == 7L)
    assert(s7.length == 1)
    assert(s7(0).session_start == ts(5) && s7(0).session_end == ts(10))
    assert(s7(0).n_events == 3 && s7(0).total_value == 7.0)
  }

  test("throttleStream: one event per horizon measured from the last EMITTED event") {
    val in = tmpDir("stream-in-thr")
    val ckpt = tmpDir("ckpt-thr")
    val out = tmpDir("throttle-out") + "/kept"
    def run(): Unit = {
      val events = EventsStreaming.readEvents(spark, in,
        implicitly[org.apache.spark.sql.Encoder[Event]].schema).as[Event]
      val q = EventsStreaming.throttleStream(events, horizonSeconds = 600)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Event], _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(out); ()
        }
        .start()
      q.awaitTermination()
    }
    def kept(): Set[Long] =
      if (!graft.ops.Fs.exists(out)) Set.empty
      else spark.read.parquet(out).as[Event].collect().map(_.event_id).toSet
    // user 7 drizzle: 0, 2, 5 min (one anchor), then 12 (new window),
    // then 30; the lag-based debounce would KEEP the 5-min event (gap
    // from previous = 3 min? no — it would keep any event > 10 min after
    // its immediate predecessor; here e3 is 3 min after e2, dropped by
    // both, but a steady 6-min drizzle distinguishes the two: each
    // event is < horizon from its predecessor yet the THIRD is > horizon
    // from the anchor). Events 10/11/12 encode that steady drizzle for
    // user 8: 0, 6, 13 min — anchor logic emits e10 and e12 (13 > 10
    // from anchor 0), lag logic would emit only e10.
    Seq(
      Event(1L, ts(0), 7L, "click", 1.0),
      Event(2L, ts(2), 7L, "click", 1.0),
      Event(3L, ts(5), 7L, "click", 1.0),
      Event(4L, ts(12), 7L, "click", 1.0),
      Event(5L, ts(30), 7L, "click", 1.0),
      Event(10L, ts(0), 8L, "view", 1.0),
      Event(11L, ts(6), 8L, "view", 1.0),
      Event(12L, ts(13), 8L, "view", 1.0)
    ).toDS().write.mode("overwrite").parquet(in)
    run()
    assert(kept() == Set(1L, 4L, 5L, 10L, 12L))
    // batch 2: 5 min after user 7's anchor (suppressed), then 15 after
    Seq(Event(6L, ts(35), 7L, "click", 1.0), Event(7L, ts(45), 7L, "click", 1.0))
      .toDS().write.mode("append").parquet(in)
    run()
    assert(kept() == Set(1L, 4L, 5L, 10L, 12L, 7L))
    // no new input: rerun is a no-op
    run()
    assert(kept() == Set(1L, 4L, 5L, 10L, 12L, 7L))
  }

  test("stream-stream interval join attributes conversions within the horizon only") {
    val impDir = tmpDir("stream-imp"); val convDir = tmpDir("stream-conv")
    Seq(
      Event(100L, ts(0), 7L, "impression", 0.0),
      Event(101L, ts(5), 8L, "impression", 0.0)
    ).toDS().write.mode("overwrite").parquet(impDir)
    val lateTs = java.sql.Timestamp.valueOf("2024-01-01 11:10:00")
    Seq(
      Event(200L, ts(20), 7L, "purchase", 9.5),  // in [10:00, 10:30] -> attributed
      Event(201L, lateTs, 7L, "purchase", 1.0),  // past the 30-min horizon
      Event(202L, ts(4), 8L, "purchase", 2.0),   // BEFORE the impression
      Event(203L, ts(10), 9L, "purchase", 3.0)   // no impression for user 9
    ).toDS().write.mode("overwrite").parquet(convDir)
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
    val joined = EventsStreaming.attributionJoin(
      EventsStreaming.readEvents(spark, impDir, schema),
      EventsStreaming.readEvents(spark, convDir, schema))
    val q = joined.writeStream
      .format("memory").queryName("attrib")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("ckpt-attrib"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("attrib").collect()
    assert(rows.length == 1, s"exactly one attribution expected, got ${rows.toSeq}")
    assert(rows(0).getAs[Long]("imp_id") == 100L)
    assert(rows(0).getAs[Long]("conv_id") == 200L)
    assert(rows(0).getAs[Double]("value") == 9.5)
  }

  test("left-outer attribution surfaces unconverted impressions after the watermark") {
    // Outer rows flush only in a batch AFTER the min-across-inputs
    // watermark passes the impression's horizon: BOTH inputs need late
    // events (the global watermark is the minimum), and one further
    // batch must run after that watermark commits. Hence the staged
    // files + maxFilesPerTrigger=1.
    def t(hhmm: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $hhmm:00")
    val impDir = tmpDir("stream-imp-lo"); val convDir = tmpDir("stream-conv-lo")
    Seq(
      Event(100L, ts(0), 7L, "impression", 0.0),  // converts
      Event(101L, ts(5), 8L, "impression", 0.0)   // never converts
    ).toDS().repartition(1).write.mode("append").parquet(impDir)
    Seq(Event(102L, t("15:00"), 99L, "impression", 0.0)) // watermark pusher
      .toDS().repartition(1).write.mode("append").parquet(impDir)
    Seq(
      Event(200L, ts(20), 7L, "purchase", 9.5),
      Event(201L, t("14:00"), 9L, "purchase", 1.0)
    ).toDS().repartition(1).write.mode("append").parquet(convDir)
    Seq(Event(202L, t("15:00"), 98L, "purchase", 1.0))
      .toDS().repartition(1).write.mode("append").parquet(convDir)
    Seq(Event(203L, t("16:00"), 97L, "purchase", 1.0)) // post-watermark batch
      .toDS().repartition(1).write.mode("append").parquet(convDir)
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
    def stream(dir: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(dir)
    val joined = EventsStreaming.attributionJoin(
      stream(impDir), stream(convDir),
      watermark = "0 seconds", joinType = "left_outer")
    val q = joined.writeStream
      .format("memory").queryName("attrib_lo")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("ckpt-attrib-lo"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("attrib_lo").collect()
    val byImp = rows.groupBy(_.getAs[Long]("imp_id"))
    assert(byImp(100L).exists(_.getAs[Long]("conv_id") == 200L), "conversion attributed")
    assert(byImp(101L).forall(_.isNullAt(rows(0).fieldIndex("conv_id"))),
      "unconverted impression emits with null conversion")
  }

  test("stream-static join enriches events from a batch dim, keeps unmatched facts") {
    val in = tmpDir("stream-enrich")
    writeFixture(in) // users 7 and 8
    val dim = Seq((7L, "gold")).toDF("user_id", "tier") // user 8 missing
    val enriched = EventsStreaming.enrichStream(
      EventsStreaming.readEvents(spark, in,
        implicitly[org.apache.spark.sql.Encoder[Event]].schema),
      dim, "user_id")
    val q = enriched.writeStream
      .format("memory").queryName("enriched")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("ckpt-enrich"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("enriched").collect()
    assert(rows.length == 4, "no facts dropped")
    assert(rows.filter(_.getAs[Long]("user_id") == 7L)
      .forall(_.getAs[String]("tier") == "gold"))
    assert(rows.filter(_.getAs[Long]("user_id") == 8L)
      .forall(_.isNullAt(rows(0).fieldIndex("tier"))), "unmatched key -> null tier")
  }

  test("rollupAbsorbSink: three micro-batches merge to the from-scratch aggregate, replay absorbs zero") {
    val in = tmpDir("stream-in-rollup")
    val out = tmpDir("stream-rollup") + "/daily"
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
    // three "days" as three files -> maxFilesPerTrigger=1 yields three
    // genuine micro-batches, each absorbed incrementally
    val days = Seq(
      Seq(Event(1L, ts(0), 7L, "click", 1.0), Event(2L, ts(10), 7L, "view", 2.0)),
      Seq(Event(3L, ts(20), 8L, "click", 5.0)),
      Seq(Event(4L, ts(30), 7L, "click", 3.0), Event(5L, ts(40), 9L, "view", 4.0)))
    days.foreach(d => d.toDS().coalesce(1).write.mode("append").parquet(in))
    def partial(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
    def run(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(
          EventsStreaming.rollupAbsorbSink(out, Seq("event_type"), Seq("n", "total_value"), partial) _)
        .start()
      q.awaitTermination()
    }
    run(tmpDir("ckpt-rollup-1"))
    def rollup(): Map[String, (Long, Double)] =
      EventsStreaming.currentRollup(spark, out).get
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // merged incremental result == one-shot aggregate over all events
    val expected = Map("click" -> ((3L, 9.0)), "view" -> ((2L, 6.0)))
    assert(rollup() == expected)
    // fresh checkpoint -> the stream re-reads all three files; every
    // batch id is <= the committed version, so nothing double-counts —
    // and ids BELOW the committed version are an id regression the sink
    // must shout about (a reset checkpoint silently drops whatever the
    // re-read batches contain; here it is pure replay, but the sink
    // cannot know that)
    val regressionsBefore = EventsStreaming.absorbIdRegressions
    run(tmpDir("ckpt-rollup-2"))
    assert(rollup() == expected)
    assert(EventsStreaming.absorbIdRegressions > regressionsBefore,
      "reset-checkpoint replay under lower batch ids must be counted loudly")
    // direct stale-batch replay (the crash-recovery path) is also a no-op
    EventsStreaming.rollupAbsorbSink(out, Seq("event_type"), Seq("n", "total_value"), partial)(
      days.head.toDS().toDF(), 0L)
    assert(rollup() == expected)
  }

  test("heavyHittersAbsorbSink: absorbed sketch is exact in-regime, replay absorbs zero, heavy item survives eviction") {
    val in = tmpDir("stream-in-hh")
    val out = tmpDir("stream-hh") + "/tokens"
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
    // token stream rides event_type; small domain => exact regime at m=8
    val days = Seq(
      Seq(Event(1L, ts(0), 1L, "aa", 0), Event(2L, ts(1), 1L, "aa", 0),
        Event(3L, ts(2), 1L, "bb", 0)),
      Seq(Event(4L, ts(10), 1L, "aa", 0), Event(5L, ts(11), 1L, "cc", 0)),
      Seq(Event(6L, ts(20), 1L, "bb", 0), Event(7L, ts(21), 1L, "aa", 0)))
    days.foreach(d => d.toDS().coalesce(1).write.mode("append").parquet(in))
    def run(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(EventsStreaming.heavyHittersAbsorbSink(out, 8, "event_type") _)
        .start()
      q.awaitTermination()
    }
    run(tmpDir("ckpt-hh-1"))
    def sketch(): Seq[(String, Long, Long)] =
      EventsStreaming.currentHeavyHitters(spark, out).get
        .collect().map(r => (r.getAs[String]("token"),
          r.getAs[Long]("count"), r.getAs[Long]("err"))).toSeq
    // distinct (3) < capacity (8): exact counts, zero error, sorted heavy-first
    assert(sketch() == Seq(("aa", 4L, 0L), ("bb", 2L, 0L), ("cc", 1L, 0L)))
    // fresh checkpoint -> all three files replay under ids <= committed: no-op
    run(tmpDir("ckpt-hh-2"))
    assert(sketch() == Seq(("aa", 4L, 0L), ("bb", 2L, 0L), ("cc", 1L, 0L)))
    // direct stale-batch replay is also a no-op
    EventsStreaming.heavyHittersAbsorbSink(out, 8, "event_type")(
      days.head.toDS().toDF(), 0L)
    assert(sketch() == Seq(("aa", 4L, 0L), ("bb", 2L, 0L), ("cc", 1L, 0L)))
    // eviction regime: capacity 2, 12 distinct light tokens + one token
    // at true count 8 > n/m — the SpaceSaving guarantee says it MUST be
    // reported, overestimated by at most its err
    val out2 = tmpDir("stream-hh2") + "/tokens"
    val light = (1 to 12).map(i => s"t$i")
    val batch1 = (light.take(6) ++ Seq.fill(4)("hot")).zipWithIndex
      .map { case (t, i) => Event(100L + i, ts(i), 1L, t, 0) }
    val batch2 = (light.drop(6) ++ Seq.fill(4)("hot")).zipWithIndex
      .map { case (t, i) => Event(200L + i, ts(30 + i), 1L, t, 0) }
    EventsStreaming.heavyHittersAbsorbSink(out2, 2, "event_type")(batch1.toDS().toDF(), 0L)
    EventsStreaming.heavyHittersAbsorbSink(out2, 2, "event_type")(batch2.toDS().toDF(), 1L)
    val hot = EventsStreaming.currentHeavyHitters(spark, out2).get
      .collect().map(r => r.getAs[String]("token") ->
        ((r.getAs[Long]("count"), r.getAs[Long]("err")))).toMap
    assert(hot.contains("hot"))
    val (cnt, err) = hot("hot")
    assert(cnt >= 8L && cnt - err <= 8L)
  }

  test("windowedTopKStream: watermark-closed window emits its exact top-k, open window holds") {
    val in = tmpDir("stream-in-wtop")
    val ckpt = tmpDir("ckpt-wtop")
    val out = tmpDir("wtop-out") + "/top"
    def run(): Unit = {
      val events = EventsStreaming.readEvents(spark, in,
        implicitly[org.apache.spark.sql.Encoder[Event]].schema).as[Event]
      val q = EventsStreaming.windowedTopKStream(events, k = 2, capacity = 8)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EventsStreaming.WindowTop], _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(out); ()
        }
        .start()
      q.awaitTermination()
    }
    def tops(): Seq[(Long, Int, String, Long, Long)] =
      if (!graft.ops.Fs.exists(out)) Seq.empty
      else spark.read.parquet(out).as[EventsStreaming.WindowTop].collect()
        .map(t => (t.window_start.getTime, t.rank, t.event_type, t.n, t.err))
        .sortBy(t => (t._1, t._2)).toSeq
    // hour-0 counts split over two micro-batches: aa 3, bb 2, cc 1
    Seq(Event(1L, ts(0), 1L, "aa", 0), Event(2L, ts(5), 2L, "bb", 0),
      Event(3L, ts(10), 1L, "aa", 0))
      .toDS().write.mode("overwrite").parquet(in)
    run()
    assert(tops().isEmpty, "open window must emit nothing")
    Seq(Event(4L, ts(20), 3L, "cc", 0), Event(5L, ts(25), 1L, "aa", 0),
      Event(6L, ts(40), 2L, "bb", 0))
      .toDS().write.mode("append").parquet(in)
    run()
    assert(tops().isEmpty, "window not yet past watermark")
    // far-future event advances the watermark beyond hour 0 -> closes it
    Seq(Event(7L, ts(300), 9L, "zz", 0)).toDS().write.mode("append").parquet(in)
    run()
    val got = tops()
    assert(got.map(t => (t._2, t._3, t._4, t._5)) == Seq(
      (1, "aa", 3L, 0L), (2, "bb", 2L, 0L)),
      s"closed hour-0 window must emit the exact merged top-2: $got")
  }

  test("prioritySampleAbsorbSink: absorbed sample equals the one-shot top-k, replay absorbs zero") {
    val out = tmpDir("stream-prio") + "/sample"
    // weight rides `value`; ids chosen so the top-3 spans all batches
    val days = Seq(
      (1 to 6).map(i => Event(i.toLong, ts(i), 1L, "e", i * 100.0)),
      (7 to 12).map(i => Event(i.toLong, ts(10 + i), 1L, "e", i * 100.0)),
      (13 to 18).map(i => Event(i.toLong, ts(30 + i), 1L, "e", i * 100.0)))
    days.zipWithIndex.foreach { case (d, i) =>
      EventsStreaming.prioritySampleAbsorbSink(out, 3, "event_id", "value")(
        d.toDS().toDF(), i.toLong)
    }
    def sample(): Seq[(Long, Long)] =
      EventsStreaming.currentPrioritySample(spark, out).get
        .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("priority"))).toSeq
    // one-shot over the whole history must pick the identical 3 rows
    val oneShot = days.flatten.toDS().toDF()
      .select(col("event_id").cast("long").as("id"),
        col("value").cast("long").as("weight"))
      .withColumn("priority", graft.text.Curation.priorityMicros("id", "weight"))
      .orderBy(col("priority").desc, col("id")).limit(3)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[Long]("priority"))).toSeq
    assert(sample() == oneShot,
      s"absorbed sample must equal the one-shot top-k: ${sample()} vs $oneShot")
    assert(sample().size == 3)
    // stale-batch replay absorbs zero
    EventsStreaming.prioritySampleAbsorbSink(out, 3, "event_id", "value")(
      days.head.toDS().toDF(), 0L)
    assert(sample() == oneShot, "replayed batch must not perturb the sample")
  }

  test("prioritySampleAbsorbSink: negative-weight rows never enter the state, even under-filled") {
    val out = tmpDir("stream-prio-neg") + "/sample"
    // k=3 but only 2 valid-weight rows: desc alone would only push the
    // NULL-priority rows last, letting them fill the third slot and
    // then PERSIST across batches
    val batch = Seq(
      Event(1L, ts(1), 1L, "e", 100.0), Event(2L, ts(2), 1L, "e", 200.0),
      Event(3L, ts(3), 1L, "e", -50.0), Event(4L, ts(4), 1L, "e", -1.0))
    EventsStreaming.prioritySampleAbsorbSink(out, 3, "event_id", "value")(
      batch.toDS().toDF(), 0L)
    val got = EventsStreaming.currentPrioritySample(spark, out).get
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(got.toSet == Set(1L, 2L),
      s"under-filled sample must hold only valid-weight rows: $got")
    // a later batch of valid rows fills the freed slot normally
    EventsStreaming.prioritySampleAbsorbSink(out, 3, "event_id", "value")(
      Seq(Event(5L, ts(5), 1L, "e", 300.0)).toDS().toDF(), 1L)
    val got2 = EventsStreaming.currentPrioritySample(spark, out).get
      .collect().map(_.getAs[Long]("id")).toSeq
    assert(got2.toSet == Set(1L, 2L, 5L), s"valid row must fill the slot: $got2")
  }

  test("distinctAbsorbSink: absorbed registers equal the one-shot sketch, replay absorbs zero") {
    val in = tmpDir("stream-in-hll")
    val out = tmpDir("stream-hll") + "/distinct"
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
    // user 7 appears in all three batches — a sum-based rollup would
    // count it three times; the register merge cannot
    val days = Seq(
      Seq(Event(1L, ts(0), 7L, "click", 0), Event(2L, ts(1), 8L, "click", 0),
        Event(3L, ts(2), 7L, "view", 0)),
      Seq(Event(4L, ts(10), 7L, "click", 0), Event(5L, ts(11), 9L, "click", 0)),
      Seq(Event(6L, ts(20), 7L, "click", 0), Event(7L, ts(21), 10L, "view", 0)))
    days.foreach(d => d.toDS().coalesce(1).write.mode("append").parquet(in))
    def run(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(
          EventsStreaming.distinctAbsorbSink(out, Seq("event_type"), "user_id") _)
        .start()
      q.awaitTermination()
    }
    run(tmpDir("ckpt-hll-1"))
    def estimates(): Map[String, Long] =
      EventsStreaming.currentDistinct(spark, out, Seq("event_type")).get
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // tiny cardinalities sit in HLL's linear-counting regime: exact
    assert(estimates() == Map("click" -> 3L, "view" -> 2L))
    // absorbed registers are byte-identical to the one-shot sketch
    // (merge associativity), not merely estimate-equal
    val oneShot = spark.read.parquet(in)
      .groupBy(col("event_type"))
      .agg(graft.functions.Hll.hll_sketch(col("user_id")).as("sketch"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch")).toMap
    val hllDir = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("hll-")).maxBy(_.getName).getAbsolutePath
    val absorbed = spark.read.parquet(hllDir)
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]]("sketch")).toMap
    assert(oneShot.keySet == absorbed.keySet)
    oneShot.foreach { case (k, regs) =>
      assert(java.util.Arrays.equals(regs, absorbed(k)), s"registers differ for $k") }
    // replay: fresh checkpoint and direct stale-batch both absorb zero
    run(tmpDir("ckpt-hll-2"))
    EventsStreaming.distinctAbsorbSink(out, Seq("event_type"), "user_id")(
      days.head.toDS().toDF(), 0L)
    assert(estimates() == Map("click" -> 3L, "view" -> 2L))
  }

  test("boilerplateScrubSink: index learned from batch 1 scrubs batch 2, replay appends zero") {
    val out = tmpDir("scrub-out") + "/docs"
    val idx = tmpDir("scrub-idx") + "/index"
    val footer = "f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 f11 f12 f13 f14 f15 f16"
    val sink = EventsStreaming.boilerplateScrubSink(
      "doc_id", "text", out, idx, gramLen = 4, minCount = 2L,
      minSpanTokens = 16L) _
    // batch 0: footer appears TWICE (two docs) -> both scrubbed to
    // their unique remainder; a unique doc passes through intact
    val b0 = Seq(
      (1L, s"$footer u1 u2 u3"),
      (2L, s"v1 v2 $footer"),
      (3L, "w1 w2 w3 w4 w5 w6 w7 w8")
    ).toDF("doc_id", "text")
    sink(b0, 0L)
    def rows(): Map[Long, (String, Long)] =
      spark.read.parquet(out).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))).toMap
    assert(rows() == Map(
      1L -> (("u1 u2 u3", 16L)),
      2L -> (("v1 v2", 16L)),
      3L -> (("w1 w2 w3 w4 w5 w6 w7 w8", 0L))))
    // batch 1: ONE new doc carrying the footer — alone it repeats
    // nothing, only the PERSISTED index knows it is boilerplate
    val b1 = Seq((10L, s"x1 $footer x2 x3")).toDF("doc_id", "text")
    sink(b1, 1L)
    assert(rows()(10L) == (("x1 x2 x3", 16L)))
    // replaying either batch absorbs zero (index version is the guard)
    sink(b0, 0L); sink(b1, 1L)
    assert(rows().size == 4)
  }

  test("decontaminateScrubSink: leaked benchmark span cut at ingest, clean " +
       "docs pass, replay appends zero") {
    val out = tmpDir("decon-out") + "/docs"
    val benchText = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
    val bench = Seq((100L, benchText)).toDF("doc_id", "text")
    val benchGrams = graft.dedup.Dedup
      .tokenGrams(bench, "doc_id", "text", 4).select($"gh").distinct()
    val sink = EventsStreaming.decontaminateScrubSink(
      benchGrams, "doc_id", "text", out, gramLen = 4, minSpanTokens = 4L) _
    val b0 = Seq(
      (1L, s"u1 u2 $benchText u3 u4"),          // leak mid-document
      (2L, "w1 w2 w3 w4 w5 w6")                 // clean
    ).toDF("doc_id", "text")
    sink(b0, 0L)
    def rows(): Map[Long, (String, Long)] =
      spark.read.parquet(out).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("clean_text"), r.getAs[Long]("n_removed")))).toMap
    assert(rows() == Map(
      1L -> (("u1 u2 u3 u4", 10L)),
      2L -> (("w1 w2 w3 w4 w5 w6", 0L))))
    // next batch: another leak, plus replay of batch 0 — appends only
    // the new doc (id-level anti-join is the replay guard)
    val b1 = Seq((10L, s"$benchText tail1 tail2")).toDF("doc_id", "text")
    sink(b1, 1L)
    sink(b0, 0L)
    assert(rows().size == 3 && rows()(10L) == (("tail1 tail2", 10L)))
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

  test("native session_window stream: watermark closes finished sessions, open one held back") {
    val in = tmpDir("stream-in-sw")
    writeFixture(in)
    val events = EventsStreaming.readEvents(spark, in,
      implicitly[org.apache.spark.sql.Encoder[Event]].schema)
    // zero-delay watermark: after draining, event time sits at 10:59 —
    // user 7's first session (10:00-10:10, ends 10:40 with the gap) and
    // user 8's (ends 10:50) are closed and emitted; user 7's 10:59
    // session is still open, so Append must hold it back
    val q = EventsStreaming.sessionWindowStats(events, watermark = "0 seconds")
      .writeStream
      .format("memory").queryName("sw")
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", tmpDir("ckpt-sw"))
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val rows = spark.table("sw").collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"))).sorted
    assert(rows.toSeq == Seq((7L, 2L), (8L, 1L)),
      s"closed sessions only, got ${rows.toSeq}")
  }

  test("staleKeys: silent key flagged once via event-time timeout, active key not, re-arm works") {
    val in = tmpDir("stream-in-stale")
    val ckpt = tmpDir("ckpt-stale")
    val out = tmpDir("stale-out") + "/stale"
    def run(): Unit = {
      val events = EventsStreaming.readEvents(spark, in,
        implicitly[org.apache.spark.sql.Encoder[Event]].schema).as[Event]
      val q = EventsStreaming.staleKeys(events, horizonSeconds = 600)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EventsStreaming.StaleKey], _: Long) =>
          if (!b.isEmpty) b.write.mode("append").parquet(out); ()
        }
        .start()
      q.awaitTermination()
    }
    def stale(): Array[(Long, java.sql.Timestamp)] =
      if (!graft.ops.Fs.exists(out)) Array.empty
      else spark.read.parquet(out).as[EventsStreaming.StaleKey].collect()
        .map(s => (s.user_id, s.last_ts))

    // batch 1: both users alive; nothing is stale yet
    Seq(Event(1L, ts(0), 7L, "hb", 0.0), Event(2L, ts(1), 8L, "hb", 0.0))
      .toDS().write.mode("overwrite").parquet(in)
    run()
    assert(stale().isEmpty)

    // batch 2: user 8 keeps beating; the watermark passes 10:00 + 10min
    // -> user 7 flagged exactly once with its last heartbeat
    Seq(Event(3L, ts(30), 8L, "hb", 0.0))
      .toDS().write.mode("append").parquet(in)
    run()
    assert(stale().toSeq == Seq((7L, ts(0))))

    // batch 3: user 7 re-appears then goes silent again past the horizon
    // -> re-armed detection flags it a second time with the NEW last_ts
    Seq(Event(4L, ts(35), 7L, "hb", 0.0), Event(5L, ts(59), 8L, "hb", 0.0))
      .toDS().write.mode("append").parquet(in)
    run()
    assert(stale().toSet == Set((7L, ts(0)), (7L, ts(35))))
  }

  // Simulate the crash window Structured Streaming's recovery contract
  // covers: the engine wrote offsets/N and the state-store delta for
  // batch N but died BEFORE the commits/N marker. On restart the batch
  // re-executes against state version N−1 — identical output, same
  // batchId. Deleting the newest commit marker reproduces that state
  // exactly (a graceful AvailableNow stop always commits).
  private def dropLatestCommit(ckpt: String): Unit = {
    val dir = new java.io.File(s"$ckpt/commits")
    val latest = dir.listFiles().filter(_.getName.forall(_.isDigit))
      .maxBy(_.getName.toLong)
    new java.io.File(dir, s".${latest.getName}.crc").delete()
    assert(latest.delete(), s"could not delete commit marker $latest")
  }

  test("throttleStream: anchor state survives a kill-and-restart from checkpoint") {
    val in = tmpDir("stream-in-thr-crash")
    val ckpt = tmpDir("ckpt-thr-crash")
    val out = tmpDir("throttle-crash-out") + "/kept"
    def run(): Unit = {
      val events = EventsStreaming.readEvents(spark, in,
        implicitly[org.apache.spark.sql.Encoder[Event]].schema).as[Event]
      val q = EventsStreaming.throttleStream(events, horizonSeconds = 600)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[Event], id: Long) =>
          // per-batchId overwrite: a crash-replayed batch rewrites ITS
          // OWN directory, so recovery can never double-append
          b.write.mode("overwrite").parquet(s"$out/batch=$id"); ()
        }
        .start()
      q.awaitTermination()
    }
    def kept(): Seq[Long] =
      if (!graft.ops.Fs.exists(out)) Seq.empty
      else spark.read.parquet(out).select("event_id").collect()
        .map(_.getLong(0)).toSeq.sorted
    // batch 0: e1 emitted (anchor 10:00), e2 suppressed
    Seq(Event(1L, ts(0), 7L, "click", 1.0), Event(2L, ts(5), 7L, "click", 1.0))
      .toDS().write.mode("overwrite").parquet(in)
    run()
    assert(kept() == Seq(1L))
    // batch 1: e3 re-anchors at 10:12, e4 suppressed
    Seq(Event(3L, ts(12), 7L, "click", 1.0), Event(4L, ts(15), 7L, "click", 1.0))
      .toDS().write.mode("append").parquet(in)
    run()
    assert(kept() == Seq(1L, 3L))
    // kill after batch 1's state write but before its commit; restart
    // with new input. Recovery must replay batch 1 bit-identically and
    // resume with the 10:12 anchor: a lost anchor would emit e5
    // (8 min after it), a double-advanced one would suppress e6 (11 min
    // after 10:12 but only 3 after e5)
    dropLatestCommit(ckpt)
    Seq(Event(5L, ts(20), 7L, "click", 1.0), Event(6L, ts(23), 7L, "click", 1.0))
      .toDS().write.mode("append").parquet(in)
    run()
    assert(kept() == Seq(1L, 3L, 6L))
  }

  test("staleKeys: timeout state survives a kill-and-restart from checkpoint, no double flag") {
    val in = tmpDir("stream-in-stale-crash")
    val ckpt = tmpDir("ckpt-stale-crash")
    val out = tmpDir("stale-crash-out") + "/stale"
    def run(): Unit = {
      val events = EventsStreaming.readEvents(spark, in,
        implicitly[org.apache.spark.sql.Encoder[Event]].schema).as[Event]
      val q = EventsStreaming.staleKeys(events, horizonSeconds = 600)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.Dataset[EventsStreaming.StaleKey], id: Long) =>
          b.write.mode("overwrite").parquet(s"$out/batch=$id"); ()
        }
        .start()
      q.awaitTermination()
    }
    def flags(): Seq[(Long, java.sql.Timestamp)] =
      if (!graft.ops.Fs.exists(out)) Seq.empty
      else spark.read.parquet(out).select("user_id", "last_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1))).toSeq
    // run 1: both users alive
    Seq(Event(1L, ts(0), 7L, "hb", 0.0), Event(2L, ts(1), 8L, "hb", 0.0))
      .toDS().write.mode("overwrite").parquet(in)
    run()
    assert(flags().isEmpty)
    // run 2: user 8 beats on; watermark passes 10:00+10min -> user 7
    // flagged once (in the run's timeout batch) and its state removed
    Seq(Event(3L, ts(30), 8L, "hb", 0.0))
      .toDS().write.mode("append").parquet(in)
    run()
    assert(flags() == Seq((7L, ts(0))))
    // kill before that flagging batch committed, then restart with user
    // 7 reappearing. The replayed batch re-emits (7, 10:00) into the
    // SAME batch dir (exactly-once stands — the flag must appear once,
    // not twice), and the restarted state machine re-arms user 7, whose
    // new silence past 10:35+10min is flagged with the NEW last_ts
    dropLatestCommit(ckpt)
    Seq(Event(4L, ts(35), 7L, "hb", 0.0), Event(5L, ts(59), 8L, "hb", 0.0))
      .toDS().write.mode("append").parquet(in)
    run()
    val got = flags()
    assert(got.sortBy(_._2.getTime) == Seq((7L, ts(0)), (7L, ts(35))),
      s"expected exactly-once flags per silence episode, got $got")
  }

  test("nearDupScreenSink: rejects corpus/prior/within-batch near-dups, replay appends zero") {
    import spark.implicits._
    val out = tmpDir("ingest-out") + "/corpus"
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "completely different words entirely here now")
    ).toDF("doc_id", "text")
    val sink = EventsStreaming.nearDupScreenSink(corpus, "doc_id", "text", out, tau = 0.3) _

    // batch 0: 101 near-dups corpus doc 1 -> rejected; 103/104 are
    // within-batch near-dups -> min id 103 admitted; 105 novel -> admitted
    val b0 = Seq(
      (101L, "the quick brown fox jumps over the lazy cat"),
      (103L, "el perro grande la casa de un gato es aqui hoy"),
      (104L, "el perro grande la casa de un gato es aqui ahora"),
      (105L, "statistics on partitioned analytical workloads matter")
    ).toDF("doc_id", "text")
    sink(b0, 0L)
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(103L, 105L))

    // batch 1: 201 near-dups ADMITTED doc 103 -> rejected; 202 novel
    val b1 = Seq(
      (201L, "el perro grande la casa de un gato es aqui manana"),
      (202L, "sorted files compact into bigger ordered runs quickly")
    ).toDF("doc_id", "text")
    sink(b1, 1L)
    assert(spark.read.parquet(out).select("doc_id").as[Long].collect().sorted.toSeq
      == Seq(103L, 105L, 202L))

    // crash replay of batch 1: nothing new appends
    sink(b1, 1L)
    assert(spark.read.parquet(out).count() == 3)
  }

  test("clusterMaintainSink: labels track the full clustering across batches, replay is a no-op") {
    import spark.implicits._
    val out = tmpDir("cluster-maintain")
    val sink = EventsStreaming.clusterMaintainSink("doc_id", "text", out, tau = 0.3) _
    val b0 = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (20L, "completely different words entirely here now today")
    ).toDF("doc_id", "text")
    val b1 = Seq(
      (30L, "the quick brown fox jumps over the lazy cat"), // near-dups 10
      (40L, "statistics on partitioned analytical workloads matter")
    ).toDF("doc_id", "text")
    val b2 = Seq(
      (50L, "completely different words entirely here now tomorrow"), // near-dups 20
      (5L, "the quick brown fox jumps over the lazy hen")   // near-dups 10/30, smaller id
    ).toDF("doc_id", "text")
    sink(b0, 0L); sink(b1, 1L); sink(b2, 2L)
    def labels(): Map[Long, Long] =
      EventsStreaming.currentClusters(spark, out).get
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = labels()
    // from-scratch clustering over the same docs + same pair tier
    val all = b0.union(b1).union(b2)
    val scratch = graft.dedup.Dedup.dedupClusters(all, "doc_id",
        graft.dedup.Dedup.minhashPairs(all, "doc_id", "text", tau = 0.3))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == scratch, s"maintained $got != from-scratch $scratch")
    // the late smaller id relabels the whole fox component
    assert(got(10L) == 5L && got(30L) == 5L && got(5L) == 5L)
    assert(got(20L) == got(50L) && got(40L) == 40L)
    // replay of the last batch: labels and text store unchanged
    sink(b2, 2L)
    assert(labels() == got)
    assert(spark.read.parquet(s"$out/docs").count() == 6)
  }

  test("driftMonitorSink: per-batch and cumulative TVD vs the reference, replay absorbs zero") {
    val in = tmpDir("stream-in-drift")
    val out = tmpDir("stream-drift") + "/mon"
    val schema = implicitly[org.apache.spark.sql.Encoder[Event]].schema
    // band = clamp(floor(value), 0..4); reference = {0 -> 1, 1 -> 1}
    val reference = Map(0L -> 1L, 1L -> 1L)
    val bandOf = least(greatest(floor(col("value")), lit(0L)), lit(4L))
    // b1 matches the reference exactly; b2 is all band-1 (TVD 0.5);
    // b3 is all band-0, restoring the cumulative to the reference
    val days = Seq(
      Seq(Event(1L, ts(0), 7L, "click", 0.5), Event(2L, ts(1), 7L, "view", 1.5)),
      Seq(Event(3L, ts(2), 8L, "click", 1.5), Event(4L, ts(3), 8L, "view", 1.7)),
      Seq(Event(5L, ts(4), 9L, "click", 0.2), Event(6L, ts(5), 9L, "view", 0.3)))
    days.foreach(d => d.toDS().coalesce(1).write.mode("append").parquet(in))
    def run(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(EventsStreaming.driftMonitorSink(out, reference, bandOf) _)
        .start()
      q.awaitTermination()
    }
    run(tmpDir("ckpt-drift-1"))
    def log(): Seq[(Long, Long, Long, Long)] =
      EventsStreaming.currentDriftLog(spark, out).get.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // batch TVDs: 0, 0.5, 0.5; cumulative: 0, 0.25, 0
    val expected = Seq(
      (0L, 2L, 0L, 0L),
      (1L, 2L, 500000L, 250000L),
      (2L, 2L, 500000L, 0L))
    assert(log() == expected)
    assert(EventsStreaming.currentDriftHistogram(spark, out).get.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(0L -> 3L, 1L -> 3L))
    // fresh checkpoint -> full replay under the same ids: nothing
    // double-counts, the drift log is rewritten identically
    run(tmpDir("ckpt-drift-2"))
    assert(log() == expected)
    // direct stale-batch replay (crash recovery) is also a no-op
    EventsStreaming.driftMonitorSink(out, reference, bandOf)(
      days.head.toDS().toDF(), 0L)
    assert(log() == expected)
    // a NULL-valued row has no band: excluded from the histogram, the
    // batch still absorbs (n_rows counts only banded rows). NOTE the
    // clamped bandOf above maps NULL to band 0 (greatest/least ignore
    // nulls) — use the raw floor here so the null survives to the band
    val bandOfRaw = floor(col("value"))
    val out2 = tmpDir("stream-drift-null") + "/mon"
    val nullableSchema = org.apache.spark.sql.types.StructType(
      Seq(Event(0L, ts(0), 0L, "x", 0.0)).toDF().schema
        .map(_.copy(nullable = true)))
    val withNull = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(7L, ts(6), 9L, "click", 0.5),
        org.apache.spark.sql.Row(8L, ts(7), 9L, "view", null))),
      nullableSchema)
    EventsStreaming.driftMonitorSink(out2, reference, bandOfRaw)(withNull, 0L)
    val rec = EventsStreaming.currentDriftLog(spark, out2).get.collect()(0)
    assert(rec.getLong(1) == 1L, "only the banded row counts")
    assert(EventsStreaming.currentDriftHistogram(spark, out2).get
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == Map(0L -> 1L))
  }

  test("embeddingDriftSink: exact micros^2 centroid shift per batch and cumulative, replay-zero") {
    val in = tmpDir("stream-in-edrift")
    val out = tmpDir("stream-edrift") + "/mon"
    // dim 2; reference centroid = (1.0, -1.0) in micros
    val reference = Array(1000000L, -1000000L)
    // b1 mean = (1.0, -1.0): dist2 = 0
    // b2 mean = (2.0, -1.0): dist2 = 1e6^2 = 1e12
    //   cum over b1+b2 (4 vecs): mean = (1.5, -1.0) -> dist2 = 0.5e6^2
    val batches = Seq(
      Seq((1L, Seq(0.5f, -1.0f)), (2L, Seq(1.5f, -1.0f))),
      Seq((3L, Seq(2.0f, -0.5f)), (4L, Seq(2.0f, -1.5f))))
    val schema = batches.head.toDF("vec_id", "embedding").schema
    batches.foreach(rows =>
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("append").parquet(in))
    def run(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(
          EventsStreaming.embeddingDriftSink(out, reference, "embedding") _)
        .start()
      q.awaitTermination()
    }
    run(tmpDir("ckpt-edrift-1"))
    def log(): Seq[(Long, Long, Long, Long)] =
      EventsStreaming.currentDriftLog(spark, out).get.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    val expected = Seq(
      (0L, 2L, 0L, 0L),
      (1L, 2L, 1000000L * 1000000L, 500000L * 500000L))
    assert(log() == expected)
    // fresh checkpoint: replay absorbs zero, log identical
    run(tmpDir("ckpt-edrift-2"))
    assert(log() == expected)
    // direct stale-batch replay is a no-op too
    EventsStreaming.embeddingDriftSink(out, reference, "embedding")(
      batches.head.toDF("vec_id", "embedding"), 0L)
    assert(log() == expected)
    // ragged dimensionality (the encoder-swap signal): the count comes
    // from dim 0, extra dims beyond the reference are excluded from
    // the distance, and the record stays exact — two dim-2 vectors at
    // the reference centroid plus one dim-3 vector (first two
    // components also on-reference) must yield n=3, dist2=0
    val out3 = tmpDir("stream-edrift-ragged") + "/mon"
    val ragged = Seq(
      (1L, Seq(1.0f, -1.0f)), (2L, Seq(1.0f, -1.0f)),
      (3L, Seq(1.0f, -1.0f, 9.0f)))
    EventsStreaming.embeddingDriftSink(out3, reference, "embedding")(
      ragged.toDF("vec_id", "embedding"), 0L)
    val rec3 = EventsStreaming.currentDriftLog(spark, out3).get.collect()(0)
    assert(rec3.getLong(1) == 3L, "count must come from dim 0, not an arbitrary dim")
    assert(rec3.getLong(2) == 0L, "extra dim beyond the reference excluded from the distance")
  }

  test("annIndexMaintainSink: fit-once model, per-batch encode, replay-zero, self-probe at rank 1") {
    import graft.similarity.Similarity
    val in = tmpDir("stream-in-ann")
    val out = tmpDir("stream-ann") + "/idx"
    // deterministic 32-dim vectors, three batches of 40 — the model is
    // fit on batch 0 only; batches 1-2 must encode against it
    def vec(id: Long): Seq[Float] =
      (0 until 32).map(d =>
        (((id * 2654435761L + d * 40503L) % 9973L) / 9973.0f - 0.5f))
    val batches = (0 until 3).map(b =>
      (0 until 40).map(i => (b * 40L + i, vec(b * 40L + i))))
    val schema = spark.createDataFrame(
      Seq((0L, Seq(0.0f))).toDF("vec_id", "embedding").rdd,
      Seq((0L, Seq(0.0f))).toDF("vec_id", "embedding").schema).schema
    batches.foreach(rows =>
      rows.toDF("vec_id", "embedding").coalesce(1)
        .write.mode("append").parquet(in))
    def run(ckpt: String): Unit = {
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(in)
        .writeStream
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch(
          EventsStreaming.annIndexMaintainSink(out, "vec_id", "embedding", m = 8, kw = 16) _)
        .start()
      q.awaitTermination()
    }
    run(tmpDir("ckpt-ann-1"))
    val (index, books) = EventsStreaming.currentAnnIndex(spark, out).get
    assert(index.count() == 120, "every non-null vector indexed exactly once")
    assert(books.size == 8 && books.forall(_.size == 16), "stored model shape")
    // replay under a fresh checkpoint: segments already committed, and
    // the below-high-water ids must be counted as an id regression
    val regressionsBefore = EventsStreaming.absorbIdRegressions
    run(tmpDir("ckpt-ann-2"))
    assert(EventsStreaming.currentAnnIndex(spark, out).get._1.count() == 120)
    assert(EventsStreaming.absorbIdRegressions > regressionsBefore,
      "reset-checkpoint replay below the index high-water must be shouted")
    // a batch-2 vector (encoded with the batch-0-fit model) probing the
    // index finds ITSELF at rank 1 once the ADC shortlist is exactly
    // reranked against the vector store
    val store = batches.flatten.toDF("vec_id", "embedding")
    val probe = Seq((100L, vec(100L))).toDF("probe_id", "probe_vec")
    val top = Similarity.pqSearchEncoded(index, "vec_id", probe, books, 3,
      rerank = Some((store, "embedding"))).collect()
    assert(top.head.getAs[Long]("neighbor_id") == 100L)
    assert(top.head.getAs[Double]("score") == 1.0)
    // --- compaction: one surviving segment, same rows, replay still zero
    def segDirs(): Seq[String] = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("index-"))
      .map(_.getName).sorted.toSeq
    assert(segDirs().size == 3)
    EventsStreaming.compactAnnIndex(spark, out)
    assert(segDirs() == Seq("index-2"), "one segment, highest id survives")
    val (compacted, _) = EventsStreaming.currentAnnIndex(spark, out).get
    assert(compacted.count() == 120, "compaction must not lose or duplicate rows")
    // a replayed old batch must STILL absorb zero (high-water guard,
    // not per-segment existence)
    EventsStreaming.annIndexMaintainSink(out, "vec_id", "embedding", m = 8, kw = 16)(
      batches(0).toDF("vec_id", "embedding"), 0L)
    assert(EventsStreaming.currentAnnIndex(spark, out).get._1.count() == 120)
    // --- crash recovery: a committed compact-tmp + intent marker left
    // behind by a crash mid-swap must complete to the same state
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.read.parquet(s"$out/index-2").write.mode("overwrite")
      .parquet(s"$out/compact-tmp")
    val os = fs.create(new org.apache.hadoop.fs.Path(s"$out/_COMPACT_APPLY"), true)
    os.write("2".getBytes("UTF-8")); os.close()
    val (recovered, _) = EventsStreaming.currentAnnIndex(spark, out).get
    assert(recovered.count() == 120, "marker + committed tmp must finish the swap")
    assert(!new java.io.File(s"$out/_COMPACT_APPLY").exists())
    assert(segDirs() == Seq("index-2"))
  }
}
