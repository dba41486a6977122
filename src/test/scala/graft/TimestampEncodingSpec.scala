package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Physical-encoding portability pin for `events.ts` — the column the
  * harness has regenerated in DIFFERENT parquet encodings across
  * rounds, breaking every event-time query each time the reader's
  * default type changed:
  *
  *   - rounds ≤7: TIMESTAMP(NANOS) (unreadable without nanosAsLong,
  *     then a nanosecond LongType);
  *   - round 8: tz-less timestamp[us] (isAdjustedToUTC=false → read as
  *     TIMESTAMP_NTZ by default → `unix_micros(ts)` fails analysis —
  *     13 queries silently dropped from CORRECTNESS_r08).
  *
  * [[Tables.events]] must yield the IDENTICAL session-local
  * TimestampType relation for every encoding, so the next testdata
  * regen cannot flip query behavior. Each fixture here is written in
  * one physical encoding and read back through the real loader.
  */
class TimestampEncodingSpec extends SparkSpec {

  /** Reference instants: (event_id, micros-since-epoch) via the loader
    * on real harness data — whatever encoding it currently ships in.
    */
  private lazy val ref: Map[Long, Long] =
    Tables.events(spark, "/root/testdata/sf0.001").limit(200)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private lazy val base = Tables.events(spark, "/root/testdata/sf0.001")
    .limit(200).select(col("event_id"), col("ts"))

  private def roundTrip(dir: String): Map[Long, Long] = {
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType == TimestampType,
      s"Tables.events must normalize to TimestampType, got " +
        got.schema("ts").dataType)
    got.select(col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("tz-adjusted micros (TIMESTAMP LTZ) round-trips unchanged") {
    val dir = tmpDir("enc-ltz")
    base.write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(roundTrip(dir) == ref)
  }

  test("tz-less micros (round-8 encoding) reads as the same instants") {
    val dir = tmpDir("enc-ntz")
    // cast LTZ→NTZ under the pinned UTC session tz keeps the wall
    // fields = the UTC instant; parquet then stores
    // isAdjustedToUTC=false micros, byte-identical to the harness file
    base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(roundTrip(dir) == ref)
  }

  test("tz-less micros read as the same instants even when the session " +
       "infers TIMESTAMP_NTZ (the Tables.events cast branch)") {
    val dir = tmpDir("enc-ntz-infer")
    base.withColumn("ts", col("ts").cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val key = "spark.sql.parquet.inferTimestampNTZ.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "true")
      // the raw read really is NTZ — the branch, not the conf, fixes it
      assert(spark.read.parquet(s"$dir/events.parquet")
        .schema("ts").dataType.typeName == "timestamp_ntz")
      assert(roundTrip(dir) == ref)
    } finally spark.conf.set(key, prev)
  }

  test("nanosecond longs (pre-round-8 nanosAsLong arrival) read as the " +
       "same instants (the Tables.events div-1000 branch)") {
    val dir = tmpDir("enc-nanos")
    // what spark.sql.legacy.parquet.nanosAsLong makes of TIMESTAMP(NANOS):
    // the column arrives as a plain nanosecond LongType
    base.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    assert(roundTrip(dir) == ref)
  }

  test("lineitem/orders timestamps normalize across all three encodings " +
       "(the TPC-H scan columns are the same drift class as events.ts)") {
    for ((table, loader, key, ts) <- Seq(
        ("lineitem", (dir: String) => Tables.lineitem(spark, dir),
          "l_orderkey", "l_shipdate"),
        ("orders", (dir: String) => Tables.orders(spark, dir),
          "o_orderkey", "o_orderdate"))) {
      // composite-keyed reference (l_orderkey repeats per line): index
      // by row position after a deterministic sort
      val orig = loader("/root/testdata/sf0.001")
        .select(col(key), col(ts)).orderBy(col(key), col(ts)).limit(200)
      val want = orig.select(unix_micros(col(ts)))
        .collect().map(_.getLong(0)).toSeq
      for ((enc, transform) <- Seq[(String, org.apache.spark.sql.Column)](
          ("ntz", col(ts).cast("timestamp_ntz")),
          ("nanos", unix_micros(col(ts)) * lit(1000L)))) {
        val dir = tmpDir(s"enc-$table-$enc")
        orig.withColumn(ts, transform)
          .write.mode("overwrite").parquet(s"$dir/$table.parquet")
        val got = loader(dir)
        assert(got.schema(ts).dataType == TimestampType,
          s"$table.$ts under $enc must normalize to TimestampType, got " +
            got.schema(ts).dataType)
        val vals = got.select(col(key), col(ts)).orderBy(col(key), col(ts))
          .select(unix_micros(col(ts))).collect().map(_.getLong(0)).toSeq
        assert(vals == want, s"$table.$ts instants drifted under $enc")
      }
    }
  }

  test("embeddings: float64 elements normalize to the Array[Float] contract") {
    // same physical-drift class as events.ts: a regenerated harness
    // file could ship double elements; every similarity operator must
    // see the identical float32 relation either way
    val dir = tmpDir("enc-emb")
    val orig = Tables.embeddings(spark, "/root/testdata/sf0.001").limit(50)
    orig.withColumn("embedding", col("embedding").cast("array<double>"))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = Tables.embeddings(spark, dir)
    assert(got.schema("embedding").dataType ==
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType, true))
    val a = orig.select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val b = got.select(col("vec_id"), col("embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(a == b) // float→double→float is exact, so values round-trip
  }
}
