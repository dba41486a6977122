package graft

import org.apache.spark.sql.functions._
import graft.functions.Kmv
import graft.functions.Kmv.{kmv_estimate, kmv_intersect, kmv_merge, kmv_sketch}

/** The KMV/theta-sketch contract (HllSpec's discipline plus the set
  * expressions HLL lacks): partitioning-invariant state, associative
  * merges, parquet round-trip, exact-regime exactness, bounded error
  * past the regime, and |A ∩ B| estimation.
  */
class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime: estimate and intersection are exact below K distinct") {
    // two overlapping ranges, both far below K = 16384
    val a = spark.range(0, 5000).select(col("id").as("v"))
    val b = spark.range(3000, 9000).select(col("id").as("v"))
    val row = a.agg(kmv_sketch($"v").as("s")).crossJoin(
        b.agg(kmv_sketch($"v").as("s2")))
      .select(kmv_estimate($"s").as("na"), kmv_estimate($"s2").as("nb"),
        kmv_intersect($"s", $"s2").as("ni")).collect()(0)
    assert(row.getLong(0) == 5000L)
    assert(row.getLong(1) == 6000L)
    assert(row.getLong(2) == 2000L) // [3000, 5000)
  }

  test("sketch bytes are identical under 1, 2 and 16 partitions") {
    def sketchWith(parts: Int): Array[Byte] =
      spark.range(50000).select((col("id") % 30000).as("v")).repartition(parts)
        .agg(kmv_sketch($"v").as("s")).collect()(0).getAs[Array[Byte]]("s")
    val s1 = sketchWith(1)
    assert(sketchWith(2).sameElements(s1))
    assert(sketchWith(16).sameElements(s1))
  }

  test("merge of per-slice sketches equals the global sketch; parquet round-trip") {
    val values = spark.range(50000).select((col("id") % 30000).as("v"))
    val global = values.agg(kmv_sketch($"v").as("s"))
      .collect()(0).getAs[Array[Byte]]("s")
    val dir = tmpDir("kmv") + "/sketches"
    values.withColumn("slice", pmod(col("v"), lit(8)))
      .groupBy($"slice").agg(kmv_sketch($"v").as("s"))
      .write.parquet(dir)
    val merged = spark.read.parquet(dir)
      .agg(kmv_merge($"s").as("m")).collect()(0).getAs[Array[Byte]]("m")
    assert(merged.sameElements(global))
  }

  test("past the exact regime: estimate within 5% at 30k distinct, K=16384") {
    val est = spark.range(100000).select((col("id") % 30000).as("v"))
      .agg(kmv_estimate(kmv_sketch($"v")).as("n")).collect()(0).getLong(0)
    assert(math.abs(est - 30000L) <= 1500L, s"estimate $est vs 30000")
  }

  test("past the exact regime: intersection estimate within 15% on a known overlap") {
    // |A| = |B| = 30000, |A ∩ B| = 10000 — both sketches past K
    val a = spark.range(0, 30000).select(col("id").as("v"))
    val b = spark.range(20000, 50000).select(col("id").as("v"))
    val ni = a.agg(kmv_sketch($"v").as("s")).crossJoin(
        b.agg(kmv_sketch($"v").as("s2")))
      .select(kmv_intersect($"s", $"s2").as("ni")).collect()(0).getLong(0)
    assert(math.abs(ni - 10000L) <= 1500L, s"intersection estimate $ni vs 10000")
  }

  test("SQL surface: kmv functions registered via GraftExtensions-style registry") {
    // same builders GraftExtensions injects, exercised through SQL
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch", exprs => Kmv.KmvSketchAgg(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_estimate", exprs => Kmv.KmvEstimate(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_intersect", exprs => Kmv.KmvIntersect(exprs(0), exprs(1)), "scala_udf")
    spark.range(0, 5000).select(col("id").as("v")).createOrReplaceTempView("kmv_a")
    val row = spark.sql("""
      SELECT kmv_estimate(kmv_sketch(v)) AS n,
             kmv_intersect(kmv_sketch(v), kmv_sketch(CASE WHEN v < 1000 THEN v END)) AS ni
      FROM kmv_a""").collect()(0)
    assert(row.getLong(0) == 5000L)
    assert(row.getLong(1) == 1000L)
  }

  test("state unit laws: dedup, trim-to-K, unsigned ordering") {
    val s = Kmv.emptyState()
    Kmv.add(s, 5L); Kmv.add(s, 5L); Kmv.add(s, -1L) // -1 = max unsigned
    assert(s.size == 2)
    // fill past K with distinct values; keep the K smallest unsigned
    val t = Kmv.emptyState()
    (0L until (Kmv.K.toLong + 100L)).foreach(v => Kmv.add(t, v))
    Kmv.add(t, -1L) // unsigned max must be rejected
    assert(t.size == Kmv.K)
    assert(t.last.longValue == Kmv.K.toLong - 1)
  }
}
