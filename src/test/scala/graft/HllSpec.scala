package graft

import org.apache.spark.sql.functions._
import graft.functions.Hll
import graft.functions.Hll.{hll_estimate, hll_merge, hll_sketch}

/** The persistable-sketch contract: partitioning-invariant registers,
  * associative merges, parquet round-trip, bounded estimate error.
  */
class HllSpec extends SparkSpec {
  import spark.implicits._

  private val nDistinct = 20000
  private def values = spark.range(100000).select((col("id") % nDistinct).as("v"))

  test("sketch bytes are identical under 1, 2 and 16 partitions") {
    def sketchWith(parts: Int): Array[Byte] = values.repartition(parts)
      .agg(hll_sketch($"v").as("s")).collect()(0).getAs[Array[Byte]]("s")
    val s1 = sketchWith(1)
    assert(sketchWith(2).sameElements(s1))
    assert(sketchWith(16).sameElements(s1))
  }

  test("merge of 16 per-slice sketches equals the global sketch (associativity)") {
    val global = values.agg(hll_sketch($"v").as("s"))
      .collect()(0).getAs[Array[Byte]]("s")
    val merged = values.withColumn("slice", pmod(col("v"), lit(16)))
      .groupBy($"slice").agg(hll_sketch($"v").as("s"))
      .agg(hll_merge($"s").as("m"))
      .collect()(0).getAs[Array[Byte]]("m")
    assert(merged.sameElements(global))
  }

  test("sketches survive a parquet round-trip and merge later") {
    val dir = tmpDir("hll") + "/sketches"
    values.withColumn("slice", pmod(col("v"), lit(8)))
      .groupBy($"slice").agg(hll_sketch($"v").as("s"))
      .write.parquet(dir)
    val est = spark.read.parquet(dir)
      .agg(hll_estimate(hll_merge($"s")).as("n"))
      .collect()(0).getAs[Long]("n")
    assert(math.abs(est - nDistinct).toDouble / nDistinct < 0.05,
      s"estimate $est too far from $nDistinct")
  }

  test("estimate within 5% of exact across cardinality regimes incl. linear-counting range") {
    for (n <- Seq(100L, 5000L, 200000L)) {
      val est = spark.range(n * 3).select((col("id") % n).as("v"))
        .agg(hll_estimate(hll_sketch($"v")).as("e")).collect()(0).getAs[Long]("e")
      assert(math.abs(est - n).toDouble / n < 0.05, s"n=$n est=$est")
    }
  }

  test("SQL surface: hll functions registered via GraftExtensions-style registry") {
    // same builders GraftExtensions injects, exercised through SQL
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_sketch", exprs => Hll.HllSketch(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_estimate", exprs => Hll.HllEstimate(exprs.head), "scala_udf")
    values.createOrReplaceTempView("hll_vals")
    val est = spark.sql("SELECT hll_estimate(hll_sketch(v)) AS e FROM hll_vals")
      .collect()(0).getAs[Long]("e")
    assert(math.abs(est - nDistinct).toDouble / nDistinct < 0.05)
  }
}
