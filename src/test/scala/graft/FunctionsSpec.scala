package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.VectorExpressions

class FunctionsSpec extends SparkSpec {

  test("bloom filter: scalar-subquery probe, zero false negatives, sane fp rate") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.BloomFunctions
    val xs = (1L to 500L).toDF("v")
    val bloom = BloomFunctions.scalarOf(
      xs.agg(BloomFunctions.bloomFilterAgg(col("v"), 1000L, 1L << 16).as("bf")))
    val probed = (1L to 600L).toDF("p")
      .select(col("p"), BloomFunctions.mightContain(bloom, col("p")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert((1L to 500L).forall(probed(_)), "a Bloom filter can never miss a member")
    assert((501L to 600L).count(probed(_)) <= 5,
      "65536 bits over 500 items should have a negligible fp rate")
  }

  test("cosine_sim is callable from SQL after registration") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      """SELECT cosine_sim(CAST(array(1.0, 0.0) AS ARRAY<FLOAT>),
        |                  CAST(array(1.0, 0.0) AS ARRAY<FLOAT>)) AS c""".stripMargin)
      .collect()(0).getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("cosine_sim NULL semantics: null input, length mismatch, zero norm") {
    VectorExpressions.register(spark)
    val r = spark.sql(
      """SELECT
        |  cosine_sim(CAST(NULL AS ARRAY<FLOAT>), CAST(array(1.0) AS ARRAY<FLOAT>)) AS a,
        |  cosine_sim(CAST(array(1.0) AS ARRAY<FLOAT>), CAST(array(1.0, 2.0) AS ARRAY<FLOAT>)) AS b,
        |  cosine_sim(CAST(array(0.0) AS ARRAY<FLOAT>), CAST(array(1.0) AS ARRAY<FLOAT>)) AS c
        |""".stripMargin).collect()(0)
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  test("GraftExtensions installs without error") {
    new GraftExtensions().apply(new SparkSessionExtensions)
  }
}
