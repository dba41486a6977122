package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.VectorExpressions

class FunctionsSpec extends SparkSpec {

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
