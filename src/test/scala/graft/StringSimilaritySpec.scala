package graft

import org.apache.spark.sql.functions._
import graft.functions.{JaroWinklerAlgo, StringSimilarity}
import org.apache.spark.unsafe.types.UTF8String

/** [[graft.functions.StringSimilarity]] — the native Jaro-Winkler
  * expression. Expected values are pinned to DuckDB's
  * `jaro_winkler_similarity` output (probed on the oracle engine, not
  * derived from this implementation), covering the semantics the
  * textbook leaves open: empty-string result, window floor, the 0.7
  * boost threshold, and the 4-char prefix cap.
  */
class StringSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val pinned: Seq[(String, String, Double)] = Seq(
    ("martha", "marhta", 0.9611111111111111),          // boost applies
    ("dixon", "dicksonx", 0.8133333333333332),         // prefix 2
    ("abcdef", "abczzz", 0.6666666666666666),          // jaro ≤ 0.7: no boost
    ("a", "", 0.0),                                    // one empty
    ("", "", 0.0),                                     // both empty (DuckDB: 0)
    ("aaaaaa", "aazzzz", 0.5555555555555555),
    ("ab", "ba", 0.0),                                 // window floors to 0
    ("abcdxyz", "abcdzyx", 0.9714285714285714),
    ("prefix_aaaa", "prefix_zzzz", 0.8545454545454545),// prefix capped at 4
    ("axxxxxxxxx", "ayyyyyyyyy", 0.39999999999999997),
    ("same", "same", 1.0),
    ("CRATE", "TRACE", 0.7333333333333334),            // transpositions
    ("ab", "abcdefghij", 0.7866666666666667))          // asymmetric lengths

  test("kernel matches DuckDB-pinned values exactly") {
    pinned.foreach { case (a, b, want) =>
      val got = JaroWinklerAlgo.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(got == want, s"jw('$a','$b') = $got, want $want")
    }
  }

  test("symmetry: jw(a,b) == jw(b,a) on the pinned corpus") {
    pinned.foreach { case (a, b, _) =>
      assert(
        JaroWinklerAlgo.similarity(UTF8String.fromString(a), UTF8String.fromString(b)) ==
          JaroWinklerAlgo.similarity(UTF8String.fromString(b), UTF8String.fromString(a)))
    }
  }

  test("expression through codegen agrees with the kernel, NULL-safe") {
    // AQE off so executedPlan is the physical plan (not an unexecuted
    // AdaptiveSparkPlan wrapper), and repartition so the projection runs
    // over exchanged rows — otherwise Catalyst folds the whole thing
    // into a LocalTableScan and the codegen path is never exercised
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = (pinned.map { case (a, b, _) => (a: String, b: String) } ++
        Seq((null: String, "x"), ("x", null: String), (null: String, null: String)))
        .toDF("a", "b")
        .repartition(2)
        .withColumn("sim", StringSimilarity.jaro_winkler(col("a"), col("b")))
      runCodegenCheck(df)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }

  private def runCodegenCheck(df: org.apache.spark.sql.DataFrame): Unit = {
    val rows = df.collect()
    rows.foreach { r =>
      if (r.isNullAt(0) || r.isNullAt(1)) assert(r.isNullAt(2))
      else {
        val want = JaroWinklerAlgo.similarity(
          UTF8String.fromString(r.getString(0)), UTF8String.fromString(r.getString(1)))
        assert(r.getDouble(2) == want)
      }
    }
    // and the codegen path is actually exercised: the projection is
    // inside a WholeStageCodegen span (printed as the `*(1)` prefix)
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, s"no WholeStageCodegen in:\n${df.queryExecution.executedPlan}")
  }

  test("range and identity properties on real part names") {
    val names = Tables.part(spark, "/root/testdata/sf0.001")
      .select("p_name").distinct().as[String].collect()
    for (a <- names; b <- names) {
      val s = JaroWinklerAlgo.similarity(
        UTF8String.fromString(a), UTF8String.fromString(b))
      assert(s >= 0.0 && s <= 1.0)
      if (a == b) assert(s == 1.0)
    }
  }
}
