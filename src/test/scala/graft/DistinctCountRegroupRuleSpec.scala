package graft

import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.functions._

/** [[graft.plans.DistinctCountRegroupRule]] — the injected rule that
  * regroups same-base multi-`count(DISTINCT)` aggregates into a
  * two-phase grouped plan with no Expand.
  *
  * Fixtures go through parquet (a literal LocalRelation would
  * constant-fold before the rule leaves a visible trace).
  */
class DistinctCountRegroupRuleSpec extends SparkSpec {
  import spark.implicits._

  private def writeFixture(rows: Seq[(Long, java.lang.Long, java.lang.Boolean)],
                           name: String) = {
    val p = tmpDir(name) + "/t"
    rows.toDF("g", "x", "p").write.mode("overwrite").parquet(p)
    spark.read.parquet(p)
  }

  private val fixture = Seq[(Long, java.lang.Long, java.lang.Boolean)](
    (1L, 10L, true), (1L, 10L, false), (1L, 20L, false), (1L, null, true),
    (2L, 10L, null), (2L, 30L, true), (2L, 30L, null),
    (3L, null, null),
    (4L, 40L, false), (4L, 40L, false))

  private def query(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("g"))
    .agg(countDistinct(col("x")).as("n_x"),
      countDistinct(when(col("p"), col("x"))).as("n_px"))
    .orderBy(col("g"))

  test("rewrite is exact on nulls in base, predicate and whole groups — and plans no Expand") {
    val df = writeFixture(fixture, "dcr-fixture")
    val got = query(df).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // hand-computed truth:
    // g=1: distinct x {10,20} -> 2; p-true x {10} -> 1
    // g=2: distinct x {10,30} -> 2; p-true x {30} -> 1
    // g=3: no non-null x -> 0, 0
    // g=4: {40} -> 1; no true p -> 0
    assert(got == Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 0L, 0L), (4L, 1L, 0L)))
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = query(df).queryExecution.executedPlan
      assert(plan.collect { case e: ExpandExec => e }.isEmpty,
        s"rewrite must remove the multi-distinct Expand:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("rewritten result matches the rule-free execution exactly") {
    val df = writeFixture(fixture, "dcr-baseline")
    val withRule = query(df).collect().toSeq
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    try {
      spark.conf.set("spark.sql.optimizer.excludedRules",
        "graft.plans.DistinctCountRegroupRule")
      val without = query(df).collect().toSeq
      assert(withRule == without)
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("non-applicable shapes are left untouched") {
    val df = writeFixture(fixture, "dcr-skip")
    // mixed with a non-distinct aggregate: rule must not fire; results
    // must still be correct (Spark's own Expand path)
    val mixed = df.groupBy(col("g"))
      .agg(countDistinct(col("x")).as("n_x"),
        countDistinct(when(col("p"), col("x"))).as("n_px"),
        sum(col("x")).as("s"))
      .orderBy(col("g")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(mixed == Seq((1L, 2L, 1L), (2L, 2L, 1L), (3L, 0L, 0L), (4L, 1L, 0L)))
    // different bases: not rewritten, still correct
    val diffBase = df.groupBy(col("g"))
      .agg(countDistinct(col("x")).as("a"), countDistinct(col("p")).as("b"))
      .orderBy(col("g")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(diffBase == Seq((1L, 2L, 2L), (2L, 2L, 1L), (3L, 0L, 0L), (4L, 1L, 1L)))
  }

  test("the registry gate query q_user_reach plans through the rule: no Expand") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = queries.AggQueries.qUserReach
        .run(spark, "/root/testdata/sf0.001").queryExecution.executedPlan
      assert(plan.collect { case e: ExpandExec => e }.isEmpty,
        s"q_user_reach must take the regrouped plan:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("global (ungrouped) distinct counts rewrite too — no Expand, exact, one row on empty input") {
    val df = writeFixture(fixture, "dcr-global")
    def global(d: org.apache.spark.sql.DataFrame) =
      d.agg(countDistinct(col("x")).as("n_x"),
        countDistinct(when(col("p"), col("x"))).as("n_px"))
    val r = global(df).collect()(0)
    assert((r.getLong(0), r.getLong(1)) == (4L, 2L))
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val plan = global(df).queryExecution.executedPlan
      assert(plan.collect { case e: ExpandExec => e }.isEmpty,
        s"global rewrite must remove the Expand:\n$plan")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    val empty = global(df.filter(col("g") < 0)).collect()
    assert(empty.length == 1 &&
      (empty(0).getLong(0), empty(0).getLong(1)) == (0L, 0L),
      "global aggregate over empty input must still emit its one zero row")
  }
}
