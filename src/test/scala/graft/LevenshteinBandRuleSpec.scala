package graft

import org.apache.spark.sql.functions._

/** [[graft.plans.LevenshteinBandRule]] — the injected optimizer rule
  * that strengthens `levenshtein(a,b) <= k` filters with the
  * `abs(length(a)-length(b)) <= k` necessary condition.
  *
  * Plan asserts run over the parquet-backed `part` table: a literal
  * fixture constant-folds to a LocalRelation before the rule could
  * leave a visible trace.
  */
class LevenshteinBandRuleSpec extends SparkSpec {
  import spark.implicits._

  private def partPairs = {
    val p = Tables.part(spark, "/root/testdata/sf0.001")
      .select(col("p_name")).distinct()
    p.select(col("p_name").as("a"))
      .crossJoin(p.select(col("p_name").as("b")).limit(5))
  }

  test("rule injects the length band into the optimized plan") {
    val df = partPairs.filter(expr("levenshtein(a, b) <= 2"))
    val optimized = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(optimized.contains("abs("), s"no length band in:\n$optimized")
    assert(optimized.contains("levenshtein"))
  }

  test("rewritten filter returns exactly the rows of the plain predicate") {
    val fixture = Seq(
      ("kitten", "sitting"),   // dist 3
      ("flaw", "lawn"),        // dist 2
      ("abc", "abcdefgh"),     // dist 5, len diff 5
      ("same", "same"),        // dist 0
      (null, "x"), ("x", null))
    val got = fixture.toDF("a", "b").filter(expr("levenshtein(a, b) <= 2"))
      .select("a", "b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1)(
        (i, j) => if (j == 0) i else if (i == 0) j else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = fixture
      .filter { case (a, b) => a != null && b != null && lev(a, b) <= 2 }.toSet
    assert(got == want)
  }

  test("idempotent: the band conjunct is not duplicated on re-optimization") {
    val df = partPairs
      .filter(expr("abs(length(a) - length(b)) <= 2 AND levenshtein(a, b) <= 2"))
    val optimized = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert("abs\\(".r.findAllIn(optimized).size == 1, optimized)
  }

  test("thresholded 3-arg levenshtein is left alone") {
    val df = partPairs.filter(expr("levenshtein(a, b, 10) <= 2"))
    val optimized = df.queryExecution.optimizedPlan.toString.toLowerCase
    assert(!optimized.contains("abs("), optimized)
  }
}
