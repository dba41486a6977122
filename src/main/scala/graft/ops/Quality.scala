package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation suite: declarative per-row rules evaluated
  * in ONE pass over the relation (every rule is a conditional count
  * inside the same codegen'd aggregate — no per-rule scans, no
  * collect), reported as violations per rule.
  *
  * The reference pipeline hand-rolls its checks as scattered filters
  * (null probes before FK joins, count()>0 guards); this is the same
  * idea as a reusable operator with a fixed report shape.
  */
object Quality {

  /** One named expectation: `pred` must hold for every row. */
  final case class Rule(name: String, pred: Column)

  /** Not-null expectation. */
  def notNull(c: String): Rule = Rule(s"not_null_$c", col(c).isNotNull)

  /** Inclusive-range expectation (null passes — compose with notNull). */
  def inRange(c: String, lo: Double, hi: Double): Rule =
    Rule(s"range_$c", col(c).isNull || (col(c) >= lo && col(c) <= hi))

  /** Set-membership expectation (null passes). */
  def inSet(c: String, allowed: Seq[String]): Rule =
    Rule(s"set_$c", col(c).isNull || col(c).isin(allowed.map(x => x: Any): _*))

  /** Evaluates all rules in one aggregation pass.
    * @return one row per rule: (rule, n_rows, n_violations, pass) —
    *         ordered by rule name for a deterministic report.
    */
  def report(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "at least one rule")
    // rule names are spliced into a selectExpr below — keep them
    // identifier-shaped so a name can't smuggle SQL into the plan
    rules.foreach(r => require(r.name.matches("[A-Za-z0-9_]+"),
      s"rule name must be [A-Za-z0-9_]+: '${r.name}'"))
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val counts = df.agg(
      count(lit(1)).as("__n"),
      rules.map(r => count(when(!r.pred, 1)).as(s"__v_${r.name}")): _*)
    // one wide row -> long report via stack (still one pass; the wide
    // row is a single driver-visible aggregate)
    val stackArgs = rules.map(r => s"'${r.name}', `__v_${r.name}`").mkString(", ")
    counts.selectExpr("__n",
        s"stack(${rules.length}, $stackArgs) AS (rule, n_violations)")
      .select(col("rule"), col("__n").as("n_rows"),
        col("n_violations"), (col("n_violations") === 0).as("pass"))
      .orderBy(col("rule"))
  }

  /** In-flight quality counters via `Dataset.observe` — the
    * ZERO-extra-pass rendition of [[report]]: the violation counts
    * piggyback on whatever action the caller was already running (the
    * write, the aggregate), instead of costing a second scan of a
    * 100 TB relation. The returned Observation yields the metrics map
    * after the caller's first action completes; rows flow through
    * unchanged.
    *
    * `report` remains the right tool when the REPORT is the product;
    * this is the production posture where quality is a side-channel of
    * the load job (observe-gate-then-publish: run the write, check the
    * observation, roll back/alert on breach).
    */
  def observed(df: DataFrame, rules: Seq[Rule])
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(rules.nonEmpty, "at least one rule")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val obs = org.apache.spark.sql.Observation()
    val exprs = count(lit(1)).as("n_rows") +:
      rules.map(r => count(when(!r.pred, 1)).as(s"violations_${r.name}"))
    (df.observe(obs, exprs.head, exprs.tail: _*), obs)
  }
}
