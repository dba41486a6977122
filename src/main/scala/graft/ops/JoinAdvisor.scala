package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cost-estimated broadcast-vs-shuffle join planning — the decision a
  * 100 TB pipeline has to make EXPLICITLY whenever Catalyst's file
  * statistics lie (post-filter selectivity, fresh appends, views over
  * expensive subqueries): measure both sides, pick the strategy, and
  * pin it with a join-strategy hint so the plan is deterministic
  * rather than stats-dependent.
  *
  * The decision rule is deliberately row-count-based and engine-
  * independent (so a DuckDB oracle recomputes it exactly): broadcast
  * the smaller side iff its row count is ≤ `maxBroadcastRows`,
  * tie-breaking toward the right side (Spark's preferred build side);
  * otherwise shuffle (sort-merge). Counting costs one cheap
  * map-side-combined aggregate per side — bounded driver traffic —
  * and is the honest version of what `q_join_size_estimate` bounds
  * with a KMV sample when even one counting pass is too expensive.
  *
  * `JoinAdvisorSpec` closes the loop with the optimizer: on the
  * clear-cut TPC-H shapes (dimension joins, the sf-gate fact join)
  * Catalyst's UNHINTED strategy choice equals this advisor's, and the
  * hinted plan always lands the advised physical family.
  */
object JoinAdvisor {

  final val DefaultMaxBroadcastRows = 100000L

  /** The pure decision rule. */
  def decide(leftRows: Long, rightRows: Long,
             maxBroadcastRows: Long = DefaultMaxBroadcastRows): String =
    if (math.min(leftRows, rightRows) > maxBroadcastRows) "shuffle"
    else if (leftRows < rightRows) "broadcast_left"
    else "broadcast_right"

  /** Measured advice for one join edge: count both sides, decide, and
    * return the decision plus the hinted join ready to run. The hint
    * ("broadcast" on the chosen build side, "merge" for shuffle) makes
    * the physical strategy follow the measurement, not the scan stats.
    */
  def advisedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                  how: String = "inner",
                  maxBroadcastRows: Long = DefaultMaxBroadcastRows)
      : (DataFrame, String, Long, Long) = {
    val nl = left.count()
    val nr = right.count()
    val d = decide(nl, nr, maxBroadcastRows)
    val joined = d match {
      case "broadcast_left"  => left.hint("broadcast").join(right, keys, how)
      case "broadcast_right" => left.join(right.hint("broadcast"), keys, how)
      case _                 => left.join(right.hint("merge"), keys, how)
    }
    (joined, d, nl, nr)
  }

  /** True iff `df`'s physical plan contains the join family the
    * decision advised (BroadcastHashJoinExec for broadcast_*,
    * SortMergeJoinExec for shuffle) — the audit that the hint actually
    * took effect. Matches typed plan nodes, not the rendered string: a
    * multi-join plan whose OTHER edges legitimately use the opposite
    * family must not false-positive this edge's audit. Callers joining
    * more than one edge in `df` should audit the edge's own DataFrame
    * (the `advisedJoin` return) before composing further.
    */
  def planMatches(df: DataFrame, decision: String): Boolean = {
    // plain collect treats AdaptiveSparkPlanExec/QueryStageExec as
    // leaves — expand them so the audit sees the real join nodes
    def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] = p +: (p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        allNodes(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        allNodes(q.plan)
      case other => other.children.flatMap(allNodes)
    })
    val nodes = allNodes(df.queryExecution.executedPlan)
    if (decision == "shuffle")
      nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])
    else
      nodes.exists(_.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec])
  }
}
