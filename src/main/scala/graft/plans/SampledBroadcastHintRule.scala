package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, HintInfo, Join, JoinHint, Limit, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Measured broadcast planning as an OPTIMIZER RULE — the decision a
  * 100 TB planner must make when file statistics LIE: without CBO,
  * Spark's size-only estimation propagates a scan's full size through
  * filters, so "big table filtered to 50 rows ⋈ big table" plans a
  * sort-merge join with both sides shuffling, even though the filtered
  * side would broadcast for free. [[graft.ops.JoinAdvisor]] makes that
  * measurement ad hoc (count, decide, hint); this rule injects the
  * same decision into EVERY query plan of a session that opts in.
  *
  * Mechanics: for an unhinted join whose BOTH sides' estimated sizes
  * exceed `spark.sql.autoBroadcastJoinThreshold` (i.e. Catalyst is
  * about to shuffle), run a CAPPED count of each side —
  * `LIMIT (maxRows+1)` then count, so the probe's cost is bounded by
  * the threshold, never by the table — and attach a BROADCAST hint to
  * a side proven ≤ `spark.graft.joinAdvisor.maxBroadcastRows`
  * (tie-break toward the right, Spark's preferred build side — the
  * same [[graft.ops.JoinAdvisor.decide]] rule, so the measured-ad-hoc
  * and injected paths can never disagree). Both sides capped ⇒ the
  * join is left alone (sort-merge is right). The hint only ever
  * changes the physical STRATEGY; an illegal hint for the join type is
  * ignored by Spark's planner, so rows are unchanged by construction.
  *
  * Safety at scale:
  *   - OPT-IN: `spark.graft.joinAdvisor.enabled=true` per session; off
  *     by default, so plans are untouched unless asked (counting
  *     executes jobs at PLANNING time — that is the explicit trade:
  *     one bounded probe against a mis-planned 100 TB shuffle).
  *   - Counts are cached per canonicalized subtree (bounded LRU), so
  *     the optimizer's fixed-point re-runs and repeated queries over
  *     the same relations don't re-probe.
  *   - A thread-local re-entry guard keeps the probe's own query from
  *     recursing into this rule (a nested join inside a counted side
  *     would otherwise probe-within-probe).
  */
case class SampledBroadcastHintRule(session: SparkSession)
    extends Rule[LogicalPlan] {

  import SampledBroadcastHintRule._

  private def enabled: Boolean =
    session.conf.get(EnabledKey, "false").toBoolean
  private def maxRows: Long =
    session.conf.get(MaxRowsKey,
      graft.ops.JoinAdvisor.DefaultMaxBroadcastRows.toString).toLong
  private def autoThreshold: Long =
    session.sessionState.conf.autoBroadcastJoinThreshold

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled || probing.get()) return plan
    val threshold = autoThreshold
    // autoBroadcastJoinThreshold < 0 is the user saying "never
    // broadcast" — injecting BROADCAST hints would override that
    if (threshold < 0) return plan
    val cap = maxRows
    plan.transformUp {
      case j @ Join(l, r, _, _, JoinHint.NONE)
          if l.stats.sizeInBytes > threshold &&
            r.stats.sizeInBytes > threshold =>
        val nl = cappedCount(l, cap)
        val nr = cappedCount(r, cap)
        graft.ops.JoinAdvisor.decide(nl, nr, cap) match {
          case "broadcast_left" =>
            j.copy(hint = JoinHint(Some(HintInfo(Some(BROADCAST))), None))
          case "broadcast_right" =>
            j.copy(hint = JoinHint(None, Some(HintInfo(Some(BROADCAST)))))
          case _ => j // both sides measured big: sort-merge is right
        }
    }
  }

  /** True row count of `p`, capped at `cap + 1` (a capped result means
    * "too big to broadcast" — the probe never scans past the answer).
    */
  private def cappedCount(p: LogicalPlan, cap: Long): Long = {
    // size-stamped key: a relation that GROWS between queries changes
    // its estimated size, which invalidates the old "small" verdict —
    // a bare canonicalized-plan key would serve the stale count for
    // the JVM lifetime and broadcast a now-large table
    val key = (p.canonicalized, p.stats.sizeInBytes)
    counts.synchronized {
      val hit = counts.get(key)
      if (hit != null) return hit
    }
    // Limit takes an Int: clamp a user cap near Long ranges instead of
    // silently overflowing to a tiny/negative limit (which would
    // undercount and hint a huge relation for broadcast)
    val probeLimit = math.min(cap + 1, Int.MaxValue.toLong).toInt
    probing.set(true)
    val n =
      try org.apache.spark.sql.GraftColumnShim
        .ofRows(session, Limit(Literal(probeLimit), p)).count()
      finally probing.set(false)
    counts.synchronized(counts.put(key, n))
    n
  }
}

object SampledBroadcastHintRule {
  final val EnabledKey = "spark.graft.joinAdvisor.enabled"
  final val MaxRowsKey = "spark.graft.joinAdvisor.maxBroadcastRows"

  private val probing = ThreadLocal.withInitial[java.lang.Boolean](() => false)

  /** (canonicalized subtree, estimated size) → measured count;
    * access-ordered LRU so a long session's probe memory stays bounded.
    * The size stamp makes growth self-invalidating: new bytes ⇒ new
    * key ⇒ fresh probe (the stale entry ages out of the LRU).
    */
  private val counts =
    new java.util.LinkedHashMap[(LogicalPlan, BigInt), java.lang.Long](
      32, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[(LogicalPlan, BigInt), java.lang.Long])
          : Boolean =
        size() > 64
    }
}
