package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: strengthen `levenshtein(a, b) <= k` filters with the
  * necessary condition `abs(length(a) - length(b)) <= k`.
  *
  * Edit distance is O(|a|·|b|) per pair, but it can never be below the
  * length difference — so the cheap length band is a sound prefilter
  * that short-circuits the quadratic kernel for most non-matching
  * pairs, and (unlike the levenshtein call itself) is simple enough
  * for further Catalyst treatment (constraint propagation, reordering
  * ahead of the expensive conjunct — Spark evaluates And left-to-right,
  * so the band runs first). graft.dedup.Dedup applies this banding
  * manually in its pair generators; the rule grants the same rewrite
  * to any ad-hoc SQL/DataFrame user of the session.
  *
  * Soundness: rows where either side is NULL fail both the original
  * and the strengthened predicate (And of a NULL conjunct), so the
  * filter's row set is unchanged. Idempotent: skips predicates whose
  * band conjunct is already present (semantic check), so repeated
  * optimizer passes reach a fixed point.
  */
object LevenshteinBandRule extends Rule[LogicalPlan] {

  private def bandFor(l: Levenshtein, bound: Expression): Expression =
    LessThanOrEqual(Abs(Subtract(Length(l.left), Length(l.right))), bound)

  private def alreadyBanded(conjuncts: Seq[Expression], band: Expression): Boolean =
    conjuncts.exists(_.semanticEquals(band))

  /** The strengthened predicate, or None when nothing applies.
    *
    * 2-arg levenshtein ONLY: the 3-arg thresholded form returns -1
    * above its threshold, so "levenshtein(a,b,t) <= k" can be true
    * for pairs far outside the length band — the rewrite would be
    * unsound there.
    */
  private def strengthen(cond: Expression): Option[Expression] = {
    val conjuncts = splitConjuncts(cond)
    val bands = conjuncts.flatMap {
      case LessThanOrEqual(l: Levenshtein, bound @ Literal(_, _))
          if l.threshold.isEmpty =>
        Some(bandFor(l, bound))
      case LessThan(l: Levenshtein, bound @ Literal(_, _))
          if l.threshold.isEmpty =>
        Some(LessThan(Abs(Subtract(Length(l.left), Length(l.right))), bound))
      case GreaterThanOrEqual(bound @ Literal(_, _), l: Levenshtein)
          if l.threshold.isEmpty =>
        Some(bandFor(l, bound))
      case _ => None
    }.filterNot(alreadyBanded(conjuncts, _))
    if (bands.isEmpty) None
    else Some(bands.foldLeft(cond)((c, b) => And(b, c)))
  }

  // Both homes the predicate can be in by the time this rule runs: a
  // Filter node, or a Join condition after PushPredicateThroughJoin
  // moved it there (the operator-optimization batch interleaves rules,
  // so the pushdown can win the race within an iteration).
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      strengthen(cond).map(Filter(_, child)).getOrElse(f)
    case j: org.apache.spark.sql.catalyst.plans.logical.Join
        if j.condition.isDefined =>
      strengthen(j.condition.get)
        .map(c => j.copy(condition = Some(c))).getOrElse(j)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }
}
