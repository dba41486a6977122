package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: regroup multiple `count(DISTINCT …)` aggregates that
  * share one base expression into a two-phase grouped plan.
  *
  * Spark plans aggregates whose distinct calls have DIFFERENT argument
  * lists — the common "overall vs conditional" pair
  *
  * {{{
  *   SELECT count(DISTINCT x),
  *          count(DISTINCT CASE WHEN p THEN x END)
  *   FROM t GROUP BY g
  * }}}
  *
  * — via an Expand that replicates every input row once per distinct
  * group. When every distinct argument is the SAME base `x` (bare or
  * under a single-branch CASE), the Expand is avoidable: group once by
  * (g, x) computing `max(p)` per conditional, then count non-null `x`
  * (≡ count DISTINCT x) and non-null `CASE WHEN max_p THEN x END`
  * (≡ the conditional distinct count) over the per-(g, x) rows. One
  * un-replicated pass, and the second aggregation runs over the
  * already-shrunk distinct relation. TPC-H Q21's supplier counts are
  * the canonical instance (q_tpch_q21 carries the shape hand-written;
  * the rule grants it to ad-hoc SQL).
  *
  * Soundness notes:
  *   - count(DISTINCT x) counts distinct NON-NULL x per group; after
  *     the inner group-by, that is exactly the count of inner rows
  *     with x IS NOT NULL.
  *   - CASE WHEN p THEN x END contributes x to the conditional count
  *     iff p is true on SOME row of the (g, x) cell — `max(p)` (null
  *     iff p was null on every such row, in which case the original
  *     CASE yielded NULL there too, so nothing was counted either way).
  *   - Count never returns NULL and stays LongType, so result types,
  *     names and exprIds are preserved exactly.
  *
  * Scope guards (rewrite only when provably safe AND profitable):
  * batch plans only (aggregate-over-aggregate is restricted in
  * streaming), all grouping expressions are deterministic attributes
  * (possibly none — a GLOBAL multi-distinct rewrites too: the inner
  * pass groups by the base alone, and the outer global aggregate
  * still emits its one row on empty input),
  * every non-grouping output is a top-level aliased distinct count
  * over the shared base, all predicates/base deterministic, no
  * FILTER clauses, and at least two DIFFERENT distinct argument
  * lists (with identical arguments Spark already plans a single
  * distinct group — no Expand to save). Idempotent: the rewritten
  * aggregates contain no distinct counts, so the fixed-point batch
  * converges immediately.
  */
object DistinctCountRegroupRule extends Rule[LogicalPlan] {

  private case class DCount(alias: Alias, pred: Option[Expression],
                            base: Expression)

  private def asDistinctCount(e: NamedExpression): Option[DCount] = e match {
    case a @ Alias(AggregateExpression(Count(Seq(arg)), _, true, None, _), _) =>
      arg match {
        case CaseWhen(Seq((p, v)), None) => Some(DCount(a, Some(p), v))
        case v => Some(DCount(a, None, v))
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(grouping, aggExprs, child, _)
        if !agg.isStreaming &&
          grouping.forall(g => g.isInstanceOf[Attribute] && g.deterministic) =>
      val dcs = aggExprs.flatMap(asDistinctCount(_))
      val nonDc = aggExprs.filter(asDistinctCount(_).isEmpty)
      val groupingPassthrough = nonDc.forall {
        case a: Attribute => grouping.exists(_.semanticEquals(a))
        case Alias(c, _)  => grouping.exists(_.semanticEquals(c))
        case _            => false
      }
      val applicable = dcs.size >= 2 && groupingPassthrough &&
        dcs.forall(d => d.base.deterministic &&
          d.pred.forall(_.deterministic) &&
          d.base.semanticEquals(dcs.head.base)) &&
        // profitable only when the argument lists differ — identical
        // arguments already share one distinct group (no Expand)
        dcs.map(d => d.pred.map(_.canonicalized) -> d.base.canonicalized)
          .distinct.size >= 2
      if (!applicable) agg
      else {
        val base = dcs.head.base
        val xAlias = Alias(base, "_dcr_x")()
        val flagFor: Map[Int, Alias] = dcs.zipWithIndex.collect {
          case (DCount(_, Some(p), _), i) =>
            i -> Alias(Max(p).toAggregateExpression(), s"_dcr_p$i")()
        }.toMap
        val groupAttrs = grouping.map(_.asInstanceOf[Attribute])
        val inner = Aggregate(
          groupAttrs :+ base,
          (groupAttrs: Seq[NamedExpression]) ++ (xAlias +: flagFor.values.toSeq),
          child)
        val xRef = xAlias.toAttribute
        val outerExprs: Seq[NamedExpression] = aggExprs.map { e =>
          asDistinctCount(e) match {
            case None => e // grouping passthrough, attrs flow through inner
            case Some(dc) =>
              val i = dcs.indexWhere(_.alias eq dc.alias)
              val arg = dc.pred match {
                case None    => xRef
                case Some(_) => CaseWhen(Seq((flagFor(i).toAttribute, xRef)), None)
              }
              Alias(Count(arg).toAggregateExpression(isDistinct = false),
                dc.alias.name)(exprId = dc.alias.exprId,
                qualifier = dc.alias.qualifier,
                explicitMetadata = dc.alias.explicitMetadata)
          }
        }
        Aggregate(groupAttrs, outerExprs, inner)
      }
  }
}
