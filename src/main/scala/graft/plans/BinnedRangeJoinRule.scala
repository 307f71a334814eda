package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: rewrite a PURE time-range inequality join
  *
  * {{{ L JOIN R ON r_ts >= l_ts AND r_ts < l_ts + W }}}
  *
  * (no equality conjunct between the sides) into the binned equi-join of
  * [[graft.ops.Relational.binnedRangeJoin]]: the left side explodes to its
  * two candidate W-buckets, the right side projects its bucket, and the
  * join becomes an EQUI-join on `__bin` with the range predicates kept as
  * the residual condition.
  *
  * Why a Catalyst rule and not just the operator: Spark plans a join whose
  * condition has no equality conjunct as BroadcastNestedLoopJoin (or a
  * cartesian product) — O(|L|·|R|) row comparisons however selective the
  * range is. Users writing the natural inequality get the quadratic plan
  * silently. With this rule injected (`spark.experimental.extraOptimizations`
  * in-session, or `spark.sql.extensions=graft.expressions.GraftExtensions`
  * cluster-wide) the same query plans as a hash-partitionable equi-join —
  * AQE can size and skew-split it — with identical results
  * (BinnedRangeJoinRuleSpec pins equality against the naive plan and the
  * no-nested-loop shape).
  *
  * Completeness of the 2-bucket cover holds for any sign of the
  * timestamps: integral division is monotonic and `r - l < W` bounds the
  * bucket difference to {0, 1} (`(l+W) div W = l div W + 1` exactly).
  *
  * Scope guards (rewrite only when provably profitable and sound):
  *   - inner join, condition = exactly the canonical lower+upper conjuncts
  *     over LongType expressions, each referencing one side only;
  *   - a positive literal window;
  *   - NO cross-side equality conjunct (with one, Spark already plans an
  *     equi-join and the explode would only add overhead);
  *   - deterministic bound expressions.
  */
object BinnedRangeJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  /** (lowerBoundLeftTs, rightTs, window) when `e` is `r >= l` /
    * `r < l + W` against the given sides. */
  private def asLower(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[(Expression, Expression)] =
    e match {
      case GreaterThanOrEqual(rts, lts) if sided(lts, l) && sided(rts, r) => Some((lts, rts))
      case LessThanOrEqual(lts, rts) if sided(lts, l) && sided(rts, r) => Some((lts, rts))
      case _ => None
    }

  /** The returned window is the EXCLUSIVE range length: `r < l + W` keeps
    * W; the inclusive `r <= l + W` (what BETWEEN desugars to) becomes
    * W + 1, so the two-bucket cover (bin width ≥ range length) still
    * holds. */
  private def asUpper(e: Expression, l: LogicalPlan, r: LogicalPlan): Option[(Expression, Expression, Long)] =
    e match {
      case LessThan(rts, Add(lts, Literal(w: Long, LongType), _)) if sided(lts, l) && sided(rts, r) =>
        Some((lts, rts, w))
      case LessThan(rts, Add(Literal(w: Long, LongType), lts, _)) if sided(lts, l) && sided(rts, r) =>
        Some((lts, rts, w))
      case GreaterThan(Add(lts, Literal(w: Long, LongType), _), rts) if sided(lts, l) && sided(rts, r) =>
        Some((lts, rts, w))
      case LessThanOrEqual(rts, Add(lts, Literal(w: Long, LongType), _)) if sided(lts, l) && sided(rts, r) && w < Long.MaxValue =>
        Some((lts, rts, w + 1))
      case LessThanOrEqual(rts, Add(Literal(w: Long, LongType), lts, _)) if sided(lts, l) && sided(rts, r) && w < Long.MaxValue =>
        Some((lts, rts, w + 1))
      case GreaterThanOrEqual(Add(lts, Literal(w: Long, LongType), _), rts) if sided(lts, l) && sided(rts, r) && w < Long.MaxValue =>
        Some((lts, rts, w + 1))
      case _ => None
    }

  private def sided(e: Expression, side: LogicalPlan): Boolean =
    e.deterministic && e.dataType == LongType &&
      e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def crossEquality(e: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    e match {
      case EqualTo(a, b) =>
        (a.references.subsetOf(l.outputSet) && b.references.subsetOf(r.outputSet)) ||
          (a.references.subsetOf(r.outputSet) && b.references.subsetOf(l.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val rewritten = for {
        lowC <- conjuncts.flatMap(c => asLower(c, left, right).map(c -> _)).headOption
        upC <- conjuncts.flatMap(c => asUpper(c, left, right).map(c -> _)).headOption
        ((_, (loLts, loRts)), (_, (upLts, upRts, w))) = (lowC, upC)
        if w > 0 && loLts.semanticEquals(upLts) && loRts.semanticEquals(upRts)
        if !conjuncts.exists(crossEquality(_, left, right))
      } yield {
        val lBin = IntegralDivide(loLts, Literal(w))
        val binAttr = AttributeReference("__bin_l", LongType, nullable = true)()
        val gen = Generate(
          Explode(CreateArray(Seq(lBin, Add(lBin, Literal(1L))))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(binAttr), child = left)
        val rAlias = Alias(IntegralDivide(loRts, Literal(w)), "__bin_r")()
        val proj = Project(right.output :+ rAlias, right)
        val newCond = (conjuncts :+ EqualTo(binAttr, rAlias.toAttribute))
          .reduce[Expression](And)
        Project(j.output, Join(gen, proj, Inner, Some(newCond), hint))
      }
      rewritten.getOrElse(j)
  }
}
