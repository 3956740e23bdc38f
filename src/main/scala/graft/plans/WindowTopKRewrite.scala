package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias,
  And,
  AttributeReference,
  EqualTo,
  ExprId,
  Expression,
  GreaterThan,
  GreaterThanOrEqual,
  IntegerLiteral,
  LessThan,
  LessThanOrEqual,
  Rank,
  RowNumber,
  SortOrder,
  SpecifiedWindowFrame,
  WindowExpression,
  WindowSpecDefinition
}
import org.apache.spark.sql.catalyst.expressions.{CurrentRow, RowFrame, UnboundedPreceding}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous SQL window-top-k idiom
  *
  *   SELECT ... FROM (SELECT ..., row_number() OVER
  *     (PARTITION BY g ORDER BY o) AS rn FROM t) WHERE rn <= k
  *
  * (and its `rank()` sibling, which routes through the KEEP-TIES heap so
  * boundary ties — rank ≤ k rows beyond the k-th — survive the cut)
  *
  * to rank over a [[TopKPerGroup]]-bounded input. The window form shuffles
  * EVERY row of every group and sort-materializes each partition before
  * discarding all but k; after the rewrite the bounded-heap operator feeds
  * the window at most k rows per group, so the shuffle carries k·groups
  * candidates and the WindowExec sort collapses — same plan shape
  * `TopK.perGroup` users get explicitly, now derived for plain-SQL users.
  *
  * Semantics: the heap retains the k first rows under EXACTLY the window's
  * SortOrder (same null ordering, same direction), and row_number is then
  * recomputed over that subset — identical output up to row_number's own
  * tie-arbitrariness (ties at the k boundary were already
  * plan-nondeterministic in the window form). Fires only on the
  * conservative shape it can prove: a single row_number window expression
  * with the default running frame, a deterministic non-empty ORDER BY,
  * deterministic partition keys, and a literal rank bound `rn <= k` /
  * `rn < k` / `rn = 1` (possibly one conjunct of an AND) with
  * 1 ≤ k ≤ `maxK` — beyond maxK the per-group heaps stop being "bounded"
  * in any useful sense and the window form's spillable sort is safer.
  *
  * Activation: injected by [[GraftExtensions]] (builder-time), or
  * `spark.experimental.extraOptimizations ++= Seq(WindowTopKRewrite)` on a
  * built session (plus `TopKStrategy` via `Bridge.addStrategy`, which
  * GraftExtensions also injects). Idempotent under fix-point batches: a
  * Window already fed by [[TopKPerGroup]] never re-matches.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private val maxK = 1000000

  /** Literal rank bound on `rn`, searched one conjunct deep. */
  private def kFromCond(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rn        => Some(k - 1)
    // rn = k: bound to the top k, the surviving filter then picks the k-th
    case EqualTo(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rn         => Some(k)
    case EqualTo(IntegerLiteral(k), a: AttributeReference) if a.exprId == rn         => Some(k)
    case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference) if a.exprId == rn => Some(k)
    case GreaterThan(IntegerLiteral(k), a: AttributeReference) if a.exprId == rn     => Some(k - 1)
    case And(l, r) => kFromCond(l, rn).orElse(kFromCond(r, rn))
    case _         => None
  }

  /** The provable shape: one row_number (exact-k heap) or rank (keep-ties
    * heap — boundary ties all have rank ≤ k and must survive the cut) over
    * a deterministic spec with a default running frame, not already
    * bounded. rank's formal frame is the RANGE running frame, so both
    * running frames are accepted; dense_rank is deliberately NOT matched —
    * `dense_rank <= k` keeps k DISTINCT keys, a row set no k-bounded heap
    * retention can prove. */
  private def rankWindow(w: Window): Option[(Seq[Expression], Seq[SortOrder], ExprId, Boolean)] =
    w.windowExpressions match {
      case Seq(a @ Alias(
            WindowExpression(
              fn,
              WindowSpecDefinition(part, order, SpecifiedWindowFrame(_, UnboundedPreceding, CurrentRow))),
            _))
          if (fn.isInstanceOf[RowNumber] || fn.isInstanceOf[Rank]) &&
            order.nonEmpty && order.forall(_.deterministic) && part.forall(_.deterministic) &&
            !w.child.isInstanceOf[TopKPerGroup] =>
        Some((part, order, a.exprId, fn.isInstanceOf[Rank]))
      case _ => None
    }

  private def bound(f: Filter, cond: Expression, w: Window, rebuild: LogicalPlan => LogicalPlan): Option[LogicalPlan] =
    rankWindow(w).flatMap { case (part, order, rnId, keepTies) =>
      kFromCond(cond, rnId)
        .filter(k => k >= 1 && k <= maxK)
        .map(k => f.copy(child = rebuild(w.copy(child = TopKPerGroup(part, order, k, w.child, keepTies)))))
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, w: Window) =>
      bound(f, cond, w, identity).getOrElse(f)
    case f @ Filter(cond, p @ Project(_, w: Window)) =>
      bound(f, cond, w, nw => p.copy(child = nw)).getOrElse(f)
  }
}
