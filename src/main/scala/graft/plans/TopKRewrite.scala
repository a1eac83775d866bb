package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, CurrentRow, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, Rank, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the composable grouped-top-k idiom
  *
  * {{{
  *   SELECT <cols-not-rn>
  *   FROM (SELECT *, row_number() OVER (PARTITION BY g ORDER BY o) rn FROM t)
  *   WHERE rn <= k
  * }}}
  *
  * into the bounded-heap [[GroupedTopKNode]] physical shape, so SQL /
  * DataFrame users get the O(n log k), no-sort, shuffle-bounded plan
  * without calling [[GroupedTopK.apply]] explicitly. Spark's own
  * `InferWindowGroupLimit` (3.5+) only pre-filters each group to k rows
  * and still fully sorts and window-scans them; this rewrite removes the
  * Window (and its sort) entirely.
  *
  * Fires only when ALL of:
  *  - the Window computes exactly one expression: `row_number()` (→
  *    exactly-k semantics) or `rank()` (→ WITH TIES: the heap additionally
  *    keeps rows tying the k-th), both with the standard (RowFrame,
  *    UnboundedPreceding, CurrentRow) frame they resolve to. dense_rank
  *    never matches — it bounds distinct keys, not rows, which a
  *    bounded-row heap cannot answer;
  *  - the filter bounds that attribute by an integer literal
  *    (`rn <= k`, `rn < k`, `rn = 1`, or the mirrored forms), possibly
  *    conjoined with predicates that don't reference rn (those are kept
  *    as a Filter above the top-k, below the Project);
  *  - a Project above the Filter drops the row-number column (if rn
  *    survives, the Window must stay to compute it);
  *  - the partition spec is non-empty (a global top-k is `Sort` + `Limit`,
  *    which Spark already plans as TakeOrderedAndProject).
  *
  * Tie semantics: `row_number` over a non-total ordering is already
  * nondeterministic — any k-prefix consistent with the ordering is a
  * valid answer, and that's exactly what the heap returns. Callers that
  * need a deterministic result append a unique tie-break column, same
  * contract as [[GroupedTopK.apply]].
  *
  * Injected by [[GraftExtensions]] into the operator-optimization batch,
  * which runs to fixed point interleaved with CollapseProject /
  * ColumnPruning — so the rule sees the canonical Project▸Filter▸Window
  * shape regardless of how many intermediate projections the user wrote.
  */
object GroupedTopKRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** `rn <op> literal` conjunct → inclusive k. */
  private object RankLimit {
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) => Some((a, k))
      // k > Int.MinValue guards the decrement: `rn < Int.MinValue` is
      // always-false, and k-1 would wrap to Int.MaxValue (a top-everything)
      case LessThan(a: Attribute, IntegerLiteral(k)) if k > Int.MinValue =>
        Some((a, k - 1))
      case EqualTo(a: Attribute, IntegerLiteral(1)) => Some((a, 1))
      case EqualTo(IntegerLiteral(1), a: Attribute) => Some((a, 1))
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) => Some((a, k))
      case GreaterThan(IntegerLiteral(k), a: Attribute) if k > Int.MinValue =>
        Some((a, k - 1))
      case _ => None
    }
  }

  /** A Window whose sole output is a frame-standard `row_number()` or
    * `rank()` (both resolve with the (RowFrame, UnboundedPreceding,
    * CurrentRow) frame). The boolean is withTies: row_number keeps exactly
    * k rows per group; rank ≤ k keeps every row tying the k-th (both map
    * to [[GroupedTopKNode]], which implements the tie semantics natively).
    * dense_rank deliberately does NOT match — `dense_rank() <= k` bounds
    * DISTINCT keys, not rows, which no bounded-row heap can answer.
    */
  private object RowNumberWindow {
    def unapply(p: LogicalPlan)
        : Option[(Attribute, Seq[Expression], Seq[SortOrder], LogicalPlan,
          Boolean)] =
      p match {
        case Window(Seq(a @ Alias(WindowExpression(fn,
              WindowSpecDefinition(part, order,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
              _)), _, _, child, _) if order.nonEmpty && part.nonEmpty =>
          // Spark's InferWindowGroupLimit may already have inserted its
          // group-limit below the Window; the top-k subsumes it.
          val inner = child match {
            case WindowGroupLimit(_, _, _, _, c) => c
            case c => c
          }
          fn match {
            case _: RowNumber => Some((a.toAttribute, part, order, inner, false))
            case _: Rank => Some((a.toAttribute, part, order, inner, true))
            case _ => None
          }
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // returning `p` itself when the rewrite doesn't apply keeps the rule a
    // fixed-point no-op (same object, no plan change)
    case p @ Project(_, Filter(_, _: Window)) => rewrite(p).getOrElse(p)
  }

  private def rewrite(p: Project): Option[LogicalPlan] = p match {
    case Project(projectList,
        Filter(cond, RowNumberWindow(rnAttr, part, order, wChild, ties)))
        if projectList.forall(_.references.subsetOf(wChild.outputSet)) =>
      val (rankConjuncts, rest) =
        splitConjunctivePredicates(cond).partition {
          case RankLimit(a, _) => a.exprId == rnAttr.exprId
          case _ => false
        }
      val ks = rankConjuncts.collect { case RankLimit(_, k) => k }
      if (ks.size == 1 && ks.head >= 1 &&
          rest.forall(!_.references.contains(rnAttr))) {
        val topk = GroupedTopKNode(part, order, ks.head, wChild, ties)
        Some(Project(projectList,
          rest.reduceOption(And).map(Filter(_, topk)).getOrElse(topk)))
      } else None
    case _ => None
  }
}
