package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, UnaryNode, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Whole-operator top-k-per-group: the logical node the [[GroupTopKRewrite]]
  * optimizer rule produces and [[graft.plans.GroupTopKStrategy]] plans.
  *
  * Semantics: for each distinct value of `groupExprs`, keep the first `k`
  * rows of `child` in `order`, and append `rankAttr` = the 1-based position
  * within the group (exactly `row_number()` over the same spec followed by
  * `rank <= k`). `order` must be a total order per group for the result to
  * be deterministic — the same contract the window formulation has.
  *
  * This is the last rung of the extension ladder (custom LogicalPlan + Rule
  * + Strategy + SparkPlan via SparkSessionExtensions): Spark's own
  * WindowGroupLimit (the 3.5+ optimization for this pattern) prunes rows to
  * k per group before AND after the shuffle but still pays a full
  * WindowExec afterwards — a per-group sort of the pruned groups plus the
  * frame machinery — whereas this node's physical form
  * ([[GroupTopKPartialExec]]/[[GroupTopKFinalExec]]) keeps a bounded k-row
  * heap per group on the map side (the [[graft.functions.TopKAgg]] idea as
  * a native operator), shuffles ≤ k rows per (mapper, group), and emits
  * ranked rows directly from the final heaps — no WindowExec, no group
  * re-sort beyond k elements.
  */
case class GroupTopK(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopK =
    copy(child = newChild)
}

/** Optimizer rule rewriting `Filter(rn <= k, Window(row_number() ...))`
  * into [[GroupTopK]].
  *
  * Fires only on the exact shape whose semantics the node reproduces:
  *  - a Window computing a single `row_number()` expression (any other
  *    window function, or extra window columns, disables the rewrite);
  *  - a filter that is precisely a bound on that rank attribute
  *    (`rn <= k`, `rn < k`, `rn = 1`, or the mirrored literal-first forms);
  *  - a non-empty partition spec (global top-k belongs to
  *    TakeOrderedAndProject, not this node).
  *
  * If Spark's InferWindowGroupLimit already inserted its WindowGroupLimit
  * below the Window (rule order inside the operator-optimization batch is
  * not fixed), the inserted node is subsumed and stripped — GroupTopK
  * performs the same partial pruning in its own physical form.
  *
  * Gated by `spark.graft.topk.rewrite.enabled` (default true) so the stock
  * WindowExec path stays one conf away for A/B comparison.
  */
class GroupTopKRewrite extends Rule[LogicalPlan] {

  private def rankLimit(cond: Expression, rank: Attribute): Option[Int] = {
    def asK(e: Expression): Option[Int] = e match {
      case Literal(v: Int, _) => Some(v)
      case _ => None
    }
    cond match {
      case LessThanOrEqual(a: Attribute, l) if a.semanticEquals(rank) => asK(l)
      case LessThan(a: Attribute, l) if a.semanticEquals(rank) => asK(l).map(_ - 1)
      case EqualTo(a: Attribute, l) if a.semanticEquals(rank) => asK(l).filter(_ == 1)
      case GreaterThanOrEqual(l, a: Attribute) if a.semanticEquals(rank) => asK(l)
      case GreaterThan(l, a: Attribute) if a.semanticEquals(rank) => asK(l).map(_ - 1)
      case EqualTo(l, a: Attribute) if a.semanticEquals(rank) => asK(l).filter(_ == 1)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.topk.rewrite.enabled", "true").toBoolean) return plan
    plan.transformUp {
      case f @ Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
            partitionSpec, orderSpec, windowChild, _))
          if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
        rankLimit(cond, alias.toAttribute) match {
          case Some(k) if k > 0 =>
            // InferWindowGroupLimit's pruning node is subsumed by GroupTopK
            val child = windowChild match {
              case WindowGroupLimit(_, _, _, _, inner) => inner
              case other => other
            }
            GroupTopK(partitionSpec, orderSpec, k, alias.toAttribute, child)
          case _ => f
        }
    }
  }
}
