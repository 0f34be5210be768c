package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, EqualTo, IntegerLiteral, LessThan, LessThanOrEqual, NamedExpression, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the ubiquitous top-k-per-group idiom
  *
  *   Project(cols without rn,
  *     Filter(rn <= k,
  *       Window(rn := row_number() OVER (PARTITION BY g ORDER BY o), child)))
  *
  * into [[TopKPerGroup]](k, g, o, child) — turning every existing
  * window-formulated top-k query into the sort-free two-heap plan with no
  * source change. This is the acceleration path users actually hit:
  * nobody calls a bespoke operator API, everybody writes `row_number()
  * ... <= k` and drops the rank column.
  *
  * Deliberately conservative; the rewrite fires only when
  *  - the Window computes EXACTLY one expression and it is row_number()
  *    (rank/dense_rank admit ties past k — different semantics);
  *  - the filter is `rn <= lit`, `rn < lit`, or the argmax idiom
  *    `rn = 1` on that alias, nothing else (a conjunction could also
  *    reference rn; `rn = n` for n>1 selects exactly rank n, not top-n);
  *  - the Project above drops the rank column (so nothing downstream can
  *    observe the row numbers the heap never assigns);
  *  - the partition spec is non-empty (a global top-k has no clustering
  *    key for the final pass — Spark's own TakeOrderedAndProject already
  *    owns that case).
  *
  * Under order ties both formulations keep an arbitrary-but-valid k rows,
  * so the rewrite never changes any deterministically-ordered result —
  * the same total-order contract every query here follows anyway.
  */
object GroupTopKRewrite extends Rule[LogicalPlan] {

  private def rnAlias(exprs: Seq[NamedExpression]): Option[Alias] = exprs match {
    case Seq(a @ Alias(WindowExpression(RowNumber(), _), _)) => Some(a)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case p @ Project(projectList,
        Filter(cond, w @ Window(winExprs, part, order, child, _)))
        if part.nonEmpty && rnAlias(winExprs).isDefined =>
      val rn = rnAlias(winExprs).get
      val k = cond match {
        case LessThanOrEqual(a: AttributeReference, IntegerLiteral(n))
            if a.exprId == rn.exprId => Some(n)
        case LessThan(a: AttributeReference, IntegerLiteral(n))
            if a.exprId == rn.exprId => Some(n - 1)
        // the argmax idiom: rn = 1 ⟺ rn <= 1 (row_number starts at 1).
        // ONLY k=1 — `rn = n` for n>1 means "exactly rank n", not top-n
        case EqualTo(a: AttributeReference, IntegerLiteral(1))
            if a.exprId == rn.exprId => Some(1)
        case EqualTo(IntegerLiteral(1), a: AttributeReference)
            if a.exprId == rn.exprId => Some(1)
        case _ => None
      }
      val projDropsRn =
        projectList.forall(ne => !ne.references.exists(_.exprId == rn.exprId))
      k match {
        case Some(n) if n > 0 && projDropsRn =>
          // Spark's InferWindowGroupLimit may already have inserted its
          // sort-based per-group limit below this window for the same
          // pattern; the heap operator supersedes it — strip it so the
          // plan doesn't pay Sort+limit AND the heaps
          val base = child match {
            case wgl: WindowGroupLimit
                if wgl.partitionSpec == part && wgl.orderSpec == order &&
                  wgl.rankLikeFunction.isInstanceOf[RowNumber] &&
                  wgl.limit >= n => wgl.child
            case other => other
          }
          // normalize float/double group keys (-0.0/NaN) — depending on
          // where this rule runs, NormalizeFloatingNumbers may not have
          // touched the window yet and will never touch TopKPerGroup
          val groups = part.map(
            org.apache.spark.sql.graftbridge.ColumnBridge.normalizeFloats)
          Project(projectList, TopKPerGroup(n, groups, order, base))
        case _ => p
      }
  }
}
