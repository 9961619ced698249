package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the ubiquitous
  * `filter(row_number().over(partitionBy(P).orderBy(O)) <= k)` pattern
  * to run over [[TopKPerGroupNode]], so only the top K rows per group
  * per partition reach the window sort instead of the whole input.
  * The window (and the filter) stay in place to recompute the rank on
  * the reduced rows, so output columns are unchanged.
  *
  * OFF by default (`spark.graft.topk.rewrite=true` enables): when the
  * window ordering is not total (ties at the K boundary), the heap and
  * the full sort may keep different tie rows. Queries following this
  * engine's determinism rules (§6: every top-k carries a unique
  * tie-break key) are safe.
  */
object TopKRewrite extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.topk.rewrite"

  private def limit(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn => Some(v)
    case LessThan(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn => Some(v - 1)
    case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType))
        if a.exprId == rn && v == 1 => Some(1)
    case _ => None
  }

  private def isRowNumber(e: NamedExpression): Boolean = e match {
    case Alias(WindowExpression(_: RowNumber, _), _) => true
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString(ConfKey, "false").toBoolean) return plan
    plan.transformUp {
      case f @ Filter(cond, p @ Project(_,
          w @ Window(Seq(al: Alias), parts, orders, child, _)))
          if isRowNumber(al) && orders.nonEmpty &&
            !child.isInstanceOf[TopKPerGroupNode] =>
        limit(cond, al.exprId) match {
          case Some(k) if k > 0 =>
            f.copy(child = p.copy(child =
              w.copy(child = TopKPerGroupNode(parts, orders, k, child))))
          case _ => f
        }
      case f @ Filter(cond,
          w @ Window(Seq(al: Alias), parts, orders, child, _))
          if isRowNumber(al) && orders.nonEmpty &&
            !child.isInstanceOf[TopKPerGroupNode] =>
        limit(cond, al.exprId) match {
          case Some(k) if k > 0 =>
            f.copy(child =
              w.copy(child = TopKPerGroupNode(parts, orders, k, child)))
          case _ => f
        }
    }
  }
}
