package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Rewrites the declarative top-k-per-key idiom
  *
  * {{{ df.withColumn("rn", row_number().over(W.partitionBy(ks).orderBy(os)))
  *     .filter($"rn" <= k) }}}
  *
  * (optimized shape: `Filter(rn <= k, Window([rn := row_number()], ks, os))`)
  * into the same plan with a [[TopKPerKey]] injected BELOW the Window, so
  * the bounded-heap [[TopKPerKeyExec]] pair discards everything but the
  * k-minimal rows per key before the shuffle and before any sort. The
  * Window stays on top to re-derive the rank column over the ≤ k·keys
  * survivors — the rewrite is semantics-preserving by construction, and
  * queries stay correct (just slower) when the extension is not installed.
  *
  * Fires only when it is provably safe:
  *  - the Window computes EXACTLY one window expression, a `row_number()`
  *    (rank/dense_rank admit boundary ties, which a strictly k-bounded
  *    heap would cut; they stay on the built-in sort-based path);
  *  - the filter has a conjunct upper-bounding that attribute by an
  *    integer literal (`rn <= k`, `rn < k`, `rn = 1`, or flipped);
  *  - the window ordering is non-empty and 0 < k ≤ [[RewriteRankLimit.MaxK]]
  *    (the heap holds k rows per key per partition — a huge k belongs on
  *    the sort path, mirroring spark.sql.window.group.limit semantics);
  *  - the child is not already the injected node (the operator-optimization
  *    batch runs to fixpoint, so the rule must be idempotent).
  *
  * Spark's own `InferWindowGroupLimit` still fires on the rewritten shape
  * and adds a `WindowGroupLimit` between Window and TopKPerKey; it then
  * sorts only the already-limited rows, which is noise — the heavy map-side
  * full sort it would otherwise require is gone.
  */
object RewriteRankLimit extends Rule[LogicalPlan] with PredicateHelper {

  val MaxK = 100000

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(Alias(WindowExpression(RowNumber(), _), _)), part, order, child, _))
        if order.nonEmpty && !child.isInstanceOf[TopKPerKey] =>
      val rn = w.windowOutputSet.head
      limitFrom(cond, rn) match {
        case Some(k) if k > 0 && k <= MaxK =>
          f.copy(child = w.copy(child = TopKPerKey(part, order, k, child)))
        case _ => f
      }
  }

  /** tightest integer upper bound the condition places on `rn`, if any */
  private def limitFrom(cond: Expression, rn: Attribute): Option[Int] = {
    val bounds = splitConjunctivePredicates(cond).flatMap {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) => Some(v)
      case LessThan(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) => Some(v - 1)
      case GreaterThanOrEqual(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rn) => Some(v)
      case GreaterThan(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rn) => Some(v - 1)
      case EqualTo(a: Attribute, IntegerLiteral(v)) if a.semanticEquals(rn) => Some(v)
      case EqualTo(IntegerLiteral(v), a: Attribute) if a.semanticEquals(rn) => Some(v)
      case _ => None
    }
    if (bounds.isEmpty) None else Some(bounds.min)
  }
}
