package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}

/** Logical "k smallest rows per key under `order`" — the whole-operator
  * form of the declarative `row_number().over(partitionBy(keys).orderBy(
  * order)) <= k` pattern ([[RewriteRankLimit]] produces this node; the
  * planner strategy in [[GraftExtensions]] maps it to the two-phase
  * bounded-heap [[TopKPerKeyExec]]).
  *
  * Why a custom node at all (SURVEY §7.1 said "none needed"): Spark 4's
  * own rank-limit pushdown (`InferWindowGroupLimit` →
  * `WindowGroupLimitExec`) is sort-based — its Partial mode declares
  * `requiredChildOrdering = partition ++ order`, so the map side still
  * pays a FULL local sort (O(n log n), spill-prone) of every input
  * partition before any row is discarded. A hash-map of k-bounded heaps
  * needs one streaming pass, O(n log k) comparisons and O(k · keys)
  * memory, and shuffles the same ≤ k rows per (key, map partition). At
  * 100 TB with k≈10 that removes the single largest cost of the query —
  * sorting data that is about to be thrown away.
  *
  * Output rows are exactly the rows the window form keeps (the ordering
  * used by registered queries is total, so the per-key min-k set is
  * unique); within-key output order is unspecified, as with any
  * aggregation — consumers re-sort, and the Window that [[RewriteRankLimit]]
  * leaves above this node re-derives the rank column on the ≤ k·keys
  * survivors.
  */
final case class TopKPerKey(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    child: LogicalPlan)
  extends UnaryNode {

  require(k > 0, s"TopKPerKey needs k > 0, got $k")

  override def output: Seq[Attribute] = child.output

  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}
