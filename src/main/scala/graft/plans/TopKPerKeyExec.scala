package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}

/** Bounded-heap top-k-per-key physical operator (see [[TopKPerKey]] for
  * why this beats the sort-based built-in `WindowGroupLimitExec`).
  *
  * Two-phase like a hash aggregate:
  *  - `partial = true` runs before the exchange with no distribution
  *    requirement: each map partition keeps its own k-minimal rows per
  *    key, so the shuffle moves ≤ k rows per (key, map partition).
  *  - `partial = false` requires `ClusteredDistribution(partitionSpec)`
  *    (EnsureRequirements inserts the hash exchange) and merges the
  *    partial heaps into the exact per-key answer.
  *
  * Both phases are the same streaming pass: one `UnsafeProjection` keyed
  * hash map of k-bounded max-heaps ordered by the (codegen'd)
  * `RowOrdering` of `orderSpec`. A row is copied only when it enters a
  * heap — the common case (row worse than the current k-th) touches no
  * memory. Memory is O(k · distinct keys in the partition) retained rows,
  * vs the built-in path's full-partition sort buffer; no spill path is
  * needed because the retained set IS the output.
  */
final case class TopKPerKeyExec(
    partitionSpec: Seq[Expression],
    orderSpec: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan,
    /** partial-phase memory valve: when the per-partition key map exceeds
      * this many keys, the current heaps are emitted and the map cleared —
      * the same pass-through fallback Spark's partial hash aggregation
      * uses under memory pressure. Correct by construction: the partial
      * contract is "a superset containing each key's top-k", and a
      * flushed epoch's rows are re-selected by the exact final phase (and
      * by the Window+Filter the rewrite leaves above the node). The FINAL
      * phase never flushes — its key count is total/shuffle-partitions,
      * bounded by parallelism choice, and its output must be exact. */
    maxPartialKeys: Int = TopKPerKeyExec.DefaultMaxPartialKeys)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    // empty spec = GLOBAL top-k (an unpartitioned rank limit): the final
    // phase needs every partial heap in one place — AllTuples, not
    // ClusteredDistribution(Nil) (which Spark rejects by requirement).
    // The shuffle then moves ≤ k rows per map partition, so the global
    // rank limit costs a TakeOrdered-shaped exchange, never a full sort.
    else if (partitionSpec.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(partitionSpec) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numKeys" -> SQLMetrics.createMetric(sparkContext, "number of distinct keys"),
    "numFlushes" -> SQLMetrics.createMetric(sparkContext, "partial memory-valve flushes"))

  override protected def doExecute(): RDD[InternalRow] = {
    val outRows = longMetric("numOutputRows")
    val keys = longMetric("numKeys")
    val flushes = longMetric("numFlushes")
    val keyExprs = partitionSpec
    val order = orderSpec
    val limit = k
    val attrs = child.output
    val flushAt = if (partial) maxPartialKeys else Int.MaxValue
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keyExprs, attrs)
      // max-heap on the sort order: head = worst retained row = eviction
      // candidate; keeps the k MINIMAL rows (rank 1..k of the window form)
      implicit val ord: Ordering[InternalRow] = RowOrdering.create(order, attrs)
      val heaps = new java.util.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]]()
      var flushed: Iterator[InternalRow] = Iterator.empty
      def drain(): Iterator[InternalRow] = {
        val rows = scala.jdk.CollectionConverters.IteratorHasAsScala(
          heaps.values().iterator()).asScala
          .flatMap { h => outRows.add(h.size.toLong); h.iterator }
          .toVector // materialize before clear — heap iterators are live views
        keys.add(heaps.size().toLong)
        heaps.clear()
        rows.iterator
      }
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          if (heaps.size() >= flushAt) {
            // memory valve (partial phase only): emit the current epoch's
            // heaps and start fresh — output becomes a superset the final
            // phase re-selects, memory stays O(k · flushAt)
            flushed = flushed ++ drain()
            flushes.add(1L)
          }
          heap = mutable.PriorityQueue.empty[InternalRow]
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ord.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      flushed ++ drain()
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

object TopKPerKeyExec {
  /** ~4M keys × k retained rows before the partial phase flushes — far
    * above any sane shuffle-partition key share, small enough that a
    * pathological keys≈rows input degrades to pass-through instead of
    * OOM. */
  val DefaultMaxPartialKeys: Int = 1 << 22
}
