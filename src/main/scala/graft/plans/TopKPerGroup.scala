package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Top-k-per-group as a first-class operator: logical node, planner
  * strategy, and a two-phase physical implementation.
  *
  * WHY a custom plan (build-brief preference (c)): the declarative
  * formulation — `row_number().over(partitionBy(g).orderBy(o)) <= k` —
  * shuffles EVERY row of every group and sort-materializes each partition
  * before discarding all but k rows. This operator keeps a bounded heap of
  * k rows per group on the map side, shuffles ONLY those k candidates per
  * (group, input-partition), and merges heaps on the reduce side: shuffle
  * volume drops from O(rows) to O(k · groups · partitions-touching-group),
  * and nothing is ever globally sorted. It is TakeOrderedAndProject
  * generalized from "one global group" to "per key" — an operator Spark
  * lacks.
  *
  * Memory: O(k · distinct-groups-per-partition) rows on each side —
  * the same envelope as a hash aggregate buffer (not spillable here;
  * for pathological group-cardinality × k products, fall back to the
  * window form).
  */
case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    keepTies: Boolean = false)
    extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

/** Shared heap pass: per group, keep the k first rows under `order`.
  *
  * `keepTies = true` switches to `rank() <= k` retention: every row whose
  * sort key equals the k-th smallest key is ALSO kept (rank counts strict
  * predecessors, so boundary ties all have rank ≤ k). Implementation: the
  * k-heap plus a homogeneous tie buffer holding rows equal to the current
  * boundary (heap head); when an eviction strictly improves the boundary,
  * the buffer — all at the old boundary key, now rank > k — drops
  * wholesale. Memory is O(k + boundary-tie count) per group: an all-tied
  * pathological group degrades to full retention, which is exactly the
  * row set rank() itself emits — the operator stops saving memory there,
  * never changes the result. */
private[plans] object TopKHeap {
  def topKPerPartition(
      iter: Iterator[InternalRow],
      groupExprs: Seq[Expression],
      order: Seq[SortOrder],
      k: Int,
      output: Seq[Attribute],
      keepTies: Boolean = false): Iterator[InternalRow] = {
    val keyProj  = UnsafeProjection.create(groupExprs, output)
    val ordering = GenerateOrdering.generate(order, output)
    // max-heap under `ordering`: the head is the WORST retained row, so a
    // better candidate evicts it in O(log k)
    final class Group {
      val heap = mutable.PriorityQueue.empty[InternalRow](ordering)
      var ties: mutable.ArrayBuffer[InternalRow] = null // lazily, keepTies only
      def add(row: InternalRow): Unit =
        if (heap.size < k) heap.enqueue(row.copy())
        else {
          val cmp = ordering.compare(row, heap.head)
          if (cmp < 0) {
            val evicted = heap.dequeue()
            heap.enqueue(row.copy())
            if (keepTies) {
              // evicted was the old boundary; it survives iff it still
              // ties the new boundary, else the whole buffer is stale
              if (ordering.compare(evicted, heap.head) == 0) tiesBuf += evicted
              else if (ties != null) ties.clear()
            }
          } else if (keepTies && cmp == 0) tiesBuf += row.copy()
        }
      private def tiesBuf: mutable.ArrayBuffer[InternalRow] = {
        if (ties == null) ties = mutable.ArrayBuffer.empty[InternalRow]
        ties
      }
      def rows: Iterator[InternalRow] =
        if (ties == null) heap.iterator else heap.iterator ++ ties.iterator
    }
    val groups = mutable.HashMap.empty[UnsafeRow, Group]
    iter.foreach { row =>
      groups.getOrElseUpdate(keyProj(row).copy(), new Group).add(row)
    }
    groups.valuesIterator.flatMap(_.rows)
  }
}

/** Map-side phase: bounded heaps per (group, partition) — the partial
  * aggregate analogue. Emits at most k rows per group per partition. */
case class TopKPerGroupPartialExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    keepTies: Boolean = false)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, out, ties) = (groupExprs, order, k, child.output, keepTies)
    child.execute().mapPartitions(iter => TopKHeap.topKPerPartition(iter, g, o, kk, out, ties), preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Reduce-side phase: requires clustering on the group key (EnsureRequirements
  * inserts the exchange); merges the per-partition candidates. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan,
    keepTies: Boolean = false)
    extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  // empty group list = global top-k: all (at most k-per-partition)
  // candidates must meet in one place, like a global TakeOrdered merge
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, kk, out, ties) = (groupExprs, order, k, child.output, keepTies)
    child.execute().mapPartitions(iter => TopKHeap.topKPerPartition(iter, g, o, kk, out, ties), preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child, ties) =>
      TopKPerGroupExec(g, o, k, TopKPerGroupPartialExec(g, o, k, planLater(child), ties), ties) :: Nil
    case _ => Nil
  }
}
