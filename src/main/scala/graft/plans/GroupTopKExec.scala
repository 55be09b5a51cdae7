package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Planner strategy for [[GroupTopK]]: partial bounded top-k on the map
  * side, hash exchange on the group keys (inserted by EnsureRequirements
  * because the final node declares ClusteredDistribution), final bounded
  * top-k + rank emission on the reduce side — the same partial/final shape
  * as hash aggregation, with a k-row heap per group as the "buffer".
  */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopK(groupExprs, order, k, rankAttr, child) =>
      val partial = GroupTopKPartialExec(groupExprs, order, k, planLater(child))
      GroupTopKFinalExec(groupExprs, order, k, rankAttr, partial) :: Nil
    case _ => Nil
  }
}

/** Shared bounded-heap kernel: one pass over a partition's rows keeping at
  * most k rows per group. Memory is O(groups-in-partition × k) — the same
  * envelope as a hash aggregation over the same keys, and the reason this
  * beats sorting whole groups: losers beyond k never survive the partition
  * they were read in.
  */
private[plans] object BoundedGroupHeaps {

  def build(
      iter: Iterator[InternalRow],
      groupExprs: Seq[Expression],
      order: Seq[SortOrder],
      inputSchema: Seq[Attribute],
      k: Int): mutable.HashMap[UnsafeRow, mutable.PriorityQueue[InternalRow]] = {
    val groupProj = UnsafeProjection.create(groupExprs, inputSchema)
    val ordering = GenerateOrdering.generate(order, inputSchema)
    // PriorityQueue dequeues the MAX of its ordering; with the row ordering
    // directly (ascending = "better first"), head is the worst row kept —
    // the one to evict when a better row arrives.
    val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
    iter.foreach { row =>
      val key = groupProj(row)
      heaps.get(key) match {
        case Some(heap) =>
          if (heap.size < k) heap.enqueue(row.copy())
          else if (ordering.compare(row, heap.head) < 0) {
            heap.dequeue(); heap.enqueue(row.copy())
          }
        case None =>
          val heap = mutable.PriorityQueue.empty[InternalRow](ordering)
          heap.enqueue(row.copy())
          heaps.put(key.copy(), heap)
      }
    }
    heaps
  }
}

/** Map-side half of [[GroupTopK]]: prune every input partition to ≤ k rows
  * per group before the exchange. No distribution requirement — it runs on
  * whatever partitioning the child has, and the shuffle it feeds carries
  * ≤ k rows per (partition, group) instead of whole groups.
  */
case class GroupTopKPartialExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, schema, kk) = (groupExprs, order, child.output, k)
    child.execute().mapPartitions({ iter =>
      BoundedGroupHeaps.build(iter, g, o, schema, kk).valuesIterator.flatMap(_.iterator)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKPartialExec =
    copy(child = newChild)
}

/** Reduce-side half: groups are now co-located (ClusteredDistribution →
  * EnsureRequirements inserts the hash exchange), so one more bounded pass
  * yields each group's true top k; the heap is drained in order and the
  * 1-based position appended as the rank column. Emitting the rank here is
  * what lets the rewrite delete the WindowExec entirely.
  */
case class GroupTopKFinalExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    rankAttr: Attribute,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rankAttr

  override def producedAttributes: AttributeSet = AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(groupExprs) :: Nil

  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val (g, o, schema, kk) = (groupExprs, order, child.output, k)
    val outputAttrs = output
    child.execute().mapPartitions({ iter =>
      val heaps = BoundedGroupHeaps.build(iter, g, o, schema, kk)
      val toUnsafe = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(1)
      heaps.valuesIterator.flatMap { heap =>
        // dequeueAll drains max-first = worst-first; reverse for rank order
        val best = heap.dequeueAll.reverse
        best.iterator.zipWithIndex.map { case (row, i) =>
          rankRow.update(0, i + 1)
          toUnsafe(joined(row, rankRow))
        }
      }
    }, preservesPartitioning = false)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKFinalExec =
    copy(child = newChild)
}
