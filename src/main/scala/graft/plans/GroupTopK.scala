package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Whole-operator Catalyst extension: top-k rows per group under a total
  * order, executed with bounded per-group heaps instead of a sort.
  *
  * The composable formulation — `row_number() OVER (PARTITION BY g ORDER
  * BY o) <= k` — must SORT every partition: O(n log n) comparisons and a
  * full spill surface, to then discard all but k rows per group. This
  * operator streams each partition once into per-group k-bounded heaps
  * (O(n log k), memory O(groups·k)) and runs twice, like a partial
  * aggregate: a map-side pass on whatever partitioning exists, then a
  * final pass after a hash exchange on the group key — the partial pass
  * bounds the shuffle to ≤ k rows per group per input partition, which is
  * what makes the plan survive 100 TB of input with a small k.
  *
  * Contract: `order` must be a total order (include a unique tiebreaker)
  * for deterministic output — the same contract every declared query in
  * this library already follows (FIXTURES.md).
  */
final case class TopKPerGroup(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"top-k needs k > 0, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Planner rule: logical TopKPerGroup → partial exec + exchange-inducing
  * final exec (EnsureRequirements inserts the hash exchange to satisfy
  * the final node's ClusteredDistribution). */
object GroupTopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, groupExprs, order, child) =>
      TopKPerGroupExec(k, groupExprs, order, partial = false,
        TopKPerGroupExec(k, groupExprs, order, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

final case class TopKPerGroupExec(
    k: Int,
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (kk, grp, ord, attrs) = (k, groupExprs, order, child.output)
    child.execute().mapPartitions({ iter =>
      // codegen'd comparators/projections, generated executor-side once
      // per partition (same lifecycle SortExec uses)
      val ordering = RowOrdering.create(ord, attrs)
      val groupProj = UnsafeProjection.create(grp, attrs)
      val toUnsafe = UnsafeProjection.create(attrs, attrs)
      // java PriorityQueue is a min-heap by its comparator; reversing the
      // row ordering puts the WORST kept row at the root for O(log k)
      // eviction
      val reverse = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ordering.compare(b, a)
      }
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk + 1, reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.add(toUnsafe(row).copy())
        else if (ordering.compare(toUnsafe(row), heap.peek) < 0) {
          heap.poll()
          heap.add(toUnsafe(row).copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values.asScala.iterator.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}
