package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftshim.GraftShim

/** Whole-operator Catalyst integration: group-wise top-k as its own
  * logical node, planner strategy, and physical operator.
  *
  * The standard formulation (row_number window + filter) must fully
  * SORT every group's rows before it can rank them. This operator
  * keeps a bounded k-element heap per group instead — O(n log k) with
  * O(groups·k) memory, no sort buffers, no rank column — the shape
  * you want when k is small and groups are large (top-k per user over
  * a 100 TB event log).
  */
case class TopKPerGroupPlan(grouping: Seq[Attribute], order: Seq[SortOrder],
                            k: Int, child: LogicalPlan,
                            partial: Boolean = false) extends UnaryNode {
  require(k >= 1)
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupPlan(g, o, k, child, partial) =>
      TopKPerGroupExec(g, o, k, planLater(child), partial) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(grouping: Seq[Attribute], order: Seq[SortOrder],
                            k: Int, child: SparkPlan,
                            partial: Boolean = false) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def outputPartitioning = child.outputPartitioning
  // partial mode runs the same heaps WITHIN each child partition, no
  // exchange: per-group-per-partition top-k always CONTAINS the
  // global per-group top-k, so a final clustered TopK over its
  // bounded output is exact — and when the upstream join is a
  // broadcast (each group's rows partition-local by construction),
  // the heavy stream never shuffles at all
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) super.requiredChildDistribution
    else Seq(ClusteredDistribution(grouping))

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val groupingExprs = grouping
    val sortOrder = order
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupingExprs, childOutput)
      val ordering = GenerateOrdering.generate(sortOrder, childOutput)
      // PriorityQueue.head = max under `ordering` = the worst kept row
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        val heap = heaps.get(key) match {
          case Some(h) => h
          case None =>
            val h = mutable.PriorityQueue.empty[InternalRow](ordering)
            heaps.put(key.copy(), h)
            h
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (ordering.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      heaps.valuesIterator.flatMap(_.toArray.sorted(ordering).iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Public API: df → top-k rows per group under (col, desc?) orders. */
object TopKPerGroup {
  private def build(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int, partial: Boolean): DataFrame = {
    val plan = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        sys.error(s"column $name not in ${plan.output.map(_.name)}"))
    val order = orderCols.map { case (n, desc) =>
      SortOrder(attr(n), if (desc) Descending else Ascending)
    }
    GraftShim.ofRows(df.sparkSession,
      TopKPerGroupPlan(groupCols.map(attr), order, k, plan, partial))
  }

  def apply(df: DataFrame, groupCols: Seq[String],
            orderCols: Seq[(String, Boolean)], k: Int): DataFrame =
    build(df, groupCols, orderCols, k, partial = false)

  /** Map-side partial heaps feeding the exact clustered pass: the
    * heavy (e.g. broadcast-join-scored) stream collapses to at most
    * groups-per-partition x k rows BEFORE any exchange — the exact
    * per-group top-k, with the shuffle carrying only heap survivors.
    */
  def staged(df: DataFrame, groupCols: Seq[String],
             orderCols: Seq[(String, Boolean)], k: Int): DataFrame =
    build(build(df, groupCols, orderCols, k, partial = true),
      groupCols, orderCols, k, partial = false)
}
