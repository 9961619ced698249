package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graft.Bridge

/** Grouped top-K as a first-class operator:
  * logical node → planner strategy → two-phase physical operator.
  *
  * The stock formulation (`row_number().over(window)` + filter) fully
  * sorts every group and shuffles ALL rows to do it. This operator
  * keeps a bounded K-row heap per group on each input partition
  * (O(n log k), no sort), shuffles only the surviving ≤ K·groups rows
  * on the group key, and merges heaps on the reduce side — at 100 TB
  * the shuffle shrinks from the full fact table to K rows per group
  * per map partition.
  *
  * Memory is O(groups-per-partition × K) rows, like a hash aggregate
  * buffer; for extreme group cardinality with large K prefer the
  * window formulation (it spills).
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Physical grouped top-K. `finalPhase = false` runs on map partitions
  * as-is; `finalPhase = true` declares a clustered distribution on the
  * group key, so EnsureRequirements inserts the (tiny) exchange. */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    ordering: Seq[SortOrder],
    k: Int,
    finalPhase: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (!finalPhase) UnspecifiedDistribution :: Nil
    // empty group key = global top-k: the final merge needs all rows
    else if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val (groupE, orderE, out, kk) = (groupExprs, ordering, child.output, k)
    child.execute().mapPartitions({ it =>
      val toUnsafe = UnsafeProjection.create(out, out)
      val keyProj = UnsafeProjection.create(groupE, out)
      val ord = RowOrdering.create(orderE, out)
      // Per group: a reverse-ordered heap whose head is the WORST kept
      // row, so admission is one compare and eviction is O(log k).
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[UnsafeRow]]()
      val cmp = new java.util.Comparator[UnsafeRow] {
        override def compare(a: UnsafeRow, b: UnsafeRow): Int = ord.compare(b, a)
      }
      while (it.hasNext) {
        val row = toUnsafe(it.next())
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[UnsafeRow](kk + 1, cmp)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < kk) heap.offer(row.copy())
        else if (ord.compare(row, heap.peek()) < 0) {
          heap.poll(); heap.offer(row.copy())
        }
      }
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Plans [[TopKPerGroupNode]] as partial → exchange → final. */
object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, finalPhase = true,
        TopKPerGroupExec(g, o, k, finalPhase = false, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API. Ordering columns may carry `.asc`/`.desc`;
  * bare columns default to ascending. Result rows are the per-group
  * top K under that ordering, in no particular order. */
object TopK {
  def perGroup(df: DataFrame, k: Int,
               groupCols: Seq[Column], orderCols: Seq[Column]): DataFrame = {
    // Self-install on sessions built without GraftExtensions, so the
    // operator works from any SparkSession.
    val exp = df.sparkSession.experimental
    if (!exp.extraStrategies.contains(TopKStrategy)) {
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    }
    val g = groupCols.map(Bridge.eagerExpression)
    val o = orderCols.map(Bridge.eagerExpression).map {
      case so: SortOrder => so
      case e => SortOrder(e, Ascending)
    }
    Bridge.ofRows(df.sparkSession, TopKPerGroupNode(g, o, k, Bridge.logicalPlan(df)))
  }
}
