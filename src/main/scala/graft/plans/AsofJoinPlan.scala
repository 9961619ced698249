package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graft.Bridge

/** Physical as-of join: for every left row, the most recent right row
  * with the same key and time ≤ the left time.
  *
  * The library's default formulation
  * ([[graft.operators.AsofJoin.join]]) composes union + running-max —
  * one shuffle + one sort over the UNION of both sides. This operator
  * is the dedicated exec: each side is shuffled on its own key and
  * sorted (key, time) independently, then a single streaming merge per
  * partition emits left rows with a carried "latest right row" cursor.
  * Same shuffle volume, but the sort runs per side (smaller runs, no
  * union-wide struct max machinery) and the merge is O(n) with O(1)
  * state — the shape a native ASOF engine uses.
  *
  * Contract: right rows must be unique per (key, time) — like any
  * ASOF engine, a tie would be resolved arbitrarily (the composition
  * resolves it by max payload; pre-aggregate to make ties impossible,
  * as `qAsofJoin` does).
  */
case class AsofJoinNode(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  // right-side columns are nullable in the output: a left row with no
  // at-or-before right row emits nulls
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

case class AsofJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // co-partition both sides on the key (EnsureRequirements inserts the
  // exchanges and makes the partitionings compatible, as for any
  // shuffled join)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-partition sort by (key, time) on each side independently
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    val (lOut, rOut, allOut) = (left.output, right.output, output)
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val lKeyProj = UnsafeProjection.create(lk, lOut)
      val rKeyProj = UnsafeProjection.create(rk, rOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), lOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rOut)
      val kOrd = RowOrdering.createNaturalAscendingOrdering(lk.map(_.dataType))
      val tOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lt.dataType))
      val outProj = UnsafeProjection.create(allOut, allOut)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rOut.size)
      val rBuf = rIt.buffered
      new Iterator[InternalRow] {
        // cursor: the latest right row (and its key) seen with
        // time ≤ the current left time — O(1) state per partition
        private var lastKey: InternalRow = null
        private var lastVal: InternalRow = null
        override def hasNext: Boolean = lIt.hasNext
        override def next(): InternalRow = {
          val l = lIt.next()
          val lkRow = lKeyProj(l)
          while (rBuf.hasNext && {
            val r = rBuf.head
            val c = kOrd.compare(rKeyProj(r), lkRow)
            c < 0 || (c == 0 && tOrd.compare(rTimeProj(r), lTimeProj(l)) <= 0)
          }) {
            val r = rBuf.next()
            if (kOrd.compare(rKeyProj(r), lkRow) == 0) {
              // sort buffers are reused: retain copies only
              lastKey = lkRow.copy()
              lastVal = r.copy()
            } // smaller-keyed right rows can never match again: drop
          }
          val matched = lastKey != null && kOrd.compare(lastKey, lkRow) == 0
          // lastVal.time ≤ its admitting left time ≤ current left time
          // (left times nondecreasing within a key), so no re-check
          outProj(joined(l, if (matched) lastVal else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(lk, rk, lt, rt, l, r) =>
      AsofJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API for the physical as-of join. Same contract as
  * [[graft.operators.AsofJoin.join]]: output = all left columns +
  * (asof_time, asof_payload).
  *
  * Null semantics: join keys use the engine's natural ordering, where
  * null == null — a null-keyed left row CAN match a null-keyed right
  * row (consistent with the union+running-max composition, which
  * groups null keys together; unlike SQL equi-join null≠null). Filter
  * nulls out beforehand if SQL semantics are wanted. */
object AsofPhysical {
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String, payload: String): DataFrame = {
    val spark = left.sparkSession
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsofStrategy)) {
      exp.extraStrategies = exp.extraStrategies :+ AsofStrategy
    }
    // pre-project the right side; the key rides under a reserved name
    // so the final drop can't collide with a left column
    val rightSel = right.select(right(key).as("_asof_rk"),
      right(rightTime).as("asof_time"), right(payload).as("asof_payload"))
    val lPlan = Bridge.analyzedPlan(left)
    val rPlan = Bridge.analyzedPlan(rightSel)
    def attr(p: LogicalPlan, name: String) = p.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"asof join: no column '$name' in ${p.output.map(_.name)}"))
    val (lKey, rKey) = (attr(lPlan, key), attr(rPlan, "_asof_rk"))
    val (lTime, rTime) = (attr(lPlan, leftTime), attr(rPlan, "asof_time"))
    // the exec compares each pair with ONE natural ordering built from
    // the left type — differently-typed sides would corrupt comparisons
    // silently, so reject them here (cast explicitly before joining)
    require(lKey.dataType == rKey.dataType,
      s"asof join: key types differ: ${lKey.dataType} vs ${rKey.dataType}")
    require(lTime.dataType == rTime.dataType,
      s"asof join: time types differ: ${lTime.dataType} vs ${rTime.dataType}")
    val node = AsofJoinNode(
      leftKeys = Seq(lKey),
      rightKeys = Seq(rKey),
      leftTime = lTime,
      rightTime = rTime,
      lPlan, rPlan)
    Bridge.ofRows(spark, node).drop("_asof_rk")
  }

  /** Column helper mirroring AsofJoin.join's output names. */
  def columns(left: DataFrame): Seq[Column] =
    left.columns.toSeq.map(col) :+ col("asof_time") :+ col("asof_payload")
}
