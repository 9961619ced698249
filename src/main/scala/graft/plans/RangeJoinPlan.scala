package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType

/** Physical range join: every (probe ∩ [start, end] ≠ ∅) pair, with
  * no equi key. The probe side carries an interval [lo, hi]; a point
  * probe is the degenerate lo == hi case, interval–interval OVERLAP
  * the general one (match ⇔ start ≤ hi AND end ≥ lo).
  *
  * The library's default formulation
  * ([[graft.operators.RangeJoin.byBucket]]) decomposes the range
  * predicate into a bucketized equi-join — the right shape when BOTH
  * sides are fact-sized. This exec is the dedicated operator for the
  * common asymmetric case (bounded interval set — sessions, campaign
  * windows, maintenance windows — against a fact-scale point stream):
  * the intervals broadcast ONCE as an augmented sorted array (sorted
  * by start, with a running prefix-max over end), and each point probes
  * it with one binary search + a bounded leftward walk that stops as
  * soon as the prefix-max-end drops below the point — no bucket-width
  * tuning knob, no per-interval explode, no shuffle of the point side
  * at all.
  *
  * Per-point cost: O(log m + candidates scanned); the walk visits only
  * prefixes that can still contain the point, so for short, roughly
  * uniform intervals it is O(log m + matches). A single pathological
  * full-span interval degrades the walk to O(overlapping starts) —
  * the documented trade-off vs an interval tree, acceptable because m
  * is broadcast-bounded anyway.
  *
  * Point, start and end must all be LONG (cast upstream — micros,
  * cents, whatever the domain integer is). Null points and null-bounded
  * intervals never match (SQL comparison semantics).
  */
case class RangeJoinNode(
    lo: Expression,
    hi: Expression,
    start: Expression,
    end: Expression,
    outer: Boolean,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  // inner: only matching pairs; left outer: unmatched probes emit one
  // row with null interval columns
  override def output: Seq[Attribute] =
    if (outer) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinNode =
    copy(left = newLeft, right = newRight)
}

case class RangeJoinExec(
    lo: Expression,
    hi: Expression,
    start: Expression,
    end: Expression,
    outer: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    if (outer) left.output ++ right.output.map(_.withNullability(true))
    else left.output ++ right.output

  // points stream wherever they already are; intervals broadcast whole
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val bcRows = right.executeBroadcast[Array[InternalRow]]()
    val (plo, phi, st, en, isOuter) = (lo, hi, start, end, outer)
    val (lOut, rOut, allOut) = (left.output, right.output, output)
    left.execute().mapPartitions { lIt =>
      // build the augmented index once per task from the broadcast set
      val ptProj = UnsafeProjection.create(Seq(plo, phi), lOut)
      val boundProj = UnsafeProjection.create(Seq(st, en), rOut)
      val rows = bcRows.value.filter { r =>
        val b = boundProj(r); !b.isNullAt(0) && !b.isNullAt(1)
      }
      val order = rows.indices.sortBy(i => boundProj(rows(i)).getLong(0))
      val m = order.length
      val starts = new Array[Long](m)
      val ends = new Array[Long](m)
      val sorted = new Array[InternalRow](m)
      val maxEnd = new Array[Long](m) // prefix max of ends
      var i = 0
      while (i < m) {
        val b = boundProj(rows(order(i)))
        starts(i) = b.getLong(0); ends(i) = b.getLong(1)
        sorted(i) = rows(order(i))
        maxEnd(i) = if (i == 0) ends(0) else math.max(maxEnd(i - 1), ends(i))
        i += 1
      }
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(allOut, allOut)
      val nullRight = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(rOut.size)
      def unmatched(l: InternalRow): Iterator[InternalRow] =
        if (isOuter) Iterator.single(outProj(joined(l, nullRight)))
        else Iterator.empty
      lIt.flatMap { l =>
        val pRow = ptProj(l)
        if (pRow.isNullAt(0) || pRow.isNullAt(1) || m == 0) unmatched(l)
        else {
          // probe interval [ps, pe]; a point probe has ps == pe.
          // match condition: start <= pe AND end >= ps
          val ps = pRow.getLong(0)
          val pe = pRow.getLong(1)
          // rightmost interval with start <= pe
          var bLo = 0; var bHi = m - 1; var last = -1
          while (bLo <= bHi) {
            val mid = (bLo + bHi) >>> 1
            if (starts(mid) <= pe) { last = mid; bLo = mid + 1 }
            else bHi = mid - 1
          }
          val matches = new Iterator[InternalRow] {
            private var j = last
            private def seek(): Unit = {
              while (j >= 0 && maxEnd(j) >= ps && ends(j) < ps) j -= 1
              if (j >= 0 && maxEnd(j) < ps) j = -1 // nothing left can match
            }
            seek()
            override def hasNext: Boolean = j >= 0
            override def next(): InternalRow = {
              val out = outProj(joined(l, sorted(j)))
              j -= 1; seek()
              out
            }
          }
          if (matches.hasNext) matches else unmatched(l)
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

object RangeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinNode(lo, hi, s, e, o, l, r) =>
      RangeJoinExec(lo, hi, s, e, o, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** DataFrame-level API for the physical broadcast range join.
  *
  * [[join]]: point containment — all point columns + all interval
  * columns for every (point ∈ [start, end]) pair; same contract as
  * [[graft.operators.RangeJoin.byBucket]] minus the `bucketWidth`
  * knob. [[overlapJoin]]: interval–interval overlap — every pair with
  * `l.start <= r.end AND l.end >= r.start` (the point probe is the
  * degenerate lo == hi case of the same exec). */
object RangePhysical {
  def join(points: DataFrame, intervals: DataFrame,
           ptCol: String, startCol: String, endCol: String,
           outer: Boolean = false): DataFrame =
    build(points, intervals, ptCol, ptCol, startCol, endCol, outer)

  def overlapJoin(left: DataFrame, intervals: DataFrame,
                  leftStartCol: String, leftEndCol: String,
                  startCol: String, endCol: String,
                  outer: Boolean = false): DataFrame =
    build(left, intervals, leftStartCol, leftEndCol, startCol, endCol, outer)

  private def build(left: DataFrame, intervals: DataFrame,
                    loCol: String, hiCol: String,
                    startCol: String, endCol: String,
                    outer: Boolean): DataFrame = {
    val spark = left.sparkSession
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(RangeStrategy)) {
      exp.extraStrategies = exp.extraStrategies :+ RangeStrategy
    }
    val lPlan = Bridge.analyzedPlan(left)
    val rPlan = Bridge.analyzedPlan(intervals)
    def attr(p: LogicalPlan, name: String) = p.output
      .find(_.name == name)
      .getOrElse(throw new IllegalArgumentException(
        s"range join: no column '$name' in ${p.output.map(_.name)}"))
    val (lo, hi) = (attr(lPlan, loCol), attr(lPlan, hiCol))
    val (st, en) = (attr(rPlan, startCol), attr(rPlan, endCol))
    // the exec probes with primitive long compares — reject anything
    // else here rather than corrupt comparisons silently
    Seq(lo, hi, st, en).foreach { a =>
      require(a.dataType == LongType,
        s"range join: column '${a.name}' must be LONG, got ${a.dataType}")
    }
    Bridge.ofRows(spark, RangeJoinNode(lo, hi, st, en, outer, lPlan, rPlan))
  }
}
