package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{BroadcastDistribution, Distribution, IdentityBroadcastMode, Partitioning, UnknownPartitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.LongType

/** Join mode of [[RangeJoinExec]]. Inner: matching pairs only.
  * LeftOuter: unmatched probes additionally emit one row with null
  * interval columns (the anti join is this + an IS NULL filter).
  * FullOuter: LeftOuter plus one null-probe row per interval no probe
  * touched — empty windows stay visible. */
sealed abstract class RangeJoinMode(
    val probeNullable: Boolean, val intervalNullable: Boolean)
object RangeJoinMode {
  case object Inner extends RangeJoinMode(false, false)
  case object LeftOuter extends RangeJoinMode(false, true)
  case object FullOuter extends RangeJoinMode(true, true)
}

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
  * FullOuter needs the set of intervals SOME probe matched — global
  * information no single task has — so it runs one extra pre-pass job
  * over the probe side that folds per-partition matched bitsets
  * (bitset size = broadcast interval count, driver-trivial; the same
  * eager-pre-job shape Spark's BroadcastNestedLoopJoinExec uses for
  * build-side outer joins), then unions the unmatched intervals as one
  * extra null-extended partition.
  *
  * Point, start and end must all be LONG (cast upstream — micros,
  * cents, whatever the domain integer is). Null points and null-bounded
  * intervals never match (SQL comparison semantics); in FullOuter a
  * null-bounded interval still emits its unmatched row, like any SQL
  * full join.
  */
case class RangeJoinNode(
    lo: Expression,
    hi: Expression,
    start: Expression,
    end: Expression,
    mode: RangeJoinMode,
    left: LogicalPlan,
    right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = {
    val l = if (mode.probeNullable) left.output.map(_.withNullability(true))
            else left.output
    val r = if (mode.intervalNullable)
              right.output.map(_.withNullability(true))
            else right.output
    l ++ r
  }
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinNode =
    copy(left = newLeft, right = newRight)
}

case class RangeJoinExec(
    lo: Expression,
    hi: Expression,
    start: Expression,
    end: Expression,
    mode: RangeJoinMode,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = {
    val l = if (mode.probeNullable) left.output.map(_.withNullability(true))
            else left.output
    val r = if (mode.intervalNullable)
              right.output.map(_.withNullability(true))
            else right.output
    l ++ r
  }

  // points stream wherever they already are; intervals broadcast whole
  override def requiredChildDistribution: Seq[Distribution] =
    UnspecifiedDistribution ::
      BroadcastDistribution(IdentityBroadcastMode) :: Nil

  override def outputPartitioning: Partitioning = mode match {
    // the unioned unmatched-interval partition breaks any inherited
    // partitioning guarantee
    case RangeJoinMode.FullOuter => UnknownPartitioning(0)
    case _ => left.outputPartitioning
  }

  /** Augmented sorted index over the broadcast intervals: position i
    * holds the i-th smallest start, its end, the prefix max of ends,
    * and the ORIGINAL broadcast-array index (so matched-bitset bits
    * are stable across tasks regardless of sort ties). Null-bounded
    * intervals are excluded (they can never match). */
  private class IntervalIndex(all: Array[InternalRow],
                              boundProj: UnsafeProjection) {
    private val keyed = all.indices.flatMap { i =>
      val b = boundProj(all(i))
      if (b.isNullAt(0) || b.isNullAt(1)) None
      else Some((b.getLong(0), b.getLong(1), i))
    }.sortBy(t => (t._1, t._3)).toArray
    val m: Int = keyed.length
    val starts: Array[Long] = keyed.map(_._1)
    val ends: Array[Long] = keyed.map(_._2)
    val origIdx: Array[Int] = keyed.map(_._3)
    val rows: Array[InternalRow] = keyed.map(t => all(t._3))
    val maxEnd: Array[Long] = {
      val a = new Array[Long](m)
      var i = 0
      while (i < m) {
        a(i) = if (i == 0) ends(0) else math.max(a(i - 1), ends(i)); i += 1
      }
      a
    }
    /** Sorted positions of intervals overlapping [ps, pe]: binary
      * search for the rightmost start ≤ pe, then walk left while the
      * prefix-max-end can still reach ps. */
    def probe(ps: Long, pe: Long): Iterator[Int] = new Iterator[Int] {
      private var j = {
        var bLo = 0; var bHi = m - 1; var last = -1
        while (bLo <= bHi) {
          val mid = (bLo + bHi) >>> 1
          if (starts(mid) <= pe) { last = mid; bLo = mid + 1 }
          else bHi = mid - 1
        }
        last
      }
      private def seek(): Unit = {
        while (j >= 0 && maxEnd(j) >= ps && ends(j) < ps) j -= 1
        if (j >= 0 && maxEnd(j) < ps) j = -1 // nothing left can match
      }
      seek()
      override def hasNext: Boolean = j >= 0
      override def next(): Int = { val out = j; j -= 1; seek(); out }
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val bcRows = right.executeBroadcast[Array[InternalRow]]()
    val (plo, phi, st, en, jm) = (lo, hi, start, end, mode)
    val (lOut, rOut, allOut) = (left.output, right.output, output)

    // FullOuter pre-pass: which ORIGINAL interval indices did any
    // probe match, folded across partitions.
    val matchedIntervals: java.util.BitSet =
      if (jm != RangeJoinMode.FullOuter) null
      else left.execute().mapPartitions { lIt =>
        val ptProj = UnsafeProjection.create(Seq(plo, phi), lOut)
        val boundProj = UnsafeProjection.create(Seq(st, en), rOut)
        val idx = new IntervalIndex(bcRows.value, boundProj)
        val bits = new java.util.BitSet(bcRows.value.length)
        lIt.foreach { l =>
          val pRow = ptProj(l)
          if (!pRow.isNullAt(0) && !pRow.isNullAt(1) && idx.m > 0)
            idx.probe(pRow.getLong(0), pRow.getLong(1))
              .foreach(p => bits.set(idx.origIdx(p)))
        }
        Iterator.single(bits)
      }.fold(new java.util.BitSet) { (a, b) => a.or(b); a }

    val streamed = left.execute().mapPartitions { lIt =>
      val ptProj = UnsafeProjection.create(Seq(plo, phi), lOut)
      val boundProj = UnsafeProjection.create(Seq(st, en), rOut)
      val idx = new IntervalIndex(bcRows.value, boundProj)
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(allOut, allOut)
      val nullRight = new GenericInternalRow(rOut.size)
      def unmatched(l: InternalRow): Iterator[InternalRow] =
        if (jm != RangeJoinMode.Inner)
          Iterator.single(outProj(joined(l, nullRight)))
        else Iterator.empty
      lIt.flatMap { l =>
        val pRow = ptProj(l)
        if (pRow.isNullAt(0) || pRow.isNullAt(1) || idx.m == 0) unmatched(l)
        else {
          val matches = idx.probe(pRow.getLong(0), pRow.getLong(1))
            .map(p => outProj(joined(l, idx.rows(p))))
          if (matches.hasNext) matches else unmatched(l)
        }
      }
    }

    if (jm != RangeJoinMode.FullOuter) streamed
    else {
      // null-extended rows for intervals no probe touched, emitted from
      // the driver-held broadcast value as one extra partition
      val all = bcRows.value
      val joined = new JoinedRow
      val outProj = UnsafeProjection.create(allOut, allOut)
      val nullLeft = new GenericInternalRow(lOut.size)
      val extra = all.indices.filterNot(matchedIntervals.get).map { i =>
        outProj(joined(nullLeft, all(i))).copy(): InternalRow
      }
      streamed.union(sparkContext.parallelize(extra, 1))
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): RangeJoinExec =
    copy(left = newLeft, right = newRight)
}

object RangeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinNode(lo, hi, s, e, m, l, r) =>
      RangeJoinExec(lo, hi, s, e, m, planLater(l), planLater(r)) :: Nil
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
  * degenerate lo == hi case of the same exec). [[fullJoin]]: FULL
  * OUTER point containment — unmatched points AND untouched intervals
  * both surface as null-extended rows.
  *
  * Requires a session built with [[graft.GraftExtensions]] (which
  * injects [[RangeStrategy]]); there is deliberately no fallback
  * mutation of `experimental.extraStrategies` here — that mutation is
  * session-global and not thread-safe. */
object RangePhysical {
  import RangeJoinMode._

  def join(points: DataFrame, intervals: DataFrame,
           ptCol: String, startCol: String, endCol: String,
           outer: Boolean = false): DataFrame =
    build(points, intervals, ptCol, ptCol, startCol, endCol,
      if (outer) LeftOuter else Inner)

  def fullJoin(points: DataFrame, intervals: DataFrame,
               ptCol: String, startCol: String, endCol: String): DataFrame =
    build(points, intervals, ptCol, ptCol, startCol, endCol, FullOuter)

  def overlapJoin(left: DataFrame, intervals: DataFrame,
                  leftStartCol: String, leftEndCol: String,
                  startCol: String, endCol: String,
                  outer: Boolean = false): DataFrame =
    build(left, intervals, leftStartCol, leftEndCol, startCol, endCol,
      if (outer) LeftOuter else Inner)

  private def build(left: DataFrame, intervals: DataFrame,
                    loCol: String, hiCol: String,
                    startCol: String, endCol: String,
                    mode: RangeJoinMode): DataFrame = {
    val spark = left.sparkSession
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
    Bridge.ofRows(spark, RangeJoinNode(lo, hi, st, en, mode, lPlan, rPlan))
  }
}
