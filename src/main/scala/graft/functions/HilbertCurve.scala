package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Hilbert space-filling curve over a 65536×65536 grid — the
  * locality upgrade over the Morton family in
  * [[graft.operators.Pack.mortonZ]]: consecutive Hilbert indices are
  * always GRID NEIGHBORS (no Morton "seams" where the curve jumps
  * across the space), so an index-range file covers a tighter region
  * of both dimensions — better min/max pruning for the same file
  * count. The classic xy2d bit loop (16 rounds of quadrant selection
  * + rotate/reflect) carries state across rounds, so unlike Morton it
  * is not a pure mask-shift composition: it runs as a static kernel
  * shared by eval and codegen (the two paths cannot diverge), and the
  * ORACLE reproduces it with 16 unrolled MATERIALIZED SQL rounds —
  * pure integer CASE/&/xor arithmetic, engine-exact. */
object HilbertCurve {

  val Side = 65536L // 2^16 grid, indices in [0, 2^32)

  /** xy2d: static kernel (Java-static forwarder for codegen). */
  def xy2d(xIn: Long, yIn: Long): Long = {
    var x = xIn & (Side - 1)
    var y = yIn & (Side - 1)
    var d = 0L
    var s = Side / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = Side - 1 - x; y = Side - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** d2xy inverse — spec support (round-trip + adjacency proofs). */
  def d2xy(dIn: Long): (Long, Long) = {
    var x = 0L; var y = 0L
    var t = dIn
    var s = 1L
    while (s < Side) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tt = x; x = y; y = tt
      }
      x += s * rx
      y += s * ry
      t /= 4
      s *= 2
    }
    (x, y)
  }

  /** hilbert_d(x, y): 16-bit-masked coords → curve index. */
  case class HilbertIndex(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(LongType, LongType)
    override def dataType: DataType = LongType
    override def prettyName: String = "hilbert_d"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      xy2d(a.asInstanceOf[Long], b.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.HilbertCurve.xy2d($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def hilbertD(x: Column, y: Column): Column =
    Bridge.column(HilbertIndex(Bridge.expression(x), Bridge.expression(y)))

  /** d2xy packed as x·65536 + y (both coords are 16-bit). */
  def d2xyPacked(d: Long): Long = {
    val (x, y) = d2xy(d)
    x * Side + y
  }

  /** hilbert_xy(d): curve index → packed (x·65536 + y) coordinates —
    * the DECODE side ([[HilbertIndex]] is the encode); range → box
    * pruning reads a file's curve range back into plane coordinates
    * with this. Same static-kernel discipline. */
  case class HilbertDecode(child: Expression)
      extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
      with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def dataType: DataType = LongType
    override def prettyName: String = "hilbert_xy"

    override protected def nullSafeEval(d: Any): Any =
      d2xyPacked(d.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, d =>
        s"graft.functions.HilbertCurve.d2xyPacked($d)")

    override protected def withNewChildInternal(
        newChild: Expression): Expression = copy(child = newChild)
  }

  def hilbertXY(d: Column): Column =
    Bridge.column(HilbertDecode(Bridge.expression(d)))

  /** The d2xy loop as engine-neutral unrolled SQL rounds (inverse of
    * [[sqlRounds]]): `i0` must exist with columns (…keys, x, y, t)
    * where t is the curve index; the caller reads `i16`, whose (x, y)
    * are the decoded coordinates. Low bits first: round i handles
    * s = 2^(i−1); rx = (t div 2) mod 2, ry = (t mod 2) xor rx. */
  def sqlDecodeRounds(keyCols: String): String =
    (1 to 16).map { i =>
      val s = 1L << (i - 1)
      s"""i$i AS MATERIALIZED (SELECT $keyCols,
         |  CASE WHEN xor(p.t % 2, (p.t // 2) % 2) = 1 THEN p.x
         |       WHEN (p.t // 2) % 2 = 1 THEN ${s - 1} - p.y
         |       ELSE p.y END + $s * ((p.t // 2) % 2) AS x,
         |  CASE WHEN xor(p.t % 2, (p.t // 2) % 2) = 1 THEN p.y + $s
         |       WHEN (p.t // 2) % 2 = 1 THEN ${s - 1} - p.x
         |       ELSE p.x END AS y,
         |  p.t // 4 AS t
         |  FROM i${i - 1} p)""".stripMargin
    }.mkString(",\n")

  /** The xy2d loop as engine-neutral unrolled SQL rounds. Returns the
    * WITH-clause body: `h0` must exist with columns (…keys, x, y, d);
    * the caller reads the final round `h16`. Each round is
    * MATERIALIZED — a plain CTE chain would inline every CASE's
    * multiple x/y references into a 3^16-term expression. */
  def sqlRounds(keyCols: String): String =
    (1 to 16).map { i =>
      val s = 1L << (16 - i)
      val ss = s * s
      s"""h$i AS MATERIALIZED (SELECT $keyCols,
         |  CASE WHEN (p.y & $s) > 0 THEN p.x
         |       WHEN (p.x & $s) > 0 THEN ${Side - 1} - p.y
         |       ELSE p.y END AS x,
         |  CASE WHEN (p.y & $s) > 0 THEN p.y
         |       WHEN (p.x & $s) > 0 THEN ${Side - 1} - p.x
         |       ELSE p.x END AS y,
         |  p.d + CAST($ss AS BIGINT) *
         |    xor(3 * (CASE WHEN (p.x & $s) > 0 THEN 1 ELSE 0 END),
         |        CASE WHEN (p.y & $s) > 0 THEN 1 ELSE 0 END)
         |    AS d
         |  FROM h${i - 1} p)""".stripMargin
    }.mkString(",\n")
}
