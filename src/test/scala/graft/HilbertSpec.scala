package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HilbertCurve

/** Curve-theoretic properties of the Hilbert kernel — the guarantees
  * the layout census rides on. Engine equality is proven separately by
  * the q_hilbert oracle's 16 unrolled SQL rounds. */
class HilbertSpec extends AnyFunSuite {
  import TestSpark._

  private val rnd = new scala.util.Random(42)

  test("xy2d/d2xy round-trip is the identity (bijection witness)") {
    (1 to 20000).foreach { _ =>
      val x = rnd.nextInt(65536).toLong
      val y = rnd.nextInt(65536).toLong
      assert(HilbertCurve.d2xy(HilbertCurve.xy2d(x, y)) === ((x, y)))
    }
    // corners
    assert(HilbertCurve.xy2d(0, 0) === 0L)
    for ((x, y) <- Seq((0L, 65535L), (65535L, 0L), (65535L, 65535L)))
      assert(HilbertCurve.d2xy(HilbertCurve.xy2d(x, y)) === ((x, y)))
  }

  test("consecutive indices are grid neighbors (the locality property)") {
    // the property Morton does NOT have: |Δx|+|Δy| = 1 for every step
    (1 to 20000).foreach { _ =>
      val d = (rnd.nextLong() & ((1L << 32) - 1)) min ((1L << 32) - 2)
      val (x1, y1) = HilbertCurve.d2xy(d)
      val (x2, y2) = HilbertCurve.d2xy(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"step $d -> ${d + 1} jumped")
    }
  }

  test("expression through a Spark plan equals the kernel (codegen path)") {
    import spark.implicits._
    val pts = (1 to 500).map(_ =>
      (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = pts.toDF("x", "y")
      .select(HilbertCurve.hilbertD($"x", $"y").as("d"))
      .as[Long].collect().toSeq
    assert(got === pts.map { case (x, y) => HilbertCurve.xy2d(x, y) })
  }
}
