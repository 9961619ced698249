package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Property gates for the sketch family (their VALUES are oracle-gated
  * bit-exactly; these tests pin the probabilistic guarantees). */
class SketchSpec extends AnyFunSuite {
  import TestSpark._

  test("count-min estimates are one-sided: estimate >= truth, always") {
    import spark.implicits._
    val rows = graft.operators.Events.qCountmin(spark, sf)
      .select($"n_events", $"cms_estimate").as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (truth, est) =>
      assert(est >= truth, s"CMS under-estimated: $est < $truth")
    }
  }

  test("HLL estimate lands within ~2 sigma of the true distinct count") {
    import spark.implicits._
    val regs = graft.operators.Events.qHllRegisters(spark, sf)
      .as[(Long, Long)].collect().toMap
    val truth = graft.operators.Events.events(spark, sf)
      .agg(countDistinct($"user_id")).head().getLong(0).toDouble
    val est = graft.functions.Hll.estimate(regs)
    // m=64 → standard error 1.04/sqrt(64) = 13%; gate at 2 sigma
    assert(math.abs(est - truth) / truth <= 0.26,
      s"HLL estimate $est vs true $truth")
  }

  test("HLL registers merge by element-wise max (union = sketch of union)") {
    import spark.implicits._
    // split the stream in two, sketch each half, merge registers by
    // max: must equal the sketch of the whole stream
    val ev = graft.operators.Events.events(spark, sf)
    def regsOf(df: org.apache.spark.sql.DataFrame): Map[Long, Long] = {
      import graft.functions.TextFunctions.md5Prefix60
      df.select(md5Prefix60($"user_id".cast("string")).as("h"))
        .select(pmod($"h", lit(64L)).as("bucket"),
          expr("h div 64").as("rem"))
        .select($"bucket", when($"rem" === 0, lit(55L))
          .otherwise(lit(55L) - length(bin($"rem")).cast("long")).as("rho"))
        .groupBy($"bucket").agg(max($"rho").as("max_rho"))
        .as[(Long, Long)].collect().toMap
    }
    val a = regsOf(ev.filter($"event_id" % 2 === 0))
    val b = regsOf(ev.filter($"event_id" % 2 === 1))
    val merged = (a.keySet ++ b.keySet).map(k =>
      k -> math.max(a.getOrElse(k, 0L), b.getOrElse(k, 0L))).toMap
    val whole = regsOf(ev)
    assert(merged === whole)
  }
}
