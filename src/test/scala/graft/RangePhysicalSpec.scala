package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.plans.RangePhysical

/** The broadcast range-join exec vs an inner-join reference, on real
  * table data and on adversarial interval structures (nesting,
  * duplicates, containment chains, full-span stragglers, boundary
  * equality, empty sides). */
class RangePhysicalSpec extends AnyFunSuite {
  import TestSpark._

  private def reference(points: org.apache.spark.sql.DataFrame,
                        ivs: org.apache.spark.sql.DataFrame) =
    points.join(ivs,
      points("p") >= ivs("lo") && points("p") <= ivs("hi"))

  private def pairs(df: org.apache.spark.sql.DataFrame) = {
    import spark.implicits._
    df.select($"pid", $"iid").as[(Long, Long)].collect().toSet
  }

  test("exec matches the range predicate on adversarial intervals") {
    import spark.implicits._
    // nested, duplicated, touching, disjoint, and one full-span interval
    val ivs = Seq(
      (1L, 0L, 100L),   // full-span straggler
      (2L, 10L, 20L), (3L, 10L, 20L),  // exact duplicates
      (4L, 12L, 14L),   // nested inside 2/3
      (5L, 20L, 30L),   // touches 2/3 at 20
      (6L, 50L, 50L),   // degenerate single-point
      (7L, 60L, 55L)    // inverted: matches nothing
    ).toDF("iid", "lo", "hi")
    val pts = (0L to 101L).map(p => (p, p)).toDF("pid", "p")
    val got = pairs(RangePhysical.join(pts, ivs, "p", "lo", "hi"))
    val want = pairs(reference(pts, ivs))
    assert(got === want)
    // spot-check the semantics the structures encode
    assert(got.contains((50L, 6L)) && got.contains((20L, 5L)))
    assert(!got.exists(_._2 == 7L))
  }

  test("overlap join matches the predicate on adversarial interval pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    // random short intervals + touching + nested + inverted probes
    val ivs = ((1L to 60L).map { i =>
      val lo = rnd.nextInt(200).toLong; (i, lo, lo + rnd.nextInt(12))
    } :+ (98L, 0L, 250L)).toDF("iid", "lo", "hi")
    val probes = ((1L to 60L).map { i =>
      val lo = rnd.nextInt(200).toLong
      (100L + i, lo, lo + rnd.nextInt(12))
    } :+ (199L, 50L, 40L)).toDF("pid", "ps", "pe") // inverted probe
    val got = RangePhysical.overlapJoin(probes, ivs, "ps", "pe", "lo", "hi")
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    val want = probes.join(ivs,
        probes("ps") <= ivs("hi") && probes("pe") >= ivs("lo"))
      .select($"pid", $"iid").as[(Long, Long)].collect().toSet
    assert(got === want)
    // the exec implements the raw SQL predicate, so even the inverted
    // probe [50, 40] matches intervals covering [40, 50] — exactly as
    // the reference join does
    assert(got.contains((199L, 98L)))
    assert(got.count(_._2 == 98L) == 61, "full-span interval hits every probe")
  }

  test("left outer mode matches the reference left join, nulls for misses") {
    import spark.implicits._
    val ivs = Seq((1L, 10L, 20L), (2L, 15L, 30L)).toDF("iid", "lo", "hi")
    val pts = Seq((1L, 5L), (2L, 15L), (3L, 25L), (4L, 99L))
      .toDF("pid", "p")
    val got = RangePhysical.join(pts, ivs, "p", "lo", "hi", outer = true)
      .select($"pid", $"iid").as[(Long, Option[Long])].collect().toSet
    val want = pts.join(ivs, pts("p") >= ivs("lo") && pts("p") <= ivs("hi"),
        "left")
      .select($"pid", $"iid").as[(Long, Option[Long])].collect().toSet
    assert(got === want)
    assert(got.contains((1L, None)) && got.contains((4L, None)))
    assert(got.contains((2L, Some(1L))) && got.contains((2L, Some(2L))))
    // outer against an EMPTY interval side: every probe emits one null row
    val none = Seq.empty[(Long, Long, Long)].toDF("iid", "lo", "hi")
    assert(RangePhysical.join(pts, none, "p", "lo", "hi", outer = true)
      .count() === 4)
  }

  test("full outer mode matches the reference full join on both sides") {
    import spark.implicits._
    // interval 3 is touched by no point; points 1 and 4 hit no interval;
    // interval 9 is null-bounded (never matches, still emitted unmatched)
    val ivs = Seq((1L, Some(10L), Some(20L)), (2L, Some(15L), Some(30L)),
      (3L, Some(50L), Some(60L)), (9L, None, Some(20L)))
      .toDF("iid", "lo", "hi")
    val pts = Seq((1L, 5L), (2L, 15L), (3L, 25L), (4L, 99L))
      .toDF("pid", "p")
    val got = RangePhysical.fullJoin(pts, ivs, "p", "lo", "hi")
      .select($"pid", $"iid").as[(Option[Long], Option[Long])]
      .collect().toSet
    val want = pts.join(ivs, pts("p") >= ivs("lo") && pts("p") <= ivs("hi"),
        "full")
      .select($"pid", $"iid").as[(Option[Long], Option[Long])]
      .collect().toSet
    assert(got === want)
    assert(got.contains((None, Some(3L))) && got.contains((None, Some(9L))))
    assert(got.contains((Some(1L), None)) && got.contains((Some(4L), None)))
    // fully empty sides: all-unmatched in both directions
    val none = Seq.empty[(Long, Long, Long)].toDF("iid", "lo", "hi")
    assert(RangePhysical.fullJoin(pts, none, "p", "lo", "hi").count() === 4)
    val noPts = Seq.empty[(Long, Long)].toDF("pid", "p")
    assert(RangePhysical.fullJoin(noPts, ivs, "p", "lo", "hi").count() === 4)
  }

  test("null points and null-bounded intervals never match") {
    import spark.implicits._
    val ivs = Seq((1L, Some(10L), Some(20L)), (2L, None, Some(20L)),
      (3L, Some(10L), None)).toDF("iid", "lo", "hi")
    val pts = Seq((1L, Some(15L)), (2L, None)).toDF("pid", "p")
    val got = pairs(RangePhysical.join(pts, ivs, "p", "lo", "hi"))
    assert(got === Set((1L, 1L)))
  }

  test("empty interval side yields empty output, not a crash") {
    import spark.implicits._
    val ivs = Seq.empty[(Long, Long, Long)].toDF("iid", "lo", "hi")
    val pts = Seq((1L, 5L)).toDF("pid", "p")
    assert(RangePhysical.join(pts, ivs, "p", "lo", "hi").count() === 0)
  }

  test("non-LONG bound columns are rejected, not silently compared") {
    import spark.implicits._
    val ivs = Seq((1, 10, 20)).toDF("iid", "lo", "hi") // INT bounds
    val pts = Seq((1L, 15L)).toDF("pid", "p")
    val e = intercept[IllegalArgumentException] {
      RangePhysical.join(pts, ivs, "p", "lo", "hi")
    }
    assert(e.getMessage.contains("must be LONG"))
  }

  test("the plan is the dedicated exec over a broadcast, no bucket explode") {
    import spark.implicits._
    val ivs = Seq((1L, 10L, 20L)).toDF("iid", "lo", "hi")
    val pts = Seq((1L, 15L)).toDF("pid", "p")
    val plan = RangePhysical.join(pts, ivs, "p", "lo", "hi")
      .queryExecution.executedPlan.toString
    assert(plan.contains("RangeJoin"))
    assert(plan.contains("BroadcastExchange"))
    assert(!plan.contains("Generate")) // no interval explode anywhere
  }

  test("physical and bucketized formulations agree on real event data") {
    import spark.implicits._
    val a = graft.operators.RangeJoin.qRangeJoin(spark, sf)
      .orderBy($"w_user").collect().toSeq
    val b = graft.operators.RangeJoin.qRangePhysical(spark, sf)
      .orderBy($"w_user").collect().toSeq
    assert(a === b)
  }
}
