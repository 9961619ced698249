package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsofJoin, Events}
import graft.plans.AsofPhysical

class AsofPhysicalSpec extends AnyFunSuite {
  import TestSpark._

  private def inputs() = {
    import spark.implicits._
    val ev = Events.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"ts_us")
    val signups = ev.filter($"event_type" === "signup")
      .groupBy($"user_id", $"ts_us")
      .agg(max($"event_id").as("signup_event"))
    (ev, signups)
  }

  test("physical as-of join matches the union+running-max composition exactly") {
    import spark.implicits._
    val (ev, signups) = inputs()
    val composed = AsofJoin.join(ev, signups, "user_id", "ts_us", "ts_us", "signup_event")
    val physical = AsofPhysical.join(ev, signups, "user_id", "ts_us", "ts_us", "signup_event")
    assert(physical.count() === composed.count())
    val key = Seq("event_id")
    val joinedCmp = physical.as("p").join(composed.as("c"), key)
      .filter(
        ($"p.asof_time" =!= $"c.asof_time") ||
        ($"p.asof_time".isNull !== $"c.asof_time".isNull) ||
        ($"p.asof_payload" =!= $"c.asof_payload") ||
        ($"p.asof_payload".isNull !== $"c.asof_payload".isNull))
    assert(joinedCmp.count() === 0)
  }

  test("mismatched key or time types are rejected, not silently compared") {
    import spark.implicits._
    val (ev, signups) = inputs()
    val intTime = signups.withColumn("ts_i", ($"ts_us" / 1000000).cast("int"))
    val e1 = intercept[IllegalArgumentException] {
      AsofPhysical.join(ev, intTime, "user_id", "ts_us", "ts_i", "signup_event")
    }
    assert(e1.getMessage.contains("time types differ"))
    val intKey = signups.withColumn("user_i", $"user_id".cast("int"))
    val e2 = intercept[IllegalArgumentException] {
      AsofPhysical.join(ev, intKey, "user_i", "ts_us", "ts_us", "signup_event")
    }
    assert(e2.getMessage.contains("no column 'user_i' in"))
    // same-named key with a different type on the right
    val narrowed = signups.withColumn("user_id", $"user_id".cast("int"))
    val e3 = intercept[IllegalArgumentException] {
      AsofPhysical.join(ev, narrowed, "user_id", "ts_us", "ts_us", "signup_event")
    }
    assert(e3.getMessage.contains("key types differ"))
  }

  test("the plan is the dedicated exec, not a window") {
    val (ev, signups) = inputs()
    val physical = AsofPhysical.join(ev, signups, "user_id", "ts_us", "ts_us", "signup_event")
    physical.count()
    val plan = physical.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(2000))
    assert(!plan.contains("Window"), plan.take(2000))
  }

  test("left rows before any right row get nulls") {
    import spark.implicits._
    val left = Seq((1L, 5L), (1L, 15L), (2L, 7L)).toDF("k", "t")
    val right = Seq((1L, 10L, "a"), (3L, 1L, "z")).toDF("k", "rt", "p")
    val got = AsofPhysical.join(left, right, "k", "t", "rt", "p")
      .select($"k", $"t", $"asof_time", $"asof_payload")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Option(r.get(2)), Option(r.get(3)))).toSet
    assert(got === Set(
      (1L, 5L, None, None),            // before the first signup
      (1L, 15L, Some(10L), Some("a")), // latest at-or-before
      (2L, 7L, None, None)))           // key with no right rows at all
  }
}
