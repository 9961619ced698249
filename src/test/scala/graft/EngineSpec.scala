package graft

import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  import TestSpark._

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; rows-only queries are the known set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert(q -- o === Set("q_approx_stats", "q_chunk_dedup"))
  }

  test("approximate aggregates stay within tolerance of exact values") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val exact = Tables.orders(spark, sf)
      .groupBy($"o_orderpriority")
      .agg(countDistinct($"o_custkey").as("exact_cust"))
    val rows = graft.operators.Relational.qApproxStats(spark, sf)
      .join(exact, "o_orderpriority")
      .select($"approx_cust", $"exact_cust").collect()
    rows.foreach { r =>
      val (a, e) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
      assert(math.abs(a - e) / e < 0.15, s"approx $a vs exact $e")
    }
  }

  test("every declared query executes and yields a schema at sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.schema.fields.nonEmpty, name)
      assert(df.limit(1).count() >= 0, name)
    }
  }
}
