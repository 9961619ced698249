package graft

import org.scalatest.funsuite.AnyFunSuite

class EngineSpec extends AnyFunSuite {
  import TestSpark._

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("SURVEY.md §2 rows and SparkEntry.queries match 1:1") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val sect2 = survey.split("\n## ").find(_.startsWith("§2"))
      .getOrElse(fail("SURVEY.md has no §2 section"))
    // query names appear in §2 table rows (lines starting with '|')
    val names = sect2.linesIterator.filter(_.trim.startsWith("|"))
      .flatMap("""\bq[0-9]{0,2}_[a-z0-9_]+""".r.findAllIn(_)).toSet
    val queries = SparkEntry.queries.keySet
    assert(names -- queries === Set.empty,
      "SURVEY §2 names a query that doesn't exist")
    assert(queries -- names === Set.empty,
      "SparkEntry has a query SURVEY §2 doesn't list")
  }

  test("module query maps merge without key collisions") {
    import graft.multimodal.Multimodal
    import graft.operators._
    val modules = Seq(Relational.queries, Events.queries, Dedup.queries,
      TextAnalysis.queries, Similarity.queries, Multimodal.queries,
      AsofJoin.queries, RangeJoin.queries, Sampling.queries, Curate.queries,
      Pack.queries)
    // ++ silently overwrites duplicates; the merged size must equal the sum
    assert(modules.map(_.size).sum === SparkEntry.queries.size,
      "two modules declare the same query name")
  }

  test("every oracle key has a query; rows-only queries are the known set") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
    assert(q -- o === Set("q_approx_stats", "q_chunk_dedup", "q_ann_ivf_trained"))
  }

  test("qInterpolate precondition: event values are non-negative") {
    // the interpolation blend's div==floor bit-exactness argument
    // (Events.qInterpolate scaladoc) requires value >= 0; pin the
    // data invariant here so a generator change fails loudly instead
    // of silently breaking the sf gates
    import org.apache.spark.sql.functions._
    val mn = Tables.events(spark, sf)
      .agg(min(col("value"))).head().getDouble(0)
    assert(mn >= 0.0, s"events.value has negative min $mn")
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
