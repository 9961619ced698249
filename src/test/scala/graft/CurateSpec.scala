package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.operators.Curate

class CurateSpec extends AnyFunSuite {
  import TestSpark._

  test("curation gates length, removes exact dups, and caps per source") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val out = Curate.curate(docs, minTokens = 10, quota = 12).cache()

    assert(out.count() > 0 && out.count() <= docs.count())
    // no surviving duplicate fingerprints
    assert(out.groupBy(TextFunctions.fingerprint($"text")).count()
      .filter($"count" > 1).count() === 0)
    // length gate holds
    assert(out.filter(size(TextFunctions.tokens($"text")) < 10).count() === 0)
    // quota holds per source
    assert(out.groupBy($"source").count().filter($"count" > 12).count() === 0)
    // deterministic: same plan, same rows
    assert(Curate.curate(docs, 10, 12).collect().map(_.getLong(0)).sorted
      === out.collect().map(_.getLong(0)).sorted)
  }
}
