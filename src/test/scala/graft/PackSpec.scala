package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Pack

/** Invariant tests for the training-data layout operators (the oracle
  * gate proves bit-exactness; these prove the layout SEMANTICS hold on
  * real table data). */
class PackSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val nDocs = Tables.documents(spark, sf).count()
  private lazy val nTokens = Tables.documents(spark, sf)
    .select(sum(size(split($"text", " ")).cast("long"))).as[Long].head()

  test("shard assignment partitions the corpus exactly") {
    val r = Pack.qShardAssign(spark, sf)
      .agg(sum($"n_docs"), sum($"n_tokens"), count(lit(1)))
      .as[(Long, Long, Long)].head()
    assert(r._1 === nDocs)
    assert(r._2 === nTokens)
    assert(r._3 <= Pack.ShardCount)
  }

  test("packing conserves docs and tokens and sizes bins correctly") {
    val rows = Pack.qSeqPack(spark, sf)
      .select($"n_docs", $"n_tokens", $"n_bins", $"n_spanning")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sum === nDocs)
    assert(rows.map(_._2).sum === nTokens)
    rows.foreach { case (docs, toks, bins, spanning) =>
      // concat-then-chunk: bins = ceil(tokens / budget)
      assert(bins === (toks + Pack.PackBudget - 1) / Pack.PackBudget)
      // a doc can span a cut only if there IS a cut, and never more
      // docs span than exist
      assert(spanning <= docs)
      if (bins == 1) assert(spanning === 0)
    }
  }

  test("packing is deterministic: re-run is byte-identical") {
    val a = Pack.qSeqPack(spark, sf).orderBy($"shard").collect().toSeq
    val b = Pack.qSeqPack(spark, sf).orderBy($"shard").collect().toSeq
    assert(a === b)
  }

  test("corpus stats report the real corpus") {
    val m = Pack.qCorpusStats(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(m("n_docs") === nDocs)
    assert(m("n_tokens") === nTokens)
    assert(m("n_dup_docs") >= 0L)
    assert(m("max_doc_tokens") <= nTokens)
    assert(m.size === 7)
  }

  test("interpolated days are bounded by their neighbors") {
    val r = graft.operators.Events.qInterpolate(spark, sf)
    val interp = r.filter($"is_interp" === 1).count()
    // at the smoke SF the thinned slice must actually have gaps
    assert(interp > 0)
    // every filled value is non-negative and finite (values are >= 0)
    assert(r.filter($"filled_e6" < 0 || $"filled_e6".isNull).count() === 0)
  }
}
