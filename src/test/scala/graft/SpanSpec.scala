package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Unit-level proofs of the variable-length span family on CONSTRUCTED
  * corpora with known ground truth (the oracle gate proves engine
  * parity; these prove the geometry is the intended one).
  */
class SpanSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("span").toString
    rows.map { case (id, t) => (id, t, "en", "src", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def words(prefix: String, n: Int): Seq[String] =
    (1 to n).map(i => s"$prefix$i")

  test("a known 20-token shared span chains to exactly one maximal span") {
    val shared = words("s", 20)
    // doc 1: 5 unique tokens, the span, 5 unique; doc 2: span at pos 3
    val d1 = (words("a", 5) ++ shared ++ words("b", 5)).mkString(" ")
    val d2 = (words("c", 2) ++ shared ++ words("d", 8)).mkString(" ")
    val dir = writeDocs(Seq((1L, d1), (2L, d2)))
    val got = operators.TextAnalysis.qSubstringSpans(spark, dir)
      .select($"len", $"n_spans", $"n_pairs")
      .as[(Long, Long, Long)].collect().toSeq
    // ONE span of exactly 20 tokens — not 13 overlapping 8-gram rows,
    // and not extended beyond the true shared extent
    assert(got === Seq((20L, 1L, 1L)))
    val top = operators.TextAnalysis.qLongestDupSpan(spark, dir)
      .select($"doc_a", $"doc_b", $"start_a", $"start_b", $"len",
        $"span_text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getString(5))).toSeq
    assert(top === Seq((1L, 2L, 6L, 3L, 20L, shared.mkString(" "))))
  }

  test("two disjoint shared spans stay two spans (the gap breaks the chain)") {
    val s1 = words("x", 12)
    val s2 = words("y", 14)
    val d1 = (s1 ++ words("g", 3) ++ s2).mkString(" ")
    val d2 = (words("h", 4) ++ s1 ++ words("k", 6) ++ s2).mkString(" ")
    val dir = writeDocs(Seq((1L, d1), (2L, d2)))
    val got = operators.TextAnalysis.qSubstringSpans(spark, dir)
      .select($"len", $"n_spans").as[(Long, Long)].collect().toMap
    assert(got === Map(12L -> 1L, 14L -> 1L))
  }

  test("span trim removes exactly the shared extent on both sides") {
    val shared = words("s", 15)
    val d1 = (words("a", 4) ++ shared ++ words("b", 4)).mkString(" ")
    val d2 = (shared ++ words("c", 10)).mkString(" ")
    val d3 = words("z", 30).mkString(" ") // untouched bystander
    val dir = writeDocs(Seq((1L, d1), (2L, d2), (3L, d3)))
    val got = operators.TextAnalysis.qSpanTrim(spark, dir)
      .select($"n_docs", $"n_docs_trimmed", $"tokens_before",
        $"tokens_after")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((3L, 2L, 23L + 25L + 30L, 8L + 10L + 30L)))
  }

  test("below-threshold shared runs (< 12 tokens) are dropped") {
    val shared = words("s", 11) // 4 consecutive anchors only
    val d1 = (shared ++ words("a", 10)).mkString(" ")
    val d2 = (words("b", 10) ++ shared).mkString(" ")
    val dir = writeDocs(Seq((1L, d1), (2L, d2)))
    assert(operators.TextAnalysis.qSubstringSpans(spark, dir)
      .collect().isEmpty)
  }
}
