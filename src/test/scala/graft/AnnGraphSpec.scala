package graft

import org.scalatest.funsuite.AnyFunSuite

/** Graph-based ANN (SURVEY §2 row 37f). Exactness is the DuckDB
  * oracle's job (every beam hop mirrored); here we gate the property
  * the oracle can't see — that the graph walk actually FINDS the true
  * neighbors. Measured recall@5 vs brute: 1.00 / 0.99 / 0.94 at
  * sf0.001 / 0.01 / 0.1 with M=12, beam=48, hops=5 (uniform random
  * vectors — the hardest case: cosine concentrates and the graph has
  * no cluster structure to navigate). */
class AnnGraphSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("graph ANN recall@5 vs brute force >= 0.9") {
    val g = operators.Similarity.qAnnGraph(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = operators.Similarity.qKnnBrute(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(b.nonEmpty)
    val recall = (g & b).size.toDouble / b.size
    assert(recall >= 0.9, s"graph-ANN recall@5 degraded to $recall")
  }

  test("q_ann_graph_store walk equals the in-session walk") {
    val a = operators.Similarity.qAnnGraphStore(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    val b = operators.Similarity.qAnnGraph(spark, sf).collect()
      .map(_.toString).sorted.toSeq
    assert(a === b && a.nonEmpty)
  }

  test("each query returns exactly K ranked neighbors") {
    val rows = operators.Similarity.qAnnGraph(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 20)
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to 5L),
        s"query $q ranks must be 1..5")
    }
  }
}
