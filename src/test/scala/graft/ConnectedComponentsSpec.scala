package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

class ConnectedComponentsSpec extends AnyFunSuite {
  import TestSpark._

  test("disjoint clusters each get their component-min label") {
    import spark.implicits._
    val pairs = Seq((2L, 1L), (2L, 3L), (11L, 10L), (20L, 21L), (22L, 20L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("empty edge list yields empty labels without iterating") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    assert(Dedup.connectedComponents(empty).count() === 0L)
  }

  test("two complete cliques bridged by one edge merge into one component") {
    import spark.implicits._
    val cliqueA = for (i <- 0L to 4L; j <- (i + 1) to 4L) yield (i, j)
    val cliqueB = for (i <- 10L to 14L; j <- (i + 1) to 14L) yield (i, j)
    val pairs = (cliqueA ++ cliqueB :+ (4L, 10L)).toDF("doc_a", "doc_b")
    val labels = Dedup.connectedComponents(pairs)
    assert(labels.count() === 10L)
    assert(labels.filter($"label" =!= 0L).count() === 0L)
  }

  test("1000-node path converges without lineage blowup (O(log n) rounds)") {
    import spark.implicits._
    // the adversarial deep chain: min-label propagation needs 999
    // rounds here; star contraction must finish well inside maxIter=50
    // (and throws on non-convergence, so success IS the assertion)
    val pairs = spark.range(999)
      .select($"id".as("doc_a"), ($"id" + 1).as("doc_b"))
    val labels = Dedup.connectedComponents(pairs)
    assert(labels.count() === 1000L)
    assert(labels.filter($"label" =!= 0L).count() === 0L)
  }
}
