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
    val labels = Dedup.connectedComponentsWithRounds(
      pairs, localFinishMaxEdges = 0)._1
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
    // gate off: this test exists to prove the DISTRIBUTED contraction
    val labels = Dedup.connectedComponentsWithRounds(
      pairs, localFinishMaxEdges = 0)._1
    assert(labels.count() === 1000L)
    assert(labels.filter($"label" =!= 0L).count() === 0L)
  }

  /** Driver-side union-find ground truth for random-graph tests. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = {
      var r = x
      while (parent(r) != r) { parent(r) = parent(parent(r)); r = parent(r) }
      r
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    // label = component minimum (find compresses to the min because
    // unions always root at the smaller id)
    (0 until n).map(i => i.toLong -> find(i).toLong).toMap
  }

  test("size-gated local finish equals the distributed contraction exactly") {
    import spark.implicits._
    val n = 5000
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(8000)(
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
    val pairs = edges.toDF("doc_a", "doc_b")
    val (local, lr) = Dedup.connectedComponentsWithRounds(pairs)
    assert(lr === 0, "small edge set must take the local finish, not rounds")
    val (dist, dr) =
      Dedup.connectedComponentsWithRounds(pairs, localFinishMaxEdges = 0)
    assert(dr > 0)
    assert(local.as[(Long, Long)].collect().toMap ===
      dist.as[(Long, Long)].collect().toMap)
  }

  test("hybrid handoff: distributed rounds contract below the gate, local finish on PARTIALLY contracted edges") {
    import spark.implicits._
    // dense graph on few nodes: distinct-edge count collapses fast
    // under contraction (multi-edges merge), so a mid-range gate is
    // crossed after ≥1 distributed round but BEFORE convergence —
    // the production handoff, where union-find runs on rewired
    // edges, not the input. Contraction rewires but never drops a
    // non-isolated node, so labels must equal the fully distributed
    // run's exactly.
    val n = 500
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(20000)(
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
    val pairs = edges.toDF("doc_a", "doc_b")
    val (dist, dr) =
      Dedup.connectedComponentsWithRounds(pairs, localFinishMaxEdges = 0)
    val (hybrid, hr) = Dedup.connectedComponentsWithRounds(
      pairs, localFinishMaxEdges = 1500)
    assert(hr > 0, "gate must not be crossed before the first round")
    assert(hr < dr, "must exit to the local finish BEFORE convergence " +
      s"(hybrid $hr rounds vs distributed $dr)")
    assert(hybrid.as[(Long, Long)].collect().toMap ===
      dist.as[(Long, Long)].collect().toMap)
  }

  test("10^5-edge random graph: rounds ≤ log2(n)+c, labels match union-find") {
    import spark.implicits._
    val n = 20000
    val rnd = new scala.util.Random(4242)
    val dense = Seq.fill(100000)(
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
    val labels = runAgainstTruth(n, dense)
    // avg degree 10 → essentially one giant component
    assert(labels.values.toSet.size < 100)
  }

  test("sparse random graph (long tendrils) still converges in log rounds") {
    import spark.implicits._
    val n = 20000
    val rnd = new scala.util.Random(99)
    // avg degree ~1: many medium components with path-like tendrils —
    // the regime where label propagation is slowest
    val sparse = Seq.fill(n / 2)(
      (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)).filter(e => e._1 != e._2)
    runAgainstTruth(n, sparse)
  }

  /** Runs CC on the edge list, asserts the log-round bound and exact
    * agreement with driver-side union-find; returns the truth labels. */
  private def runAgainstTruth(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    val pairs = edges.toDF("doc_a", "doc_b")
    val (labelsDf, rounds) =
      Dedup.connectedComponentsWithRounds(pairs, localFinishMaxEdges = 0)
    val bound = graft.functions.LshParams.floorLog2(n.toLong) + 4
    assert(rounds <= bound, s"$rounds rounds > log2($n)+4 = $bound")
    val got = labelsDf.as[(Long, Long)].collect().toMap
    val truth = unionFind(n, edges)
    // CC only sees nodes with ≥1 edge; compare on that support
    got.foreach { case (id, label) =>
      assert(label === truth(id), s"node $id: got $label want ${truth(id)}")
    }
    assert(got.keySet === edges.flatMap(e => Seq(e._1, e._2)).toSet)
    truth
  }
}
