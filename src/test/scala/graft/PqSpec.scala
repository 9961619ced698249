package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Pq

/** IVF-PQ gates: recall floor vs the full-precision IVF path, training
  * determinism, and the memory accounting the operator exists for. */
class PqSpec extends AnyFunSuite {
  import TestSpark._

  private def centroidsOf(d: String): Array[Array[Float]] = {
    import spark.implicits._
    Tables.embeddings(spark, d).filter($"vec_id" < 16)
      .orderBy($"vec_id").select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray)
  }

  test("PQ recall@K stays within tolerance of the full-precision IVF") {
    import spark.implicits._
    val brute = graft.operators.Similarity.qKnnBrute(spark, sf)
      .select($"query_id", $"neighbor_id")
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select($"query_id", $"neighbor_id")
        .join(brute, Seq("query_id", "neighbor_id")).count()
        .toDouble / brute.count()
    val ivf = recall(graft.operators.Similarity.qAnnIvf(spark, sf))
    val pq = recall(graft.operators.Similarity.annIvfPq(spark, sf))
    // with the exact re-rank of the ADC shortlist (IVF-PQ-R), recall
    // should essentially match the float IVF on the probed cells —
    // losses can only come from true neighbors the ADC shortlist
    // (4×K deep) dropped
    assert(pq >= 0.5, s"PQ recall collapsed to $pq (ivf $ivf)")
    assert(pq >= ivf - 0.15, s"PQ recall $pq fell >0.15 below ivf $ivf")
  }

  test("PQ training is bit-deterministic across invocations") {
    val emb = Tables.embeddings(spark, sf)
    val cents = centroidsOf(sf)
    val a = Pq.train(emb, cents, 64, m = 16, ks = 64)
    val b = Pq.train(emb, cents, 64, m = 16, ks = 64)
    assert(a.m === b.m && a.sub === b.sub)
    for (j <- 0 until a.m; k <- a.codebooks(j).indices)
      assert(a.codebooks(j)(k).sameElements(b.codebooks(j)(k)),
        s"codebook ($j, $k) differs between runs")
  }

  test("PQ index persists in a ManifestTable and searches identically") {
    import spark.implicits._
    // the production layout: codes live in a snapshot table (atomic
    // re-index via merge), search runs off the TABLE, never the floats
    val dir = java.nio.file.Files.createTempDirectory("pqidx")
      .toString + "/index"
    val emb = Tables.embeddings(spark, sf)
    val cents = centroidsOf(sf)
    val model = Pq.train(emb, cents, 64, m = 16, ks = 64)
    val enc = Pq.encode(emb, cents, model)
    graft.sources.ManifestTable.create(spark, enc, dir)
    val loaded = graft.sources.ManifestTable.read(spark, dir)
    def rows(encoded: org.apache.spark.sql.DataFrame) =
      Pq.search(emb, encoded, cents, model, 20, 5, 2, reRank = 20)
        .as[(Long, Long, Long, Double)].collect().toSet
    assert(rows(loaded) === rows(enc))
    // incremental re-index: merging the same codes is a content no-op
    graft.sources.ManifestTable.merge(spark, dir, enc, "vec_id")
    assert(rows(graft.sources.ManifestTable.read(spark, dir)) === rows(enc))
  }

  test("encoded corpus carries m byte-sized codes + one norm per vector") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val cents = centroidsOf(sf)
    val model = Pq.train(emb, cents, 64, m = 16, ks = 64)
    val enc = Pq.encode(emb, cents, model)
      .select($"vec_id", $"codes", $"xnorm")
      .as[(Long, Seq[Int], Double)].collect()
    assert(enc.length === emb.count())
    enc.foreach { case (id, codes, xnorm) =>
      assert(codes.length === model.m, s"vec $id: ${codes.length} codes")
      assert(codes.forall(c => c >= 1 && c <= 64),
        s"vec $id: code outside [1, ks]: $codes")
      assert(xnorm > 0.0)
    }
    // the memory claim (SURVEY §5): m byte-sized codes + one 4-byte
    // norm per vector vs dims×4 float — 256 B → 20 B at (m=16, ks=64)
    val bytesPq = model.m + 4
    val bytesFloat = 64 * 4
    assert(bytesFloat / bytesPq >= 12, "memory ratio regressed")
  }
}
