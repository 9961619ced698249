package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{VectorAgg, VectorExpressions}

class VectorAggSpec extends AnyFunSuite {
  import TestSpark._

  test("typed vector-mean aggregator matches a manual average") {
    import spark.implicits._
    val df = Seq(
      (0, Array(1.0f, 2.0f)), (0, Array(3.0f, 4.0f)),
      (1, Array(10.0f, 0.0f))).toDF("cell", "embedding")
    val got = VectorAgg.cellCentroids(df, 2).collect()
      .map(r => r.getInt(0) -> r.getSeq[Float](1).toList).toMap
    assert(got(0) === List(2.0f, 3.0f))
    assert(got(1) === List(10.0f, 0.0f))
  }

  test("int8 quantization round-trips within half a quantization step") {
    import spark.implicits._
    import graft.functions.Quantize
    val rows = Tables.embeddings(spark, sf).limit(100)
      .select($"embedding",
        Quantize.dequantizeInt8(Quantize.quantizeInt8($"embedding")).as("deq"))
      .collect()
    rows.foreach { r =>
      val orig = r.getSeq[Float](0)
      val deq = r.getSeq[Double](1)
      val step = orig.map(x => math.abs(x.toDouble)).max / 127.0
      orig.zip(deq).foreach { case (o, q) =>
        assert(math.abs(o - q) <= step / 2 + 1e-9, s"$o vs $q (step $step)")
      }
    }
  }

  test("trained-centroid IVF search returns valid ranked results with true cosines") {
    import spark.implicits._
    val trained = graft.operators.Similarity.annIvfTrained(spark, sf, iters = 2)
    val brute = graft.operators.Similarity.qKnnBrute(spark, sf)
      .select($"query_id", $"neighbor_id", $"cos".as("bcos"))
    val shared = trained.join(brute, Seq("query_id", "neighbor_id"))
    assert(shared.count() > 0) // positive recall on deterministic data
    assert(shared.filter($"cos" =!= $"bcos").count() === 0)
    val perQ = trained.groupBy($"query_id").count().collect()
    assert(perQ.forall(_.getLong(1) <= 5))
  }

  test("trained IVF recall@K stays within tolerance of the pinned-centroid IVF") {
    import spark.implicits._
    // Measured across sf0.001/0.01/0.1: trained ≈ pinned on this
    // corpus (0.72–0.87 vs 0.81–0.86) — the synthetic embeddings are
    // near-uniform, so pinned first-N centroids are already balanced
    // and Lloyd compaction (which the objective test shows working)
    // has no degenerate cells to fix. Training earns its keep on
    // CLUSTERED data; here the gate is a recall floor, not dominance.
    // See SURVEY §6.
    val brute = graft.operators.Similarity.qKnnBrute(spark, sf)
      .select($"query_id", $"neighbor_id")
    def recall(df: org.apache.spark.sql.DataFrame): Double =
      df.select($"query_id", $"neighbor_id")
        .join(brute, Seq("query_id", "neighbor_id")).count()
        .toDouble / brute.count()
    val pinned = recall(graft.operators.Similarity.qAnnIvf(spark, sf))
    val trained = recall(graft.operators.Similarity.qAnnIvfTrained(spark, sf))
    assert(trained >= 0.6, s"trained recall collapsed to $trained")
    assert(trained >= pinned - 0.1,
      s"trained recall $trained fell >0.1 below pinned $pinned")
  }

  test("trained IVF output is bit-deterministic across invocations") {
    import spark.implicits._
    def rows() = graft.operators.Similarity.qAnnIvfTrained(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(rows() === rows())
  }

  test("exact cell centroids are identical under repartitioning") {
    import spark.implicits._
    val base = Tables.embeddings(spark, sf)
      .select((col("vec_id") % 4).cast("int").as("cell"), col("embedding"))
    def cents(df: org.apache.spark.sql.DataFrame) =
      VectorAgg.cellCentroidsExact(df).collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toList).toMap
    assert(cents(base.repartition(1)) === cents(base.repartition(13)))
  }

  test("k-means training tightens the assignment objective") {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sf)
    val init: Array[Array[Float]] = emb.filter($"vec_id" < 16)
      .orderBy($"vec_id").select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    val trained = VectorAgg.trainIvfCentroids(emb, 16, 64, iters = 3)

    def objective(cents: Array[Array[Float]]): Double = {
      // mean cosine of each vector to its assigned centroid (higher = tighter)
      val assigned = emb.select($"embedding",
        VectorExpressions.nearestCentroid($"embedding", cents).as("cell"))
      val centDf = cents.zipWithIndex
        .map { case (c, i) => (i + 1, c) }.toSeq.toDF("cell", "cv")
      assigned.join(broadcast(centDf), "cell")
        .select(VectorExpressions.cosineFast($"embedding", $"cv").as("cos"))
        .agg(avg($"cos")).head().getDouble(0)
    }
    val (before, after) = (objective(init), objective(trained))
    assert(after >= before - 1e-9, s"objective worsened: $before -> $after")
    assert(trained.length === 16 && trained.forall(_.length === 64))
  }
}
