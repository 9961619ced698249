package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import graft.functions.VectorExpressions.nearestCentroid

/** Custom typed aggregate: element-wise mean of an embedding column,
  * built on `Aggregator[IN, BUF, OUT]` (mutable buffer, partial
  * aggregation on the map side, merge on the reduce side — the same
  * contract the built-in sketches use, so it scales like `avg`).
  */
object VectorAgg {

  /** Element-wise mean of Array[Float] vectors (double accumulation). */
  class VecMean(dims: Int)
      extends Aggregator[Array[Float], (Array[Double], Long), Array[Float]] {
    override def zero: (Array[Double], Long) = (new Array[Double](dims), 0L)

    override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
      val (s, n) = b
      var i = 0
      while (i < math.min(dims, v.length)) { s(i) += v(i); i += 1 }
      (s, n + 1)
    }

    override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dims) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }

    override def finish(b: (Array[Double], Long)): Array[Float] =
      if (b._2 == 0) new Array[Float](dims)
      else b._1.map(x => (x / b._2).toFloat)

    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      ExpressionEncoder[(Array[Double], Long)]()
    override def outputEncoder: Encoder[Array[Float]] =
      ExpressionEncoder[Array[Float]]()
  }

  /** Per-cell mean embedding via the typed aggregator (partial
    * aggregation map-side, like any built-in agg). `df` must have an
    * integer `cell` column and an Array[Float] `embedding` column. */
  def cellCentroids(df: DataFrame, dims: Int): DataFrame = {
    import df.sparkSession.implicits._
    df.select($"cell", $"embedding").as[(Int, Array[Float])]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(new VecMean(dims).toColumn)
      .toDF("cell", "centroid")
  }

  /** ORDER-INDEPENDENT per-cell mean: per-element decimal-exact sums
    * (house Det pattern) of 9-dp-rounded components, re-assembled into
    * a float centroid. Unlike [[VecMean]] (double accumulation in
    * partition-arrival order), the result is bit-identical under any
    * partitioning or merge order — which is what makes the TRAINED IVF
    * path gate-checkable (`q_ann_ivf_trained` must dump the same rows
    * on every run). Costs a posexplode (dims× rows) through the
    * shuffle; acceptable for a model-fitting job over a sample —
    * [[VecMean]] remains the packed high-throughput variant. */
  def cellCentroidsExact(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    import org.apache.spark.sql.functions._
    df.select($"cell", posexplode($"embedding").as(Seq("pos", "x")))
      .groupBy($"cell", $"pos")
      .agg((graft.functions.Det.dsum12(round($"x".cast("double"), 9))
        / count(lit(1))).as("m"))
      .groupBy($"cell")
      .agg(array_sort(collect_list(struct($"pos", $"m"))).as("sm"))
      .select($"cell", transform($"sm", s => s("m").cast("float")).as("centroid"))
  }

  /** Deterministic mini k-means for IVF centroid training: init from
    * the first `cells` vectors, then `iters` Lloyd steps (assign via
    * the codegen NearestCentroid narrow map, re-average per cell with
    * [[cellCentroidsExact]] so the model — and everything downstream
    * of it — is reproducible bit-for-bit across runs/partitionings).
    * Per-iteration driver traffic is cells × dims floats — a model
    * parameter, not data. */
  def trainIvfCentroids(emb: DataFrame, cells: Int, dims: Int, iters: Int): Array[Array[Float]] = {
    import emb.sparkSession.implicits._
    var cents: Array[Array[Float]] = emb.filter($"vec_id" < cells)
      .orderBy($"vec_id").select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    for (_ <- 0 until iters) {
      val assigned = emb.select(
        (nearestCentroid($"embedding", cents) - 1).as("cell"), $"embedding")
      val updated = cellCentroidsExact(assigned).collect()
        .map(r => r.getInt(0) -> r.getSeq[Float](1).toArray).toMap
      cents = cents.indices.map(i => updated.getOrElse(i, cents(i))).toArray
    }
    cents
  }
}
