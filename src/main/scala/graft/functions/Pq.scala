package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorExpressions.{nearestCentroid, nearestCodeword}

/** IVF-PQ: product quantization of coarse-cell RESIDUALS — the memory
  * path that makes billion-vector search fit executor memory.
  *
  * A float corpus costs dims×4 bytes per vector (256 B at 64-d); the
  * int8 path ([[Quantize]]) is 4×. PQ splits each residual
  * (embedding − its IVF cell centroid) into `m` subvectors and stores
  * one byte-sized codeword INDEX per subspace: m bytes + one stored
  * float norm ≈ 12 B per vector at the default (m=8, ks=16) — ~21× —
  * while search stays a cheap table lookup: for each query, dot
  * products against every codeword are precomputed ONCE into a
  * per-query lookup table (m×ks doubles), and each candidate's
  * approximate dot is `dot(q, centroid) + Σⱼ LUT[j][codeⱼ]` —
  * asymmetric distance computation, no per-candidate FLOPs over dims.
  * Cosine is recovered with the stored exact vector norm.
  *
  * Training follows the house determinism rules: codewords initialize
  * from the first `ks` corpus residuals and refine with Lloyd rounds
  * whose means are decimal-exact sums of 9-dp-rounded components
  * (bit-identical under any partitioning — same pattern as
  * [[VectorAgg.cellCentroidsExact]]); all m subspaces train in the
  * SAME jobs (one assignment + one agg per round, subspace exploded
  * into the key), so rounds cost O(1) jobs regardless of m. Driver
  * traffic is the m×ks×(dims/m) model — parameters, not data.
  */
object Pq {

  /** Trained model: codebooks(j)(k) = codeword k of subspace j
    * (dims/m floats each). */
  case class PqModel(m: Int, sub: Int,
                     codebooks: Array[Array[Array[Float]]])

  /** Left-to-right double dot product of two float arrays — the same
    * accumulation order as the codegen loops, so engine-exact. */
  private def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** (vec_id, cell, r): residual of every corpus vector against its
    * cosine-nearest coarse centroid. */
  private def residuals(emb: DataFrame,
                        centroids: Array[Array[Float]]): DataFrame = {
    import emb.sparkSession.implicits._
    val centDf = centroids.zipWithIndex
      .map { case (v, i) => (i + 1, v) }.toSeq.toDF("cell", "cv")
    emb.select($"vec_id", $"embedding",
        nearestCentroid($"embedding", centroids).as("cell"))
      .join(broadcast(centDf), Seq("cell"))
      .select($"vec_id", $"cell", $"embedding",
        zip_with($"embedding", $"cv",
          (a, b) => (a.cast("double") - b.cast("double")).cast("float"))
          .as("r"))
  }

  /** One row per (vector, subspace): the residual subvector. */
  private def subRows(res: DataFrame, m: Int, sub: Int): DataFrame = {
    import res.sparkSession.implicits._
    res.select($"vec_id",
        explode(transform(sequence(lit(0), lit(m - 1)), j =>
          struct(j.as("j"),
            slice($"r", j * sub + 1, lit(sub)).as("sv")))).as("e"))
      .select($"vec_id", $"e.j".as("j"), $"e.sv".as("sv"))
  }

  /** Train per-subspace codebooks on the residuals of `emb` against
    * `centroids`. `iters` Lloyd rounds, deterministic (see object
    * scaladoc). dims must be divisible by m. */
  def train(emb: DataFrame, centroids: Array[Array[Float]],
            dims: Int, m: Int = 8, ks: Int = 16, iters: Int = 2): PqModel = {
    import emb.sparkSession.implicits._
    require(dims % m == 0, s"dims $dims not divisible by m $m")
    val sub = dims / m
    val res = residuals(emb, centroids)
    // init: subvectors of the first ks corpus vectors (model-sized
    // collect), same convention as the IVF coarse init
    val seed = res.filter($"vec_id" < ks).orderBy($"vec_id")
      .select($"r").collect().map(_.getSeq[Float](0).toArray)
    var cbs: Array[Array[Array[Float]]] = Array.tabulate(m) { j =>
      seed.map(r => r.slice(j * sub, (j + 1) * sub))
    }
    val sr = subRows(res, m, sub)
    for (_ <- 0 until iters) {
      val assigned = sr.select($"j",
        nearestCodeword($"sv", $"j", cbs).as("code"), $"sv")
      val means = assigned
        .select($"j", $"code", posexplode($"sv").as(Seq("pos", "x")))
        .groupBy($"j", $"code", $"pos")
        .agg((Det.dsum12(round($"x".cast("double"), 9)) / count(lit(1)))
          .as("mval"))
        .groupBy($"j", $"code")
        .agg(array_sort(collect_list(struct($"pos", $"mval"))).as("sm"))
        .select($"j", $"code",
          transform($"sm", s => s("mval").cast("float")).as("cw"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1)) -> r.getSeq[Float](2).toArray)
        .toMap
      cbs = Array.tabulate(m) { j =>
        cbs(j).indices.map(k =>
          means.getOrElse((j, k + 1), cbs(j)(k))).toArray
      }
    }
    PqModel(m, sub, cbs)
  }

  /** Encode the corpus: (vec_id, cell, codes, xnorm) — codes(j) is
    * the 1-based codeword index of subspace j (byte-sized payload),
    * xnorm the exact vector norm for cosine recovery. */
  def encode(emb: DataFrame, centroids: Array[Array[Float]],
             model: PqModel): DataFrame = {
    import emb.sparkSession.implicits._
    residuals(emb, centroids).select($"vec_id", $"cell",
      transform(sequence(lit(0), lit(model.m - 1)), j =>
        nearestCodeword(slice($"r", j * model.sub + 1, lit(model.sub)),
          j, model.codebooks)).as("codes"),
      sqrt(dotCol($"embedding", $"embedding")).as("xnorm"))
  }

  /** ADC top-k search over an encoded corpus: queries (vec_id <
    * nQueries, like the float IVF path) probe their `nProbe` best
    * cells; candidate scores come from the per-query LUT, never from
    * the original vectors. Output matches the float IVF search shape
    * (query_id, neighbor_id, rank, cos) with cos the ADC
    * approximation.
    *
    * `reRank > 0` enables the standard IVF-PQ-R refinement: ADC keeps
    * a shortlist of `reRank` candidates per query, whose EXACT cosines
    * are then computed from the float vectors before the final top-k.
    * The scan side still touches only codes; refinement fetches
    * reRank×nQueries full vectors — the point-lookup tier (SSD/object
    * store at 100 TB), not a corpus scan. */
  def search(emb: DataFrame, encoded: DataFrame,
             centroids: Array[Array[Float]], model: PqModel,
             nQueries: Int, k: Int, nProbe: Int,
             reRank: Int = 0): DataFrame = {
    import emb.sparkSession.implicits._
    import org.apache.spark.sql.expressions.Window
    val centDf = centroids.zipWithIndex
      .map { case (v, i) => (i + 1, v) }.toSeq.toDF("cell", "cv")
    val cbLit = typedLit(model.codebooks.map(_.map(_.toSeq).toSeq).toSeq)
    val wProbe = Window.partitionBy($"query_id")
      .orderBy($"ccos".desc, $"cell".asc)
    val queryCells = emb.filter($"vec_id" < nQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      .crossJoin(broadcast(centDf))
      .withColumn("ccos", VectorExpressions.cosineFast($"qv", $"cv"))
      .withColumn("pr", row_number().over(wProbe))
      .filter($"pr" <= nProbe)
      // per (query, cell): the centroid dot anchoring the ADC score +
      // the m×ks lookup table dot(q_subⱼ, codewordⱼₖ) — computed once
      // per query, amortized over every candidate in the cell
      .select($"query_id", $"cell",
        dotCol($"qv", $"cv").as("dotqc"),
        sqrt(dotCol($"qv", $"qv")).as("qnorm"),
        transform(sequence(lit(0), lit(model.m - 1)), j =>
          transform(element_at(cbLit, j + 1), cw =>
            dotCol(slice($"qv", j * model.sub + 1, lit(model.sub)), cw)))
          .as("luts"))
    val w = Window.partitionBy($"query_id")
      .orderBy($"cos".desc, $"neighbor_id".asc)
    val adc = broadcast(queryCells)
      .join(encoded, Seq("cell"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        (($"dotqc" + aggregate(
            zip_with($"codes", $"luts", (c, lut) => element_at(lut, c)),
            lit(0.0), (acc, v) => acc + v))
          / ($"qnorm" * $"xnorm")).as("cos"))
      .withColumn("rank", row_number().over(w))
    if (reRank <= 0)
      adc.filter($"rank" <= k)
        .select($"query_id", $"neighbor_id", $"rank".cast("long").as("rank"),
          round($"cos", 6).as("cos"))
    else {
      val queries = emb.filter($"vec_id" < nQueries)
        .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      adc.filter($"rank" <= math.max(reRank, k)).drop("cos", "rank")
        .join(broadcast(queries), Seq("query_id"))
        .join(emb.select($"vec_id".as("neighbor_id"), $"embedding"),
          Seq("neighbor_id"))
        .select($"query_id", $"neighbor_id",
          VectorExpressions.cosineFast($"qv", $"embedding").as("cos"))
        .withColumn("rank", row_number().over(w))
        .filter($"rank" <= k)
        .select($"query_id", $"neighbor_id", $"rank".cast("long").as("rank"),
          round($"cos", 6).as("cos"))
    }
  }
}
