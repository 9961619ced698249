package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.VectorExpressions.{cosineFast, nearestCentroid, signedProjBuckets}
import graft.functions.VectorFunctions.norm

/** Similarity search over the `embeddings` table (Array[Float], 64-d).
  *
  * Two paths:
  * - brute force: broadcast the (bounded) query set against the corpus —
  *   linear in corpus size, embarrassingly parallel, the correctness
  *   baseline;
  * - LSH (random signed projections): bucket both sides once, search
  *   within buckets — the 100 TB path, where a full cross product is
  *   impossible. Hyperplanes are derived from md5 so plans are
  *   deterministic across runs/executors.
  */
object Similarity {

  private val NQueries = 20 // bounded query set for knn demos
  private val K = 5         // neighbors per query
  private val Planes = 8    // LSH projections → 256 buckets
  private val Dims = 64

  /** Per-label vector stats. Averages are decimal-exact sums (scale 12)
    * of 9-dp-rounded terms divided by the count — order-independent, so
    * the bit-exact gate holds under any partitioning (a raw double avg
    * would depend on Spark's partial-merge order). */
  def qEmbeddingStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.Det.dsum12
    Tables.embeddings(s, d)
      .groupBy($"label")
      .agg(
        count(lit(1)).as("n"),
        round(dsum12(round(norm($"embedding"), 9)) / count(lit(1)), 9).as("avg_norm"),
        round(dsum12(round(element_at($"embedding", 1).cast("double"), 9)) /
          count(lit(1)), 9).as("avg_first"))
  }

  /** Brute-force top-K cosine neighbors for queries vec_id < NQueries. */
  def qKnnBrute(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    val q = emb.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
    val scored = broadcast(q)
      .join(emb, $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        cosineFast($"qv", $"embedding").as("cos"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"neighbor_id", $"rank".cast("long").as("rank"),
        round($"cos", 6).as("cos"))
  }

  /** Embedding-space near-duplicate pairs (cosine above threshold).
    * Brute pairwise here; at scale run the same predicate per LSH
    * bucket (see [[lshBuckets]]) instead of the full cross product. */
  def qEmbedNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    e.as("a").join(e.as("b"), $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        cosineFast($"a.embedding", $"b.embedding").as("cos"))
      .filter($"cos" > 0.4)
      .select($"vec_a", $"vec_b", round($"cos", 6).as("cos"))
  }

  /** Deterministic ±1 hyperplane matrix from md5((plane, dim)). The
    * global plane index space is shared across LSH tables: table t uses
    * planes t·Planes … t·Planes+Planes-1, so every table is independent
    * yet reproducible on any engine (the oracle regenerates the same
    * signs from the same md5 bytes). */
  private[graft] def planesFor(table: Int): Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(Planes, Dims) { (p, i) =>
      val h = md.digest(s"${table * Planes + p}|$i".getBytes("UTF-8"))
      if ((h(0) & 1) == 1) 1.0 else -1.0
    }
  }

  private[graft] def planes: Array[Array[Double]] = planesFor(0)

  /** DuckDB mirror of [[bucketOf]] for table `t` over a DOUBLE[] column:
    * per plane, the signed sequential sum of ±v[i] (exactly the codegen
    * loop's left-to-right double adds, since multiplying by ±1.0 is
    * exact), compared > 0.0 and weighted 2^p. */
  private def sqlBucketExpr(v: String, table: Int): String = {
    val ps = planesFor(table)
    (0 until Planes).map { p =>
      val terms = (0 until Dims)
        .map(i => (if (ps(p)(i) > 0) "+" else "-") + s"$v[${i + 1}]").mkString
      s"(CASE WHEN (${terms.stripPrefix("+")}) > 0.0 THEN ${1 << p} ELSE 0 END)"
    }.mkString("(", " + ", ")")
  }

  /** Signed-projection LSH bucket id for an embedding column (one
    * fused codegen loop over all planes). */
  private[graft] def bucketOf(v: Column): Column = signedProjBuckets(v, planes)

  /** ANN via LSH buckets: top-K within the query's bucket only.
    * Misses across bucket boundaries are the recall tradeoff; the
    * ScalaTest suite measures recall against qKnnBrute. */
  def qAnnLsh(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
      .select($"vec_id", $"embedding", bucketOf($"embedding").as("bucket"))
    val q = emb.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"), $"bucket")
    val scored = broadcast(q)
      .join(emb, Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        cosineFast($"qv", $"embedding").as("cos"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"neighbor_id", $"rank".cast("long").as("rank"),
        round($"cos", 6).as("cos"))
  }

  /** Multi-probe LSH ANN: each query also probes the [[Planes]]
    * buckets at Hamming distance 1 from its own (flip one hyperplane
    * bit), recovering most neighbors lost across a single boundary for
    * (Planes+1)× probe cost — still ~(Planes+1)/2^Planes of the corpus,
    * nowhere near a scan. The classic recall/cost knob. */
  def qAnnMultiProbe(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
      .select($"vec_id", $"embedding", bucketOf($"embedding").as("bucket"))
    val probes = (0 until Planes).map(p => $"bucket".bitwiseXOR(lit(1L << p)))
    val q = emb.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"),
        explode(array(($"bucket" +: probes): _*)).as("bucket"))
    val scored = broadcast(q)
      .join(emb, Seq("bucket"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        cosineFast($"qv", $"embedding").as("cos"))
      .distinct()
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"neighbor_id", $"rank".cast("long").as("rank"),
        round($"cos", 6).as("cos"))
  }

  private val NdTables = 4 // OR-construction tables for near-dup LSH

  /** LSH-bucketed near-duplicate pairs: the 100 TB path for
    * [[qEmbedNearDup]]'s semantics, and the oracle-checked
    * `q_neardup_lsh` entry. OR-construction over [[NdTables]]
    * independent 8-plane tables: a pair is a candidate if it collides
    * in ANY table, which recovers true near-duplicates (cos→1 collides
    * per table w.p. (1-θ/π)^Planes → 1) while keeping candidate volume
    * at T·Σ bucketᵢ² ≈ T·N²/2^Planes instead of N². One explode (T
    * rows/vector) + one (table, bucket) shuffle; the embedding rides
    * the shuffle so cosine is computed directly on the joined pair, and
    * the final distinct dedups pairs that collide in several tables
    * (bounded ×T blowup, post-threshold so it's tiny). */
  def nearDupLsh(s: SparkSession, d: String, threshold: Double = 0.4,
                 tables: Int = NdTables): DataFrame = {
    import s.implicits._
    val e = Tables.embeddings(s, d).select($"vec_id", $"embedding")
    val bands = (0 until tables).map(t =>
      struct(lit(t).as("t"),
        signedProjBuckets($"embedding", planesFor(t)).as("bucket")))
    val banded = e
      .select($"vec_id", $"embedding", explode(array(bands: _*)).as("tb"))
      .select($"vec_id", $"embedding", $"tb.t".as("t"), $"tb.bucket".as("bucket"))
    banded.as("a").join(banded.as("b"),
        $"a.t" === $"b.t" && $"a.bucket" === $"b.bucket" &&
          $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"),
        cosineFast($"a.embedding", $"b.embedding").as("cos"))
      .filter($"cos" > threshold)
      .select($"vec_a", $"vec_b", round($"cos", 6).as("cos"))
      .distinct()
  }

  def qNearDupLsh(s: SparkSession, d: String): DataFrame = nearDupLsh(s, d)

  private val Cells = 16    // IVF coarse-quantizer cells
  private val NProbe = 2    // cells probed per query

  /** IVF-style ANN: the corpus is coarse-quantized to the nearest of
    * [[Cells]] centroid vectors (a NARROW map via the codegen
    * [[graft.functions.VectorExpressions.NearestCentroid]] — no
    * shuffle), and each query searches only its [[NProbe]] best cells.
    * Centroids here are the first [[Cells]] corpus vectors; at scale
    * they come from a k-means sample job, and the search shape is
    * unchanged. Cell sizes are ~N/Cells, so probed work is
    * ~NProbe/Cells of the corpus instead of all of it. */
  /** Shared IVF search body: coarse-quantize the corpus to the given
    * centroids (narrow codegen map), probe each query's [[NProbe]]
    * best cells, local top-k. */
  private def ivfSearch(s: SparkSession, emb: DataFrame,
                        centroids: Array[Array[Float]]): DataFrame = {
    import s.implicits._
    val corpus = emb.select($"vec_id", $"embedding",
      nearestCentroid($"embedding", centroids).as("cell"))
    val centDf = centroids.zipWithIndex
      .map { case (v, i) => (i + 1, v) }.toSeq.toDF("cell", "cv")
    val wProbe = Window.partitionBy($"query_id").orderBy($"ccos".desc, $"cell".asc)
    val queryCells = emb.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"embedding".as("qv"))
      .crossJoin(broadcast(centDf))
      .withColumn("ccos", cosineFast($"qv", $"cv"))
      .withColumn("pr", row_number().over(wProbe))
      .filter($"pr" <= NProbe)
      .select($"query_id", $"qv", $"cell")
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    broadcast(queryCells)
      .join(corpus, Seq("cell"))
      .filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        cosineFast($"qv", $"embedding").as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"neighbor_id", $"rank".cast("long").as("rank"),
        round($"cos", 6).as("cos"))
  }

  def qAnnIvf(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val emb = Tables.embeddings(s, d)
    // bounded model parameter: Cells × Dims floats, like k-means centers
    val centroids: Array[Array[Float]] = emb.filter($"vec_id" < Cells)
      .orderBy($"vec_id").select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray)
    ivfSearch(s, emb, centroids)
  }

  /** IVF with k-means-TRAINED centroids — the production configuration
    * ([[qAnnIvf]] pins centroids to the first corpus vectors only so
    * the DuckDB oracle can mirror them literally). Training is
    * [[graft.functions.VectorAgg.trainIvfCentroids]]: `iters` narrow
    * Lloyd passes whose only driver traffic is the Cells × Dims model;
    * the search shape is identical. */
  def annIvfTrained(s: SparkSession, d: String, iters: Int = 3): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val centroids = graft.functions.VectorAgg
      .trainIvfCentroids(emb, Cells, Dims, iters)
    ivfSearch(s, emb, centroids)
  }

  /** Brute KNN over int8-quantized embeddings — the 4×-smaller
    * memory/shuffle variant of [[qKnnBrute]] (quantize at write time,
    * search the codes). Library path, no oracle: round() inside the
    * quantizer is a double→int boundary DuckDB can't be made bit-exact
    * on; the spec instead measures recall against full precision. */
  def knnQuantized(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.Quantize
    val emb = Tables.embeddings(s, d).select($"vec_id",
      Quantize.dequantizeInt8(Quantize.quantizeInt8($"embedding"))
        .cast("array<float>").as("qemb"))
    val q = emb.filter($"vec_id" < NQueries)
      .select($"vec_id".as("query_id"), $"qemb".as("qv"))
    val scored = broadcast(q)
      .join(emb, $"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id".as("neighbor_id"),
        cosineFast($"qv", $"qemb").as("cos"))
    val w = Window.partitionBy($"query_id").orderBy($"cos".desc, $"neighbor_id".asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= K)
      .select($"query_id", $"neighbor_id", $"rank".cast("long").as("rank"),
        round($"cos", 6).as("cos"))
  }

  /** Recall@K of the LSH ANN path against brute force, AS DATA — the
    * quality knob measured inside the engine (run it per corpus drop to
    * decide whether Planes needs retuning). Left join so queries with
    * zero recovered neighbors still report. */
  def qAnnRecall(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val brute = qKnnBrute(s, d).select($"query_id", $"neighbor_id")
    val lsh = qAnnLsh(s, d).select($"query_id", $"neighbor_id")
      .withColumn("hit", lit(1L))
    brute.join(lsh, Seq("query_id", "neighbor_id"), "left")
      .groupBy($"query_id")
      .agg(sum(coalesce($"hit", lit(0L))).as("hits"))
      .select($"query_id", $"hits",
        round($"hits" / lit(K.toDouble), 6).as("recall"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_embedding_stats" -> (qEmbeddingStats _),
    "q_knn_brute" -> (qKnnBrute _),
    "q_embed_neardup" -> (qEmbedNearDup _),
    "q_neardup_lsh" -> (qNearDupLsh _),
    "q_ann_lsh" -> (qAnnLsh _),
    "q_ann_recall" -> (qAnnRecall _),
    "q_ann_multiprobe" -> (qAnnMultiProbe _),
    "q_ann_ivf" -> (qAnnIvf _)
  )

  private lazy val knnBruteSql =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      |SELECT query_id, neighbor_id, rank, cos FROM (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |  ROW_NUMBER() OVER (PARTITION BY q.vec_id
      |    ORDER BY list_cosine_similarity(q.v, c.v) DESC, c.vec_id ASC) AS rank,
      |  ROUND(list_cosine_similarity(q.v, c.v), 6) AS cos
      |  FROM e q JOIN e c ON c.vec_id <> q.vec_id
      |  WHERE q.vec_id < 20) t
      |WHERE rank <= 5""".stripMargin

  private lazy val annLshSql =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |b AS (SELECT vec_id, v, ${sqlBucketExpr("v", 0)} AS bucket FROM e),
       |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < $NQueries)
       |SELECT query_id, neighbor_id, rank, cos FROM (
       |  SELECT q.query_id, c.vec_id AS neighbor_id,
       |  ROW_NUMBER() OVER (PARTITION BY q.query_id
       |    ORDER BY list_cosine_similarity(q.qv, c.v) DESC, c.vec_id ASC) AS rank,
       |  ROUND(list_cosine_similarity(q.qv, c.v), 6) AS cos
       |  FROM q JOIN b c ON q.bucket = c.bucket AND c.vec_id <> q.query_id) t
       |WHERE rank <= $K""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_embedding_stats" -> {
      import graft.functions.Det.sqlSum12
      s"""WITH e AS (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |SELECT label, COUNT(*) AS n,
         |ROUND(${sqlSum12("ROUND(sqrt(list_sum(list_transform(v, x -> x*x))), 9)")}
         |  / COUNT(*), 9) AS avg_norm,
         |ROUND(${sqlSum12("ROUND(v[1], 9)")} / COUNT(*), 9) AS avg_first
         |FROM e GROUP BY label""".stripMargin
    },
    "q_knn_brute" -> knnBruteSql,
    "q_ann_recall" ->
      s"""WITH brute AS (SELECT query_id, neighbor_id FROM ($knnBruteSql) kb),
         |lshq AS (SELECT query_id, neighbor_id FROM ($annLshSql) al)
         |SELECT b.query_id,
         |CAST(SUM(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |  AS hits,
         |ROUND(CAST(SUM(CASE WHEN l.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
         |  AS BIGINT) / ${K.toDouble}, 6) AS recall
         |FROM brute b LEFT JOIN lshq l
         |ON b.query_id = l.query_id AND b.neighbor_id = l.neighbor_id
         |GROUP BY b.query_id""".stripMargin,
    "q_embed_neardup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
        |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        |ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
        |FROM e a JOIN e b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) > 0.4""".stripMargin,
    "q_neardup_lsh" -> {
      val ctes = (0 until NdTables).map(t =>
        s"bkt$t AS (SELECT vec_id, v, ${sqlBucketExpr("v", t)} AS bucket FROM e)")
      val arms = (0 until NdTables).map(t =>
        s"""SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           |ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos
           |FROM bkt$t a JOIN bkt$t b
           |ON a.bucket = b.bucket AND a.vec_id < b.vec_id
           |WHERE list_cosine_similarity(a.v, b.v) > 0.4""".stripMargin)
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |${ctes.mkString(",\n")}
         |${arms.mkString("\nUNION\n")}""".stripMargin
    },
    "q_ann_lsh" -> annLshSql,
    "q_ann_multiprobe" -> {
      val probeList = (0L +: (0 until Planes).map(p => 1L << p)).mkString(", ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |b AS (SELECT vec_id, v, ${sqlBucketExpr("v", 0)} AS bucket FROM e),
         |q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM b WHERE vec_id < $NQueries),
         |probes AS (SELECT query_id, qv, xor(bucket, pb) AS bucket
         |  FROM q CROSS JOIN (SELECT unnest([$probeList]) AS pb)),
         |scored AS (SELECT DISTINCT p.query_id, c.vec_id AS neighbor_id,
         |  list_cosine_similarity(p.qv, c.v) AS rawcos
         |  FROM probes p JOIN b c ON p.bucket = c.bucket AND c.vec_id <> p.query_id)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT query_id, neighbor_id,
         |  ROW_NUMBER() OVER (PARTITION BY query_id
         |    ORDER BY rawcos DESC, neighbor_id ASC) AS rank,
         |  ROUND(rawcos, 6) AS cos FROM scored) t
         |WHERE rank <= $K""".stripMargin
    },
    "q_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |cent AS (SELECT CAST(vec_id + 1 AS INT) AS cell, v AS cv FROM e WHERE vec_id < $Cells),
         |corpus AS (SELECT vec_id, v, cell FROM (
         |  SELECT e.vec_id, e.v, c.cell,
         |  ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |    ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cell ASC) AS rn
         |  FROM e CROSS JOIN cent c) t WHERE rn = 1),
         |qc AS (SELECT query_id, qv, cell FROM (
         |  SELECT e.vec_id AS query_id, e.v AS qv, c.cell,
         |  ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |    ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cell ASC) AS pr
         |  FROM e CROSS JOIN cent c WHERE e.vec_id < $NQueries) t WHERE pr <= $NProbe)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT qc.query_id, co.vec_id AS neighbor_id,
         |  ROW_NUMBER() OVER (PARTITION BY qc.query_id
         |    ORDER BY list_cosine_similarity(qc.qv, co.v) DESC, co.vec_id ASC) AS rank,
         |  ROUND(list_cosine_similarity(qc.qv, co.v), 6) AS cos
         |  FROM qc JOIN corpus co ON co.cell = qc.cell AND co.vec_id <> qc.query_id) t
         |WHERE rank <= $K""".stripMargin
  )
}
