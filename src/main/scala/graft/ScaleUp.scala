package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up generator for BENCHMARKING ONLY: replicates every table of
  * a driver-provided SF directory `factor`× with disjoint key spaces,
  * so `graft.Bench` can be measured at ~10× the largest shipped SF
  * (sf0.1 × 10 ≈ sf1). Correctness gates always run on the driver's
  * own data — this output is never an oracle input.
  *
  * Replication preserves the statistical shape rather than inflating
  * duplicate structure quadratically:
  *  - fact/entity keys are shifted by `replica × (max+1)` so joins stay
  *    referentially intact and per-key cardinalities are unchanged
  *    (region/nation are real-world-fixed dims, copied as-is);
  *  - document TEXT in replicas >0 is salted with a per-replica token
  *    every third word: intra-replica duplicate/near-dup structure is
  *    preserved exactly, while cross-replica shingle overlap drops to
  *    ~0 (every 3-gram crosses a salt), so near-dup pair volume and
  *    cluster sizes grow LINEARLY with the factor — the way a real
  *    corpus grows — instead of every cluster fusing across replicas;
  *  - embeddings keep their vectors (queries bound their probe sets by
  *    vec_id, which stays in replica 0), ids shifted.
  *
  * Usage: graft.ScaleUp <srcSfDir> <outDir> <factor>
  */
object ScaleUp {

  /** Insert a per-replica salt token after every third word — kills
    * cross-replica n-gram/minhash/simhash collisions (n ≥ 3) while
    * leaving intra-replica text identical. */
  private def salted(text: org.apache.spark.sql.Column, replica: Int) =
    array_join(
      flatten(transform(split(text, " "), (w, j) =>
        when(j % 3 === 2, array(w, lit(s"xr${replica}x")))
          .otherwise(array(w)))),
      " ")

  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ScaleUp <srcSfDir> <outDir> <factor>")
    val (src, out, factor) = (args(0), args(1), args(2).toInt)
    require(factor >= 1, "factor must be >= 1")
    val spark = GraftSession.getOrCreate("graft-scaleup")

    Seq("region", "nation").foreach { t => // fixed-cardinality dims
      Tables.load(spark, src, t).write.mode(SaveMode.Overwrite)
        .parquet(s"$out/$t.parquet")
    }

    // One stride per key DOMAIN, computed from the table that OWNS the
    // domain (PK side) and reused for every referencing FK column. A
    // per-column max would mis-link replicas whenever max(FK) <
    // max(PK) — e.g. TPC-H leaves ~1/3 of customers orderless, so
    // orders.o_custkey's own max under-strides vs customer.c_custkey.
    def domainStride(table: String, pk: String): Long =
      Tables.load(spark, src, table).agg(max(col(pk))).head.getLong(0) + 1L
    val strideOf: Map[String, Long] = {
      val cust = domainStride("customer", "c_custkey")
      val supp = domainStride("supplier", "s_suppkey")
      val part = domainStride("part", "p_partkey")
      val ord = domainStride("orders", "o_orderkey")
      val user = domainStride("events", "user_id")
      Map(
        "c_custkey" -> cust, "o_custkey" -> cust,
        "s_suppkey" -> supp, "l_suppkey" -> supp,
        "p_partkey" -> part, "l_partkey" -> part,
        "o_orderkey" -> ord, "l_orderkey" -> ord,
        "user_id" -> user,
        "event_id" -> domainStride("events", "event_id"),
        "doc_id" -> domainStride("documents", "doc_id"),
        "vec_id" -> domainStride("embeddings", "vec_id"))
    }

    def replicate(name: String, keys: Seq[String],
                  tweak: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val base = Tables.load(spark, src, name)
      (0 until factor).map { i =>
        val shifted = keys.foldLeft(base) { (d, k) =>
          d.withColumn(k, col(k) + lit(i * strideOf(k)))
        }
        tweak(shifted, i)
      }.reduce(_ unionByName _)
        .write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")
    }

    replicate("customer", Seq("c_custkey"))
    replicate("supplier", Seq("s_suppkey"))
    replicate("part", Seq("p_partkey"))
    replicate("orders", Seq("o_orderkey", "o_custkey"))
    replicate("lineitem", Seq("l_orderkey", "l_partkey", "l_suppkey"))
    replicate("events", Seq("event_id", "user_id"))
    replicate("documents", Seq("doc_id"), (d, i) =>
      if (i == 0) d
      else d.withColumn("text", salted(col("text"), i))
        .withColumn("n_chars", length(col("text"))))
    replicate("embeddings", Seq("vec_id"))

    val n = Tables.lineitem(spark, out).count()
    spark.stop()
    println(s"""{"scaleup":"$out","factor":$factor,"lineitem_rows":$n}""")
  }
}
