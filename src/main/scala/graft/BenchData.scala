package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ~K× scale-up of a testdata directory, for BENCH
  * baselines only (correctness always runs against the driver's own
  * parquet — TESTDATA.md). The container ships no sf1 data, and at
  * sf0.1 most queries run <0.3 s where fixed overhead drowns real
  * regressions; this generator gives the bench something to chew on.
  *
  * Construction: K disjoint "universes", each a full copy of the
  * source tables with every synthetic key offset by `u * (max+1)` so
  * referential joins (orders↔lineitem↔part/supplier, orders↔customer,
  * events per user, documents, embeddings) keep exactly the source
  * cardinality ratios. Shared small dims (region, nation) are copied
  * once, unoffset. Two deliberate perturbations:
  * - document text gets a universe token between words, so the
  *   inherently-quadratic cross-replica exact n-gram pair listings
  *   don't explode K²× (within-universe duplication structure is
  *   preserved verbatim);
  * - embeddings are perturbed per-dimension (~1e-3, angle-changing),
  *   leaving cross-universe replicas as realistic NEAR-duplicates for
  *   the LSH path rather than exact cos=1 copies.
  *
  * Usage: tools/run.sh graft.BenchData <inDir> <outDir> [K]
  */
object BenchData {

  def main(args: Array[String]): Unit = {
    val in = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/graft_sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.builder("graft-benchdata", 16).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    scale(spark, in, out, k)
    spark.stop()
  }

  private def keySpan(df: DataFrame, col: String): Long =
    df.agg(max(org.apache.spark.sql.functions.col(col))).head().getLong(0) + 1

  /** Union of K key-offset copies of `df`. */
  private def universes(df: DataFrame, k: Int,
                        offsets: Map[String, Long],
                        perUniverse: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
    (0 until k).map { u =>
      val shifted = offsets.foldLeft(df) { case (d, (c, span)) =>
        d.withColumn(c, col(c) + lit(u * span))
      }
      perUniverse(shifted, u)
    }.reduce(_ unionByName _)

  def scale(s: SparkSession, in: String, out: String, k: Int): Unit = {
    def w(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$out/$name.parquet")

    // shared dims: one unoffset copy (all universes share geography)
    w(Tables.region(s, in), "region")
    w(Tables.nation(s, in), "nation")

    val cust = Tables.customer(s, in)
    val supp = Tables.supplier(s, in)
    val part = Tables.part(s, in)
    val ord = Tables.orders(s, in)
    val li = Tables.lineitem(s, in)
    val (cSpan, sSpan, pSpan, oSpan) = (keySpan(cust, "c_custkey"),
      keySpan(supp, "s_suppkey"), keySpan(part, "p_partkey"),
      keySpan(ord, "o_orderkey"))
    w(universes(cust, k, Map("c_custkey" -> cSpan)), "customer")
    w(universes(supp, k, Map("s_suppkey" -> sSpan)), "supplier")
    w(universes(part, k, Map("p_partkey" -> pSpan)), "part")
    w(universes(ord, k, Map("o_orderkey" -> oSpan, "o_custkey" -> cSpan)), "orders")
    w(universes(li, k, Map("l_orderkey" -> oSpan, "l_partkey" -> pSpan,
      "l_suppkey" -> sSpan)), "lineitem")

    val ev = Tables.events(s, in)
    w(universes(ev, k, Map("event_id" -> keySpan(ev, "event_id"),
      "user_id" -> keySpan(ev, "user_id"))), "events")

    val docs = Tables.documents(s, in)
    w(universes(docs, k, Map("doc_id" -> keySpan(docs, "doc_id")),
      (d, u) => d.withColumn("text",
          regexp_replace(col("text"), " ", s" u$u "))
        .withColumn("n_chars", length(col("text")).cast("long"))),
      "documents")

    val emb = Tables.embeddings(s, in)
    w(universes(emb, k, Map("vec_id" -> keySpan(emb, "vec_id")),
      (d, u) => d.withColumn("embedding",
        transform(col("embedding"), (x, i) =>
          (x * (lit(1.0) + lit(u) * (pmod(i, lit(7)) - lit(3)) * lit(1e-3)))
            .cast("float")))),
      "embeddings")
  }
}
