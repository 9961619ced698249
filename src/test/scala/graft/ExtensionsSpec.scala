package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Similarity

class ExtensionsSpec extends AnyFunSuite {
  import TestSpark._

  test("SQL functions registered via SparkSessionExtensions work end-to-end") {
    // A separate session with the extensions installed.
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      s2.read.parquet(s"$sf/embeddings.parquet").createOrReplaceTempView("emb")
      s2.read.parquet(s"$sf/documents.parquet").createOrReplaceTempView("docs")
      val cos = s2.sql(
        """SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS c
          |FROM emb a JOIN emb b ON b.vec_id = a.vec_id + 1
          |WHERE a.vec_id < 5""".stripMargin).collect()
      assert(cos.length === 5)
      assert(cos.forall(r => math.abs(r.getDouble(1)) <= 1.0))
      val mh = s2.sql(
        """SELECT doc_id,
          |  minhash_sigs(shingle_hash60(split(text, ' '), 3), 16) AS sig,
          |  simhash32(split(text, ' ')) AS sh
          |FROM docs WHERE doc_id < 3""".stripMargin).collect()
      assert(mh.length === 3)
      assert(mh.forall(_.getSeq[Long](1).length === 16))
      val sa = s2.sql(
        """WITH s AS (SELECT doc_id,
          |  minhash_sigs(shingle_hash60(split(text, ' '), 3), 16) AS sig
          |  FROM docs WHERE doc_id < 4)
          |SELECT sig_agree(a.sig, b.sig) AS ag, a.doc_id = b.doc_id AS same
          |FROM s a JOIN s b""".stripMargin).collect()
      // self-pairs agree on all 16 positions; every count is in [0, 16]
      assert(sa.forall(r => r.getInt(0) >= 0 && r.getInt(0) <= 16))
      assert(sa.filter(_.getBoolean(1)).forall(_.getInt(0) === 16))
      val jw = s2.sql(
        "SELECT jaro_winkler_sim('martha', 'marhta') AS a, " +
          "jaro_winkler_sim('', '') AS b").head()
      assert(jw.getDouble(0) === 0.9611111111111111)
      assert(jw.getDouble(1) === 0.0)
      // md5_prefix60 must be bit-identical to the Column-API hash the
      // whole determinism story is built on (TextFunctions.md5Prefix60).
      val h60 = s2.sql(
        """SELECT count(*) AS n FROM docs
          |WHERE md5_prefix60(text) !=
          |  CAST(conv(substring(md5(text), 1, 15), 16, 10) AS BIGINT)"""
          .stripMargin).head()
      assert(h60.getLong(0) === 0L)
      val h60col = s2.read.parquet(s"$sf/documents.parquet")
        .select(graft.functions.TextFunctions.md5Prefix60(col("text")).as("h"))
        .agg(expr("bit_xor(h)").as("chk")).head().getLong(0)
      val h60sql = s2.sql(
        "SELECT bit_xor(md5_prefix60(text)) AS chk FROM docs")
        .head().getLong(0)
      assert(h60col === h60sql)
      val hd = s2.sql(
        "SELECT hilbert_d(0L, 0L) AS a, hilbert_d(65535L, 0L) AS b, " +
          "hilbert_xy(hilbert_d(12345L, 54321L)) AS c").head()
      assert(hd.getLong(0) === 0L)
      assert(hd.getLong(1) ===
        graft.functions.HilbertCurve.xy2d(65535L, 0L))
      assert(hd.getLong(2) === 12345L * 65536L + 54321L)
    } finally {
      // getOrCreate returns the ALREADY-ACTIVE shared session when one
      // exists (its extensions come from withExtensions, so the
      // functions still resolve) — closing it would stop the shared
      // SparkContext for every later test. Only close a session we
      // actually created.
      if (s2 ne spark) s2.close()
    }
  }

  test("IVF ANN returns valid ranked neighbors with positive recall") {
    import spark.implicits._
    val ivf = Similarity.qAnnIvf(spark, sf)
      .select($"query_id", $"neighbor_id", $"cos".as("icos"))
    val brute = Similarity.qKnnBrute(spark, sf)
      .select($"query_id", $"neighbor_id", $"cos".as("bcos"))
    val shared = ivf.join(brute, Seq("query_id", "neighbor_id")).cache()
    assert(shared.count() > 0)
    assert(shared.filter($"icos" =!= $"bcos").count() === 0)
    // every query produces at most K results
    val perQ = Similarity.qAnnIvf(spark, sf).groupBy($"query_id").count().collect()
    assert(perQ.forall(_.getLong(1) <= 5))
  }
}
