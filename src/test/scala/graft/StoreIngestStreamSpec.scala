package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming standing-store ingest (SURVEY §2 lib rows):
  * [[graft.streaming.StreamingOps.storeIngest]] /
  * [[graft.streaming.StreamingOps.vectorStoreIngest]] — the
  * foreachBatch lifecycle sink. The gated property is EXACTLY-ONCE
  * STORE CONTENTS under at-least-once micro-batch delivery: a
  * crash-replayed batch appends nothing (the append verbs' novelty
  * anti-joins), and the final stores are row-identical to the
  * batch-API twin fed the same batches. Fixtures plant cross-batch
  * duplicates explicitly — the shipped small SFs carry none, and
  * AQE's empty-relation propagation would erase the very append
  * branches under test (the round-14 lesson). */
class StoreIngestStreamSpec extends AnyFunSuite {
  import TestSpark.spark
  import spark.implicits._
  import streaming.StreamingOps

  /** Deterministic novel docs: every token unique to (tag, id), ≥70
    * tokens so anchor windows exist far above the admit gates. */
  private def docRows(ids: Seq[Long], tag: String) =
    ids.map { i =>
      val text = (0 until 70).map(j => s"w$tag${i}t$j").mkString(" ")
      (i, text, "en", if (i % 2 == 0) "web" else "books",
        text.length.toLong)
    }

  private def docStores(d: String) = Seq(
    operators.Dedup.fpStoreTable(d), operators.Dedup.bandStoreTable(d),
    operators.TextAnalysis.anchorStoreTable(d))

  private def counts(tbls: Seq[String]): Seq[Long] =
    tbls.map(t => spark.table(t).count())

  private def contents(t: String): Seq[String] =
    spark.table(t).collect().map(_.toString).sorted.toSeq

  test("storeIngest: batches land once, verbatim replay is a no-op, " +
       "stores equal the batch-API twin") {
    val dirS = "/tmp/graft_streamingest_s" // streaming side
    val dirB = "/tmp/graft_streamingest_b" // batch-API twin
    val base = spark.read.parquet(TestSpark.sf + "/documents.parquet")
    Seq(dirS, dirB).foreach(d => base.write.mode("overwrite")
      .parquet(d + "/documents.parquet"))
    (docStores(dirS) ++ docStores(dirB))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

    // batch 1: 8 novel docs; batch 2: 4 VERBATIM cross-batch
    // duplicates of batch 1 (must be anti-joined away) + 4 novel
    val b1 = docRows(9000001L to 9000008L, "a")
    val b2 = b1.take(4) ++ docRows(9000009L to 9000012L, "b")
    val cols = Seq("doc_id", "text", "lang", "source", "n_chars")

    val in = MemoryStream[(Long, String, String, String, Long)](spark)
    // compactEvery=2 → the second micro-batch triggers compaction:
    // the equality asserts below also prove compaction is content-
    // preserving (the twin never compacts)
    val q = StreamingOps.storeIngest(
      in.toDF().toDF(cols: _*), dirS, compactEvery = 2).start()
    val afterTwo = try {
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      docStores(dirS).foreach(spark.catalog.refreshTable)
      val c = counts(docStores(dirS))
      // at-least-once delivery: the SAME rows arrive again as a new
      // micro-batch (the post-crash replay shape)
      in.addData(b2: _*); q.processAllAvailable()
      docStores(dirS).foreach(spark.catalog.refreshTable)
      assert(counts(docStores(dirS)) === c,
        "verbatim replay must append nothing to any store")
      c
    } finally q.stop()
    assert(afterTwo.forall(_ > 0))

    // batch-API twin: same two batches through the Scala appends
    val b1df = b1.toDF(cols: _*)
    val b2df = b2.toDF(cols: _*)
    operators.Dedup.ensureFpStore(spark, dirB)
    operators.Dedup.ensureBandStore(spark, dirB)
    operators.TextAnalysis.ensureAnchorStore(spark, dirB)
    operators.Dedup.appendFpStore(spark, dirB, b1df)
    operators.Dedup.appendBandStore(spark, dirB, b1df)
    operators.TextAnalysis.appendAnchorStore(spark, dirB, b1df)
    operators.Dedup.appendFpStore(spark, dirB, b2df)
    operators.Dedup.appendBandStore(spark, dirB, b2df)
    operators.TextAnalysis.appendAnchorStore(spark, dirB, b2df)
    docStores(dirB).foreach(spark.catalog.refreshTable)
    docStores(dirS).zip(docStores(dirB)).foreach { case (s, b) =>
      assert(contents(s) === contents(b),
        s"streamed store $s must equal batch twin $b row-for-row")
    }
  }

  test("vectorStoreIngest: graph+ivf grow once and replay is a no-op") {
    val dirS = "/tmp/graft_streamingest_vs"
    val dirB = "/tmp/graft_streamingest_vb"
    val base = spark.read.parquet(TestSpark.sf + "/embeddings.parquet")
    Seq(dirS, dirB).foreach(d => base.write.mode("overwrite")
      .parquet(d + "/embeddings.parquet"))
    def vecStores(d: String) = {
      val g = operators.Similarity.graphStoreTable(d)
      Seq(g, operators.Similarity.graphNodesTable(g),
        operators.Similarity.ivfStoreTable(d))
    }
    (vecStores(dirS) ++ vecStores(dirB))
      .foreach(t => spark.sql(s"DROP TABLE IF EXISTS $t"))

    // novel vector batch: ids shifted out of the corpus key space,
    // components shifted so the node table's content hash is new
    val vb = base.filter(pmod($"vec_id", lit(10)) === 3)
      .select(($"vec_id" + lit(1000000000L)).as("vec_id"),
        transform($"embedding", x => x + lit(0.001f)).as("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    assert(vb.nonEmpty)

    val in = MemoryStream[(Long, Array[Float])](spark)
    val q = StreamingOps.vectorStoreIngest(
      in.toDF().toDF("vec_id", "embedding"), dirS).start()
    val after = try {
      in.addData(vb: _*); q.processAllAvailable()
      vecStores(dirS).foreach(spark.catalog.refreshTable)
      val c = counts(vecStores(dirS))
      in.addData(vb: _*); q.processAllAvailable() // replay
      vecStores(dirS).foreach(spark.catalog.refreshTable)
      assert(counts(vecStores(dirS)) === c,
        "replayed vector batch must insert nothing (node-table novelty)")
      c
    } finally q.stop()
    assert(after.forall(_ > 0))

    // batch twin: identical standing stores + one append each
    val gB = operators.Similarity.ensureGraphStore(spark, dirB)
    operators.Similarity.ensureIvfStore(spark, dirB)
    val vbdf = vb.toDF("vec_id", "embedding")
    operators.Similarity.appendGraphStore(spark, gB, vbdf)
    operators.Similarity.appendIvfStore(spark, dirB, vbdf)
    vecStores(dirB).foreach(spark.catalog.refreshTable)
    vecStores(dirS).zip(vecStores(dirB)).foreach { case (s, b) =>
      assert(contents(s) === contents(b),
        s"streamed vector store $s must equal batch twin $b")
    }
  }
}
