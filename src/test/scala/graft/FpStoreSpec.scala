package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** The standing bucketed fingerprint store (SURVEY §2 row 35f1):
  * correctness — the store-backed probe census is bit-identical to the
  * per-query-fingerprint form — and the scale property that justifies
  * persisting it: the probe plan reads the corpus side straight off
  * its bucketed files with ZERO exchange (only the days-of-ingest
  * batch side shuffles, to the store's own bucket granularity).
  *
  * The shipped small SFs carry almost no cross-batch fingerprint
  * duplicates (sf0.01: zero — AQE's empty-relation propagation then
  * erases the probe branch entirely), so the suite builds its own
  * corpus dir: sf0.001 documents plus batch docs (doc_id % 10 == 3)
  * duplicating known corpus texts. */
class FpStoreSpec extends AnyFunSuite {
  import TestSpark.spark

  private lazy val dir: String = {
    import spark.implicits._
    val d = "/tmp/graft_fpstore_spec"
    val base = spark.read
      .parquet(TestSpark.sf + "/documents.parquet")
      .filter(pmod($"doc_id", lit(10)) =!= 3)
    // 10 batch docs duplicating corpus texts (with punctuation noise
    // the fingerprint normalizer must erase; donors are ≥60 tokens so
    // the span-coverage of a copy stays far above the 50% admit gate
    // even though the trailing "!!" perturbs its last ≤8 windows)
    // + 10 novel ones
    val donors = base
      .filter(size(split($"text", " ")) >= 60)
      .orderBy($"doc_id").limit(10)
      .select($"text").as[String].collect()
    val batch = (0 until 20).map { i =>
      val id = 100000L + i * 10 + 3
      val text = if (i < 10) donors(i) + "!!" else s"novel text $i only here"
      (id, text, "en", if (i % 2 == 0) "web" else "books",
        text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    base.unionByName(batch).write.mode("overwrite")
      .parquet(d + "/documents.parquet")
    d
  }

  test("q_incremental_store census equals q_incremental_dedup") {
    val a = operators.Dedup.qIncrementalDedupStore(spark, dir).collect()
    val b = operators.Dedup.qIncrementalDedup(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(a.map(_.toString).sorted.toSeq === b && a.nonEmpty)
    assert(a.map(_.getLong(2)).sum == 10,
      "census must see exactly the 10 planted duplicates")
  }

  test("probe plan: bucketed store scan, zero corpus-side exchange") {
    val df = operators.Dedup.qIncrementalDedupStore(spark, dir)
    df.collect() // settle AQE to the final plan
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("SelectedBucketsCount"),
      "store must be read as a bucketed scan:\n" + p)
    val fpShuffles = p.sliding("Exchange hashpartitioning(fp".length)
      .count(_ == "Exchange hashpartitioning(fp")
    assert(fpShuffles == 1,
      s"only the batch side may shuffle on fp (found $fpShuffles):\n" + p)
    assert(p.contains("SortMergeJoin") && p.contains("LeftSemi"),
      "probe must be the merge semi-join (corpus side never broadcasts):\n" + p)
  }

  test("fp store ingest cycle: append admitted batch, next probe sees it") {
    import spark.implicits._
    // private corpus dir — this test mutates its store
    val d2 = "/tmp/graft_fpstore_cycle"
    spark.read.parquet(dir + "/documents.parquet")
      .write.mode("overwrite").parquet(d2 + "/documents.parquet")
    spark.sql(s"DROP TABLE IF EXISTS ${operators.Dedup.fpStoreTable(d2)}")
    // cycle 1: the 10 planted copies are dup, the 10 novel docs admit
    val c1 = operators.Dedup.qIncrementalDedupStore(spark, d2).collect()
    assert(c1.map(_.getLong(3)).sum == 10, "cycle 1 must admit the 10 novel")
    // ingest: append the ADMITTED (novel) batch docs to the store
    val batch = spark.read.parquet(d2 + "/documents.parquet")
      .filter(pmod($"doc_id", lit(10)) === 3)
    val novel = batch.filter($"text".startsWith("novel"))
    operators.Dedup.appendFpStore(spark, d2, novel)
    spark.catalog.refreshTable(operators.Dedup.fpStoreTable(d2))
    // cycle 2: the same batch now probes as ALL duplicate
    val c2 = operators.Dedup.qIncrementalDedupStore(spark, d2).collect()
    assert(c2.map(_.getLong(2)).sum == 20 && c2.map(_.getLong(3)).sum == 0,
      "after the append every batch doc must be a standing duplicate: " +
        c2.mkString(", "))
    // the appended store still probes without a corpus-side exchange
    val df = operators.Dedup.qIncrementalDedupStore(spark, d2)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("SelectedBucketsCount"),
      "appended store must still be read as a bucketed scan:\n" + p)
    assert(p.sliding("Exchange hashpartitioning(fp".length)
      .count(_ == "Exchange hashpartitioning(fp") == 1,
      "appended store must still probe with zero corpus-side exchange:\n" + p)
  }

  test("compaction restores single-file buckets: store-side sort disappears") {
    import spark.implicits._
    // private corpus dir — this test appends to and compacts its store
    val d3 = "/tmp/graft_fpstore_compact"
    spark.read.parquet(dir + "/documents.parquet")
      .write.mode("overwrite").parquet(d3 + "/documents.parquet")
    val tbl = operators.Dedup.fpStoreTable(d3)
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    def probe(): (Seq[String], String) = {
      val df = operators.Dedup.qIncrementalDedupStore(spark, d3)
      val rows = df.collect().map(_.toString).sorted.toSeq
      (rows, df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head)
    }
    def storeSorts(p: String) =
      p.sliding("Sort [fp".length).count(_ == "Sort [fp")
    probe() // builds the store
    // append → multi-file buckets → sort metadata no longer trusted,
    // so the probe re-sorts the store side (batch side always sorts)
    val novel = spark.read.parquet(d3 + "/documents.parquet")
      .filter(pmod($"doc_id", lit(10)) === 3)
      .filter($"text".startsWith("novel"))
    operators.Dedup.appendFpStore(spark, d3, novel)
    spark.catalog.refreshTable(tbl)
    val (r2, p2) = probe()
    assert(storeSorts(p2) == 2,
      s"post-append probe must re-sort the multi-file store side:\n$p2")
    graft.sources.Sources.compactBucketed(spark, tbl, "fp",
      operators.Dedup.FpStoreBuckets)
    val (r3, p3) = probe()
    assert(r3 === r2, "compaction must not change the census")
    assert(storeSorts(p3) == 1,
      s"compacted store must stream sorted off single-file buckets:\n$p3")
    assert(p3.contains("SelectedBucketsCount"),
      "compacted store must still read as a bucketed scan:\n" + p3)
    assert(p3.sliding("Exchange hashpartitioning(fp".length)
      .count(_ == "Exchange hashpartitioning(fp") == 1,
      "compacted store must still probe with zero corpus-side exchange:\n" + p3)
  }

  test("band + anchor store ingest cycles: appended batches stop admitting") {
    import spark.implicits._
    // private corpus dir — this test mutates both of its stores
    val d4 = "/tmp/graft_fpstore_cycle2"
    spark.read.parquet(dir + "/documents.parquet")
      .write.mode("overwrite").parquet(d4 + "/documents.parquet")
    spark.sql(s"DROP TABLE IF EXISTS ${operators.Dedup.bandStoreTable(d4)}")
    spark.sql(
      s"DROP TABLE IF EXISTS ${operators.TextAnalysis.anchorStoreTable(d4)}")
    val novel = spark.read.parquet(d4 + "/documents.parquet")
      .filter(pmod($"doc_id", lit(10)) === 3)
      .filter($"text".startsWith("novel"))
    // band: cycle 1 flags only the 10 planted near-copies
    val b1 = operators.Dedup.qNeardupAdmitStore(spark, d4).collect()
    assert(b1.map(_.getLong(2)).sum == 10)
    operators.Dedup.appendBandStore(spark, d4, novel)
    spark.catalog.refreshTable(operators.Dedup.bandStoreTable(d4))
    val b2 = operators.Dedup.qNeardupAdmitStore(spark, d4).collect()
    assert(b2.map(_.getLong(2)).sum == 20,
      "appended novel docs must now flag as standing near-dups: " +
        b2.mkString(", "))
    // anchor: cycle 1 admits the 10 novel docs (coverage < the gate)
    val a1 = operators.TextAnalysis.qSpanAdmitStore(spark, d4).collect()
    assert(a1.map(_.getLong(2)).sum == 10)
    operators.TextAnalysis.appendAnchorStore(spark, d4, novel)
    spark.catalog.refreshTable(
      operators.TextAnalysis.anchorStoreTable(d4))
    val a2 = operators.TextAnalysis.qSpanAdmitStore(spark, d4).collect()
    assert(a2.map(_.getLong(2)).sum == 0,
      "appended anchors must push novel-doc coverage to 100% → rejected: " +
        a2.mkString(", "))
  }

  test("appends are idempotent: re-appending an ingested batch adds zero rows") {
    import spark.implicits._
    // private corpus dir — this test mutates all three of its stores
    val d5 = "/tmp/graft_fpstore_idem"
    spark.read.parquet(dir + "/documents.parquet")
      .write.mode("overwrite").parquet(d5 + "/documents.parquet")
    val novel = spark.read.parquet(d5 + "/documents.parquet")
      .filter(pmod($"doc_id", lit(10)) === 3)
      .filter($"text".startsWith("novel"))
    for ((tbl, ensure, append) <- Seq[(String, () => String, () => Unit)](
      (operators.Dedup.fpStoreTable(d5),
        () => operators.Dedup.ensureFpStore(spark, d5),
        () => operators.Dedup.appendFpStore(spark, d5, novel)),
      (operators.Dedup.bandStoreTable(d5),
        () => operators.Dedup.ensureBandStore(spark, d5),
        () => operators.Dedup.appendBandStore(spark, d5, novel)),
      (operators.TextAnalysis.anchorStoreTable(d5),
        () => operators.TextAnalysis.ensureAnchorStore(spark, d5),
        () => operators.TextAnalysis.appendAnchorStore(spark, d5, novel)))) {
      spark.sql(s"DROP TABLE IF EXISTS $tbl")
      ensure()
      append()
      spark.catalog.refreshTable(tbl)
      val afterFirst = spark.table(tbl).count()
      append() // second ingest of the SAME batch: anti-join drops it all
      spark.catalog.refreshTable(tbl)
      assert(spark.table(tbl).count() === afterFirst,
        s"$tbl: re-appending an already-ingested batch must add zero rows")
    }
  }

  test("q_span_admit_store census equals q_span_admit") {
    val a = operators.TextAnalysis.qSpanAdmitStore(spark, dir).collect()
    val b = operators.TextAnalysis.qSpanAdmit(spark, dir)
      .collect().map(_.toString).sorted.toSeq
    assert(a.map(_.toString).sorted.toSeq === b && a.nonEmpty)
    // the 10 planted full-text duplicates have ~100% span coverage
    // and must be REJECTED by the 50% gate; the 10 novel docs admit
    assert(a.map(_.getLong(2)).sum == 10,
      "exactly the 10 novel docs must be admitted")
  }

  test("q_neardup_admit_store flags planted near-dups, admits novel docs") {
    val rows = operators.Dedup.qNeardupAdmitStore(spark, dir).collect()
    assert(rows.nonEmpty)
    // the 10 planted donor+"!!" copies share all but ~3 trailing
    // 3-word shingles with their corpus donors (J ≈ 0.9 on ≥60-token
    // texts), so every banded probe finds a ≥K/2-agreement partner;
    // the 10 novel 5-token docs share no shingle with the corpus
    assert(rows.map(_.getLong(2)).sum == 10,
      "exactly the 10 planted near-duplicates must be flagged")
    assert(rows.map(_.getLong(1)).sum == 20, "batch size must be 20")
  }

  test("band-store probe plan: bucketed scan, zero corpus-side exchange") {
    val df = operators.Dedup.qNeardupAdmitStore(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("SelectedBucketsCount"),
      "band store must be read as a bucketed scan:\n" + p)
    val bbShuffles = p.sliding("Exchange hashpartitioning(bb".length)
      .count(_ == "Exchange hashpartitioning(bb")
    assert(bbShuffles == 1,
      s"only the batch side may shuffle on bb (found $bbShuffles):\n" + p)
    assert(p.contains("SortMergeJoin"),
      "probe must be the merge join (corpus side never broadcasts):\n" + p)
  }

  test("anchor-store probe plan: bucketed scan, zero corpus-side exchange") {
    val df = operators.TextAnalysis.qSpanAdmitStore(spark, dir)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("SelectedBucketsCount"),
      "anchor store must be read as a bucketed scan:\n" + p)
    val hShuffles = p.sliding("Exchange hashpartitioning(h".length)
      .count(_ == "Exchange hashpartitioning(h")
    assert(hShuffles == 1,
      s"only the batch side may shuffle on h (found $hShuffles):\n" + p)
    assert(p.contains("SortMergeJoin") && p.contains("LeftSemi"),
      "probe must be the merge semi-join:\n" + p)
  }
}
