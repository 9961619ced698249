package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.FileSourceScanExec

/** The standing IVF index store (SURVEY §2 rows 37e/48d): correctness —
  * the store-backed search is bit-identical to the in-session
  * [[graft.operators.Similarity.qAnnIvf]] — and the scale property that
  * justifies the cell-partitioned layout: a probe's scan reads ONLY the
  * probed cells' files (partition pruning), the ~nProbe/cells I/O bound
  * that makes ANN serving viable on a standing corpus. */
class IvfStoreSpec extends AnyFunSuite {
  import TestSpark.{spark, sf}

  test("q_ann_ivf_store results equal q_ann_ivf") {
    val a = operators.Similarity.qAnnIvfStore(spark, sf).collect()
    val b = operators.Similarity.qAnnIvf(spark, sf).collect()
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq)
    assert(a.nonEmpty)
  }

  test("probe scan is partition-pruned to the probed cells") {
    val tbl = operators.Similarity.ivfStoreTable(sf)
    // AQE off for the assertion only: the pruning is STATIC (the probed
    // cell set is a literal partition filter, no runtime planning
    // involved), and the non-adaptive plan exposes the scan node
    // directly instead of burying it inside query-stage wrappers
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      // a 2-query probe touches at most 4 of the 16 cells
      val df = operators.Similarity.ivfStoreSearch(spark, sf, 2)
      df.collect()
      val scan = df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains(tbl)) => s
      }.headOption.getOrElse(
        fail("no file scan over the IVF store in:\n" +
          df.queryExecution.executedPlan))
      assert(scan.toString.contains("PartitionFilters: [cell"),
        "store scan must carry the probed-cell partition filter:\n" + scan)
      val readFiles = scan.metrics("numFiles").value
      val allFiles = spark.table(tbl).inputFiles.length.toLong
      assert(readFiles < allFiles,
        s"pruned scan must read fewer files than the table holds " +
          s"($readFiles of $allFiles) — the directory layout IS the index")
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }
}
