package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Pack

/** Invariant tests for the training-data layout operators (the oracle
  * gate proves bit-exactness; these prove the layout SEMANTICS hold on
  * real table data). */
class PackSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val nDocs = Tables.documents(spark, sf).count()
  private lazy val nTokens = Tables.documents(spark, sf)
    .select(sum(size(split($"text", " ")).cast("long"))).as[Long].head()

  test("shard assignment partitions the corpus exactly") {
    val r = Pack.qShardAssign(spark, sf)
      .agg(sum($"n_docs"), sum($"n_tokens"), count(lit(1)))
      .as[(Long, Long, Long)].head()
    assert(r._1 === nDocs)
    assert(r._2 === nTokens)
    assert(r._3 <= Pack.ShardCount)
  }

  test("packing conserves docs and tokens and sizes bins correctly") {
    val rows = Pack.qSeqPack(spark, sf)
      .select($"n_docs", $"n_tokens", $"n_bins", $"n_spanning")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(_._1).sum === nDocs)
    assert(rows.map(_._2).sum === nTokens)
    rows.foreach { case (docs, toks, bins, spanning) =>
      // concat-then-chunk: bins = ceil(tokens / budget)
      assert(bins === (toks + Pack.PackBudget - 1) / Pack.PackBudget)
      // a doc can span a cut only if there IS a cut, and never more
      // docs span than exist
      assert(spanning <= docs)
      if (bins == 1) assert(spanning === 0)
    }
  }

  test("packing is deterministic: re-run is byte-identical") {
    val a = Pack.qSeqPack(spark, sf).orderBy($"shard").collect().toSeq
    val b = Pack.qSeqPack(spark, sf).orderBy($"shard").collect().toSeq
    assert(a === b)
  }

  test("corpus stats report the real corpus") {
    val m = Pack.qCorpusStats(spark, sf)
      .as[(String, Long)].collect().toMap
    assert(m("n_docs") === nDocs)
    assert(m("n_tokens") === nTokens)
    assert(m("n_dup_docs") >= 0L)
    assert(m("max_doc_tokens") <= nTokens)
    assert(m.size === 7)
  }

  test("mortonZ interleaves bits exactly (reference scalar model)") {
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      for (b <- 0 until 16) {
        z |= ((x >> b) & 1L) << (2 * b)
        z |= ((y >> b) & 1L) << (2 * b + 1)
      }
      z
    }
    val rnd = new scala.util.Random(7)
    val cases = Seq((0L, 0L), (65535L, 65535L), (1L, 0L), (0L, 1L)) ++
      Seq.fill(200)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
    val got = cases.toDF("x", "y")
      .select(Pack.mortonZ($"x", $"y").as("z")).as[Long].collect()
    cases.zip(got).foreach { case ((x, y), z) =>
      assert(z === ref(x, y), s"mortonZ($x, $y)")
    }
  }

  test("z-ordered layout bounds BOTH dims per file; linear sort doesn't") {
    // z-order's selling point: every file's footer min/max is narrow
    // on both interleaved dimensions at once, so a skipping layer
    // prunes on either predicate. A single-column sort gives perfect
    // pk ranges but full-width sk ranges.
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey")
    val (okLo, okHi) = li.agg(min($"l_orderkey"), max($"l_orderkey"))
      .as[(Long, Long)].head()
    val (pkLo, pkHi) = li.agg(min($"l_partkey"), max($"l_partkey"))
      .as[(Long, Long)].head()
    val okSpan = (okHi - okLo).toDouble.max(1)
    val pkSpan = (pkHi - pkLo).toDouble.max(1)
    val dir = java.nio.file.Files.createTempDirectory("zord").toString
    Pack.writeZOrdered(li, "l_orderkey", "l_partkey", dir + "/z", 16)
    li.repartitionByRange(16, $"l_orderkey")
      .sortWithinPartitions($"l_orderkey")
      .write.mode("overwrite").parquet(dir + "/lin")
    def normRanges(path: String): Seq[(Double, Double)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min($"l_orderkey"), max($"l_orderkey"),
          min($"l_partkey"), max($"l_partkey"))
        .as[(String, Long, Long, Long, Long)].collect().toSeq
        .map { case (_, a, b, c, d2) =>
          ((b - a) / okSpan, (d2 - c) / pkSpan) }
    val z = normRanges(dir + "/z")
    val lin = normRanges(dir + "/lin")
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    val (zOk, zPk) = (avg(z.map(_._1)), avg(z.map(_._2)))
    val (linOk, linPk) = (avg(lin.map(_._1)), avg(lin.map(_._2)))
    // linear sort: near-zero ok ranges but full-width pk ranges
    assert(linPk > 0.85, s"linear layout pk range $linPk")
    // z-order: BOTH dims bounded — each file covers a fraction of
    // both key ranges, and the worse dim is far below full width
    assert(zOk < 0.6 && zPk < 0.6,
      s"z-order ranges ok=$zOk pk=$zPk not bounded in both dims")
    assert(avg(z.map(t => t._1.max(t._2))) <
      avg(lin.map(t => t._1.max(t._2))),
      "z-order must beat linear sort on the max-dim-range metric")
  }

  test("hilbert layout bounds both dims and does not regress vs morton") {
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey")
    def span(c: String): Double = {
      val (lo, hi) = li.agg(min(col(c)), max(col(c)))
        .as[(Long, Long)].head()
      (hi - lo).toDouble.max(1)
    }
    val (okSpan, pkSpan) = (span("l_orderkey"), span("l_partkey"))
    val dir = java.nio.file.Files.createTempDirectory("hord").toString
    Pack.writeHilbertOrdered(li, "l_orderkey", "l_partkey", dir + "/h", 16)
    Pack.writeZOrdered(li, "l_orderkey", "l_partkey", dir + "/z", 16)
    def normRanges(path: String): Seq[(Double, Double)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min($"l_orderkey"), max($"l_orderkey"),
          min($"l_partkey"), max($"l_partkey"))
        .as[(String, Long, Long, Long, Long)].collect().toSeq
        .map { case (_, a, b, c, d2) =>
          ((b - a) / okSpan, (d2 - c) / pkSpan) }
    val h = normRanges(dir + "/h")
    val z = normRanges(dir + "/z")
    def avgMax(xs: Seq[(Double, Double)]) =
      xs.map(t => t._1.max(t._2)).sum / xs.size
    // the data-skipping property: every dim bounded per file
    assert(h.forall { case (a, b) => a < 0.8 && b < 0.8 },
      s"hilbert file not bounded in both dims: $h")
    // locality no-regression: a contiguous curve segment must not be
    // looser than morton's seam-jumping cells (25% slack for layout
    // noise at 16 files)
    assert(avgMax(h) <= avgMax(z) * 1.25,
      s"hilbert ${avgMax(h)} vs morton ${avgMax(z)}")
  }

  test("3-dim z-order bounds all three dims per file; linear sort does not") {
    val li = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey")
    def span(c: String): Double = {
      val (lo, hi) = li.agg(min(col(c)), max(col(c)))
        .as[(Long, Long)].head()
      (hi - lo).toDouble.max(1)
    }
    val (okS, pkS, skS) = (span("l_orderkey"), span("l_partkey"),
      span("l_suppkey"))
    val dir = java.nio.file.Files.createTempDirectory("zord3").toString
    Pack.writeZOrdered3(li, ("l_orderkey", "l_partkey", "l_suppkey"),
      dir + "/z", 16)
    li.repartitionByRange(16, $"l_orderkey")
      .sortWithinPartitions($"l_orderkey")
      .write.mode("overwrite").parquet(dir + "/lin")
    def ranges(path: String): Seq[(Double, Double, Double)] =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg(min($"l_orderkey"), max($"l_orderkey"),
          min($"l_partkey"), max($"l_partkey"),
          min($"l_suppkey"), max($"l_suppkey"))
        .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
        .map { case (_, a, b, c, d2, e, f) =>
          ((b - a) / okS, (d2 - c) / pkS, (f - e) / skS) }
    def worst(t: (Double, Double, Double)) = t._1.max(t._2).max(t._3)
    def avg(xs: Seq[Double]) = xs.sum / xs.size
    val z = ranges(dir + "/z")
    val lin = ranges(dir + "/lin")
    // linear: the unsorted dims stay full-width
    assert(avg(lin.map(t => t._2.max(t._3))) > 0.85)
    // z3: every dim bounded below full width on average, and the
    // worst-dim metric beats the linear layout
    assert(avg(z.map(_._1)) < 0.75 && avg(z.map(_._2)) < 0.75 &&
      avg(z.map(_._3)) < 0.75, s"z3 ranges not bounded: ${z.take(3)}")
    assert(avg(z.map(worst)) < avg(lin.map(worst)))
  }

  test("no-split packer: under budget, complete, deterministic, beats naive fill") {
    import graft.functions.TextFunctions.md5Prefix60
    val budget = 256L
    val docs = Tables.documents(spark, sf).select(
      $"doc_id",
      md5Prefix60($"doc_id".cast("string")).as("h"),
      size(split($"text", " ")).cast("long").as("n_tok"))
    val packed = Pack.packNoSplit(docs, budget, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val inDocs = docs.as[(Long, Long, Long)].collect()
    // complete: every document placed exactly once
    assert(packed.map(_._1).sorted.toSeq === inDocs.map(_._1).sorted.toSeq)
    // never over budget; oversized docs flagged -1, never silently split
    packed.groupBy(p => (p._2, p._3)).foreach { case ((_, bin), ds) =>
      if (bin >= 0) assert(ds.map(_._4).sum <= budget, s"bin over budget: $ds")
    }
    packed.filter(_._3 == -1L).foreach(p => assert(p._4 > budget))
    // FFD bin count per shard <= naive sequential-fill bin count
    val byShard = packed.filter(_._3 >= 0).groupBy(_._2)
    byShard.foreach { case (shard, ds) =>
      val ffdBins = ds.map(_._3).distinct.length
      val naive = ds.sortBy(_._1).foldLeft((0L, 1)) { case ((load, bins), d) =>
        if (load + d._4 > budget) (d._4, bins + 1) else (load + d._4, bins)
      }._2
      assert(ffdBins <= naive, s"shard $shard: FFD $ffdBins > naive $naive")
    }
    // deterministic across runs
    val again = Pack.packNoSplit(docs, budget, shards = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(packed.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("interpolated days are bounded by their neighbors") {
    val r = graft.operators.Events.qInterpolate(spark, sf)
    val interp = r.filter($"is_interp" === 1).count()
    // at the smoke SF the thinned slice must actually have gaps
    assert(interp > 0)
    // every filled value is non-negative and finite (values are >= 0)
    assert(r.filter($"filled_e6" < 0 || $"filled_e6".isNull).count() === 0)
  }
}
