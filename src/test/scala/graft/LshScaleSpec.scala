package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.LshParams
import graft.functions.VectorExpressions.signedProjBuckets
import graft.operators.{Dedup, Similarity}

/** Scale-parameterized LSH: the width ladder, the bucket prefix
  * property the oracle's mask trick relies on, and the per-bucket
  * star-fallback cap under an adversarial planted duplicate cluster. */
class LshScaleSpec extends AnyFunSuite {
  import TestSpark._

  test("width ladder: boundaries, clamps, and monotonicity") {
    import LshParams._
    assert(widthForCount(0) === MinPlanes)
    assert(widthForCount(1) === MinPlanes)
    // below the first threshold everything clamps to MinPlanes
    assert(widthForCount((1L << (MinPlanes + 1 + OccLog2)) - 1) === MinPlanes)
    // exact power-of-two boundaries step the width by one
    (MinPlanes + 1 to MaxPlanes).foreach { p =>
      val lo = 1L << (p + OccLog2)
      assert(widthForCount(lo) === p, s"n=$lo")
      assert(widthForCount(lo - 1) === p - 1 || p - 1 < MinPlanes, s"n=${lo - 1}")
    }
    // ceiling clamp, including the narrower simhash ceiling
    assert(widthForCount(Long.MaxValue) === MaxPlanes)
    assert(widthForCount(Long.MaxValue, MaxPrefix) === MaxPrefix)
    // monotone non-decreasing in n
    val samples = (0 until 60).map(i => (1L << (i % 40)) + i)
    samples.sorted.map(widthForCount(_)).sliding(2).foreach {
      case Seq(a, b) => assert(a <= b); case _ =>
    }
  }

  test("SQL CASE ladder encodes exactly widthForCount") {
    import LshParams._
    // reimplement the generated CASE's semantics from its own
    // thresholds: first `n < 2^(p+1+Occ)` wins, else the ceiling
    def caseEval(n: Long, max: Int): Int =
      (MinPlanes until max)
        .find(p => n < (1L << (p + 1 + OccLog2)))
        .getOrElse(max)
    val ns = Seq(0L, 1L, 2L, 3L) ++
      (1 to 50).flatMap(k => Seq((1L << k) - 1, 1L << k, (1L << k) + 1))
    for (n <- ns; max <- Seq(MaxPlanes, MaxPrefix)) {
      assert(caseEval(n, max) === widthForCount(n, max), s"n=$n max=$max")
      // and the generated SQL literally contains each threshold
      assert(ladderSql("cnt", max).contains(
        s"WHEN cnt < ${1L << (MinPlanes + 1 + OccLog2)} THEN $MinPlanes"))
    }
  }

  test("narrow bucket is the masked prefix of the MaxPlanes bucket") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf).select($"embedding")
    for (t <- 0 until 4; np <- Seq(4, 7, 12)) {
      val mismatch = e.select(
          signedProjBuckets($"embedding", Similarity.planesFor(t, np)).as("narrow"),
          (signedProjBuckets($"embedding",
            Similarity.planesFor(t, LshParams.MaxPlanes))
            .bitwiseAND(lit((1L << np) - 1))).as("masked"))
        .filter($"narrow" =!= $"masked").count()
      assert(mismatch === 0L, s"table=$t planes=$np")
    }
  }

  test("simhash prefix width follows the corpus ladder") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf)
    val expected = LshParams.widthForCount(docs.count(), LshParams.MaxPrefix)
    val sh = Dedup.qSimhash(spark, sf)
    val maxBucket = sh.agg(max($"bucket")).head().getLong(0)
    assert(maxBucket < (1L << expected))
    // bucket really is the top `expected` bits of the simhash
    val bad = sh.filter($"bucket" =!=
      shiftright($"simhash", 32 - expected)).count()
    assert(bad === 0L)
  }

  test("planted 10^3-copy cluster: star fallback bounds volume, keeps connectivity") {
    import spark.implicits._
    val nCopies = 1000
    val vec = Array.tabulate(64)(i => math.sin(i + 1.0).toFloat)
    val corpus = (0 until nCopies).map(i => (i.toLong, vec))
      .toDF("vec_id", "embedding")
    // every copy lands in the SAME bucket of every table (θ=0), so
    // f = 1000 > cap: star fallback emits exactly f−1 pairs per table,
    // all anchored at the bucket minimum — not f²/2
    val star = Similarity.nearDupLshOf(corpus, bucketCap = 512).cache()
    assert(star.count() === (nCopies - 1).toLong)
    assert(star.filter($"vec_a" =!= 0L).count() === 0L)
    // connectivity survives the cap: one component containing all copies
    val comp = Dedup.connectedComponents(
      star.select($"vec_a".as("doc_a"), $"vec_b".as("doc_b")))
    assert(comp.select($"label").distinct().count() === 1L)
    assert(comp.count() === nCopies.toLong)
    // overflow diagnostic names the hot cell in every table
    val over = Similarity.lshOverflowOf(corpus).collect()
    assert(over.length === 4)
    assert(over.forall(_.getLong(2) === nCopies.toLong))
    // an uncapped run really is quadratic — the cap is doing the work
    val full = Similarity.nearDupLshOf(corpus, bucketCap = Int.MaxValue)
    assert(full.count() === nCopies.toLong * (nCopies - 1) / 2)
    star.unpersist()
  }

  test("capped q_minhash_pairs keeps exact-duplicate clusters connected") {
    import spark.implicits._
    // 600 identical documents: one band bucket of f=600 > cap in every
    // band → star pairs only, anchored at doc 0, still one cluster
    val docs = (0 until 600)
      .map(i => (i.toLong, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text")
    val cap = LshParams.BucketCap
    assert(cap < 600)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"band", $"bucket")
    val banded = Dedup.minhashBandedOf(docs)
      .withColumn("f", count(lit(1)).over(w))
      .withColumn("bmin", min($"doc_id").over(w))
    val pairs = banded.as("a").join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bucket" === $"b.bucket" &&
          $"a.doc_id" < $"b.doc_id" &&
          ($"a.f" <= cap || $"a.doc_id" === $"a.bmin"))
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b")).distinct()
    assert(pairs.count() === 599L)
    val comp = Dedup.connectedComponents(pairs)
    assert(comp.select($"label").distinct().count() === 1L)
  }
}
