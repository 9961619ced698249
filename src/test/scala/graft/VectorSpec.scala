package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.functions.{MinHash, VectorFunctions}
import graft.functions.VectorExpressions.cosineFast
import graft.operators.Similarity

class VectorSpec extends AnyFunSuite {
  import TestSpark._

  test("codegen cosine is bitwise-identical to the HOF formulation") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf).limit(50)
    val pairs = e.as("a").crossJoin(e.as("b"))
      .select(
        cosineFast($"a.embedding", $"b.embedding").as("fast"),
        VectorFunctions.cosine($"a.embedding", $"b.embedding").as("hof"))
    assert(pairs.filter($"fast" =!= $"hof").count() === 0)
  }

  test("LSH bucket ids are stable and within 2^Planes") {
    import spark.implicits._
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", Similarity.bucketOf($"embedding").as("b"))
    val mm = e.agg(min($"b"), max($"b")).head()
    assert(mm.getLong(0) >= 0L && mm.getLong(1) < 256L)
    // deterministic across evaluations
    assert(e.collect().toSet === e.collect().toSet)
  }

  test("ANN-reported cosines agree with brute force for shared pairs") {
    import spark.implicits._
    val brute = Similarity.qKnnBrute(spark, sf)
      .select($"query_id", $"neighbor_id", $"cos".as("bcos"))
    val ann = Similarity.qAnnLsh(spark, sf)
      .select($"query_id", $"neighbor_id", $"cos".as("acos"))
    val joined = ann.join(brute, Seq("query_id", "neighbor_id"))
    assert(joined.count() > 0) // recall > 0 on deterministic data
    assert(joined.filter($"acos" =!= $"bcos").count() === 0)
  }

  test("multi-probe LSH recall dominates single-bucket recall") {
    import spark.implicits._
    val brute = Similarity.qKnnBrute(spark, sf)
      .select($"query_id", $"neighbor_id")
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val hits = df.select($"query_id", $"neighbor_id")
        .join(brute, Seq("query_id", "neighbor_id")).count()
      hits.toDouble / brute.count()
    }
    val single = recall(Similarity.qAnnLsh(spark, sf))
    val multi = recall(Similarity.qAnnMultiProbe(spark, sf))
    assert(multi >= single, s"multi-probe $multi < single $single")
    assert(multi > 0)
  }

  test("LSH near-dup pairs are a subset of brute pairs, identical cosines") {
    import spark.implicits._
    // brute is bounded to the vec_id < 512 cross-check slice, so compare
    // the LSH output restricted to the same slice
    val brute = Similarity.qEmbedNearDup(spark, sf)
      .select($"vec_a", $"vec_b", $"cos".as("bcos"))
    val lsh = Similarity.qNearDupLsh(spark, sf)
      .filter($"vec_a" < 512 && $"vec_b" < 512)
    val joined = lsh.join(brute, Seq("vec_a", "vec_b"), "left")
    // every LSH pair exists in brute with the same cosine (no false pairs)
    assert(joined.filter($"bcos".isNull || $"cos" =!= $"bcos").count() === 0)
  }

  test("LSH near-dup recovers planted exact duplicates with full recall") {
    import spark.implicits._
    // exact duplicates have θ=0, so every plane agrees in every table:
    // recall on them is 1.0 by construction, not probabilistically
    val base = Tables.embeddings(spark, sf).select($"vec_id", $"embedding")
    val n = base.count()
    val planted = base.filter($"vec_id" < 10)
      .select(($"vec_id" + n).as("vec_id"), $"embedding")
    val corpus = base.unionByName(planted)
    val bands = (0 until 4).map(t =>
      struct(lit(t).as("t"),
        graft.functions.VectorExpressions
          .signedProjBuckets($"embedding", Similarity.planesFor(t)).as("bucket")))
    val banded = corpus
      .select($"vec_id", $"embedding", explode(array(bands: _*)).as("tb"))
      .select($"vec_id", $"embedding", $"tb.t".as("t"), $"tb.bucket".as("bucket"))
    val pairs = banded.as("a").join(banded.as("b"),
        $"a.t" === $"b.t" && $"a.bucket" === $"b.bucket" && $"a.vec_id" < $"b.vec_id")
      .select($"a.vec_id".as("vec_a"), $"b.vec_id".as("vec_b"))
      .distinct()
    val recovered = pairs
      .filter($"vec_b" === $"vec_a" + n && $"vec_a" < 10).count()
    assert(recovered === 10L, s"only $recovered/10 planted duplicates recovered")
  }

  test("quantized KNN keeps high recall against full precision") {
    import spark.implicits._
    val brute = Similarity.qKnnBrute(spark, sf).select($"query_id", $"neighbor_id")
    val quant = Similarity.knnQuantized(spark, sf).select($"query_id", $"neighbor_id")
    val hits = quant.join(brute, Seq("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / brute.count()
    assert(recall >= 0.6, s"int8 recall@5 collapsed to $recall")
  }

  test("codegen sig_agree matches the HOF zip_with formulation") {
    import spark.implicits._
    val sh = MinHash.shingleHash60(graft.functions.TextFunctions.tokens($"text"), 3)
    val sig = Tables.documents(spark, sf)
      .select($"doc_id", MinHash.minhashSigs(sh, 16).as("sig"))
    val pairs = sig.as("a").crossJoin(sig.as("b")).limit(2000)
      .select(
        MinHash.sigAgree($"a.sig", $"b.sig").as("fast"),
        aggregate(
          zip_with($"a.sig", $"b.sig", (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, v) => acc + v).as("hof"))
    assert(pairs.filter($"fast" =!= $"hof").count() === 0)
  }

  test("fused shingles equal the transform/slice/concat_ws chain") {
    import spark.implicits._
    // the r16 span-family swap: MinHash.shingles / shingleHash60 must
    // reproduce the interpreted HOF idiom bit-for-bit, including the
    // short-doc clip (len < n → one whole-array shingle) and the
    // empty-string doc (split("") = [""]).
    def hofGrams(toks: org.apache.spark.sql.Column, n: Int) =
      transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(n))))
    val docs = Tables.documents(spark, sf).select($"text")
      .unionAll(Seq("", "one", "a b", "x y z w q r s t u").toDF("text"))
    for (n <- Seq(2, 5, 8)) {
      val toks = graft.functions.TextFunctions.tokens($"text")
      val cmp = docs.select(
        MinHash.shingles(toks, n).as("fused"),
        hofGrams(toks, n).as("hof"),
        MinHash.shingleHash60(toks, n).as("fusedh"))
      assert(cmp.filter($"fused" =!= $"hof").count() === 0, s"n=$n strings")
      val h = cmp.select(explode(arrays_zip($"fusedh", $"hof")).as("z"))
        .select($"z.fusedh".as("a"),
          graft.functions.TextFunctions.md5Prefix60($"z.hof").as("b"))
      assert(h.filter($"a" =!= $"b").count() === 0, s"n=$n hashes")
    }
  }

  test("minhash universal-hash constants stay in range") {
    (0 until 64).foreach { j =>
      assert(MinHash.aj(j) >= 1 && MinHash.aj(j) < MinHash.M)
      assert(MinHash.bj(j) >= 0 && MinHash.bj(j) < MinHash.M)
    }
  }

  test("minhash signature agreement estimates jaccard similarity") {
    import spark.implicits._
    // identical docs must agree on every signature position
    val sig = graft.operators.Dedup.signatures(spark, sf)
    val cols = sig.columns.filter(_.startsWith("sig_"))
    val self = sig.as("a").join(sig.as("b"), $"a.doc_id" === $"b.doc_id")
    val agree = cols.map(c => when(col(s"a.$c") === col(s"b.$c"), 1).otherwise(0))
      .reduce((x, y) => x + y)
    assert(self.select(agree.as("k")).filter($"k" =!= cols.length).count() === 0)
  }
}
