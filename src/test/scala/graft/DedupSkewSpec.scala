package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Adversarial skew: one 5-gram shared by EVERY document must not
  * create a quadratic bucket in the Jaccard pair self-join. */
class DedupSkewSpec extends AnyFunSuite {
  import TestSpark._

  test("a ubiquitous shingle is dropped by the df cap; rare overlaps survive") {
    import spark.implicits._
    val nDocs = Dedup.DfCap + 44 // strictly above the cap
    val common = "alpha beta gamma delta epsilon" // one shared 5-gram
    val docs = spark.range(nDocs).select(
      $"id".as("doc_id"),
      concat(lit(common + " filler"),
        $"id".cast("string"), lit(" tail"), $"id".cast("string")).as("text"))
    // docs 0 and 1 additionally share a RARE 7-token suffix (3 shared
    // 5-grams) — glue doc 1's text to doc 0's rare tail
    val rarePair = Seq(
      (10000L, common + " unique rare seven token suffix here"),
      (10001L, common + " another rare seven token suffix here"))
      .toDF("doc_id", "text")
    val all = docs.unionByName(rarePair)

    val pairs = Dedup.jaccardPairsOf(all)
      .select($"doc_a", $"doc_b", $"inter").collect()
    // without the cap: every one of the ~300 docs pairs with every
    // other via the common shingle → ~45k rows. With it: only the
    // rare-suffix pair survives.
    assert(pairs.length === 1, s"expected 1 pair, got ${pairs.length}")
    val p = pairs.head
    assert(p.getLong(0) === 10000L && p.getLong(1) === 10001L)
    // shared rare shingles: "rare seven token suffix here" plus the two
    // 5-grams straddling "...suffix here" — exactly the suffix overlap,
    // never the capped common shingle
    assert(p.getLong(2) >= 1L)
  }
}
