package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** The exact-recall claim of q_fuzzy_exact: deletion-neighborhood
  * candidate generation finds pairs that composite-key blocking
  * (q_fuzzy_match: shared second word AND brand) cannot see by
  * construction — a typo in a blocking key moves the row to another
  * block at any edit distance. */
class FuzzyExactSpec extends AnyFunSuite {
  import TestSpark._

  test("deletion-neighborhood join finds cross-block pairs blocking misses") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("fuzzy").toString
    // two true dist-1 pairs, both invisible to (second word, brand)
    // blocking: the first differs in its SECOND word (the blocking
    // noun) + brand, the second in its FIRST word + brand
    Seq(
      (1L, "zebra apple gold", "Brand#11", "t", 1, 1.0),
      (2L, "zebra spple gold", "Brand#22", "t", 1, 1.0),
      (3L, "alpha stone blue", "Brand#33", "t", 1, 1.0),
      (4L, "alphq stone blue", "Brand#44", "t", 1, 1.0))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")

    assert(Dedup.qFuzzyMatch(spark, dir).collect().isEmpty,
      "no two rows share (second word, brand): blocking finds nothing")

    val rows = Dedup.qFuzzyExact(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Int]("dist") === 1)
    assert(r.getAs[Long]("n_name_pairs") === 2L)
    assert(r.getAs[Long]("n_part_pairs") === 2L)
    // the alpha/alphq pair differs in its head (first) word
    assert(r.getAs[Long]("n_cross_head") === 1L)
  }

  test("phonetic blocking finds pairs the composite join cannot produce") {
    import spark.implicits._
    // structural argument made concrete: every n_cross_brand pair has
    // different brands, and qFuzzyMatch's join requires brand
    // equality — so each one is invisible to edit-distance blocking
    // by construction, at ANY block size
    val rows = operators.Dedup.qFuzzyPhonetic(spark, sf).collect()
    assert(rows.nonEmpty)
    val crossBrand = rows.map(_.getAs[Long]("n_cross_brand")).sum
    assert(crossBrand > 0,
      "expected verified cross-brand pairs (missed by composite blocking)")
  }

  test("soundex kernel: documented classes, collisions, and stability") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val got = Seq("red", "rod", "robert", "rupert", "cold", "old",
      "pfister", "rose", "rosy")
      .toDF("w").select(
        graft.functions.StringSimilarity.soundexCode(col("w")).as("s"))
      .as[String].collect()
    // red/rod collide (phonetic recall across key spellings);
    // robert/rupert is the classic textbook collision; pfister: the
    // first letter's code collapses with an equal-coded successor;
    // rose/rosy collide (vowel-only difference); cold/old differ —
    // soundex preserves the first LETTER
    assert(got === Seq("R300", "R300", "R163", "R163", "C430", "O430",
      "P236", "R200", "R200"))
  }

  test("soundex column matches an independent Scala reference on random words") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // independent implementation of the SAME documented kernel
    // (imperative walk, not translate/regex chains)
    def ref(w: String): String = {
      val code = "01230120022455012623010202"
      val coded = w.toLowerCase.flatMap { c =>
        if (c >= 'a' && c <= 'z') Some(code(c - 'a')) else None
      }
      // collapse adjacent equal digits 1-6 (zeros separate; their own
      // runs collapse too, but they're dropped next anyway)
      val collapsed = coded.foldLeft("") { (acc, c) =>
        if (acc.nonEmpty && acc.last == c && c != '0') acc else acc + c
      }
      val digits = collapsed.drop(1).filter(_ != '0')
      w.take(1).toUpperCase + (digits + "000").take(3)
    }
    val rnd = new scala.util.Random(42)
    val words = (1 to 300).map { _ =>
      (1 to (1 + rnd.nextInt(10))).map(_ => ('a' + rnd.nextInt(26)).toChar)
        .mkString
    }.distinct
    val got = words.toDF("w")
      .select(col("w"), graft.functions.StringSimilarity
        .soundexCode(col("w")).as("s"))
      .as[(String, String)].collect().toMap
    words.foreach { w =>
      assert(got(w) === ref(w), s"soundex mismatch for '$w'")
    }
  }

  test("deletion neighborhood is exhaustive and distance-sound") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // dist(u,v) <= 2 iff u,v share a <=2-deletion variant (plus the
    // verify DP): check both directions against brute-force levenshtein
    // over a small closed vocabulary with dist 0..4 pairs present
    val words = Seq("grape", "grapes", "gape", "tape", "tapes", "maple",
      "apple", "ample", "amble", "bramble")
    val dict = words.zipWithIndex
      .map { case (w, i) => (w, i.toLong, 1L, w.take(1), w.length) }
      .toDF("name", "rep", "n_parts", "head", "len")
    val got = Dedup.fuzzyExactPairs(dict)
      .select($"na", $"nb", $"dist").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    def lev(a: String, b: String): Int = {
      val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1)(
        j => if (i == 0) j else if (j == 0) i else 0))
      for (i <- 1 to a.length; j <- 1 to b.length)
        dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
          dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      dp(a.length)(b.length)
    }
    val want = (for {
      a <- words; b <- words if a < b
      d = lev(a, b) if d <= Dedup.FuzzyExactMaxDist
    } yield (a, b, d)).toSet
    assert(got === want)
  }
}
