package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.StringSimilarity

/** The DuckDB-pinning claims of the JaroWinkler expression: textbook
  * values, DuckDB's empty-string convention, the 0.7 boost gate, and
  * eval ≡ codegen through a real Spark plan. */
class JaroWinklerSpec extends AnyFunSuite {
  import TestSpark._

  private def kernel(a: String, b: String): Double =
    StringSimilarity.jaroWinklerBytes(
      a.getBytes("UTF-8"), b.getBytes("UTF-8"))

  test("textbook values match DuckDB's jaro_winkler_similarity") {
    // independently verified against DuckDB 3000-case random probe
    assert(kernel("martha", "marhta") === 0.9611111111111111)
    assert(kernel("dixon", "dicksonx") === 0.8133333333333332)
    assert(kernel("abc", "abc") === 1.0)
    // DuckDB convention: ANY empty side → 0.0, including both empty
    assert(kernel("", "") === 0.0)
    assert(kernel("a", "") === 0.0)
    // no common chars → 0.0 (m = 0 short-circuit)
    assert(kernel("abc", "xyz") === 0.0)
    // below the 0.7 gate the Winkler boost must NOT apply even with a
    // shared prefix: jaro("aBCDEF","aXYZUV") = (1/6+1/6+1)/3 = 4/9
    assert(kernel("aBCDEF", "aXYZUV") === 4.0 / 9.0)
  }

  test("expression through a Spark plan equals the kernel (codegen path)") {
    import spark.implicits._
    val pairs = Seq(("martha", "marhta"), ("crate", "trace"),
      ("zebra", "zebrq"), ("", "x"), ("same", "same"))
    val got = pairs.toDF("a", "b")
      .select(StringSimilarity.jaroWinkler($"a", $"b").as("jw"))
      .as[Double].collect().toSeq
    val want = pairs.map { case (a, b) => kernel(a, b) }
    assert(got === want)
  }
}
