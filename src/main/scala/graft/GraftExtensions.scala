package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.MinHash.{MinHashSigs, ShingleHash60, SigAgree, SimHash32}
import graft.functions.VectorExpressions.CosineSimFloat

/** SparkSessionExtensions plugin exposing graft's custom Catalyst
  * expressions to SQL (`spark.sql("SELECT cosine_sim(a, b) ...")`).
  *
  * Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)` — no library import needed
  * on the query side, so pure-SQL users (JDBC, notebooks) get the
  * same codegen'd hot-path functions as the Scala API.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def intArg(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.AsofStrategy)
    ext.injectPlannerStrategy(_ => graft.plans.RangeStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewrite)
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      info("cosine_sim"),
      (args: Seq[Expression]) => CosineSimFloat(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("shingle_hash60"),
      info("shingle_hash60"),
      (args: Seq[Expression]) =>
        ShingleHash60(args(0), intArg(args(1), "shingle width"))))
    ext.injectFunction((
      FunctionIdentifier("minhash_sigs"),
      info("minhash_sigs"),
      (args: Seq[Expression]) =>
        MinHashSigs(args(0), intArg(args(1), "signature length"))))
    ext.injectFunction((
      FunctionIdentifier("simhash32"),
      info("simhash32"),
      (args: Seq[Expression]) => SimHash32(args(0))))
    ext.injectFunction((
      FunctionIdentifier("sig_agree"),
      info("sig_agree"),
      (args: Seq[Expression]) => SigAgree(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("jaro_winkler_sim"),
      info("jaro_winkler_sim"),
      (args: Seq[Expression]) =>
        graft.functions.StringSimilarity.JaroWinkler(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("hilbert_d"),
      info("hilbert_d"),
      (args: Seq[Expression]) =>
        graft.functions.HilbertCurve.HilbertIndex(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("hilbert_xy"),
      info("hilbert_xy"),
      (args: Seq[Expression]) =>
        graft.functions.HilbertCurve.HilbertDecode(args(0))))
  }
}
