package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, Expression, ExpressionInfo, Literal, SortOrder}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.MinHash.{MinHashSigs, ShingleHash60, SigAgree, SimHash32}
import graft.functions.VectorExpressions.CosineSimFloat
import graft.plans.{AsofJoinNode, RangeJoinMode, RangeJoinNode, TopKPerGroupNode}

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
    // ---- SQL FRONT DOOR for the custom OPERATORS (table functions).
    // The DataFrame APIs (AsofJoin.join, RangeJoin.join, TopK.of)
    // resolve attributes eagerly from analyzed inputs; the TVF route
    // instead emits UnresolvedRelation children + UnresolvedAttribute
    // expressions and lets the ANALYZER resolve them — so a pure-SQL
    // user (JDBC, notebook) reaches the same custom LogicalPlans, and
    // the same planner strategies, from text alone:
    //   SELECT * FROM asof_join('trades','quotes',
    //     'trades.sym','quotes.sym','trades.ts','quotes.ts')
    // Table/column args are string literals; qualify column names with
    // the view name whenever both sides share a column. Self-joining
    // one view requires two differently-named views (attribute
    // dedup for custom binary nodes is the caller's job).
    ext.injectTableFunction((
      FunctionIdentifier("asof_join"),
      info("asof_join"),
      (args: Seq[Expression]) => {
        require(args.length == 6, "asof_join(left, right, leftKey, " +
          "rightKey, leftTime, rightTime) — 6 string-literal args")
        val a = args.map(strArg(_, "asof_join argument"))
        AsofJoinNode(
          leftKeys = Seq(attrRef(a(2))), rightKeys = Seq(attrRef(a(3))),
          leftTime = attrRef(a(4)), rightTime = attrRef(a(5)),
          left = rel(a(0)), right = rel(a(1)))
      }))
    ext.injectTableFunction((
      FunctionIdentifier("range_join"),
      info("range_join"),
      (args: Seq[Expression]) => {
        require(args.length == 7, "range_join(probe, intervals, lo, " +
          "hi, start, end, mode) — 7 string-literal args")
        val a = args.map(strArg(_, "range_join argument"))
        val mode = a(6) match {
          case "inner" => RangeJoinMode.Inner
          case "left_outer" => RangeJoinMode.LeftOuter
          case "full_outer" => RangeJoinMode.FullOuter
          case other => throw new IllegalArgumentException(
            s"range_join mode must be inner|left_outer|full_outer, got $other")
        }
        RangeJoinNode(attrRef(a(2)), attrRef(a(3)), attrRef(a(4)),
          attrRef(a(5)), mode, rel(a(0)), rel(a(1)))
      }))
    ext.injectTableFunction((
      FunctionIdentifier("topk_per_group"),
      info("topk_per_group"),
      (args: Seq[Expression]) => {
        require(args.length == 5, "topk_per_group(table, groupCol, " +
          "orderCol, 'asc'|'desc', k)")
        val tbl = strArg(args(0), "table")
        val dir = strArg(args(3), "direction") match {
          case "asc" => Ascending
          case "desc" => Descending
          case other => throw new IllegalArgumentException(
            s"topk_per_group direction must be asc|desc, got $other")
        }
        TopKPerGroupNode(
          groupExprs = Seq(attrRef(strArg(args(1), "groupCol"))),
          ordering = Seq(SortOrder(attrRef(strArg(args(2), "orderCol")), dir)),
          k = intArg(args(4), "k"),
          child = rel(tbl))
      }))
  }

  private def strArg(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, StringType) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def rel(name: String): UnresolvedRelation =
    UnresolvedRelation(name.split('.').toSeq)

  private def attrRef(name: String): UnresolvedAttribute =
    UnresolvedAttribute(name.split('.').toSeq)
}
