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
    // The engine's standard oracle-reproducible hash
    // (TextFunctions.md5Prefix60) as a SQL function, so pure-SQL
    // pipelines (and the TVF expansions below) hash bit-identically
    // to the library paths: CAST(conv(substring(md5(x),1,15),16,10)
    // AS BIGINT). Built by parse-and-splice — the parsed template is
    // the same function composition the Column API emits.
    ext.injectFunction((
      FunctionIdentifier("md5_prefix60"),
      info("md5_prefix60"),
      (args: Seq[Expression]) => spliceExpr(
        "CAST(conv(substring(md5(_g_arg0), 1, 15), 16, 10) AS BIGINT)",
        args(0))))
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
    // The dedup PAIR PIPELINE as one TVF call — the curation verb
    // whose Scala form is Dedup.jaccardPairs: shingle → df-cap →
    // self-join → (doc_a, doc_b, na, nb, inter). The builder expands
    // to PARSED SQL text over the registered shingle_hash60 function
    // (bit-identical hashing to the library path, proven by
    // SqlFrontDoorSpec), so the analyzer resolves the view name and
    // the optimizer sees ordinary operators. Unlike the library path
    // there is no checkpoint materialization — a SQL caller reusing
    // the pairs several times should CACHE the result; semantics are
    // identical. Table arg must be a bare view/table identifier (it
    // is spliced into SQL text — enforced, no expression injection).
    ext.injectTableFunction((
      FunctionIdentifier("dedup_pairs"),
      info("dedup_pairs"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "dedup_pairs(table, shingleN, dfCap) — table is a string " +
            "literal naming a view with (doc_id, text)")
        val tbl = strArg(args(0), "table")
        require(tbl.matches("[A-Za-z_][A-Za-z0-9_.]*"),
          s"dedup_pairs table must be a plain identifier, got $tbl")
        val n = intArg(args(1), "shingleN")
        val cap = intArg(args(2), "dfCap")
        // CTEs don't survive late introduction into an already-running
        // analysis (CTESubstitution has passed), so the pipeline is
        // inlined as derived tables; the optimizer dedups the shared
        // posting subtree via exchange reuse.
        val ds =
          s"""SELECT doc_id, size(shs) AS n, explode(shs) AS s FROM
             |  (SELECT doc_id, array_distinct(
             |     shingle_hash60(split(text, ' '), $n)) AS shs
             |   FROM $tbl)""".stripMargin
        val dsr =
          s"""SELECT ds.doc_id, ds.n, ds.s FROM ($ds) ds
             |LEFT SEMI JOIN (SELECT s FROM ($ds) GROUP BY s
             |  HAVING count(*) <= $cap) rare ON ds.s = rare.s"""
            .stripMargin
        org.apache.spark.sql.catalyst.parser.CatalystSqlParser.parsePlan(
          s"""SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |  a.n AS na, b.n AS nb, count(*) AS inter
             |FROM ($dsr) a JOIN ($dsr) b
             |  ON a.s = b.s AND a.doc_id < b.doc_id
             |GROUP BY a.doc_id, b.doc_id, a.n, b.n""".stripMargin)
      }))
  }

  /** Parse a SQL expression template and splice `arg` where the
    * placeholder attribute `_g_arg0` appears — the parsed tree is the
    * same function composition the Column API emits, so SQL callers
    * hash bit-identically to the library path.
    */
  private def spliceExpr(template: String, arg: Expression): Expression =
    org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      .parseExpression(template)
      .transformUp { case UnresolvedAttribute(Seq("_g_arg0")) => arg }

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
