package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler similarity as a native codegen expression.
  *
  * Spark has no built-in Jaro family; this implementation is pinned
  * BIT-FOR-BIT to DuckDB's `jaro_winkler_similarity` (empirically
  * verified over 3000 random byte strings plus the textbook cases):
  *   - match window = max(l1,l2)/2 − 1 (0 when max ≤ 1), greedy
  *     left-to-right matching, transpositions halved by intdiv;
  *   - jaro = (m/l1 + m/l2 + (m−t)/m)/3 in exactly that operation
  *     order (each IEEE op correctly rounded, so replaying the order
  *     replays the bits);
  *   - Winkler boost `sim + prefix·0.1·(1−sim)` (common prefix ≤ 4)
  *     applied only when jaro > 0.7;
  *   - either input empty (INCLUDING both) → 0.0 — DuckDB's
  *     convention, not the usual both-empty → 1.0.
  * Operates on UTF-8 BYTES, matching DuckDB; callers should restrict
  * to ASCII columns (the testdata dictionaries are ASCII).
  * Eval and codegen share one static kernel, so the two paths cannot
  * diverge. */
object StringSimilarity {

  /** Static kernel — called from both interpreted eval and generated
    * code (Scala object methods get Java static forwarders). */
  def jaroWinklerBytes(a: Array[Byte], b: Array[Byte]): Double = {
    val l1 = a.length; val l2 = b.length
    if (l1 == 0 || l2 == 0) return 0.0
    val lmax = math.max(l1, l2)
    val window = if (lmax <= 1) 0 else lmax / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val lo = math.max(0, i - window)
      val hi = math.min(l2 - 1, i + window)
      var j = lo
      var done = false
      while (j <= hi && !done) {
        if (!m2(j) && a(i) == b(j)) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0; var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (a(i) != b(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    val md = m.toDouble
    val sim = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (sim > 0.7) {
      var prefix = 0
      val pmax = math.min(4, math.min(l1, l2))
      var p = 0
      var stop = false
      while (p < pmax && !stop) {
        if (a(p) == b(p)) prefix += 1 else stop = true
        p += 1
      }
      sim + prefix * 0.1 * (1.0 - sim)
    } else sim
  }

  def jw(a: UTF8String, b: UTF8String): Double =
    jaroWinklerBytes(a.getBytes, b.getBytes)

  /** jaro_winkler_similarity(left, right) — DuckDB-bit-exact. */
  case class JaroWinkler(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType, StringType)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "jaro_winkler_sim"

    override protected def nullSafeEval(a: Any, b: Any): Any =
      jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext,
                                     ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.functions.StringSimilarity.jw($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def jaroWinkler(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))

  /** Simplified American Soundex, as a FIXED documented kernel built
    * from engine-portable primitives (translate + digit-run collapse +
    * zero drop + pad) so the DuckDB oracle can mirror it bit-for-bit
    * — DuckDB has no soundex(), and RE2 has no backreferences, so the
    * run collapse is one replace per digit class. Documented deviation
    * from the 1930 standard: `h`/`w` act like vowels (code 0 —
    * separators), where the archival rule lets duplicates merge
    * ACROSS h/w. Every other property holds: first letter preserved,
    * consonant classes b f p v→1 / c g j k q s x z→2 / d t→3 / l→4 /
    * m n→5 / r→6, adjacent same-code letters collapse (including with
    * the first letter), vowels dropped, padded/truncated to 4.
    * [[soundexSql]] is the character-identical DuckDB rendering. */
  def soundexCode(w: Column): Column = {
    import org.apache.spark.sql.functions._
    val coded = translate(lower(w), "abcdefghijklmnopqrstuvwxyz",
      "01230120022455012623010202")
    val collapsed = (1 to 6).foldLeft(coded)((c, dgt) =>
      regexp_replace(c, s"$dgt{2,}", dgt.toString))
    val digits = regexp_replace(substring(collapsed, 2, 64), "0", "")
    concat(upper(substring(w, 1, 1)),
      substring(concat(digits, lit("000")), 1, 3))
  }

  /** DuckDB rendering of [[soundexCode]] over column expression
    * `col` — same translate table, same per-digit collapse order. */
  def soundexSql(col: String): String = {
    val coded = s"translate(lower($col)," +
      s"'abcdefghijklmnopqrstuvwxyz','01230120022455012623010202')"
    val collapsed = (1 to 6).foldLeft(coded)((c, d) =>
      s"regexp_replace($c,'$d{2,}','$d','g')")
    s"upper($col[1:1]) || substr(regexp_replace(substr($collapsed,2)," +
      s"'0','','g') || '000',1,3)"
  }
}
