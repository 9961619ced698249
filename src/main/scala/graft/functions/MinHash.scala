package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** MinHash signatures via universal hashing (Broder-style).
  *
  * Each shingle is hashed ONCE with md5; the first 60 bits (15 hex
  * digits) become x, and the j-th signature is
  * `min over shingles of (a_j * (x mod M) + b_j) mod M` with
  * M = 2^31 - 1 and deterministic odd constants a_j, b_j. One md5 + K
  * multiply-adds per shingle instead of K md5 calls — the difference
  * between hashing a 100 TB corpus once vs sixteen times.
  *
  * Every step is exact int64 arithmetic reproducible in DuckDB:
  * `(a_j * (CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) % M) + b_j) % M`.
  */
object MinHash {
  val M: Long = 2147483647L // 2^31 - 1

  def aj(j: Int): Long = (j * 2654435761L) % (M - 1) + 1
  def bj(j: Int): Long = (j * 1013904223L) % M

  /** 60-bit md5 prefix (15 hex digits, big-endian first 8 bytes >>> 4). */
  private def md5Top60(h: Array[Byte]): Long = {
    var top = 0L
    var b = 0
    while (b < 8) { top = (top << 8) | (h(b) & 0xffL); b += 1 }
    top >>> 4
  }

  /** Word-n-gram shingle hashes in one pass: shingle i is tokens
    * i..i+n-1 joined by a single space (exactly
    * `concat_ws(' ', slice(toks, i, n))`), hashed to its 60-bit md5
    * prefix. No intermediate shingle-string arrays. */
  def shingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val len = arr.numElements()
    val count = math.max(len - n + 1, 1)
    val out = new Array[Long](count)
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < count) {
      sb.setLength(0)
      val end = math.min(i + n, len)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(arr.getUTF8String(j).toString)
        j += 1
      }
      out(i) = md5Top60(md.digest(sb.toString.getBytes("UTF-8")))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All K signature mins in one pass over pre-hashed shingles. */
  def sigs(arr: ArrayData, k: Int): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val as = Array.tabulate(k)(aj)
    val bs = Array.tabulate(k)(bj)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val x = arr.getLong(i) % M
      var j = 0
      while (j < k) {
        val v = (as(j) * x + bs(j)) % M
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** Word-n-gram shingle STRINGS in one pass: element i is tokens
    * i..i+n-1 joined by a single space — exactly
    * `transform(sequence(1, greatest(size(toks) - n + 1, 1)),
    * i -> concat_ws(' ', slice(toks, i, n)))` including the short-doc
    * clip (one element covering the whole array when len < n), without
    * the interpreted HigherOrderFunction chain: transform/slice are
    * CodegenFallback, so the lambda interpreter plus a fresh
    * slice-copy + concat per position dominate the scan at corpus
    * scale. UTF8String.concatWs skips nulls exactly like concat_ws. */
  def shingleStrings(arr: ArrayData, n: Int): ArrayData = {
    val len = arr.numElements()
    val count = math.max(len - n + 1, 1)
    val out = new Array[org.apache.spark.unsafe.types.UTF8String](count)
    val sep = org.apache.spark.unsafe.types.UTF8String.fromString(" ")
    var i = 0
    while (i < count) {
      val end = math.min(i + n, len)
      val parts =
        new Array[org.apache.spark.unsafe.types.UTF8String](end - i)
      var j = i
      while (j < end) { parts(j - i) = arr.getUTF8String(j); j += 1 }
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(sep, parts: _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** tokens → Array[String] of word-n-gram shingle strings. */
  case class Shingles(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "shingles"

    override protected def nullSafeEval(a: Any): Any =
      shingleStrings(a.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.MinHash.shingleStrings($c, $n);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def shingles(toks: Column, n: Int): Column =
    Bridge.column(Shingles(Bridge.expression(toks), n))

  /** tokens → Array[Long] of 60-bit word-shingle hashes. */
  case class ShingleHash60(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hash60"

    override protected def nullSafeEval(a: Any): Any =
      shingleHashes(a.asInstanceOf[ArrayData], n)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.MinHash.shingleHashes($c, $n);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Array[Long] of the K signature values over pre-hashed shingles. */
  case class MinHashSigs(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sigs"

    override protected def nullSafeEval(a: Any): Any =
      sigs(a.asInstanceOf[ArrayData], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.MinHash.sigs($c, $k);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Count of positions where two equal-length signature arrays agree —
    * the est_jaccard kernel of LSH candidate verification. A fused
    * codegen loop replacing the interpreted zip_with+aggregate HOF in
    * the pair hot path: at corpus scale every candidate pair evaluates
    * this, so expression-eval overhead is the bottleneck, not the K
    * comparisons. */
  case class SigAgree(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = IntegerType
    override def prettyName: String = "sig_agree"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var c = 0
      var i = 0
      while (i < n) { if (x.getLong(i) == y.getLong(i)) c += 1; i += 1 }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val (n, c, i) =
        (ctx.freshName("n"), ctx.freshName("c"), ctx.freshName("i"))
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |int $c = 0;
           |for (int $i = 0; $i < $n; $i++) {
           |  if ($a.getLong($i) == $b.getLong($i)) $c++;
           |}
           |${ev.value} = $c;
         """.stripMargin)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def sigAgree(a: Column, b: Column): Column =
    Bridge.column(SigAgree(Bridge.expression(a), Bridge.expression(b)))

  def shingleHash60(toks: Column, n: Int): Column =
    Bridge.column(ShingleHash60(Bridge.expression(toks), n))

  def minhashSigs(shingleHashCol: Column, k: Int): Column =
    Bridge.column(MinHashSigs(Bridge.expression(shingleHashCol), k))

  /** 32-bit SimHash over a token array: bit b is set iff the b-th bits
    * of the per-token hashes win a ±1 majority vote. Token hash = first
    * 32 bits of md5, the same value as DuckDB
    * `CAST(('0x' || substr(md5(t),1,8)) AS BIGINT)`. */
  def simhash(arr: ArrayData): Long = {
    val md = MessageDigest.getInstance("MD5")
    val votes = new Array[Int](32)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = md.digest(arr.getUTF8String(i).getBytes)
      // first 8 hex digits == big-endian first 4 bytes (unsigned)
      val x = ((h(0) & 0xffL) << 24) | ((h(1) & 0xffL) << 16) |
        ((h(2) & 0xffL) << 8) | (h(3) & 0xffL)
      var b = 0
      while (b < 32) {
        if (((x >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (votes(b) > 0) out |= 1L << b; b += 1 }
    out
  }

  /** Codegen'd one-pass SimHash expression (md5 per token computed
    * once; 32 bit-votes in a tight loop). */
  case class SimHash32(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash32"

    override protected def nullSafeEval(a: Any): Any =
      simhash(a.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.MinHash.simhash($c);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def simhash32(toks: Column): Column =
    Bridge.column(SimHash32(Bridge.expression(toks)))

  /** DuckDB SQL for signature j over a list-of-shingles expression. */
  def sqlSig(sh: String, j: Int): String =
    s"list_aggregate(list_transform($sh, x -> (${aj(j)} * " +
      s"(CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) % $M) + ${bj(j)}) % $M), 'min')"
}
