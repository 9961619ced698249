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

  /** All K signature mins in one pass over the shingle array. */
  def sigs(arr: ArrayData, k: Int): ArrayData = {
    val md = MessageDigest.getInstance("MD5")
    val mins = Array.fill(k)(Long.MaxValue)
    val as = Array.tabulate(k)(aj)
    val bs = Array.tabulate(k)(bj)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      val h = md.digest(arr.getUTF8String(i).getBytes)
      // first 15 hex digits == big-endian first 8 bytes >>> 4 (60 bits)
      var top = 0L
      var b = 0
      while (b < 8) { top = (top << 8) | (h(b) & 0xffL); b += 1 }
      val x = (top >>> 4) % M
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

  /** Array[Long] of the K signature values for a shingle-array column. */
  case class MinHashSigs(child: Expression, k: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(StringType))
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

  def minhashSigs(shingleCol: Column, k: Int): Column =
    Bridge.column(MinHashSigs(Bridge.expression(shingleCol), k))

  /** DuckDB SQL for signature j over a list-of-shingles expression. */
  def sqlSig(sh: String, j: Int): String =
    s"list_aggregate(list_transform($sh, x -> (${aj(j)} * " +
      s"(CAST(('0x' || substr(md5(x),1,15)) AS BIGINT) % $M) + ${bj(j)}) % $M), 'min')"
}
