package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking via a Rabin-Karp rolling hash.
  *
  * A boundary is declared wherever the rolling hash of the last
  * [[Win]] bytes has its low [[MaskBits]] bits zero — so boundaries
  * depend only on LOCAL content. Insert a byte near the start of a
  * document and only the chunks around the edit change; every chunk
  * after the next boundary re-aligns and hashes identically. That is
  * what makes chunk-level dedup robust at 100 TB, where fixed-size
  * blocks would mis-align after any edit.
  *
  * Chunk ids are the 60-bit md5 prefix of the chunk bytes (the same id
  * the other dedup operators use), so chunk-level and doc-level dedup
  * compose.
  */
object TextChunker {

  val Win = 16        // rolling window bytes
  val MaskBits = 6    // boundary ≈ every 2^6 = 64 bytes on random input
  val MinChunk = 24   // no boundary before this many bytes in a chunk
  val MaxChunk = 512  // force a boundary at this size

  // Rabin-Karp with implicit mod 2^64 (wrapping Long arithmetic):
  // h = Σ bytes(j) · Base^(Win-1-j); slide = (h - out·Base^(Win-1))·Base + in
  private val Base = 1000000007L
  private val Mask = (1L << MaskBits) - 1
  private val BasePow: Long = {
    var p = 1L
    for (_ <- 1 until Win) p *= Base
    p
  }

  private def md5Top60(h: Array[Byte]): Long = {
    var top = 0L
    var b = 0
    while (b < 8) { top = (top << 8) | (h(b) & 0xffL); b += 1 }
    top >>> 4
  }

  /** Chunk ids for one document's bytes. */
  def chunkHashes(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val md = MessageDigest.getInstance("MD5")
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var h = 0L
    var chunkStart = 0
    var i = 0
    while (i < bytes.length) {
      val in = bytes(i) & 0xffL
      if (i - chunkStart >= Win) {
        h -= (bytes(i - Win) & 0xffL) * BasePow
      }
      h = h * Base + in
      val len = i - chunkStart + 1
      if ((len >= MinChunk && (h & Mask) == 0) || len >= MaxChunk) {
        out += md5Top60(md.digest(
          java.util.Arrays.copyOfRange(bytes, chunkStart, i + 1)))
        chunkStart = i + 1
        h = 0L
      }
      i += 1
    }
    if (chunkStart < bytes.length || bytes.isEmpty) {
      out += md5Top60(md.digest(
        java.util.Arrays.copyOfRange(bytes, chunkStart, bytes.length)))
    }
    new GenericArrayData(out.toArray)
  }

  case class RollingChunks(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "rolling_chunks"

    override protected def nullSafeEval(a: Any): Any =
      chunkHashes(a.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextChunker.chunkHashes($c);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def rollingChunks(text: Column): Column =
    Bridge.column(RollingChunks(Bridge.expression(text)))
}
