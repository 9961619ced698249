package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.TextChunker

class ChunkerSpec extends AnyFunSuite {

  private def chunks(s: String): List[Long] =
    TextChunker.chunkHashes(UTF8String.fromString(s)).toLongArray().toList

  private def randomText(n: Int, seed: Long): String = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
  }

  test("chunking is deterministic and covers the document") {
    val t = randomText(3000, seed = 7)
    val c1 = chunks(t)
    assert(c1 === chunks(t))
    assert(c1.nonEmpty)
    // chunk sizes are bounded: at most ceil(len / MinChunk) chunks,
    // at least ceil(len / MaxChunk)
    assert(c1.length <= 3000 / TextChunker.MinChunk + 1)
    assert(c1.length >= 3000 / TextChunker.MaxChunk)
  }

  test("content-defined boundaries re-align after a prefix edit") {
    val t = randomText(3000, seed = 11)
    val edited = "INSERTED-PREFIX-" + t
    val (a, b) = (chunks(t), chunks(edited))
    // after the edit region, boundaries re-synchronize: the two chunk
    // streams share a long common suffix (fixed-size blocks would share
    // none)
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.length
    assert(common >= a.length / 2, s"only $common of ${a.length} chunks re-aligned")
  }

  test("empty and sub-window documents produce one chunk") {
    assert(chunks("").length === 1)
    assert(chunks("short").length === 1)
    assert(chunks("short") !== chunks("shore"))
  }
}
