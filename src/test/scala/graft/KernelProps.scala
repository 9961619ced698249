package graft

import java.security.MessageDigest

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.{MinHash, VectorExpressions}

/** Property tests for the JVM kernels behind the codegen expressions,
  * checked against independently-written reference implementations
  * (md5 via hex-string parsing rather than byte shifts, etc.). */
object KernelProps extends Properties("graft.kernels") {

  private val token: Gen[String] =
    Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString).map(_.take(12))
  private val tokens: Gen[List[String]] = Gen.nonEmptyListOf(token).map(_.take(80))

  private def arr(ts: List[String]) =
    new GenericArrayData(ts.map(t => UTF8String.fromString(t)).toArray[Any])

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Reference 60-bit hash: parse 15 hex chars like the DuckDB oracle. */
  private def refHash60(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  private def refShingles(ts: List[String], n: Int): List[String] = {
    val count = math.max(ts.length - n + 1, 1)
    (0 until count).map(i => ts.slice(i, i + n).mkString(" ")).toList
  }

  property("shingleHashes matches hex-parse reference") =
    forAll(tokens, Gen.choose(1, 6)) { (ts, n) =>
      val got = MinHash.shingleHashes(arr(ts), n).toLongArray().toList
      got == refShingles(ts, n).map(refHash60)
    }

  property("minhash sigs are the brute-force minima") =
    forAll(tokens, Gen.choose(1, 32)) { (ts, k) =>
      val hashes = refShingles(ts, 3).map(refHash60)
      val want = (0 until k).map { j =>
        hashes.map(x => (MinHash.aj(j) * (x % MinHash.M) + MinHash.bj(j)) % MinHash.M).min
      }.toList
      val got = MinHash.sigs(new GenericArrayData(hashes.toArray), k)
        .toLongArray().toList
      got == want
    }

  property("simhash matches per-bit majority-vote reference") =
    forAll(tokens) { ts =>
      val want = {
        val votes = Array.fill(32)(0)
        ts.foreach { t =>
          val x = java.lang.Long.parseLong(md5hex(t).substring(0, 8), 16)
          (0 until 32).foreach(b => votes(b) += (if (((x >> b) & 1) == 1) 1 else -1))
        }
        (0 until 32).map(b => if (votes(b) > 0) 1L << b else 0L).sum
      }
      MinHash.simhash(arr(ts)) == want
    }

  private val vec: Gen[Array[Float]] =
    Gen.listOfN(16, Gen.choose(-5.0f, 5.0f)).map(_.toArray)
      .suchThat(v => v.exists(x => math.abs(x) > 0.01f))

  property("nearestCentroid is the cosine argmax (1-based, ties low)") =
    forAll(vec, Gen.nonEmptyListOf(vec).map(_.take(8))) { (v, cents) =>
      def cos(a: Array[Float], b: Array[Float]): Double = {
        val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
        dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
          math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
      }
      val want = cents.zipWithIndex.map { case (c, i) => (cos(v, c), -i) }
        .max match { case (_, negI) => -negI + 1 }
      val got = VectorExpressions.nearestCentroidJava(
        new GenericArrayData(v.map(Float.box).toArray[Any]), cents.toArray)
      Prop(got == want) :| s"got $got want $want"
    }

  // Skewed token streams (small alphabet → genuine heavy hitters).
  private val hhStream: Gen[List[String]] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.const("hot"), 4 -> Gen.const("warm"),
      3 -> Gen.oneOf("a", "b", "c"), 1 -> token))

  property("jaroWinkler: bounds, symmetry, identity, empty rule") =
    forAll(token, token) { (a, b) =>
      import graft.functions.StringSimilarity.jaroWinklerBytes
      def jw(x: String, y: String) =
        jaroWinklerBytes(x.getBytes("UTF-8"), y.getBytes("UTF-8"))
      val s = jw(a, b)
      Prop(s >= 0.0 && s <= 1.0) :| s"out of range $s" &&
        Prop(s == jw(b, a)) :| "asymmetric" &&
        Prop(jw(a, a) == 1.0) :| "self != 1" &&
        Prop(jw(a, "") == 0.0) :| "empty rule"
    }

  property("hilbert xy2d is injective on sampled grids") =
    forAll(Gen.listOfN(60, Gen.zip(Gen.choose(0L, 65535L),
      Gen.choose(0L, 65535L)))) { pts =>
      val ds = pts.distinct.map { case (x, y) =>
        graft.functions.HilbertCurve.xy2d(x, y) }
      Prop(ds.distinct.size == pts.distinct.size) :| "collision"
    }

  // KMV register sets are min-k of a SET: any arrival order, any
  // duplication pattern, any batch split must give identical registers
  // — the property that makes the streaming twin deterministic and
  // shard-mergeable.
  property("KMV min-k is arrival-order and batching invariant") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 200L)), Gen.choose(1, 16),
      Gen.choose(0, 1000)) { (users, k, seed) =>
      def run(xs: List[Long]): List[Long] = {
        val set = scala.collection.mutable.SortedSet.empty[Long]
        xs.foreach { u =>
          val h = graft.streaming.StreamingOps.md5Prefix60Jvm(u.toString)
          if (set.size < k) set += h
          else if (h < set.max && !set.contains(h)) {
            set += h; set -= set.max
          }
        }
        set.toList
      }
      val shuffled = new scala.util.Random(seed).shuffle(users)
      val want = users.map(u => graft.streaming.StreamingOps
          .md5Prefix60Jvm(u.toString))
        .distinct.sorted.take(k)
      Prop(run(users) == want) :| "stream != batch min-k" &&
        Prop(run(shuffled) == want) :| "order-dependent"
    }

  property("misraGries never drops an item with count > n/(k+1)") =
    forAll(hhStream, Gen.choose(1, 12)) { (xs, k) =>
      val out = graft.operators.TextAnalysis
        .misraGries(xs.iterator, k).toSet
      val counts = xs.groupBy(identity).view.mapValues(_.size)
      val mustKeep = counts.filter(_._2 * (k + 1) > xs.size).keys.toSet
      Prop((mustKeep -- out).isEmpty) :|
        s"lost ${mustKeep -- out} (k=$k, n=${xs.size})" &&
        Prop(out.size <= k) :| s"summary size ${out.size} > k=$k"
    }
}
