package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Dedup

/** Contract of Dedup.withSharedPairs: inside the scope every pair-
  * family consumer reads ONE checkpointed pair build, results are
  * bit-identical to standalone runs, and the scope cleans up after
  * itself (cache entry removed, checkpoint generation dropped).
  */
class SharedPairsSpec extends AnyFunSuite {
  import TestSpark._

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("consumers share ONE pair build; results bit-identical to solo runs") {
    // standalone: every jaccardPairs call is a fresh pipeline
    assert(!(Dedup.jaccardPairs(spark, sf) eq Dedup.jaccardPairs(spark, sf)))
    val soloSweep = rowsOf(Dedup.qThresholdSweep(spark, sf))
    val soloReach = rowsOf(Dedup.qReachability(spark, sf))

    val persistedBefore = spark.sparkContext.getPersistentRDDs.keySet
    val (sharedSweep, sharedReach) = Dedup.withSharedPairs(spark, sf) {
      // the ONE build: materialized at scope entry, served by identity
      assert(Dedup.jaccardPairs(spark, sf) eq Dedup.jaccardPairs(spark, sf),
        "inside the scope, every consumer must get the same built frame")
      assert(
        (spark.sparkContext.getPersistentRDDs.keySet -- persistedBefore)
          .nonEmpty,
        "the shared build must checkpoint at scope entry")
      (rowsOf(Dedup.qThresholdSweep(spark, sf)),
        rowsOf(Dedup.qReachability(spark, sf)))
    }
    assert(sharedSweep === soloSweep)
    assert(sharedReach === soloReach)
    // scope exit restores standalone behavior (cache entry removed)
    assert(!(Dedup.jaccardPairs(spark, sf) eq Dedup.jaccardPairs(spark, sf)))
    // and is freshly enterable
    Dedup.withSharedPairs(spark, sf)(())
    // free consumer-side checkpoints so later suites start clean
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  test("re-entrancy per (session, dir) is rejected") {
    intercept[IllegalArgumentException] {
      Dedup.withSharedPairs(spark, sf) {
        Dedup.withSharedPairs(spark, sf)(())
      }
    }
  }
}
