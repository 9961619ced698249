package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Mechanics of the partitioning-preserving checkpoints
  * (Cp.localClustered / Cp.localClusteredAs / Bridge.claimClustered):
  * results must be bit-identical to the plain checkpoint path, the
  * declared layout must actually eliminate exchanges (and sorts, when
  * order is declared) for same-key consumers INCLUDING self-joins
  * (LogicalRDD.newInstance must remap the partitioning attributes on
  * dedup — if Spark ever stops doing that, the exchange reappears and
  * this spec fails before a silent perf regression ships), and a
  * false/misapplied claim must be rejected loudly. */
class ClusteredCpSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def mkDf = spark.range(0, 5000)
    .select((col("id") % 97).as("k"), col("id").as("v"))

  test("localClustered: identical rows, zero-exchange agg and self-join") {
    val plain = graft.functions.Cp.local(mkDf)
    val clus = graft.functions.Cp.localClustered(mkDf.toDF(), 8, Seq("k"))
    assert(clus.collect().map(_.toString).sorted.toSeq ===
      plain.collect().map(_.toString).sorted.toSeq)
    val aggPlan = clus.groupBy($"k").agg(count(lit(1)).as("n"))
      .queryExecution.sparkPlan.toString
    assert(!aggPlan.contains("Exchange hashpartitioning"),
      s"same-key agg re-shuffled a clustered checkpoint:\n$aggPlan")
    val j = clus.as("a").join(clus.as("b").hint("merge"), "k")
    val jPlan = j.queryExecution.sparkPlan.toString
    assert(!jPlan.contains("Exchange hashpartitioning"),
      s"co-partitioned self-join re-shuffled:\n$jPlan")
    assert(j.count() ===
      plain.as("a").join(plain.as("b").hint("merge"), "k").count())
  }

  test("localClusteredAs sorted: merge self-join needs no exchange and no sort") {
    val base = graft.functions.Cp.localClustered(mkDf.toDF(), 8, Seq("k"))
    // the production shape: a merge semi-join inherits the clustering
    // and leaves its streamed side ascending on the key
    val rare = base.groupBy($"k").agg(count(lit(1)).as("c"))
      .filter($"c" >= 1).select($"k")
    val dsr = graft.functions.Cp.localClusteredAs(
      base.join(rare.hint("merge"), Seq("k"), "left_semi"),
      8, Seq("k"), sorted = true)
    val j = dsr.as("a").join(dsr.as("b").hint("merge"), "k")
    val jPlan = j.queryExecution.sparkPlan.toString
    assert(!jPlan.contains("Exchange hashpartitioning"),
      s"sorted-clustered self-join re-shuffled:\n$jPlan")
    assert(!jPlan.contains("Sort ["),
      s"sorted-clustered merge self-join re-sorted:\n$jPlan")
    assert(j.count() ===
      base.as("a").join(base.as("b").hint("merge"), "k").count())
  }

  test("claims are rejected on non-checkpointed frames and wrong partition counts") {
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.Bridge.claimClustered(mkDf.toDF(), 8, Seq("k"))
    }
    val ck = graft.functions.Cp.local(mkDf.repartition(8, col("k"))).toDF()
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.Bridge.claimClustered(ck, 16, Seq("k"))
    }
    intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.Bridge.claimClustered(ck, 8, Seq("nope"))
    }
  }
}
