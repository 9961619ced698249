package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.MinHash

/** Throwaway round-16 stage decomposition probe (not registered;
  * deleted before round end). Times the jaccard pair-build stages. */
object ProbeR16 {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = GraftSession.getOrCreate("probe-r16")
    import s.implicits._
    SparkEntry.entry(s).write.format("noop").mode("overwrite").save()
    def time(nm: String)(f: => Unit): Unit = {
      (1 to 2).foreach { rep =>
        s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
        val t0 = System.nanoTime()
        f
        println(f"[probe] $nm rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(s, d)
    val nPart = s.conf.get("spark.sql.shuffle.partitions").toInt

    def posting = docs
      .select($"doc_id",
        array_distinct(MinHash.shingleHash60(tokens($"text"), operators.Dedup.JaccardN)).as("shs"))
      .select($"doc_id", size($"shs").cast("long").as("n"), explode($"shs").as("s"))

    time("0 posting project+explode (no shuffle)") { noop(posting) }
    time("1 + localClustered checkpoint") {
      noop(graft.functions.Cp.localClustered(posting, nPart, Seq("s")))
    }
    time("2 full pair build") {
      noop(operators.Dedup.jaccardPairsOf(docs))
    }
    time("3 pair build + CC") {
      val pr = operators.Dedup.jaccardPairsOf(docs)
        .filter(lit(3) * $"inter" > $"na" + $"nb")
        .select($"doc_a", $"doc_b")
      noop(operators.Dedup.connectedComponents(pr))
    }

    // ---- curate_full stage decomposition (no unpersist between:
    // stages feed each other's checkpoints) ----
    def timeKeep(nm: String)(f: => Unit): Unit = (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      f
      println(f"[probe] $nm rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    import graft.functions.Cp
    val CfMinTokens = 30
    def c0 = docs.select($"doc_id", $"source", $"lang", $"text",
      size(tokens($"text")).cast("long").as("ntok"))
    timeKeep("cf c0 scan+tokens") { noop(c0) }
    var c1: org.apache.spark.sql.DataFrame = null
    timeKeep("cf c1 ckpt") { c1 = Cp.local(c0.filter($"ntok" >= CfMinTokens)) }
    var c2: org.apache.spark.sql.DataFrame = null
    timeKeep("cf c2 fp-window ckpt (off c1)") {
      val wFp = org.apache.spark.sql.expressions.Window
        .partitionBy(fingerprint($"text")).orderBy($"doc_id".asc)
      c2 = Cp.local(c1.withColumn("_fpr", row_number().over(wFp))
        .filter($"_fpr" === 1).drop("_fpr"))
    }
    var c3: org.apache.spark.sql.DataFrame = null
    timeKeep("cf c3 span-trim ckpt (off c2)") {
      c3 = Cp.local(operators.TextAnalysis.trimmedDocsOf(c2)
        .select($"doc_id", $"source", $"lang",
          concat_ws(" ", $"kept").as("text"),
          size($"kept").cast("long").as("ntok"))
        .filter($"ntok" >= CfMinTokens))
    }
    timeKeep("cf stage4 pairs+CC+join (off c2/c3)") {
      val pr = operators.Dedup.jaccardPairsOf(c2.select($"doc_id", $"text"))
      val surv = c3.select($"doc_id")
      val e4 = pr.filter(lit(3) * $"inter" > $"na" + $"nb")
        .join(surv.select($"doc_id".as("doc_a")).hint("merge"),
          Seq("doc_a"), "left_semi")
        .join(surv.select($"doc_id".as("doc_b")).hint("merge"),
          Seq("doc_b"), "left_semi")
        .select($"doc_a", $"doc_b")
      val lab4 = operators.Dedup.connectedComponents(e4)
      noop(lab4)
    }
    timeKeep("cf stage5 dsir (off c3 as c4 stand-in)") {
      val sel = operators.Sampling.dsirSelectFrom(
        operators.Sampling.dsirScored(c3.select($"doc_id", $"lang", $"text")),
        1000)
      noop(sel)
    }
    s.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
    System.gc()
    time("cf full qCurateFull") {
      noop(operators.Curate.qCurateFull(s, d))
    }
    s.stop()
  }
}
