package graft

/** Isolated per-query benchmark: `tools/run.sh graft.IsoBench <sfDir>
  * <query>...` warms the session once, then times each named query for
  * SPARK_GRAFT_BENCH_REPS (default 3) reps, printing every rep — the
  * tool for diagnosing sweep-vs-isolated anomalies (a sweep number
  * carries page-cache and codegen-cache state from 126 other queries;
  * this one carries only the session warmup).
  */
object IsoBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else SparkEntry.queries.keys.toSeq.sorted
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt.max(1)
    val spark = GraftSession.getOrCreate("graft-iso")
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val ts = (0 until reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[iso] $n: ${ts.map(t => f"$t%.3f").mkString(", ")} " +
        f"(min ${ts.min}%.3f)")
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.sparkContext.setLogLevel("OFF")
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.OFF)
    spark.stop()
  }
}
