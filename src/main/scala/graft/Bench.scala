package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Queries are fully materialized through the `noop` sink — `count()`
  * would let Catalyst prune unevaluated projections and under-measure.
  *
  * Every query runs ONCE untimed before its timed reps: first
  * execution absorbs JIT, whole-stage-codegen compilation and GC noise
  * (round-1 data: 80 s cold vs 31 s warm for the same plans), so a
  * cold rep=1 run measures the JVM, not the engine. The reported
  * number is the steady-state a long-running cluster job sees.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-bench")
    // session warmup: JIT/codegen + parquet footers for every table
    SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    // SPARK_GRAFT_BENCH_REPS > 1 reports the min of N timed runs
    // (steadier still when the machine is noisy); default 1.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "1").toInt.max(1)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (0 to reps).map { rep =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name: $e"); -1.0
        }
      }.drop(1) // rep 0 is the per-query warmup, never reported
      // a failure anywhere marks the query failed (-1) in the JSON —
      // a broken query must not read as a fast one
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
