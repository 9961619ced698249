// Isolated per-query timing (vs graft.Bench's full sweep): separates a
// query's own cost from long-run GC/page-cache contention.
// Usage: cp tools/TimeQ.scala src/test/scala/graft/ &&
//   sbt "Test/runMain graft.TimeQ <sfDir> <query> [query ...]" && rm ...
package graft

object TimeQ30 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("timeq")
    val d = args(0)
    for (name <- args.drop(1); rep <- 1 to 2) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, d).write.format("noop").mode("overwrite").save()
      println(f"[timeq] $name rep$rep ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
