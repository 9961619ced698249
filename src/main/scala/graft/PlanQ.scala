package graft

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round evidence trail (plans/rN/<query>_<suffix>.txt).
  * Usage: tools/run.sh graft.PlanQ <sfDir> <outDir> <suffix> <query>...
  */
object PlanQ {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, suffix, names @ _*) = args.toSeq.toArray
    val spark = GraftSession.getOrCreate("graft-planq")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(s"[planq] wrote $n")
    }
    spark.stop()
  }
}
