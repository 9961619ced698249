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
  *
  * The FINAL printed line is SIZE-BOUNDED (~1.9 KB): the harness that
  * consumes it keeps only the last 2000 chars of the process output
  * (measured: every BENCH_r*.json `tail` is exactly 2000 chars), and
  * a line carrying all ~258 queries at full double precision (~6 KB)
  * would get its head truncated and become unparseable — which is
  * exactly what happened to rounds 1–3. The final line reports the
  * total, EVERY query's timing as the compact `qms` integer array
  * (name-ascending order, unit declared in `qms_unit`), plus every
  * failed query and the slowest queries by name in the remaining
  * budget. The COMPLETE per-query NAMED map is also emitted two ways: (a)
  * written to BENCH_FULL.json next to the cwd (committed per round —
  * the durable history), and (b) printed as self-contained CHUNK
  * lines (`"metric":"chunk"`) immediately before the final line, so
  * a consumer that captures full stdout can reassemble all 258
  * timings without the repo checkout; a tail-only consumer still
  * parses the final line unchanged.
  */
object Bench {
  private def fmt(d: Double): String =
    if (d < 0) "-1" else String.format(java.util.Locale.ROOT, "%.3f", Double.box(d))

  /** 1-minute loadavg, read at sweep start and end and stamped into
    * every emitted artifact: per-query driver-sweep timings on this
    * shared host carry ±25%+ ambient variance (page cache, co-tenant
    * load — BASELINE.md documents the envelope), and every judged
    * round has had to re-derive "is this regression real or ambient"
    * from scratch. The stamp settles it at the artifact: a sweep whose
    * start/end loadavg is far above the query parallelism ran dirty,
    * and its per-query ratios are ambient until re-measured isolated. */
  private def loadavg1m(): Double =
    try java.nio.file.Files.readString(
      java.nio.file.Paths.get("/proc/loadavg")).split(" ")(0).toDouble
    catch { case _: Throwable => -1.0 }

  def main(args: Array[String]): Unit = {
    val loadStart = loadavg1m()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var spark = GraftSession.getOrCreate("graft-bench")
    // session warmup: JIT/codegen + parquet footers for every table
    def warm(s: org.apache.spark.sql.SparkSession): Unit =
      SparkEntry.entry(s).write.format("noop").mode("overwrite").save()
    warm(spark)
    // SPARK_GRAFT_BENCH_REPS reports the min of N timed runs. Default
    // is 2: reps=1 numbers on a shared host carry ±40% fixed-overhead
    // variance on sub-2 s queries (round-9 lesson — the regression scan
    // chased pure noise), while min-of-2 matches the BASELINE.md
    // discipline, so driver artifacts compare like-for-like.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt.max(1)
    // SPARK_GRAFT_BENCH_ONLY=q_a,q_b restricts the sweep — for targeted
    // scale evidence (e.g. new queries at sf10) without paying the full
    // suite; the round artifact always runs unfiltered.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = only.fold(SparkEntry.queries) { names =>
      val unknown = names -- SparkEntry.queries.keySet
      require(unknown.isEmpty, s"BENCH_ONLY names unknown queries: $unknown")
      SparkEntry.queries.view.filterKeys(names).toMap
    }
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    def writeFull(): Unit = {
      // rewritten after EVERY query: a mid-sweep JVM death (the sf30
      // q_ngram_jaccard OOM, round 12) must not erase the completed
      // queries' timings — the partial map is the evidence trail
      val total = acc.map(_._2).filter(_ >= 0).sum
      val full = acc.map { case (k, v) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
      java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_FULL.json"),
        (s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
         s""""queries":$full,"sf":"$sfDir","n_done":${acc.size},""" +
         s""""loadavg_start":$loadStart,"loadavg_now":${loadavg1m()}}""" + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      def runOnce(): Double = {
        val times = (0 to reps).map { rep =>
          val t0 = System.nanoTime()
          try {
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          } catch { case e: Throwable =>
            System.err.println(s"[bench] $name: $e"); -1.0
          }
        }.drop(1) // rep 0 is the per-query warmup, never reported
        if (times.contains(-1.0)) -1.0 else times.min
      }
      var v = runOnce()
      // In local mode a single task-level OutOfMemoryError STOPS the
      // whole SparkContext (SparkUncaughtExceptionHandler), and every
      // later query then fails with "stopped SparkContext" — 45
      // poisoned -1 entries in the round-12 sf30 sweep. A real driver
      // restarts the app; mirror that: recreate the session, re-warm,
      // and retry THIS query once on the fresh JVM state. A query that
      // fails again on a clean session is genuinely broken (-1); a
      // query that only died of a predecessor's corpse is not.
      if (v == -1.0 && spark.sparkContext.isStopped) {
        System.err.println(
          s"[bench] $name: context stopped — new session, one retry")
        spark = GraftSession.getOrCreate("graft-bench")
        warm(spark)
        v = runOnce()
      }
      // free localCheckpoint blocks between queries (outside the timed
      // region): the dedup family pins checkpointed RDDs that the
      // ContextCleaner only drops on GC, and 127 queries of accumulated
      // blocks tax storage memory for everything downstream (the round-7
      // q_json_path 0.4→3.0 s sweep anomaly). Each query still pays its
      // OWN checkpoint cost inside its timed reps. BLOCKING: async
      // unpersist let multi-GB sf30 checkpoint blocks from prior
      // queries ride into the next query's heap (round-12 sweep OOM).
      if (!spark.sparkContext.isStopped)
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      // broadcast hash relations (one per broadcast join, ~150 queries
      // of them) are reaped by the ContextCleaner only after a DRIVER
      // GC notices the weak refs; nudge it so they don't squat in
      // storage memory for the rest of the sweep (outside timed region)
      System.gc()
      val r = name -> v
      acc += r
      writeFull()
      r
    }
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.filter(_._2 < 0)
    // ALL queries' timings in the final line itself (round-13 verdict
    // item: n_reported must equal n_queries): full names don't fit the
    // 2000-char tail (names alone are 3.3 KB), so `qms` carries every
    // timing as an integer (-1 = failed) in ASCENDING NAME ORDER —
    // ~1.1 KB for 260 queries at sf0.1. A consumer recovers the names
    // by sorting the query registry (SURVEY §2 / SparkEntry.queries)
    // ascending. Unit is milliseconds; if big-SF magnitudes blow the
    // tail budget the unit degrades to deciseconds (declared in
    // qms_unit — 0.1 s resolution is fine once queries run 10 s+).
    val byName = results.sortBy(_._1)
    def qmsArr(mult: Double): String = byName
      .map { case (_, v) => if (v < 0) "-1" else math.round(v * mult).toString }
      .mkString("[", ",", "]")
    val lineCap = 1950 // whole final line must survive the 2000-char tail
    var qmsUnit = "ms"
    var qms = qmsArr(1000)
    if (qms.length > lineCap - 420) { qmsUnit = "ds"; qms = qmsArr(10) }
    // named `queries` object for readability: failures first (never
    // hidden), then slowest-first under whatever budget the full qms
    // array leaves in the line
    val loadEnd = loadavg1m()
    def lineWith(qsObj: String, nNamed: Int): String =
      s"""{"metric":"total","value":${fmt(total)},"unit":"sec","reps":$reps,""" +
      s""""queries":$qsObj,""" +
      s""""qms":$qms,"qms_order":"name_asc","qms_unit":"$qmsUnit",""" +
      s""""sf":"$sfDir","n_queries":${results.size},"n_failed":${failed.size},""" +
      s""""n_reported":${byName.size},"n_named":$nNamed,""" +
      s""""loadavg":[${fmt(loadStart)},${fmt(loadEnd)}],""" +
      s""""full":"BENCH_FULL.json"}"""
    val budget = lineCap - lineWith("{}", results.size).length
    val byCost = results.filter(_._2 >= 0).sortBy(-_._2)
    val picked = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var used = 2
    (failed ++ byCost).foreach { case (k, v) =>
      val w = k.length + fmt(v).length + 4
      if (used + w <= budget) { picked += ((k, v)); used += w }
    }
    val qs = picked.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val line = lineWith(qs, picked.size)
    // The harness keeps only the TAIL of the combined process output;
    // rounds 6-7 lost the JSON line because WARN chatter (WindowExec,
    // shutdown hooks) printed AFTER it. Silence ALL logging — the
    // SparkContext level and the log4j2 root logger (shutdown hooks log
    // through the root logger after main returns) — before emitting.
    spark.sparkContext.setLogLevel("OFF")
    org.apache.logging.log4j.core.config.Configurator.setRootLevel(
      org.apache.logging.log4j.Level.OFF)
    spark.stop()
    // after stop() so no Spark shutdown chatter can follow it on stdout.
    // Chunk lines first (full 258-query map for full-stdout consumers),
    // final bounded line LAST (the tail-parse contract).
    val all = results.sortBy(_._1)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
    val chunks = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[String])
    all.foreach { s =>
      if (chunks.last.map(_.length + 1).sum + s.length > 1700)
        chunks += scala.collection.mutable.ArrayBuffer.empty[String]
      chunks.last += s
    }
    chunks.zipWithIndex.foreach { case (c, i) =>
      println(s"""{"metric":"chunk","i":${i + 1},"of":${chunks.size},""" +
        s""""reps":$reps,"sf":"$sfDir","queries":${c.mkString("{", ",", "}")}}""")
    }
    println(line)
    System.out.flush()
  }
}
