package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multi-cycle standing-store SOAK (benchmark tooling, not an oracle
  * query): drives ≥3 full ingest cycles — probe → append a novel
  * batch → (compact mid-run) — against the fp / band / anchor stores
  * and reports per-cycle probe seconds plus store growth, to verify
  * the production claim the stores were built on: PROBE TIME STAYS
  * FLAT AS THE STANDING CORPUS GROWS (the probe scales with the
  * batch; the store side streams off its bucketed files).
  *
  * Each cycle appends a derived all-novel batch (batch-slice docs with
  * shifted ids and a per-cycle text suffix — every fingerprint /
  * band signature / anchor hash is new), so the store grows by one
  * batch per cycle while the PROBED batch is held constant; cycle
  * timings are therefore directly comparable. Compaction runs after
  * the middle cycle, mirroring the real lifecycle (appends stack
  * per-bucket files and a store-side re-sort until the next
  * compaction — the mid-run compact shows both regimes in one soak).
  *
  * Usage: tools/run.sh graft.StoreSoak <sfDir> [cycles=3]
  * Output: one JSON line per (family, cycle) + a final summary line.
  */
object StoreSoak {

  private def timed[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val d = args(0)
    val cycles = if (args.length > 1) args(1).toInt else 3
    val spark = GraftSession.builder("graft-storesoak").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val batch = spark.read.parquet(s"$d/documents.parquet")
      .filter(pmod($"doc_id", lit(10)) === 3)
    // a derived ALL-NOVEL batch per cycle: ids shifted out of the key
    // space, a per-cycle token inserted between every word (the
    // ScaleUp universe-token idiom) so EVERY fingerprint, shingle,
    // minhash band, and anchor window is new — each family's store
    // grows by a full batch per cycle
    def novel(c: Int): DataFrame = batch
      .withColumn("doc_id", $"doc_id" + lit(c * 1000000000L))
      .withColumn("text", regexp_replace($"text", " ", s" soak$c "))

    case class Family(name: String, table: String, bucketCol: String,
                      ensure: () => Unit, probe: () => DataFrame,
                      append: DataFrame => Unit)
    val fams = Seq(
      Family("fp", operators.Dedup.fpStoreTable(d), "fp",
        () => { operators.Dedup.ensureFpStore(spark, d); () },
        () => operators.Dedup.qIncrementalDedupStore(spark, d),
        df => operators.Dedup.appendFpStore(spark, d, df)),
      Family("band", operators.Dedup.bandStoreTable(d), "bb",
        () => { operators.Dedup.ensureBandStore(spark, d); () },
        () => operators.Dedup.qNeardupAdmitStore(spark, d),
        df => operators.Dedup.appendBandStore(spark, d, df)),
      Family("anchor", operators.TextAnalysis.anchorStoreTable(d), "h",
        () => { operators.TextAnalysis.ensureAnchorStore(spark, d); () },
        () => operators.TextAnalysis.qSpanAdmitStore(spark, d),
        df => operators.TextAnalysis.appendAnchorStore(spark, d, df)))

    for (f <- fams) {
      spark.sql(s"DROP TABLE IF EXISTS ${f.table}")
      val (_, buildSec) = timed { f.ensure() }
      println(s"""{"family":"${f.name}","cycle":0,"build_sec":$buildSec}""")
      for (c <- 1 to cycles) {
        // probe the CONSTANT batch against the growing store; min of
        // 2 reps (first run also settles AQE / code cache)
        val (_, p1) = timed {
          f.probe().write.format("noop").mode("overwrite").save()
        }
        val (_, p2) = timed {
          f.probe().write.format("noop").mode("overwrite").save()
        }
        val (_, aSec) = timed { f.append(novel(c)) }
        spark.catalog.refreshTable(f.table)
        val rows = spark.table(f.table).count()
        val compacted = c == (cycles + 1) / 2
        val cSec = if (compacted) {
          val (_, t) = timed {
            sources.Sources.compactBucketed(spark, f.table, f.bucketCol,
              operators.Dedup.FpStoreBuckets)
          }
          t
        } else 0.0
        println(s"""{"family":"${f.name}","cycle":$c,""" +
          s""""probe_sec":${math.min(p1, p2)},"append_sec":$aSec,""" +
          s""""store_rows":$rows,"compacted":$compacted,""" +
          s""""compact_sec":$cSec}""")
      }
      // final hygiene check: compact and count files per bucket
      sources.Sources.compactBucketed(spark, f.table, f.bucketCol,
        operators.Dedup.FpStoreBuckets)
      val loc = spark.sql(s"DESCRIBE TABLE EXTENDED ${f.table}")
        .filter($"col_name" === "Location").head.getString(1)
      val fs = new org.apache.hadoop.fs.Path(loc)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(loc))
        .count(_.getPath.getName.startsWith("part-"))
      println(s"""{"family":"${f.name}","final_files":$files,""" +
        s""""buckets":${operators.Dedup.FpStoreBuckets}}""")
    }
    spark.stop()
  }
}
