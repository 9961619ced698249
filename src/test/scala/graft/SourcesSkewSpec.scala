package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.Skew
import graft.sources.Sources

class SourcesSkewSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp(prefix: String) =
    Files.createTempDirectory(prefix).toFile.getAbsolutePath

  test("csv and json-lines round-trip with explicit schema") {
    import spark.implicits._
    val dir = tmp("src")
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.csv"),
      "id,name\n1,alpha\n2,beta\nbad,gamma\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/t.jsonl"),
      """{"id":1,"name":"alpha"}""" + "\n" + """{"id":2,"name":"beta"}""" + "\n")
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val c = Sources.csv(spark, s"$dir/t.csv", schema)
    assert(c.count() === 3) // permissive: bad row kept with null id
    assert(c.filter($"id".isNull).count() === 1)
    val j = Sources.jsonLines(spark, s"$dir/t.jsonl", schema)
    assert(j.as[(Long, String)].collect().toSet === Set((1L, "alpha"), (2L, "beta")))
  }

  test("orc round-trips with pushdown intact") {
    import spark.implicits._
    val dir = tmp("orc")
    Sources.writeOrc(Tables.lineitem(spark, sf), s"$dir/li")
    val back = Sources.orc(spark, s"$dir/li").filter($"l_quantity" > 45.0)
      .select($"l_orderkey", $"l_quantity")
    assert(back.count() ===
      Tables.lineitem(spark, sf).filter($"l_quantity" > 45.0).count())
    val scan = back.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters") && scan.contains("l_quantity"), scan)
  }

  test("partitioned write prunes directories on read") {
    import spark.implicits._
    val dir = tmp("part")
    Tables.nation(spark, sf)
      .transform(df => { Sources.writePartitioned(df, dir, Seq("n_regionkey")); df })
    val back = Sources.parquet(spark, dir).filter($"n_regionkey" === 0)
    assert(back.count() > 0)
    assert(new java.io.File(dir).listFiles().exists(_.getName.startsWith("n_regionkey=")))
    // partition pruning reaches the scan: the filter appears as a
    // PartitionFilter, not a data filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(n_regionkey"), plan)
  }

  test("compaction collapses many small files into few, losslessly") {
    import spark.implicits._
    val dir = tmp("compact")
    // fragment lineitem into many tiny files
    Tables.lineitem(spark, sf).repartition(64).write.parquet(s"$dir/frag")
    assert(new java.io.File(s"$dir/frag").listFiles()
      .count(_.getName.endsWith(".parquet")) === 64)
    Sources.compact(spark, s"$dir/frag", s"$dir/out", targetFileMB = 256)
    val outFiles = new java.io.File(s"$dir/out").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(outFiles < 8, s"expected few files, got $outFiles")
    assert(spark.read.parquet(s"$dir/out").count() ===
      Tables.lineitem(spark, sf).count())
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    import spark.implicits._
    val dir = tmp("dpo")
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L))
      .toDF("id", "pk", "v")
    Sources.writePartitioned(base, dir, Seq("pk"))
    // rewrite ONLY partition b with new contents
    val patch = Seq((9L, "b", 99L)).toDF("id", "pk", "v")
    Sources.overwritePartitions(patch, dir, Seq("pk"))
    val back = Sources.parquet(spark, dir)
      .select($"id", $"pk", $"v").as[(Long, String, Long)].collect().toSet
    assert(back === Set((1L, "a", 10L), (2L, "a", 20L), (9L, "b", 99L)))
  }

  test("mergeByKey upserts within touched partitions, inserts new ones") {
    import spark.implicits._
    val dir = tmp("merge")
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
      .toDF("id", "pk", "v")
    Sources.writePartitioned(base, dir, Seq("pk"))
    // update id=3 (partition b), insert id=9 (partition b) and id=7 (new partition c)
    val updates = Seq((3L, "b", 33L), (9L, "b", 99L), (7L, "c", 70L))
      .toDF("id", "pk", "v")
    Sources.mergeByKey(spark, dir, updates, "id", Seq("pk"))
    val back = Sources.parquet(spark, dir)
      .select($"id", $"pk", $"v").as[(Long, String, Long)].collect().toSet
    assert(back === Set(
      (1L, "a", 10L), (2L, "a", 20L),            // partition a untouched
      (3L, "b", 33L), (4L, "b", 40L), (9L, "b", 99L), // b merged
      (7L, "c", 70L)))                           // c inserted
  }

  test("mergeRows: a key that CHANGES partition leaves no old row behind") {
    import spark.implicits._
    val dir = tmp("mrows")
    val base = Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "b", 40L))
      .toDF("id", "pk", "v")
    Sources.writePartitioned(base, dir, Seq("pk"))
    // id=3 moves from partition b to partition c; id=9 is a plain insert
    val updates = Seq((3L, "c", 33L), (9L, "a", 99L)).toDF("id", "pk", "v")
    Sources.mergeRows(spark, dir, updates, "id", Seq("pk"))
    val back = Sources.parquet(spark, dir)
      .select($"id", $"pk", $"v").as[(Long, String, Long)].collect().toSet
    assert(back === Set(
      (1L, "a", 10L), (2L, "a", 20L), (4L, "b", 40L),
      (3L, "c", 33L), // moved: exactly one row, in the NEW partition
      (9L, "a", 99L)))
    // and specifically: no stale id=3 row under pk=b
    assert(Sources.parquet(spark, dir).filter($"id" === 3L).count() === 1L)
    // no staging residue visible or present
    assert(!new java.io.File(dir).listFiles().exists(_.getName.startsWith("_staging")))
  }

  test("mergeRows rewrites only files whose key range is touched") {
    import spark.implicits._
    val dir = tmp("mprune")
    // range-clustered layout: 4 files with disjoint id ranges
    spark.range(0, 400).select($"id", ($"id" * 2).as("v"))
      .repartitionByRange(4, $"id")
      .write.mode("overwrite").parquet(dir)
    def dataFiles() = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
      .map(_.getName).toSet
    val before = dataFiles()
    assert(before.size === 4)
    // one update key → exactly one file's range contains it
    Sources.mergeRows(spark, dir, Seq((7L, 777L)).toDF("id", "v"), "id")
    val after = dataFiles()
    // untouched files survive BY NAME (never rewritten); exactly one
    // old file was replaced by exactly one staged file
    assert((before intersect after).size === 3)
    assert((after -- before).size === 1)
    val back = Sources.parquet(spark, dir).select($"id", $"v")
      .as[(Long, Long)].collect().toMap
    assert(back.size === 400 && back(7L) === 777L && back(8L) === 16L)
  }

  test("mergeRows inserts all-new keys and handles string keys") {
    import spark.implicits._
    val dir = tmp("mstr")
    Seq(("alpha", 1L), ("beta", 2L)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    Sources.mergeRows(spark, dir, Seq(("beta", 22L), ("gamma", 3L)).toDF("k", "v"), "k")
    val back = Sources.parquet(spark, dir).as[(String, Long)].collect().toSet
    assert(back === Set(("alpha", 1L), ("beta", 22L), ("gamma", 3L)))
    // disjoint new keys only: nothing to rewrite, pure insert
    val before = new java.io.File(dir).listFiles().map(_.getName).toSet
    Sources.mergeRows(spark, dir, Seq(("zzz", 9L)).toDF("k", "v"), "k")
    assert(Sources.parquet(spark, dir).count() === 4)
    assert(new java.io.File(dir).listFiles().map(_.getName).toSet.intersect(before)
      .exists(_.endsWith(".parquet")) || before.isEmpty)
  }

  test("recoverMerge rolls FORWARD a crash after the marker, before the move") {
    import spark.implicits._
    val dir = tmp("mcrash1")
    Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val oldFile = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    assert(oldFile.length === 1)
    // hand-build the exact crash state mergeRows leaves when it dies
    // right after publishing the marker: complete staging dir + marker,
    // old files untouched
    val stagingName = "_staging_crash1"
    Seq((1L, 10L), (2L, 222L), (3L, 30L)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$dir/$stagingName")
    Files.writeString(java.nio.file.Paths.get(s"$dir/_merge_pending_crash1"),
      (stagingName +: oldFile.toSeq :+ "#END").mkString("\n"))
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    Sources.recoverMerge(fs, root)
    // merge completed: updated value visible, exactly one row per key,
    // no marker/staging residue
    val back = Sources.parquet(spark, dir).as[(Long, Long)].collect().toSet
    assert(back === Set((1L, 10L), (2L, 222L), (3L, 30L)))
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.startsWith("_merge_pending_")))
    assert(!names.exists(_.startsWith("_staging_")))
  }

  test("recoverMerge completes the delete step after a crash mid-delete") {
    import spark.implicits._
    val dir = tmp("mcrash2")
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val oldFile = new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
    // crash state: staged files already MOVED into the table (staging
    // gone), marker still present, replaced file not yet deleted →
    // duplicate rows for the touched key
    Seq((1L, 10L), (2L, 222L)).toDF("id", "v")
      .coalesce(1).write.parquet(s"$dir/_staging_crash2")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    new java.io.File(s"$dir/_staging_crash2").listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .foreach(f => fs.rename(
        new org.apache.hadoop.fs.Path(f.getAbsolutePath),
        new org.apache.hadoop.fs.Path(dir, "moved-" + f.getName)))
    Files.writeString(java.nio.file.Paths.get(s"$dir/_merge_pending_crash2"),
      ("_staging_crash2" +: oldFile.toSeq :+ "#END").mkString("\n"))
    assert(Sources.parquet(spark, dir).count() === 4) // duplicate window
    Sources.recoverMerge(fs, root)
    val back = Sources.parquet(spark, dir).as[(Long, Long)].collect().toSet
    assert(back === Set((1L, 10L), (2L, 222L)))
  }

  test("recoverMerge sweeps orphan staging and ignores a torn marker") {
    import spark.implicits._
    val dir = tmp("mcrash3")
    Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .write.mode("overwrite").parquet(dir)
    // pre-marker crash: orphan staging dir, no marker
    Seq((2L, 999L)).toDF("id", "v").write.parquet(s"$dir/_staging_orphan")
    // torn marker (no #END terminator): must NOT be acted on — the
    // listed file survives and the marker is discarded
    val aFile = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getAbsolutePath
    Files.writeString(java.nio.file.Paths.get(s"$dir/_merge_pending_torn"),
      "_staging_orphan\n" + aFile) // truncated before the terminator
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    Sources.recoverMerge(fs, root)
    val back = Sources.parquet(spark, dir).as[(Long, Long)].collect().toSet
    assert(back === Set((1L, 10L), (2L, 20L))) // table untouched
    val names = new java.io.File(dir).listFiles().map(_.getName)
    assert(!names.exists(_.startsWith("_staging_")))
    assert(!names.exists(_.startsWith("_merge_pending_")))
  }

  test("lenient parquet read survives a corrupt file in the directory") {
    import spark.implicits._
    val dir = tmp("lenient") + "/data"
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").write.parquet(dir)
    Files.writeString(java.nio.file.Paths.get(s"$dir/part-junk.parquet"),
      "this is not a parquet file")
    val back = Sources.parquetLenient(spark, dir)
    assert(back.count() === 2)
    // and the strict default indeed fails on the same directory
    intercept[org.apache.spark.SparkException] {
      Sources.parquet(spark, dir).count()
    }
  }

  test("regexText parses log lines into named columns, permissively") {
    import spark.implicits._
    val dir = tmp("rex")
    Files.writeString(java.nio.file.Paths.get(s"$dir/a.log"),
      "2026-01-01 GET /index 200\n2026-01-02 POST /api 500\ngarbage line\n")
    val df = Sources.regexText(spark, s"$dir/a.log",
      "^(\\S+) (\\S+) (\\S+) ([0-9]+)$", Seq("day", "verb", "path", "code"))
    val rows = df.as[(String, String, String, String)].collect().toSet
    assert(rows === Set(
      ("2026-01-01", "GET", "/index", "200"),
      ("2026-01-02", "POST", "/api", "500"),
      ("", "", "", "")))
  }

  test("sequence file round-trips key/value pairs") {
    import spark.implicits._
    val dir = tmp("seq")
    val kv = Seq(("k1", "v1"), ("k2", "v2"), ("k3", "v3")).toDF("key", "value")
    Sources.writeSequenceFile(kv, s"$dir/sf")
    val back = Sources.sequenceFile(spark, s"$dir/sf")
      .as[(String, String)].collect().toSet
    assert(back === Set(("k1", "v1"), ("k2", "v2"), ("k3", "v3")))
  }

  test("salted join matches plain join results") {
    import spark.implicits._
    val big = Tables.orders(spark, sf).select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val small = Tables.customer(spark, sf)
      .select($"c_custkey".as("o_custkey"), $"c_name")
    val plain = big.join(small, Seq("o_custkey"))
    val salted = Skew.saltedJoin(big, small, "o_custkey", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.agg(sum($"o_totalprice")).head().getDouble(0)
      === plain.agg(sum($"o_totalprice")).head().getDouble(0))
  }

  test("salted sum equals direct sum") {
    import spark.implicits._
    val df = Tables.orders(spark, sf)
    val direct = df.groupBy($"o_custkey").agg(sum($"o_totalprice").as("s"))
    val salted = Skew.saltedSum(df, "o_custkey", $"o_totalprice", salts = 8)
    val joined = direct.join(salted, Seq("o_custkey"))
    assert(joined.filter(abs($"s" - $"sum_value") > 1e-6).count() === 0)
  }

  test("bucketed tables join with zero shuffle exchanges") {
    import spark.implicits._
    val wh = tmp("wh")
    Sources.writeBucketed(
      Tables.orders(spark, sf).select($"o_custkey", $"o_orderkey", $"o_totalprice"),
      "orders_b", "o_custkey", 4, path = Some(s"$wh/orders_b"))
    Sources.writeBucketed(
      Tables.customer(spark, sf).select($"c_custkey", $"c_name"),
      "cust_b", "c_custkey", 4, path = Some(s"$wh/cust_b"))
    val j = spark.table("orders_b")
      .join(spark.table("cust_b"), $"o_custkey" === $"c_custkey")
    j.count() // materialize so AQE finalizes the plan
    val plan = j.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
  }

  test("LSH near-dup pairs are a subset of brute-force pairs with equal cosines") {
    import spark.implicits._
    val brute = graft.operators.Similarity.qEmbedNearDup(spark, sf)
      .select($"vec_a", $"vec_b", $"cos".as("bcos"))
    // brute is bounded to the vec_id<512 cross-check slice; restrict the
    // LSH side to the same slice (sf0.001 happens to have exactly 500
    // vectors today, but the test must not depend on that)
    val lsh = graft.operators.Similarity.nearDupLsh(spark, sf)
      .filter($"vec_a" < 512 && $"vec_b" < 512)
    assert(lsh.count() > 0)
    val joined = lsh.join(brute, Seq("vec_a", "vec_b"))
    assert(joined.count() === lsh.count()) // subset
    assert(joined.filter($"cos" =!= $"bcos").count() === 0)
  }

  test("key histogram reports descending shares") {
    val h = Skew.keyHistogram(Tables.orders(spark, sf), "o_orderpriority", 5).collect()
    assert(h.nonEmpty)
    assert(h.map(_.getLong(1)).sliding(2).forall(p => p.length < 2 || p(0) >= p(1)))
  }
}
