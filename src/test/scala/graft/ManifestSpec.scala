package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.ManifestTable

class ManifestSpec extends AnyFunSuite {
  import TestSpark._

  private def tmp() =
    Files.createTempDirectory("manifest").toFile.getAbsolutePath

  private def fsRoot(dir: String) = {
    val root = new org.apache.hadoop.fs.Path(dir)
    (root.getFileSystem(spark.sessionState.newHadoopConf()), root)
  }

  /** All data-file paths under dir (recursive, skipping _/. names). */
  private def dataFiles(dir: java.io.File): Seq[String] = {
    val kids = Option(dir.listFiles()).map(_.toSeq).getOrElse(Nil)
      .filterNot(f => f.getName.startsWith("_") || f.getName.startsWith("."))
    kids.filter(_.isFile).filter(_.getName.endsWith(".parquet"))
      .map(_.getAbsolutePath) ++
      kids.filter(_.isDirectory).flatMap(dataFiles)
  }

  test("create/read round-trip and version bookkeeping") {
    import spark.implicits._
    val dir = tmp()
    ManifestTable.create(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    val (fs, root) = fsRoot(dir)
    assert(ManifestTable.version(fs, root) === 1L)
    assert(ManifestTable.read(spark, dir).as[(Long, String)]
      .collect().toSet === Set((1L, "a"), (2L, "b")))
    intercept[IllegalArgumentException] {
      ManifestTable.create(spark, Seq((9L, "z")).toDF("id", "v"), dir)
    }
  }

  test("merge commits a new snapshot; old snapshot stays readable (time travel)") {
    import spark.implicits._
    val dir = tmp()
    ManifestTable.create(spark,
      (1L to 100L).map(i => (i, i * 10)).toDF("id", "v"), dir)
    ManifestTable.merge(spark,  dir,
      Seq((7L, 777L), (200L, 2000L)).toDF("id", "v"), "id")
    val now = ManifestTable.read(spark, dir).as[(Long, Long)].collect().toMap
    assert(now.size === 101 && now(7L) === 777L && now(200L) === 2000L
      && now(8L) === 80L)
    // snapshot 1 is intact: the update invisible, the old value back
    val old = ManifestTable.readVersion(spark, dir, 1L)
      .as[(Long, Long)].collect().toMap
    assert(old.size === 100 && old(7L) === 70L && !old.contains(200L))
  }

  test("readChanges returns added-file rows only, never untouched files") {
    import spark.implicits._
    val dir = tmp()
    // two range-disjoint files: merge touches only the low-key file
    val low = (1L to 50L).map(i => (i, i))
    val high = (1001L to 1050L).map(i => (i, i))
    ManifestTable.create(spark, low.toDF("id", "v").repartition(1), dir)
    ManifestTable.merge(spark, dir,
      high.toDF("id", "v").repartition(1), "id") // v2: pure insert
    ManifestTable.merge(spark, dir,
      Seq((7L, 777L)).toDF("id", "v"), "id") // v3: rewrite of the low file
    // since v1: the inserted high file + the rewritten low file
    val since1 = ManifestTable.readChanges(spark, dir, 1L)
      .as[(Long, Long)].collect().toMap
    assert(since1(7L) === 777L && since1(1001L) === 1001L)
    assert(since1.size === 100) // low rewrite (50) + high insert (50)
    // since v2: only the rewritten low file; the high file is untouched
    val since2 = ManifestTable.readChanges(spark, dir, 2L)
      .as[(Long, Long)].collect().toMap
    assert(since2(7L) === 777L && since2.size === 50)
    assert(!since2.contains(1001L), "untouched file must not be re-read")
    // since the current version: empty, schema intact
    val since3 = ManifestTable.readChanges(spark, dir, 3L)
    assert(since3.count() === 0 && since3.columns.toSeq === Seq("id", "v"))
    intercept[IllegalArgumentException] {
      ManifestTable.readChanges(spark, dir, 99L)
    }
  }

  test("reader pinned before a merge keeps its snapshot (no duplicate window)") {
    import spark.implicits._
    val dir = tmp()
    ManifestTable.create(spark,
      (1L to 50L).map(i => (i, i)).toDF("id", "v"), dir)
    val pinned = ManifestTable.read(spark, dir) // resolves v1's files NOW
    ManifestTable.merge(spark, dir, Seq((3L, 999L)).toDF("id", "v"), "id")
    // the pinned frame re-executes against v1's file list: exactly one
    // row per key, old value — never a duplicate or the new value
    val rows = pinned.as[(Long, Long)].collect()
    assert(rows.length === 50 && rows.toMap.apply(3L) === 3L)
  }

  test("merge rewrites only key-range-touched files") {
    import spark.implicits._
    val dir = tmp()
    ManifestTable.create(spark,
      spark.range(0, 400).selectExpr("id", "id * 2 AS v")
        .repartitionByRange(4, $"id"), dir)
    ManifestTable.merge(spark, dir, Seq((7L, 777L)).toDF("id", "v"), "id")
    val (fs, root) = fsRoot(dir)
    assert(ManifestTable.version(fs, root) === 2L)
    val back = ManifestTable.read(spark, dir).as[(Long, Long)].collect().toMap
    assert(back.size === 400 && back(7L) === 777L && back(8L) === 16L)
    // v2 keeps 3 of v1's 4 range-clustered files by name
    def files(v: Long) = ManifestTable.readVersion(spark, dir, v).inputFiles.toSet
    assert((files(1L) intersect files(2L)).size === 3)
  }

  test("racing merges from the same base: exactly one wins, loser cleans up") {
    import spark.implicits._
    val dir = tmp()
    ManifestTable.create(spark, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), dir)
    val (fs, root) = fsRoot(dir)
    // simulate the race: another writer commits v2 after this merge
    // read snapshot v1 — expressed via the compare-and-swap form
    // (expectedBase = 1), which must refuse to land on top of v2
    val winner = new org.apache.hadoop.fs.Path(dir, "_manifest_v2")
    // the winner keeps v1's files verbatim
    val v1Body = new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(
      fs.open(new org.apache.hadoop.fs.Path(dir, "_manifest_v1"))),
      java.nio.charset.StandardCharsets.UTF_8)
    val out = fs.create(winner, false)
    out.write(v1Body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    val before = fs.listStatus(root).count(_.getPath.getName.startsWith("d-"))
    intercept[ManifestTable.ConcurrentCommitException] {
      ManifestTable.merge(spark, dir, Seq((1L, 111L)).toDF("id", "v"), "id",
        expectedBase = 1L)
    }
    // loser deleted its staged files; table still reads as the winner's v2
    assert(ManifestTable.read(spark, dir).as[(Long, Long)].collect().toMap
      === Map(1L -> 10L, 2L -> 20L))
    val stagedLeft = dataFiles(new java.io.File(dir)).toSet
    val referenced = ManifestTable.read(spark, dir).inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
    assert(stagedLeft === referenced, "unreferenced staged files left behind")
    assert(before >= 1)
  }

  test("torn manifest is ignored by readers and removed by vacuum") {
    import spark.implicits._
    val dir = tmp()
    ManifestTable.create(spark, Seq((1L, 10L)).toDF("id", "v"), dir)
    // crashed commit: v2 manifest without the #END terminator
    Files.writeString(java.nio.file.Paths.get(s"$dir/_manifest_v2"),
      "d-dead/part-0.parquet\n")
    val (fs, root) = fsRoot(dir)
    assert(ManifestTable.version(fs, root) === 1L) // torn v2 not trusted
    assert(ManifestTable.read(spark, dir).count() === 1L)
    ManifestTable.vacuum(spark, dir)
    assert(!new java.io.File(s"$dir/_manifest_v2").exists())
    assert(ManifestTable.read(spark, dir).count() === 1L)
  }

  test("torn manifest at the next version does not wedge a later merge") {
    import spark.implicits._
    val dir = tmp()
    ManifestTable.create(spark, Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), dir)
    // crashed committer left a torn _manifest_v2 (no #END): a merge
    // must clear the debris and commit v2 itself, not throw
    // ConcurrentCommitException forever until vacuum
    Files.writeString(java.nio.file.Paths.get(s"$dir/_manifest_v2"),
      "d-dead/part-0.parquet\n")
    ManifestTable.merge(spark, dir, Seq((1L, 111L)).toDF("id", "v"), "id")
    val (fs, root) = fsRoot(dir)
    assert(ManifestTable.version(fs, root) === 2L)
    assert(ManifestTable.read(spark, dir).as[(Long, Long)].collect().toMap
      === Map(1L -> 111L, 2L -> 20L))
  }

  test("schema evolution: a later upsert adds a column, old rows read null") {
    import spark.implicits._
    val dir = tmp()
    ManifestTable.create(spark,
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
    // evolve: new column `score` arrives with an update batch
    ManifestTable.merge(spark, dir,
      Seq((2L, "b2", 0.5), (3L, "c", 0.9)).toDF("id", "v", "score"), "id")
    val now = ManifestTable.read(spark, dir)
      .select($"id", $"v", $"score").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
    assert(now === Set((1L, "a", None), (2L, "b2", Some(0.5)),
      (3L, "c", Some(0.9))))
    // a later batch may OMIT the evolved column — null-filled, not an error
    ManifestTable.merge(spark, dir, Seq((4L, "d")).toDF("id", "v"), "id")
    val v3 = ManifestTable.read(spark, dir)
    assert(v3.count() === 4 &&
      v3.filter($"id" === 4L).select($"score").head().isNullAt(0))
    // pre-evolution snapshot still time-travels with its own schema
    assert(ManifestTable.readVersion(spark, dir, 1L).columns.toSeq
      === Seq("id", "v"))
  }

  test("vacuum drops old snapshots and their unreferenced files") {
    import spark.implicits._
    val dir = tmp()
    ManifestTable.create(spark,
      (1L to 20L).map(i => (i, i)).toDF("id", "v"), dir)
    ManifestTable.merge(spark, dir, Seq((1L, 100L)).toDF("id", "v"), "id")
    ManifestTable.merge(spark, dir, Seq((2L, 200L)).toDF("id", "v"), "id")
    val (fs, root) = fsRoot(dir)
    assert(ManifestTable.version(fs, root) === 3L)
    ManifestTable.vacuum(spark, dir)
    // only the latest snapshot remains…
    intercept[IllegalArgumentException] {
      ManifestTable.readVersion(spark, dir, 1L).count()
    }
    // …its data is intact, and no unreferenced data files survive
    val back = ManifestTable.read(spark, dir).as[(Long, Long)].collect().toMap
    assert(back.size === 20 && back(1L) === 100L && back(2L) === 200L)
    val onDisk = dataFiles(new java.io.File(dir)).toSet
    val referenced = ManifestTable.read(spark, dir).inputFiles
      .map(f => new org.apache.hadoop.fs.Path(f).toUri.getPath).toSet
    assert(onDisk === referenced)
  }

  test("CDC replication: applying readChanges deltas converges a replica to every snapshot") {
    import spark.implicits._
    val primary = tmp(); val replica = tmp()
    def contentOf(path: String): Seq[(Long, Long)] =
      ManifestTable.read(spark, path).as[(Long, Long)]
        .collect().toSeq.sorted
    // v1: two range-disjoint files (so later merges rewrite only one)
    ManifestTable.create(spark,
      (1L to 40L).map(i => (i, i)).toDF("id", "v").repartition(1), primary)
    ManifestTable.merge(spark, primary,
      (1001L to 1040L).map(i => (i, i)).toDF("id", "v").repartition(1), "id")
    val (pfs, proot) = fsRoot(primary)
    // initial seed: full copy, remember the synced version
    var synced = ManifestTable.version(pfs, proot)
    ManifestTable.create(spark, ManifestTable.read(spark, primary), replica)
    assert(contentOf(replica) === contentOf(primary))
    // a few primary mutations: update, insert, update
    ManifestTable.merge(spark, primary, Seq((7L, 700L)).toDF("id", "v"), "id")
    ManifestTable.merge(spark, primary,
      (2001L to 2010L).map(i => (i, i)).toDF("id", "v"), "id")
    ManifestTable.merge(spark, primary, Seq((1005L, -5L)).toDF("id", "v"), "id")
    // sync: changed-file rows since the last synced version, key-merged.
    // Deltas carry whole rewritten files (changed + co-located rows);
    // the key-merge makes re-applying co-located rows idempotent.
    ManifestTable.upsert(spark,
      ManifestTable.readChanges(spark, primary, synced), replica, "id")
    assert(contentOf(replica) === contentOf(primary))
    // second round, including an update of a previously-synced insert
    synced = ManifestTable.version(pfs, proot)
    ManifestTable.merge(spark, primary, Seq((2001L, 0L)).toDF("id", "v"), "id")
    ManifestTable.upsert(spark,
      ManifestTable.readChanges(spark, primary, synced), replica, "id")
    assert(contentOf(replica) === contentOf(primary))
    // replaying the SAME delta is a no-op (at-least-once delivery safe)
    val before = contentOf(replica)
    ManifestTable.upsert(spark,
      ManifestTable.readChanges(spark, primary, synced), replica, "id")
    assert(contentOf(replica) === before)
  }

  test("compact packs small files into a new snapshot; data and history intact") {
    import spark.implicits._
    val dir = tmp()
    // accrete many tiny files, the streaming-sink pattern
    ManifestTable.create(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    (2L to 8L).foreach { i =>
      ManifestTable.upsert(spark, Seq((i, s"v$i")).toDF("id", "v"), dir, "id")
    }
    val (fs, root) = fsRoot(dir)
    val vBefore = ManifestTable.version(fs, root)
    val before = ManifestTable.read(spark, dir)
      .as[(Long, String)].collect().toSet
    val filesBefore = dataFiles(new java.io.File(dir)).size
    assert(ManifestTable.compact(spark, dir)) // tiny files → packs
    // data identical, snapshot advanced, far fewer files planned
    assert(ManifestTable.version(fs, root) === vBefore + 1)
    assert(ManifestTable.read(spark, dir)
      .as[(Long, String)].collect().toSet === before)
    val planned = ManifestTable.read(spark, dir).inputFiles.length
    assert(planned < filesBefore && planned >= 1)
    // time travel: the pre-compact snapshot still reads identically
    assert(ManifestTable.readVersion(spark, dir, vBefore)
      .as[(Long, String)].collect().toSet === before)
    // convergence: everything already packed → no-op, no new version
    assert(!ManifestTable.compact(spark, dir))
    assert(ManifestTable.version(fs, root) === vBefore + 1)
    // vacuum reclaims the replaced originals
    ManifestTable.vacuum(spark, dir)
    assert(ManifestTable.read(spark, dir)
      .as[(Long, String)].collect().toSet === before)
    assert(dataFiles(new java.io.File(dir)).size === planned)
  }

  test("compact converges when the pack emits MULTIPLE below-target files") {
    import spark.implicits._
    // totalSmall > targetBytes → the pack emits nOut ≥ 2 files each
    // BELOW targetBytes; before round 11's guard every periodic
    // compact re-packed the same data forever (unbounded version
    // churn in the streaming-ingest maintenance loop)
    val dir = tmp()
    val md = java.security.MessageDigest.getInstance("MD5")
    def blob(i: Long): String = // ~4 KB unique, incompressible-ish
      (0 until 128).map { j =>
        md.digest(s"$i-$j".getBytes("UTF-8")).map("%02x".format(_)).mkString
      }.mkString
    ManifestTable.create(spark, Seq((1L, blob(1))).toDF("id", "v"), dir)
    (2L to 6L).foreach { i =>
      ManifestTable.upsert(spark, Seq((i, blob(i))).toDF("id", "v"), dir, "id")
    }
    val (fs, root) = fsRoot(dir)
    val before = ManifestTable.read(spark, dir)
      .as[(Long, String)].collect().toSet
    val target = 10L << 10 // 10 KiB: total ≈ 25 KB → nOut ≥ 2
    assert(ManifestTable.compact(spark, dir, target))
    // convergence within a bounded number of rounds, then a hard stop
    var rounds = 0
    while (ManifestTable.compact(spark, dir, target) && rounds < 5) rounds += 1
    assert(rounds < 5, "compact must converge, not churn versions forever")
    val vStable = ManifestTable.version(fs, root)
    assert(!ManifestTable.compact(spark, dir, target))
    assert(ManifestTable.version(fs, root) === vStable, "no-op must not commit")
    // the interesting case: convergence with ≥ 2 files still below
    // target (the old `small.size <= 1` check would spin here)
    val sizes = ManifestTable.read(spark, dir).inputFiles
      .map(f => new java.io.File(new java.net.URI(f).getPath).length)
    assert(sizes.count(_ < target) >= 2,
      s"test setup should leave ≥2 below-target files, got ${sizes.toList}")
    assert(ManifestTable.read(spark, dir)
      .as[(Long, String)].collect().toSet === before)
  }

  test("readWhere prunes files by footer key range and still filters rows") {
    import spark.implicits._
    val dir = tmp()
    // 4 range-clustered files: ids 1–1000 split into disjoint ranges
    ManifestTable.create(spark,
      (1L to 1000L).map(i => (i, i * 10)).toDF("id", "v")
        .repartitionByRange(4, $"id"), dir)
    val total = ManifestTable.read(spark, dir).inputFiles.length
    assert(total === 4)
    // a narrow key range plans a strict subset of the snapshot's files…
    val pruned = ManifestTable.readWhere(spark, dir, "id", 10L, 20L)
    assert(pruned.inputFiles.length < total)
    // …and the result equals the unpruned filter exactly
    assert(pruned.as[(Long, Long)].collect().toSet ===
      (10L to 20L).map(i => (i, i * 10)).toSet)
    // open-ended bounds work; a miss range reads nothing but keeps schema
    assert(ManifestTable.readWhere(spark, dir, "id", 990L, null)
      .count() === 11L)
    val miss = ManifestTable.readWhere(spark, dir, "id", 5000L, 6000L)
    assert(miss.inputFiles.length <= 1 && miss.count() === 0L &&
      miss.columns.toSeq === Seq("id", "v"))
    // pruning survives a merge (new files get footer stats too)
    ManifestTable.merge(spark, dir, Seq((15L, 999L)).toDF("id", "v"), "id")
    val after = ManifestTable.readWhere(spark, dir, "id", 10L, 20L)
    assert(after.inputFiles.length <
      ManifestTable.read(spark, dir).inputFiles.length)
    assert(after.filter($"id" === 15L).select($"v").as[Long].head() === 999L)
  }
}
