package graft.sources

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Manifest-committed parquet table: the snapshot-isolation layer that
  * [[Sources.mergeRows]]'s docs promise sits above file-level merge
  * (the Delta/Iceberg core idea, re-derived minimally).
  *
  * A table directory holds immutable parquet data files plus numbered
  * `_manifest_v{N}` files, each the COMPLETE list of data files (paths
  * relative to the table root) that make up snapshot N, terminated by
  * an `#END` line. Readers resolve the highest complete manifest and
  * read exactly its files — never a directory listing — so:
  *
  *  - **Snapshot isolation**: a merge writes new data files and then
  *    commits by creating `_manifest_v{N+1}`; nothing is deleted at
  *    commit time, so a concurrent reader that resolved version N
  *    keeps reading N's files untouched. No duplicate-row or
  *    missing-row window exists at any point — the anomaly
  *    [[Sources.mergeRows]] documents is gone by construction.
  *  - **Atomic commit**: the commit point is the create(overwrite =
  *    false) of the manifest file; two racing merges from the same
  *    base version collide on the same name and exactly one wins
  *    (optimistic concurrency — the loser's data files are deleted
  *    and it throws [[ConcurrentCommitException]] for retry).
  *  - **Crash safety**: a crash before the manifest create leaves only
  *    unreferenced data files (swept by [[vacuum]]); a crash DURING
  *    the manifest write leaves a torn manifest (no `#END`) that
  *    readers and version resolution ignore — the table stays at N.
  *    [[vacuum]] removes torn manifests; it is a maintenance
  *    operation, not to be run concurrently with an in-flight commit.
  *  - **Time travel**: [[readVersion]] reads any retained snapshot.
  *  - **Schema evolution**: an upsert may add columns (pre-evolution
  *    files keep their schema; reads mergeSchema, so old rows surface
  *    the new column as null) or omit existing ones (null-filled).
  *    Changing an existing column's type is rejected at read — the
  *    safe failure.
  *
  * Partition columns are not special here: files are range-clustered
  * by the merge key and pruned via parquet footer stats
  * ([[Sources.touchedFiles]]), which replaces directory-partition
  * pruning. At 100 TB the manifest is one small file per commit and
  * every data file is immutable — exactly the shape object stores
  * want.
  */
object ManifestTable {

  class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

  private val Prefix = "_manifest_v"
  private val End = "#END"

  private def fsOf(s: SparkSession, root: Path): FileSystem =
    root.getFileSystem(s.sessionState.newHadoopConf())

  /** Lines of manifest v if it exists AND is complete (ends with
    * `#END`), else None. */
  private def manifestLines(fs: FileSystem, root: Path, v: Long)
      : Option[Seq[String]] = {
    val p = new Path(root, s"$Prefix$v")
    if (!fs.exists(p)) return None
    val in = fs.open(p)
    val body =
      try new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in),
        java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    val lines = body.split('\n').map(_.trim).filter(_.nonEmpty).toSeq
    if (lines.lastOption.contains(End)) Some(lines.init) else None
  }

  private def allManifestVersions(fs: FileSystem, root: Path): Seq[Long] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).iterator.map(_.getPath.getName)
      .filter(_.startsWith(Prefix))
      .flatMap(n => scala.util.Try(n.stripPrefix(Prefix).toLong).toOption)
      .toSeq.sorted

  /** Highest COMPLETE snapshot version; 0 means no table. Torn
    * manifests (crashed commits) are skipped, not trusted. */
  def version(fs: FileSystem, root: Path): Long =
    allManifestVersions(fs, root).reverse
      .find(v => manifestLines(fs, root, v).isDefined).getOrElse(0L)

  /** The commit: write the complete file list then an `#END` line to
    * `_manifest_v{v}` with overwrite = false — creation of that name
    * IS the atomic commit point; a second committer from the same base
    * version fails here.
    *
    * Only a genuine name collision ([[org.apache.hadoop.fs
    * .FileAlreadyExistsException]], or a generic IOException when the
    * target name now exists) maps to [[ConcurrentCommitException]] —
    * transient IO failures (permissions, quota, network) propagate
    * as-is rather than masquerading as a lost race. A TORN manifest at
    * the target name (crashed committer: file exists, no `#END`) is
    * deleted and the create retried once, so one crash doesn't wedge
    * every later commit until vacuum. */
  private def commit(fs: FileSystem, root: Path, v: Long,
                     relFiles: Seq[String]): Unit = {
    def create() =
      try fs.create(new Path(root, s"$Prefix$v"), false)
      catch {
        case e: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new ConcurrentCommitException(
            s"snapshot v$v was committed concurrently: $e")
        case e: java.io.IOException
            if fs.exists(new Path(root, s"$Prefix$v")) =>
          throw new ConcurrentCommitException(
            s"snapshot v$v was committed concurrently: $e")
      }
    val out =
      try create()
      catch { case e: ConcurrentCommitException =>
        // Complete manifest → real race. Torn → crashed committer's
        // debris: clear it and retry once (a LIVE concurrent writer is
        // indistinguishable from a crashed one mid-write, but it will
        // collide again at close-time visibility or lose the retry —
        // same assumption vacuum already makes).
        if (manifestLines(fs, root, v).isDefined) throw e
        fs.delete(new Path(root, s"$Prefix$v"), false)
        create()
      }
    try out.write((relFiles :+ End).mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def rel(root: Path, abs: String): String = {
    val r = root.toUri.getPath.stripSuffix("/")
    val a = new Path(abs).toUri.getPath
    require(a.startsWith(r + "/"), s"$abs is not under $root")
    a.stripPrefix(r + "/")
  }

  /** Writes `df` as a fresh data-file set under a unique subdir and
    * returns the new files' root-relative paths. */
  private def writeDataFiles(s: SparkSession, root: Path, df: DataFrame)
      : Seq[String] = {
    val dir = new Path(root, s"d-${UUID.randomUUID}")
    df.write.parquet(dir.toString)
    val fs = fsOf(s, root)
    Sources.listDataFiles(fs, dir).map(p => rel(root, p.toString))
  }

  /** Creates the table: data files + manifest v1. Fails if a snapshot
    * already exists. */
  def create(s: SparkSession, df: DataFrame, path: String): Unit = {
    val root = new Path(path)
    val fs = fsOf(s, root)
    require(version(fs, root) == 0L, s"$path already has a snapshot")
    fs.mkdirs(root)
    commit(fs, root, 1L, writeDataFiles(s, root, df))
  }

  /** Latest snapshot. */
  def read(s: SparkSession, path: String): DataFrame = {
    val root = new Path(path)
    readVersion(s, path, version(fsOf(s, root), root))
  }

  /** Time travel: snapshot exactly as of version v. `mergeSchema`
    * because snapshots written before a column was added keep their
    * original file schema — evolution happens at read time (added
    * columns surface as null on pre-evolution files), exactly the
    * Delta/Iceberg contract. */
  def readVersion(s: SparkSession, path: String, v: Long): DataFrame = {
    val root = new Path(path)
    val fs = fsOf(s, root)
    val files = manifestLines(fs, root, v).getOrElse(
      throw new IllegalArgumentException(s"$path has no complete snapshot v$v"))
    s.read.option("mergeSchema", "true")
      .parquet(files.map(f => new Path(root, f).toString): _*)
  }

  /** Pruned snapshot read: plans ONLY the data files whose parquet
    * footer [min,max] range of `key` intersects the inclusive
    * [lower, upper] bound, then applies the same bound as a row filter
    * (a kept file may still hold out-of-range rows). This is the
    * read-side twin of merge's [[Sources.touchedFiles]] pruning: files
    * are range-clustered by the merge key, so a key-range read touches
    * O(matching) files instead of the whole snapshot — the moral
    * equivalent of partition pruning, without directory partitions.
    * `null` bounds are open-ended. Files without footer stats for
    * `key` are conservatively read. At 100 TB this is the difference
    * between a point-lookup reading one file and reading the table;
    * the footer harvest is manifest-sized driver work, amortizable
    * into the manifest itself. */
  def readWhere(s: SparkSession, path: String, key: String,
                lower: Any, upper: Any): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    val root = new Path(path)
    val fs = fsOf(s, root)
    val v = version(fs, root)
    val files = manifestLines(fs, root, v).getOrElse(
      throw new IllegalArgumentException(s"$path has no complete snapshot v$v"))
    val abs = files.map(f => new Path(root, f))
    val ranges = Sources.fileRangesOf(fs, abs, key)
    val kept = Sources.filesInRange(ranges, lower, upper)
    val df =
      if (kept.isEmpty) emptyFrame(s, root, fs, files, v)
      else s.read.option("mergeSchema", "true").parquet(kept: _*)
    val lo = Option(lower).map(l => col(key) >= lit(l))
    val hi = Option(upper).map(h => col(key) <= lit(h))
    (lo.toSeq ++ hi.toSeq).reduceOption(_ && _).map(df.filter).getOrElse(df)
  }

  /** INCREMENTAL CHANGE READ — the downstream-consumption primitive:
    * rows in data files ADDED after snapshot `sinceVersion` (up to the
    * latest snapshot). With copy-on-write merges this is changed-FILE
    * granularity CDC: every inserted and updated row is included, plus
    * the untouched rows that shared a rewritten file (consumers dedupe
    * by key, exactly as with any file-granularity change feed); rows
    * in files untouched since `sinceVersion` are never re-read. At
    * 100 TB that is the difference between an incremental consumer
    * scanning O(changed files) per cycle and re-scanning the table.
    * Manifest diffing is driver-side metadata work, proportional to
    * file counts, never data. */
  def readChanges(s: SparkSession, path: String,
                  sinceVersion: Long): DataFrame = {
    val root = new Path(path)
    val fs = fsOf(s, root)
    val cur = version(fs, root)
    require(sinceVersion >= 1L && sinceVersion <= cur,
      s"$path: sinceVersion $sinceVersion outside [1, $cur]")
    def filesOf(v: Long) = manifestLines(fs, root, v).getOrElse(
      throw new IllegalArgumentException(s"$path has no complete snapshot v$v"))
    val base = filesOf(sinceVersion).toSet
    val curFiles = filesOf(cur)
    val added = curFiles.filterNot(base)
    if (added.isEmpty) emptyFrame(s, root, fs, curFiles, cur)
    else
      s.read.option("mergeSchema", "true")
        .parquet(added.map(f => new Path(root, f).toString): _*)
  }

  /** Zero-row frame carrying the FULL table schema. Anchors on every
    * file of the given manifest list (mergeSchema across ALL footers,
    * not just the first — pre-evolution files may lack columns), and
    * when that list is itself empty (a valid all-deleted snapshot)
    * walks earlier snapshots for any file to read a schema from. */
  private def emptyFrame(s: SparkSession, root: Path, fs: FileSystem,
                         files: Seq[String], fromVersion: Long): DataFrame = {
    val anchor =
      if (files.nonEmpty) files
      else (fromVersion to 1L by -1L).iterator
        .flatMap(v => manifestLines(fs, root, v))
        .find(_.nonEmpty)
        .getOrElse(throw new IllegalStateException(
          s"$root: no data files in any snapshot — table schema unknown"))
    s.read.option("mergeSchema", "true")
      .parquet(anchor.map(f => new Path(root, f).toString): _*)
      .limit(0)
  }

  /** Copy-on-write row-level MERGE with an atomic snapshot commit:
    * rewrites only the files whose footer key range contains an update
    * key, writes the merged replacements as NEW files, and commits
    * manifest v+1 = (old files − touched) + new files. Old files stay
    * on disk for older snapshots until [[vacuum]]. Throws
    * [[ConcurrentCommitException]] (after cleaning up its own staged
    * files) if another merge committed first — retry on the new base.
    *
    * `expectedBase` is the compare-and-swap form: merge onto exactly
    * that snapshot, failing if anyone committed past it — for callers
    * whose updates were DERIVED from a read of that snapshot and must
    * not silently land on top of someone else's changes. Default (-1)
    * merges onto whatever is latest. */
  def merge(s: SparkSession, path: String, updates: DataFrame,
            key: String, expectedBase: Long = -1L): Unit = {
    val root = new Path(path)
    val fs = fsOf(s, root)
    val v = if (expectedBase > 0L) expectedBase else version(fs, root)
    require(v > 0L, s"$path has no snapshot to merge into")
    val relFiles = manifestLines(fs, root, v).getOrElse(
      throw new IllegalArgumentException(s"$path has no complete snapshot v$v"))
    val absFiles = relFiles.map(f => new Path(root, f))
    val ranges = Sources.fileRangesOf(fs, absFiles, key)
    val touched = Sources.touchedFiles(s, ranges, updates, key)
    // Schema EVOLUTION by construction: kept rows and updates are
    // aligned by name with missing columns null-filled on either side,
    // so an upsert may add columns (old rows read them as null via the
    // mergeSchema read) or omit columns the table has. Type changes on
    // an existing column are NOT supported — parquet mergeSchema
    // rejects them at read, which is the safe failure.
    val kept =
      if (touched.isEmpty)
        // empty frame in the CURRENT table schema anchors column order
        s.read.parquet(absFiles.head.toString).limit(0)
      else s.read.parquet(touched: _*)
        .join(updates.select(key).distinct(), Seq(key), "left_anti")
    val merged = kept.unionByName(updates, allowMissingColumns = true)
    val staged = writeDataFiles(s, root,
      merged.coalesce(math.max(touched.size, 1)))
    val touchedRel = touched.map(rel(root, _)).toSet
    val next = relFiles.filterNot(touchedRel) ++ staged
    try commit(fs, root, v + 1L, next)
    catch { case e: ConcurrentCommitException =>
      staged.foreach(f => fs.delete(new Path(root, f), false))
      throw e
    }
  }

  /** Create-or-merge: the first call creates snapshot v1 from `df`,
    * later calls row-level-merge on `key` — the idempotent upsert
    * entry point streaming foreachBatch sinks use. */
  def upsert(s: SparkSession, df: DataFrame, path: String,
             key: String): Unit = {
    val root = new Path(path)
    if (version(fsOf(s, root), root) == 0L) create(s, df, path)
    else merge(s, path, df, key)
  }

  /** OPTIMIZE — small-file compaction AS A SNAPSHOT (the versioned
    * twin of [[Sources.compact]], which rewrites a plain directory in
    * place): every data file of the current snapshot smaller than
    * `targetBytes` is read back and rewritten as
    * ceil(Σsmall / targetBytes) packed files; manifest v+1 =
    * (files already at size) + (packed replacements). DATA IS
    * IDENTICAL — only layout changes — and older snapshots still
    * reference the original files, so time travel and [[readChanges]]
    * semantics survive compaction ([[vacuum]] reclaims the originals
    * once history is dropped). Files already ≥ targetBytes are never
    * rewritten, so repeated compaction converges to a no-op (returns
    * false without committing when there is nothing to pack). Sizing
    * is driver-side metadata work (one file status per manifest
    * entry); the rewrite reads only the small files, never the
    * table. The streaming-ingest pattern: a foreachBatch [[upsert]]
    * sink accretes one small file per batch, and a periodic compact
    * keeps the snapshot's file count O(data/targetBytes) instead of
    * O(batches) — at 100 TB the difference between a scan planning
    * thousands of splits and millions. */
  def compact(s: SparkSession, path: String,
              targetBytes: Long = 128L << 20): Boolean = {
    val root = new Path(path)
    val fs = fsOf(s, root)
    val v = version(fs, root)
    require(v > 0L, s"$path has no snapshot to compact")
    val relFiles = manifestLines(fs, root, v).getOrElse(
      throw new IllegalArgumentException(s"$path has no complete snapshot v$v"))
    val sized = relFiles.map(f =>
      (f, fs.getFileStatus(new Path(root, f)).getLen))
    val small = sized.filter(_._2 < targetBytes).map(_._1)
    val totalSmall = sized.filter(_._2 < targetBytes).map(_._2).sum
    val nOut = math.max(1L, (totalSmall + targetBytes - 1) / targetBytes)
    // Convergence guard: when totalSmall > targetBytes the pack emits
    // nOut ≥ 2 files each BELOW targetBytes (1.5× target → two 0.75×
    // files), so a `small.size <= 1` check alone would re-pack the
    // same data on every periodic compact forever — unbounded version
    // churn in the exact streaming-ingest loop this targets. Packing
    // only pays when it REDUCES the file count.
    if (small.size <= nOut) return false // packing would not shrink layout
    val packed = s.read.option("mergeSchema", "true")
      .parquet(small.map(f => new Path(root, f).toString): _*)
      .coalesce(nOut.toInt)
    val staged = writeDataFiles(s, root, packed)
    val smallSet = small.toSet
    try commit(fs, root, v + 1L, relFiles.filterNot(smallSet) ++ staged)
    catch { case e: ConcurrentCommitException =>
      staged.foreach(f => fs.delete(new Path(root, f), false))
      throw e
    }
    true
  }

  /** Maintenance: drop all snapshots but the latest, remove torn
    * manifests, and delete every data file no retained snapshot
    * references. Must not run concurrently with an in-flight commit
    * or with readers pinned to old snapshots. */
  def vacuum(s: SparkSession, path: String): Unit = {
    val root = new Path(path)
    val fs = fsOf(s, root)
    val latest = version(fs, root)
    allManifestVersions(fs, root).filterNot(_ == latest)
      .foreach(v => fs.delete(new Path(root, s"$Prefix$v"), false))
    val keep = manifestLines(fs, root, latest).getOrElse(Seq.empty)
      .map(f => new Path(root, f).toUri.getPath).toSet
    Sources.listDataFiles(fs, root)
      .filterNot(p => keep.contains(p.toUri.getPath))
      .foreach(p => fs.delete(p, false))
  }
}
