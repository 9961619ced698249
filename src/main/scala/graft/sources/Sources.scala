package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface: the text/CSV/JSON/parquet formats a Hadoop-era
  * analytics stack ingests, plus the layout-aware writers (partitioned
  * and bucketed parquet) that make 100 TB scans cheap.
  *
  * Readers always take an explicit schema — at scale, schema inference
  * is a full extra pass over the data and non-deterministic under
  * sampling; an explicit StructType is one metadata read.
  */
object Sources {

  /** CSV with explicit schema, header, and malformed-row tolerance
    * (PERMISSIVE keeps bad rows as nulls rather than failing the job). */
  def csv(s: SparkSession, path: String, schema: StructType,
          header: Boolean = true, delimiter: String = ","): DataFrame =
    s.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .csv(path)

  /** JSON-lines with explicit schema (one object per line — splittable,
    * unlike multiline JSON). */
  def jsonLines(s: SparkSession, path: String, schema: StructType): DataFrame =
    s.read.schema(schema).json(path)

  /** Raw text lines (one `value` column). */
  def text(s: SparkSession, path: String): DataFrame = s.read.text(path)

  /** RegexSerDe-style reader (the Hive log-parsing surface): each line
    * is parsed with a capture-group regex into named string columns;
    * non-matching lines yield empty strings, as permissive as the
    * SerDe. A narrow map over a splittable text scan — linear at any
    * log size. Cast/convert downstream as needed. */
  def regexText(s: SparkSession, path: String, pattern: String,
                cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, regexp_extract}
    s.read.text(path).select(cols.zipWithIndex.map { case (c, i) =>
      regexp_extract(col("value"), pattern, i + 1).as(c)
    }: _*)
  }

  def parquet(s: SparkSession, path: String): DataFrame = s.read.parquet(path)

  /** Parquet read that skips corrupt files instead of failing the job —
    * at 100 TB a handful of truncated files from a killed writer is
    * routine, and one bad file must not kill a million-task scan. Use
    * for ingest of externally-produced data; keep the strict default
    * for the engine's own tables (where corruption means a real bug). */
  def parquetLenient(s: SparkSession, path: String): DataFrame =
    s.read.option("ignoreCorruptFiles", "true").parquet(path)

  /** ORC — the other columnar format of the Hadoop/Hive era; same
    * pushdown/pruning behavior as parquet under Catalyst. */
  def orc(s: SparkSession, path: String): DataFrame = s.read.orc(path)

  def writeOrc(df: DataFrame, path: String,
               mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Small-file compaction: rewrite a parquet dataset into files of
    * roughly `targetFileMB` each. Thousands of tiny files (the residue
    * of fine-grained streaming/ingest batches) dominate 100 TB scan
    * time through open/footer overhead and task scheduling; compaction
    * is the periodic maintenance job that fixes it. Uses coalesce when
    * shrinking (no shuffle) and repartition when growing. */
  def compact(s: SparkSession, inPath: String, outPath: String,
              targetFileMB: Int = 256): Unit = {
    val df = s.read.parquet(inPath)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val target = math.max(
      (bytes / (targetFileMB.toLong << 20)).toLong, 1L).toInt
    val current = df.rdd.getNumPartitions
    val out = if (target < current) df.coalesce(target)
              else if (target > current) df.repartition(target)
              else df
    out.write.mode(SaveMode.Overwrite).parquet(outPath)
  }

  /** Hive-style partitioned parquet: directory per partition value, so
    * partition-pruned queries touch only matching directories. Keep
    * partition columns low-cardinality (date, region — never a key). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  /** INSERT OVERWRITE by partition (Hive dynamic-partition semantics):
    * replaces ONLY the partitions present in `df`, leaving every other
    * partition untouched — the batch backfill/upsert primitive (fix
    * yesterday's date partition without rewriting the 100 TB table).
    * The mode is scoped to this single write via the DataFrameWriter
    * option, never a session-conf mutation. */
  def overwritePartitions(df: DataFrame, path: String,
                          partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Keyed MERGE (upsert) into a partitioned parquet dataset — the
    * Hive-ACID-MERGE-shaped batch primitive, built from primitives that
    * scale: rows in `updates` replace target rows with the same key,
    * new keys are inserted. Only the partitions TOUCHED by `updates`
    * are read back and rewritten (dynamic partition pruning restricts
    * the scan; dynamic overwrite restricts the write), so merging a
    * day's corrections into a 100 TB table costs one partition's IO,
    * not the table's.
    *
    * The merged frame is localCheckpoint'ed before the write because
    * Spark refuses to overwrite a path it is concurrently reading;
    * the materialized volume is bounded by the touched partitions.
    * Assumes a key's partition values never change between versions
    * (the standard partition-scoped-merge contract — a moved key would
    * leave its old row in the untouched partition). */
  def mergeByKey(s: SparkSession, path: String, updates: DataFrame,
                 key: String, partitionCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.broadcast
    val target = s.read.parquet(path)
    val touched = updates.select(partitionCols.map(updates.col): _*).distinct()
    val affected = target.join(broadcast(touched), partitionCols, "left_semi")
    val kept = affected.join(updates.select(key), Seq(key), "left_anti")
    val merged = kept.unionByName(updates.select(target.columns.map(updates.col): _*))
      .localCheckpoint()
    overwritePartitions(merged, path, partitionCols)
  }

  /** Hadoop SequenceFile (the classic MR container format), read as a
    * (key, value) string DataFrame. Splittable via sync markers, so a
    * huge file still parallelizes per block. Note: the spark-avro
    * connector is not on this classpath, so Avro is intentionally not
    * exposed; SequenceFile covers the Hadoop-era container surface
    * through hadoop-client, which Spark always bundles. */
  def sequenceFile(s: SparkSession, path: String): DataFrame = {
    import s.implicits._
    s.sparkContext.sequenceFile[String, String](path).toDF("key", "value")
  }

  /** Writes a two-string-column DataFrame as a Text/Text SequenceFile. */
  def writeSequenceFile(df: DataFrame, path: String): Unit =
    df.rdd.map(r => (r.getString(0), r.getString(1)))
      .saveAsSequenceFile(path)

  /** Bucketed + sorted table: co-locates rows by join/agg key at write
    * time, so later equi-joins and groupBys on that key skip the
    * shuffle entirely (both sides bucketed → zero-exchange join). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, mode: SaveMode = SaveMode.Overwrite,
                    path: Option[String] = None): Unit = {
    val w = df.write.mode(mode)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }
}
