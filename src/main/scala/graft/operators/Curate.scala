package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables
import graft.functions.TextFunctions._

/** End-to-end corpus curation: the composition a training-data
  * pipeline actually runs, built purely from this library's operators
  * so the whole thing stays one declarative plan (Catalyst sees
  * through every stage; nothing materializes between steps).
  *
  * Stages: length/quality gate → exact-duplicate removal (keep the
  * lowest doc_id per normalized fingerprint) → per-source quota cap.
  * Shuffles: one for the fingerprint window, one for the quota
  * window — both on uniformly-distributed keys.
  */
object Curate {

  def curate(docs: DataFrame, minTokens: Int, quota: Int): DataFrame = {
    val filtered = docs
      .withColumn("_ntok", size(tokens(col("text"))))
      .filter(col("_ntok") >= minTokens)
    val byFp = Window.partitionBy(fingerprint(col("text")))
      .orderBy(col("doc_id").asc)
    val deduped = filtered
      .withColumn("_fpr", row_number().over(byFp))
      .filter(col("_fpr") === 1)
    Sampling.quotaSample(deduped, quota).drop("_ntok", "_fpr")
  }

  /** The full curation composition as an oracle-checked query: per-source
    * stats of what survives gate → dedup → quota. */
  def qCuratePipeline(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    curate(Tables.documents(s, d), minTokens = 30, quota = 12)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_kept"), sum($"n_chars").as("sum_chars"),
        min($"doc_id").as("min_doc"))
  }

  /** CURATION FUNNEL — the dataset-card question every filter pass
    * must answer: how many documents/tokens did EACH stage cost?
    * Same stages as [[qCuratePipeline]] (length gate → exact dedup →
    * source quota), but reported per STAGE with doc-set checksums, so
    * the oracle match proves exactly WHICH documents survive every
    * stage, not just counts. One pass: survivor flags compute as
    * chained windows over the full table (rank partitions carry the
    * previous stage's flag, so non-survivors rank in their own
    * partition and never displace survivors), then one stack unpivots
    * the four stage censuses — no per-stage re-scan, no self-join.
    * Shuffles: the two rank windows, both on uniform keys. */
  def qCurateFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wFp = Window.partitionBy($"g", fingerprint($"text"))
      .orderBy($"doc_id".asc)
    val wQ = Window.partitionBy($"s2", $"source")
      .orderBy(md5($"doc_id".cast("string")).asc, $"doc_id".asc)
    Tables.documents(s, d)
      .withColumn("ntok", size(tokens($"text")).cast("long"))
      .withColumn("g", $"ntok" >= 30)
      .withColumn("s2", $"g" && row_number().over(wFp) === 1)
      .withColumn("s3", $"s2" && row_number().over(wQ) <= 12)
      .select(expr("stack(4, 0L, 'raw', true, 1L, 'len_gate', g, " +
        "2L, 'exact_dedup', s2, 3L, 'source_quota', s3) " +
        "AS (stage, stage_name, alive)"), $"ntok", $"doc_id")
      .filter($"alive")
      .groupBy($"stage", $"stage_name")
      .agg(count(lit(1)).as("n_docs"),
        sum($"ntok").as("n_tokens"),
        bit_xor(md5Prefix60($"doc_id".cast("string")))
          .as("doc_checksum"))
      .orderBy($"stage".asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curate_pipeline" -> (qCuratePipeline _),
    "q_curate_funnel" -> (qCurateFunnel _)
  )

  val oracle: Map[String, String] = Map(
    "q_curate_pipeline" ->
      """WITH f AS (SELECT doc_id, source, n_chars, text FROM documents
        |  WHERE len(string_split(text, ' ')) >= 30),
        |dd AS (SELECT *, ROW_NUMBER() OVER (
        |  PARTITION BY md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
        |  ORDER BY doc_id ASC) AS fpr FROM f),
        |q AS (SELECT * FROM (SELECT *, ROW_NUMBER() OVER (
        |  PARTITION BY source
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS qr
        |  FROM dd WHERE fpr = 1) t WHERE qr <= 12)
        |SELECT source, COUNT(*) AS n_kept,
        |CAST(SUM(n_chars) AS BIGINT) AS sum_chars, MIN(doc_id) AS min_doc
        |FROM q GROUP BY source""".stripMargin,
    "q_curate_funnel" ->
      """WITH b AS (SELECT doc_id, source, text,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
        |  len(string_split(text, ' ')) >= 30 AS g FROM documents),
        |d2 AS (SELECT *, g AND ROW_NUMBER() OVER (
        |  PARTITION BY g,
        |    md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
        |  ORDER BY doc_id ASC) = 1 AS s2 FROM b),
        |d3 AS (SELECT *, s2 AND ROW_NUMBER() OVER (
        |  PARTITION BY s2, source
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) <= 12
        |  AS s3 FROM d2),
        |u AS (
        |  SELECT 0 AS stage, 'raw' AS stage_name, doc_id, ntok FROM d3
        |  UNION ALL SELECT 1, 'len_gate', doc_id, ntok FROM d3 WHERE g
        |  UNION ALL SELECT 2, 'exact_dedup', doc_id, ntok FROM d3
        |    WHERE s2
        |  UNION ALL SELECT 3, 'source_quota', doc_id, ntok FROM d3
        |    WHERE s3)
        |SELECT CAST(stage AS BIGINT) AS stage, stage_name,
        |COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens,
        |bit_xor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |  1, 15)) AS BIGINT)) AS doc_checksum
        |FROM u GROUP BY 1, 2 ORDER BY 1 ASC""".stripMargin
  )
}
