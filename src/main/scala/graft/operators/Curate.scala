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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curate_pipeline" -> (qCuratePipeline _)
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
        |FROM q GROUP BY source""".stripMargin
  )
}
