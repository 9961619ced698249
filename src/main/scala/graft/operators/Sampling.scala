package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Deterministic sampling / splitting for training-data curation.
  *
  * Everything keys off `md5(doc_id)` rather than `rand()`: the same
  * document lands in the same split on every run, on any cluster, and
  * after any repartition — reproducibility that `rand()`-based
  * sampling cannot give (Spark re-draws per task retry). All ops are
  * narrow maps or single windows: linear at 100 TB.
  */
object Sampling {

  /** Deterministic bucket in [0, 100) from the id's md5. */
  private def pctBucket(id: org.apache.spark.sql.Column) =
    pmod(conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long"), lit(100L))

  /** Hash-based train/val/test split (80/10/10): stable under reruns,
    * retries, and repartitioning. */
  def qSplitAssign(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d)
      .withColumn("bucket", pctBucket($"doc_id"))
      .withColumn("split",
        when($"bucket" < 80, "train")
          .when($"bucket" < 90, "val")
          .otherwise("test"))
      .groupBy($"source", $"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
  }

  /** Per-source quota sampling: keep at most `quota` documents per
    * source, chosen by hash order (deterministic, uniform) — the
    * "cap each domain's contribution" curation step. */
  def quotaSample(docs: DataFrame, quota: Int): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string")).asc, col("doc_id").asc)
    docs.withColumn("_qr", row_number().over(w))
      .filter(col("_qr") <= quota)
      .drop("_qr")
  }

  def qQuotaSample(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    quotaSample(Tables.documents(s, d), 15)
      .groupBy($"source")
      .agg(count(lit(1)).as("n_kept"), sum($"n_chars").as("sum_chars"),
        min($"doc_id").as("min_doc"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_split_assign" -> (qSplitAssign _),
    "q_quota_sample" -> (qQuotaSample _)
  )

  val oracle: Map[String, String] = Map(
    "q_split_assign" ->
      """WITH b AS (SELECT source, n_chars,
        |  CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),1,15)) AS BIGINT) % 100
        |    AS bucket
        |  FROM documents)
        |SELECT source,
        |CASE WHEN bucket < 80 THEN 'train'
        |     WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        |FROM b GROUP BY 1, 2""".stripMargin,
    "q_quota_sample" ->
      """WITH r AS (SELECT source, n_chars, doc_id,
        |  ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) AS qr
        |  FROM documents)
        |SELECT source, COUNT(*) AS n_kept,
        |CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |MIN(doc_id) AS min_doc
        |FROM r WHERE qr <= 15 GROUP BY source""".stripMargin
  )
}
