package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
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
}
