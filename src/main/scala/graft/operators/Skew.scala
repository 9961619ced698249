package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for joins whose key distribution is heavy-
  * tailed (the classic 100 TB failure mode: one hot key pins one
  * executor while the rest idle).
  *
  * AQE's skew-join splitting (enabled in [[graft.GraftSession]])
  * handles sort-merge-join skew at runtime; [[saltedJoin]] is the
  * explicit variant for when the small side is broadcastable-ish but
  * the big side's key histogram is pathological, or when AQE can't see
  * the skew (e.g. the skew appears only after a filter).
  */
object Skew {

  /** Salted equi-join: the big (skewed) side gets a random salt in
    * [0, salts); the small side is exploded `salts`× so every salted
    * key finds its match. One shuffle, hot keys spread over `salts`
    * partitions. Row multiplication is on the SMALL side only.
    *
    * The salt mixes a row hash with a per-partition row counter so
    * byte-identical duplicate rows of a hot key (the classic skew
    * input) still spread across salts. Which salt a row gets can vary
    * across retries, but the join RESULT is salt-invariant. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    val bigS = big.withColumn("_salt",
      pmod(xxhash64(struct(big.columns.toSeq.map(col): _*))
        + monotonically_increasing_id(), lit(salts)).cast("int"))
    val smallS = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    bigS.join(smallS, Seq(key, "_salt")).drop("_salt")
  }

  /** Per-key frequency histogram — the diagnostic you run before
    * choosing salts (top-k hot keys and their share). */
  def keyHistogram(df: DataFrame, key: String, topK: Int = 20): DataFrame = {
    val total = df.count().toDouble
    df.groupBy(col(key))
      .agg(count(lit(1)).as("n"))
      .withColumn("share", round(col("n") / total, 6))
      .orderBy(col("n").desc, col(key).asc)
      .limit(topK)
  }

  /** Two-stage (partial → final) aggregation with an explicit salt on
    * the group key: for extreme single-key skew where even map-side
    * combine leaves one reducer hot. Aggregations must be algebraic
    * (sum/count/min/max). */
  def saltedSum(df: DataFrame, key: String, valueCol: Column,
                salts: Int = 16): DataFrame = {
    df.withColumn("_salt", pmod(xxhash64(col(key), valueCol), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("sum_value"))
  }
}
