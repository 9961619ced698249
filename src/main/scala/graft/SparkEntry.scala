package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.multimodal.Multimodal
import graft.operators.{AsofJoin, Curate, Dedup, Events, Pack, RangeJoin, Relational, Sampling, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Events.queries ++ Dedup.queries ++
      TextAnalysis.queries ++ Similarity.queries ++ Multimodal.queries ++
      AsofJoin.queries ++ RangeJoin.queries ++ Sampling.queries ++
      Curate.queries ++ Pack.queries

  /** DuckDB-equivalent SQL for each oracle-checkable query. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Events.oracle ++ Dedup.oracle ++
      TextAnalysis.oracle ++ Similarity.oracle ++ Multimodal.oracle ++
      AsofJoin.oracle ++ RangeJoin.oracle ++ Sampling.oracle ++
      Curate.oracle ++ Pack.oracle
}
