package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Single place the engine reads its tables from. Keeping every scan
  * behind these loaders means filter/column pushdown decisions are made
  * once: callers `select`/`filter` on the returned DataFrame and
  * Catalyst pushes both into the parquet scan (verify with
  * `.explain("formatted")` → `PushedFilters`, `ReadSchema`).
  *
  * At 100 TB these would be partitioned/bucketed catalog tables; the
  * API is identical (`spark.read.table`), so only this file changes.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
