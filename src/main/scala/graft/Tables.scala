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

  /** Columns every loader guarantees to its callers. Checked at load
    * time from parquet footers only (no data read): a renamed upstream
    * column fails HERE with the table and column named, not three
    * operators deep with an unresolved-attribute error. */
  private val required: Map[String, Seq[String]] = Map(
    "region" -> Seq("r_regionkey", "r_name"),
    "nation" -> Seq("n_nationkey", "n_regionkey", "n_name"),
    "customer" -> Seq("c_custkey", "c_nationkey", "c_mktsegment",
      "c_acctbal", "c_name"),
    "supplier" -> Seq("s_suppkey", "s_nationkey", "s_acctbal", "s_name"),
    "part" -> Seq("p_partkey", "p_name", "p_brand", "p_type", "p_size"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderdate",
      "o_totalprice", "o_orderstatus", "o_orderpriority"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
      "l_linestatus", "l_shipdate"),
    "events" -> Seq("event_id", "user_id", "event_type", "ts", "value", "props"),
    "documents" -> Seq("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings" -> Seq("vec_id", "embedding", "label"))

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    required.get(name).foreach { cols =>
      val missing = cols.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"graft.Tables.$name: missing columns ${missing.mkString(", ")} " +
          s"(found: ${df.columns.mkString(", ")})")
    }
    df
  }

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
