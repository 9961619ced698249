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

  /** Memoized ACTUAL scan split count per file set: the planner's own
    * splitting (byte ranges over listed files, row-group granularity),
    * so the fan-out decision below tracks exactly what would run. */
  private val scanParts =
    new java.util.concurrent.ConcurrentHashMap[String, Int]()

  /** EXPLICIT SCAN FAN-OUT for scans whose map-side work is heavy
    * (opt-out: spark.graft.scan.fanout=false). A parquet scan
    * parallelizes at row-group granularity; a table that arrives as a
    * handful of small files (every local test SF: one file, one row
    * group per table) runs its ENTIRE map side as a single task while
    * the other cores idle. The optimization guide's input-skew rule
    * ("one huge unsplittable file … repartition immediately after the
    * read", §2.5) applied adaptively: when the scan's real split count
    * is below the session parallelism, redistribute by a deterministic
    * (near-)unique key — NEVER round-robin, which pays a
    * sort-before-repartition and re-draws assignments on task retry
    * (SPARK-38388) — so the per-row compute above the scan uses every
    * core. At production scale (many files / many row groups) the
    * split count exceeds the core count and this is a NO-OP: no extra
    * exchange ever appears on a well-laid-out table.
    *
    * Applied PER QUERY SITE, not blanket in [[load]]: the inserted
    * exchange costs a fixed ~0.2-0.4 s locally (AQE stage barrier +
    * M×R shuffle blocks), so it only pays where the single-threaded
    * map work exceeds that — measured per adopted site (r16; e.g.
    * q_bootstrap's 32-md5/row explode 5.1→1.9 s, while light
    * scan→agg queries REGRESSED under a blanket table-level fan-out
    * and keep the plain scan). Results are partitioning-independent
    * (decimal-exact sums, unique tie-breaks, sorted collect_lists —
    * SURVEY §6), re-proven by the oracle gate. */
  def fanOut(df: DataFrame, keys: String*): DataFrame = {
    val spark = df.sparkSession
    if (!spark.conf.get("spark.graft.scan.fanout", "true").toBoolean) df
    else {
      val files = df.inputFiles
      if (files.isEmpty) return df // not a file scan — nothing to assess
      val key = files.length + ":" + files.sorted.mkString(",") + ":" +
        spark.conf.get("spark.sql.files.maxPartitionBytes")
      val splits = scanParts.computeIfAbsent(key, _ => df.rdd.getNumPartitions)
      val cores = spark.sparkContext.defaultParallelism
      if (splits >= cores) df
      else df.repartition(cores, keys.map(df.col): _*)
    }
  }

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
