package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions.{md5Prefix60, tokens}

/** Training-data LAYOUT operators: the last mile of an LLM data
  * pipeline, where a curated corpus becomes the physical artifact a
  * trainer consumes — deterministically shuffled, sharded, and packed
  * into fixed-size context windows.
  *
  * Everything is keyed on a 60-bit md5 hash of the document id, the
  * engine's oracle-reproducible hash family, so the "random" shuffle
  * is a pure function of the data: re-running the pipeline on the same
  * corpus yields byte-identical shards — the reproducibility property
  * training pipelines need for resumable jobs and ablation parity.
  *
  * Scale shape: every operator here is one narrow map + ONE
  * hash-partitioned window (partition key = shard, a uniform md5
  * residue — skew-free by construction) + a shard-count-sized agg.
  * No joins, no global sort: at 100 TB the per-shard window is the
  * same plan, just wider, and shard count scales with the cluster.
  */
object Pack {

  /** Context-window token budget for [[qSeqPack]]. */
  val PackBudget = 512L

  /** Shard counts: small fixed fan-outs so the per-shard output is a
    * bounded report; production uses O(cluster) shards. */
  val PackShards  = 8
  val ShardCount  = 16

  private def hashed(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, d).select(
      $"doc_id",
      md5Prefix60($"doc_id".cast("string")).as("h"),
      size(tokens($"text")).cast("long").as("n_tok"))
  }

  /** SEQUENCE PACKING — the pretraining batch-layout operator: within
    * each shard, documents are concatenated in deterministic-shuffle
    * order (h, doc_id) and the token stream is cut into fixed
    * [[PackBudget]]-token context windows; a document whose span
    * crosses a cut contributes to two windows (the standard
    * concat-then-chunk packing of GPT-style pretraining, zero padding
    * waste). Computed with one running-sum window per shard: a doc
    * occupying tokens [cum−n_tok, cum) starts in bin (cum−n_tok) div B
    * and ends in bin (cum−1) div B. The per-shard report carries a
    * bit_xor checksum over (h ⊕ bin-assignment) so the oracle match
    * proves EVERY document's window placement, not just the totals. */
  def qSeqPack(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val B = PackBudget
    val w = Window.partitionBy($"shard").orderBy($"h".asc, $"doc_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hashed(s, d)
      .withColumn("shard", pmod($"h", lit(PackShards.toLong)))
      .withColumn("cum", sum($"n_tok").over(w))
      .select($"shard", $"h", $"n_tok", $"cum",
        expr(s"(cum - n_tok) div ${B}L").as("first_bin"),
        expr(s"(cum - 1) div ${B}L").as("last_bin"))
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tok").as("n_tokens"),
        expr(s"(max(cum) + ${B - 1}L) div ${B}L").as("n_bins"),
        sum(when($"first_bin" =!= $"last_bin", 1L).otherwise(0L))
          .as("n_spanning"),
        bit_xor($"h".bitwiseXOR($"first_bin" * lit(1048573L) + $"last_bin"))
          .as("pack_checksum"))
  }

  /** DETERMINISTIC SHUFFLE + SHARD — the global-permutation operator a
    * training job runs before writing shards: shard = h mod
    * [[ShardCount]], position = dense sequential index within the
    * shard ordered by (h, doc_id). The checksum bit_xors every
    * document's (h ⊕ scaled position), so an oracle match proves the
    * exact permutation — shard AND position of every row — not merely
    * the shard sizes. */
  def qShardAssign(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"shard").orderBy($"h".asc, $"doc_id".asc)
    hashed(s, d)
      .withColumn("shard", pmod($"h", lit(ShardCount.toLong)))
      .withColumn("pos", row_number().over(w).cast("long"))
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_tok").as("n_tokens"),
        bit_xor($"h".bitwiseXOR($"pos" * lit(1000003L))).as("perm_checksum"))
  }

  /** CORPUS STATS — the "dataset card" report: one pass over the
    * corpus producing the headline numbers a data release documents
    * (volume, vocabulary of sources/langs, token mass, exact-duplicate
    * mass, largest document). Two bounded aggregates (a global one and
    * a fingerprint-grouped one for the duplicate mass) joined only at
    * the 1-row level, then unpivoted to (metric, value) rows — the
    * one-pass multi-metric shape from SURVEY §6. */
  def qCorpusStats(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.documents(s, d).select(
      $"lang", $"source", $"n_chars",
      size(tokens($"text")).cast("long").as("n_tok"),
      md5($"text").as("fp"))
    val global = base.agg(
      count(lit(1)).as("n_docs"),
      countDistinct($"lang").as("n_langs"),
      countDistinct($"source").as("n_sources"),
      sum($"n_tok").as("n_tokens"),
      sum($"n_chars").as("n_chars"),
      max($"n_tok").as("max_doc_tokens"))
    val dups = base.groupBy($"fp").agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when($"c" > 1, $"c").otherwise(0L)), lit(0L))
        .as("n_dup_docs"))
    global.crossJoin(dups)
      .select(expr(
        """stack(7,
          |'n_docs', n_docs, 'n_langs', n_langs, 'n_sources', n_sources,
          |'n_tokens', n_tokens, 'n_chars', n_chars,
          |'max_doc_tokens', max_doc_tokens, 'n_dup_docs', n_dup_docs)
          |AS (metric, value)""".stripMargin))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_seq_pack" -> (qSeqPack _),
    "q_shard_assign" -> (qShardAssign _),
    "q_corpus_stats" -> (qCorpusStats _)
  )

  /** `h` on the oracle side: the engine's md5-prefix60 of the doc id. */
  private val sqlH =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    "q_seq_pack" ->
      s"""WITH h AS (SELECT doc_id, $sqlH AS h,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |sh AS (SELECT *, h % $PackShards AS shard FROM h),
         |c AS (SELECT shard, h, n_tok,
         |  -- windowed SUM(BIGINT) widens to HUGEINT in DuckDB; pin BIGINT
         |  CAST(SUM(n_tok) OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |    AS cum
         |  FROM sh),
         |b AS (SELECT shard, h, n_tok, cum,
         |  (cum - n_tok) // $PackBudget AS first_bin,
         |  (cum - 1) // $PackBudget AS last_bin FROM c)
         |SELECT shard, COUNT(*) AS n_docs,
         |CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |(MAX(cum) + ${PackBudget - 1}) // $PackBudget AS n_bins,
         |CAST(SUM(CASE WHEN first_bin <> last_bin THEN 1 ELSE 0 END) AS BIGINT)
         |  AS n_spanning,
         |bit_xor(xor(h, first_bin * 1048573 + last_bin)) AS pack_checksum
         |FROM b GROUP BY shard""".stripMargin,
    "q_shard_assign" ->
      s"""WITH h AS (SELECT doc_id, $sqlH AS h,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |sh AS (SELECT *, h % $ShardCount AS shard FROM h),
         |p AS (SELECT shard, h, n_tok,
         |  CAST(row_number() OVER (PARTITION BY shard
         |    ORDER BY h ASC, doc_id ASC) AS BIGINT) AS pos
         |  FROM sh)
         |SELECT shard, COUNT(*) AS n_docs,
         |CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
         |bit_xor(xor(h, pos * 1000003)) AS perm_checksum
         |FROM p GROUP BY shard""".stripMargin,
    "q_corpus_stats" ->
      """WITH base AS (SELECT lang, source, n_chars,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |  md5(text) AS fp FROM documents),
        |g AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
        |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
        |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
        |  CAST(SUM(n_chars) AS BIGINT) AS n_chars,
        |  CAST(MAX(n_tok) AS BIGINT) AS max_doc_tokens FROM base),
        |dd AS (SELECT COALESCE(CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END)
        |    AS BIGINT), 0) AS n_dup_docs
        |  FROM (SELECT fp, COUNT(*) AS c FROM base GROUP BY fp))
        |SELECT 'n_docs' AS metric, n_docs AS value FROM g
        |UNION ALL SELECT 'n_langs', n_langs FROM g
        |UNION ALL SELECT 'n_sources', n_sources FROM g
        |UNION ALL SELECT 'n_tokens', n_tokens FROM g
        |UNION ALL SELECT 'n_chars', n_chars FROM g
        |UNION ALL SELECT 'max_doc_tokens', max_doc_tokens FROM g
        |UNION ALL SELECT 'n_dup_docs', n_dup_docs FROM dd""".stripMargin
  )
}
