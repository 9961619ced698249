package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** NO-SPLIT BIN PACKING (first-fit-decreasing per shard) — the
    * packing discipline for objectives that cannot cross document
    * boundaries (SFT examples, contrastive pairs): unlike
    * [[qSeqPack]]'s concat-then-chunk, a document never spans two
    * context windows; the price is padding waste, bounded by FFD's
    * classical 11/9·OPT + 1 guarantee. Sequential by nature, so it
    * runs per shard inside one partition (`repartition(shard)` +
    * `mapPartitions`): shards are uniform md5 residues, the per-shard
    * doc list is the only buffered state, and shard count scales with
    * the cluster — the exact parallelism contract of the rest of the
    * layout family. Documents longer than the budget are returned
    * with bin = -1 (caller must chunk those through [[qSeqPack]]).
    * Deterministic: docs sort (nTok desc, h, docId) and bins probe
    * first-fit in creation order. Property-tested in PackSpec (never
    * over budget, beats or ties naive sequential fill, deterministic
    * across runs). */
  def packNoSplit(docs: DataFrame, budget: Long,
                  shards: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val tagged = docs
      .select($"doc_id".cast("long"), $"h".cast("long"),
        $"n_tok".cast("long"),
        pmod($"h", lit(shards.toLong)).as("shard"))
      .as[(Long, Long, Long, Long)]
    tagged
      .repartition(shards, $"shard")
      .mapPartitions { it =>
        val ds = it.toArray
        // a partition may carry several shards (hash collisions at
        // small shard counts): pack each shard independently
        ds.groupBy(_._4).iterator.flatMap { case (shard, sdocs) =>
          val sorted = sdocs.sortBy { case (id, h, n, _) => (-n, h, id) }
          val binLoad = scala.collection.mutable.ArrayBuffer.empty[Long]
          sorted.iterator.map { case (id, _, n, _) =>
            if (n > budget) (id, shard, -1L, n)
            else {
              var b = 0
              while (b < binLoad.length && binLoad(b) + n > budget) b += 1
              if (b == binLoad.length) binLoad += 0L
              binLoad(b) += n
              (id, shard, b.toLong, n)
            }
          }
        }
      }
      .toDF("doc_id", "shard", "bin", "n_tok")
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

  /** Morton/Z-ORDER interleave of two 16-bit coordinates — the
    * multi-dimensional clustering key behind data-skipping layouts
    * (Delta/Iceberg OPTIMIZE ZORDER): sorting by z keeps BOTH
    * dimensions locally bounded in every file, so min/max footer stats
    * prune on either predicate. Built from the classic mask-shift bit
    * spread (4 rounds each side) — pure BIGINT `&`/`|`/shiftleft,
    * codegen-friendly, oracle-mirrorable. */
  def mortonZ(x: Column, y: Column): Column = {
    def spread(c: Column): Column = {
      val s0 = c.bitwiseAND(lit(65535L))
      val s1 = s0.bitwiseOR(shiftleft(s0, 8)).bitwiseAND(lit(16711935L))
      val s2 = s1.bitwiseOR(shiftleft(s1, 4)).bitwiseAND(lit(252645135L))
      val s3 = s2.bitwiseOR(shiftleft(s2, 2)).bitwiseAND(lit(858993459L))
      s3.bitwiseOR(shiftleft(s3, 1)).bitwiseAND(lit(1431655765L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
  }

  /** [[mortonZ]] as engine-neutral SQL (DuckDB `<<` / `&` / `|`). */
  def sqlMortonZ(x: String, y: String): String = {
    def spread(c: String): String = {
      val s0 = s"($c & 65535)"
      val s1 = s"(($s0 | ($s0 << 8)) & 16711935)"
      val s2 = s"(($s1 | ($s1 << 4)) & 252645135)"
      val s3 = s"(($s2 | ($s2 << 2)) & 858993459)"
      s"(($s3 | ($s3 << 1)) & 1431655765)"
    }
    s"(${spread(x)} | (${spread(y)} << 1))"
  }

  /** Span start period / span length for [[qSpanMask]]. */
  private val SpanEvery = 16L
  private val SpanLen = 3

  /** SPAN-CORRUPTION MASK LAYOUT (T5/UL2 denoising objective): decide
    * every mask span DETERMINISTICALLY from md5(doc_id:position) — the
    * same hash-not-rand discipline as the shard/split family, so the
    * corruption pattern is reproducible across reruns, retries and
    * repartitions (and the oracle can recompute it exactly). A span of
    * [[SpanLen]] tokens starts wherever the position hash ≡ 0 mod
    * [[SpanEvery]]; overlapping spans merge (a token is masked iff ANY
    * span covers it — the exists() fold). Per-source census reports
    * token/masked/span mass, the exact masked share as an integer
    * ratio, and a bit_xor(doc_id ⊕ masked·1000003) placement checksum
    * proving every document's masked-token count. Scale shape: one
    * narrow map (all per-doc array work inside codegen'd higher-order
    * functions, no explode) + one source-sized agg. */
  def qSpanMask(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hashMod = s"CAST(conv(substring(md5(concat(cast(doc_id AS string)," +
      s" ':', cast(j AS string))), 1, 15), 16, 10) AS BIGINT) % $SpanEvery"
    Tables.documents(s, d)
      .select($"doc_id", $"source",
        expr("size(split(text, ' '))").cast("long").as("n"))
      .withColumn("starts",
        expr(s"filter(sequence(1L, n), j -> $hashMod = 0)"))
      .select($"doc_id", $"source", $"n",
        size($"starts").cast("long").as("n_spans"),
        expr(s"size(filter(sequence(1L, n), i -> " +
          s"exists(starts, j -> j <= i AND i < j + $SpanLen)))")
          .cast("long").as("masked"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n").as("n_tokens"),
        sum($"masked").as("n_masked"),
        sum($"n_spans").as("n_spans"),
        expr("sum(masked) * 1000000000 DIV sum(n)").as("mask_e9"),
        expr("bit_xor(doc_id ^ (masked * 1000003))").as("mask_checksum"))
      .orderBy($"source".asc)
  }

  /** 3-dimensional Morton interleave: each 21-bit value spread to
    * every third bit (the classic 5-round mask ladder), then
    * x | y<<1 | z<<2 — 63 bits, sign-safe in BIGINT in both engines. */
  def mortonZ3(x: Column, y: Column, z: Column): Column = {
    def spread(c: Column): Column = {
      val s0 = c.bitwiseAND(lit(0x1fffffL))
      val s1 = s0.bitwiseOR(shiftleft(s0, 32)).bitwiseAND(lit(0x1f00000000ffffL))
      val s2 = s1.bitwiseOR(shiftleft(s1, 16)).bitwiseAND(lit(0x1f0000ff0000ffL))
      val s3 = s2.bitwiseOR(shiftleft(s2, 8)).bitwiseAND(lit(0x100f00f00f00f00fL))
      val s4 = s3.bitwiseOR(shiftleft(s3, 4)).bitwiseAND(lit(0x10c30c30c30c30c3L))
      s4.bitwiseOR(shiftleft(s4, 2)).bitwiseAND(lit(0x1249249249249249L))
    }
    spread(x).bitwiseOR(shiftleft(spread(y), 1))
      .bitwiseOR(shiftleft(spread(z), 2))
  }

  /** [[mortonZ3]] as engine-neutral SQL. */
  def sqlMortonZ3(x: String, y: String, z: String): String = {
    def spread(c: String): String = {
      val s0 = s"($c & ${0x1fffffL})"
      val s1 = s"(($s0 | ($s0 << 32)) & ${0x1f00000000ffffL})"
      val s2 = s"(($s1 | ($s1 << 16)) & ${0x1f0000ff0000ffL})"
      val s3 = s"(($s2 | ($s2 << 8)) & ${0x100f00f00f00f00fL})"
      val s4 = s"(($s3 | ($s3 << 4)) & ${0x10c30c30c30c30c3L})"
      s"(($s4 | ($s4 << 2)) & ${0x1249249249249249L})"
    }
    s"(${spread(x)} | (${spread(y)} << 1) | (${spread(z)} << 2))"
  }

  /** [[qZorder]] in THREE dimensions — (l_partkey, l_suppkey,
    * l_quantity): the multi-column OPTIMIZE ZORDER case. 16-bit
    * masked dims interleave into 48 used bits; cell = z div 2³⁶
    * fixes the top 4 bits of EACH dimension, so every cell bounds
    * all three key ranges to 4096-wide blocks simultaneously — the
    * stats a three-predicate skipping layer needs. Same scale shape
    * as [[qZorder]]: one narrow map + one shuffle agg. */
  def qZorder3(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val q16 = $"l_quantity".cast("long").bitwiseAND(lit(65535L))
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber",
        $"l_partkey".bitwiseAND(lit(65535L)).as("pk"),
        $"l_suppkey".bitwiseAND(lit(65535L)).as("sk"),
        q16.as("qk"))
      .withColumn("z", mortonZ3($"pk", $"sk", $"qk"))
      .groupBy(expr(s"z div ${1L << 36}").as("cell"))
      .agg(count(lit(1)).as("n"),
        min($"pk").as("pk_min"), max($"pk").as("pk_max"),
        min($"sk").as("sk_min"), max($"sk").as("sk_max"),
        min($"qk").as("qk_min"), max($"qk").as("qk_max"),
        bit_xor($"z".bitwiseXOR(
          $"l_orderkey" * lit(1000003L) + $"l_linenumber"))
          .as("z_checksum"))
  }

  /** Z-ORDER LAYOUT CENSUS over lineitem on (l_partkey, l_suppkey):
    * per 256×256 z-cell (z div 65536 — a joint block of both key
    * ranges), the row count and the min/max of each dimension — the
    * exact footer stats a z-ordered file would carry — plus a
    * bit_xor over (z ⊕ row identity) proving every row's z-value.
    * Cells are BOUNDED in both dims by construction; the assertion a
    * skipping layer needs. One narrow map + one shuffle agg; the
    * write path is [[writeZOrdered]] (spec-covered: per-file ranges
    * stay bounded in both dimensions simultaneously, which no
    * single-column sort achieves). */
  def qZorder(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber", $"l_partkey", $"l_suppkey",
        mortonZ($"l_partkey", $"l_suppkey").as("z"))
      .groupBy(expr("z div 65536").as("cell"))
      .agg(count(lit(1)).as("n"),
        min($"l_partkey".bitwiseAND(lit(65535L))).as("pk_min"),
        max($"l_partkey".bitwiseAND(lit(65535L))).as("pk_max"),
        min($"l_suppkey".bitwiseAND(lit(65535L))).as("sk_min"),
        max($"l_suppkey".bitwiseAND(lit(65535L))).as("sk_max"),
        bit_xor($"z".bitwiseXOR(
          $"l_orderkey" * lit(1000003L) + $"l_linenumber"))
          .as("z_checksum"))
  }

  /** HILBERT-CURVE LAYOUT CENSUS — [[qZorder]]'s locality upgrade on
    * the same (l_partkey, l_suppkey) keys: per 65536-step curve cell
    * (a CONTIGUOUS Hilbert segment — unlike a Morton cell it can never
    * straddle a curve seam), row count, both dimensions' min/max (the
    * footer stats a skipping layer reads) and a per-row placement
    * checksum over the index itself. The index comes from the
    * [[graft.functions.HilbertCurve.HilbertIndex]] codegen expression;
    * the ORACLE recomputes the full 16-round rotate/reflect state
    * machine in unrolled MATERIALIZED SQL — every row's index is
    * proven, not sampled. Same scale shape as q_zorder: one narrow
    * map + one shuffle agg. */
  def qHilbert(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber",
        $"l_partkey".bitwiseAND(lit(65535L)).as("pk"),
        $"l_suppkey".bitwiseAND(lit(65535L)).as("sk"))
      .withColumn("h", graft.functions.HilbertCurve.hilbertD($"pk", $"sk"))
      .groupBy(expr("h div 65536").as("cell"))
      .agg(count(lit(1)).as("n"),
        min($"pk").as("pk_min"), max($"pk").as("pk_max"),
        min($"sk").as("sk_min"), max($"sk").as("sk_max"),
        bit_xor($"h".bitwiseXOR(
          $"l_orderkey" * lit(1000003L) + $"l_linenumber"))
          .as("h_checksum"))
  }

  /** HILBERT ROUND-TRIP PROOF — decode through the engine, re-derive
    * through SQL: every row's index from the encode expression is
    * decoded back to plane coordinates by the
    * [[graft.functions.HilbertCurve.HilbertDecode]] expression (the
    * range → box primitive a skipping layer needs), and the ORACLE
    * re-runs BOTH unrolled state machines — 16 encode rounds then 16
    * decode rounds — so the hash match proves encode AND decode for
    * every row in both engines. Per cell: row count, rows whose
    * decode equals the original coords (must equal the count — the
    * inverse property), and a checksum over (index ⊕ decoded). Same
    * scale shape as q_hilbert. */
  def qHilbertRoundtrip(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.functions.HilbertCurve.{hilbertD, hilbertXY}
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_linenumber",
        $"l_partkey".bitwiseAND(lit(65535L)).as("pk"),
        $"l_suppkey".bitwiseAND(lit(65535L)).as("sk"))
      .withColumn("h", hilbertD($"pk", $"sk"))
      .withColumn("dec", hilbertXY($"h"))
      .groupBy(expr("h div 65536").as("cell"))
      .agg(count(lit(1)).as("n"),
        sum(($"dec" === $"pk" * 65536 + $"sk").cast("long"))
          .as("n_roundtrip"),
        bit_xor($"h".bitwiseXOR($"dec" * lit(1000003L)))
          .as("decode_checksum"))
  }

  /** Physical z-ordered writer: each column is first min/max-scaled
    * to the full 16-bit width (otherwise the wider-domain column owns
    * every significant interleaved bit and the narrow one never
    * bounds — the reason production ZORDER implementations rank- or
    * range-normalize columns before interleaving), then the rows are
    * range-partitioned on the interleaved z key and sorted within
    * partitions — every output file covers one compact z-range, i.e.
    * a bounded region of BOTH dimensions (the data-skipping property;
    * asserted in PackSpec). The min/max pre-pass is a one-row agg —
    * column statistics, not data. At 100 TB this is the same plan
    * with more range partitions — the range exchange samples the z
    * distribution, no global sort. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String,
                    path: String, numFiles: Int): Unit = {
    val b = df.agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    def norm(c: String, lo: Double, hi: Double): Column =
      if (hi > lo) ((col(c) - lo) / (hi - lo) * 65535.0).cast("long")
      else lit(0L)
    df.withColumn("__z", mortonZ(
        norm(xCol, b.getDouble(0), b.getDouble(1)),
        norm(yCol, b.getDouble(2), b.getDouble(3))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** [[writeZOrdered]] with the HILBERT key: same min/max 16-bit
    * normalization and range-partition + sort plan, but file
    * boundaries cut a CONTIGUOUS curve — a Hilbert index range is one
    * connected region of the plane (no Morton seam-jumps), so
    * per-file min/max boxes are never inflated by a cross-space jump.
    * Same cost as z-order: the range exchange samples the key, no
    * global sort. PackSpec asserts both-dims boundedness and
    * no-regression vs the Morton writer on the max-dim-range
    * metric. */
  def writeHilbertOrdered(df: DataFrame, xCol: String, yCol: String,
                          path: String, numFiles: Int): Unit = {
    val b = df.agg(min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    def norm(c: String, lo: Double, hi: Double): Column =
      if (hi > lo) ((col(c) - lo) / (hi - lo) * 65535.0).cast("long")
      else lit(0L)
    df.withColumn("__h", graft.functions.HilbertCurve.hilbertD(
        norm(xCol, b.getDouble(0), b.getDouble(1)),
        norm(yCol, b.getDouble(2), b.getDouble(3))))
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** [[writeZOrdered]] in three dimensions: min/max-scale each column
    * to 16 bits, interleave with [[mortonZ3]], range-partition + sort
    * on z — every file bounds ALL THREE dimensions (PackSpec-asserted
    * against a linear sort). */
  def writeZOrdered3(df: DataFrame, cols: (String, String, String),
                     path: String, numFiles: Int): Unit = {
    val (xc, yc, zc) = cols
    val b = df.agg(
      min(col(xc)).cast("double"), max(col(xc)).cast("double"),
      min(col(yc)).cast("double"), max(col(yc)).cast("double"),
      min(col(zc)).cast("double"), max(col(zc)).cast("double")).head()
    def norm(c: String, lo: Double, hi: Double): Column =
      if (hi > lo) ((col(c) - lo) / (hi - lo) * 65535.0).cast("long")
      else lit(0L)
    df.withColumn("__z", mortonZ3(
        norm(xc, b.getDouble(0), b.getDouble(1)),
        norm(yc, b.getDouble(2), b.getDouble(3)),
        norm(zc, b.getDouble(4), b.getDouble(5))))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_span_mask" -> (qSpanMask _),
    "q_zorder3" -> (qZorder3 _),
    "q_seq_pack" -> (qSeqPack _),
    "q_shard_assign" -> (qShardAssign _),
    "q_corpus_stats" -> (qCorpusStats _),
    "q_zorder" -> (qZorder _),
    "q_hilbert" -> (qHilbert _),
    "q_hilbert_roundtrip" -> (qHilbertRoundtrip _)
  )

  /** `h` on the oracle side: the engine's md5-prefix60 of the doc id. */
  private val sqlH =
    "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)"

  val oracle: Map[String, String] = Map(
    "q_span_mask" ->
      s"""WITH t AS (SELECT doc_id, source,
         |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n
         |  FROM documents),
         |st AS (SELECT doc_id, source, n,
         |  list_filter(range(1, n + 1), j ->
         |    CAST(('0x' || substr(md5(doc_id || ':' || j), 1, 15))
         |      AS BIGINT) % $SpanEvery = 0) AS starts
         |  FROM t),
         |m AS (SELECT doc_id, source, n,
         |  CAST(len(starts) AS BIGINT) AS n_spans,
         |  CAST(len(list_filter(range(1, n + 1), i ->
         |    len(list_filter(starts, j -> j <= i AND i < j + $SpanLen)) > 0))
         |    AS BIGINT) AS masked
         |  FROM st)
         |SELECT source, COUNT(*) AS n_docs,
         |CAST(SUM(n) AS BIGINT) AS n_tokens,
         |CAST(SUM(masked) AS BIGINT) AS n_masked,
         |CAST(SUM(n_spans) AS BIGINT) AS n_spans,
         |CAST(SUM(masked) AS BIGINT) * 1000000000
         |  // CAST(SUM(n) AS BIGINT) AS mask_e9,
         |bit_xor(xor(doc_id, masked * 1000003)) AS mask_checksum
         |FROM m GROUP BY source ORDER BY source ASC""".stripMargin,
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
        |UNION ALL SELECT 'n_dup_docs', n_dup_docs FROM dd""".stripMargin,
    "q_zorder" ->
      s"""WITH z AS (SELECT l_orderkey, l_linenumber,
         |  l_partkey & 65535 AS pk, l_suppkey & 65535 AS sk,
         |  ${sqlMortonZ("l_partkey", "l_suppkey")} AS z FROM lineitem)
         |SELECT z // 65536 AS cell, COUNT(*) AS n,
         |MIN(pk) AS pk_min, MAX(pk) AS pk_max,
         |MIN(sk) AS sk_min, MAX(sk) AS sk_max,
         |bit_xor(xor(z, l_orderkey * 1000003 + l_linenumber))
         |  AS z_checksum
         |FROM z GROUP BY 1""".stripMargin,
    "q_hilbert" ->
      s"""WITH h0 AS MATERIALIZED (SELECT l_orderkey, l_linenumber,
         |  l_partkey & 65535 AS pk, l_suppkey & 65535 AS sk,
         |  l_partkey & 65535 AS x, l_suppkey & 65535 AS y,
         |  CAST(0 AS BIGINT) AS d
         |  FROM lineitem),
         |${graft.functions.HilbertCurve.sqlRounds(
             "p.l_orderkey, p.l_linenumber, p.pk, p.sk")}
         |SELECT d // 65536 AS cell, COUNT(*) AS n,
         |MIN(pk) AS pk_min, MAX(pk) AS pk_max,
         |MIN(sk) AS sk_min, MAX(sk) AS sk_max,
         |bit_xor(xor(d, l_orderkey * 1000003 + l_linenumber))
         |  AS h_checksum
         |FROM h16 GROUP BY 1""".stripMargin,
    "q_hilbert_roundtrip" ->
      s"""WITH h0 AS MATERIALIZED (SELECT l_orderkey, l_linenumber,
         |  l_partkey & 65535 AS pk, l_suppkey & 65535 AS sk,
         |  l_partkey & 65535 AS x, l_suppkey & 65535 AS y,
         |  CAST(0 AS BIGINT) AS d
         |  FROM lineitem),
         |${graft.functions.HilbertCurve.sqlRounds(
             "p.l_orderkey, p.l_linenumber, p.pk, p.sk")},
         |i0 AS MATERIALIZED (SELECT l_orderkey, l_linenumber, pk, sk,
         |  d, CAST(0 AS BIGINT) AS x, CAST(0 AS BIGINT) AS y,
         |  d AS t FROM h16),
         |${graft.functions.HilbertCurve.sqlDecodeRounds(
             "p.l_orderkey, p.l_linenumber, p.pk, p.sk, p.d")}
         |SELECT d // 65536 AS cell, COUNT(*) AS n,
         |CAST(SUM(CASE WHEN x * 65536 + y = pk * 65536 + sk
         |  THEN 1 ELSE 0 END) AS BIGINT) AS n_roundtrip,
         |bit_xor(xor(d, (x * 65536 + y) * 1000003)) AS decode_checksum
         |FROM i16 GROUP BY 1""".stripMargin,
    "q_zorder3" ->
      s"""WITH z AS (SELECT l_orderkey, l_linenumber,
         |  l_partkey & 65535 AS pk, l_suppkey & 65535 AS sk,
         |  CAST(l_quantity AS BIGINT) & 65535 AS qk,
         |  ${sqlMortonZ3("(l_partkey & 65535)", "(l_suppkey & 65535)",
             "(CAST(l_quantity AS BIGINT) & 65535)")} AS z FROM lineitem)
         |SELECT z // ${1L << 36} AS cell, COUNT(*) AS n,
         |MIN(pk) AS pk_min, MAX(pk) AS pk_max,
         |MIN(sk) AS sk_min, MAX(sk) AS sk_max,
         |MIN(qk) AS qk_min, MAX(qk) AS qk_max,
         |bit_xor(xor(z, l_orderkey * 1000003 + l_linenumber))
         |  AS z_checksum
         |FROM z GROUP BY 1""".stripMargin
  )
}
