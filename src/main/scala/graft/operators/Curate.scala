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

  /** CURATION FUNNEL — the dataset-card question every filter pass
    * must answer: how many documents/tokens did EACH stage cost?
    * Same stages as [[qCuratePipeline]] (length gate → exact dedup →
    * source quota), but reported per STAGE with doc-set checksums, so
    * the oracle match proves exactly WHICH documents survive every
    * stage, not just counts. One pass: survivor flags compute as
    * chained windows over the full table (rank partitions carry the
    * previous stage's flag, so non-survivors rank in their own
    * partition and never displace survivors), then one stack unpivots
    * the four stage censuses — no per-stage re-scan, no self-join.
    * Shuffles: the two rank windows, both on uniform keys. */
  def qCurateFunnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wFp = Window.partitionBy($"g", fingerprint($"text"))
      .orderBy($"doc_id".asc)
    val wQ = Window.partitionBy($"s2", $"source")
      .orderBy(md5($"doc_id".cast("string")).asc, $"doc_id".asc)
    Tables.documents(s, d)
      .withColumn("ntok", size(tokens($"text")).cast("long"))
      .withColumn("g", $"ntok" >= 30)
      .withColumn("s2", $"g" && row_number().over(wFp) === 1)
      .withColumn("s3", $"s2" && row_number().over(wQ) <= 12)
      .select(expr("stack(4, 0L, 'raw', true, 1L, 'len_gate', g, " +
        "2L, 'exact_dedup', s2, 3L, 'source_quota', s3) " +
        "AS (stage, stage_name, alive)"), $"ntok", $"doc_id")
      .filter($"alive")
      .groupBy($"stage", $"stage_name")
      .agg(count(lit(1)).as("n_docs"),
        sum($"ntok").as("n_tokens"),
        bit_xor(md5Prefix60($"doc_id".cast("string")))
          .as("doc_checksum"))
      .orderBy($"stage".asc)
  }

  private val CfMinTokens = 30 // length gate, applied before AND after trim
  private val CfBudgetDiv = 2  // DSIR keeps top n/2 of the train slice

  /** THE FULL CURATION COMPOSITION — every curation verb the library
    * ships, chained into ONE oracle-gated pipeline with a per-stage
    * census (the dataset-card funnel a real training-data pass
    * publishes):
    *
    *   0 raw → 1 length gate → 2 exact-duplicate removal (normalized
    *   fingerprint, keep lowest doc_id — the cheap byte-copy guard
    *   production runs before any fuzzy surgery; on a corpus slice
    *   with no byte-copies the census PROVES the zero) → 3 span-trim
    *   (≥12-token verbatim spans shared WITHIN the deduped slice
    *   removed, re-gated — near-twin pairs lose their shared passages
    *   here; a doc trimmed below the floor exits) → 4 leakage-repaired
    *   train split (near-dup affinity at jaccard > 1/2 measured on the
    *   PRE-trim text — the signal that existed before surgery — among
    *   trim survivors: clusters adopt their representative's 80/10/10
    *   hash split, so the trimmed residues of a near-dup pair can
    *   never straddle train/eval; keep train) → 5 DSIR selection (top
    *   half by target-lang importance, scored on the trimmed text).
    *
    * Census per stage: doc/token counts plus bit_xor proofs over BOTH
    * doc_id and the stage's text (original through stage 2,
    * token-rebuilt trimmed text from stage 3 on) — the oracle match
    * certifies exactly WHICH documents survive each stage and the
    * byte-exact rewritten text they carry, not just counts.
    *
    * Scale shape: each stage is the library operator's own plan
    * ([[TextAnalysis.trimmedDocsOf]], [[Dedup.jaccardPairsOf]] +
    * [[Dedup.connectedComponents]], [[Sampling.dsirScored]] /
    * [[Sampling.dsirSelectFrom]]) — df/occ-capped pair joins, merge
    * hints on corpus-grown sides, O(log n) CC rounds, bounded
    * histogram selection. Survivor frames checkpoint between stages
    * (each feeds its census + the next stage). ORACLE NOTE: the
    * DuckDB mirror is gate-SF-only (the stage-4 recursive-CC reach —
    * the q_dup_clusters family rule); the ENGINE runs at every SF and
    * is covered by the bench ladder. */
  def qCurateFull(s: SparkSession, d: String): DataFrame =
    curateFullOf(Tables.documents(s, d))

  /** [[qCurateFull]] over an arbitrary (doc_id, source, lang, text)
    * frame — the library entry behind the eager `curate` SQL TVF.
    * EAGER: stage checkpoints and the DSIR budget count run Spark
    * jobs when this is CALLED, not when the result is acted on. */
  def curateFullOf(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import graft.functions.Cp
    import org.apache.spark.sql.Column
    def census(stage: Long, nm: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n_docs"),
          coalesce(sum($"ntok"), lit(0L)).as("n_tokens"),
          coalesce(bit_xor(md5Prefix60($"doc_id".cast("string"))), lit(0L))
            .as("doc_xor"),
          coalesce(bit_xor(md5Prefix60($"text")), lit(0L)).as("text_xor"))
        .select(lit(stage).as("stage"), lit(nm).as("stage_name"),
          $"n_docs", $"n_tokens", $"doc_xor", $"text_xor")
    def splitOf(id: Column): Column = {
      val b = pmod(md5Prefix60(id.cast("string")), lit(100L))
      when(b < 80, "train").when(b < 90, "val").otherwise("test")
    }
    val c0 = docs
      .select($"doc_id", $"source", $"lang", $"text",
        size(tokens($"text")).cast("long").as("ntok"))
    // stage 1: length gate (read by census + fingerprint window)
    val c1 = c0.filter($"ntok" >= CfMinTokens).transform(Cp.local)
    // stage 2: exact-duplicate removal — normalized fingerprint,
    // keep lowest doc_id (one window on a uniform md5 key)
    val wFp = Window.partitionBy(fingerprint($"text"))
      .orderBy($"doc_id".asc)
    val c2 = c1.withColumn("_fpr", row_number().over(wFp))
      .filter($"_fpr" === 1).drop("_fpr")
      .transform(Cp.local)
    // stage 3: span-trim WITHIN the deduped slice, token-rebuilt text,
    // re-gated (a doc trimmed below the floor exits here)
    val c3 = TextAnalysis.trimmedDocsOf(c2)
      .select($"doc_id", $"source", $"lang",
        concat_ws(" ", $"kept").as("text"),
        size($"kept").cast("long").as("ntok"))
      .filter($"ntok" >= CfMinTokens)
      .transform(Cp.local)
    // stage 4: near-dup affinity on the PRE-trim text (jaccard > 1/2)
    // among trim survivors — clusters adopt the representative's
    // split; keep the repaired train slice. Routing this build through
    // Dedup.withSharedPairs was evaluated and REJECTED (round 12): the
    // shared table's df caps are computed over the RAW corpus, where
    // exact duplicates inflate shingle df — a shingle rare within c2
    // could exceed DfCap there and its candidate pairs would be lost.
    // Stage 4's caps must live in the survivor universe, and the build
    // runs once over the checkpointed c2 anyway (BASELINE round-12).
    val pr = Dedup.jaccardPairsOf(c2.select($"doc_id", $"text"))
    val surv = c3.select($"doc_id")
    val e4 = pr.filter(lit(3) * $"inter" > $"na" + $"nb")
      .join(surv.select($"doc_id".as("doc_a")).hint("merge"),
        Seq("doc_a"), "left_semi")
      .join(surv.select($"doc_id".as("doc_b")).hint("merge"),
        Seq("doc_b"), "left_semi")
      .select($"doc_a", $"doc_b")
    val lab4 = Dedup.connectedComponents(e4)
      .withColumnRenamed("id", "doc_id")
    val c4 = c3.join(lab4.hint("merge"), Seq("doc_id"), "left")
      .filter(splitOf(coalesce($"label", $"doc_id")) === "train")
      .drop("label")
      .transform(Cp.local)
    // stage 5: DSIR importance selection, budget = survivors / 2
    val budget = c4.count() / CfBudgetDiv
    val sel = Sampling.dsirSelectFrom(
      Sampling.dsirScored(c4.select($"doc_id", $"lang", $"text")), budget)
    val c5 = c4.join(sel.select($"doc_id").hint("merge"),
      Seq("doc_id"), "left_semi")
    census(0, "raw", c0)
      .unionByName(census(1, "len_gate", c1))
      .unionByName(census(2, "exact_dedup", c2))
      .unionByName(census(3, "span_trim", c3))
      .unionByName(census(4, "leak_train", c4))
      .unionByName(census(5, "dsir_select", c5))
      .orderBy($"stage".asc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_curate_pipeline" -> (qCuratePipeline _),
    "q_curate_funnel" -> (qCurateFunnel _),
    "q_curate_full" -> (qCurateFull _)
  )

  // Oracle helpers shared with the dedup family (Dedup.scala) so the
  // n-gram and md5-prefix idioms can't drift between oracle builders.
  private def sqlGrams(n: Int): String = Dedup.shingleExpr(n)
  private def sqlH60(e: String): String = Dedup.sqlH60(e)

  private def sqlCensus(stage: Int, nm: String, cte: String): String =
    s"""SELECT CAST($stage AS BIGINT) AS stage, '$nm' AS stage_name,
       |  COUNT(*) AS n_docs,
       |  CAST(COALESCE(SUM(ntok),0) AS BIGINT) AS n_tokens,
       |  COALESCE(bit_xor(${sqlH60("CAST(doc_id AS VARCHAR)")}),0)
       |    AS doc_xor,
       |  COALESCE(bit_xor(${sqlH60("text")}),0) AS text_xor
       |FROM $cte""".stripMargin

  /** [[qCurateFull]] oracle. Gate-SF-only (two recursive reaches — the
    * q_dup_clusters family rule); MATERIALIZED on every CTE that is
    * read twice or sits under a recursion (the kcore inlining rule). */
  private lazy val curateFullSql: String = {
    import TextAnalysis.{MinSpanAnchors, SpanDfCap, SpanK, SpanOccCap}
    import Sampling.{DsirBuckets, DsirScale, DsirShift, DsirStep, DsirTargetLang}
    s"""WITH RECURSIVE
       |n0 AS (SELECT doc_id, source, lang, text, string_split(text,' ')
       |    AS t, CAST(len(string_split(text,' ')) AS BIGINT) AS ntok
       |  FROM documents),
       |c1 AS MATERIALIZED (SELECT * FROM n0 WHERE ntok >= $CfMinTokens),
       |c2 AS MATERIALIZED (SELECT doc_id, source, lang, text, t, ntok
       |  FROM (SELECT c1.*, ROW_NUMBER() OVER (
       |    PARTITION BY md5(regexp_replace(lower(text),
       |      '[^a-z0-9 ]', '', 'g'))
       |    ORDER BY doc_id ASC) AS fpr FROM c1) WHERE fpr = 1),
       |an AS (SELECT doc_id,
       |  unnest(generate_series(1, greatest(len(t)-${SpanK - 1}, 1)))
       |    AS pos,
       |  unnest(${sqlGrams(SpanK)}) AS span FROM c2),
       |ah AS MATERIALIZED (SELECT doc_id, CAST(pos AS BIGINT) AS pos,
       |  ${sqlH60("span")} AS h FROM an),
       |dup AS (SELECT h FROM ah GROUP BY h
       |  HAVING COUNT(DISTINCT doc_id) BETWEEN 2 AND $SpanDfCap
       |    AND COUNT(*) <= $SpanOccCap),
       |spr AS MATERIALIZED (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  a.pos AS pa, b.pos AS pb
       |  FROM ah a JOIN ah b ON a.h = b.h AND a.doc_id < b.doc_id
       |  WHERE a.h IN (SELECT h FROM dup)),
       |isl AS (SELECT doc_a, doc_b, pa - pb AS diag, pa, pb,
       |  pa - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
       |    ORDER BY pa ASC) AS grp FROM spr),
       |sp AS MATERIALIZED (SELECT doc_a, doc_b, MIN(pa) AS start_a,
       |  MIN(pb) AS start_b, COUNT(*) + ${SpanK - 1} AS len
       |  FROM isl GROUP BY doc_a, doc_b, diag, grp
       |  HAVING COUNT(*) >= $MinSpanAnchors),
       |iv AS (SELECT DISTINCT doc_id, st, en FROM (
       |  SELECT doc_a AS doc_id, start_a AS st,
       |    start_a + len - 1 AS en FROM sp
       |  UNION ALL
       |  SELECT doc_b, start_b, start_b + len - 1 FROM sp)),
       |cov AS (SELECT DISTINCT doc_id,
       |  unnest(generate_series(st, en)) AS pos FROM iv),
       |tp AS (SELECT doc_id, unnest(generate_series(1, len(t))) AS pos,
       |  unnest(t) AS tok FROM c2),
       |kept AS (SELECT t.doc_id, t.pos, t.tok FROM tp t
       |  ANTI JOIN cov USING (doc_id, pos)),
       |tr AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS na,
       |  string_agg(tok, ' ' ORDER BY pos) AS txt FROM kept GROUP BY 1),
       |c3 AS MATERIALIZED (SELECT c2.doc_id, c2.source, c2.lang,
       |  tr.txt AS text, tr.na AS ntok
       |  FROM c2 JOIN tr USING (doc_id) WHERE tr.na >= $CfMinTokens),
       |sh4 AS (SELECT doc_id, unnest(${sqlGrams(Dedup.JaccardN)}) AS s
       |  FROM c2),
       |ds4 AS (SELECT DISTINCT doc_id, s FROM sh4),
       |sz4 AS (SELECT doc_id, COUNT(*) AS n FROM ds4 GROUP BY 1),
       |rare4 AS (SELECT s FROM ds4 GROUP BY s
       |  HAVING COUNT(*) <= ${Dedup.DfCap}),
       |dsr4 AS MATERIALIZED (SELECT ds4.doc_id, ds4.s FROM ds4
       |  JOIN rare4 USING (s)),
       |pj AS MATERIALIZED (SELECT pr.doc_a, pr.doc_b, pr.inter,
       |  sa.n AS na, sb.n AS nb FROM
       |  (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |    CAST(COUNT(*) AS BIGINT) AS inter
       |   FROM dsr4 a JOIN dsr4 b ON a.s = b.s AND a.doc_id < b.doc_id
       |   GROUP BY 1, 2) pr
       |  JOIN sz4 sa ON sa.doc_id = pr.doc_a
       |  JOIN sz4 sb ON sb.doc_id = pr.doc_b),
       |e4p AS (SELECT doc_a, doc_b FROM pj WHERE 3*inter > na+nb
       |  AND doc_a IN (SELECT doc_id FROM c3)
       |  AND doc_b IN (SELECT doc_id FROM c3)),
       |e4 AS MATERIALIZED (SELECT doc_a AS s, doc_b AS d FROM e4p
       |  UNION SELECT doc_b, doc_a FROM e4p),
       |reach4(s, d) AS (
       |  SELECT s, s FROM e4
       |  UNION SELECT s, d FROM e4
       |  UNION SELECT reach4.s, e4.d FROM reach4 JOIN e4
       |    ON reach4.d = e4.s),
       |lab4 AS (SELECT s AS id, MIN(d) AS label FROM reach4 GROUP BY s),
       |c4 AS MATERIALIZED (SELECT c3.* FROM c3
       |  LEFT JOIN lab4 ON c3.doc_id = lab4.id
       |  WHERE ${sqlH60("CAST(COALESCE(lab4.label, c3.doc_id) AS VARCHAR)")}
       |    % 100 < 80),
       |tk5 AS (SELECT doc_id, lang, ${sqlH60("term")} % $DsirBuckets AS b
       |  FROM (SELECT doc_id, lang, unnest(string_split(text,' '))
       |    AS term FROM c4) WHERE term <> ''),
       |bs5 AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c_raw,
       |  CAST(SUM(CASE WHEN lang='$DsirTargetLang' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS c_tgt FROM tk5 GROUP BY 1),
       |tot5 AS (SELECT CAST(SUM(c_raw) AS BIGINT) AS t_raw,
       |  CAST(GREATEST(SUM(c_tgt),1) AS BIGINT) AS t_tgt FROM bs5),
       |w5 AS (SELECT b, (c_tgt+1) * $DsirScale // (c_raw+1)
       |  - t_tgt * $DsirScale // t_raw AS wt FROM bs5, tot5),
       |ds5 AS (SELECT tk5.doc_id,
       |  CAST(SUM(w5.wt) AS BIGINT) AS score
       |  FROM tk5 JOIN w5 USING (b) GROUP BY tk5.doc_id),
       |bud AS (SELECT CAST(COUNT(*) // $CfBudgetDiv AS BIGINT) AS k
       |  FROM c4),
       |db5 AS (SELECT doc_id, score,
       |  (score + $DsirShift) // $DsirStep AS bkt FROM ds5),
       |bh5 AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS cnt
       |  FROM db5 GROUP BY 1),
       |bc5 AS (SELECT bkt, cnt,
       |  CAST(COALESCE(SUM(cnt) OVER (ORDER BY bkt DESC
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),0)
       |    AS BIGINT) AS above FROM bh5),
       |sel5 AS (
       |  SELECT d.doc_id FROM db5 d JOIN bc5 ON d.bkt = bc5.bkt, bud
       |  WHERE bc5.above + bc5.cnt <= bud.k
       |  UNION ALL
       |  SELECT doc_id FROM (
       |    SELECT d.doc_id,
       |      ROW_NUMBER() OVER (PARTITION BY d.bkt
       |        ORDER BY d.score DESC, d.doc_id ASC) AS rnk,
       |      bc5.above, bud.k AS k
       |    FROM db5 d JOIN bc5 ON d.bkt = bc5.bkt, bud
       |    WHERE bc5.above < bud.k AND bc5.above + bc5.cnt > bud.k) t
       |  WHERE rnk <= k - above),
       |c5 AS (SELECT c4.* FROM c4
       |  WHERE doc_id IN (SELECT doc_id FROM sel5))
       |${sqlCensus(0, "raw", "n0")}
       |UNION ALL ${sqlCensus(1, "len_gate", "c1")}
       |UNION ALL ${sqlCensus(2, "exact_dedup", "c2")}
       |UNION ALL ${sqlCensus(3, "span_trim", "c3")}
       |UNION ALL ${sqlCensus(4, "leak_train", "c4")}
       |UNION ALL ${sqlCensus(5, "dsir_select", "c5")}
       |ORDER BY stage ASC""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "q_curate_full" -> curateFullSql,
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
        |FROM q GROUP BY source""".stripMargin,
    "q_curate_funnel" ->
      """WITH b AS (SELECT doc_id, source, text,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
        |  len(string_split(text, ' ')) >= 30 AS g FROM documents),
        |d2 AS (SELECT *, g AND ROW_NUMBER() OVER (
        |  PARTITION BY g,
        |    md5(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'))
        |  ORDER BY doc_id ASC) = 1 AS s2 FROM b),
        |d3 AS (SELECT *, s2 AND ROW_NUMBER() OVER (
        |  PARTITION BY s2, source
        |  ORDER BY md5(CAST(doc_id AS VARCHAR)) ASC, doc_id ASC) <= 12
        |  AS s3 FROM d2),
        |u AS (
        |  SELECT 0 AS stage, 'raw' AS stage_name, doc_id, ntok FROM d3
        |  UNION ALL SELECT 1, 'len_gate', doc_id, ntok FROM d3 WHERE g
        |  UNION ALL SELECT 2, 'exact_dedup', doc_id, ntok FROM d3
        |    WHERE s2
        |  UNION ALL SELECT 3, 'source_quota', doc_id, ntok FROM d3
        |    WHERE s3)
        |SELECT CAST(stage AS BIGINT) AS stage, stage_name,
        |COUNT(*) AS n_docs, CAST(SUM(ntok) AS BIGINT) AS n_tokens,
        |bit_xor(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)),
        |  1, 15)) AS BIGINT)) AS doc_checksum
        |FROM u GROUP BY 1, 2 ORDER BY 1 ASC""".stripMargin
  )
}
