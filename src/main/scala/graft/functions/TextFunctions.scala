package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for LLM-data-pipeline operators.
  *
  * Everything here is built from `org.apache.spark.sql.functions`
  * (whole-stage-codegen'd, no UDFs) and is a pure narrow map — no
  * shuffle, so these scale linearly to any corpus size.
  *
  * Hash family is md5 (identical in Spark and DuckDB) so every derived
  * value is oracle-checkable; never engine-specific xxhash64/murmur.
  */
object TextFunctions {

  /** Whitespace tokens. Mirrors DuckDB `string_split(text, ' ')`. */
  def tokens(text: Column): Column = split(text, " ")

  /** Word n-gram shingles as space-joined strings.
    * Mirrors DuckDB
    * `list_transform(generate_series(1, greatest(len(t)-(n-1),1)),
    *    i -> array_to_string(t[i:i+n-1], ' '))`. */
  def shingles(toks: Column, n: Int): Column =
    transform(
      sequence(lit(1), greatest(size(toks) - (n - 1), lit(1))),
      i => concat_ws(" ", slice(toks, i, lit(n))))

  /** Canonical text normalization for fingerprinting: lowercase, strip
    * everything but [a-z0-9 ]. */
  def normalize(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9 ]", "")

  /** Deterministic 128-bit content fingerprint (hex). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Number of tokens drawn from a fixed marker set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** One MinHash signature value: lexicographic min of seeded md5 over
    * the shingle set. Identical formula in DuckDB:
    * `list_aggregate(list_transform(sh, x -> md5('<seed>|' || x)), 'min')`. */
  def minhash(shingleCol: Column, seed: Int): Column =
    array_min(transform(shingleCol, x => md5(concat(lit(s"$seed|"), x))))

  /** 60-bit shingle/token hash from the md5 hex prefix — reproducible
    * in DuckDB as `CAST(('0x' || substr(md5(t),1,15)) AS BIGINT)`. */
  def tokenHash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")
}
