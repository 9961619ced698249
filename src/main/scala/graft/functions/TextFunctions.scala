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

  /** Canonical text normalization for fingerprinting: lowercase, strip
    * everything but [a-z0-9 ]. */
  def normalize(text: Column): Column =
    regexp_replace(lower(text), "[^a-z0-9 ]", "")

  /** Deterministic 128-bit content fingerprint (hex). */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Number of tokens drawn from a fixed marker set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers)))

  /** PII scrubbing for training-data curation: emails, long digit runs
    * (phone/account numbers) and bare IPv4s replaced with stable
    * placeholder tokens. Pure regexp_replace chain — narrow,
    * codegen'd, linear at 100 TB. Patterns are deliberately portable
    * regex (no lookarounds), so the same scrub is expressible in any
    * engine a corpus is audited with. */
  def scrubPii(text: Column): Column = {
    val email = regexp_replace(text,
      "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>")
    val ip = regexp_replace(email,
      "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>")
    regexp_replace(ip, "[0-9][0-9 ()+.-]{7,}[0-9]", "<NUMBER>")
  }

  /** Count of PII matches a scrub pass would redact. */
  def piiCount(text: Column): Column =
    size(regexp_extract_all(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" +
        "|\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b" +
        "|[0-9][0-9 ()+.-]{7,}[0-9]"), lit(0)))

  /** 60-bit integer from 15 hex chars of md5(x) starting at 1-based hex
    * position `startHex` — the engine's standard oracle-reproducible
    * hash: `CAST(('0x' || substr(md5(x), startHex, 15)) AS BIGINT)`.
    * Different startHex values give independent hash streams from one
    * md5 evaluation. */
  def md5Prefix60(c: Column, startHex: Int = 1): Column =
    conv(substring(md5(c), startHex, 15), 16, 10).cast("long")
}
