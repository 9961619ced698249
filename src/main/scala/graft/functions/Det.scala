package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic floating-point aggregation helpers.
  *
  * Summing doubles is order-dependent, and Spark's partial aggregation
  * order differs from the DuckDB oracle's sequential scan. We therefore
  * accumulate through DECIMAL (exact, order-independent) and convert to
  * double only at the end. With unscaled magnitude < 2^53 the final
  * decimal→double conversion is a single correctly-rounded division in
  * both engines, so results match bit-for-bit.
  *
  * Scale choice: the source columns carry ≤2 decimal digits, so
  * products of up to three of them are exactly representable at scale
  * 6. Spark casts double→decimal via the shortest string repr
  * (HALF_UP) while DuckDB rounds the exact binary expansion — those
  * disagree when the true value sits on a rounding boundary, which at
  * scale 6 never happens for these exact-at-6dp expressions.
  *
  * The same casts appear verbatim in the DuckDB oracle SQL
  * (`CAST(SUM(CAST(x AS DECIMAL(28,6))) AS DOUBLE)`).
  */
object Det {
  val Dec = "decimal(28,6)"

  /** Wider scale for values that carry more than 6 decimal digits
    * (e.g. norms pre-rounded to 9 dp). A double holding a value rounded
    * to ≤9 dp re-rounds to the same value at scale 12 in both engines:
    * the double sits within ~1 ulp of the 9-dp decimal, far from any
    * 0.5e-12 boundary, and no dyadic rational lies exactly on a decimal
    * half-way point. */
  val Dec12 = "decimal(38,12)"

  /** Exact sum of a double column, emitted as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Exact-sum average: identical double ops on both engines. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** Exact sum at scale 12 — for inputs pre-rounded to ≤9 dp. */
  def dsum12(c: Column): Column = sum(c.cast(Dec12)).cast("double")

  /** SQL fragments for the oracle side. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(28,6))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"${sqlSum(expr)} / COUNT(*)"
  def sqlSum12(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(38,12))) AS DOUBLE)"
}
