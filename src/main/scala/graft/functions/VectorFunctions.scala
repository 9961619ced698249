package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector (embedding) column functions over Array[Float] columns.
  *
  * Built from higher-order `functions._` (zip_with / aggregate), which
  * Catalyst evaluates as a sequential left-to-right fold — the same
  * iteration order DuckDB's list functions use, so double-precision
  * results agree with the oracle. float×float products are exact in
  * double (24+24 significand bits < 53), so the only rounding is in the
  * ordered accumulation, identical on both engines.
  *
  * No shuffle: these are narrow per-row expressions; similarity *search*
  * strategies (broadcast query set, LSH bucketing) live in
  * [[graft.operators.Similarity]].
  */
object VectorFunctions {

  private def d(x: Column): Column = x.cast("double")

  /** Σ aᵢ·bᵢ as a sequential double fold. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => d(x) * d(y)), lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² (sequential). */
  def sqNorm(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + d(x) * d(x))

  def norm(a: Column): Column = sqrt(sqNorm(a))

  /** Cosine similarity, shaped as dot/(sqrt(na)·sqrt(nb)) — the same
    * expression tree as DuckDB `list_cosine_similarity`. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(sqNorm(a)) * sqrt(sqNorm(b)))
}
