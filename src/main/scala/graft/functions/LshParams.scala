package graft.functions

/** Scale-adaptive LSH parameterization (shared by the embedding
  * near-dup OR-construction and the SimHash prefix buckets).
  *
  * A compile-time-constant bucket space is a quadratic floor at corpus
  * scale: with B buckets, candidate volume is ~N²/B no matter how the
  * join is partitioned. The fix is to let the bucket-space width track
  * the corpus: `planes(n) = clamp(MinPlanes, max, floor(log2 n) −
  * OccLog2)`, which keeps MEAN bucket occupancy ≈ 2^OccLog2 at any
  * scale — at 10⁹ vectors that is 25 planes / 32-member buckets
  * instead of 8 planes / 4-million-member buckets.
  *
  * Determinism across engines: `floor(log2 n)` is computed with integer
  * bit arithmetic here and as a CASE ladder of exact power-of-two
  * BIGINT thresholds in the DuckDB mirror ([[ladderSql]]) — no
  * floating-point log in either engine, so both sides pick the same
  * width for every corpus size by construction (boundary-tested in
  * LshScaleSpec).
  *
  * Mean occupancy is a target, not a bound: skewed data still produces
  * hot buckets, which is what the per-bucket [[BucketCap]] (star
  * fallback, see Similarity/Dedup pair generators) is for.
  */
object LshParams {

  /** Target log2 of mean bucket occupancy (2^5 = 32 members). */
  val OccLog2 = 5

  /** Width floor — tiny corpora degenerate to brute force anyway. */
  val MinPlanes = 4

  /** Width ceiling for embedding LSH. The oracle mirror materializes
    * the full MaxPlanes-bit bucket expression and masks it down, so
    * this is the only compile-time constant left — it supports ~2^29
    * (500M) vectors at target occupancy; raise it (one constant, the
    * mask machinery is width-agnostic) for larger corpora. */
  val MaxPlanes = 24

  /** Width ceiling for the 32-bit SimHash prefix. Wider prefixes prune
    * harder but a prefix is a single AND-construction (no OR tables),
    * so past 16 bits the miss rate on Hamming≤6 true pairs dominates. */
  val MaxPrefix = 16

  /** Per-(table, bucket) occupancy above which pair generation falls
    * back from all-pairs (≤ cap²/2 per bucket) to star pairs around
    * the bucket minimum (f−1 per bucket): volume stays bounded AND a
    * pathological N-copy bucket keeps full connectivity for
    * clustering, instead of being silently dropped. */
  val BucketCap = 512

  /** floor(log2 n) by bit position — exact for all n ≥ 1. */
  def floorLog2(n: Long): Int =
    63 - java.lang.Long.numberOfLeadingZeros(math.max(n, 1L))

  /** Bucket-space width (hyperplane count / prefix bits) for a corpus
    * of n items. */
  def widthForCount(n: Long, max: Int = MaxPlanes): Int =
    math.min(max, math.max(MinPlanes, floorLog2(n) - OccLog2))

  /** DuckDB mirror of [[widthForCount]] over a COUNT(*) expression:
    * a CASE ladder of exact BIGINT power-of-two thresholds.
    * `width = p` ⟺ `2^(p+OccLog2) ≤ n < 2^(p+1+OccLog2)` (clamped). */
  def ladderSql(cntExpr: String, max: Int = MaxPlanes): String = {
    val whens = (MinPlanes until max)
      .map(p => s"WHEN $cntExpr < ${1L << (p + 1 + OccLog2)} THEN $p")
    s"(CASE ${whens.mkString(" ")} ELSE $max END)"
  }
}
