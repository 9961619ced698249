package graft.functions

/** Harmonic-mean estimator over a HyperLogLog register table (built
  * deterministically by
  * [[graft.operators.Events.qHllRegisters]]; missing buckets are
  * empty registers). Kept OUT of the oracle-gated query on purpose:
  * the registers are integer-exact and gate bit-for-bit, while this
  * final float step is spec-gated for tolerance (±2σ ≈ 26% at m=64;
  * standard error 1.04/√m). Includes the standard small-range
  * linear-counting correction. */
object Hll {
  def estimate(registers: Map[Long, Long], m: Int = 64): Double = {
    require(m > 0 && registers.keys.forall(b => b >= 0 && b < m))
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val regs = (0 until m).map(b => registers.getOrElse(b.toLong, 0L))
    val z = 1.0 / regs.map(r => math.pow(2.0, -r.toDouble)).sum
    val e = alpha * m * m * z
    val zeros = regs.count(_ == 0L)
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}
