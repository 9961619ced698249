package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Symmetric int8 embedding quantization: 4× smaller storage/shuffle
  * for the embedding column, with per-vector scales (the standard
  * similarity-search compression). Pure `functions._` composition —
  * a narrow map either way, used at write time rather than in the
  * per-pair hot loop (which stays float via CosineSimFloat).
  */
object Quantize {

  private def maxAbs(v: Column): Column =
    greatest(array_max(transform(v, x => abs(x.cast("double")))), lit(1e-30))

  /** Array[Float] → struct(scale: double, codes: array[tinyint]),
    * codes = round(x · 127 / max|x|). */
  def quantizeInt8(v: Column): Column = {
    val scale = lit(127.0) / maxAbs(v)
    struct(
      scale.as("scale"),
      transform(v, x => round(x.cast("double") * scale).cast("tinyint")).as("codes"))
  }

  /** Inverse: struct(scale, codes) → Array[Double] approximation. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") / q.getField("scale"))
}
