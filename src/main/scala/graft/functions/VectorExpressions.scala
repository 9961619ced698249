package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the embedding hot path.
  *
  * The higher-order-function formulation in [[VectorFunctions]] is
  * oracle-exact but interpreted (~30 µs per 64-dim cosine): at 100 TB a
  * pairwise similarity scan would be dominated by expression-eval
  * overhead, not FLOPs. These expressions generate a tight fused Java
  * loop inside whole-stage codegen — same sequential left-to-right
  * double accumulation as the HOF versions, so results are bitwise
  * identical and remain DuckDB-comparable.
  */
object VectorExpressions {

  /** Fused cosine similarity over two Array[Float] columns. */
  case class CosineSimFloat(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes =
      Seq(ArrayType(FloatType), ArrayType(FloatType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "cosine_sim_f"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xi = x.getFloat(i).toDouble
        val yi = y.getFloat(i).toDouble
        dot += xi * yi; na += xi * xi; nb += yi * yi; i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // fresh names: the same expression can be inlined twice into one
      // generated function (e.g. a collapsed filter + project)
      val (n, dot, na, nb, i, x, y) = (ctx.freshName("n"), ctx.freshName("dot"),
        ctx.freshName("na"), ctx.freshName("nb"), ctx.freshName("i"),
        ctx.freshName("x"), ctx.freshName("y"))
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $dot = 0.0, $na = 0.0, $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $x = (double) $a.getFloat($i);
           |  double $y = (double) $b.getFloat($i);
           |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |}
           |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Signed-random-projection LSH bucket id: bit p of the result is set
    * iff embedding · planes(p) > 0. One fused loop instead of P
    * higher-order dot products. */
  case class SignedProjBuckets(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = LongType
    override def prettyName: String = "signed_proj_buckets"

    override protected def nullSafeEval(a: Any): Any = {
      val v = a.asInstanceOf[ArrayData]
      var bucket = 0L
      var p = 0
      while (p < planes.length) {
        val plane = planes(p)
        val n = math.min(v.numElements(), plane.length)
        var dot = 0.0; var i = 0
        while (i < n) { dot += v.getFloat(i).toDouble * plane(i); i += 1 }
        if (dot > 0.0) bucket |= 1L << p
        p += 1
      }
      bucket
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      val (bucket, p, plane, n, dot, i) = (ctx.freshName("bucket"),
        ctx.freshName("p"), ctx.freshName("plane"), ctx.freshName("n"),
        ctx.freshName("dot"), ctx.freshName("i"))
      nullSafeCodeGen(ctx, ev, v =>
        s"""
           |long $bucket = 0L;
           |for (int $p = 0; $p < $planesRef.length; $p++) {
           |  double[] $plane = $planesRef[$p];
           |  int $n = java.lang.Math.min($v.numElements(), $plane.length);
           |  double $dot = 0.0;
           |  for (int $i = 0; $i < $n; $i++) $dot += ((double) $v.getFloat($i)) * $plane[$i];
           |  if ($dot > 0.0) $bucket |= 1L << $p;
           |}
           |${ev.value} = $bucket;
         """.stripMargin)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Index (1-based, 0 = empty) of the max-cosine centroid, ties to the
    * lowest index — the IVF coarse-quantizer assignment, one fused loop
    * over all centroids. Centroids are a bounded model parameter
    * (collected once, like k-means centers), shipped to executors via
    * the codegen reference table. */
  case class NearestCentroid(child: Expression, centroids: Array[Array[Float]])
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes = Seq(ArrayType(FloatType))
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_centroid"

    override protected def nullSafeEval(a: Any): Any =
      VectorExpressions.nearestCentroidEval(a.asInstanceOf[ArrayData], centroids)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.VectorExpressions.nearestCentroidJava($v, $cRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nearestCentroidEval(v: ArrayData, centroids: Array[Array[Float]]): Int =
    nearestCentroidJava(v, centroids)

  // Called from generated code; argmax of cosine, 1-based, ties → lowest.
  def nearestCentroidJava(v: ArrayData, centroids: Array[Array[Float]]): Int = {
    var best = 0
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < centroids.length) {
      val ct = centroids(c)
      val n = math.min(v.numElements(), ct.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val x = v.getFloat(i).toDouble; val y = ct(i).toDouble
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      val cos = dot / (math.sqrt(na) * math.sqrt(nb))
      if (cos > bestCos) { bestCos = cos; best = c + 1 }
      c += 1
    }
    best
  }

  /** Index (1-based) of the L2-NEAREST codeword of subspace `space` —
    * the product-quantization assignment primitive. Unlike
    * [[NearestCentroid]] (cosine argmax, right for IVF cell routing),
    * codeword choice must minimize the RECONSTRUCTION error of the
    * residual subvector, i.e. squared L2 — a cosine argmin would
    * ignore magnitude and wreck the ADC dot approximation. Ties go to
    * the lowest index; eval and codegen share one static method, so
    * the paths are bitwise identical. */
  case class NearestCodeword(vec: Expression, space: Expression,
                             codebooks: Array[Array[Array[Float]]])
      extends BinaryExpression with ExpectsInputTypes {
    override def left: Expression = vec
    override def right: Expression = space
    override def inputTypes = Seq(ArrayType(FloatType), IntegerType)
    override def dataType: DataType = IntegerType
    override def prettyName: String = "nearest_codeword"

    override protected def nullSafeEval(v: Any, j: Any): Any =
      VectorExpressions.nearestCodewordJava(
        v.asInstanceOf[ArrayData], j.asInstanceOf[Int], codebooks)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cRef = ctx.addReferenceObj("codebooks", codebooks, "float[][][]")
      nullSafeCodeGen(ctx, ev, (v, j) =>
        s"${ev.value} = graft.functions.VectorExpressions" +
          s".nearestCodewordJava($v, $j, $cRef);")
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(vec = newLeft, space = newRight)
  }

  // Called from generated code; argmin of squared L2, 1-based, ties →
  // lowest index.
  def nearestCodewordJava(v: ArrayData, space: Int,
                          codebooks: Array[Array[Array[Float]]]): Int = {
    val cws = codebooks(space)
    var best = 0
    var bestD = Double.PositiveInfinity
    var c = 0
    while (c < cws.length) {
      val cw = cws(c)
      val n = math.min(v.numElements(), cw.length)
      var d = 0.0; var i = 0
      while (i < n) {
        val diff = v.getFloat(i).toDouble - cw(i).toDouble
        d += diff * diff; i += 1
      }
      if (d < bestD) { bestD = d; best = c + 1 }
      c += 1
    }
    best
  }

  def cosineFast(a: Column, b: Column): Column =
    Bridge.column(CosineSimFloat(
      Bridge.expression(a), Bridge.expression(b)))

  def nearestCentroid(v: Column, centroids: Array[Array[Float]]): Column =
    Bridge.column(NearestCentroid(Bridge.expression(v), centroids))

  def nearestCodeword(v: Column, space: Column,
                      codebooks: Array[Array[Array[Float]]]): Column =
    Bridge.column(NearestCodeword(
      Bridge.expression(v), Bridge.expression(space), codebooks))

  def signedProjBuckets(v: Column, planes: Array[Array[Double]]): Column =
    Bridge.column(SignedProjBuckets(Bridge.expression(v), planes))
}
