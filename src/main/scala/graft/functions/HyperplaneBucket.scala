package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sign-bit hyperplane LSH bucket id as a native Catalyst expression:
  * bit p of the result is [vec · plane_p >= 0] for `planes` deterministic
  * pseudo-random hyperplanes over a `dim`-wide embedding.
  *
  * Why native: the Column-HOF form (transform/zip_with/aggregate over a
  * constant plane matrix) evaluates through boxed lambda calls —
  * planes × dim boxed multiplies per row. Fine in a fresh JVM, but the
  * sf10 bench showed it degrading several-fold inside a long-lived
  * session under GC pressure. This expression generates one primitive
  * double loop inside whole-stage codegen (same discipline as
  * [[SimHash64]]); the interpreted eval mirrors it exactly.
  *
  * Bucket values are identical to Similarity.lshBucket's HOF form (same
  * splitmix weight schedule), so plans and tests can mix the two.
  */
case class HyperplaneBucket(child: Expression, planes: Int, dim: Int,
                            planeOffset: Int = 0)
    extends UnaryExpression {
  require(planes >= 1 && planes <= 63, s"planes must be in [1,63]: $planes")
  require(dim >= 1, s"dim must be positive: $dim")
  require(planeOffset >= 0, s"planeOffset must be >= 0: $planeOffset")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  private def elementType: DataType = child.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    elementType match {
      case DoubleType | FloatType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"hyperplane_bucket requires array<float|double>, got " +
            child.dataType.simpleString(100))
    }

  // flat planes x dim weight matrix, built once per expression instance.
  // Rows are GLOBAL plane indices [planeOffset, planeOffset + planes): the
  // schedule depends only on the global index, so bucket(k planes at
  // offset o) reproduces exactly bits [o, o+k) of bucket(o+k planes at
  // offset 0) — banded callers draw disjoint plane sets that stay
  // bit-compatible with the packed single-signature form (pinned in
  // GraftProps).
  @transient private lazy val weights: Array[Double] =
    HyperplaneBucket.weightMatrix(planes, dim, planeOffset)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val isFloat = elementType == FloatType
    val n = math.min(arr.numElements(), dim)
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var dot = 0.0
      val base = p * dim
      var d = 0
      while (d < n) {
        if (!arr.isNullAt(d)) {
          val v = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
          dot += v * weights(base + d)
        }
        d += 1
      }
      if (dot >= 0) bucket |= (1L << p)
      p += 1
    }
    java.lang.Long.valueOf(bucket)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val w = ctx.addReferenceObj("planeWeights", weights, "double[]")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val d = ctx.freshName("d")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      val getter =
        if (elementType == FloatType) s"(double) $arr.getFloat($d)"
        else s"$arr.getDouble($d)"
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |${ev.value} = 0L;
         |for (int $p = 0; $p < $planes; $p++) {
         |  double $dot = 0.0;
         |  int $base = $p * $dim;
         |  for (int $d = 0; $d < $n; $d++) {
         |    if (!$arr.isNullAt($d)) {
         |      $dot += ($getter) * $w[$base + $d];
         |    }
         |  }
         |  if ($dot >= 0) ${ev.value} |= (1L << $p);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : HyperplaneBucket = copy(child = newChild)
}

object HyperplaneBucket {
  /** Deterministic splitmix64-style weight for (plane, dim) — the same
    * schedule Similarity's HOF form uses, kept here as the single
    * source of truth. */
  def weight(plane: Int, dim: Int): Double = {
    var z = plane.toLong * 0x9E3779B97F4A7C15L + dim.toLong + 1
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    (math.floorMod(z, 1000L).toDouble / 500.0) - 1.0
  }

  def weightMatrix(planes: Int, dim: Int, planeOffset: Int = 0)
      : Array[Double] = {
    val w = new Array[Double](planes * dim)
    var p = 0
    while (p < planes) {
      var d = 0
      while (d < dim) { w(p * dim + d) = weight(planeOffset + p, d); d += 1 }
      p += 1
    }
    w
  }

  /** Column form: hyperplaneBucket(vecCol, planes, dim[, planeOffset]). */
  def apply(vec: Column, planes: Int, dim: Int): Column =
    apply(vec, planes, dim, 0)

  def apply(vec: Column, planes: Int, dim: Int, planeOffset: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      HyperplaneBucket(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec),
        planes, dim, planeOffset))
}
