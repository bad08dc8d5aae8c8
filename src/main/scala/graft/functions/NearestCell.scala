package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest-centroid cell assignment over a fixed centroid matrix as a
  * native Catalyst expression: one primitive double loop inside
  * whole-stage codegen, same discipline as [[CosineSim]] /
  * [[HyperplaneBucket]].
  *
  * Why native: the Column-HOF quantizer (`transform(typedlit(matrix),
  * c => aggregate(zip_with(...)))`) pays a boxed lambda call per
  * element per centroid per row — nlist × dim boxed ops per vector. At
  * the semantic-dedup probe's sf10 rung (200k × 64-dim, nlist=400) the
  * HOF assignment alone dominated a 185 s pass; this kernel does the
  * identical arithmetic in a flat double[] loop.
  *
  * Semantics (shared by eval and codegen):
  *   - `cosine = true`: cell = argmax over centroids of
  *     dot(v, c) / (|v| · |c|); `cosine = false`: cell = argmin of
  *     squared L2 distance. Accumulation is left-to-right in double —
  *     bit-identical to the HOF fold — and ties keep the LOWEST
  *     centroid index (strict comparison), matching `array_position`'s
  *     first-occurrence rule.
  *   - NULL iff the input array is null, has a null element, or its
  *     length differs from the centroid dim (the HOF form's
  *     null-poisoned fold corner); callers treat a null cell as
  *     "unassigned" and such rows join nothing.
  *   - Cosine mode: a zero-norm input is NULL (unassignable), and
  *     zero-norm centroids are never selected — a deliberate clean-up
  *     of the HOF form's NaN-ordering corners, which no caller relied
  *     on (embeddings are never zero).
  *
  * Centroid norms are precomputed once per (plan, matrix); the matrix
  * rides into generated code as a reference object, so the expression
  * tree stays constant-size regardless of nlist × dim. */
case class NearestCell(child: Expression, centroids: Array[Array[Double]],
    cosine: Boolean) extends UnaryExpression {

  require(centroids.nonEmpty && centroids.forall(_.length ==
    centroids.head.length), "centroids must be non-empty and rectangular")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_cell"

  private def elemFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType | FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell requires array<float|double>, got " +
            other.simpleString(100))
    }

  @transient private lazy val flat: Array[Double] = centroids.flatten
  @transient private lazy val norms: Array[Double] =
    centroids.map(c => math.sqrt(c.map(x => x * x).sum))
  private def dim: Int = centroids.head.length
  private def k: Int = centroids.length

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val cell = NearestCell.assign(arr, elemFloat, flat, norms, dim, k, cosine)
    if (cell < 0) null else java.lang.Integer.valueOf(cell)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val flatRef = ctx.addReferenceObj("cellFlat", flat, "double[]")
    val normsRef = ctx.addReferenceObj("cellNorms", norms, "double[]")
    val helper = NearestCell.getClass.getName.stripSuffix("$")
    val isFloat = if (elemFloat) "true" else "false"
    val cos = if (cosine) "true" else "false"
    val cell = ctx.freshName("cell")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |int $cell = $helper.assign($a, $isFloat, $flatRef, $normsRef,
         |  $dim, $k, $cos);
         |if ($cell < 0) { ${ev.isNull} = true; } else { ${ev.value} = $cell; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : NearestCell = copy(child = newChild)
}

object NearestCell {
  /** Shared kernel (static forwarder for generated code): returns the
    * winning centroid index, or -1 for the NULL cases documented on the
    * expression. */
  def assign(arr: ArrayData, isFloat: Boolean, flat: Array[Double],
      norms: Array[Double], dim: Int, k: Int, cosine: Boolean): Int =
    assignRange(arr, isFloat, flat, norms, dim, 0, k, cosine)

  /** [[assign]] restricted to centroid rows [from, to) of the flat
    * matrix — the ragged-dispatch primitive [[NearestSubCell]] rides on.
    * Returns the winning row's ABSOLUTE index in the flat matrix (so
    * two-level cell ids are globally unique without a per-cell stride),
    * or -1 for the NULL corners. Same arithmetic, same tie rule (first
    * row in range wins) as the single-matrix form. */
  def assignRange(arr: ArrayData, isFloat: Boolean, flat: Array[Double],
      norms: Array[Double], dim: Int, from: Int, to: Int,
      cosine: Boolean): Int = {
    val n = arr.numElements()
    if (n != dim) return -1
    val v = new Array[Double](dim)
    var i = 0
    var vn = 0.0
    while (i < dim) {
      if (arr.isNullAt(i)) return -1
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      v(i) = x
      vn += x * x
      i += 1
    }
    val sv = math.sqrt(vn)
    if (cosine && sv == 0.0) return -1
    var best = -1
    var bestScore = 0.0
    var c = from
    while (c < to) {
      val off = c * dim
      var acc = 0.0
      var j = 0
      if (cosine) {
        if (norms(c) > 0.0) {
          while (j < dim) { acc += v(j) * flat(off + j); j += 1 }
          acc = acc / (sv * norms(c))
          if (best < 0 || acc > bestScore) { best = c; bestScore = acc }
        }
      } else {
        while (j < dim) {
          val d = v(j) - flat(off + j); acc += d * d; j += 1
        }
        if (best < 0 || acc < bestScore) { best = c; bestScore = acc }
      }
      c += 1
    }
    best
  }

  /** Column form. */
  def apply(vec: Column, centroids: Array[Array[Double]],
      cosine: Boolean): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NearestCell(
        org.apache.spark.sql.graft.ColumnBridge.expression(vec),
        centroids, cosine))
}
