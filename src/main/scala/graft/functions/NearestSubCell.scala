package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Second-level nearest-centroid dispatch for the two-level (coarse →
  * sub) quantizer: given a COARSE cell id (left child, from
  * [[NearestCell]]) and the vector (right child), picks the nearest
  * among THAT cell's sub-centroids and returns its GLOBAL flat row
  * index — already unique across cells, so the pair (coarse, sub)
  * never needs re-keying downstream.
  *
  * Why a second kernel instead of one flat [[NearestCell]] over
  * coarse × sub centroids: flat assignment costs (coarse · sub) · dim
  * flops per row; the two-level form costs (coarse + sub) · dim — at
  * the 100 TB SemDeDup regime (effective nlist ≈ n/500 ≈ 10⁵..10⁶)
  * that is the difference between scan-speed assignment and a compute
  * wall. The ragged sub-centroid matrix rides into generated code as
  * flat reference arrays (values, norms, per-cell offsets), so the
  * expression tree stays constant-size regardless of total centroid
  * count.
  *
  * Semantics: NULL iff the coarse cell is null (unassigned input rows
  * stay unassigned) or the vector hits [[NearestCell]]'s own NULL
  * corners (null element, dim mismatch, zero-norm in cosine mode, or —
  * cosine only — a cell whose sub-centroids are all zero-norm). Within
  * a cell the tie rule is the same first-row-wins as [[NearestCell]].
  * A coarse id outside [0, ncells) is a caller bug and also yields
  * NULL rather than an exception (the join-nothing contract callers
  * already apply to null cells). */
case class NearestSubCell(cellChild: Expression, vecChild: Expression,
    subCentroids: Array[Array[Array[Double]]], cosine: Boolean)
    extends BinaryExpression {

  require(subCentroids.nonEmpty && subCentroids.forall(_.nonEmpty),
    "every coarse cell needs at least one sub-centroid")
  private def dim: Int = subCentroids.head.head.length
  require(subCentroids.forall(_.forall(_.length == dim)),
    "sub-centroids must share one dimension across all cells")

  override def left: Expression = cellChild
  override def right: Expression = vecChild
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "nearest_sub_cell"

  private def elemFloat: Boolean = vecChild.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (cellChild.dataType, vecChild.dataType) match {
      case (IntegerType, ArrayType(DoubleType | FloatType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_sub_cell requires (int, array<float|double>), got " +
            s"(${l.simpleString(100)}, ${r.simpleString(100)})")
    }

  @transient private lazy val flat: Array[Double] =
    subCentroids.flatten.flatten
  @transient private lazy val norms: Array[Double] =
    subCentroids.flatten.map(c => math.sqrt(c.map(x => x * x).sum))
  // offsets(c) = first flat row of cell c; offsets(ncells) = total rows
  @transient private lazy val offsets: Array[Int] =
    subCentroids.scanLeft(0)(_ + _.length)
  private def ncells: Int = subCentroids.length

  override def nullSafeEval(cellV: Any, vecV: Any): Any = {
    val c = cellV.asInstanceOf[Int]
    if (c < 0 || c >= ncells) return null
    val sub = NearestCell.assignRange(vecV.asInstanceOf[ArrayData],
      elemFloat, flat, norms, dim, offsets(c), offsets(c + 1), cosine)
    if (sub < 0) null else java.lang.Integer.valueOf(sub)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val flatRef = ctx.addReferenceObj("subFlat", flat, "double[]")
    val normsRef = ctx.addReferenceObj("subNorms", norms, "double[]")
    val offRef = ctx.addReferenceObj("subOffsets", offsets, "int[]")
    val helper = NearestCell.getClass.getName.stripSuffix("$")
    val isFloat = if (elemFloat) "true" else "false"
    val cos = if (cosine) "true" else "false"
    val sub = ctx.freshName("sub")
    nullSafeCodeGen(ctx, ev, (cell, vec) => {
      s"""
         |if ($cell < 0 || $cell >= $ncells) { ${ev.isNull} = true; }
         |else {
         |  int $sub = $helper.assignRange($vec, $isFloat, $flatRef,
         |    $normsRef, $dim, $offRef[$cell], $offRef[$cell + 1], $cos);
         |  if ($sub < 0) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $sub; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): NearestSubCell =
    copy(cellChild = newLeft, vecChild = newRight)
}

object NearestSubCell {
  /** Column form. */
  def apply(cell: Column, vec: Column,
      subCentroids: Array[Array[Array[Double]]], cosine: Boolean): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NearestSubCell(
        org.apache.spark.sql.graft.ColumnBridge.expression(cell),
        org.apache.spark.sql.graft.ColumnBridge.expression(vec),
        subCentroids, cosine))
}
