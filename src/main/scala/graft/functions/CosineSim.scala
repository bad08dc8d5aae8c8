package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Cosine similarity between two float/double array columns as a native
  * Catalyst expression: one primitive double loop inside whole-stage
  * codegen, same discipline as [[HyperplaneBucket]].
  *
  * Why native: the Column-HOF form (`aggregate(zip_with(...))`) pays a
  * boxed lambda call per element per row. On the similarity-heavy
  * operators (near-dup candidate verification, brute-force / IVF / LSH
  * top-k) the cosine is evaluated millions of times per job, and the
  * banded self-join bench showed the HOF eval dominating wall time once
  * candidate volume grows.
  *
  * Semantics mirror the HOF form EXACTLY (pinned by a ScalaCheck parity
  * property whose generator includes whole-NULL arrays): element
  * products/squares accumulate left-to-right in double; a length
  * mismatch or any null element yields NULL (zip_with pads with null,
  * which nulls the whole fold); an all-zero norm on either side yields
  * 0.0, never a division by zero — INCLUDING against a whole-NULL or
  * null-element other side, because the HOF's three-valued zero-norm
  * check (`null || true` = true) precedes the null-poisoned dot. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case _ => NullType
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (DoubleType | FloatType, DoubleType | FloatType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cosine_sim requires two array<float|double> inputs, got " +
            s"${left.dataType.simpleString(100)} and " +
            s"${right.dataType.simpleString(100)}")
    }

  // HOF-faithful corner semantics: the reference form checks the
  // per-side zero norms BEFORE the (null-poisoned) dot product, so a
  // null-free all-zero side forces 0.0 even when the OTHER side has
  // nulls, has a mismatched length — or is WHOLE-NULL: in three-valued
  // logic `when(na === 0 || nb === 0, 0.0)` fires on `null || true`,
  // so cosineHof(NULL, all-zero) is 0.0, not NULL. eval/codegen are
  // overridden (not nullSafe*) to reproduce exactly that.
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a == null || b == null) {
      // 0.0 iff the PRESENT side is null-free all-zero (its norm is a
      // non-null 0 -> the when-condition is `null || true` = true);
      // otherwise the condition is null/false with a null dot -> NULL
      val present = if (a == null) b else a
      if (present != null && CosineSim.nullFreeAllZero(
          present.asInstanceOf[ArrayData],
          elemType(if (a == null) right else left) == FloatType))
        java.lang.Double.valueOf(0.0)
      else null
    } else nullSafeEval(a, b)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val aa = a.asInstanceOf[ArrayData]
    val bb = b.asInstanceOf[ArrayData]
    val an = aa.numElements(); val bn = bb.numElements()
    val aFloat = elemType(left) == FloatType
    val bFloat = elemType(right) == FloatType
    var na = 0.0; var nb = 0.0; var aNull = false; var bNull = false
    var i = 0
    while (i < an) {
      if (aa.isNullAt(i)) aNull = true
      else { val x = if (aFloat) aa.getFloat(i).toDouble else aa.getDouble(i)
        na += x * x }
      i += 1
    }
    i = 0
    while (i < bn) {
      if (bb.isNullAt(i)) bNull = true
      else { val y = if (bFloat) bb.getFloat(i).toDouble else bb.getDouble(i)
        nb += y * y }
      i += 1
    }
    val sa = math.sqrt(na); val sb = math.sqrt(nb)
    if ((!aNull && sa == 0.0) || (!bNull && sb == 0.0))
      return java.lang.Double.valueOf(0.0)
    if (aNull || bNull || an != bn) return null
    var dot = 0.0
    i = 0
    while (i < an) {
      val x = if (aFloat) aa.getFloat(i).toDouble else aa.getDouble(i)
      val y = if (bFloat) bb.getFloat(i).toDouble else bb.getDouble(i)
      dot += x * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (sa * sb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val helper = CosineSim.getClass.getName.stripSuffix("$")
    val aFloatJ = if (elemType(left) == FloatType) "true" else "false"
    val bFloatJ = if (elemType(right) == FloatType) "true" else "false"
    val present = ctx.freshName("present")
    val presFloat = ctx.freshName("presFloat")
    val body = mainBody(ctx, ev, leftGen.value.toString,
      rightGen.value.toString)
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val code =
      code"""
         |${leftGen.code}
         |${rightGen.code}
         |boolean ${ev.isNull} = false;
         |double ${ev.value} = 0.0;
         |if (${leftGen.isNull} || ${rightGen.isNull}) {
         |  ${ev.isNull} = true;
         |  if (!${leftGen.isNull} || !${rightGen.isNull}) {
         |    org.apache.spark.sql.catalyst.util.ArrayData $present =
         |      ${leftGen.isNull} ? ${rightGen.value} : ${leftGen.value};
         |    boolean $presFloat = ${leftGen.isNull} ? $bFloatJ : $aFloatJ;
         |    if ($helper.nullFreeAllZero($present, $presFloat)) {
         |      ${ev.isNull} = false;
         |      ${ev.value} = 0.0;
         |    }
         |  }
         |} else {
         |  $body
         |}
       """.stripMargin
    ev.copy(code = code)
  }

  private def mainBody(ctx: CodegenContext, ev: ExprCode,
      a: String, b: String): String = {
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val getA =
        if (elemType(left) == FloatType) s"(double) $a.getFloat($i)"
        else s"$a.getDouble($i)"
      val getB =
        if (elemType(right) == FloatType) s"(double) $b.getFloat($i)"
        else s"$b.getDouble($i)"
      val an = ctx.freshName("an")
      val bn = ctx.freshName("bn")
      val aNull = ctx.freshName("aNull")
      val bNull = ctx.freshName("bNull")
      s"""
         |int $an = $a.numElements();
         |int $bn = $b.numElements();
         |double $na = 0.0; double $nb = 0.0;
         |boolean $aNull = false; boolean $bNull = false;
         |for (int $i = 0; $i < $an; $i++) {
         |  if ($a.isNullAt($i)) { $aNull = true; }
         |  else { double $x = $getA; $na += $x * $x; }
         |}
         |for (int $i = 0; $i < $bn; $i++) {
         |  if ($b.isNullAt($i)) { $bNull = true; }
         |  else { double $y = $getB; $nb += $y * $y; }
         |}
         |double $sa = java.lang.Math.sqrt($na);
         |double $sb = java.lang.Math.sqrt($nb);
         |if ((!$aNull && $sa == 0.0) || (!$bNull && $sb == 0.0)) {
         |  ${ev.value} = 0.0;
         |} else if ($aNull || $bNull || $an != $bn) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $an; $i++) {
         |    double $x = $getA;
         |    double $y = $getB;
         |    $dot += $x * $y;
         |  }
         |  ${ev.value} = $dot / ($sa * $sb);
         |}
       """.stripMargin
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSim = copy(left = newLeft, right = newRight)
}

object CosineSim {
  /** True iff the array has no null elements and every element is 0 —
    * the condition under which the HOF reference form's zero-norm check
    * short-circuits to 0.0 even against a whole-NULL other side. Shared
    * by eval and generated code (static forwarder). */
  def nullFreeAllZero(arr: ArrayData, isFloat: Boolean): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return false
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      if (x != 0.0) return false
      i += 1
    }
    true
  }

  /** Column form: cosineSim(a, b). */
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      CosineSim(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))
}
