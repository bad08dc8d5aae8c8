package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** A broadcast-model scorer callable from [[ScoreArray]]: maps one dense
  * feature row to one double. Implementations are small driver-fit
  * models (isolation forest, OCSVM) whose parameters ship to executors
  * inside the plan's reference-object array — the same transport a
  * ScalaUDF closure uses, minus the per-row conversion tax. */
trait ArrayScorer extends Serializable {
  def score(xs: Array[Double]): Double
}

/** Native Catalyst expression for broadcast-model scoring: evaluates
  * `scorer.score(features)` on a primitive double[] extracted directly
  * from the columnar ArrayData — inside whole-stage codegen, zero boxing.
  *
  * Why native: the previous form (`udf((xs: Seq[Double]) => model.score(
  * xs.toArray))`) paid, per scored row, a CatalystTypeConverters pass
  * (ArrayData → boxed Seq[Double]), a second copy (`toArray` unboxing),
  * and the ScalaUDF try/catch + result-converter wrapper. The model
  * arithmetic itself is unchanged — this expression calls the SAME
  * `score` method the UDF closure called, so scores are bit-identical
  * by construction (pinned by a parity spec).
  *
  * Null contract: a null input array yields null (the UDF form could
  * never see one — callers build the array from non-null casts after
  * `na.drop`). Null ELEMENTS are a caller bug under both forms (the UDF
  * form threw an NPE from `toArray`); `toDoubleArray` throws likewise. */
case class ScoreArray(child: Expression, scorer: ArrayScorer)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "score_array"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"score_array requires array<double>, got " +
            child.dataType.simpleString(100))
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    java.lang.Double.valueOf(scorer.score(arr.toDoubleArray()))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val s = ctx.addReferenceObj("scorer", scorer,
        classOf[ArrayScorer].getName)
      s"${ev.value} = $s.score($arr.toDoubleArray());"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : ScoreArray = copy(child = newChild)
}

object ScoreArray {
  /** Column form: scoreArray(features, scorer). */
  def apply(features: Column, scorer: ArrayScorer): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ScoreArray(
        org.apache.spark.sql.graft.ColumnBridge.expression(features),
        scorer))
}
