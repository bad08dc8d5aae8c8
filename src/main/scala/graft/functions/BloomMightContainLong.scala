package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Native bloom-filter membership probe over a BROADCAST filter:
  * `bf.mightContainLong(value)` inside whole-stage codegen.
  *
  * Why native (r16): the previous probe was a ScalaUDF
  * (`udf((x: java.lang.Long) => ... mightContainLong(x))`) — one boxed
  * Long conversion plus the ScalaUDF converter/try-catch wrapper per
  * probed row, on operators whose whole point is screening a huge child
  * relation at scan speed (FK orphan sketches, the duplicated-gram
  * census screen). Spark's own `might_contain` expression exists but
  * requires the serialized filter INLINE in the plan as a literal; a
  * parent-sized filter (GBs at the 1000× rungs) belongs in a broadcast,
  * which is exactly what this expression carries — the Broadcast handle
  * ships in the plan's reference array, the filter bytes move once per
  * executor.
  *
  * Null contract: null input → null (callers that need the UDF's
  * null→false semantics wrap in `coalesce(..., lit(false))`). Bit
  * semantics are `BloomFilter.mightContainLong`, the same method the
  * UDF called. */
case class BloomMightContainLong(child: Expression,
    bfB: Broadcast[BloomFilter]) extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_long"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain_long requires a bigint input, got " +
            child.dataType.simpleString(100))
    }

  override def nullSafeEval(input: Any): Any =
    java.lang.Boolean.valueOf(
      bfB.value.mightContainLong(input.asInstanceOf[Long]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode)
      : ExprCode = {
    val bcCls = classOf[Broadcast[_]].getName
    val bfCls = classOf[BloomFilter].getName
    val ref = ctx.addReferenceObj("bloomBroadcast", bfB, bcCls)
    // unwrap the broadcast once per task, not once per row
    val bf = ctx.addMutableState(bfCls, "graftBloom",
      v => s"$v = ($bfCls) (($bcCls) $ref).value();")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = $bf.mightContainLong($x);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContainLong = copy(child = newChild)
}

object BloomMightContainLong {
  /** Column form: probe(value) over an already-broadcast filter. */
  def apply(value: Column, bfB: Broadcast[BloomFilter]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BloomMightContainLong(
        org.apache.spark.sql.graft.ColumnBridge.expression(value), bfB))
}
