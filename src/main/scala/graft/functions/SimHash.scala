package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SimHash over a token array: 64-bit locality-sensitive fingerprint where
  * each bit is the majority vote of that bit across xxhash64(token) values.
  * Near-duplicate texts differ in few bits (compare with
  * `bit_count(a ^ b)` — Hamming distance is a cheap Column op).
  *
  * Implemented as a native Catalyst `Expression` rather than a Scala UDF so
  * the per-row cost is one O(tokens) pass with primitive bit math and no
  * serialization boundary. Uses Spark's own XxHash64 kernel for the token
  * hashes (same hash the engine uses for shuffles). CodegenFallback: the
  * eval path allocates nothing but the 64-int vote array.
  *
  * Reference behavior: truthound has no simhash — this is part of the
  * LLM-pipeline extension surface (BASELINE.json north star).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got ${other.simpleString(100)}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column form: simhash64(tokensCol). */
  def apply(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SimHash64(org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))
}
