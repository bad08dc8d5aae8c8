package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SimHash over a token array: 64-bit locality-sensitive fingerprint where
  * each bit is the majority vote of that bit across xxhash64(token) values.
  * Near-duplicate texts differ in few bits (compare with
  * `bit_count(a ^ b)` — Hamming distance is a cheap Column op).
  *
  * Implemented as a native Catalyst `Expression` WITH `doGenCode`, so the
  * projection stays inside whole-stage codegen: the generated Java is one
  * O(tokens) pass of primitive bit math over the array, using Spark's own
  * XxHash64 kernel (the hash the engine uses for shuffles). The
  * interpreted `nullSafeEval` mirrors the generated code exactly.
  *
  * Reference behavior: truthound has no simhash — this is part of the
  * LLM-pipeline extension surface (BASELINE.json north star).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
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

  private val seed = 42L

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(
          s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
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

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val votes = ctx.freshName("votes")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val s = ctx.freshName("s")
      val hasher = classOf[XXH64].getName
      s"""
         |int[] $votes = new int[64];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |    long $h = $hasher.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed}L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      if ((($h >>> $b) & 1L) == 1L) $votes[$b]++; else $votes[$b]--;
         |    }
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($votes[$b] > 0) ${ev.value} |= (1L << $b);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column form: simhash64(tokensCol). */
  def apply(tokens: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      SimHash64(org.apache.spark.sql.graft.ColumnBridge.expression(tokens)))
}
