package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** 64-bit hashes of all word n-gram shingles of a token array, computed
  * in ONE native pass: each token is xxhash64'd once (Spark's own XXH64
  * kernel, seed 42 — the same hash `xxhash64(tok)` computes), then each
  * window of n token-hashes combines by rotate-5-left + XOR. Equal
  * shingle text ⇒ equal hash, so set-overlap semantics match hashing
  * the materialized shingle strings at a fraction of the cost.
  *
  * Value-identical to the HOF formulation it replaces
  * (`Text.shingleHashesOf(Text.tokenHashes(t), n)`) — pinned by a spec —
  * but evaluated as primitive long loops with zero per-position
  * allocation. The HOF form allocates a slice array + boxed-lambda
  * aggregate per window position and degraded under long-JVM GC
  * pressure at sf10, the same failure profile the scaling ladder caught
  * for the hyperplane bucketer (HyperplaneBucket.scala); benchmark
  * decontamination (Dedup.contaminatedIds) was the suite's dominant
  * sf10 constant because of it.
  *
  * Reference behavior: truthound has no decontamination surface — this
  * is part of the LLM-pipeline extension (BASELINE.json north star),
  * GPT-3/LLaMA-style n-gram overlap screening.
  */
case class ShingleHashes64(child: Expression, n: Int, seed: Long = 42L)
    extends UnaryExpression {
  require(n >= 1, s"shingle width n must be >= 1: $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes64"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_hashes64 requires array<string>, got ${other.simpleString(100)}")
    }
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    if (len < n) UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    else {
      val hashes = new Array[Long](len)
      var i = 0
      while (i < len) {
        hashes(i) =
          if (arr.isNullAt(i)) seed // xxhash64(null) = seed
          else {
            val s = arr.getUTF8String(i)
            XXH64.hashUnsafeBytes(
              s.getBaseObject, s.getBaseOffset, s.numBytes, seed)
          }
        i += 1
      }
      val out = new Array[Long](len - n + 1)
      var p = 0
      while (p < out.length) {
        var acc = 0L
        var j = p
        while (j < p + n) {
          acc = ((acc << 5) | (acc >>> 59)) ^ hashes(j)
          j += 1
        }
        out(p) = acc
        p += 1
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val len = ctx.freshName("len")
      val hashes = ctx.freshName("hashes")
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      val s = ctx.freshName("s")
      val hasher = classOf[XXH64].getName
      val uad = classOf[UnsafeArrayData].getName
      s"""
         |int $len = $arr.numElements();
         |if ($len < $n) {
         |  ${ev.value} = $uad.fromPrimitiveArray(new long[0]);
         |} else {
         |  long[] $hashes = new long[$len];
         |  for (int $i = 0; $i < $len; $i++) {
         |    if ($arr.isNullAt($i)) {
         |      $hashes[$i] = ${seed}L;
         |    } else {
         |      org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |      $hashes[$i] = $hasher.hashUnsafeBytes(
         |        $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), ${seed}L);
         |    }
         |  }
         |  long[] $out = new long[$len - $n + 1];
         |  for (int $p = 0; $p < $out.length; $p++) {
         |    long $acc = 0L;
         |    for (int $j = $p; $j < $p + $n; $j++) {
         |      $acc = (($acc << 5) | ($acc >>> 59)) ^ $hashes[$j];
         |    }
         |    $out[$p] = $acc;
         |  }
         |  ${ev.value} = $uad.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes64 =
    copy(child = newChild)
}

object ShingleHashes64 {
  /** Column form: shingle_hashes64(tokensCol, n). */
  def apply(tokens: Column, n: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ShingleHashes64(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens), n))

  /** Seeded column form — a second independent seed turns two calls into
    * a 128-bit gram key (collision-proof in practice for exact-match
    * grouping; used by [[graft.pipeline.Dedup.repeatedGramSpans]]). */
  def apply(tokens: Column, n: Int, seed: Long): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      ShingleHashes64(
        org.apache.spark.sql.graft.ColumnBridge.expression(tokens), n, seed))
}
