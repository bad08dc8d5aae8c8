package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Merge-rank BPE token counting — the REAL byte-pair-encoding rule
  * (tiktoken / SentencePiece-BPE / GPT-2 `merges.txt` semantics), as
  * opposed to [[BpeCount]]'s greedy longest-match approximation.
  * Production corpus recipes are denominated in merge-rank counts, and
  * the two rules genuinely disagree on merge-order-sensitive strings
  * (e.g. a rank table where `(o,w)` outranks `(hell,o)` splits
  * "helloworld" as hell|ow|o|r|ld = 5 where MaxMatch finds
  * hello|world = 2).
  *
  * Matching rule, exactly: whitespace (anything <= 0x20) pre-tokenizes
  * and is never counted (merges never cross word boundaries). Each word
  * starts as its sequence of code points; repeatedly, the adjacent
  * symbol pair with the LOWEST rank in the merge table is merged at
  * every non-overlapping occurrence left-to-right, until no adjacent
  * pair has a rank. The word's token count is its final symbol count; a
  * code point that is not a single-codepoint piece is an unmergeable
  * unknown counting 1. Duplicate pairs in the table keep their first
  * (lowest) rank. Case-sensitive.
  *
  * Scale shape: the merge table compiles once per expression instance
  * into interned piece ids plus an open-addressed long->long hash
  * (packed (left,right) -> packed (rank, mergedId)) — transient lazy,
  * rebuilt per executor after deserialize, never shipped per row. The
  * per-row work is a primitive in-place merge loop per word, invoked as
  * a single non-virtual call from generated code (same reference-object
  * discipline as [[BpeCount]]); no boxing on the hot path. Real merge
  * tables (~50k pairs) ride task serialization like any literal. */
case class BpeMergeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.nonEmpty, "bpe_merge_count requires a non-empty merge table")
  require(merges.forall { case (l, r) =>
    l.nonEmpty && r.nonEmpty && !l.exists(_ <= ' ') && !r.exists(_ <= ' ')
  }, "merge sides must be non-empty and whitespace-free")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_merge_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_merge_count requires string, got ${other.simpleString(100)}")
    }

  @transient private lazy val table: BpeMergeCount.Table =
    BpeMergeCount.buildTable(merges)

  /** Kernel shared by eval and generated code (via reference object). */
  def countTokens(s: UTF8String): Int = {
    val str = s.toString
    val n = str.length
    val t = table
    var count = 0
    var i = 0
    while (i < n) {
      if (str.charAt(i) <= ' ') i += 1
      else {
        var j = i
        while (j < n && str.charAt(j) > ' ') j += 1
        count += countWord(str, i, j, t)
        i = j
      }
    }
    count
  }

  private def countWord(str: String, from: Int, until: Int,
                        t: BpeMergeCount.Table): Int = {
    // initial symbols: one id per code point (-1 = unmergeable unknown)
    val ids = new Array[Int](until - from)
    var m = 0
    var k = from
    while (k < until) {
      val cp = str.codePointAt(k)
      ids(m) = t.charId(cp)
      m += 1
      k += Character.charCount(cp)
    }
    // merge loop: lowest-rank adjacent pair, all non-overlapping
    // occurrences left-to-right, repeat to fixpoint
    var live = true
    while (live && m > 1) {
      var bestRank = Int.MaxValue
      var bestA = -1
      var bestB = -1
      var bestId = -1
      var p = 0
      while (p < m - 1) {
        val a = ids(p)
        val b = ids(p + 1)
        if (a >= 0 && b >= 0) {
          val v = t.lookup(a, b)
          if (v >= 0) {
            val r = (v >>> 32).toInt
            if (r < bestRank) {
              bestRank = r; bestA = a; bestB = b; bestId = v.toInt
            }
          }
        }
        p += 1
      }
      if (bestRank == Int.MaxValue) live = false
      else {
        var w = 0
        var q = 0
        while (q < m) {
          if (q < m - 1 && ids(q) == bestA && ids(q + 1) == bestB) {
            ids(w) = bestId; w += 1; q += 2
          } else {
            ids(w) = ids(q); w += 1; q += 1
          }
        }
        m = w
      }
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMergeCount", this,
      classOf[BpeMergeCount].getName)
    defineCodeGen(ctx, ev, s => s"$ref.countTokens($s)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): BpeMergeCount = copy(child = newChild)
}

object BpeMergeCount {
  /** Compiled merge table: single-codepoint piece ids + an
    * open-addressed long->long hash, keys packed (left<<32)|right,
    * values packed (rank<<32)|mergedId. Read-only after construction. */
  final class Table(cpKeys: Array[Int], cpVals: Array[Int],
                    hashKeys: Array[Long], hashVals: Array[Long]) {
    private val mask = hashKeys.length - 1

    /** Symbol id of an initial code point, or -1 (unknown, unmergeable). */
    def charId(cp: Int): Int = {
      // tiny sorted array: binary search (code-point pieces are few)
      var lo = 0
      var hi = cpKeys.length - 1
      while (lo <= hi) {
        val mid = (lo + hi) >>> 1
        val mk = cpKeys(mid)
        if (mk == cp) return cpVals(mid)
        else if (mk < cp) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }

    /** Packed (rank, mergedId) for pair (a, b), or -1 if unranked. */
    def lookup(a: Int, b: Int): Long = {
      val key = (a.toLong << 32) | (b.toLong & 0xffffffffL)
      var slot = (java.lang.Long.hashCode(key * 0x9e3779b97f4a7c15L)) & mask
      while (hashKeys(slot) != -1L) {
        if (hashKeys(slot) == key) return hashVals(slot)
        slot = (slot + 1) & mask
      }
      -1L
    }
  }

  private[functions] def buildTable(merges: Seq[(String, String)]): Table = {
    val pieceId = scala.collection.mutable.HashMap.empty[String, Int]
    def idOf(p: String): Int = pieceId.getOrElseUpdate(p, pieceId.size)
    val pairs = scala.collection.mutable.LinkedHashMap.empty[Long, Long]
    merges.zipWithIndex.foreach { case ((l, r), rank) =>
      val (a, b) = (idOf(l), idOf(r))
      val merged = idOf(l + r)
      val key = (a.toLong << 32) | (b.toLong & 0xffffffffL)
      if (!pairs.contains(key)) // duplicate pair keeps its FIRST rank
        pairs(key) = (rank.toLong << 32) | (merged.toLong & 0xffffffffL)
    }
    // single-codepoint pieces -> initial symbol ids, sorted for search
    val cps = pieceId.iterator
      .filter { case (p, _) => p.codePointCount(0, p.length) == 1 }
      .map { case (p, id) => (p.codePointAt(0), id) }
      .toArray.sortBy(_._1)
    // open-addressed hash, capacity = next pow2 >= 2 * size
    var cap = 8
    while (cap < pairs.size * 2) cap <<= 1
    val hk = Array.fill(cap)(-1L)
    val hv = new Array[Long](cap)
    pairs.foreach { case (key, v) =>
      var slot = (java.lang.Long.hashCode(key * 0x9e3779b97f4a7c15L)) & (cap - 1)
      while (hk(slot) != -1L) slot = (slot + 1) & (cap - 1)
      hk(slot) = key
      hv(slot) = v
    }
    new Table(cps.map(_._1), cps.map(_._2), hk, hv)
  }

  /** Column form: bpe_merge_count(c) over an explicit ranked merge list. */
  def apply(c: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BpeMergeCount(org.apache.spark.sql.graft.ColumnBridge.expression(c),
        merges))
}
