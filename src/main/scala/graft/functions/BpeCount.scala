package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tokenizer-accurate subword count over a loadable vocabulary: greedy
  * longest-match (the WordPiece/MaxMatch decode rule over a BPE-merged
  * piece inventory — the standard deterministic approximation when the
  * merge ranks aren't shipped). Token-budget sampling and sequence
  * packing are token-DENOMINATED contracts; the whitespace/regex proxies
  * (`Text.tokenCount` / `Text.approxBpeCount`) mis-state them for
  * production recipes, and this expression makes the numbers real.
  *
  * Matching rule, exactly: scan left to right; whitespace (anything
  * <= 0x20) separates and is never counted; at each position take the
  * LONGEST vocab piece starting there (pieces never contain whitespace,
  * so matches cannot cross word boundaries); if no piece matches, the
  * single code point counts as one unknown token and the scan advances
  * past it. Case-sensitive — normalize upstream if the vocab is
  * lowercase.
  *
  * Scale shape: the vocab compiles once per expression instance into a
  * char-trie (transient lazy — built on each executor after deserialize,
  * NOT shipped per row); the per-row work is one primitive scan with
  * trie walks, invoked as a single non-virtual call from generated code
  * (same reference-object discipline as the broadcast-model scorers).
  * Vocabularies are KB-to-MB — they ride task serialization like any
  * literal; wrap in a broadcast-backed vocab provider only past that. */
case class BpeCount(child: Expression, vocab: Seq[String])
    extends UnaryExpression {
  require(vocab.nonEmpty, "bpe_count requires a non-empty vocabulary")
  require(vocab.forall(p => p.nonEmpty && !p.exists(_ <= ' ')),
    "vocab pieces must be non-empty and whitespace-free")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "bpe_count"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bpe_count requires string, got ${other.simpleString(100)}")
    }

  // char-trie: nodes in flat arrays; built once per JVM-side instance
  // (transient — rebuilt after task deserialization, never serialized)
  @transient private lazy val trie: BpeCount.Trie = BpeCount.buildTrie(vocab)

  /** Kernel shared by eval and generated code (via reference object). */
  def countTokens(s: UTF8String): Int = {
    val str = s.toString
    val n = str.length
    val t = trie
    var count = 0
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c <= ' ') i += 1
      else {
        // longest trie match from i
        var node = 0
        var j = i
        var lastEnd = -1
        var live = true
        while (live && j < n) {
          val next = t.step(node, str.charAt(j))
          if (next < 0) live = false
          else {
            node = next
            j += 1
            if (t.terminal(node)) lastEnd = j
          }
        }
        if (lastEnd > i) { count += 1; i = lastEnd }
        else {
          // unknown: one token per code point (surrogate pairs advance 2)
          count += 1
          i += (if (Character.isHighSurrogate(c) && i + 1 < n) 2 else 1)
        }
      }
    }
    count
  }

  override def nullSafeEval(input: Any): Any =
    countTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCount", this, classOf[BpeCount].getName)
    defineCodeGen(ctx, ev, s => s"$ref.countTokens($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

object BpeCount {
  /** Flat-array char-trie: children as sorted (char -> node) ranges. */
  final class Trie(val firstChild: Array[Int], val childCount: Array[Int],
                   val chars: Array[Char], val target: Array[Int],
                   val isTerm: Array[Boolean]) {
    def step(node: Int, c: Char): Int = {
      var lo = firstChild(node)
      var hi = lo + childCount(node) - 1
      while (lo <= hi) { // binary search within the node's child range
        val mid = (lo + hi) >>> 1
        val mc = chars(mid)
        if (mc == c) return target(mid)
        else if (mc < c) lo = mid + 1
        else hi = mid - 1
      }
      -1
    }
    def terminal(node: Int): Boolean = isTerm(node)
  }

  private[functions] def buildTrie(vocab: Seq[String]): Trie = {
    // mutable build trie, then flatten
    final class Node {
      val kids = scala.collection.mutable.TreeMap.empty[Char, Node]
      var term = false
    }
    val root = new Node
    vocab.foreach { p =>
      var n = root
      p.foreach(c => n = n.kids.getOrElseUpdate(c, new Node))
      n.term = true
    }
    // BFS numbering -> flat arrays
    val nodes = scala.collection.mutable.ArrayBuffer[Node](root)
    var i = 0
    while (i < nodes.length) { nodes ++= nodes(i).kids.values; i += 1 }
    val idx = nodes.zipWithIndex.map { case (n, k) => (n, k) }.toMap
    val firstChild = new Array[Int](nodes.length)
    val childCount = new Array[Int](nodes.length)
    val isTerm = new Array[Boolean](nodes.length)
    val chars = scala.collection.mutable.ArrayBuffer.empty[Char]
    val target = scala.collection.mutable.ArrayBuffer.empty[Int]
    nodes.zipWithIndex.foreach { case (n, k) =>
      firstChild(k) = chars.length
      childCount(k) = n.kids.size
      isTerm(k) = n.term
      n.kids.foreach { case (c, kid) => chars += c; target += idx(kid) }
    }
    new Trie(firstChild, childCount, chars.toArray, target.toArray, isTerm)
  }

  /** Column form: bpe_count(c) over an explicit piece vocabulary. */
  def apply(c: Column, vocab: Seq[String]): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      BpeCount(org.apache.spark.sql.graft.ColumnBridge.expression(c), vocab))
}
