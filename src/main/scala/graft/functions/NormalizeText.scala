package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Canonical text normalization in ONE native byte pass — value-identical
  * (spec-pinned) to the regex formulation it replaces:
  *
  *   trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "), " +", " "))
  *
  * i.e. lowercase, strip non-[a-z0-9] to spaces, collapse runs, trim.
  * The regex form runs TWO java.util.regex passes over every document
  * and was, by a wide margin, the dominant constant of the sf10 text
  * suite (~20 s of a 59 s decontamination query just normalizing — it
  * underlies tokens, fingerprints, shingles, language-ID and every
  * quality metric). Here: ASCII input lowers and filters in a single
  * tight byte loop (keep [a-z0-9], emit one collapsed space for
  * anything else, never emit leading/trailing spaces); non-ASCII input
  * first goes through UTF8String.toLowerCase — the SAME kernel Spark's
  * `lower()` uses, so exotic case mappings (e.g. Kelvin sign → k) match
  * the regex form — and then the same byte loop (multi-byte sequences
  * collapse to one space exactly like the per-codepoint regex, because
  * space runs collapse).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "normalize_text"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"normalize_text requires string, got ${other.simpleString(100)}")
    }

  override def nullSafeEval(input: Any): Any =
    NormalizeText.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val helper = NormalizeText.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, s => s"$helper.normalize($s)")
  }

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

object NormalizeText {
  /** Static kernel shared by eval and generated code. */
  def normalize(s: UTF8String): UTF8String = {
    // non-ASCII goes through Spark's own lowercase kernel first so case
    // mappings match lower(); the filter loop below then treats every
    // byte >= 0x80 as "not [a-z0-9]" -> collapsed space, which is
    // per-codepoint-equivalent because space runs collapse
    val src = if (s.isFullAscii) s else s.toLowerCase
    val n = src.numBytes()
    val out = new Array[Byte](n)
    var len = 0
    var pendingSpace = false
    var i = 0
    while (i < n) {
      var b = src.getByte(i)
      if (b >= 'A' && b <= 'Z') b = (b + 32).toByte // ASCII lower
      if ((b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')) {
        if (pendingSpace && len > 0) { out(len) = ' '; len += 1 }
        out(len) = b
        len += 1
        pendingSpace = false
      } else {
        pendingSpace = true
      }
      i += 1
    }
    UTF8String.fromBytes(out, 0, len)
  }

  /** Column form: normalize_text(c). */
  def apply(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      NormalizeText(org.apache.spark.sql.graft.ColumnBridge.expression(c)))
}
