package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native Catalyst
  * expressions as SQL functions, so `spark.sql("SELECT simhash64(toks)")`
  * and the DataFrame API share one codegen'd implementation.
  *
  * Usage (config-driven, no code changes at the call site):
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  * }}}
  * This is the standard extension-library shape (injectFunction) — the
  * session wires the function registry at build time; clusters enable it
  * fleet-wide via spark-defaults. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, usage, arity, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        // DESCRIBE FUNCTION should point at the real implementation:
        // the native expression class for simhash64, the registrar for
        // the composed builders
        new ExpressionInfo(
          if (name == "simhash64") classOf[SimHash64].getName
          else classOf[GraftExtensions].getName, name, usage),
        (children: Seq[Expression]) => {
          require(children.size == arity,
            s"$name takes exactly $arity argument(s)")
          builder(children)
        }))
    }
  }
}

object GraftExtensions {
  import org.apache.spark.sql.catalyst.expressions._
  import org.apache.spark.sql.types._

  // Builders must emit plain catalyst Expression trees: converting a
  // functions._ Column composition back through the bridge yields opaque
  // unresolved ColumnNode wrappers that the mid-analysis function
  // registry cannot resolve (INTERNAL_ERROR: cannot generate code).
  private def lamVar(n: String) = UnresolvedNamedLambdaVariable(Seq(n))
  private def lam2(n1: String, n2: String)(
      f: (Expression, Expression) => Expression): LambdaFunction = {
    val x = lamVar(n1); val y = lamVar(n2)
    LambdaFunction(f(x, y), Seq(x, y))
  }
  private def lam1(n: String)(f: Expression => Expression): LambdaFunction = {
    val x = lamVar(n); LambdaFunction(f(x), Seq(x))
  }

  /** lower → strip non-[a-z0-9 ] → collapse runs → trim (Text.normalize
    * stated in catalyst terms — same literals, same result). */
  private def normalizeExpr(e: Expression): Expression =
    StringTrim(RegExpReplace(
      RegExpReplace(Lower(e), Literal("[^a-z0-9 ]"), Literal(" ")),
      Literal(" +"), Literal(" ")))

  // graft_cosine used to build the HOF catalyst tree here; it now binds
  // the native CosineSim kernel directly (same semantics, pinned by the
  // GraftProps parity property), so SQL and DataFrame callers share one
  // codegen'd implementation.

  /** Text.stripHtml stated in catalyst terms — identical pattern
    * literals and stage order, parity pinned in Round3Spec. */
  private def stripHtmlExpr(e: Expression): Expression = {
    val noBlocks = RegExpReplace(e,
      Literal("(?is)<(script|style)[^>]*>.*?</(script|style)[ \\t\\n\\r]*>"),
      Literal(" "))
    val noTags = RegExpReplace(noBlocks, Literal("<[^>]*>"), Literal(" "))
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags: Expression) { case (x, (k, v)) =>
        StringReplace(x, Literal(k), Literal(v)) }
    StringTrim(RegExpReplace(decoded, Literal("[ \\t\\n\\r]+"), Literal(" ")))
  }

  /** Text.canonicalUrl (stripWww = true) in catalyst terms. */
  private def canonicalUrlExpr(u: Expression): Expression = {
    val scheme = Lower(RegExpExtract(u,
      Literal("^([A-Za-z][A-Za-z0-9+.-]*)://"), Literal(1)))
    val hostport = Lower(RegExpExtract(u,
      Literal("^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"), Literal(1)))
    val noPort = CaseWhen(Seq(
      (EqualTo(scheme, Literal("http")),
        RegExpReplace(hostport, Literal(":80$"), Literal(""))),
      (EqualTo(scheme, Literal("https")),
        RegExpReplace(hostport, Literal(":443$"), Literal("")))),
      Some(hostport))
    val host = RegExpReplace(noPort, Literal("^www\\."), Literal(""))
    val rest = RegExpExtract(u,
      Literal("^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"), Literal(1))
    val path = CaseWhen(Seq((EqualTo(rest, Literal("")), Literal("/"))),
      Some(rest))
    CaseWhen(Seq((EqualTo(scheme, Literal("")), u)),
      Some(Concat(Seq(scheme, Literal("://"), host, path))))
  }

  /** (name, usage, arity, builder). simhash64 is a native Catalyst
    * expression; normalize/fingerprint/cosine are the pipeline ops
    * restated as catalyst trees — one semantics, shared by the DataFrame
    * API and `spark.sql`. (The marker-lexicon language-ID and composite
    * quality score stay DataFrame-API-only: their higher-order lambda
    * forests are impractical to hand-build in catalyst terms.) */
  val all: Seq[(String, String, Int, Seq[Expression] => Expression)] = Seq(
    ("simhash64",
      "simhash64(array<string>) - 64-bit SimHash fingerprint of a token array",
      1, cs => SimHash64(cs.head)),
    ("graft_normalize",
      "graft_normalize(str) - canonical text normalization (dedup key basis)",
      1, cs => normalizeExpr(cs.head)),
    ("graft_fingerprint",
      "graft_fingerprint(str) - md5 content fingerprint of normalized text",
      1, cs => Md5(Cast(normalizeExpr(cs.head), BinaryType))),
    ("graft_cosine",
      "graft_cosine(array<double>, array<double>) - cosine similarity " +
        "(native CosineSim kernel)",
      2, cs => CosineSim(Cast(cs(0), ArrayType(DoubleType)),
        Cast(cs(1), ArrayType(DoubleType)))),
    ("graft_strip_html",
      "graft_strip_html(str) - HTML to text extraction (crawl ingest)",
      1, cs => stripHtmlExpr(cs.head)),
    ("graft_canonical_url",
      "graft_canonical_url(str) - canonical URL for crawl-frontier dedup",
      1, cs => canonicalUrlExpr(cs.head)))
}
