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
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64",
        "simhash64(array<string>) - 64-bit SimHash fingerprint of a token array"),
      (children: Seq[Expression]) => {
        require(children.size == 1, "simhash64 takes exactly one argument")
        SimHash64(children.head)
      }))
  }
}
