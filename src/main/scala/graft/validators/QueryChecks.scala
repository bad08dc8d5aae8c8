package graft.validators

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query validators (reference: truthound `validators/query/`, 19 classes):
  * run arbitrary SQL against registered tables and assert on the result
  * shape/values. `spark.sql` over temp views is the native form; the
  * reference's SQL security screen (`query/base.py:116-118`) is ported as
  * a static keyword/structure check. */
object SqlSafety {
  private val forbidden = Seq(
    "insert", "update", "delete", "drop", "create", "alter", "truncate",
    "grant", "revoke", "attach", "copy", "merge", "call", "set ", "reset")
  /** Reject multi-statement strings and DDL/DML keywords. */
  def require(sql: String): Unit = {
    val s = sql.toLowerCase
    if (s.contains(";"))
      throw new IllegalArgumentException("multi-statement SQL rejected")
    forbidden.find(k => s.matches(s"(?s).*\\b${k.trim}\\b.*")).foreach { k =>
      throw new IllegalArgumentException(s"SQL keyword rejected: $k")
    }
  }
}

sealed trait QueryAssertion
object QueryAssertion {
  case object ReturnsNoRows extends QueryAssertion
  case object ReturnsRows extends QueryAssertion
  final case class RowCountBetween(min: Long, max: Long) extends QueryAssertion
  final case class SingleValueBetween(lo: Double, hi: Double) extends QueryAssertion
}

/** QueryValidator / ReturnsNoRows / ReturnsRows / RowCount / Aggregate
  * asserts over a SQL result. */
final case class QueryCheck(sql: String, assertion: QueryAssertion,
    label: String = "query") {
  SqlSafety.require(sql)
  val name = s"query[$label]"
  val category = "query"

  def run(spark: SparkSession, tables: Map[String, DataFrame]): CheckResult = {
    tables.foreach { case (n, df) => df.createOrReplaceTempView(n) }
    val t0 = System.nanoTime()
    val result = spark.sql(sql)
    import QueryAssertion._
    val issues: Seq[ValidationIssue] = assertion match {
      case ReturnsNoRows =>
        // limit(1) — never materialize the full violation set
        val n = result.limit(1).count()
        if (n > 0) Seq(ValidationIssue(name, "*", "unexpected_rows", n, 0,
          Severity.High.label, "no rows", "rows present")) else Nil
      case ReturnsRows =>
        val n = result.limit(1).count()
        if (n == 0) Seq(ValidationIssue(name, "*", "no_rows", 0, 0,
          Severity.High.label, "rows present", "empty")) else Nil
      case RowCountBetween(min, max) =>
        val n = result.count()
        if (n < min || n > max)
          Seq(ValidationIssue(name, "*", "row_count_out_of_bounds", n, 0,
            Severity.Medium.label, s"[$min,$max]", n.toString)) else Nil
      case SingleValueBetween(lo, hi) =>
        val rows = result.limit(2).collect()
        if (rows.length != 1 || rows(0).length != 1)
          Seq(ValidationIssue(name, "*", "not_single_value", rows.length, 0,
            Severity.High.label, "1 row x 1 col", s"${rows.length} rows"))
        else {
          val v = rows(0).get(0) match {
            case n: Number => n.doubleValue()
            case d: java.math.BigDecimal => d.doubleValue()
            case other => Double.NaN
          }
          if (v.isNaN || v < lo || v > hi)
            Seq(ValidationIssue(name, "*", "value_out_of_bounds", 1, 0,
              Severity.Medium.label, s"[$lo,$hi]", v.toString)) else Nil
        }
    }
    CheckResult(name, category, issues.isEmpty, issues,
      (System.nanoTime() - t0) / 1000000)
  }
}
