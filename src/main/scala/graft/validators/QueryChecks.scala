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
  /** query/result.py QueryResultMatches: exact expected row set (small,
    * for pinned regression results). */
  final case class ResultMatches(expected: Seq[Seq[Any]]) extends QueryAssertion
  /** query/column.py: asserts over one column of the query output. */
  final case class ColumnValuesBetween(column: String, lo: Double, hi: Double)
      extends QueryAssertion
  final case class ColumnValuesInSet(column: String, allowed: Set[String])
      extends QueryAssertion
  final case class ColumnNotNull(column: String) extends QueryAssertion
  final case class ColumnUnique(column: String) extends QueryAssertion
  /** query/aggregate.py group-aggregate assert: AGG(valueCol) per
    * groupCol group must lie in [lo, hi]. */
  final case class GroupAggBetween(groupCol: String, agg: String,
      valueCol: String, lo: Double, hi: Double) extends QueryAssertion {
    require(Set("count", "sum", "avg", "min", "max").contains(agg),
      s"unsupported aggregate: $agg")
  }
  /** query/row_count.py QueryRowCountRatio: |query| / |baseSql| within
    * ratio bounds (e.g. ">= 90% of orders are completed"). */
  final case class RowCountRatioBetween(baseSql: String,
      minRatio: Double = 0.0, maxRatio: Double = 1.0) extends QueryAssertion
  /** query/row_count.py QueryRowCountCompare: |query| REL |compareSql|
    * with equal/not_equal/greater_than(_or_equal)/less_than(_or_equal);
    * integer tolerance applies to `equal`. */
  final case class RowCountCompare(compareSql: String,
      relationship: String = "equal", tolerance: Long = 0)
      extends QueryAssertion {
    require(QueryCheck.relationships.contains(relationship),
      s"invalid relationship: $relationship")
  }
  /** query/aggregate.py QueryAggregate: first-row value of `column`
    * equals `expected` within tolerance, and/or within [min,max]. */
  final case class AggValue(column: String, expected: Option[Double] = None,
      tolerance: Double = 0.0, min: Option[Double] = None,
      max: Option[Double] = None) extends QueryAssertion
  /** query/aggregate.py QueryAggregateCompare: value of `column` in this
    * query REL the same column in `compareSql`'s result. */
  final case class AggCompare(compareSql: String, column: String,
      relationship: String = "equal", tolerance: Double = 0.0)
      extends QueryAssertion {
    require(QueryCheck.relationships.contains(relationship),
      s"invalid relationship: $relationship")
  }
}

object QueryCheck {
  /** Shared relationship predicates for aggregate VALUES (doubles are
    * the honest type there — reference RELATIONSHIPS maps). */
  val relationships: Map[String, (Double, Double, Double) => Boolean] = Map(
    "equal" -> ((a, b, t) => math.abs(a - b) <= t),
    "not_equal" -> ((a, b, _) => a != b),
    "greater_than" -> ((a, b, _) => a > b),
    "greater_than_or_equal" -> ((a, b, _) => a >= b),
    "less_than" -> ((a, b, _) => a < b),
    "less_than_or_equal" -> ((a, b, _) => a <= b))

  /** Exact relationship predicate for ROW COUNTS: Long all the way —
    * routing counts through Double would merge values beyond 2^53. */
  def compareCounts(a: Long, b: Long, rel: String, tol: Long): Boolean =
    rel match {
      case "equal"                 => math.abs(a - b) <= tol
      case "not_equal"             => a != b
      case "greater_than"          => a > b
      case "greater_than_or_equal" => a >= b
      case "less_than"             => a < b
      case "less_than_or_equal"    => a <= b
    }
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
      case ResultMatches(expected) =>
        // pinned-result regression check: expected sets are small by
        // contract, so a driver-side compare is the honest shape
        val actual = result.limit(expected.size + 1).collect()
          .map(_.toSeq.map(String.valueOf)).toSeq
        val exp = expected.map(_.map(String.valueOf))
        if (actual != exp)
          Seq(ValidationIssue(name, "*", "result_mismatch",
            actual.size.toLong, exp.size.toLong, Severity.High.label,
            exp.toString, actual.toString)) else Nil
      case ColumnValuesBetween(c, lo, hi) =>
        import org.apache.spark.sql.functions.col
        val n = result.filter(col(c).isNotNull &&
          (col(c) < lo || col(c) > hi)).count()
        if (n > 0) Seq(ValidationIssue(name, c, "query_column_out_of_bounds",
          n, 0, Severity.Medium.label, s"[$lo,$hi]", "")) else Nil
      case ColumnValuesInSet(c, allowed) =>
        import org.apache.spark.sql.functions.col
        val n = result.filter(col(c).isNotNull &&
          !col(c).isin(allowed.toSeq: _*)).count()
        if (n > 0) Seq(ValidationIssue(name, c, "query_column_not_in_set",
          n, 0, Severity.Medium.label, allowed.mkString("{", ",", "}"), ""))
        else Nil
      case ColumnNotNull(c) =>
        import org.apache.spark.sql.functions.col
        val n = result.filter(col(c).isNull).count()
        if (n > 0) Seq(ValidationIssue(name, c, "query_column_nulls", n, 0,
          Severity.High.label, "no nulls", "")) else Nil
      case ColumnUnique(c) =>
        import org.apache.spark.sql.functions.{col, count_distinct, count, lit, struct}
        val r = result.agg(
          (count(lit(1)) - count_distinct(struct(col(c)))).as("d")).head()
        val n = r.getLong(0)
        if (n > 0) Seq(ValidationIssue(name, c, "query_column_duplicates",
          n, 0, Severity.High.label, "unique", "")) else Nil
      case GroupAggBetween(g, agg, v, lo, hi) =>
        import org.apache.spark.sql.functions._
        val a = agg match {
          case "count" => count(col(v)).cast("double")
          case "sum"   => sum(col(v)).cast("double")
          case "avg"   => avg(col(v))
          case "min"   => min(col(v)).cast("double")
          case "max"   => max(col(v)).cast("double")
        }
        val n = result.groupBy(col(g)).agg(a.as("__a"))
          .filter(col("__a") < lo || col("__a") > hi).count()
        if (n > 0) Seq(ValidationIssue(name, g, "group_aggregate_out_of_bounds",
          n, 0, Severity.Medium.label, s"$agg($v) in [$lo,$hi]", "")) else Nil
      case RowCountRatioBetween(baseSql, minR, maxR) =>
        SqlSafety.require(baseSql)
        val nQ = result.count()
        val nBase = spark.sql(baseSql).count()
        // base empty: both-empty passes (reference returns no issues on an
        // empty table); query rows over an empty base is ratio = +inf —
        // an upstream-load failure the max bound must catch, not a pass
        val ratio =
          if (nBase == 0) (if (nQ == 0) 0.0 else Double.PositiveInfinity)
          else nQ.toDouble / nBase
        if ((nBase > 0 || nQ > 0) && (ratio < minR || ratio > maxR))
          Seq(ValidationIssue(name, "*", "query_ratio_out_of_bounds", nQ,
            nBase, Severity.High.label, s"[$minR,$maxR]", f"$ratio%.6f"))
        else Nil
      case RowCountCompare(compareSql, rel, tol) =>
        SqlSafety.require(compareSql)
        val a = result.count()
        val b = spark.sql(compareSql).count()
        if (!QueryCheck.compareCounts(a, b, rel, tol))
          Seq(ValidationIssue(name, "*", "query_count_comparison_failed",
            math.abs(a - b), 0, Severity.High.label, s"A $rel B", s"A=$a B=$b"))
        else Nil
      case AggValue(c, expected, tol, lo, hi) =>
        val rows = result.limit(1).collect()
        if (rows.isEmpty)
          Seq(ValidationIssue(name, c, "query_aggregate_missing", 1, 0,
            Severity.High.label, "aggregate value", "empty result"))
        else {
          val v = rows(0).getAs[Any](c) match {
            case n: Number => n.doubleValue()
            case _         => Double.NaN
          }
          val bad =
            v.isNaN ||
            expected.exists(e => math.abs(v - e) > tol) ||
            lo.exists(v < _) || hi.exists(v > _)
          if (bad)
            Seq(ValidationIssue(name, c, "query_aggregate_out_of_bounds", 1, 0,
              Severity.Medium.label,
              expected.map(e => s"$e±$tol").getOrElse(s"[$lo,$hi]"),
              v.toString))
          else Nil
        }
      case AggCompare(compareSql, c, rel, tol) =>
        SqlSafety.require(compareSql)
        def firstVal(df: DataFrame): Option[Double] =
          df.limit(1).collect().headOption.map(_.getAs[Any](c) match {
            case n: Number => n.doubleValue()
            case _         => Double.NaN
          }).filterNot(_.isNaN)
        (firstVal(result), firstVal(spark.sql(compareSql))) match {
          case (Some(a), Some(b)) =>
            if (!QueryCheck.relationships(rel)(a, b, tol))
              Seq(ValidationIssue(name, c, "query_aggregate_comparison_failed",
                1, 0, Severity.High.label, s"A $rel B", s"A=$a B=$b"))
            else Nil
          case _ =>
            Seq(ValidationIssue(name, c, "query_aggregate_missing", 1, 0,
              Severity.High.label, "aggregate value on both sides", ""))
        }
    }
    CheckResult(name, category, issues.isEmpty, issues,
      (System.nanoTime() - t0) / 1000000)
  }
}
