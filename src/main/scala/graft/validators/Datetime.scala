package graft.validators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Datetime validators (reference: truthound `validators/datetime/`,
  * 10 classes — format.py, range.py, order.py, freshness.py, timezone.py).
  * ANSI-safe: parse checks use try_to_timestamp so malformed values count
  * as failures instead of aborting the scan. */

/** DateFormatValidator: string column parses with the given pattern. */
final case class DateFormatCheck(column: String, format: String) extends Validator {
  val name = s"date_format[$column]"
  val category = "datetime"
  private val k = MetricKey("date_parse_fail", column, format)
  private def pred: Column =
    col(column).isNotNull && try_to_timestamp(col(column), lit(format)).isNull
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "unparseable_date", n, total, Severity.Medium,
      expected = format)) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** DateBetweenValidator / FutureDateValidator / PastDateValidator. */
final case class DateRangeCheck(column: String,
    min: Option[java.time.Instant], max: Option[java.time.Instant])
    extends Validator {
  val name = s"date_range[$column]"
  val category = "datetime"
  private val k = MetricKey("date_range_violations", column, s"$min..$max")
  private def pred: Column = {
    val c = col(column).cast("timestamp")
    val lo = min.map(i => c < lit(java.sql.Timestamp.from(i)))
    val hi = max.map(i => c > lit(java.sql.Timestamp.from(i)))
    (lo.toSeq ++ hi.toSeq).reduceOption(_ || _).getOrElse(lit(false))
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "date_out_of_range", n, total, Severity.Medium,
      expected = s"[${min.getOrElse("-inf")},${max.getOrElse("+inf")}]")) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

object DateRangeCheck {
  /** FutureDateValidator: no timestamps after `now`. */
  def noFuture(column: String, now: java.time.Instant = java.time.Instant.now()) =
    DateRangeCheck(column, None, Some(now))
  /** PastDateValidator: no timestamps before `earliest`. */
  def noPastBefore(column: String, earliest: java.time.Instant) =
    DateRangeCheck(column, Some(earliest), None)
}

/** DateOrderValidator: start <= end for every row. */
final case class DateOrderCheck(startCol: String, endCol: String,
    allowEqual: Boolean = true) extends Validator {
  val name = s"date_order[$startCol<=$endCol]"
  val category = "datetime"
  private val k = MetricKey("date_order_violations", s"$startCol<=$endCol")
  private def pred: Column =
    if (allowEqual) col(startCol) > col(endCol) else col(startCol) >= col(endCol)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(s"$startCol,$endCol", "date_order_violation", n, total,
      Severity.High, expected = s"$startCol <= $endCol")) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** DatePartCoverageValidator: all values of a date part present
  * (e.g. all 7 weekdays seen — gap smell for periodic feeds). */
final case class DatePartCoverageCheck(column: String, part: String,
    expectedCount: Int) extends Validator {
  require(Set("dayofweek", "month", "hour", "day").contains(part),
    s"unsupported date part: $part")
  val name = s"date_part_coverage[$column,$part]"
  val category = "datetime"
  private val k = MetricKey("date_part_distinct", column, part)
  private def partExpr: Column = part match {
    case "dayofweek" => dayofweek(col(column))
    case "month"     => month(col(column))
    case "hour"      => hour(col(column))
    case "day"       => dayofmonth(col(column))
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count_distinct(partExpr))
  def evaluate(m: Metrics, total: Long) = {
    val d = m.long(k)
    if (d < expectedCount)
      Seq(issue(column, s"missing_${part}_coverage", expectedCount - d, total,
        Severity.Medium, expected = s"$expectedCount distinct", actual = d.toString))
    else Nil
  }
}

/** RecentDataValidator / GroupedRecentDataValidator: per-group freshness —
  * every group's max(ts) within maxAgeHours. Dedicated groupBy scan
  * (shuffle is O(groups)). */
final case class GroupedFreshnessCheck(tsColumn: String, groupCol: String,
    maxAgeHours: Double, now: java.time.Instant = java.time.Instant.now())
    extends Validator with DedicatedScan {
  val name = s"grouped_freshness[$groupCol.$tsColumn]"
  val category = "datetime"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: org.apache.spark.sql.DataFrame, total: Long) = {
    val cutoff = java.sql.Timestamp.from(now.minusSeconds((maxAgeHours * 3600).toLong))
    val stale = df.groupBy(col(groupCol))
      .agg(max(col(tsColumn).cast("timestamp")).as("max_ts"))
      .filter(col("max_ts") < lit(cutoff))
      .count()
    if (stale > 0)
      Seq(issue(groupCol, "stale_groups", stale, total, Severity.High,
        expected = s"all groups fresher than ${maxAgeHours}h")) else Nil
  }
}

/** TimezoneValidator: timestamp columns are tz-aware (TimestampType) vs
  * naive (TimestampNTZType) per expectation. Schema-only. */
final case class TimezoneCheck(column: String, expectTzAware: Boolean = true)
    extends Validator {
  val name = s"timezone[$column]"
  val category = "datetime"
  override def schemaOnly = true
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  override def schemaIssues(schema: StructType) =
    schema.fields.find(_.name == column) match {
      case Some(f) =>
        val aware = f.dataType == TimestampType
        val naive = f.dataType == TimestampNTZType
        if (!aware && !naive)
          Seq(issue(column, "not_a_timestamp", 1, 0, Severity.High,
            actual = f.dataType.simpleString))
        else if (aware != expectTzAware)
          Seq(issue(column, "timezone_awareness_mismatch", 1, 0, Severity.Low,
            expected = if (expectTzAware) "tz-aware" else "naive",
            actual = f.dataType.simpleString))
        else Nil
      case None => Seq(issue(column, "missing_column", 1, 0, Severity.Critical))
    }
}
