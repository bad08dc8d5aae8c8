package graft.validators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Completeness validators (reference: truthound `validators/completeness/`,
  * 12 classes — null.py, empty.py, conditional.py, default.py, nan.py).
  * All compile to `count(CASE WHEN ...)` aggregates fused into the suite's
  * single scan. */
object keys {
  def nullCount(c: String)  = MetricKey("null_count", c)
  def rowCount              = MetricKey("row_count", "*")
}

/** NullValidator / NotNullValidator: nulls per column vs allowed ratio.
  * maxNullRatio = 0.0 ⇒ strict not-null. */
final case class NullCheck(
    columns: Seq[String],
    maxNullRatio: Double = 0.0,
    severity: Severity = Severity.High
) extends Validator {
  val name = s"null[${columns.mkString(",")}]"
  val category = "completeness"
  def metricExprs(schema: StructType, stats: Metrics) =
    columns.map(c => keys.nullCount(c) -> count(when(col(c).isNull, 1)))
  def evaluate(m: Metrics, total: Long) =
    columns.flatMap { c =>
      val nulls = m.long(keys.nullCount(c))
      val ratio = if (total == 0) 0.0 else nulls.toDouble / total
      if (ratio > maxNullRatio)
        Some(issue(c, "null_values", nulls, total, severity,
          expected = s"null_ratio<=$maxNullRatio", actual = f"$ratio%.6f"))
      else None
    }
  override def failPredicate(schema: StructType, stats: Metrics) =
    Some(columns.map(col(_).isNull).reduce(_ || _))
}

/** CompletenessRatioValidator: non-null ratio >= threshold. */
final case class CompletenessRatioCheck(column: String, minRatio: Double)
    extends Validator {
  val name = s"completeness_ratio[$column]"
  val category = "completeness"
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(keys.nullCount(column) -> count(when(col(column).isNull, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val nonNull = total - m.long(keys.nullCount(column))
    val ratio = if (total == 0) 1.0 else nonNull.toDouble / total
    if (ratio < minRatio)
      Seq(issue(column, "incomplete", total - nonNull, total, Severity.Medium,
        expected = s"completeness>=$minRatio", actual = f"$ratio%.6f"))
    else Nil
  }
}

/** EmptyStringValidator / WhitespaceOnlyValidator. */
final case class EmptyStringCheck(columns: Seq[String], includeWhitespace: Boolean = true)
    extends Validator {
  val name = s"empty_string[${columns.mkString(",")}]"
  val category = "completeness"
  private def pred(c: String): Column =
    if (includeWhitespace) trim(col(c)) === "" else col(c) === ""
  def metricExprs(schema: StructType, stats: Metrics) =
    columns.map(c => MetricKey("empty_count", c, includeWhitespace.toString) ->
      count(when(pred(c), 1)))
  def evaluate(m: Metrics, total: Long) =
    columns.flatMap { c =>
      val n = m.long(MetricKey("empty_count", c, includeWhitespace.toString))
      if (n > 0) Some(issue(c, "empty_string", n, total)) else None
    }
  override def failPredicate(schema: StructType, stats: Metrics) =
    Some(columns.map(pred).reduce(_ || _))
}

/** ConditionalNullValidator: `column` may be null only where `condition`. */
final case class ConditionalNullCheck(column: String, condition: Column,
    conditionDesc: String) extends Validator {
  val name = s"conditional_null[$column]"
  val category = "completeness"
  private val k = MetricKey("conditional_null", column, conditionDesc)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(col(column).isNull && !condition, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "null_outside_condition", n, total,
      Severity.High, expected = s"null only when $conditionDesc")) else Nil
  }
}

/** DefaultValueValidator: suspicious density of a default/sentinel value. */
final case class DefaultValueCheck(column: String, defaultValue: Any,
    maxRatio: Double = 0.5) extends Validator {
  val name = s"default_value[$column]"
  val category = "completeness"
  private val k = MetricKey("default_count", column, String.valueOf(defaultValue))
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(col(column) === lit(defaultValue), 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    val ratio = if (total == 0) 0.0 else n.toDouble / total
    if (ratio > maxRatio)
      Seq(issue(column, "default_value_density", n, total, Severity.Low,
        expected = s"ratio<=$maxRatio", actual = f"$ratio%.6f")) else Nil
  }
}

/** NaN family: NaNValidator / InfinityValidator / FiniteValidator over
  * floating-point columns. */
final case class NaNCheck(columns: Seq[String], allowNaN: Boolean = false,
    allowInfinity: Boolean = false) extends Validator {
  val name = s"nan[${columns.mkString(",")}]"
  val category = "completeness"
  def metricExprs(schema: StructType, stats: Metrics) =
    columns.flatMap { c =>
      Seq(
        MetricKey("nan_count", c) -> count(when(isnan(col(c)), 1)),
        MetricKey("inf_count", c) ->
          count(when(col(c) === Double.PositiveInfinity ||
                     col(c) === Double.NegativeInfinity, 1)))
    }
  def evaluate(m: Metrics, total: Long) =
    columns.flatMap { c =>
      val nan = m.long(MetricKey("nan_count", c))
      val inf = m.long(MetricKey("inf_count", c))
      (if (!allowNaN && nan > 0)
        Seq(issue(c, "nan_values", nan, total, Severity.High)) else Nil) ++
      (if (!allowInfinity && inf > 0)
        Seq(issue(c, "infinite_values", inf, total, Severity.High)) else Nil)
    }
}

/** NaNRatioValidator (reference `validators/completeness/nan.py` ratio
  * form): NaN share of a float column must stay under `maxRatio`. */
final case class NaNRatioCheck(column: String, maxRatio: Double)
    extends Validator {
  val name = s"nan_ratio[$column]"
  val category = "completeness"
  private val k = MetricKey("nan_count", column)
  private val kTotal = MetricKey("row_count", "*")
  def metricExprs(schema: org.apache.spark.sql.types.StructType, stats: Metrics) =
    Seq(k -> count(when(isnan(col(column)), 1)),
        kTotal -> count(lit(1)))
  def evaluate(m: Metrics, total: Long) = {
    val nan = m.long(k)
    val ratio = if (total == 0) 0.0 else nan.toDouble / total
    if (ratio > maxRatio)
      Seq(issue(column, "nan_ratio_exceeded", nan, total, Severity.High,
        expected = s"<=$maxRatio", actual = f"$ratio%.6f")) else Nil
  }
}
