package graft.validators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Expression validators (reference: truthound
  * `validators/query/expression.py` — CustomExpressionValidator,
  * ConditionalExpressionValidator, MultiConditionValidator,
  * RowLevelValidator).
  *
  * All but RowLevelCheck compile to single fused aggregate expressions
  * (the metricExprs fast path), so they cost nothing beyond the suite's
  * shared scan. RowLevelCheck is the honest escape hatch for logic a
  * Column can't express — a distributed typed filter, documented as the
  * slow path exactly like the reference's row-by-row warning. */

/** CustomExpressionValidator: rows must satisfy an arbitrary boolean
  * Column (the reference's "most flexible validator"). */
final case class CustomExpressionCheck(predicate: Column, description: String,
    mostly: Double = 1.0) extends Validator {
  val name = s"custom_expression[$description]"
  val category = "query"
  // keyed by the predicate's expression string, not just the free-form
  // description: two checks sharing a description but differing in
  // predicate must not collide in the suite's MetricKey dedup
  private val k = MetricKey("custom_expr_fail", "*",
    s"$description/$predicate")
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(!coalesce(predicate, lit(false)), 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    val allowed = math.floor((1.0 - mostly) * total).toLong
    if (n > allowed)
      Seq(issue("*", "custom_expression_failed", n, total, Severity.Medium,
        expected = description)) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) =
    Some(!coalesce(predicate, lit(false)))
}

/** ConditionalExpressionValidator: IF `condition` THEN `thenExpr` must
  * hold; failure ratio is measured against the condition-true rows
  * (reference `expression.py:41-100`). */
final case class ConditionalExpressionCheck(condition: Column,
    thenExpr: Column, description: String, mostly: Double = 1.0)
    extends Validator {
  val name = s"conditional_expression[$description]"
  val category = "query"
  private val kTrue = MetricKey("cond_expr_true", "*",
    s"$description/$condition/$thenExpr")
  private val kFail = MetricKey("cond_expr_fail", "*",
    s"$description/$condition/$thenExpr")
  def metricExprs(schema: StructType, stats: Metrics) = Seq(
    kTrue -> count(when(condition, 1)),
    kFail -> count(when(condition && !coalesce(thenExpr, lit(false)), 1)))
  def evaluate(m: Metrics, total: Long) = {
    val condTrue = m.long(kTrue)
    val n = m.long(kFail)
    val allowed = math.floor((1.0 - mostly) * condTrue).toLong
    if (n > allowed)
      Seq(issue("*", "conditional_validation_failed", n, condTrue,
        Severity.Medium, expected = description)) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) =
    Some(condition && !coalesce(thenExpr, lit(false)))
}

/** MultiConditionValidator: AND = every condition must hold per row,
  * OR = at least one (reference `expression.py:103-184`). */
final case class MultiConditionCheck(conditions: Seq[(Column, String)],
    logic: String = "and", mostly: Double = 1.0) extends Validator {
  require(Seq("and", "or").contains(logic.toLowerCase),
    "logic must be 'and' or 'or'")
  require(conditions.nonEmpty, "multi_condition needs conditions")
  val name = s"multi_condition[${conditions.map(_._2).mkString(", ")}]"
  val category = "query"
  private val k = MetricKey("multi_condition_fail",
    "*", logic + "/" + conditions.map(c => s"${c._2}=${c._1}").mkString(","))
  private def combined: Column = {
    val cs = conditions.map(c => coalesce(c._1, lit(false)))
    if (logic.toLowerCase == "and") cs.reduce(_ && _) else cs.reduce(_ || _)
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(!combined, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    val allowed = math.floor((1.0 - mostly) * total).toLong
    if (n > allowed)
      Seq(issue("*", "multi_condition_failed", n, total, Severity.Medium,
        expected = s"${logic.toUpperCase}: " +
          conditions.map(_._2).mkString(", "))) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) =
    Some(!combined)
}

/** RowLevelValidator: arbitrary row predicate, distributed as a typed
  * filter over the selected columns (lambda ships to executors — no
  * driver collect). Slower than any Column form: no codegen, one
  * deserialization per row. Use only when an expression can't say it,
  * as the reference's own docstring warns (`expression.py:187-205`). */
final case class RowLevelCheck(columns: Seq[String], fn: Row => Boolean,
    description: String) extends Validator with DedicatedScan {
  val name = s"row_level[$description]"
  val category = "query"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    val projected = if (columns.isEmpty) df
      else df.select(columns.map(col): _*)
    val n = projected.filter((r: Row) => !fn(r)).count()
    if (n > 0)
      Seq(issue(columns.mkString(","), "row_level_failed", n, total,
        Severity.Medium, expected = description)) else Nil
  }
}
