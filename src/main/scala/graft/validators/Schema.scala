package graft.validators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema & table-level validators (reference: truthound
  * `validators/schema/` 14 classes + `validators/table/` 17 classes).
  * Schema checks are metadata-only — zero Spark jobs; row-count and
  * pairwise checks fuse into the suite scan. */

/** ColumnExistsValidator / ColumnNotExistsValidator. */
final case class ColumnExistsCheck(columns: Seq[String], mustExist: Boolean = true)
    extends Validator {
  val name = s"column_${if (mustExist) "exists" else "not_exists"}[${columns.mkString(",")}]"
  val category = "schema"
  override def schemaOnly = true
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  override def schemaIssues(schema: StructType): Seq[ValidationIssue] = {
    val present = schema.fieldNames.toSet
    columns.flatMap { c =>
      val exists = present.contains(c)
      if (exists != mustExist)
        Some(issue(c, if (mustExist) "missing_column" else "forbidden_column",
          1, 0, Severity.Critical))
      else None
    }
  }
}

/** ColumnTypeValidator: dtype match by Spark simpleString. */
final case class ColumnTypeCheck(expectations: Map[String, String]) extends Validator {
  val name = s"column_type[${expectations.keys.mkString(",")}]"
  val category = "schema"
  override def schemaOnly = true
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  override def schemaIssues(schema: StructType): Seq[ValidationIssue] =
    expectations.toSeq.flatMap { case (c, want) =>
      schema.fields.find(_.name == c) match {
        case None => Some(issue(c, "missing_column", 1, 0, Severity.Critical))
        case Some(f) if f.dataType.simpleString != want =>
          Some(issue(c, "type_mismatch", 1, 0, Severity.High,
            expected = want, actual = f.dataType.simpleString))
        case _ => None
      }
    }
}

/** ColumnOrderValidator + ColumnCountValidator. */
final case class ColumnOrderCheck(expected: Seq[String]) extends Validator {
  val name = "column_order"
  val category = "schema"
  override def schemaOnly = true
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  override def schemaIssues(schema: StructType): Seq[ValidationIssue] =
    if (!schema.fieldNames.toSeq.sameElements(expected))
      Seq(issue("*", "column_order_mismatch", 1, 0, Severity.Medium,
        expected = expected.mkString(","), actual = schema.fieldNames.mkString(",")))
    else Nil
}

/** RowCountValidator: row count ∈ [min, max]. */
final case class RowCountCheck(min: Long = 0L, max: Long = Long.MaxValue)
    extends Validator {
  val name = "row_count"
  val category = "table"
  def metricExprs(schema: StructType, stats: Metrics) = Nil // row_count always computed
  def evaluate(m: Metrics, total: Long) =
    if (total < min || total > max)
      Seq(issue("*", "row_count_out_of_bounds", total, total, Severity.High,
        expected = s"[$min,$max]", actual = total.toString))
    else Nil
}

/** ColumnPairValidator: pairwise relation A op B holds for every row. */
final case class ColumnPairCheck(a: String, b: String, op: String) extends Validator {
  require(Set(">=", "<=", ">", "<", "==", "!=").contains(op))
  val name = s"column_pair[$a$op$b]"
  val category = "schema"
  private val k = MetricKey("pair_violations", s"$a$op$b")
  private def pred: Column = op match {
    case ">=" => col(a) < col(b)
    case "<=" => col(a) > col(b)
    case ">"  => col(a) <= col(b)
    case "<"  => col(a) >= col(b)
    case "==" => col(a) =!= col(b)
    case "!=" => col(a) === col(b)
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(s"$a,$b", "pair_relation_violation", n, total,
      Severity.High, expected = s"$a $op $b")) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** MultiColumnSumValidator: Σ(parts) == total within eps. */
final case class ColumnSumCheck(parts: Seq[String], totalCol: String,
    eps: Double = 1e-6) extends Validator {
  val name = s"column_sum[${parts.mkString("+")}=$totalCol]"
  val category = "schema"
  private val k = MetricKey("sum_violations", s"${parts.mkString("+")}=$totalCol")
  private def pred: Column =
    abs(parts.map(col).reduce(_ + _) - col(totalCol)) > eps
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(totalCol, "sum_mismatch", n, total, Severity.High,
      expected = s"${parts.mkString("+")} == $totalCol (±$eps)")) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** ColumnPairInSetValidator: (a,b) combinations restricted to allowed pairs. */
final case class ColumnPairInSetCheck(a: String, b: String,
    allowed: Set[(String, String)], negate: Boolean = false) extends Validator {
  val name = s"pair_${if (negate) "not_in" else "in"}_set[$a,$b]"
  val category = "schema"
  private val k = MetricKey("pair_set_violations", s"$a+$b", negate.toString)
  private def pred: Column = {
    val key = concat_ws("\u0001", col(a).cast("string"), col(b).cast("string"))
    val in = key.isin(allowed.toSeq.map { case (x, y) => x + "\u0001" + y }: _*)
    if (negate) in else !in
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(s"$a,$b", "pair_not_allowed", n, total, Severity.Medium))
    else Nil
  }
}

/** TableFreshness: max(tsColumn) within maxAgeHours of `now`. */
final case class FreshnessCheck(tsColumn: String, maxAgeHours: Double,
    now: java.time.Instant = java.time.Instant.now()) extends Validator {
  val name = s"freshness[$tsColumn]"
  val category = "table"
  private val k = MetricKey("max_ts", tsColumn)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> max(col(tsColumn).cast("timestamp")))
  def evaluate(m: Metrics, total: Long) =
    m.get(k) match {
      case Some(ts: java.sql.Timestamp) =>
        val ageH = (now.toEpochMilli - ts.getTime) / 3600000.0
        if (ageH > maxAgeHours)
          Seq(issue(tsColumn, "stale_data", 1, total, Severity.High,
            expected = s"age<=${maxAgeHours}h", actual = f"$ageH%.1fh"))
        else Nil
      case _ => Seq(issue(tsColumn, "no_timestamp_data", total, total, Severity.High))
    }
}
