package graft.validators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Uniqueness validators (reference: truthound `validators/uniqueness/`,
  * 17 classes). Duplicate counts use `count(*) - count_distinct(struct(cols))`
  * so they fuse into the single aggregate pass; the struct wrapper keeps
  * rows with NULL key components counted as distinct values (Spark's bare
  * multi-arg count_distinct drops them). Approximate variants use Spark's
  * native HLL++ (`approx_count_distinct`) — the reference hand-rolls an HLL
  * (`uniqueness/approximate.py:27-163`) that Spark ships built in. */
object UniquenessKeys {
  def distinct(cols: Seq[String]) = MetricKey("distinct_count", cols.mkString("+"))
  def approxDistinct(c: String, rsd: Double) = MetricKey("approx_distinct", c, rsd.toString)
}

/** UniqueValidator / PrimaryKeyValidator core: no duplicate values in the
  * (composite) key; optionally also no nulls (primary-key semantics). */
final case class UniqueCheck(columns: Seq[String], requireNonNull: Boolean = false)
    extends Validator {
  val name = s"unique[${columns.mkString(",")}]"
  val category = "uniqueness"
  private val dk = UniquenessKeys.distinct(columns)
  private def keyStruct = struct(columns.map(col): _*)
  def metricExprs(schema: StructType, stats: Metrics) = {
    val base = Seq(dk -> count_distinct(keyStruct))
    if (requireNonNull)
      base ++ columns.map(c => keys.nullCount(c) -> count(when(col(c).isNull, 1)))
    else base
  }
  def evaluate(m: Metrics, total: Long) = {
    val dupes = total - m.long(dk)
    val colLabel = columns.mkString(",")
    val dupIssues =
      if (dupes > 0)
        Seq(issue(colLabel, "duplicate_values", dupes, total, Severity.High,
          expected = "all values unique", actual = s"$dupes duplicate rows"))
      else Nil
    val nullIssues =
      if (requireNonNull)
        columns.flatMap { c =>
          val n = m.long(keys.nullCount(c))
          if (n > 0) Some(issue(c, "null_in_key", n, total, Severity.Critical)) else None
        }
      else Nil
    dupIssues ++ nullIssues
  }
}

/** UniqueRatioValidator: n_unique / n >= threshold. */
final case class UniqueRatioCheck(column: String, minRatio: Double) extends Validator {
  val name = s"unique_ratio[$column]"
  val category = "uniqueness"
  private val dk = UniquenessKeys.distinct(Seq(column))
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(dk -> count_distinct(struct(col(column))))
  def evaluate(m: Metrics, total: Long) = {
    val ratio = if (total == 0) 1.0 else m.long(dk).toDouble / total
    if (ratio < minRatio)
      Seq(issue(column, "low_unique_ratio", total - m.long(dk), total,
        Severity.Medium, expected = s"unique_ratio>=$minRatio",
        actual = f"$ratio%.6f"))
    else Nil
  }
}

/** DistinctCountValidator: distinct count within [min, max]. */
final case class DistinctCountCheck(column: String, min: Long = 0L,
    max: Long = Long.MaxValue) extends Validator {
  val name = s"distinct_count[$column]"
  val category = "uniqueness"
  private val dk = UniquenessKeys.distinct(Seq(column))
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(dk -> count_distinct(struct(col(column))))
  def evaluate(m: Metrics, total: Long) = {
    val d = m.long(dk)
    if (d < min || d > max)
      Seq(issue(column, "distinct_count_out_of_bounds", d, total,
        Severity.Medium, expected = s"[$min,$max]", actual = d.toString))
    else Nil
  }
}

/** ApproximateDistinctCountValidator — Spark-native HLL++ with relative
  * standard deviation `rsd`; the 100 TB path for cardinality checks. */
final case class ApproxDistinctCheck(column: String, min: Long, max: Long,
    rsd: Double = 0.05) extends Validator {
  val name = s"approx_distinct[$column]"
  val category = "uniqueness"
  private val k = UniquenessKeys.approxDistinct(column, rsd)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> approx_count_distinct(col(column), rsd))
  def evaluate(m: Metrics, total: Long) = {
    val d = m.long(k)
    if (d < min || d > max)
      Seq(issue(column, "approx_distinct_out_of_bounds", d, total,
        Severity.Low, expected = s"[$min,$max]", actual = d.toString))
    else Nil
  }
}

/** DistinctValuesInSet / EqualSet / ContainSet — distinct-set algebra on a
  * bounded-cardinality column via collect_set (guard: only sane when the
  * validator targets a categorical column; the fused agg keeps the set on
  * the driver as one array cell). */
final case class DistinctSetCheck(column: String, allowed: Set[String],
    mode: String = "in_set") extends Validator {
  require(Set("in_set", "equal_set", "contain_set").contains(mode))
  val name = s"distinct_$mode[$column]"
  val category = "uniqueness"
  private val k = MetricKey("distinct_set", column)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> collect_set(col(column).cast("string")))
  def evaluate(m: Metrics, total: Long) = {
    val actual: Set[String] = m.get(k) match {
      case Some(s: scala.collection.Seq[_]) => s.map(_.toString).toSet
      case _                                => Set.empty
    }
    val bad = mode match {
      case "in_set"      => (actual -- allowed).nonEmpty
      case "equal_set"   => actual != allowed
      case "contain_set" => (allowed -- actual).nonEmpty
    }
    if (bad)
      Seq(issue(column, s"distinct_$mode", (actual -- allowed).size.toLong, total,
        Severity.Medium, expected = allowed.toSeq.sorted.mkString("{", ",", "}"),
        actual = actual.toSeq.sorted.mkString("{", ",", "}")))
    else Nil
  }
}

/** UniqueWithinRecord / ColumnPairUnique: values distinct across columns
  * within each row. */
final case class UniqueWithinRecordCheck(columns: Seq[String]) extends Validator {
  require(columns.size >= 2)
  val name = s"unique_within_record[${columns.mkString(",")}]"
  val category = "uniqueness"
  private val k = MetricKey("intra_row_dupes", columns.mkString("+"))
  private def pred: Column =
    columns.combinations(2).map { case Seq(a, b) => col(a) === col(b) }
      .reduce(_ || _)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(columns.mkString(","), "intra_row_duplicate", n, total))
    else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}
