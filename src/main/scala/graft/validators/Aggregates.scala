package graft.validators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Aggregate validators (reference: truthound `validators/aggregate/`,
  * 8 classes — central.py, spread.py, extremes.py, sum.py, type.py):
  * one aggregate value compared to bounds on the driver. All fuse. */
sealed abstract class AggBetweenCheck(agg: String, val column: String,
    lo: Double, hi: Double) extends Validator {
  val name = s"${agg}_between[$column]"
  val category = "aggregate"
  protected val k = MetricKey(agg, column)
  protected def aggExpr: Column
  def metricExprs(schema: StructType, stats: Metrics) = Seq(k -> aggExpr)
  def evaluate(m: Metrics, total: Long) =
    m.double(k) match {
      case Some(v) if v < lo || v > hi =>
        Seq(issue(column, s"${agg}_out_of_bounds", 1, total, Severity.Medium,
          expected = s"[$lo,$hi]", actual = f"$v%.6f"))
      case None if total > 0 =>
        Seq(issue(column, s"${agg}_undefined", 1, total, Severity.Low))
      case _ => Nil
    }
}

final case class MeanBetweenCheck(c: String, lo: Double, hi: Double)
    extends AggBetweenCheck("mean", c, lo, hi) {
  protected def aggExpr = avg(col(c))
}
/** Median via exact `percentile` while the distinct count fits
  * `maxExactDistinct` (fused HLL probe, [[graft.core.SizeGate]]);
  * over-budget columns auto-route to `percentile_approx`. */
final case class MedianBetweenCheck(c: String, lo: Double, hi: Double,
    maxExactDistinct: Long = SizeGate.DefaultMaxExactDistinct)
    extends AggBetweenCheck("median", c, lo, hi) {
  // The key must encode the exact/approx budget: two median checks on the
  // same column with different maxExactDistinct would otherwise dedup to
  // one fused expression and the second would silently read a value
  // computed under the first's gate (r11 ADVICE).
  override protected val k = MetricKey("median", c, maxExactDistinct.toString)
  protected def aggExpr = expr(s"percentile($c, 0.5)")
  override def probeExprs(schema: StructType) =
    if (maxExactDistinct > 0) Seq(SizeGate.probeExpr(c)) else Nil
  override def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> (if (SizeGate.exactOk(stats, c, maxExactDistinct)) aggExpr
              else percentile_approx(col(c), lit(0.5), lit(10000))))
  override def evaluate(m: Metrics, total: Long) =
    super.evaluate(m, total).map(i => i.copy(actual = i.actual +
      SizeGate.note(m, c, maxExactDistinct, exactRequested = true)))
}
final case class StdBetweenCheck(c: String, lo: Double, hi: Double)
    extends AggBetweenCheck("stddev", c, lo, hi) {
  protected def aggExpr = stddev_samp(col(c))
}
final case class VarianceBetweenCheck(c: String, lo: Double, hi: Double)
    extends AggBetweenCheck("variance", c, lo, hi) {
  protected def aggExpr = var_samp(col(c))
}
final case class MinBetweenCheck(c: String, lo: Double, hi: Double)
    extends AggBetweenCheck("min", c, lo, hi) {
  protected def aggExpr = min(col(c)).cast("double")
}
final case class MaxBetweenCheck(c: String, lo: Double, hi: Double)
    extends AggBetweenCheck("max", c, lo, hi) {
  protected def aggExpr = max(col(c)).cast("double")
}
final case class SumBetweenCheck(c: String, lo: Double, hi: Double)
    extends AggBetweenCheck("sum", c, lo, hi) {
  protected def aggExpr = sum(col(c)).cast("double")
}

/** AggregateTypeValidator (reference `aggregate/type.py`): infer whether a
  * string column is secretly numeric / date by parse-success ratio.
  * try_cast keeps this ANSI-safe. */
final case class InferredTypeCheck(column: String, expect: String,
    minRatio: Double = 0.95) extends Validator {
  require(Set("numeric", "date").contains(expect))
  val name = s"inferred_type[$column]"
  val category = "aggregate"
  private val k = MetricKey("parseable", column, expect)
  private val nn = MetricKey("non_null", column)
  private def parsed: Column = expect match {
    case "numeric" => expr(s"try_cast($column AS DOUBLE)")
    case "date"    => try_to_timestamp(col(column))
  }
  def metricExprs(schema: StructType, stats: Metrics) = Seq(
    k -> count(when(parsed.isNotNull, 1)),
    nn -> count(col(column)))
  def evaluate(m: Metrics, total: Long) = {
    val nonNull = m.long(nn)
    val ok = m.long(k)
    val ratio = if (nonNull == 0) 1.0 else ok.toDouble / nonNull
    if (ratio < minRatio)
      Seq(issue(column, s"not_$expect", nonNull - ok, total, Severity.Low,
        expected = s"$expect ratio>=$minRatio", actual = f"$ratio%.4f"))
    else Nil
  }
}

/** Multi-column validators (reference: truthound `validators/multi_column/`,
  * 20 classes — arithmetic.py, comparison.py, consistency.py,
  * statistical.py). Row-wise predicates and paired statistics, all fused. */

/** Sum/Product/Difference/Ratio vs target column within eps. */
final case class ArithmeticCheck(aCol: String, bCol: String, targetCol: String,
    op: String, eps: Double = 1e-9) extends Validator {
  require(Set("sum", "product", "difference", "ratio").contains(op))
  val name = s"arith_$op[$aCol,$bCol=$targetCol]"
  val category = "multi_column"
  private val k = MetricKey("arith_violations", s"$aCol$op$bCol=$targetCol", eps.toString)
  private def derived: Column = op match {
    case "sum"        => col(aCol) + col(bCol)
    case "product"    => col(aCol) * col(bCol)
    case "difference" => col(aCol) - col(bCol)
    case "ratio"      => col(aCol) / col(bCol)
  }
  private def pred: Column = abs(derived - col(targetCol)) > eps
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(targetCol, s"${op}_mismatch", n, total, Severity.High,
      expected = s"$op($aCol,$bCol) == $targetCol ±$eps")) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** MutualExclusivity / Coexistence / Implication boolean-logic checks. */
final case class ConsistencyCheck(aCol: String, bCol: String, mode: String)
    extends Validator {
  require(Set("mutual_exclusivity", "coexistence", "implication").contains(mode))
  val name = s"$mode[$aCol,$bCol]"
  val category = "multi_column"
  private val k = MetricKey("consistency_violations", s"$aCol/$bCol", mode)
  private def pred: Column = mode match {
    // both set at once is a violation
    case "mutual_exclusivity" => col(aCol).isNotNull && col(bCol).isNotNull
    // exactly one set is a violation
    case "coexistence" => col(aCol).isNotNull =!= col(bCol).isNotNull
    // a set requires b set
    case "implication" => col(aCol).isNotNull && col(bCol).isNull
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(s"$aCol,$bCol", s"${mode}_violation", n, total,
      Severity.Medium)) else Nil
  }
}

/** ChainComparisonValidator: c1 <= c2 <= ... <= cn row-wise. */
final case class ChainComparisonCheck(columns: Seq[String], strict: Boolean = false)
    extends Validator {
  require(columns.size >= 2)
  val name = s"chain[${columns.mkString("<=")}]"
  val category = "multi_column"
  private val k = MetricKey("chain_violations", columns.mkString("<="), strict.toString)
  private def pred: Column =
    columns.sliding(2).map { case Seq(a, b) =>
      if (strict) col(a) >= col(b) else col(a) > col(b)
    }.reduce(_ || _)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(columns.mkString(","), "chain_violation", n, total,
      Severity.Medium)) else Nil
  }
}

/** CorrelationValidator / CovarianceValidator: |corr(a,b)| or covariance
  * within bounds (reference `multi_column/statistical.py`). */
final case class CorrelationCheck(aCol: String, bCol: String,
    lo: Double = -1.0, hi: Double = 1.0, useCovariance: Boolean = false)
    extends Validator {
  val name = s"${if (useCovariance) "covar" else "corr"}[$aCol,$bCol]"
  val category = "multi_column"
  private val k = MetricKey(if (useCovariance) "covar" else "corr", s"$aCol/$bCol")
  def metricExprs(schema: StructType, stats: Metrics) = Seq(
    k -> (if (useCovariance) covar_samp(col(aCol), col(bCol))
          else corr(col(aCol), col(bCol))))
  def evaluate(m: Metrics, total: Long) =
    m.double(k) match {
      case Some(v) if v < lo || v > hi =>
        Seq(issue(s"$aCol,$bCol", "statistic_out_of_bounds", 1, total,
          Severity.Low, expected = s"[$lo,$hi]", actual = f"$v%.6f"))
      case _ => Nil
    }
}

/** PercentageValidator (reference `multi_column/arithmetic.py` percentage
  * form): part/whole × 100 within [minPct, maxPct] per row; whole = 0 rows
  * count as violations when countZeroWhole. */
final case class PercentageCheck(partCol: String, wholeCol: String,
    minPct: Double, maxPct: Double, countZeroWhole: Boolean = true)
    extends Validator {
  val name = s"percentage[$partCol/$wholeCol]"
  val category = "multi_column"
  private val k = MetricKey("pct_violations", s"$partCol/$wholeCol",
    s"$minPct..$maxPct")
  private def pred: Column = {
    val pct = col(partCol) * 100.0 / col(wholeCol)
    val zero = col(wholeCol) === 0
    (if (countZeroWhole) zero else lit(false)) ||
      (!zero && (pct < minPct || pct > maxPct))
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(s"$partCol/$wholeCol", "percentage_out_of_bounds",
      n, total, Severity.Medium, expected = s"[$minPct,$maxPct]%")) else Nil
  }
}

/** CovarianceValidator: covar_samp(a, b) within bounds — a standalone
  * check (r1 only used covariance internally for Mahalanobis). */
final case class CovarianceCheck(colA: String, colB: String,
    lo: Double, hi: Double) extends Validator {
  val name = s"covariance[$colA,$colB]"
  val category = "multi_column"
  private val k = MetricKey("covar", s"$colA+$colB")
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> covar_samp(col(colA), col(colB)))
  def evaluate(m: Metrics, total: Long) =
    m.double(k) match {
      case Some(v) if v < lo || v > hi =>
        Seq(issue(s"$colA,$colB", "covariance_out_of_bounds", 1, total,
          Severity.Medium, expected = s"[$lo,$hi]", actual = f"$v%.4f"))
      case _ => Nil
    }
}

/** MultiColumnVarianceValidator: the spread of per-column variances —
  * max(var)/min(var) must stay under `maxRatio` (feature-scale smell). */
final case class MultiColumnVarianceCheck(columns: Seq[String],
    maxRatio: Double) extends Validator {
  require(columns.size >= 2)
  val name = s"multi_variance[${columns.mkString(",")}]"
  val category = "multi_column"
  private def keyOf(c: String) = MetricKey("variance", c)
  def metricExprs(schema: StructType, stats: Metrics) =
    columns.map(c => keyOf(c) -> var_samp(col(c)))
  def evaluate(m: Metrics, total: Long) = {
    val vs = columns.flatMap(c => m.double(keyOf(c)))
    if (vs.size < 2) Nil
    else if (vs.min <= 0 && vs.max > 0)
      // a constant column next to a varying one IS the degenerate case
      // this check exists for — infinite ratio, not a silent pass
      Seq(issue(columns.mkString(","), "variance_ratio_exceeded", 1, total,
        Severity.Low, expected = s"<=$maxRatio", actual = "inf (zero-variance column)"))
    else if (vs.max > 0 && vs.max / vs.min > maxRatio)
      Seq(issue(columns.mkString(","), "variance_ratio_exceeded", 1, total,
        Severity.Low, expected = s"<=$maxRatio", actual = f"${vs.max / vs.min}%.2f"))
    else Nil
  }
}
