package graft.validators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.expressions.Window

/** Distribution validators (reference: truthound `validators/distribution/`,
  * 15 classes — range.py, set.py, monotonic.py, outlier.py, quantile.py,
  * statistical.py). Outlier checks are two-pass: scan 1 computes the
  * quantiles / moments, scan 2 counts violations — both fused with every
  * other validator in the suite. */

/** BetweenValidator / RangeValidator: value ∈ [min, max]. */
final case class RangeCheck(column: String, min: Option[Double], max: Option[Double],
    inclusive: Boolean = true, mostly: Double = 1.0) extends Validator {
  val name = s"range[$column]"
  val category = "distribution"
  private val k = MetricKey("range_violations", column, s"$min..$max/$inclusive")
  private def pred: Column = {
    val lo = min.map(v => if (inclusive) col(column) < v else col(column) <= v)
    val hi = max.map(v => if (inclusive) col(column) > v else col(column) >= v)
    (lo.toSeq ++ hi.toSeq).reduceOption(_ || _).getOrElse(lit(false))
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    // "mostly" semantics (reference validators/base.py:1196-1234): the
    // check passes while pass_ratio >= mostly
    val allowed = math.floor((1.0 - mostly) * total).toLong
    if (n > allowed)
      Seq(issue(column, "out_of_range", n, total, Severity.High,
        expected = s"[${min.getOrElse("-inf")},${max.getOrElse("+inf")}]" +
          (if (mostly < 1.0) s" mostly>=$mostly" else "")))
    else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** PositiveValidator / NonNegativeValidator. */
final case class SignCheck(column: String, allowZero: Boolean = false)
    extends Validator {
  val name = s"${if (allowZero) "non_negative" else "positive"}[$column]"
  val category = "distribution"
  private val k = MetricKey("sign_violations", column, allowZero.toString)
  private def pred: Column = if (allowZero) col(column) < 0 else col(column) <= 0
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "sign_violation", n, total, Severity.High,
      expected = if (allowZero) ">=0" else ">0")) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** InSetValidator / NotInSetValidator. */
final case class SetMembershipCheck(column: String, values: Seq[Any],
    negate: Boolean = false, mostly: Double = 1.0) extends Validator {
  val name = s"${if (negate) "not_in_set" else "in_set"}[$column]"
  val category = "distribution"
  private val k = MetricKey("set_violations", column,
    s"${negate}/${values.mkString("|")}")
  private def pred: Column = {
    val in = col(column).isin(values: _*)
    if (negate) in else (!in && col(column).isNotNull)
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    val allowed = math.floor((1.0 - mostly) * total).toLong
    if (n > allowed) Seq(issue(column, if (negate) "forbidden_value" else "value_not_in_set",
      n, total, Severity.Medium,
      expected = values.mkString("{", ",", "}"))) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** OutlierValidator (IQR fences). Two-pass: quantiles then fence counts.
  * Uses exact `percentile` (matches a SQL oracle's quantile_cont) while
  * the column's distinct count fits `maxExactDistinct` — the fused HLL
  * probe ([[graft.core.SizeGate]], scan 0) auto-routes over-budget
  * columns to t-digest `percentile_approx`, recording the switch in any
  * emitted issue. `exact = false` forces approx; `maxExactDistinct <= 0`
  * forces exact (the pre-gate escape hatches, both kept). */
final case class IqrOutlierCheck(column: String, k: Double = 1.5,
    exact: Boolean = true, maxOutlierRatio: Double = 0.0,
    maxExactDistinct: Long = SizeGate.DefaultMaxExactDistinct)
    extends Validator {
  val name = s"iqr_outlier[$column]"
  val category = "distribution"
  private val q1k = MetricKey("q1", column, s"$exact/$maxExactDistinct")
  private val q3k = MetricKey("q3", column, s"$exact/$maxExactDistinct")
  private val vk  = MetricKey("iqr_violations", column, s"$k/$exact")
  private def pct(p: Double, ex: Boolean): Column =
    if (ex) expr(s"percentile($column, $p)")
    else percentile_approx(col(column), lit(p), lit(10000))
  override def probeExprs(schema: StructType) =
    if (exact && maxExactDistinct > 0) Seq(SizeGate.probeExpr(column)) else Nil
  override def statsExprs(schema: StructType) =
    statsExprs(schema, Metrics.empty)
  override def statsExprs(schema: StructType, probes: Metrics) = {
    val ex = exact && SizeGate.exactOk(probes, column, maxExactDistinct)
    Seq(q1k -> pct(0.25, ex), q3k -> pct(0.75, ex))
  }
  def metricExprs(schema: StructType, stats: Metrics) = {
    val (lo, hi) = fences(stats)
    Seq(vk -> count(when(col(column) < lo || col(column) > hi, 1)))
  }
  private def fences(stats: Metrics): (Double, Double) = {
    val q1 = stats.double(q1k).getOrElse(0.0)
    val q3 = stats.double(q3k).getOrElse(0.0)
    val iqr = q3 - q1
    (q1 - k * iqr, q3 + k * iqr)
  }
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(vk)
    val ratio = if (total == 0) 0.0 else n.toDouble / total
    if (ratio > maxOutlierRatio && n > 0) {
      val (lo, hi) = fences(m)
      Seq(issue(column, "iqr_outliers", n, total, Severity.Medium,
        expected = f"[$lo%.4f,$hi%.4f]", actual = s"$n outliers" +
          SizeGate.note(m, column, maxExactDistinct, exact)))
    } else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = {
    val (lo, hi) = fences(stats)
    Some(col(column) < lo || col(column) > hi)
  }
}

/** ZScoreOutlierValidator: |x - mean| / std > z. Two-pass. */
final case class ZScoreOutlierCheck(column: String, z: Double = 3.0,
    maxOutlierRatio: Double = 0.0) extends Validator {
  val name = s"zscore_outlier[$column]"
  val category = "distribution"
  private val mk = MetricKey("mean", column)
  private val sk = MetricKey("stddev", column)
  private val vk = MetricKey("zscore_violations", column, z.toString)
  override def statsExprs(schema: StructType) =
    Seq(mk -> avg(col(column)), sk -> stddev_samp(col(column)))
  def metricExprs(schema: StructType, stats: Metrics) = {
    val mean = stats.double(mk).getOrElse(0.0)
    val sd   = stats.double(sk).getOrElse(0.0)
    if (sd == 0.0) Nil
    else Seq(vk -> count(when(abs(col(column) - mean) / sd > z, 1)))
  }
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(vk)
    val ratio = if (total == 0) 0.0 else n.toDouble / total
    if (ratio > maxOutlierRatio && n > 0)
      Seq(issue(column, "zscore_outliers", n, total, Severity.Medium,
        expected = s"|z|<=$z")) else Nil
  }
}

/** QuantileValidator: quantile(p) ∈ [lo, hi]. Exact `percentile` while
  * the distinct count fits `maxExactDistinct` (fused HLL probe,
  * [[graft.core.SizeGate]]); over-budget columns auto-route to
  * `percentile_approx` with the switch recorded in emitted issues. */
final case class QuantileCheck(column: String, p: Double, lo: Double, hi: Double,
    exact: Boolean = true,
    maxExactDistinct: Long = SizeGate.DefaultMaxExactDistinct)
    extends Validator {
  val name = s"quantile[$column,$p]"
  val category = "distribution"
  private val k = MetricKey("quantile", column, s"$p/$exact/$maxExactDistinct")
  override def probeExprs(schema: StructType) =
    if (exact && maxExactDistinct > 0) Seq(SizeGate.probeExpr(column)) else Nil
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> (if (exact && SizeGate.exactOk(stats, column, maxExactDistinct))
                expr(s"percentile($column, $p)")
              else percentile_approx(col(column), lit(p), lit(10000))))
  def evaluate(m: Metrics, total: Long) =
    m.double(k) match {
      case Some(v) if v < lo || v > hi =>
        Seq(issue(column, "quantile_out_of_bounds", 1, total, Severity.Medium,
          expected = s"q$p in [$lo,$hi]", actual = f"$v%.6f" +
            SizeGate.note(m, column, maxExactDistinct, exact)))
      case _ => Nil
    }
}

/** IncreasingValidator / DecreasingValidator: monotone sequence along an
  * explicit ordering. Runs as a dedicated scan (needs a window). With
  * `partitionBy` (per-series key) the lag window distributes by key. The
  * UNKEYED form no longer collapses to one global-window task: for
  * double-orderable columns it runs the distributed range-partitioned
  * adjacent-pair scan (one shuffle, P tasks, P−1 boundary pairs fixed up
  * on the driver — `graft.ops.SeqScan`); only non-numeric values fall
  * back to the single-task window, and loudly. */
final case class MonotonicCheck(column: String, orderBy: String,
    increasing: Boolean = true, strict: Boolean = false,
    partitionBy: Seq[String] = Nil) extends Validator with DedicatedScan {
  val name = s"monotonic[$column]"
  val category = "distribution"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val inc = increasing; val str = strict
    def pairViol(pv: Option[Double], cv: Option[Double]): Boolean =
      pv.nonEmpty && cv.nonEmpty && {
        if (inc) { if (str) cv.get <= pv.get else cv.get < pv.get }
        else     { if (str) cv.get >= pv.get else cv.get > pv.get }
      }
    import graft.ops.SeqScan
    val (ordT, valT) = (df.schema(orderBy).dataType, df.schema(column).dataType)
    // integral columns take the EXACT long path (bigint ids beyond 2^53
    // lose distinctness as doubles); float/double/date/ts take the double
    // path; anything else (decimal, mixed long+double) falls back to the
    // single-task window
    val longPath = partitionBy.isEmpty &&
      SeqScan.longExact(ordT) && SeqScan.longExact(valT)
    val doublePath = !longPath && partitionBy.isEmpty &&
      SeqScan.doubleExact(ordT) && SeqScan.doubleExact(valT)
    val n =
      if (longPath)
        SeqScan.adjacentViolationsLong(df, col(orderBy), col(column),
          (_, pv, _, cv) => pv.nonEmpty && cv.nonEmpty && {
            if (inc) { if (str) cv.get <= pv.get else cv.get < pv.get }
            else     { if (str) cv.get >= pv.get else cv.get > pv.get }
          })
      else if (doublePath)
        SeqScan.adjacentViolations(df, col(orderBy), col(column),
          (_, pv, _, cv) => pairViol(pv, cv))
      else {
        val w = (if (partitionBy.nonEmpty)
                   Window.partitionBy(partitionBy.map(col): _*)
                 else Window.partitionBy()).orderBy(col(orderBy))
        val prev = lag(col(column), 1).over(w)
        val viol =
          if (increasing) { if (strict) col(column) <= prev else col(column) < prev }
          else            { if (strict) col(column) >= prev else col(column) > prev }
        df.withColumn("__viol", when(prev.isNotNull && viol, 1).otherwise(0))
          .agg(sum(col("__viol"))).head().getLong(0)
      }
    if (n > 0)
      Seq(issue(column, if (increasing) "not_increasing" else "not_decreasing",
        n, total, Severity.Medium)) else Nil
  }
}

/** MostCommonValueValidator: the modal value must be in `expected`.
  * Dedicated scan: groupBy(column) top-1 (map-side combine keeps the
  * shuffle at O(distinct values)). */
final case class MostCommonValueCheck(column: String, expected: Set[String])
    extends Validator with DedicatedScan {
  val name = s"most_common[$column]"
  val category = "distribution"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val top = df.groupBy(col(column)).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(column).asc_nulls_last).limit(1).collect()
    top.headOption match {
      case Some(r) if r.get(0) != null && !expected.contains(r.get(0).toString) =>
        Seq(issue(column, "unexpected_mode", r.getLong(1), total, Severity.Low,
          expected = expected.mkString("{", ",", "}"), actual = r.get(0).toString))
      case _ => Nil
    }
  }
}
