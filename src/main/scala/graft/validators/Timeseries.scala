package graft.validators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series validators (reference: truthound `validators/timeseries/`,
  * 19 classes — gap.py, monotonic.py, seasonality.py, trend.py,
  * completeness.py; support types TimeFrequency/TimeSeriesStats).
  *
  * Scale design: every windowed computation partitions by the series key
  * (`partitionBy`) so the lag/lead windows distribute; an unkeyed series
  * falls back to a single-task global window — correct, but the validator
  * docs call it out (SURVEY §7.4 risk 3). Seasonality/trend reduce to
  * date-part group-bys and covariance aggregates — no window at all. */

/** TimestampGapValidator / IntervalValidator: successive-timestamp gaps
  * within [minGap, maxGap] seconds. */
final case class TimeGapCheck(tsCol: String, minGapSec: Option[Double],
    maxGapSec: Option[Double], partitionBy: Seq[String] = Nil)
    extends Validator with DedicatedScan {
  val name = s"time_gap[$tsCol]"
  val category = "timeseries"
  def metricExprs(schema: org.apache.spark.sql.types.StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val ts = col(tsCol).cast("timestamp") // NTZ-robust
    val n = if (partitionBy.isEmpty) {
      // Unkeyed series: distributed range-partitioned adjacent-pair scan
      // (one shuffle) instead of a single-task global window. EXACT long
      // micros (a double cast of epoch micros would stay representable,
      // but the long path keeps gap arithmetic integer-exact like the
      // windowed form's `unix_micros` difference).
      val (lo, hi) = (minGapSec, maxGapSec)
      graft.ops.SeqScan.adjacentViolationsLong(df,
        unix_micros(ts), lit(0L),
        (po, _, co, _) => po.nonEmpty && co.nonEmpty && {
          val g = (co.get - po.get) / 1e6
          lo.exists(g < _) || hi.exists(g > _)
        })
    } else {
      val w = Window.partitionBy(partitionBy.map(col): _*).orderBy(col(tsCol))
      val gap = unix_micros(ts) - unix_micros(lag(ts, 1).over(w))
      val gapSec = gap.cast("double") / 1e6
      val viol = (minGapSec.map(gapSec < _).toSeq ++ maxGapSec.map(gapSec > _).toSeq)
        .reduceOption(_ || _).getOrElse(lit(false))
      df.withColumn("__g", when(gap.isNotNull && viol, 1).otherwise(0))
        .agg(sum(col("__g"))).head().getLong(0)
    }
    if (n > 0)
      Seq(issue(tsCol, "gap_out_of_bounds", n, total, Severity.Medium,
        expected = s"[${minGapSec.getOrElse(0.0)},${maxGapSec.getOrElse("inf")}]s"))
    else Nil
  }
}

/** DuplicateTimestampValidator: repeated timestamps within a series. */
final case class DuplicateTimestampCheck(tsCol: String,
    partitionBy: Seq[String] = Nil) extends Validator {
  val name = s"dup_timestamp[$tsCol]"
  val category = "timeseries"
  private val k = MetricKey("ts_dupes", (partitionBy :+ tsCol).mkString("+"))
  def metricExprs(schema: org.apache.spark.sql.types.StructType, stats: Metrics) =
    Seq(k -> (count(lit(1)) -
      count_distinct(struct((partitionBy :+ tsCol).map(col): _*))))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(tsCol, "duplicate_timestamps", n, total, Severity.Medium))
    else Nil
  }
}

/** TimeSeriesCompletenessValidator: every expected bucket in [min, max] has
  * at least one observation (gap smell). Bucket count vs expected count. */
final case class TimeCompletenessCheck(tsCol: String, bucket: String = "day",
    minCoverage: Double = 1.0) extends Validator with DedicatedScan {
  require(Set("hour", "day", "week", "month").contains(bucket),
    s"unsupported bucket: $bucket")
  val name = s"time_completeness[$tsCol]"
  val category = "timeseries"
  def metricExprs(schema: org.apache.spark.sql.types.StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val r = df.agg(
      count_distinct(date_trunc(bucket, col(tsCol))).as("present"),
      min(col(tsCol)).as("lo"), max(col(tsCol)).as("hi")).head()
    val present = r.getLong(0)
    if (r.isNullAt(1)) return Nil
    val (lo, hi) = (r.getTimestamp(1), r.getTimestamp(2))
    // calendar-aligned bucket count (epoch division would anchor weeks on
    // Thursday and months on 30 days, disagreeing with date_trunc)
    import java.time.temporal.ChronoUnit
    // date_trunc truncates in the session timezone — the expected-bucket
    // math must use the same zone or coverage is wrong off-UTC
    val zone = java.time.ZoneId.of(
      df.sparkSession.sessionState.conf.sessionLocalTimeZone)
    val (lz, hz) = (lo.toInstant.atZone(zone), hi.toInstant.atZone(zone))
    val expected = bucket match {
      case "hour" => ChronoUnit.HOURS.between(lz.truncatedTo(ChronoUnit.HOURS),
        hz.truncatedTo(ChronoUnit.HOURS)) + 1
      case "day" => ChronoUnit.DAYS.between(lz.toLocalDate, hz.toLocalDate) + 1
      case "week" =>
        import java.time.DayOfWeek
        val lw = lz.toLocalDate.`with`(
          java.time.temporal.TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        val hw = hz.toLocalDate.`with`(
          java.time.temporal.TemporalAdjusters.previousOrSame(DayOfWeek.MONDAY))
        ChronoUnit.WEEKS.between(lw, hw) + 1
      case "month" => ChronoUnit.MONTHS.between(
        lz.toLocalDate.withDayOfMonth(1), hz.toLocalDate.withDayOfMonth(1)) + 1
    }
    val coverage = if (expected == 0) 1.0 else present.toDouble / expected
    if (coverage < minCoverage)
      Seq(issue(tsCol, "missing_time_buckets", expected - present, total,
        Severity.Medium, expected = s"$expected ${bucket}s",
        actual = s"$present present"))
    else Nil
  }
}

/** TrendValidator: least-squares slope of value over time within bounds.
  * slope = covar(t, y) / var(t) — two fused aggregates, no window, fully
  * distributed. */
final case class TrendCheck(tsCol: String, valueCol: String,
    minSlopePerDay: Double, maxSlopePerDay: Double) extends Validator {
  val name = s"trend[$valueCol]"
  val category = "timeseries"
  private val k = MetricKey("trend_slope", s"$tsCol/$valueCol")
  def metricExprs(schema: org.apache.spark.sql.types.StructType, stats: Metrics) = {
    // cast handles TIMESTAMP_NTZ sources (parquet written without UTC
    // adjustment) — unix_micros only accepts TIMESTAMP
    val tDays = unix_micros(col(tsCol).cast("timestamp")).cast("double") / 86400e6
    Seq(k -> (covar_samp(tDays, col(valueCol)) / var_samp(tDays)))
  }
  def evaluate(m: Metrics, total: Long) =
    m.double(k) match {
      case Some(s) if s < minSlopePerDay || s > maxSlopePerDay =>
        Seq(issue(valueCol, "trend_out_of_bounds", 1, total, Severity.Medium,
          expected = s"slope/day in [$minSlopePerDay,$maxSlopePerDay]",
          actual = f"$s%.6f"))
      case _ => Nil
    }
}

/** SeasonalityValidator: variance of the date-part profile (e.g. hourly
  * means) relative to overall variance must stay under a bound — a cheap
  * distributed seasonality screen (full decomposition is a sampled,
  * driver-side operation in the reference too). */
final case class SeasonalityCheck(tsCol: String, valueCol: String,
    part: String = "hour", maxProfileRatio: Double = 1.0)
    extends Validator with DedicatedScan {
  require(Set("hour", "dayofweek", "month", "day").contains(part),
    s"unsupported date part: $part")
  val name = s"seasonality[$valueCol,$part]"
  val category = "timeseries"
  def metricExprs(schema: org.apache.spark.sql.types.StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  private def partOf(c: Column): Column = part match {
    case "hour" => hour(c); case "dayofweek" => dayofweek(c)
    case "month" => month(c); case "day" => dayofmonth(c)
  }
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val overall = df.agg(var_samp(col(valueCol))).head().getDouble(0)
    if (overall == 0.0) return Nil
    val profileVar = df.groupBy(partOf(col(tsCol)).as("p"))
      .agg(avg(col(valueCol)).as("m"))
      .agg(var_samp(col("m"))).head().getDouble(0)
    val ratio = profileVar / overall
    if (ratio > maxProfileRatio)
      Seq(issue(valueCol, "seasonal_profile_detected", 1, total, Severity.Low,
        expected = s"profile_var/var<=$maxProfileRatio", actual = f"$ratio%.6f"))
    else Nil
  }
}

/** ML-feature validators (reference: truthound `validators/ml_feature/`,
  * 9 classes — correlation.py, leakage.py, scale.py, null_impact.py). */

/** FeatureCorrelationMatrixValidator: flag |corr| >= threshold between
  * feature pairs. One fused agg of all pairwise corrs. */
final case class FeatureCorrelationCheck(columns: Seq[String],
    maxAbsCorr: Double = 0.95) extends Validator {
  require(columns.size >= 2)
  val name = s"feature_corr[${columns.mkString(",")}]"
  val category = "ml_feature"
  private def key(a: String, b: String) = MetricKey("corr", s"$a/$b")
  def metricExprs(schema: org.apache.spark.sql.types.StructType, stats: Metrics) =
    columns.combinations(2).map { case Seq(a, b) =>
      key(a, b) -> corr(col(a), col(b))
    }.toSeq
  def evaluate(m: Metrics, total: Long) =
    columns.combinations(2).toSeq.flatMap { case Seq(a, b) =>
      m.double(key(a, b)) match {
        case Some(c) if math.abs(c) >= maxAbsCorr =>
          Some(issue(s"$a,$b", "collinear_features", 1, total, Severity.Medium,
            expected = s"|corr|<$maxAbsCorr", actual = f"$c%.4f"))
        case _ => None
      }
    }
}

/** TargetLeakageValidator: any feature with |corr(feature, target)| above
  * threshold leaks the label. */
final case class TargetLeakageCheck(features: Seq[String], target: String,
    maxAbsCorr: Double = 0.95) extends Validator {
  val name = s"target_leakage[$target]"
  val category = "ml_feature"
  private def key(f: String) = MetricKey("corr", s"$f/$target")
  def metricExprs(schema: org.apache.spark.sql.types.StructType, stats: Metrics) =
    features.map(f => key(f) -> corr(col(f), col(target)))
  def evaluate(m: Metrics, total: Long) =
    features.flatMap { f =>
      m.double(key(f)) match {
        case Some(c) if math.abs(c) >= maxAbsCorr =>
          Some(issue(f, "target_leakage", 1, total, Severity.Critical,
            expected = s"|corr(f,$target)|<$maxAbsCorr", actual = f"$c%.4f"))
        case _ => None
      }
    }
}

/** FeatureScaleValidator: feature range must stay within expected scale
  * (catches unscaled features entering a pipeline). */
final case class FeatureScaleCheck(column: String, maxAbs: Double)
    extends Validator {
  val name = s"feature_scale[$column]"
  val category = "ml_feature"
  private val k = MetricKey("abs_max", column)
  def metricExprs(schema: org.apache.spark.sql.types.StructType, stats: Metrics) =
    Seq(k -> max(abs(col(column))))
  def evaluate(m: Metrics, total: Long) =
    m.double(k) match {
      case Some(v) if v > maxAbs =>
        Seq(issue(column, "feature_unscaled", 1, total, Severity.Low,
          expected = s"|x|<=$maxAbs", actual = f"$v%.4f"))
      case _ => Nil
    }
}

/** FeatureNullImpactValidator: null ratio of a feature vs its impact
  * proxy — difference of target mean between null and non-null rows. */
final case class NullImpactCheck(feature: String, target: String,
    maxMeanShiftRatio: Double = 0.1) extends Validator {
  val name = s"null_impact[$feature]"
  val category = "ml_feature"
  private val mNull = MetricKey("target_mean_null", s"$feature/$target")
  private val mNot  = MetricKey("target_mean_notnull", s"$feature/$target")
  def metricExprs(schema: org.apache.spark.sql.types.StructType, stats: Metrics) = Seq(
    mNull -> avg(when(col(feature).isNull, col(target))),
    mNot  -> avg(when(col(feature).isNotNull, col(target))))
  def evaluate(m: Metrics, total: Long) =
    (m.double(mNull), m.double(mNot)) match {
      case (Some(a), Some(b)) if b != 0 &&
          math.abs(a - b) / math.abs(b) > maxMeanShiftRatio =>
        Seq(issue(feature, "null_biased_target", 1, total, Severity.Medium,
          expected = s"shift<=${maxMeanShiftRatio * 100}%",
          actual = f"null=$a%.4f vs $b%.4f"))
      case _ => Nil
    }
}

/** Bucketed-series ops shared by SeasonalDecompositionCheck /
  * TrendBreakCheck (reference `timeseries/seasonality.py:249`,
  * `trend.py:319` — both collect the raw series; those are single-node
  * semantics).
  *
  * Scale contract here: the RAW rows reduce distributed to one point per
  * time bucket (groupBy date_trunc -> avg, shuffle O(buckets)); only the
  * bucketed series — bounded by the time span, not the row count — is
  * collected for the O(n_buckets) decomposition math. 100 TB of events
  * over 3 years of hourly buckets is ~26k points on the driver. */
object SeriesOps {
  /** (bucket_start, avg value) sorted ascending; distributed reduction. */
  def bucketedSeries(df: DataFrame, tsCol: String, valueCol: String,
      bucket: String): Array[Double] =
    df.filter(col(tsCol).isNotNull && col(valueCol).isNotNull)
      .groupBy(date_trunc(bucket, col(tsCol).cast("timestamp")).as("__b"))
      .agg(avg(col(valueCol)).as("__v"))
      .orderBy(col("__b"))
      .select(col("__v")).collect().map(_.getDouble(0))

  /** Additive decomposition value = trend + seasonal + residual, mirroring
    * the reference's centered-moving-average + per-phase means
    * (`seasonality.py:297-334`, incl. its edge fix). */
  def decompose(values: Array[Double], period: Int)
      : (Array[Double], Array[Double], Array[Double]) = {
    val n = values.length
    val trend = new Array[Double](n)
    if (n < period * 2) {
      val m = values.sum / n
      java.util.Arrays.fill(trend, m)
    } else {
      // np.convolve(values, ones(p)/p, mode="same") with zero padding
      val off = (period - 1) / 2
      var i = 0
      while (i < n) {
        val t = i + off
        var s = 0.0
        var j = math.max(0, t - period + 1)
        val jHi = math.min(n - 1, t)
        while (j <= jHi) { s += values(j); j += 1 }
        trend(i) = s / period
        i += 1
      }
      val half = period / 2
      if (half > 0) {
        for (i <- 0 until half) trend(i) = trend(half)
        for (i <- n - half until n) trend(i) = trend(n - half - 1)
      }
    }
    val detrended = values.indices.map(i => values(i) - trend(i)).toArray
    val seasonal = new Array[Double](n)
    for (ph <- 0 until period) {
      val idx = ph.until(n, period)
      if (idx.nonEmpty) {
        val m = idx.map(detrended).sum / idx.size
        idx.foreach(i => seasonal(i) = m)
      }
    }
    val residual = values.indices
      .map(i => values(i) - trend(i) - seasonal(i)).toArray
    (trend, seasonal, residual)
  }

  def variance(xs: Array[Double]): Double = {
    if (xs.length < 2) return 0.0
    val m = xs.sum / xs.length
    xs.map(x => (x - m) * (x - m)).sum / xs.length
  }

  /** Structural breaks: windowed before/after mean change above
    * `minMagnitude`, kept only at local maxima of the change (reference
    * `trend.py:368-418`). Returns break indices in the bucketed series. */
  def detectBreaks(values: Array[Double], window: Int,
      minMagnitude: Double): Seq[Int] = {
    val n = values.length
    if (n < window * 2) return Nil
    def meanOf(lo: Int, hi: Int): Double = {
      var s = 0.0; var i = lo
      while (i < hi) { s += values(i); i += 1 }
      s / (hi - lo)
    }
    def changeAt(i: Int): Double = {
      val b = meanOf(i - window, i)
      if (b == 0) -1.0 else math.abs(meanOf(i, i + window) - b) / math.abs(b)
    }
    (window until n - window).filter { i =>
      val c = changeAt(i)
      c >= minMagnitude && {
        val lo = math.max(window, i - 3)
        val hi = math.min(n - window, i + 4)
        (lo until hi).forall(j => j == i || changeAt(j) <= c)
      }
    }
  }
}

/** SeasonalDecompositionValidator: residual/seasonal variance ratios of the
  * additive decomposition within bounds. */
final case class SeasonalDecompositionCheck(tsCol: String, valueCol: String,
    period: Int, bucket: String = "day", maxResidualRatio: Double = 0.3,
    maxSeasonalRatio: Option[Double] = None)
    extends Validator with DedicatedScan {
  val name = s"seasonal_decomposition[$valueCol]"
  val category = "timeseries"
  def metricExprs(schema: org.apache.spark.sql.types.StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    val series = SeriesOps.bucketedSeries(df, tsCol, valueCol, bucket)
    if (series.length < period * 2) return Nil
    val (_, seasonal, residual) = SeriesOps.decompose(series, period)
    val tot = SeriesOps.variance(series)
    if (tot == 0) return Nil
    val resRatio = SeriesOps.variance(residual) / tot
    val seaRatio = SeriesOps.variance(seasonal) / tot
    (if (resRatio > maxResidualRatio)
      Seq(issue(valueCol, "residual_variance_exceeded", 1, total,
        Severity.Medium, expected = s"<=$maxResidualRatio",
        actual = f"$resRatio%.4f")) else Nil) ++
    (maxSeasonalRatio match {
      case Some(mx) if seaRatio > mx =>
        Seq(issue(valueCol, "seasonal_variance_exceeded", 1, total,
          Severity.Low, expected = s"<=$mx", actual = f"$seaRatio%.4f"))
      case _ => Nil
    })
  }
}

/** TrendBreakValidator: structural level shifts in the bucketed series. */
final case class TrendBreakCheck(tsCol: String, valueCol: String,
    bucket: String = "day", window: Int = 10, minMagnitude: Double = 0.05,
    maxBreaks: Int = 0) extends Validator with DedicatedScan {
  val name = s"trend_break[$valueCol]"
  val category = "timeseries"
  def metricExprs(schema: org.apache.spark.sql.types.StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    val series = SeriesOps.bucketedSeries(df, tsCol, valueCol, bucket)
    val breaks = SeriesOps.detectBreaks(series, window, minMagnitude)
    if (breaks.size > maxBreaks)
      Seq(issue(valueCol, "trend_breaks_detected", breaks.size.toLong, total,
        Severity.Medium, expected = s"<=$maxBreaks breaks",
        actual = breaks.mkString(","))) else Nil
  }
}
