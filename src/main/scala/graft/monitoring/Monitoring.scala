package graft.monitoring

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Metric monitoring with alert rules (reference: truthound
  * `ml/monitoring/monitor.py` ModelMonitor/MonitoringPipeline,
  * `ml/monitoring/alerting/rules.py:96,206,307` Threshold/Anomaly/Trend
  * rules + RuleEngine, `ml/monitoring/alerting/handlers.py`).
  *
  * Spark-first shape: the reference evaluates rules one metric-point at a
  * time against per-model in-memory history lists. Here a rule engine is a
  * single window-function pass over a metric-series DataFrame
  * `(series, metric, ts, value)` — the trailing-window mean/std/halves the
  * reference keeps as driver state become `avg/stddev/count OVER
  * (PARTITION BY series, metric ORDER BY ts ROWS BETWEEN ...)`. One
  * shuffle by series key evaluates millions of independent series in
  * parallel and is stateless across calls, which is the shape that
  * survives a 1000-executor fleet emitting metrics; alerts come back as an
  * ordinary DataFrame to join, store, or route to notification actions.
  *
  * Series sources: `ResultStore.metricTrend` / `issueHistory` (run
  * history), or any ad-hoc aggregation (e.g. rows-per-day of a fact
  * table). `MetricSeries.fromTrend` adapts the store's trend frame.
  */
sealed trait AlertRule {
  def name: String
  /** Metric this rule watches (matches the `metric` column). */
  def metric: String
  def severity: String
}

/** Reference ThresholdRule (`rules.py:96-203`): fire when value crosses a
  * fixed threshold. `comparison` ∈ gt, lt, gte, lte, eq. */
final case class ThresholdRule(name: String, metric: String,
    threshold: Double, comparison: String = "gt",
    severity: String = "warning") extends AlertRule

/** Reference AnomalyRule (`rules.py:206-305`): fire when the value's
  * z-score against the trailing `windowSize` points (inclusive,
  * population variance, at least `minHistory` points — reference
  * hard-codes 10) exceeds `zThreshold`. A zero-variance window never
  * fires (the value equals the window mean). */
final case class AnomalyRule(name: String, metric: String,
    zThreshold: Double = 3.0, windowSize: Int = 100, minHistory: Int = 10,
    severity: String = "warning") extends AlertRule

/** Reference TrendRule (`rules.py:307-422`): over the last `windowSize`
  * points split into halves (first floor(w/2), rest), fire when the
  * second-half mean moved >= `minChangePercent`% from the first-half mean
  * in the configured direction. Needs the full window. */
final case class TrendRule(name: String, metric: String,
    trend: String = "increasing", windowSize: Int = 10,
    minChangePercent: Double = 10.0,
    severity: String = "warning") extends AlertRule

/** Page-Hinkley sequential change detection (the reference names the
  * method in `ml/drift_detection/concept.py:41` ConceptDriftConfig;
  * classic formulation: cumulate deviations from the running mean,
  * alert when the cumulation rises `lambda` above its running minimum).
  * `delta` is the drift insensitivity margin; `direction` picks
  * upward/downward mean shifts. Expressed as three chained window
  * layers — running mean, cumulative deviation, running minimum — all
  * per (series, metric) partitions. */
final case class PageHinkleyRule(name: String, metric: String,
    delta: Double = 0.005, lambda: Double = 50.0, minPoints: Int = 30,
    direction: String = "increasing",
    severity: String = "warning") extends AlertRule

/** DDM — Drift Detection Method (Gama et al. 2004; named alongside
  * page_hinkley in reference `concept.py:41`). The series is an error
  * RATE in [0,1] (e.g. failed-check ratio per run): with p_t the
  * cumulative mean and s_t = sqrt(p_t(1-p_t)/t), DDM tracks the point
  * where p+s was minimal and fires `warning` at p_t+s_t > pmin+2·smin,
  * `drift` at > pmin+3·smin — STRICTLY above, so a zero-variance series
  * (constant 0.0 error rate, the healthy-pipeline default where
  * p=s=pmin=smin=0) never fires, mirroring AnomalyRule's zero-variance
  * behavior; a genuine error jump still fires because s_t > 0 the moment
  * any error appears. Expressed with a min_by window (the (p,s) pair AT
  * the historical minimum, not the componentwise mins). */
final case class DdmRule(name: String, metric: String,
    warnSigmas: Double = 2.0, driftSigmas: Double = 3.0,
    minPoints: Int = 30, severity: String = "warning") extends AlertRule

object MetricSeries {
  /** Adapt `ResultStore.metricTrend` output to the engine's series shape:
    * one input row fans out to one row per tracked metric. */
  def fromTrend(trend: DataFrame, dataset: String): DataFrame = {
    val metricCols = Seq("rowCount", "failedChecks", "violations")
    val stacked = metricCols.map(m =>
      trend.select(lit(dataset).as("series"), lit(m).as("metric"),
        col("runTs").as("ts"), col(m).cast("double").as("value")))
    stacked.reduce(_ unionAll _)
  }

  /** Adapt `ResultStore.history` (CHECK grain, one row per check per run)
    * to per-validator violation-ratio series: series = the validator
    * name, metric = "violation_ratio", one point per run INCLUDING
    * passing runs (ratio 0) — built on the check grain rather than
    * `issueHistory` (issue grain, which only contains failing runs and
    * would bias DDM/Page-Hinkley upward by hiding recoveries). The
    * natural input for DdmRule (error rates in [0,1]) — "has THIS
    * check's failure rate drifted over runs?". Aggregated at
    * (validator, runId) grain — two runs that happen to share a runTs
    * stay separate points instead of collapsing into one inflated
    * ratio (summed violations over a single run's rowCount). */
  def fromHistory(history: DataFrame): DataFrame =
    history.groupBy(col("validator"), col("runId"))
      .agg(max(col("runTs")).as("runTs"),
        (coalesce(sum(expr(
          "aggregate(issues, 0L, (acc, i) -> acc + i.count)")), lit(0L))
          .cast("double") /
        greatest(max(col("rowCount")).cast("double"), lit(1.0)))
        .as("value"))
      .select(col("validator").as("series"),
        lit("violation_ratio").as("metric"), col("runTs").as("ts"),
        col("value"))

  /** Adapt an already-exploded issue frame (`ResultStore.issueHistory`
    * shape) to the same series. CAVEAT: the issue grain only carries
    * failing runs, so the series never observes recoveries — prefer
    * [[fromHistory]] for drift rules; this form suits ad-hoc frames
    * that already track every run at the issue grain. Same
    * (validator, runId) grain as [[fromHistory]]. */
  def fromIssueHistory(issues: DataFrame): DataFrame =
    issues.groupBy(col("validator"), col("runId"))
      .agg(max(col("runTs")).as("runTs"),
        (sum(col("violations")).cast("double") /
        greatest(max(col("totalCount")).cast("double"), lit(1.0)))
        .as("value"))
      .select(col("validator").as("series"),
        lit("violation_ratio").as("metric"), col("runTs").as("ts"),
        col("value"))
}

/** Evaluates every rule in one window pass (reference RuleEngine
  * `rules.py:425-505`, evaluated per point; here set-at-once). */
final case class RuleEngine(rules: Seq[AlertRule]) {

  /** `series` must have columns (series: string, metric: string,
    * ts: long/numeric, value: double). Returns alerts:
    * (series, metric, ts, value, rule, ruleType, severity, detail) —
    * one row per (point, rule) that fired. */
  def evaluate(series: DataFrame): DataFrame = {
    require(rules.nonEmpty, "RuleEngine needs at least one rule")
    // secondary sort on value: two runs may legitimately share a ts
    // (fromHistory keeps them as separate points), and ts-only ordering
    // would make the sequential statistics' intermediate trajectories
    // nondeterministic between executions; equal (ts, value) rows are
    // interchangeable, so this order is total where it matters
    val bySeries = Window.partitionBy(col("series"), col("metric"))
      .orderBy(col("ts"), col("value"))
    val cum = bySeries.rowsBetween(Window.unboundedPreceding,
      Window.currentRow)
    // Page-Hinkley needs nested window results (running mean feeds the
    // cumulative deviation, whose running min feeds the statistic) —
    // Spark forbids window-in-window expressions, so PH rules get three
    // chained projection layers before the shared fired-rules pass.
    val phRules = rules.zipWithIndex.collect {
      case (p: PageHinkleyRule, i) => (p, i) }
    val withPh0 = phRules.foldLeft(series) { case (f, (p, i)) =>
      val dev0 = col("value") - avg(col("value")).over(cum)
      val dev = (if (p.direction == "decreasing") -dev0 else dev0) - p.delta
      f.withColumn(s"__phdev$i", when(col("metric") === p.metric, dev))
    }
    val withPh1 = phRules.foldLeft(withPh0) { case (f, (_, i)) =>
      f.withColumn(s"__phm$i", sum(col(s"__phdev$i")).over(cum))
    }
    val withPh = phRules.foldLeft(withPh1) { case (f, (_, i)) =>
      f.withColumn(s"__ph$i",
        col(s"__phm$i") - min(col(s"__phm$i")).over(cum))
    }
    // DDM layers: cumulative error rate p and its binomial std s, then
    // the (p, s) pair AT the historical minimum of p+s via min_by.
    val ddmRules = rules.zipWithIndex.collect {
      case (d: DdmRule, i) => (d, i) }
    val withDdm0 = ddmRules.foldLeft(withPh) { case (f, (d, i)) =>
      f.withColumn(s"__ddmp$i",
          when(col("metric") === d.metric, avg(col("value")).over(cum)))
        .withColumn(s"__ddmn$i", count(col("value")).over(cum))
    }
    val withDdm1 = ddmRules.foldLeft(withDdm0) { case (f, (_, i)) =>
      f.withColumn(s"__ddms$i", sqrt(
        greatest(col(s"__ddmp$i") * (lit(1.0) - col(s"__ddmp$i")), lit(0.0))
          / col(s"__ddmn$i")))
    }
    val prepared = ddmRules.foldLeft(withDdm1) { case (f, (d, i)) =>
      // the historical minimum only considers points past the warm-up
      // (classic DDM: the cold-start prefix has degenerate p=s=0 minima
      // that would make every later point a "drift")
      f.withColumn(s"__ddmmin$i",
        min_by(struct(col(s"__ddmp$i").as("p"), col(s"__ddms$i").as("s")),
          when(col(s"__ddmn$i") >= d.minPoints,
            col(s"__ddmp$i") + col(s"__ddms$i"))
            .otherwise(lit(Double.MaxValue))).over(cum))
    }
    val fired: Seq[Column] = rules.zipWithIndex.map {
      case (DdmRule(n, m, warnK, driftK, minPts, sev), i) =>
        val p = col(s"__ddmp$i"); val s = col(s"__ddms$i")
        val pmin = col(s"__ddmmin$i").getField("p")
        val smin = col(s"__ddmmin$i").getField("s")
        val level = p + s
        val isDrift = level > pmin + smin * driftK
        val isWarn = level > pmin + smin * warnK
        when(col("metric") === m && col(s"__ddmn$i") >= minPts && isWarn,
          struct(lit(n).as("rule"), lit("ddm").as("ruleType"),
            when(isDrift, lit("critical")).otherwise(lit(sev))
              .as("severity"),
            concat(when(isDrift, lit("drift")).otherwise(lit("warning")),
              lit(" p="), round(p, 4), lit(" p_min+s_min="),
              round(pmin + smin, 4)).as("detail")))
      case (PageHinkleyRule(n, m, _, lam, minPts, _, sev), i) =>
        val npts = count(col("value")).over(cum)
        when(col("metric") === m && npts >= minPts &&
            col(s"__ph$i") > lam,
          struct(lit(n).as("rule"), lit("page_hinkley").as("ruleType"),
            lit(sev).as("severity"),
            concat(lit("ph="), round(col(s"__ph$i"), 2),
              lit(s" lambda=$lam")).as("detail")))
      case (r, _) => firedSimple(r, bySeries)
    }
    // Evaluate all rules in the same projection (shared window frames are
    // computed once by Spark's window-exec), explode the fired structs.
    prepared
      .withColumn("__fired", array(fired: _*))
      .select(col("series"), col("metric"), col("ts"), col("value"),
        explode(col("__fired")).as("a"))
      .filter(col("a").isNotNull)
      .select(col("series"), col("metric"), col("ts"), col("value"),
        col("a.rule").as("rule"), col("a.ruleType").as("ruleType"),
        col("a.severity").as("severity"), col("a.detail").as("detail"))
  }

  private def firedSimple(rule: AlertRule,
      bySeries: org.apache.spark.sql.expressions.WindowSpec): Column =
    rule match {
      case ThresholdRule(n, m, t, cmp, sev) =>
        val hit = cmp match {
          case "gt"  => col("value") > t
          case "lt"  => col("value") < t
          case "gte" => col("value") >= t
          case "lte" => col("value") <= t
          case "eq"  => col("value") === t
          case other => throw new IllegalArgumentException(
            s"ThresholdRule comparison '$other' (want gt|lt|gte|lte|eq)")
        }
        when(col("metric") === m && hit,
          struct(lit(n).as("rule"), lit("threshold").as("ruleType"),
            lit(sev).as("severity"),
            concat(lit(s"value "), col("value"),
              lit(s" $cmp threshold $t")).as("detail")))
      case AnomalyRule(n, m, z, w, minH, sev) =>
        val win = bySeries.rowsBetween(-(w - 1), Window.currentRow)
        val mean = avg(col("value")).over(win)
        val sd = stddev_pop(col("value")).over(win)
        val npts = count(col("value")).over(win)
        // reference: std := 1.0 when variance == 0 (then z = |v-mean| = 0)
        val zScore = abs(col("value") - mean) /
          when(sd > 0, sd).otherwise(lit(1.0))
        when(col("metric") === m && npts >= minH && zScore > z,
          struct(lit(n).as("rule"), lit("anomaly").as("ruleType"),
            lit(sev).as("severity"),
            concat(lit("z="), round(zScore, 2), lit(" mean="),
              round(mean, 4)).as("detail")))
      case TrendRule(n, m, dir, w, minPct, sev) =>
        val h1 = w / 2         // first floor(w/2) points of the window
        val h2 = w - h1        // remaining points, ending at current row
        val firstHalf = avg(col("value"))
          .over(bySeries.rowsBetween(-(w - 1), -h2))
        val secondHalf = avg(col("value"))
          .over(bySeries.rowsBetween(-(h2 - 1), Window.currentRow))
        val full = count(col("value"))
          .over(bySeries.rowsBetween(-(w - 1), Window.currentRow))
        val pct = (secondHalf - firstHalf) / abs(firstHalf) * 100
        val hit = dir match {
          case "increasing" => pct >= minPct
          case "decreasing" => pct <= -minPct
          case other => throw new IllegalArgumentException(
            s"TrendRule trend '$other' (want increasing|decreasing)")
        }
        when(col("metric") === m && full === w && firstHalf =!= 0 && hit,
          struct(lit(n).as("rule"), lit("trend").as("ruleType"),
            lit(sev).as("severity"),
            concat(lit("change="), round(pct, 2), lit("% "),
              round(firstHalf, 4), lit(" -> "),
              round(secondHalf, 4)).as("detail")))
      case r @ (_: PageHinkleyRule | _: DdmRule) =>
        throw new IllegalStateException(
          s"${r.name} must go through the prepared-layer path")
    }

  /** Latest-point alerts only (the reference engine's per-new-point shape):
    * evaluate the whole series, keep each series' newest ts. */
  def evaluateLatest(series: DataFrame): DataFrame = {
    val latest = series.groupBy(col("series").as("s2"), col("metric").as("m2"))
      .agg(max(col("ts")).as("t2"))
    evaluate(series).join(latest,
      col("series") === col("s2") && col("metric") === col("m2") &&
        col("ts") === col("t2"))
      .drop("s2", "m2", "t2")
  }
}

object Monitoring {
  /** Route alerts to a notification transport (reference
    * `alerting/handlers.py` → our checkpoint Notify payloads). Bounded
    * driver collect: top `maxAlerts` by severity/ts. Returns the number
    * of alerts sent. */
  def dispatch(alerts: DataFrame,
      send: (String, String) => Unit, maxAlerts: Int = 100): Int = {
    val sevRank = when(col("severity") === "critical", 0)
      .when(col("severity") === "error", 1)
      .when(col("severity") === "warning", 2).otherwise(3)
    val top = alerts.orderBy(sevRank, col("ts").desc).limit(maxAlerts)
      .collect()
    top.foreach { r =>
      val subject = s"[graft:${r.getAs[String]("severity")}] " +
        s"${r.getAs[String]("rule")} on ${r.getAs[String]("series")}/" +
        r.getAs[String]("metric")
      send(subject, r.getAs[String]("detail"))
    }
    top.length
  }
}
