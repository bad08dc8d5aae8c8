package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.monitoring._
import org.apache.spark.sql.functions._

class MonitoringSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def series(vals: Seq[Double], name: String = "s1",
      metric: String = "m") =
    vals.zipWithIndex.map { case (v, i) =>
      (name, metric, i.toLong, v) }.toDF("series", "metric", "ts", "value")

  test("threshold rule fires on crossing points only") {
    val df = series(Seq(1.0, 5.0, 2.0, 9.0))
    val alerts = RuleEngine(Seq(
      ThresholdRule("hi", "m", threshold = 4.0, comparison = "gt")))
      .evaluate(df).collect()
    assert(alerts.map(_.getAs[Long]("ts")).sorted.toSeq == Seq(1L, 3L))
    assert(alerts.forall(_.getAs[String]("ruleType") == "threshold"))
  }

  test("threshold comparisons lt/gte/lte/eq") {
    val df = series(Seq(1.0, 2.0, 3.0))
    def fired(cmp: String, t: Double) =
      RuleEngine(Seq(ThresholdRule("r", "m", t, cmp)))
        .evaluate(df).count()
    assert(fired("lt", 2.0) == 1)   // 1.0
    assert(fired("gte", 2.0) == 2)  // 2,3
    assert(fired("lte", 2.0) == 2)  // 1,2
    assert(fired("eq", 3.0) == 1)
  }

  test("anomaly rule needs minHistory and fires on the spike") {
    // noisy-but-stable points then a spike: spike z huge, noise z < 2
    val df = series(Seq(1.0, 1.2, 0.8, 1.1, 0.9, 1.0, 1.2, 0.8, 1.1, 0.9,
      1.0, 1.2, 0.8, 1.1, 50.0))
    val alerts = RuleEngine(Seq(
      AnomalyRule("spike", "m", zThreshold = 3.0, windowSize = 100)))
      .evaluate(df).collect()
    assert(alerts.length == 1 && alerts.head.getAs[Long]("ts") == 14L)
  }

  test("anomaly rule silent below minHistory and on constant series") {
    val few = series(Seq(1.0, 99.0, 1.0)) // < 10 points
    assert(RuleEngine(Seq(AnomalyRule("a", "m"))).evaluate(few).count() == 0)
    val const = series(Seq.fill(20)(7.0))
    assert(RuleEngine(Seq(AnomalyRule("a", "m"))).evaluate(const)
      .count() == 0)
  }

  test("trend rule detects increase over full window, halves split") {
    // window 6: halves of 3; first half mean 10, second 20 => +100%
    val df = series(Seq(10.0, 10, 10, 20, 20, 20))
    val up = RuleEngine(Seq(TrendRule("up", "m", "increasing",
      windowSize = 6, minChangePercent = 50))).evaluate(df).collect()
    assert(up.length == 1 && up.head.getAs[Long]("ts") == 5L)
    val down = RuleEngine(Seq(TrendRule("dn", "m", "decreasing",
      windowSize = 6, minChangePercent = 50))).evaluate(df)
    assert(down.count() == 0)
    // incomplete window never fires
    val short = series(Seq(10.0, 20, 40))
    assert(RuleEngine(Seq(TrendRule("up", "m", "increasing", 6, 10)))
      .evaluate(short).count() == 0)
  }

  test("rules are metric-scoped and series are independent") {
    val a = series(Seq(1.0, 9.0), "s1", "m1")
    val b = series(Seq(1.0, 9.0), "s1", "m2")
    val c = series(Seq(1.0, 1.0), "s2", "m1")
    val alerts = RuleEngine(Seq(
      ThresholdRule("r", "m1", 5.0))).evaluate(a.unionAll(b).unionAll(c))
      .collect()
    assert(alerts.length == 1 &&
      alerts.head.getAs[String]("series") == "s1" &&
      alerts.head.getAs[String]("metric") == "m1")
  }

  test("evaluateLatest keeps only each series' newest point") {
    val df = series(Seq(9.0, 9.0, 1.0)) // fires at ts 0,1 but latest is 2
    val eng = RuleEngine(Seq(ThresholdRule("r", "m", 5.0)))
    assert(eng.evaluate(df).count() == 2)
    assert(eng.evaluateLatest(df).count() == 0)
    val df2 = series(Seq(1.0, 9.0))
    assert(eng.evaluateLatest(df2).count() == 1)
  }

  test("page-hinkley fires on a sustained mean shift, not on noise") {
    // 30 stable points then a level shift: PH accumulates (value - mean)
    // and must cross lambda a few points into the shifted regime
    val stable = Seq.tabulate(30)(i => 10.0 + (i % 2) * 0.2)
    val shifted = Seq.fill(15)(25.0)
    val eng = RuleEngine(Seq(PageHinkleyRule("ph", "m",
      delta = 0.1, lambda = 30.0, minPoints = 20)))
    val alerts = eng.evaluate(series(stable ++ shifted)).collect()
    assert(alerts.nonEmpty)
    assert(alerts.map(_.getAs[Long]("ts")).min >= 30L) // only after shift
    assert(alerts.forall(_.getAs[String]("ruleType") == "page_hinkley"))
    // pure noise never fires
    assert(eng.evaluate(series(stable ++ stable.map(_ + 0.1))).count() == 0)
  }

  test("page-hinkley decreasing direction catches downward shifts") {
    val s = Seq.fill(30)(50.0) ++ Seq.fill(15)(20.0)
    val down = RuleEngine(Seq(PageHinkleyRule("phd", "m",
      delta = 0.1, lambda = 30.0, minPoints = 20,
      direction = "decreasing")))
    assert(down.evaluate(series(s)).count() > 0)
    val up = RuleEngine(Seq(PageHinkleyRule("phu", "m",
      delta = 0.1, lambda = 30.0, minPoints = 20)))
    assert(up.evaluate(series(s)).count() == 0)
  }

  test("page-hinkley composes with simple rules in one pass") {
    val s = Seq.fill(30)(10.0) ++ Seq.fill(10)(30.0)
    val eng = RuleEngine(Seq(
      PageHinkleyRule("ph", "m", delta = 0.1, lambda = 20.0, minPoints = 20),
      ThresholdRule("thr", "m", 25.0)))
    val byType = eng.evaluate(series(s)).groupBy("ruleType").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byType.contains("page_hinkley") && byType("threshold") == 10)
  }

  test("ddm fires on error-rate degradation with drift escalation") {
    // steady ~10% error rate for 40 points, then sustained 40%
    val s = Seq.tabulate(40)(i => if (i % 10 == 5) 1.0 else 0.0) ++
      Seq.fill(20)(0.4)
    val eng = RuleEngine(Seq(DdmRule("ddm", "m", minPoints = 20)))
    val alerts = eng.evaluate(series(s)).collect()
    assert(alerts.nonEmpty)
    assert(alerts.map(_.getAs[Long]("ts")).min >= 40L)
    assert(alerts.exists(_.getAs[String]("severity") == "critical"))
    assert(alerts.forall(_.getAs[String]("ruleType") == "ddm"))
    // stable error rate never fires
    val flat = Seq.tabulate(60)(i => if (i % 10 == 5) 1.0 else 0.0)
    assert(eng.evaluate(series(flat)).count() == 0)
  }

  test("ddm is silent on a constant-zero (healthy) series, fires on a jump") {
    val eng = RuleEngine(Seq(DdmRule("ddm", "m", minPoints = 20)))
    // zero-variance healthy default: p=s=pmin=smin=0 — the strict
    // inequality keeps it silent instead of critical-on-every-point
    assert(eng.evaluate(series(Seq.fill(60)(0.0))).count() == 0)
    assert(eng.evaluate(series(Seq.fill(60)(1.0))).count() == 0)
    // an error jump after a clean history still fires (s becomes > 0)
    val jump = Seq.fill(40)(0.0) ++ Seq.fill(20)(0.5)
    val alerts = eng.evaluate(series(jump)).collect()
    assert(alerts.nonEmpty && alerts.map(_.getAs[Long]("ts")).min >= 40L)
  }

  test("history adapter yields a point for PASSING runs too (ratio 0)") {
    val hist = Seq(
      ("r1", "null[v]", 1000L, 100L, Seq(5L)),
      ("r2", "null[v]", 2000L, 200L, Seq.empty[Long]),  // passing run
      ("r1", "range[x]", 1000L, 100L, Seq(2L, 1L)))
      .toDF("runId", "validator", "runTs", "rowCount", "counts")
      .withColumn("issues",
        expr("transform(counts, c -> named_struct('count', c))"))
    val s = MetricSeries.fromHistory(hist).collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Long]("ts"),
        r.getAs[Double]("value"))).toSet
    assert(s == Set(("null[v]", 1000L, 0.05), ("null[v]", 2000L, 0.0),
      ("range[x]", 1000L, 0.03)))
  }

  test("sequential rules are deterministic when points share a ts") {
    // ts-only window ordering gave tied rows arbitrary relative order,
    // flipping PH/DDM trajectories between executions of the same call
    val pts = (1 to 40).flatMap(i =>
      Seq(("s", "m", i.toLong, 0.0), ("s", "m", i.toLong, 0.1))) ++
      (41 to 60).flatMap(i =>
        Seq(("s", "m", i.toLong, 0.8), ("s", "m", i.toLong, 0.9)))
    val df = pts.toDF("series", "metric", "ts", "value")
    val eng = RuleEngine(Seq(
      PageHinkleyRule("ph", "m", lambda = 5.0, minPoints = 10),
      DdmRule("ddm", "m", minPoints = 10)))
    val runs = (1 to 3).map(_ => eng.evaluate(df)
      .collect().map(r => (r.getAs[Long]("ts"), r.getAs[Double]("value"),
        r.getAs[String]("rule"), r.getAs[String]("severity"))).toSet)
    assert(runs.forall(_ == runs.head))
    assert(runs.head.nonEmpty) // the level shift actually fires
  }

  test("history adapter keeps runs sharing a runTs as separate points") {
    // two runs with the same runTs used to collapse into one point with
    // violations summed across both but divided by ONE run's rowCount,
    // inflating the ratio fed to DDM/Page-Hinkley
    val hist = Seq(
      ("rA", "null[v]", 1000L, 100L, Seq(5L)),
      ("rB", "null[v]", 1000L, 100L, Seq(5L)))
      .toDF("runId", "validator", "runTs", "rowCount", "counts")
      .withColumn("issues",
        expr("transform(counts, c -> named_struct('count', c))"))
    val s = MetricSeries.fromHistory(hist).collect()
      .map(r => r.getAs[Double]("value")).toSeq
    assert(s == Seq(0.05, 0.05)) // not one 0.10 point
  }

  test("issue-history adapter yields per-validator ratio series") {
    val issues = Seq(
      ("r1", 1000L, "null[v]", 100L, 5L),
      ("r1", 1000L, "range[x]", 100L, 2L),
      ("r2", 2000L, "null[v]", 200L, 40L))
      .toDF("runId", "runTs", "validator", "totalCount", "violations")
    val s = MetricSeries.fromIssueHistory(issues).collect()
      .map(r => (r.getAs[String]("series"), r.getAs[Long]("ts"),
        r.getAs[Double]("value"))).toSet
    assert(s == Set(("null[v]", 1000L, 0.05), ("range[x]", 1000L, 0.02),
      ("null[v]", 2000L, 0.2)))
  }

  test("metric series adapter stacks trend metrics; dispatch routes alerts") {
    val trend = Seq(("r1", 100L, 50L, 0L, 3L), ("r2", 200L, 50L, 1L, 9L))
      .toDF("runId", "runTs", "rowCount", "failedChecks", "violations")
    val s = MetricSeries.fromTrend(trend, "orders")
    assert(s.count() == 6)
    val alerts = RuleEngine(Seq(
      ThresholdRule("viol", "violations", 5.0, severity = "critical")))
      .evaluate(s)
    val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val n = Monitoring.dispatch(alerts, (s0, b) => sent += ((s0, b)))
    assert(n == 1 && sent.head._1.contains("critical") &&
      sent.head._1.contains("orders/violations"))
  }
}
