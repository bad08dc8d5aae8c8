package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.validators._

/** The exact-percentile size gate (SizeGate + the probe stage in
  * SuiteRunner): over-budget columns auto-route to percentile_approx,
  * under-budget columns keep exact semantics bit-for-bit, and the probe
  * costs exactly one extra fused scan shared across probing validators. */
class SizeGateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // 200 distinct values 1..200 plus one extreme outlier
  private def df = ((1 to 200).map(_.toDouble) :+ 10000.0).toDF("v")

  test("under-budget columns keep exact percentile results") {
    val r = SuiteRunner.run(df, Seq(
      QuantileCheck("v", 0.5, lo = 0.0, hi = 10.0), // exact median 101 -> fail
      IqrOutlierCheck("v")))
    val q = r.checks.find(_.validator == "quantile[v,0.5]").get
    assert(q.issues.head.actual.startsWith("101.0"))
    // gate did not trip: no approx annotation
    assert(!q.issues.head.actual.contains("approx"))
    val iqr = r.checks.find(_.validator == "iqr_outlier[v]").get
    assert(iqr.issues.head.count == 1) // the 10000
  }

  test("over-budget columns auto-route to approx and record the switch") {
    val r = SuiteRunner.run(df, Seq(
      QuantileCheck("v", 0.5, lo = 0.0, hi = 10.0, maxExactDistinct = 10),
      IqrOutlierCheck("v", maxExactDistinct = 10),
      MedianBetweenCheck("v", 0.0, 10.0, maxExactDistinct = 10)))
    val q = r.checks.find(_.validator == "quantile[v,0.5]").get
    // t-digest median of 1..200+outlier is ~101 — still out of bounds,
    // and the issue carries the switch annotation
    assert(!q.passed)
    assert(q.issues.head.actual.contains("approx quantile"))
    assert(q.issues.head.actual.contains("> budget 10"))
    val m = r.checks.find(_.validator == "median_between[v]").get
    assert(!m.passed)
    assert(m.issues.head.actual.contains("approx quantile"))
    // IQR fences from approx quantiles still flag the extreme outlier
    val iqr = r.checks.find(_.validator == "iqr_outlier[v]").get
    assert(iqr.issues.head.count == 1)
    assert(iqr.issues.head.actual.contains("approx quantile"))
  }

  test("probe stage costs one fused scan, deduped across validators") {
    // three probing validators on the same column: one probe key total
    val vs: Seq[Validator] = Seq(
      QuantileCheck("v", 0.5, 0.0, 1e9),
      IqrOutlierCheck("v", maxOutlierRatio = 1.0),
      MedianBetweenCheck("v", 0.0, 1e9))
    val probeKeys = vs.flatMap(_.probeExprs(df.schema)).map(_._1).distinct
    assert(probeKeys == Seq(SizeGate.probeKey("v")))
    // passing suite: probe scan + stats scan (IQR) + metric scan = 3
    val r = SuiteRunner.run(df, vs)
    assert(r.passed)
    assert(r.scanCount == 3)
    // no prober in the suite -> no probe scan (unchanged single scan)
    val r2 = SuiteRunner.run(df, Seq(MeanBetweenCheck("v", 0.0, 1e9)))
    assert(r2.scanCount == 1)
  }

  test("median checks with different budgets keep distinct metric keys") {
    // r11 ADVICE: with a shared MetricKey("median", c) the two checks
    // fused to ONE expression, so the second silently read a value
    // computed under the first's gate. The key now encodes the budget.
    val tight = MedianBetweenCheck("v", 0.0, 10.0, maxExactDistinct = 10)
    val loose = MedianBetweenCheck("v", 0.0, 10.0)
    assert(tight.metricExprs(df.schema, Metrics.empty).head._1 !=
      loose.metricExprs(df.schema, Metrics.empty).head._1)
    val r = SuiteRunner.run(df, Seq(tight, loose))
    val Seq(t, l) = r.checks
    // tight budget routed to approx and says so; loose stayed exact
    assert(t.issues.head.actual.contains("approx quantile"))
    assert(l.issues.head.actual.startsWith("101.0"))
    assert(!l.issues.head.actual.contains("approx"))
  }

  test("maxExactDistinct <= 0 disables the gate (always exact, no probe)") {
    val v = QuantileCheck("v", 0.5, 0.0, 10.0, maxExactDistinct = 0)
    assert(v.probeExprs(df.schema).isEmpty)
    val r = SuiteRunner.run(df, Seq(v))
    assert(r.checks.head.issues.head.actual.startsWith("101.0"))
    // exact=false likewise probes nothing — straight to approx
    assert(QuantileCheck("v", 0.5, 0.0, 10.0, exact = false)
      .probeExprs(df.schema).isEmpty)
  }

  test("MadOutlierCheck's inline gate keeps flagging under approx routing") {
    val d = ((1 to 100).map(_.toDouble) :+ 10000.0).toDF("v")
    val exact = SuiteRunner.run(d, Seq(MadOutlierCheck("v")))
    val gated = SuiteRunner.run(d, Seq(MadOutlierCheck("v", maxExactDistinct = 1)))
    // both flag the planted outlier (non-degenerate MAD fixture)
    assert(exact.checks.head.issues.head.count == 1)
    assert(gated.checks.head.issues.head.count == 1)
  }

  test("statDrift median is gated per frame, exact under budget") {
    import graft.drift.Drift
    val cur = (1 to 101).map(_.toDouble).toDF("v")     // median 51
    val ref = (1 to 101).map(_ * 2.0).toDF("v")        // median 102
    val exact = Drift.statDrift(cur, ref, "v", "median")
    assert(math.abs(exact - (102.0 - 51.0) / 102.0) < 1e-12)
    // tiny budget forces percentile_approx on both frames; relative
    // drift of the t-digest medians stays within a rank of exact
    val gated = Drift.statDrift(cur, ref, "v", "median",
      maxExactDistinct = 5)
    assert(math.abs(gated - exact) < 0.05, s"gated=$gated exact=$exact")
    // mean/variance paths are unaffected by the gate parameter
    assert(Drift.statDrift(cur, ref, "v", "mean", maxExactDistinct = 5) ==
      Drift.statDrift(cur, ref, "v", "mean"))
  }

  test("gatedPct query helper matches exact form under budget") {
    import graft.ops.Exprs._
    val pct = gatedPct(df, "v")
    val r = df.agg(pct("v", 0.25), pct("v", 0.75)).head()
    assert(r.getDouble(0) == 51.0 && r.getDouble(1) == 151.0)
    val approx = gatedPct(df, "v", budget = 5)
    val a = df.agg(approx("v", 0.5)).head()
    // t-digest on this fixture is within one rank of the exact median
    assert(math.abs(a.getDouble(0) - 101.0) <= 2.0)
  }
}
