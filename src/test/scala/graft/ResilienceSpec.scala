package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.validators._

class ResilienceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** A validator whose aggregate throws at runtime (ANSI cast error). */
  private case class PoisonCheck() extends Validator {
    val name = "poison"; val category = "test"
    private val k = MetricKey("poison", "x")
    def metricExprs(s: org.apache.spark.sql.types.StructType, st: Metrics) =
      Seq(k -> sum(expr("cast(bad_str AS INT)"))) // throws under ANSI
    def evaluate(m: Metrics, total: Long) =
      if (m.contains(k)) Nil
      else Seq(issue("x", "should_have_failed_exec", 1, total))
  }

  test("tier fallback: one poisoned expression does not sink the suite") {
    val df = Seq((1, "abc"), (2, "def"), (2, "ghi"))
      .toDF("id", "bad_str")
    val r = SuiteRunner.run(df, Seq(
      PoisonCheck(),
      UniqueCheck(Seq("id")),
      NullCheck(Seq("bad_str"))))
    assert(r.executionMode.contains("tier2"))
    val byName = r.checks.map(c => c.validator -> c).toMap
    // poison marked as execution error, not silently passed
    assert(!byName("poison").passed)
    assert(byName("poison").issues.head.issueType == "execution_error")
    // the others still produced real results
    assert(!byName("unique[id]").passed)
    assert(byName("unique[id]").issues.head.count == 1)
    assert(byName("null[bad_str]").passed)
  }

  test("sampling mode extrapolates violation counts") {
    val df = (1 to 10000).map(i => i % 100).toDF("v") // 1% of rows are 0
    val r = SuiteRunner.run(df, Seq(SignCheck("v")), // v<=0 violations: 100
      SuiteRunner.Config(sampleFraction = Some(0.2), format = ResultFormat.BooleanOnly))
    assert(r.executionMode.startsWith("sampled"))
    val est = r.checks.head.issues.head.count
    assert(est > 30 && est < 300, s"estimate $est") // ~100 expected
    assert(math.abs(r.rowCount - 10000) < 3000)
  }

  test("early termination fires on catastrophically bad data") {
    val df = (1 to 100000).map(i => -i).toDF("v") // 100% negative
    val r = SuiteRunner.run(df, Seq(SignCheck("v")),
      SuiteRunner.Config(earlyTerminationRows = Some(1000),
        earlyTerminationFailRate = 0.5))
    assert(r.executionMode.startsWith("early-terminated"))
    assert(r.scanCount == 1) // never scanned the full table
    assert(!r.passed)
  }

  test("early termination does NOT fire on clean data") {
    val df = (1 to 5000).map(i => i).toDF("v")
    val r = SuiteRunner.run(df, Seq(SignCheck("v")),
      SuiteRunner.Config(earlyTerminationRows = Some(100)))
    assert(!r.executionMode.startsWith("early-terminated"))
    assert(r.rowCount == 5000)
    assert(r.passed)
  }

  test("observe: validation rides the caller's action with zero extra scans") {
    val df = Seq((1, 10.0), (2, -5.0), (2, 7.0)).toDF("id", "v")
    // DISTINCT aggregates are rejected with a clear message
    val e = intercept[IllegalArgumentException] {
      SuiteRunner.attach(df, Seq(UniqueCheck(Seq("id"))))
    }
    assert(e.getMessage.contains("ApproxDistinctCheck"))
    val (instrumented, result) = SuiteRunner.attach(df,
      Seq(ApproxDistinctCheck("id", min = 3, max = 100), SignCheck("v")))
    // the caller's own action (e.g. a write) drives the metrics
    val written = instrumented.filter(lit(true)).count()
    assert(written == 3)
    val r = result()
    assert(r.executionMode == "observed" && r.scanCount == 0)
    val byName = r.checks.map(c => c.validator -> c).toMap
    assert(!byName("approx_distinct[id]").passed) // only 2 distinct < min 3
    assert(!byName("positive[v]").passed)
    assert(byName("positive[v]").issues.head.count == 1)
  }

  test("parallel dedicated scans produce the same results") {
    val df = (1 to 1000).map(i => (i % 7, i.toDouble)).toDF("k", "v")
    def run(par: Boolean) = SuiteRunner.run(df, Seq(
      EntropyCheck("k", 0.0, 100.0),
      ValueFrequencyCheck("k", 0.05),
      MostCommonValueCheck("k", Set("0"))),
      SuiteRunner.Config(parallelDedicated = par))
    val a = run(true).checks.map(c => c.validator -> c.passed)
    val b = run(false).checks.map(c => c.validator -> c.passed)
    assert(a == b)
  }
}
