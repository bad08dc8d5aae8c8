package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.core._
import graft.validators._

/** Regression tests for the round-1 code-review findings. */
class ReviewFixSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("empty tables pass dedicated-scan validators vacuously (no NPE)") {
    val empty = Seq.empty[(Long, Double, java.sql.Timestamp)]
      .toDF("id", "v", "ts")
    val r = SuiteRunner.run(empty, Seq(
      MadOutlierCheck("v"),
      MonotonicCheck("v", orderBy = "ts"),
      EntropyCheck("v", 0, 10),
      TimeGapCheck("ts", Some(1), Some(100)),
      TimeCompletenessCheck("ts"),
      SeasonalityCheck("ts", "v"),
      MahalanobisCheck(Seq("id", "v"), 3.0),
      ValueFrequencyCheck("v", 0.5)))
    assert(r.passed, r.failedChecks.map(c =>
      c.validator + ":" + c.issues.map(_.issueType)).mkString(";"))
    assert(r.rowCount == 0)
  }

  test("early termination skips two-pass validators (no garbage fences)") {
    val df = (1 to 5000).map(_.toDouble + 100).toDF("v") // all positive, healthy
    val r = SuiteRunner.run(df, Seq(
      IqrOutlierCheck("v"), // two-pass: would see empty stats in ET pass
      SignCheck("v")),
      SuiteRunner.Config(earlyTerminationRows = Some(100)))
    assert(!r.executionMode.startsWith("early-terminated"))
    assert(r.passed)
  }

  test("sampling extrapolates regex-style counters and skips distinct ones") {
    val df = (1 to 10000).map(i => if (i % 10 == 0) "bad!" else "ok").toDF("s")
    val r = SuiteRunner.run(df, Seq(RegexCheck("s", "^[a-z]+$")),
      SuiteRunner.Config(sampleFraction = Some(0.2),
        format = ResultFormat.BooleanOnly))
    val est = r.checks.head.issues.head.count
    assert(est > 300 && est < 3000, s"estimate $est (~1000 expected)")
  }

  test("dependency skip is order-independent and visibly marked") {
    def dependent = new Validator {
      val name = "dependent"; val category = "test"
      override def dependencies = Set("column_exists[nope]")
      def metricExprs(s: org.apache.spark.sql.types.StructType, st: Metrics) = Nil
      def evaluate(m: Metrics, t: Long) = Seq(issue("x", "ran_anyway", 1, t))
    }
    val df = Seq(1).toDF("v")
    // dependent listed BEFORE the failing dependency
    val r = SuiteRunner.run(df, Seq(dependent, ColumnExistsCheck(Seq("nope"))))
    val dep = r.checks.find(_.validator == "dependent").get
    assert(dep.passed)
    assert(dep.issues.exists(_.issueType == "skipped_dependency_failed"))
  }

  test("bad validator params fail at construction or in isolation") {
    intercept[IllegalArgumentException] {
      DatePartCoverageCheck("ts", "minute", 60)
    }
    intercept[IllegalArgumentException] { CasingCheck("c", "camel") }
    intercept[IllegalArgumentException] { SeasonalityCheck("ts", "v", "minute") }
  }

  test("languageId detects Chinese from raw text") {
    val df = Seq("我有的是不在和了", "the cat and the dog is here", "xyzzy")
      .toDF("text")
    val got = df.select(graft.pipeline.Text.languageId(col("text"))).collect()
      .map(_.getString(0)).toSeq
    assert(got == Seq("zh", "en", "und"))
  }

  test("constant column drift does not crash (zero-width histogram)") {
    val a = Seq.fill(100)(5.0).toDF("v")
    val b = Seq.fill(100)(5.0).toDF("v")
    val pq = graft.drift.Drift.binnedPq(a, b, "v", 10, 5.0, 5.0)
    assert(graft.drift.Drift.psi(pq) == 0.0)
    assert(graft.drift.Drift.totalVariation(pq) == 0.0)
  }

  test("energy/mmd samples are representative (identical dists ~ 0)") {
    // skewed sizes: bottom-tail sampling would report spurious drift
    val small = (1 to 500).map(i => (i % 100).toDouble).toDF("v")
    val big = (1 to 20000).map(i => (i % 100).toDouble).toDF("v")
    assert(math.abs(graft.drift.Drift.energyDistance(small, big, "v")) < 2.0)
  }

  test("Summary format adds top failing-value frequencies") {
    val df = (Seq.fill(8)("dup") ++ Seq("a", "b")).toDF("v")
    val r = SuiteRunner.run(df, Seq(SetMembershipCheck("v", Seq("a", "b"))),
      SuiteRunner.Config(format = ResultFormat.Summary))
    val sv = r.checks.head.issues.head.sampleValues
    assert(sv.exists(_.contains("values among failing rows:")))
    assert(sv.exists(_.contains("dup x8")))
  }

  test("binned KS approximates exact KS") {
    import graft.drift.Drift
    val a = (1 to 2000).map(i => (i % 100).toDouble).toDF("v")
    val c = (1 to 2000).map(i => (i % 100).toDouble + 30).toDF("v")
    val exact = Drift.ksStatistic(a, c, "v")
    val binned = Drift.ksBinned(a, c, "v", 50, 0, 130)
    assert(math.abs(exact - binned) < 0.05, s"exact $exact binned $binned")
  }

  test("time completeness uses calendar weeks (Wed-Fri is one week)") {
    val df = Seq("2024-01-03 10:00:00", "2024-01-05 10:00:00") // Wed + Fri
      .toDF("s").withColumn("ts", col("s").cast("timestamp"))
    val r = SuiteRunner.run(df, Seq(TimeCompletenessCheck("ts", "week")))
    assert(r.passed, r.issues.mkString(";"))
  }
}
