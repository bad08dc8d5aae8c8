package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.profiler.{ColumnBaseline, RuleLearning, TableBaseline}
import graft.validators.NullCheck

class RuleLearningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def colB(name: String, dtype: String = "double",
      nullRatio: Double = 0.0, uniqueRatio: Double = 0.5,
      min: Option[String] = None, max: Option[String] = None,
      allowed: Option[Seq[String]] = None) =
    ColumnBaseline(name, dtype, nullable = true,
      nullCount = (nullRatio * 100).toLong, distinctCount = 50,
      nullRatio = nullRatio, uniqueRatio = uniqueRatio, min = min, max = max,
      mean = None, std = None, q25 = None, q50 = None, q75 = None,
      minLength = None, maxLength = None, allowedValues = allowed)

  test("stable bounds across profiles become range/null/unique/inset rules") {
    val history = Seq(0, 1, 2).map { i =>
      TableBaseline(100 + i, Seq(
        colB("amount", min = Some((10.0 + i * 0.01).toString),
          max = Some((99.0 + i * 0.01).toString)),
        colB("id", uniqueRatio = 1.0, min = Some("1"), max = Some("100")),
        colB("status", dtype = "string",
          allowed = Some(Seq("A", "B") ++ (if (i == 2) Seq("C") else Nil))),
        colB("wobbly", min = Some((i * 500.0).toString),
          max = Some("1000"))))
    }
    val rules = RuleLearning.fromBaselines(history)
    val byKey = rules.map(r => (r.column, r.check) -> r).toMap
    assert(byKey.contains(("amount", "range")))
    val range = byKey(("amount", "range"))
    assert(range.confidence == 1.0 && range.support == 3)
    assert(range.params("min").toDouble < 10.0)
    assert(range.params("max").toDouble > 99.01)
    assert(byKey.contains(("amount", "null"))) // zero nulls everywhere
    assert(byKey.contains(("id", "unique")))
    // status value set is closed over history (last profile superset)
    assert(byKey(("status", "inset")).params("values") == "A|B|C")
    // wobbly min moved 0->1000 across runs: NOT stable, no range rule
    assert(!byKey.contains(("wobbly", "range")))
    // learned rules materialize and run
    val vs = RuleLearning.build(rules)
    val df = Seq((5.0, 1, "A", 1.0)).toDF("amount", "id", "status", "wobbly")
    val res = SuiteRunner.run(df, vs)
    // amount=5.0 is below the learned envelope -> range violation
    assert(res.checks.exists(c => c.validator.startsWith("range[amount]")
      && !c.passed))
  }

  test("too little history learns nothing") {
    val one = Seq(TableBaseline(10, Seq(colB("x", min = Some("0"),
      max = Some("1")))))
    assert(RuleLearning.fromBaselines(one).isEmpty)
  }

  test("history store results classify validators by pass stability") {
    val ws = java.nio.file.Files.createTempDirectory("graft_rl").toString
    val store = graft.stores.ResultStore(ws)
    // 4 runs: null check passes all; a second check fails 3 of 4
    (1 to 4).foreach { i =>
      val df = Seq((1, Some("a"), if (i == 1) 10 else 500))
        .toDF("id", "v", "amount")
      val r = SuiteRunner.run(df, Seq(
        NullCheck(Seq("v")),
        graft.validators.RangeCheck("amount", Some(0), Some(100))),
        SuiteRunner.Config(datasetName = "rl"))
      store.save(spark, r, s"run$i", i * 1000L)
    }
    val findings = RuleLearning.fromHistory(spark, store, "rl")
    val byV = findings.map(f => f.validator -> f).toMap
    assert(byV("null[v]").kind == "confirmed")
    val range = byV("range[amount]")
    assert(range.kind == "threshold_review" && range.passRate == 0.25)
  }
}
