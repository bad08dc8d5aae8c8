package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.validators._
import graft.checkpoint._
import graft.reporters.Reporters

class OrchestrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def df = Seq((1, 200.0), (2, 5.0), (2, 7.0)).toDF("id", "v")

  test("checkpoint runs suite, classifies, routes actions by status") {
    var fired = List.empty[String]
    val cp = Checkpoint("orders-quality", () => df,
      Seq(UniqueCheck(Seq("id")), RangeCheck("v", Some(0), Some(100))),
      actions = Seq(
        ActionRule(CustomAction("on-fail", _ => fired ::= "fail"),
          when = _ == CheckpointStatus.Fail),
        ActionRule(CustomAction("always", _ => fired ::= "always"))))
    val r = cp.run()
    assert(r.status == CheckpointStatus.Fail)
    assert(fired.toSet == Set("fail", "always"))
    assert(r.result.get.issues.nonEmpty)
  }

  test("checkpoint converts exceptions to ERROR and still routes") {
    var fired = false
    val cp = Checkpoint("broken", () => df,
      Seq(RangeCheck("no_such_column", Some(0), Some(1))),
      actions = Seq(ActionRule(CustomAction("e", _ => fired = true),
        when = _ == CheckpointStatus.Error)))
    val r = cp.run()
    assert(r.status == CheckpointStatus.Error)
    assert(r.error.nonEmpty && fired)
  }

  test("reporters render and persist run artifacts") {
    val result = SuiteRunner.run(df, Seq(
      UniqueCheck(Seq("id")), SignCheck("v")))
    val c = Reporters.console(result)
    assert(c.contains("FAILED") && c.contains("duplicate_values"))
    val j = Reporters.json(result)
    assert(j.contains("\"passed\":false") && j.contains("duplicate_values"))
    val md = Reporters.markdown(result)
    assert(md.contains("| ❌ |") || md.contains("❌"))
    val html = Reporters.html(result)
    assert(html.contains("<table>") && html.contains("unique[id]"))
    val ws = java.nio.file.Files.createTempDirectory("workspace").toString
    val dir = Reporters.persistRun(result, ws, "run-1")
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "result.json")))
    assert(java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "report.html")))
  }

  test("multi-table runner: parallel per-table suites + cross checks") {
    import graft.core.MultiTableRunner
    import graft.core.MultiTableRunner.TableSuite
    val orders = Seq((1, 10.0), (2, 20.0)).toDF("oid", "total")
    val items = Seq((1, 5.0), (1, 5.0), (9, 1.0)).toDF("oid", "amt")
    val r = MultiTableRunner.run(
      Seq(TableSuite("orders", orders, Seq(UniqueCheck(Seq("oid")))),
          TableSuite("items", items, Seq(SignCheck("amt")))),
      crossValidators = Seq(ForeignKeyCheck("items", Seq("oid"),
        "orders", Seq("oid"), broadcastParent = true)))
    assert(r.perTable("orders").passed)
    assert(r.perTable("items").passed)
    assert(!r.crossTable.get.passed) // oid 9 orphan
    val seq = MultiTableRunner.run(
      Seq(TableSuite("orders", orders, Seq(UniqueCheck(Seq("oid"))))),
      parallel = false)
    assert(seq.passed)
  }

  test("severity threshold controls pass/fail classification") {
    val cp = Checkpoint("low-sev", () => df,
      Seq(DefaultValueCheck("id", 2, maxRatio = 0.5)), // Low severity issue
      failOn = Severity.High)
    assert(cp.run().status == CheckpointStatus.Pass) // low < high threshold
    val cp2 = cp.copy(failOn = Severity.Low)
    assert(cp2.run().status == CheckpointStatus.Fail)
  }
}
