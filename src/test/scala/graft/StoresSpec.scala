package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.validators._
import graft.stores.{ResultStore, SuiteStore}

class StoresSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def runOnce(name: String, nulls: Int): ValidationRunResult = {
    val df = (1 to 10).map(i =>
      (i, if (i <= nulls) None else Some(s"v$i"))).toDF("id", "v")
    SuiteRunner.run(df, Seq(NullCheck(Seq("v"))),
      SuiteRunner.Config(datasetName = name))
  }

  test("result store round-trips runs and serves history per dataset") {
    val ws = java.nio.file.Files.createTempDirectory("graft_rs").toString
    val store = ResultStore(ws)
    store.save(spark, runOnce("a", 2), "run1", 1000L)
    store.save(spark, runOnce("a", 5), "run2", 2000L)
    store.save(spark, runOnce("b", 0), "run3", 3000L)

    assert(store.history(spark, "a").count() == 2)
    assert(store.history(spark, "b").count() == 1)
    assert(store.latestRunId(spark, "a").contains("run2"))
    assert(store.exists(spark, "run1"))
    assert(!store.exists(spark, "nope"))

    val trend = store.metricTrend(spark, "a").collect()
    assert(trend.map(_.getAs[String]("runId")).toSeq == Seq("run1", "run2"))
    assert(trend.map(_.getAs[Long]("violations")).toSeq == Seq(2L, 5L))

    val issues = store.issueHistory(spark, "a")
      .filter($"runId" === "run2").collect()
    assert(issues.length == 1 && issues.head.getAs[Long]("violations") == 5L)
  }

  test("result store delete removes exactly the named run") {
    val ws = java.nio.file.Files.createTempDirectory("graft_rs2").toString
    val store = ResultStore(ws)
    store.save(spark, runOnce("a", 1), "r1", 1000L)
    store.save(spark, runOnce("a", 2), "r2", 2000L)
    assert(store.delete(spark, "r1"))
    assert(!store.delete(spark, "r1")) // already gone
    assert(!store.exists(spark, "r1"))
    assert(store.exists(spark, "r2"))
    assert(store.history(spark, "a").count() == 1)
  }

  test("deleting the last run leaves a readable (empty) store") {
    val ws = java.nio.file.Files.createTempDirectory("graft_rs3").toString
    val store = ResultStore(ws)
    store.save(spark, runOnce("a", 1), "only", 1000L)
    assert(store.delete(spark, "only"))
    // the regression: an empty partitioned parquet dir used to poison
    // every later read with 'unable to infer schema'
    assert(store.runs(spark).count() == 0)
    assert(store.history(spark, "a").count() == 0)
    assert(store.latestRunId(spark, "a").isEmpty)
    assert(!store.isInitialized(spark))
    // and the store accepts new runs afterwards
    store.save(spark, runOnce("a", 2), "next", 2000L)
    assert(store.latestRunId(spark, "a").contains("next"))
  }

  test("delete/prune rewrite only the affected dataset partition") {
    val ws = java.nio.file.Files.createTempDirectory("graft_rs5").toString
    val store = ResultStore(ws)
    store.save(spark, runOnce("a", 1), "ra1", 1000L)
    store.save(spark, runOnce("a", 2), "ra2", 2000L)
    store.save(spark, runOnce("b", 3), "rb1", 3000L)
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    def snapshot(ds: String) = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$ws/store/results/dataset=$ds"))
      .filter(_.isFile)
      .map(f => (f.getPath.toString, f.getLen, f.getModificationTime))
      .toSet
    val bBefore = snapshot("b")
    assert(store.delete(spark, "ra1"))
    // dataset B's files are byte-for-byte untouched (same paths, sizes,
    // mtimes) — the rewrite was scoped to dataset A's partition dir
    assert(snapshot("b") == bBefore)
    assert(!store.exists(spark, "ra1") && store.exists(spark, "ra2") &&
      store.exists(spark, "rb1"))
    // prune that only victimizes dataset A also leaves B untouched
    store.save(spark, runOnce("a", 4), "ra3", 4000L)
    val bBefore2 = snapshot("b")
    assert(store.prune(spark, keepLastRuns = Some(1)) == 1)
    assert(snapshot("b") == bBefore2)
    assert(store.history(spark, "a").select("runId").distinct().count() == 1)
    assert(store.history(spark, "b").count() == 1)
  }

  test("delete handles dataset names needing partition-path escaping") {
    val ws = java.nio.file.Files.createTempDirectory("graft_rs6").toString
    val store = ResultStore(ws)
    store.save(spark, runOnce("my:ds/x", 1), "r1", 1000L)
    store.save(spark, runOnce("my:ds/x", 2), "r2", 2000L)
    assert(store.delete(spark, "r1"))
    assert(!store.exists(spark, "r1") && store.exists(spark, "r2"))
    assert(store.history(spark, "my:ds/x").count() == 1)
  }

  test("never-written store reads as empty with the store schema") {
    val ws = java.nio.file.Files.createTempDirectory("graft_rs4").toString
    val store = ResultStore(ws)
    assert(!store.isInitialized(spark))
    assert(store.runs(spark).count() == 0)
    assert(store.runs(spark).columns.contains("validator"))
    assert(store.metricTrend(spark, "a").count() == 0)
    assert(store.latestRunId(spark, "a").isEmpty)
  }

  test("data-docs site renders an index from the run-history store") {
    val ws = java.nio.file.Files.createTempDirectory("graft_dd").toString
    val store = ResultStore(ws)
    store.save(spark, runOnce("orders", 0), "r_pass", 1000L)
    store.save(spark, runOnce("orders", 3), "r_fail", 2000L)
    graft.reporters.Reporters.persistRun(runOnce("orders", 3), ws, "r_fail")
    val idx = graft.reporters.Reporters.dataDocsSite(spark, store, ws,
      profilePages = Map("orders" -> "profile_orders.html"))
    val html = java.nio.file.Files.readString(java.nio.file.Paths.get(idx))
    assert(html.contains("r_pass") && html.contains("r_fail"))
    assert(html.contains("PASS") && html.contains("FAIL"))
    assert(html.contains("../runs/r_fail/report.html"))
    assert(html.contains("profile_orders.html"))
    // linked per-run page exists -> two-page browsable site
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(ws, "runs", "r_fail", "report.html")))
    // empty store degrades to an empty index, not an exception
    val emptyIdx = graft.reporters.Reporters.dataDocsSite(spark,
      ResultStore(ws + "_empty"), ws + "_empty")
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(emptyIdx)).contains("0 dataset(s)"))
  }

  test("suite store versions and round-trips executable specs") {
    val ws = java.nio.file.Files.createTempDirectory("graft_ss").toString
    val ss = SuiteStore(ws)
    assert(ss.get("s") == None)
    assert(ss.save("s", "null:v;unique:id", 1000L) == 1)
    assert(ss.save("s", "null:v;unique:id;range:age:0:120", 2000L) == 2)
    assert(ss.versions("s") == Seq(1, 2))
    assert(ss.get("s").contains("null:v;unique:id;range:age:0:120"))
    assert(ss.get("s", Some(1)).contains("null:v;unique:id"))
    assert(ss.list() == Seq("s"))
    // the stored spec is directly executable
    val vs = Cli.parseChecks(ss.get("s").get)
    assert(vs.size == 3)
    val df = Seq((1, Some("x"), 30), (1, None, 500)).toDF("id", "v", "age")
    val res = SuiteRunner.run(df, vs)
    assert(!res.passed)
    assert(ss.delete("s") && ss.get("s") == None)
  }
}
