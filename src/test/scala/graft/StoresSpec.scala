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

  test("delete finds its victim via the run index, never scanning others") {
    val ws = java.nio.file.Files.createTempDirectory("graft_rs7").toString
    val store = ResultStore(ws)
    store.save(spark, runOnce("a", 1), "ra1", 1000L)
    store.save(spark, runOnce("a", 2), "ra2", 2000L)
    store.save(spark, runOnce("b", 3), "rb1", 3000L)
    // Corrupt dataset B's parquet files: if delete() touched B in ANY way
    // (victim lookup or rewrite) the read would throw. The runId→dataset
    // sidecar index must route the whole delete to partition A alone.
    val bDir = java.nio.file.Paths.get(ws, "store", "results", "dataset=b")
    java.nio.file.Files.list(bDir).forEach { p =>
      if (p.getFileName.toString.endsWith(".parquet"))
        java.nio.file.Files.writeString(p, "garbage, not parquet")
    }
    // a WRONG hint deletes nothing and must leave the index intact —
    // the next (unhinted) delete still routes via the index, proven by
    // B staying corrupt and unread
    assert(!store.delete(spark, "ra1", datasetHint = Some("zzz")))
    assert(store.delete(spark, "ra1"))
    // verify with a partition-scoped read (history() infers schema over
    // the whole store root, which may legitimately touch any footer)
    def runsInA = spark.read.parquet(s"$ws/store/results/dataset=a")
      .select("runId").distinct().collect().map(_.getString(0)).toSet
    assert(runsInA == Set("ra2"))
    // double delete also stays scoped when hinted (the index entry is
    // gone; an unhinted retry would fall back to the full scan)
    assert(!store.delete(spark, "ra1", datasetHint = Some("a")))
    // dataset hint routes a fresh delete without consulting anything else
    assert(store.delete(spark, "ra2", datasetHint = Some("a")))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(ws, "store", "results", "dataset=a")))
  }

  test("delete removes a runId saved under several datasets via the index") {
    val ws = java.nio.file.Files.createTempDirectory("graft_rs10").toString
    val store = ResultStore(ws)
    store.save(spark, runOnce("a", 1), "shared", 1000L)
    store.save(spark, runOnce("b", 2), "shared", 1000L)
    store.save(spark, runOnce("c", 3), "solo", 2000L)
    assert(store.delete(spark, "shared")) // index holds TWO ds markers
    assert(store.history(spark, "a").count() == 0)
    assert(store.history(spark, "b").count() == 0)
    assert(store.history(spark, "c").count() == 1)
    assert(!store.delete(spark, "shared"))
  }

  test("delete falls back to a full scan when the index is absent") {
    val ws = java.nio.file.Files.createTempDirectory("graft_rs8").toString
    val store = ResultStore(ws)
    store.save(spark, runOnce("a", 1), "r1", 1000L)
    store.save(spark, runOnce("b", 2), "r2", 2000L)
    // wipe the sidecar (simulates a store written by an older version)
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(s"$ws/store/.runindex"), true)
    assert(store.delete(spark, "r1"))
    assert(!store.exists(spark, "r1") && store.exists(spark, "r2"))
    // a wrong hint deletes nothing and reports false
    assert(!store.delete(spark, "r2", datasetHint = Some("a")))
    assert(store.exists(spark, "r2"))
  }

  test("rewrite restores a retired partition left by a crashed swap") {
    val ws = java.nio.file.Files.createTempDirectory("graft_rs9").toString
    val store = ResultStore(ws)
    store.save(spark, runOnce("a", 1), "ra1", 1000L)
    store.save(spark, runOnce("b", 2), "rb1", 2000L)
    // simulate a crash between the two renames of dataset B's swap:
    // live dir gone, full copy sitting in .results_retired
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$ws/store/results/dataset=b")
    val retired = new org.apache.hadoop.fs.Path(
      s"$ws/store/.results_retired/dataset=b")
    fs.mkdirs(retired.getParent)
    assert(fs.rename(live, retired))
    assert(!fs.exists(live))
    // the next rewrite (here: a delete in dataset A) restores B instead
    // of discarding the only surviving copy
    assert(store.delete(spark, "ra1"))
    assert(store.exists(spark, "rb1"))
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

  test("cli store commands: history, delete (with hint), prune, diff") {
    val ws = java.nio.file.Files.createTempDirectory("graft_cli").toString
    val store = ResultStore(ws)
    store.save(spark, runOnce("a", 1), "r1", 1000L)
    store.save(spark, runOnce("a", 3), "r2", 2000L)
    store.save(spark, runOnce("a", 3), "r3", 3000L)
    assert(Cli.dispatch(spark, List("history", ws, "a")) == 0)
    assert(Cli.dispatch(spark, List("diff", ws, "r1", "r2")) == 1) // still_failing
    assert(Cli.dispatch(spark, List("delete", ws, "r3")) == 0)
    assert(Cli.dispatch(spark, List("delete", ws, "r3")) == 2) // gone
    assert(Cli.dispatch(spark,
      List("delete", ws, "r2", "--dataset", "nope")) == 2) // wrong hint
    assert(store.exists(spark, "r2"))
    assert(Cli.dispatch(spark,
      List("delete", ws, "r2", "--dataset", "a")) == 0)
    assert(Cli.dispatch(spark, List("prune", ws, "--keep", "0")) == 0)
    assert(store.runs(spark).count() == 0)
  }

  test("cli suite commands: save, list, show, check --suite") {
    val ws = java.nio.file.Files.createTempDirectory("graft_cli2").toString
    val data = java.nio.file.Files.createTempDirectory("graft_cli2d")
      .resolve("t.parquet").toString
    Seq((1, Some("x"), 30), (2, None, 500)).toDF("id", "v", "age")
      .write.parquet(data)
    assert(Cli.dispatch(spark,
      List("suite-save", ws, "s1", "--checks", "null:v;range:age:0:120")) == 0)
    assert(Cli.dispatch(spark,
      List("suite-save", ws, "s1", "--checks", "null:v")) == 0) // v2
    assert(Cli.dispatch(spark, List("suite-save", ws, "s1")) == 2) // no spec
    assert(Cli.dispatch(spark, List("suite-list", ws)) == 0)
    assert(Cli.dispatch(spark, List("suite-show", ws, "s1")) == 0)
    assert(Cli.dispatch(spark, List("suite-show", ws, "nope")) == 2)
    // stored suite drives a real check run: v1 fails (null + range), and
    // a pinned --suite-version proves version routing
    assert(Cli.dispatch(spark, List("check", data, "--suite", "s1",
      "--workspace", ws, "--suite-version", "1")) == 1)
    assert(Cli.dispatch(spark,
      List("check", data, "--suite", "s1", "--workspace", ws)) == 1)
    intercept[IllegalArgumentException] {
      Cli.dispatch(spark,
        List("check", data, "--suite", "ghost", "--workspace", ws))
    }
    // conflicting flags error out instead of silently shadowing
    intercept[IllegalArgumentException] {
      Cli.dispatch(spark, List("check", data, "--suite", "s1",
        "--workspace", ws, "--checks", "null:v"))
    }
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

  test("suite store rejects path-escaping names") {
    val ws = java.nio.file.Files.createTempDirectory("graft_ss3").toString
    val ss = SuiteStore(ws)
    for (bad <- Seq("../evil", "a/b", "..", ".", ""))
      intercept[IllegalArgumentException] { ss.save(bad, "null:v", 1L) }
    // backslash is a plain character on POSIX — names a pre-guard store
    // wrote stay readable and deletable
    assert(ss.save("legacy\\name", "null:v", 1L) == 1)
    assert(ss.get("legacy\\name").contains("null:v"))
    assert(ss.list().contains("legacy\\name"))
    assert(ss.delete("legacy\\name"))
    intercept[IllegalArgumentException] {
      Cli.dispatch(spark, List("suite-save", ws, "../evil",
        "--checks", "null:v"))
    }
    // nothing escaped the store
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(ws).getParent.resolve("evil")))
  }

  test("suite store survives specs containing JSON-looking text") {
    val ws = java.nio.file.Files.createTempDirectory("graft_ss2").toString
    val ss = SuiteStore(ws)
    // a spec embedding the literal text "spec": plus escapes would
    // silently mis-extract under regex parsing; Jackson must not
    val spec = """regex:v:^"spec":"x\\y";null:c"""
    val name = "we\"ird name"
    assert(ss.save(name, spec, 1000L) == 1)
    assert(ss.get(name).contains(spec))
    // multi-line + control chars round-trip too
    val spec2 = "null:a\nrange:b:0:9\tend"
    ss.save(name, spec2, 2000L)
    assert(ss.get(name).contains(spec2))
    assert(ss.get(name, Some(1)).contains(spec))
  }
}
