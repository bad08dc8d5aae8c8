package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.stores.{Incremental, ResultStore}
import graft.validators._
import org.apache.spark.sql.functions._

class IncrementalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def data(upTo: Int) =
    (1 to upTo).map(i => (i.toLong, if (i % 5 == 0) null else s"v$i"))
      .toDF("seq", "v")

  test("first run validates everything; second only the delta") {
    val ws = java.nio.file.Files.createTempDirectory("graft_inc").toString
    val store = ResultStore(ws)
    val checks = Seq(NullCheck(Seq("v")))

    val r1 = Incremental.run(spark, store, data(10), col("seq"), checks,
      "t", "run1", 1000L)
    assert(r1.fromWatermark.isEmpty && r1.toWatermark.contains(10L))
    assert(r1.deltaRows == 10)
    assert(r1.result.issues.map(_.count).sum == 2) // rows 5, 10

    val r2 = Incremental.run(spark, store, data(25), col("seq"), checks,
      "t", "run2", 2000L)
    assert(r2.fromWatermark.contains(10L) && r2.toWatermark.contains(25L))
    assert(r2.deltaRows == 15)
    assert(r2.result.issues.map(_.count).sum == 3) // rows 15, 20, 25

    // empty delta: run recorded, watermark held
    val r3 = Incremental.run(spark, store, data(25), col("seq"), checks,
      "t", "run3", 3000L)
    assert(r3.deltaRows == 0 && r3.toWatermark.contains(25L))
    assert(store.history(spark, "t").select("runId").distinct().count() == 3)
  }

  test("watermark state is per dataset") {
    val ws = java.nio.file.Files.createTempDirectory("graft_inc2").toString
    val store = ResultStore(ws)
    Incremental.run(spark, store, data(10), col("seq"), Seq(NullCheck(Seq("v"))),
      "a", "r1", 1000L)
    assert(Incremental.lastWatermark(spark, store, "a").contains(10L))
    assert(Incremental.lastWatermark(spark, store, "b").isEmpty)
  }

  test("advanceOnFailure=false re-scans a failed delta on the next run") {
    val ws = java.nio.file.Files.createTempDirectory("graft_inc3").toString
    val store = ResultStore(ws)
    val checks = Seq(NullCheck(Seq("v")))
    // first slice passes (no nulls in rows 1-4), mark advances
    val r1 = Incremental.run(spark, store, data(4), col("seq"), checks,
      "t", "run1", 1000L, advanceOnFailure = false)
    assert(r1.result.passed && r1.toWatermark.contains(4L))
    // rows 5-10 contain nulls -> failure -> mark stays at 4
    val r2 = Incremental.run(spark, store, data(10), col("seq"), checks,
      "t", "run2", 2000L, advanceOnFailure = false)
    assert(!r2.result.passed && r2.toWatermark.contains(4L))
    // next run re-scans the same failed slice (rows 5-10 again)
    val r3 = Incremental.run(spark, store, data(10), col("seq"), checks,
      "t", "run3", 3000L, advanceOnFailure = false)
    assert(r3.fromWatermark.contains(4L) && r3.deltaRows == 6)
    // default contract: mark advances despite failure
    val r4 = Incremental.run(spark, store, data(10), col("seq"), checks,
      "t", "run4", 4000L)
    assert(!r4.result.passed && r4.toWatermark.contains(10L))
  }

  test("prune keepLastRuns trims oldest runs per dataset") {
    val ws = java.nio.file.Files.createTempDirectory("graft_pr").toString
    val store = ResultStore(ws)
    def save(id: String, ts: Long, ds: String) = {
      val r = SuiteRunner.run(data(10), Seq(NullCheck(Seq("v"))),
        SuiteRunner.Config(datasetName = ds))
      store.save(spark, r, id, ts)
    }
    (1 to 5).foreach(i => save(s"r$i", i * 1000L, "a"))
    save("rb", 500L, "b")
    val removed = store.prune(spark, keepLastRuns = Some(2))
    assert(removed == 3)
    val left = store.history(spark, "a").select("runId").distinct()
      .as[String].collect().toSet
    assert(left == Set("r4", "r5"))
    assert(store.history(spark, "b").select("runId").distinct().count() == 1)
  }

  test("diffRuns classifies new failures, fixes, and added checks") {
    val ws = java.nio.file.Files.createTempDirectory("graft_diff").toString
    val store = ResultStore(ws)
    def run(checks: Seq[Validator]) = SuiteRunner.run(data(10), checks,
      SuiteRunner.Config(datasetName = "t"))
    // run A: null check fails (2 nulls), range passes
    store.save(spark, run(Seq(NullCheck(Seq("v")),
      RangeCheck("seq", Some(0), Some(100)))), "a", 1000L)
    // run B: null fixed (checked on seq: 0 nulls), range now fails,
    // plus a new unique check
    store.save(spark, run(Seq(NullCheck(Seq("seq")),
      RangeCheck("seq", Some(0), Some(5)), UniqueCheck(Seq("seq")))),
      "b", 2000L)
    val d = store.diffRuns(spark, "a", "b").collect()
      .map(r => r.getAs[String]("validator") -> r.getAs[String]("change"))
      .toMap
    assert(d.exists(_._2 == "new_failure")) // range tightened
    assert(d(s"unique[seq]") == "added" ||
      d.keys.exists(k => k.contains("unique") && d(k) == "added"))
    // null check names differ per column -> one removed, one added
    assert(d.values.count(_ == "removed") == 1)
  }

  test("prune maxAge drops old runs; pruning everything empties the store") {
    val ws = java.nio.file.Files.createTempDirectory("graft_pr2").toString
    val store = ResultStore(ws)
    val r = SuiteRunner.run(data(5), Seq(NullCheck(Seq("v"))),
      SuiteRunner.Config(datasetName = "a"))
    store.save(spark, r, "old", 1000L)
    store.save(spark, r, "new", 9000L)
    assert(store.prune(spark, maxAgeMs = Some(5000L), nowTs = 10000L) == 1)
    assert(store.latestRunId(spark, "a").contains("new"))
    assert(store.prune(spark, maxAgeMs = Some(1L), nowTs = 100000L) == 1)
    assert(store.runs(spark).isEmpty)
    // store still writable after full prune
    store.save(spark, r, "again", 20000L)
    assert(store.history(spark, "a").count() > 0)
  }
}
