package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.checkpoint._
import graft.validators.NullCheck

class TriggersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def cp(name: String) = Checkpoint(name,
    () => Seq((1, Some("a")), (2, None)).toDF("id", "v"),
    Seq(NullCheck(Seq("v"))))

  test("schedule trigger: first poll fires, then only after the interval") {
    val t = new ScheduleTrigger(intervalMs = 1000)
    val d0 = t.shouldTrigger(5000)
    assert(d0.shouldRun && d0.nextRunMs.contains(6000))
    t.markRun(5000)
    assert(!t.shouldTrigger(5500).shouldRun)
    assert(t.shouldTrigger(6000).shouldRun)
    t.markRun(6000)
    val waiting = t.shouldTrigger(6100)
    assert(!waiting.shouldRun && waiting.nextRunMs.contains(7000))
  }

  test("schedule trigger respects start/end window and weekdays") {
    val t = new ScheduleTrigger(1000, startMs = Some(10000),
      endMs = Some(20000))
    assert(!t.shouldTrigger(9999).shouldRun)
    assert(t.shouldTrigger(10000).shouldRun)
    assert(!t.shouldTrigger(20001).shouldRun)
    // 1970-01-01 (epoch day 0) was a Thursday = weekday 3
    val wd = new ScheduleTrigger(1000, weekdays = Some(Set(0))) // Mondays only
    val thursday = 12 * 3600 * 1000L
    val dec = wd.shouldTrigger(thursday)
    assert(!dec.shouldRun)
    // next allowed day: Monday = epoch day 4
    assert(dec.nextRunMs.contains(4 * 86400000L))
    assert(wd.shouldTrigger(4 * 86400000L + 60000).shouldRun)
  }

  test("event trigger batches to minEvents and drains") {
    val t = new EventTrigger(minEvents = 2)
    assert(!t.shouldTrigger(0).shouldRun)
    t.fire(Map("k" -> "1"))
    assert(!t.shouldTrigger(0).shouldRun)
    t.fire(Map("k" -> "2"))
    assert(t.shouldTrigger(0).shouldRun)
    assert(t.drain().size == 2)
    assert(!t.shouldTrigger(0).shouldRun)
  }

  test("drained events ride on the run as context; error runs re-queue") {
    val ev = new EventTrigger(minEvents = 1, maxRedelivery = 2)
    ev.fire(Map("path" -> "/data/a.parquet"))
    ev.fire(Map("path" -> "/data/b.parquet"))
    var seen: Option[CheckpointResult] = None
    val ok = cp("ctx").copy(actions = Seq(ActionRule(
      CustomAction("capture", r => seen = Some(r)))))
    val runner = new TriggerRunner(Seq(ev -> ok))
    val rs = runner.pollOnce(0)
    // the checkpoint saw what fired it
    assert(rs.size == 1)
    val ctx = rs.head._2.context
    assert(ctx("trigger_events") == "2")
    assert(ctx("event_0.path") == "/data/a.parquet" &&
      ctx("event_1.path") == "/data/b.parquet")
    assert(seen.exists(_.context == ctx)) // actions read it off the result
    // a FAIL consumed the batch (run succeeded over bad data)
    assert(ev.pendingCount == 0)

    // an ERROR run re-queues the batch for the next poll
    val boom = Checkpoint("boom",
      () => throw new RuntimeException("source down"),
      Seq(NullCheck(Seq("v"))))
    val r2 = new TriggerRunner(Seq(ev -> boom))
    ev.fire(Map("path" -> "/data/c.parquet"))
    assert(r2.pollOnce(1).head._2.status == CheckpointStatus.Error)
    assert(ev.pendingCount == 1) // re-queued, not lost
    // redelivery is bounded: after maxRedelivery failed attempts the
    // event parks in the dead-letter buffer instead of looping forever
    assert(r2.pollOnce(2).head._2.status == CheckpointStatus.Error)
    assert(ev.pendingCount == 1)
    assert(r2.pollOnce(3).head._2.status == CheckpointStatus.Error)
    assert(ev.pendingCount == 0)
    assert(ev.deadLetters.size == 1 &&
      ev.deadLetters.head("path") == "/data/c.parquet")
  }

  test("dead-lettered event raises an alert; hostile event keys are inert") {
    val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val ev = new EventTrigger(minEvents = 1, maxRedelivery = 1,
      name = "e_dl", onDeadLetter = EventTrigger.deadLetterNotifier(
        "e_dl", (subj, body) => sent += (subj -> body)))
    val boom = Checkpoint("boom",
      () => throw new RuntimeException("source down"),
      Seq(NullCheck(Seq("v"))))
    val runner = new TriggerRunner(Seq(ev -> boom))
    // a user event that happens to carry the old bookkeeping key with a
    // non-numeric value used to blow up pollOnce / dead-letter instantly
    ev.fire(Map("path" -> "/x.parquet", "__redelivered" -> "banana"))
    assert(runner.pollOnce(0).head._2.status == CheckpointStatus.Error)
    assert(ev.pendingCount == 1 && ev.deadLetters.isEmpty && sent.isEmpty)
    assert(runner.pollOnce(1).head._2.status == CheckpointStatus.Error)
    // attempts exhausted -> parked AND alerted, user map untouched
    assert(ev.pendingCount == 0)
    assert(ev.deadLetters ==
      Seq(Map("path" -> "/x.parquet", "__redelivered" -> "banana")))
    assert(sent.size == 1)
    assert(sent.head._1.contains("dead-letter on trigger e_dl"))
    assert(sent.head._2.contains("path=/x.parquet"))
    // monitoring consumers drain the buffer
    assert(ev.drainDeadLetters().size == 1 && ev.deadLetters.isEmpty)
  }

  test("file-watch trigger fires on add/change/remove, not on baseline") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw")
    val t = new FileWatchTrigger(dir.toString, "*.csv")
    assert(!t.shouldTrigger(0).shouldRun) // baseline
    val f = dir.resolve("a.csv")
    java.nio.file.Files.writeString(f, "x")
    assert(t.shouldTrigger(1).shouldRun) // added
    t.markRun(1)
    assert(!t.shouldTrigger(2).shouldRun)
    java.nio.file.Files.writeString(f, "longer content")
    assert(t.shouldTrigger(3).shouldRun) // size changed
    t.markRun(3)
    java.nio.file.Files.writeString(dir.resolve("b.txt"), "ignored")
    assert(!t.shouldTrigger(4).shouldRun) // non-matching glob
    java.nio.file.Files.delete(f)
    assert(t.shouldTrigger(5).shouldRun) // removed
  }

  test("file-watch markRun baselines the firing snapshot, not a re-scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_fw2")
    val t = new FileWatchTrigger(dir.toString, "*.csv")
    assert(!t.shouldTrigger(0).shouldRun) // baseline (empty)
    java.nio.file.Files.writeString(dir.resolve("a.csv"), "x")
    assert(t.shouldTrigger(1).shouldRun) // fired on a.csv
    // a file lands BETWEEN the firing decision and markRun — the
    // regression was markRun re-scanning and silently absorbing it
    java.nio.file.Files.writeString(dir.resolve("b.csv"), "y")
    t.markRun(1)
    assert(t.shouldTrigger(2).shouldRun) // must still fire for b.csv
    t.markRun(2)
    assert(!t.shouldTrigger(3).shouldRun)
  }

  test("runner fires due checkpoints deterministically via pollOnce") {
    var results = List.empty[(String, CheckpointStatus)]
    val sched = new ScheduleTrigger(1000, name = "s1")
    val ev = new EventTrigger(name = "e1")
    val runner = new TriggerRunner(
      Seq(sched -> cp("cp_sched"), ev -> cp("cp_event")),
      (n, r) => results ::= (n -> r.status))
    val fired0 = runner.pollOnce(1000) // schedule first-fire, event has none
    assert(fired0.map(_._1) == Seq("s1"))
    assert(runner.pollOnce(1500).isEmpty) // schedule waiting, no events
    ev.fire()
    assert(runner.pollOnce(1600).map(_._1) == Seq("e1"))
    assert(runner.pollOnce(2100).map(_._1) == Seq("s1")) // interval elapsed
    assert(results.size == 3)
    // NullCheck sees the planted null each run -> Fail status routed out
    assert(results.forall(_._2 == CheckpointStatus.Fail))
  }
}
