package graft.checkpoint

/** Checkpoint trigger layer (reference: truthound
  * `checkpoint/triggers/base.py` BaseTrigger/TriggerResult,
  * `triggers/schedule.py:23-178` ScheduleTrigger,
  * `triggers/event.py:46-380` EventTrigger + FileWatchTrigger).
  *
  * Design: triggers are pure decision objects — `shouldTrigger(nowMs)`
  * answers "run now?" with a reason and the next due time; a tiny runner
  * loop (`TriggerRunner`) polls them and calls `Checkpoint.run()`. The
  * clock is an explicit argument, so tests advance time deterministically
  * (no sleeping, no wall-clock coupling) and the decision logic is
  * identical under a real scheduler thread.
  */
final case class TriggerDecision(shouldRun: Boolean, reason: String,
    nextRunMs: Option[Long] = None)

trait Trigger {
  def name: String
  /** Pure decision — does NOT record a run. */
  def shouldTrigger(nowMs: Long): TriggerDecision
  /** Record that the checkpoint ran (triggers keyed on last-run state). */
  def markRun(nowMs: Long): Unit = ()
}

/** Interval schedule with optional start/end window and weekday
  * restriction (reference ScheduleTrigger). First poll inside the window
  * fires immediately, then every `intervalMs` after the last run. */
final class ScheduleTrigger(
    val intervalMs: Long,
    startMs: Option[Long] = None,
    endMs: Option[Long] = None,
    weekdays: Option[Set[Int]] = None, // 0=Mon .. 6=Sun, UTC
    val name: String = "schedule") extends Trigger {
  require(intervalMs > 0, "interval must be positive")
  @volatile private var lastRunMs: Option[Long] = None

  private def weekdayUtc(nowMs: Long): Int = {
    // 1970-01-01 was a Thursday = weekday 3 in Mon=0 indexing
    val days = Math.floorDiv(nowMs, 86400000L)
    ((days + 3) % 7 + 7).toInt % 7
  }

  def shouldTrigger(nowMs: Long): TriggerDecision = {
    if (startMs.exists(nowMs < _))
      return TriggerDecision(false, "before start time", startMs)
    if (endMs.exists(nowMs > _))
      return TriggerDecision(false, "after end time", None)
    weekdays.foreach { wd =>
      if (!wd.contains(weekdayUtc(nowMs))) {
        // next midnight that lands on an allowed weekday
        var next = (Math.floorDiv(nowMs, 86400000L) + 1) * 86400000L
        while (!wd.contains(weekdayUtc(next))) next += 86400000L
        return TriggerDecision(false,
          s"weekday ${weekdayUtc(nowMs)} not allowed", Some(next))
      }
    }
    lastRunMs match {
      case None => TriggerDecision(true, "first scheduled run",
        Some(nowMs + intervalMs))
      case Some(last) if nowMs - last >= intervalMs =>
        TriggerDecision(true, s"interval elapsed (${nowMs - last} ms)",
          Some(nowMs + intervalMs))
      case Some(last) =>
        TriggerDecision(false, "waiting for interval",
          Some(last + intervalMs))
    }
  }

  override def markRun(nowMs: Long): Unit = { lastRunMs = Some(nowMs) }
}

/** Externally-fired event trigger (reference EventTrigger): callers queue
  * events (`fire`), the poll drains them — `minEvents` batches low-rate
  * streams, `maxBatch` bounds a burst. Drained batches are handed to the
  * checkpoint as run context; a batch whose run ERRORS is re-queued for
  * the next poll (bounded by `maxRedelivery` attempts, then parked in
  * the dead-letter buffer) so no event is silently dropped. */
final class EventTrigger(minEvents: Int = 1, maxBatch: Int = 100,
    maxRedelivery: Int = 3, val name: String = "event",
    onDeadLetter: (Map[String, String], Int) => Unit = (_, _) => ())
    extends Trigger {
  import EventTrigger.Envelope
  // redelivery state rides OUT-OF-BAND in the envelope, never inside the
  // user's event map — a user event carrying its own "__redelivered" key
  // (or any other name) can neither corrupt the counter nor leak
  // bookkeeping into run context / dead-letter payloads
  private val pending =
    new java.util.concurrent.ConcurrentLinkedQueue[Envelope]()
  private val dead =
    new java.util.concurrent.ConcurrentLinkedQueue[Envelope]()

  def fire(event: Map[String, String] = Map.empty): Unit =
    pending.add(Envelope(event, 0))
  def pendingCount: Int = pending.size()

  def shouldTrigger(nowMs: Long): TriggerDecision =
    if (pending.size() >= minEvents)
      TriggerDecision(true, s"${pending.size()} pending event(s)")
    else TriggerDecision(false,
      s"${pending.size()}/$minEvents events pending")

  /** Drain up to maxBatch pending envelopes (the runner calls this when
    * it fires the checkpoint; the envelope form keeps attempt counts for
    * a potential requeue). */
  private[checkpoint] def drainBatch(): Seq[Envelope] = {
    val b = Seq.newBuilder[Envelope]
    var n = 0
    while (n < maxBatch && !pending.isEmpty) {
      val e = pending.poll(); if (e != null) { b += e; n += 1 }
    }
    b.result()
  }

  /** Drain up to maxBatch pending events. */
  def drain(): Seq[Map[String, String]] = drainBatch().map(_.event)

  /** Return a drained batch whose checkpoint run ERRORED: each event goes
    * back on the queue with its attempt count bumped, or — past
    * `maxRedelivery` attempts — into the dead-letter buffer (a failing
    * checkpoint must not grow the queue forever). Parking an event fires
    * `onDeadLetter(event, attempts)` so operators hear about the loss the
    * moment it happens instead of discovering a silent buffer later. */
  private[checkpoint] def requeue(batch: Seq[Envelope]): Unit =
    batch.foreach { env =>
      if (env.attempts >= maxRedelivery) {
        dead.add(env)
        try onDeadLetter(env.event, env.attempts)
        catch { case scala.util.control.NonFatal(_) => () }
      } else pending.add(env.copy(attempts = env.attempts + 1))
    }

  /** Events that exhausted their redelivery budget — a monitoring hook. */
  def deadLetters: Seq[Map[String, String]] = {
    val it = dead.iterator()
    val b = Seq.newBuilder[Map[String, String]]
    while (it.hasNext) b += it.next().event
    b.result()
  }

  /** Drain the dead-letter buffer (monitoring pipelines poll this and
    * convert the batch to metric points / notifications; a drained
    * letter is the consumer's responsibility). */
  def drainDeadLetters(): Seq[Map[String, String]] = {
    val b = Seq.newBuilder[Map[String, String]]
    while (!dead.isEmpty) {
      val e = dead.poll(); if (e != null) b += e.event
    }
    b.result()
  }
}

object EventTrigger {
  /** One queued event plus its out-of-band delivery-attempt count. */
  private[checkpoint] final case class Envelope(
      event: Map[String, String], attempts: Int)

  /** Adapter for `onDeadLetter`: route parked events to any
    * (subject, body) sender — the same shape `Monitoring.dispatch`
    * feeds and every Notify transport accepts — so losing an event
    * raises an operator alert instead of filling a silent buffer. */
  def deadLetterNotifier(triggerName: String,
      send: (String, String) => Unit): (Map[String, String], Int) => Unit =
    (event, attempts) => send(
      s"[graft:critical] dead-letter on trigger $triggerName",
      s"event exhausted $attempts redelivery attempt(s): " +
        event.map { case (k, v) => s"$k=$v" }.toSeq.sorted.mkString(", "))

  /** Flatten an event batch into the checkpoint's run context:
    * `trigger_events` = batch size, plus `event_<i>.<key>` per entry. */
  def context(events: Seq[Map[String, String]]): Map[String, String] =
    Map("trigger_events" -> events.size.toString) ++
      events.zipWithIndex.flatMap { case (e, i) =>
        e.map { case (k, v) => s"event_$i.$k" -> v }
      }
}

/** File-watch trigger (reference FileWatchTrigger): fires when files under
  * `dir` matching `glob` appear, disappear, or change (size, mtime). State
  * is one (size, mtime) pair per matched file — a directory listing per
  * poll, no content hashing on the hot path. */
final class FileWatchTrigger(dir: String, glob: String = "*",
    val name: String = "file_watch") extends Trigger {
  import java.nio.file.{Files, FileSystems, Paths}
  @volatile private var seen: Map[String, (Long, Long)] = Map.empty
  @volatile private var primed = false
  // Snapshot from the shouldTrigger call that fired, reused by markRun: a
  // re-scan there would silently absorb files that changed between the two
  // calls into the baseline without ever triggering on them.
  @volatile private var lastScan: Option[Map[String, (Long, Long)]] = None
  private val matcher = FileSystems.getDefault.getPathMatcher(s"glob:$glob")

  private def scan(): Map[String, (Long, Long)] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Map.empty
    else {
      val s = Files.list(p)
      try {
        val it = s.iterator()
        val b = Map.newBuilder[String, (Long, Long)]
        while (it.hasNext) {
          val f = it.next()
          if (Files.isRegularFile(f) && matcher.matches(f.getFileName))
            b += f.getFileName.toString ->
              (Files.size(f), Files.getLastModifiedTime(f).toMillis)
        }
        b.result()
      } finally s.close()
    }
  }

  def shouldTrigger(nowMs: Long): TriggerDecision = {
    val cur = scan()
    if (!primed) { // first poll establishes the baseline, never fires
      seen = cur; primed = true
      return TriggerDecision(false, s"baseline: ${cur.size} file(s)")
    }
    val added = cur.keySet -- seen.keySet
    val removed = seen.keySet -- cur.keySet
    val changed = cur.collect {
      case (k, v) if seen.get(k).exists(_ != v) => k
    }
    if (added.nonEmpty || removed.nonEmpty || changed.nonEmpty) {
      lastScan = Some(cur)
      TriggerDecision(true,
        s"+${added.size} -${removed.size} ~${changed.size} file(s)")
    } else TriggerDecision(false, "no file changes")
  }

  override def markRun(nowMs: Long): Unit = {
    seen = lastScan.getOrElse(scan())
    lastScan = None
  }
}

/** Polls triggers and runs their checkpoints when due. `pollOnce` is the
  * deterministic unit (tests drive it with a fake clock); `start` wraps it
  * in a daemon scheduler thread for real deployments. */
final class TriggerRunner(
    bindings: Seq[(Trigger, Checkpoint)],
    onResult: (String, CheckpointResult) => Unit = (_, _) => ()) {

  /** One poll pass: fire every due trigger, return results. An event
    * trigger's drained batch rides on the run as context (the checkpoint
    * sees what fired it) and is re-queued if the run ERRORS — a FAIL is
    * a successful run over bad data and consumes its batch. */
  def pollOnce(nowMs: Long): Seq[(String, CheckpointResult)] =
    bindings.flatMap { case (t, cp) =>
      val d = t.shouldTrigger(nowMs)
      if (!d.shouldRun) None
      else {
        val r = t match {
          case e: EventTrigger =>
            val batch = e.drainBatch()
            val res =
              try cp.run(EventTrigger.context(batch.map(_.event)))
              catch { case ex: Throwable => e.requeue(batch); throw ex }
            if (res.status == CheckpointStatus.Error) e.requeue(batch)
            res
          case _ => cp.run()
        }
        t.markRun(nowMs)
        onResult(t.name, r)
        Some(t.name -> r)
      }
    }

  @volatile private var exec:
      Option[java.util.concurrent.ScheduledExecutorService] = None
  private val pollFailures = new java.util.concurrent.atomic.AtomicLong(0)

  /** Consecutive failed poll passes — a monitoring hook: non-zero means the
    * runner is alive but its checkpoints are erroring. */
  def consecutiveFailures: Long = pollFailures.get()

  def start(pollIntervalMs: Long): Unit = synchronized {
    if (exec.isEmpty) {
      val e = java.util.concurrent.Executors.newSingleThreadScheduledExecutor(
        (r: Runnable) => { val t = new Thread(r, "graft-trigger-runner")
          t.setDaemon(true); t })
      e.scheduleAtFixedRate(
        // Catch Throwable, not Exception: an Error escaping the Runnable
        // permanently cancels the fixed-rate task and triggers stop firing
        // with no signal. Fatal JVM errors still surface via the failure
        // counter instead of a dead-silent scheduler.
        () => {
          try { pollOnce(System.currentTimeMillis()); pollFailures.set(0) }
          catch { case t: Throwable =>
            pollFailures.incrementAndGet()
            System.err.println(
              s"[graft] trigger poll failed (${pollFailures.get()} in a row): $t")
          }
        },
        pollIntervalMs, pollIntervalMs,
        java.util.concurrent.TimeUnit.MILLISECONDS)
      exec = Some(e)
    }
  }

  def stop(): Unit = synchronized { exec.foreach(_.shutdownNow()); exec = None }
}
