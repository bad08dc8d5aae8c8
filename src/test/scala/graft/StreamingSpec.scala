package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.core._
import graft.validators._
import graft.streaming.StreamValidate
import graft.streaming.StreamValidate._

class StreamingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Copy the sf0.001 events table into a temp dir so the file stream
    * source has a directory to watch. */
  private lazy val streamDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  /** Raw on-disk schema (whatever physical form ts takes in this fixture
    * generation); the stream restores timestamp semantics through the SAME
    * type-dispatching shim the batch loader uses (Exprs.normalizeTs), so a
    * fixture re-encode can't split batch and stream onto different paths. */
  private def rawSchema =
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").schema

  private def eventStream =
    graft.ops.Exprs.normalizeTs(
      spark.readStream.schema(rawSchema).parquet(streamDir))

  test("micro-batch validation reuses the fused batch kernel") {
    val results = scala.collection.mutable.ArrayBuffer.empty[ValidationRunResult]
    val q = StreamValidate.microBatchValidate(
      spark.readStream.schema(rawSchema).parquet(streamDir),
      Seq(
        NullCheck(Seq("event_id", "user_id")),
        SetMembershipCheck("event_type",
          Seq("click", "view", "purchase", "signup", "error")),
        RangeCheck("value", Some(0.0), Some(100.0))), // will flag rows
      (r, _) => results.synchronized { results += r },
      trigger = Trigger.AvailableNow())
    q.awaitTermination(60000)
    assert(results.nonEmpty)
    val total = results.map(_.rowCount).sum
    assert(total == 1000) // sf0.001 events rows
    // range check fires (values go up to ~500)
    assert(results.exists(_.checks.exists(c =>
      c.validator.startsWith("range") && !c.passed)))
    // set membership passes
    assert(results.forall(_.checks.filter(_.validator.startsWith("in_set"))
      .forall(_.passed)))
  }

  test("streaming windowed aggregate equals the batch form") {
    val batch = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "events")
    val cfg = WindowConfig(Tumbling, "6 hours")
    val expected = StreamValidate.windowedAggregate(batch, "ts", cfg,
      Seq(col("event_type")), Seq(count(lit(1)).as("cnt")))
      .select(col("win.start").as("ws"), col("event_type"), col("cnt"))
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet

    val q = StreamValidate.windowedAggregate(eventStream, "ts", cfg,
      Seq(col("event_type")), Seq(count(lit(1)).as("cnt")))
      .select(col("win.start").as("ws"), col("event_type"), col("cnt"))
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_out")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("win_out")
      .collect().map(r => (r.get(0).toString, r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("windowedCheck flags violating windows") {
    val batch = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "events")
    val bad = StreamValidate.windowedCheck(batch, "ts",
      WindowConfig(Tumbling, "1 day"), Nil,
      metric = count(lit(1)), metricName = "cnt",
      violation = col("cnt") > 20) // ~33 events/day at sf0.001
    assert(bad.count() > 0)
    val none = StreamValidate.windowedCheck(batch, "ts",
      WindowConfig(Tumbling, "1 hour"), Nil,
      metric = count(lit(1)), metricName = "cnt",
      violation = col("cnt") > 1000000)
    assert(none.count() == 0)
  }

  test("stream dedup drops duplicate ids within watermark") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    input.addData((1L, t0), (1L, t0), (2L, t0), (3L, t0), (3L, t0))
    val deduped = StreamValidate.dedupStream(
      input.toDF().toDF("id", "ts"), "id", "ts", "1 minute")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_out").count() == 3)
  }

  test("watermark-bounded dedup drops replays with drifting timestamps") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, java.sql.Timestamp)]
    val t0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def at(s: Int) = new java.sql.Timestamp(t0.getTime + s * 1000L)
    // id 1 replayed at three different event times, id 2 once — the
    // (id, ts) form would keep all three id-1 rows; this form keeps one
    input.addData((1L, at(0)), (1L, at(5)), (2L, at(1)), (1L, at(9)))
    val deduped = StreamValidate.dedupStreamWithinWatermark(
      input.toDF().toDF("id", "ts"), "id", "ts", "1 minute")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_wm_out").start()
    q.processAllAvailable(); q.stop()
    assert(spark.table("dedup_wm_out").count() == 2)
  }

  test("stateful monotonic check matches per-key lag on a batch frame") {
    val ev = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "events")
    val got = StreamValidate.statefulMonotonicCheck(
      ev, "user_id", "ts", "value").count()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("value"))
    val expected = ev
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .withColumn("prev", lag(col("value"), 1).over(w))
      .filter(col("prev").isNotNull && col("value") < col("prev")).count()
    assert(got == expected && got > 0)
  }

  test("stateful monotonic check carries state across micro-batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val stream = StreamValidate.statefulMonotonicCheck(
      input.toDF().toDF("k", "ts", "v"), "k", "ts", "v", "1 minute")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("mono_out").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: rising sequence, no violation
    input.addData(("u1", t("2024-01-01 00:00:00"), 5.0),
      ("u1", t("2024-01-01 00:01:00"), 7.0))
    q.processAllAvailable()
    assert(spark.table("mono_out").count() == 0)
    // batch 2: drop vs batch-1 state (7.0 -> 3.0) — only state can see it
    input.addData(("u1", t("2024-01-01 00:02:00"), 3.0))
    q.processAllAvailable()
    val out = spark.table("mono_out").as[StreamValidate.SeqViolation].collect()
    q.stop()
    assert(out.length == 1 && out.head.prevValue == 7.0 &&
      out.head.value == 3.0)
  }

  test("late-admitted events neither fabricate violations nor regress state") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq = spark.sqlContext
    val input = MemoryStream[(String, java.sql.Timestamp, Double)]
    val stream = StreamValidate.statefulMonotonicCheck(
      input.toDF().toDF("k", "ts", "v"), "k", "ts", "v", "10 minutes")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("late_out").start()
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    input.addData(("u1", t("2024-01-01 00:10:00"), 10.0))
    q.processAllAvailable()
    // late event (00:05 < state's 00:10), admitted by the 10-min watermark:
    // 8 < 10 must NOT be flagged (event-time order has 8 BEFORE 10)
    input.addData(("u1", t("2024-01-01 00:05:00"), 8.0))
    q.processAllAvailable()
    assert(spark.table("late_out").count() == 0)
    // and state must still be (00:10, 10): 9 at 00:15 IS a violation
    input.addData(("u1", t("2024-01-01 00:15:00"), 9.0))
    q.processAllAvailable()
    val out = spark.table("late_out").as[StreamValidate.SeqViolation].collect()
    q.stop()
    assert(out.length == 1 && out.head.prevValue == 10.0)
  }

  test("session windows merge events within the gap") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:03:00"), // session A
      (1L, "2024-01-01 00:20:00"),                              // session B
      (2L, "2024-01-01 00:00:00")                               // session C
    ).toDF("user_id", "s").withColumn("ts", col("s").cast("timestamp"))
    val sessions = StreamValidate.windowedAggregate(df, "ts",
      WindowConfig(Session, "", gap = Some("5 minutes")),
      Seq(col("user_id")), Seq(count(lit(1)).as("n")))
    assert(sessions.count() == 3)
    assert(sessions.filter(col("user_id") === 1 && col("n") === 2).count() == 1)
  }
}
