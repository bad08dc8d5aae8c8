package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.monitoring._
import graft.stores.ResultStore
import graft.streaming.{StreamSourceConfig, StreamSources, StreamValidate}
import graft.validators.NullCheck
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The full ops loop as ONE end-to-end flow: streaming source →
  * micro-batch validation (batch kernel reused) → ResultStore → metric
  * series → rule engine → dispatched alert. The file source stands in
  * for Kafka — the kernel is source-agnostic (StreamSources doc carries
  * the Kafka recipe; the connector jar isn't in this sandbox). */
class IntegrationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  test("ops loop: stream -> validate -> store -> monitor -> alert") {
    val src = java.nio.file.Files.createTempDirectory("graft_src").toString
    val chk = java.nio.file.Files.createTempDirectory("graft_chk").toString
    val ws = java.nio.file.Files.createTempDirectory("graft_ws").toString
    val store = ResultStore(ws)

    def runAvailable(runTs: Long): Unit = {
      val stream = StreamSources.open(spark, StreamSourceConfig(
        "file:parquet", schema = Some(schema), path = Some(src)))
      assert(stream.isStreaming)
      val q = StreamValidate.microBatchValidate(
        stream, Seq(NullCheck(Seq("v"))),
        onResult = (r, batchId) => {
          // one store row per micro-batch; empty batches still record
          store.save(spark, r.copy(dataset = "stream"),
            s"run-$runTs-$batchId", runTs)
        },
        checkpoint = Some(chk))
      q.awaitTermination(60000)
    }

    // two clean micro-batches, then a planted bad one (50% nulls)
    (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    runAvailable(1000L)
    (21 to 40).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(src)
    runAvailable(2000L)
    (41 to 60).map(i => (i.toLong, if (i % 2 == 0) null else s"v$i"))
      .toDF("id", "v").coalesce(1).write.mode("append").parquet(src)
    runAvailable(3000L)

    // the checkpoint made each run incremental: 3 distinct stored runs,
    // only the last one failing
    val hist = store.history(spark, "stream")
    assert(hist.select("runId").distinct().count() == 3)
    assert(hist.filter(!col("passed")).select("runId").distinct()
      .count() == 1)

    // monitor the per-validator violation ratio over stored runs — the
    // series INCLUDES the passing runs (ratio 0), so the engine sees the
    // recovery-free degradation and fires exactly once
    val series = MetricSeries.fromHistory(hist)
    val alerts = RuleEngine(Seq(ThresholdRule("null-rate",
      "violation_ratio", threshold = 0.1, severity = "critical")))
      .evaluate(series)
    val sent = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val n = Monitoring.dispatch(alerts, (subj, body) => sent += ((subj, body)))
    assert(n == 1, s"expected exactly one alert, got $n")
    assert(sent.head._1.contains("critical") &&
      sent.head._1.contains("null-rate"))

    // operational failure leg: an event trigger whose checkpoint ERRORS
    // exhausts redelivery and the dead-letter rides the SAME alert
    // channel the monitoring rules use — the ops loop hears about lost
    // events, not just bad data
    val ev = new graft.checkpoint.EventTrigger(minEvents = 1,
      maxRedelivery = 1, name = "ops-ev",
      onDeadLetter = graft.checkpoint.EventTrigger.deadLetterNotifier(
        "ops-ev", (subj, body) => sent += ((subj, body))))
    val boom = graft.checkpoint.Checkpoint("ops-boom",
      () => throw new RuntimeException("upstream table dropped"),
      Seq(NullCheck(Seq("v"))))
    val runner = new graft.checkpoint.TriggerRunner(Seq(ev -> boom))
    ev.fire(Map("path" -> s"$src/late.parquet"))
    runner.pollOnce(0); runner.pollOnce(1)
    assert(sent.size == 2)
    assert(sent.last._1.contains("dead-letter on trigger ops-ev"))
    assert(sent.last._2.contains("late.parquet"))
  }

  test("stream source factory: rate works, kafka wiring reaches the loader") {
    val rate = StreamSources.open(spark,
      StreamSourceConfig("rate", Map("rowsPerSecond" -> "1")))
    assert(rate.isStreaming && rate.columns.contains("value"))
    // no kafka connector jar in this sandbox: the factory must still
    // reach Spark's data-source loader (proves the wiring), which then
    // reports the missing package
    val e = intercept[Exception] {
      StreamSources.open(spark, StreamSourceConfig("kafka",
        Map("kafka.bootstrap.servers" -> "example.invalid:9092",
          "subscribe" -> "t")))
    }
    assert(e.getMessage.toLowerCase.contains("kafka"))
    // option typos die at config time with a named-option message,
    // not deep inside the connector
    val noBroker = intercept[IllegalArgumentException] {
      StreamSources.open(spark, StreamSourceConfig("kafka",
        Map("subscribe" -> "t")))
    }
    assert(noBroker.getMessage.contains("kafka.bootstrap.servers"))
    val noTopic = intercept[IllegalArgumentException] {
      StreamSources.open(spark, StreamSourceConfig("kafka",
        Map("kafka.bootstrap.servers" -> "example.invalid:9092")))
    }
    assert(noTopic.getMessage.contains("subscribe"))
    // Spark matches kafka options case-insensitively; the guard must not
    // reject a mixed-case config the connector would accept. (In this
    // sandbox the load then dies on the missing connector jar; with the
    // jar present it would succeed — either way the GUARD must not be
    // what throws.)
    val mixedCase = scala.util.Try {
      StreamSources.open(spark, StreamSourceConfig("kafka",
        Map("Kafka.Bootstrap.Servers" -> "example.invalid:9092",
          "SubscribePattern" -> "t.*")))
    }
    assert(!mixedCase.failed.toOption.exists(
      _.isInstanceOf[IllegalArgumentException]))
    val bad = intercept[IllegalArgumentException] {
      StreamSources.open(spark, StreamSourceConfig("carrier-pigeon"))
    }
    assert(bad.getMessage.contains("unknown stream source"))
  }
}
