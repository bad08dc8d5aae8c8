package graft.streaming

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode, StreamingQuery, Trigger}

/** Streaming validation runtime (reference: truthound `realtime/` —
  * modes CONTINUOUS/MICRO_BATCH/WINDOWED `realtime/base.py:36-41`, windows
  * TUMBLING/SLIDING/SESSION/GLOBAL `base.py:44-51`, watermark semantics
  * `realtime/processing/windows.py:317-622`, incremental checkpointing
  * `realtime/incremental.py`).
  *
  * Spark mapping is 1:1 native Structured Streaming:
  *   - micro-batch validation  -> foreachBatch reusing the batch kernel
  *     unchanged (same fused single-pass SuiteRunner);
  *   - tumbling/sliding window -> groupBy(window(ts, dur[, slide]));
  *   - session window          -> groupBy(session_window(ts, gap));
  *   - watermark + lateness    -> withWatermark(ts, delay) — Spark closes
  *     a window when watermark passes window end, the same
  *     "watermark >= end + lateness" rule the reference implements by
  *     hand (fold lateness into the delay);
  *   - triggers COUNT/TIME     -> Trigger.ProcessingTime / AvailableNow;
  *   - exactly-once            -> checkpointed sink + idempotent writes.
  */
/** Config-level streaming source factory (reference
  * `datasources/streaming/` — kafka.py / kinesis.py / pubsub.py
  * adapters). Spark-first: every source IS `spark.readStream.format(...)`
  * and the validation kernel (`StreamValidate.microBatchValidate`) is
  * source-agnostic, so an "adapter" reduces to format + options + a
  * standard decode projection. The same config grammar drives a file
  * source in tests and Kafka in production — swapping needs no kernel
  * change.
  *
  * Kafka recipe (needs the standard `spark-sql-kafka-0-10` connector jar
  * on the runtime classpath — Spark's own packaging, not bundled here):
  * {{{
  * StreamSources.open(spark, StreamSourceConfig("kafka", Map(
  *   "kafka.bootstrap.servers" -> "broker:9092",
  *   "subscribe" -> "events",
  *   "startingOffsets" -> "latest")))
  * }}}
  * yields (key, value, topic, partition, offset, timestamp) with
  * key/value decoded to strings; parse `value` with `from_json` and feed
  * the result to `microBatchValidate`.
  */
final case class StreamSourceConfig(
    /** "kafka" | "rate" | "file:<format>" (e.g. "file:parquet"). */
    format: String,
    options: Map[String, String] = Map.empty,
    /** Required for file sources (streaming reads never infer). */
    schema: Option[org.apache.spark.sql.types.StructType] = None,
    /** Source directory for file sources. */
    path: Option[String] = None)

object StreamSources {
  def open(spark: org.apache.spark.sql.SparkSession,
      cfg: StreamSourceConfig): DataFrame = cfg.format match {
    case "kafka" =>
      // fail at config time, not deep inside the connector: these two
      // are the non-negotiable kafka source options, and a typo here is
      // the one residual risk of a wiring that can't be broker-tested
      // in this environment. Spark's kafka source matches option keys
      // case-insensitively, so this guard must too.
      val keys = cfg.options.keySet.map(_.toLowerCase(java.util.Locale.ROOT))
      require(keys.contains("kafka.bootstrap.servers"),
        "kafka source needs option 'kafka.bootstrap.servers'")
      require(Seq("subscribe", "subscribepattern", "assign")
          .exists(keys.contains),
        "kafka source needs one of 'subscribe' | 'subscribePattern' | " +
          "'assign'")
      spark.readStream.format("kafka").options(cfg.options).load()
        .select(col("key").cast("string").as("key"),
          col("value").cast("string").as("value"),
          col("topic"), col("partition"), col("offset"), col("timestamp"))
    case "rate" =>
      spark.readStream.format("rate").options(cfg.options).load()
    case f if f.startsWith("file:") =>
      val dir = cfg.path.getOrElse(throw new IllegalArgumentException(
        "file source needs StreamSourceConfig.path"))
      val schema = cfg.schema.getOrElse(throw new IllegalArgumentException(
        "file source needs StreamSourceConfig.schema (streaming reads " +
          "never infer)"))
      spark.readStream.format(f.stripPrefix("file:"))
        .options(cfg.options).schema(schema).load(dir)
    case other => throw new IllegalArgumentException(
      s"unknown stream source format '$other' (kafka | rate | file:<fmt>)")
  }
}

object StreamValidate {

  sealed trait WindowMode
  case object Tumbling extends WindowMode
  case object Sliding extends WindowMode
  case object Session extends WindowMode

  /** Window spec (reference WindowConfig, `realtime/base.py:115-132`).
    * `watermarkDelay` already includes allowed lateness. */
  final case class WindowConfig(
      mode: WindowMode,
      duration: String,
      slide: Option[String] = None,
      gap: Option[String] = None,
      watermarkDelay: String = "10 minutes")

  /** MICRO_BATCH mode: run the fused batch suite on every micro-batch and
    * hand the per-batch result to `onResult`. The batch kernel is reused
    * unchanged — partial aggregation inside a micro-batch is exactly the
    * chunked-validation contract of the reference's StreamingValidator. */
  def microBatchValidate(
      stream: DataFrame,
      validators: Seq[Validator],
      onResult: (ValidationRunResult, Long) => Unit,
      checkpoint: Option[String] = None,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val writer = stream.writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val result = SuiteRunner.run(batch, validators,
          SuiteRunner.Config(datasetName = s"batch-$batchId"))
        onResult(result, batchId)
      }
      .trigger(trigger)
    checkpoint.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** WINDOWED mode: per-window aggregate metrics with watermarking.
    * `aggs` are any aggregate Columns (the same metric exprs the batch
    * validators emit — one fused pass per window). Works identically on a
    * batch DataFrame (window/session_window are batch-legal), which is how
    * the correctness oracle exercises it. */
  def windowedAggregate(df: DataFrame, tsCol: String, config: WindowConfig,
                        keys: Seq[Column], aggs: Seq[Column]): DataFrame = {
    val withWm =
      if (df.isStreaming) df.withWatermark(tsCol, config.watermarkDelay) else df
    val windowCol = config.mode match {
      case Tumbling => window(col(tsCol), config.duration)
      case Sliding  => window(col(tsCol), config.duration,
        config.slide.getOrElse(config.duration))
      case Session  => session_window(col(tsCol), config.gap.getOrElse("5 minutes"))
    }
    withWm.groupBy(windowCol.as("win") +: keys: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Per-window validation: windowed aggregate metrics + a driver-side
    * rule evaluated per closed window (append mode => only final windows).
    * Returns the violating windows as a DataFrame. */
  def windowedCheck(df: DataFrame, tsCol: String, config: WindowConfig,
                    keys: Seq[Column], metric: Column, metricName: String,
                    violation: Column): DataFrame =
    windowedAggregate(df, tsCol, config, keys, Seq(metric.as(metricName)))
      .filter(violation)

  /** Exactly-once style dedup inside the stream (reference
    * `realtime/processing/exactly_once.py`): drop events whose id was seen
    * within the watermark horizon — Spark's dropDuplicates with watermark
    * keeps bounded state. */
  def dedupStream(stream: DataFrame, idCol: String, tsCol: String,
                  watermarkDelay: String): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicates(Seq(idCol, tsCol))

  /** Stream dedup whose state stays watermark-bounded even when the SAME
    * id arrives with DIFFERENT event times (retries, producer replays —
    * the common crawl-ingest shape): dropDuplicatesWithinWatermark keys
    * state by id alone and expires each entry once the watermark passes
    * its event time. [[dedupStream]] keys on (id, ts), so replays with
    * drifting timestamps all pass through it; this form drops them, at
    * the cost of only deduplicating within the watermark horizon. On an
    * unbounded 100 TB/day stream this is the difference between O(ids in
    * horizon) and O(distinct (id, ts) pairs) of state. */
  def dedupStreamWithinWatermark(stream: DataFrame, idCol: String,
                                 tsCol: String,
                                 watermarkDelay: String): DataFrame =
    stream.withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(Seq(idCol))

  // ---- custom state (flatMapGroupsWithState) ----

  final case class SeqEvent(key: String, ts: java.sql.Timestamp,
      value: Double) {
    /** event-time micros (getTime is ms-precision; getNanos restores the
      * sub-ms part the parquet fixtures carry). floorDiv: truncating
      * division would misplace pre-1970 sub-second timestamps by 1 s. */
    def tsMicros: Long =
      Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000
  }
  final case class SeqState(lastTsMicros: Long, lastValue: Double)
  final case class SeqViolation(key: String, tsMicros: Long, value: Double,
      prevValue: Double)

  /** Cross-batch per-key monotonicity check — the custom-state form the
    * window/dropDuplicates built-ins can't express: each key carries its
    * last (event-time, value) across micro-batches in `GroupState`, so a
    * regression that straddles a batch boundary is still caught
    * (reference `realtime/incremental.py` incremental checkpoint state).
    *
    * Scale contract: state is ONE small record per key, partitioned by
    * the grouping key (the same shuffle a streaming agg pays); on a
    * stream, idle keys are reaped via event-time timeout one watermark
    * horizon after their last event, so state size tracks ACTIVE keys,
    * not all-time key cardinality. Batch-legal like windowedAggregate:
    * on a batch frame each group is processed once (equivalent to a
    * per-key lag over (ts, value) ordering), which is how the oracle
    * restates it. */
  def statefulMonotonicCheck(df: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, watermarkDelay: String = "10 minutes")
      : Dataset[SeqViolation] = {
    val spark = df.sparkSession
    import spark.implicits._
    val withWm =
      if (df.isStreaming) df.withWatermark(tsCol, watermarkDelay) else df
    // the watermarked timestamp ATTRIBUTE must survive to the stateful
    // operator (a derived expression like unix_micros(ts) drops the
    // watermark metadata and EventTimeTimeout is rejected) — alias only
    // filter on the CASTED value: a non-null, non-numeric cell casts to
    // null and would crash the encoder's non-nullable Double field
    val events = withWm
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).cast("double").isNotNull)
      .select(col(keyCol).cast("string").as("key"),
        col(tsCol).as("ts"),
        col(valueCol).cast("double").as("value")).as[SeqEvent]
    val timeoutConf =
      if (df.isStreaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.key)
      .flatMapGroupsWithState[SeqState, SeqViolation](
        OutputMode.Append, timeoutConf) {
        (key: String, rows: Iterator[SeqEvent], state: GroupState[SeqState]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // per-key per-batch rows are bounded; (ts, value) order makes
            // tie handling deterministic and matches the SQL lag oracle
            val sorted = rows.toIndexedSeq.sortBy(e => (e.tsMicros, e.value))
            var last = state.getOption
            val out = Seq.newBuilder[SeqViolation]
            sorted.foreach { e =>
              last match {
                // late-but-admitted event (event time BEFORE the carried
                // state): skip — comparing it against later state would
                // fabricate a violation the event-time lag order doesn't
                // have, and regressing the state would mask a real one
                case Some(st) if e.tsMicros < st.lastTsMicros => ()
                case Some(st) =>
                  if (e.value < st.lastValue)
                    out += SeqViolation(key, e.tsMicros, e.value, st.lastValue)
                  last = Some(SeqState(e.tsMicros, e.value))
                case None =>
                  last = Some(SeqState(e.tsMicros, e.value))
              }
            }
            last.foreach { st =>
              state.update(st)
              if (timeoutConf == GroupStateTimeout.EventTimeTimeout)
                // anchor at max(last event, watermark): Spark rejects a
                // timeout at or below the current watermark, which a
                // late-but-admitted event's ts + delay could otherwise hit
                state.setTimeoutTimestamp(
                  math.max(st.lastTsMicros / 1000,
                    state.getCurrentWatermarkMs()), watermarkDelay)
            }
            out.result().iterator
          }
      }
  }
}
