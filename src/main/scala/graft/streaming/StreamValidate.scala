package graft.streaming

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

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
}
