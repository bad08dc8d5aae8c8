package graft.stores

import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental (watermark-delta) validation: validate only the rows that
  * arrived since the last persisted run.
  *
  * Beyond the reference surface (its `stores/streaming` is about result
  * streaming, not delta validation) but essential at 100 TB: a daily
  * suite must not rescan the whole table, only the new partition. The
  * high-water mark persists as a run tag in the ResultStore, the delta
  * filter `wm > lastWatermark` is an ordinary predicate — on a
  * date-partitioned table it IS partition pruning, so the scan cost is
  * proportional to the new data, not the table.
  *
  * The watermark expression must be monotone in arrival order (event
  * time, ingestion ts, increasing id). Late rows below the stored
  * watermark are skipped by construction — route those through the
  * streaming path (`StreamValidate`, watermark + lateness) instead.
  */
object Incremental {

  private val WatermarkTag = "watermark"

  /** Newest persisted watermark for `dataset`, if any run carries one. */
  def lastWatermark(spark: SparkSession, store: ResultStore,
      dataset: String): Option[Long] = {
    val rows = store.history(spark, dataset)
      .filter(col("tags").getItem(WatermarkTag).isNotNull)
      .orderBy(col("runTs").desc)
      .select(col("tags").getItem(WatermarkTag)).limit(1).collect()
    rows.headOption.map(_.getString(0).toLong)
  }

  /** The unvalidated slice of `df` under watermark expression `wm`
    * (cast to long for comparison/persistence). `None` = first run =
    * full frame. */
  def delta(df: DataFrame, wm: Column, last: Option[Long]): DataFrame =
    last match {
      case Some(w) => df.filter(wm.cast("long") > w)
      case None => df
    }

  final case class IncrementalRun(result: ValidationRunResult,
      fromWatermark: Option[Long], toWatermark: Option[Long],
      deltaRows: Long)

  /** Validate the delta and persist the advanced watermark. The
    * high-water-mark aggregate piggybacks on the suite's own scan via
    * `Dataset.observe` (CollectMetrics), so the delta is read ONCE —
    * except under sampling/early-termination configs, where the
    * observed plan would see a subset and the mark must come from a
    * separate (still delta-pruned) aggregate. An empty delta still
    * records a run (zero rows, watermark unchanged) so run cadence
    * stays observable.
    *
    * Watermark contract: by default the mark advances even when
    * validation FAILS (each slice is scanned exactly once; failures
    * surface through the stored run + exit code, and re-validating bad
    * rows forever would stall the cadence). Pass
    * `advanceOnFailure = false` to persist the PREVIOUS mark on a
    * failed run instead, so the failed delta is re-scanned next run —
    * note repeated failures then re-validate a growing slice until the
    * failure is fixed. */
  def run(spark: SparkSession, store: ResultStore, df: DataFrame,
      wm: Column, validators: Seq[Validator], dataset: String,
      runId: String, runTs: Long,
      cfg: SuiteRunner.Config = SuiteRunner.Config(),
      advanceOnFailure: Boolean = true): IncrementalRun = {
    val last = lastWatermark(spark, store, dataset)
    val slice = delta(df, wm, last)
    // SuiteRunner always executes at least one action over the frame it
    // is given (the fused metrics aggregate computes rowCount even for
    // an empty validator list), so the blocking Observation.get is safe
    // whenever the observed plan is the one SuiteRunner scans — i.e. not
    // under sampling/early-termination configs, which aggregate a
    // subset.
    val fullScan = cfg.sampleFraction.isEmpty &&
      cfg.earlyTerminationRows.isEmpty
    val obs = org.apache.spark.sql.Observation(s"graft_wm_$runId")
    val observed =
      if (fullScan) slice.observe(obs, max(wm.cast("long")).as("wm"))
      else slice
    val result = SuiteRunner.run(observed, validators,
      cfg.copy(datasetName = dataset))
    val observedWm = if (fullScan)
      obs.get.get("wm").collect { case l: Long => l }
    else None
    val seenWm = observedWm.orElse {
      val maxRow = slice.agg(max(wm.cast("long"))).head()
      if (maxRow.isNullAt(0)) last else Some(maxRow.getLong(0))
    }.orElse(last)
    val newWm =
      if (advanceOnFailure || result.passed) seenWm
      else last
    store.save(spark, result, runId, runTs,
      tags = Map("incremental" -> "true") ++
        newWm.map(WatermarkTag -> _.toString) ++
        last.map("fromWatermark" -> _.toString))
    IncrementalRun(result, last, newWm, result.rowCount)
  }
}
