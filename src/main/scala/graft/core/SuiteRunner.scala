package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Executes a suite of validators against a DataFrame in at most two
  * full scans (plus bounded enrichment jobs).
  *
  * Scan plan:
  *   1. fuse every validator's `statsExprs` (+ row count) into one wide
  *      aggregate — partial aggregation per partition, tiny final merge;
  *   2. fuse every validator's `metricExprs` into a second wide aggregate
  *      (skipped entirely when no validator declared stats AND scan 1
  *      already carried the metric exprs — the common case is ONE scan);
  *   3. for failed validators, at ResultFormat >= Basic, run
  *      `df.filter(failPredicate).limit(k)` sample jobs (bounded output).
  *
  * Metric deduplication: exprs are keyed by [[MetricKey]]; two validators
  * asking for the same metric share one aggregate column (reference
  * SharedMetricStore semantics, truthound `validators/metrics.py:109-254`).
  *
  * Scale notes (100 TB): the fused aggregate is a map-side-combinable
  * global aggregation — each task reduces its partition to ONE row of
  * ~hundreds of scalars, so the shuffle is O(partitions), not O(rows).
  * No collect of data rows ever happens except the bounded `limit(k)`
  * samples. Validators that need group-bys (duplicates via exact groupBy,
  * top-k frequencies) express them as count_distinct/approx aggregates
  * here, or run as dedicated operators outside the fused pass.
  */
object SuiteRunner {

  final case class Config(
      format: ResultFormat = ResultFormat.Basic,
      sampleSize: Int = 20,
      datasetName: String = "dataset"
  )

  def run(df: DataFrame, validators: Seq[Validator],
          config: Config = Config()): ValidationRunResult = {
    val schema = df.schema
    var scans = 0

    // --- Phase A: fused stats pass (only if some validator needs it) ---
    val statsByV: Seq[(Validator, Seq[(MetricKey, Column)])] =
      validators.map(v => v -> (if (v.schemaOnly) Nil else v.statsExprs(schema)))
    val rowCountKey = MetricKey("row_count", "*")
    val needsStats = statsByV.exists(_._2.nonEmpty)

    val statsMetrics: Metrics = if (needsStats) {
      scans += 1
      collectAgg(df, dedup(statsByV.flatMap(_._2) :+ (rowCountKey -> count(lit(1)))))
    } else Metrics.empty

    // --- Phase B: fused metric pass ---
    val metricByV: Seq[(Validator, Seq[(MetricKey, Column)])] =
      validators.map(v => v -> (if (v.schemaOnly) Nil else v.metricExprs(schema, statsMetrics)))
    val allMetricExprs = dedup(
      metricByV.flatMap(_._2) ++
        (if (needsStats) Nil else Seq(rowCountKey -> count(lit(1)))))

    val mainMetrics: Metrics =
      if (allMetricExprs.nonEmpty) { scans += 1; collectAgg(df, allMetricExprs) }
      else Metrics.empty

    val metrics = statsMetrics ++ mainMetrics
    val total = metrics.long(rowCountKey)

    // --- Evaluate (driver-side, with dependency skip semantics) ---
    val failed = scala.collection.mutable.Set.empty[String]
    val results = validators.map { v =>
      val t0 = System.nanoTime()
      val res =
        if (v.dependencies.exists(failed.contains))
          CheckResult(v.name, v.category, passed = true, Nil, 0L) // skipped
        else {
          val issues = v match {
            case _ if v.schemaOnly => v.schemaIssues(schema)
            case d: DedicatedScan  => scans += 1; d.runScan(df, total)
            case _                 => v.evaluate(metrics, total)
          }
          CheckResult(v.name, v.category, issues.isEmpty, issues,
            (System.nanoTime() - t0) / 1000000)
        }
      if (!res.passed) failed += v.name
      res
    }

    // --- Enrichment: bounded failing-row samples ---
    val enriched =
      if (config.format.rank >= ResultFormat.Basic.rank)
        results.map { r =>
          if (r.passed) r
          else {
            val v = validators.find(_.name == r.validator).get
            v.failPredicate(schema, metrics) match {
              case Some(pred) =>
                scans += 1 // bounded job, not a full scan in practice (limit pushdown)
                val sample = df.filter(pred).limit(config.sampleSize)
                  .collect().toSeq.map(rowToString)
                r.copy(issues = r.issues.map(i => i.copy(sampleValues = sample)))
              case None => r
            }
          }
        }
      else results

    ValidationRunResult(config.datasetName, total, enriched,
      executionMode = "fused-batch", scanCount = scans)
  }

  /** One wide aggregate: single scan, partial+final agg. */
  private def collectAgg(df: DataFrame, exprs: Seq[(MetricKey, Column)]): Metrics = {
    val keys = exprs.map(_._1)
    val cols = exprs.zipWithIndex.map { case ((_, c), i) => c.as(s"m$i") }
    val row: Row = df.agg(cols.head, cols.tail: _*).head()
    new Metrics(keys.zipWithIndex.map { case (k, i) => k -> row.get(i) }.toMap)
  }

  private def dedup(exprs: Seq[(MetricKey, Column)]): Seq[(MetricKey, Column)] = {
    val seen = scala.collection.mutable.LinkedHashMap.empty[MetricKey, Column]
    exprs.foreach { case (k, c) => if (!seen.contains(k)) seen += k -> c }
    seen.toSeq
  }

  private def rowToString(r: Row): String =
    r.schema.fieldNames.zip(r.toSeq).map { case (n, v) => s"$n=$v" }.mkString(", ")
}
