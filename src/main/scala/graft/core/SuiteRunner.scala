package graft.core

import org.apache.spark.sql.{Column, DataFrame, Observation, Row}
import org.apache.spark.sql.functions._

/** Executes a suite of validators against a DataFrame in at most two
  * full scans (plus bounded enrichment jobs).
  *
  * Scan plan:
  *   1. fuse every validator's `statsExprs` (+ row count) into one wide
  *      aggregate — partial aggregation per partition, tiny final merge;
  *   2. fuse every validator's `metricExprs` into a second wide aggregate
  *      (the common case — no stats validators — is ONE scan);
  *   3. for failed validators, at ResultFormat >= Basic, run
  *      `df.filter(failPredicate).limit(k)` sample jobs (bounded output).
  *
  * Metric deduplication: exprs are keyed by [[MetricKey]]; two validators
  * asking for the same metric share one aggregate column (reference
  * SharedMetricStore semantics, truthound `validators/metrics.py:109-254`).
  *
  * Fallback tiers (reference ExpressionBatchExecutor,
  * `validators/base.py:2538-2566`): if the fused aggregate fails (one bad
  * expression — e.g. an ANSI cast error — must not lose every other
  * validator's results), re-run per-validator; a validator whose own
  * aggregate still fails gets an `execution_error` issue while the rest
  * of the suite completes normally.
  *
  * Sampling (reference enterprise sampling + early termination,
  * `validators/base.py:1374-1692`): `sampleFraction` runs the metric scan
  * on a seeded sample and extrapolates counts; `earlyTerminationRows`
  * aggregates a head sample first and skips the full scan when the
  * observed failure rate already exceeds `earlyTerminationFailRate`.
  *
  * Scale notes (100 TB): the fused aggregate is a map-side-combinable
  * global aggregation — each task reduces its partition to ONE row of
  * scalars, so the shuffle is O(partitions), not O(rows). No collect of
  * data rows ever happens except the bounded `limit(k)` samples.
  */
object SuiteRunner {

  final case class Config(
      format: ResultFormat = ResultFormat.Basic,
      sampleSize: Int = 20,
      datasetName: String = "dataset",
      /** run metrics on a seeded sample and extrapolate counts. */
      sampleFraction: Option[Double] = None,
      /** head-sample row count for early termination; None disables. */
      earlyTerminationRows: Option[Int] = None,
      earlyTerminationFailRate: Double = 0.5,
      /** run DedicatedScan validators concurrently. */
      parallelDedicated: Boolean = true)

  private val rowCountKey = MetricKey("row_count", "*")

  def run(df0: DataFrame, validators: Seq[Validator],
          config: Config = Config()): ValidationRunResult = {
    val schema = df0.schema
    var scans = 0
    var mode = "fused-batch"

    // --- early termination: try the head sample first ---
    // only single-pass, non-dedicated validators participate: two-pass
    // validators would see empty stats (garbage fences) and dedicated
    // scans would run full jobs, defeating the point
    config.earlyTerminationRows.foreach { n =>
      val etValidators = validators.filter(v => v.schemaOnly ||
        (v.statsExprs(schema).isEmpty && !v.isInstanceOf[DedicatedScan]))
      if (etValidators.nonEmpty) { // never pay the sample scan for nothing
        val sample = df0.limit(n)
        val (m, _, failedExec, extraEt) = collectTiered(sample, etValidators, schema)
        scans += 1 + extraEt
        if (failedExec.isEmpty) {
          val sampleTotal = m.long(rowCountKey)
          if (sampleTotal >= n) { // sample saturated => data at least this big
            val results = evaluateAll(etValidators, m, sampleTotal, Set.empty, schema)
            val worstRatio = results.flatMap(_.issues).map(_.ratio)
              .maxOption.getOrElse(0.0)
            if (worstRatio >= config.earlyTerminationFailRate) {
              // validators excluded from the sample pass are reported as
              // visibly skipped, not silently dropped
              val skippedResults = validators.filterNot(etValidators.contains)
                .map(v => CheckResult(v.name, v.category, passed = true,
                  Seq(ValidationIssue(v.name, "*", "skipped_early_termination",
                    0, sampleTotal, Severity.Low.label, "", "")), 0L))
              return ValidationRunResult(config.datasetName, sampleTotal,
                results ++ skippedResults,
                executionMode = s"early-terminated@$n", scanCount = scans)
            }
          }
        }
      }
    }

    // --- sampling mode ---
    val (df, scale) = config.sampleFraction match {
      case Some(f) if f > 0 && f < 1 =>
        mode = s"sampled@$f"
        (df0.sample(withReplacement = false, f, seed = 42L), 1.0 / f)
      case _ => (df0, 1.0)
    }

    // --- Phase 0: fused probe pass (only if some validator declares
    // probes — size gates picking exact vs sketch forms). HLL-only
    // aggregates: one cheap column-pruned scan shared by every prober ---
    val probeMetrics: Metrics = {
      val probes = dedup(validators.filterNot(_.schemaOnly)
        .flatMap(_.probeExprs(schema)))
      if (probes.isEmpty) Metrics.empty
      else { scans += 1; collectAgg(df, probes) }
    }

    // --- Phase A: fused stats pass (only if some validator needs it) ---
    val needsStats = validators.exists(v =>
      !v.schemaOnly && v.statsExprs(schema, probeMetrics).nonEmpty)
    val statsMetrics: Metrics = probeMetrics ++ (if (needsStats) {
      scans += 1
      val exprs = dedup(validators.filterNot(_.schemaOnly)
        .flatMap(_.statsExprs(schema, probeMetrics)) :+
        (rowCountKey -> count(lit(1))))
      collectAgg(df, exprs)
    } else Metrics.empty)

    // --- Phase B: fused metric pass with tier fallback ---
    val (mainMetrics, tier, failedExec, extraScans) =
      collectTiered(df, validators, schema, statsMetrics, needsStats)
    scans += 1 + extraScans
    if (tier > 1) mode += s"+tier$tier"

    val metrics = statsMetrics ++ mainMetrics
    val total0 = metrics.long(rowCountKey)
    val total = if (scale == 1.0) total0 else math.round(total0 * scale)

    // --- Evaluate (driver-side, with dependency skip + parallel dedicated) ---
    val results = evaluateAll(validators, scaled(metrics, scale), total,
      failedExec, schema, Some(df), config)

    // --- Enrichment (reference result-format phases 2-3,
    // `validators/base.py:1933-1959`): Basic adds bounded failing-row
    // samples; Summary additionally adds the top failing-value
    // frequencies of each issue's column — both bounded follow-up jobs
    // run only for failed checks ---
    val enriched =
      if (config.format.rank >= ResultFormat.Basic.rank)
        results.map { r =>
          if (r.passed) r
          else validators.find(_.name == r.validator)
            .flatMap(v => v.failPredicate(schema, metrics)) match {
              case Some(pred) =>
                scans += 1
                val failing = df.filter(pred)
                val sample = failing.limit(config.sampleSize)
                  .collect().toSeq.map(rowToString)
                val issues2 =
                  if (config.format.rank >= ResultFormat.Summary.rank)
                    r.issues.map { i =>
                      val freq =
                        if (schema.fieldNames.contains(i.column)) {
                          scans += 1
                          failing.groupBy(col(i.column))
                            .agg(count(lit(1)).as("cnt"))
                            .orderBy(desc("cnt")).limit(5).collect().toSeq
                            .map(row => s"${row.get(0)} x${row.getLong(1)}")
                        } else Nil
                      // label is explicit: frequencies are over the
                      // VALIDATOR-level failing-row set (a multi-column
                      // validator's rows may fail on a sibling column)
                      i.copy(sampleValues = sample ++
                        (if (freq.nonEmpty)
                          s"top ${i.column} values among failing rows:" +: freq
                         else Nil))
                    }
                  else r.issues.map(_.copy(sampleValues = sample))
                r.copy(issues = issues2)
              case _ => r
            }
        }
      else results

    ValidationRunResult(config.datasetName, total, enriched, mode, scans)
  }

  /** Attach the suite's metrics to a DataFrame as a Dataset.observe
    * observation: validation rides along with the CALLER's own action —
    * zero extra scans (reference §4#2 notes `observe` as the
    * streaming-safe batched variant). Call the returned thunk AFTER an
    * action has run on the returned DataFrame. */
  def attach(df: DataFrame, validators: Seq[Validator],
             name: String = "graft"): (DataFrame, () => ValidationRunResult) = {
    val schema = df.schema
    // CollectMetrics rejects DISTINCT aggregates (not mergeable across
    // partial results) — demand the sketch-based variants up front
    val distinctOffenders = validators.filterNot(_.schemaOnly).filter(v =>
      v.metricExprs(schema, Metrics.empty).exists { case (_, c) =>
        org.apache.spark.sql.graft.ColumnBridge.hasDistinctAgg(c)
      })
    require(distinctOffenders.isEmpty,
      s"observed mode cannot use DISTINCT aggregates; replace with approx " +
        s"variants (e.g. ApproxDistinctCheck): " +
        distinctOffenders.map(_.name).mkString(", "))
    val twoPass = validators.filterNot(_.schemaOnly)
      .filter(_.statsExprs(schema).nonEmpty)
    require(twoPass.isEmpty,
      "observed mode cannot run two-pass validators (their stats pass " +
        "needs its own scan): " + twoPass.map(_.name).mkString(", "))
    val keyed = dedup(validators.filterNot(_.schemaOnly)
      .flatMap(_.metricExprs(schema, Metrics.empty)) :+
      (rowCountKey -> count(lit(1))))
    val obs = Observation(name)
    val aliased = keyed.zipWithIndex.map { case ((_, c), i) => c.as(s"m$i") }
    val observed = df.observe(obs, aliased.head, aliased.tail: _*)
    val resultThunk = () => {
      val got = obs.get
      val m = new Metrics(keyed.zipWithIndex.map { case ((k, _), i) =>
        k -> got.getOrElse(s"m$i", null)
      }.toMap)
      val total = m.long(rowCountKey)
      ValidationRunResult(name, total,
        evaluateAll(validators, m, total, Set.empty, schema), "observed", 0)
    }
    (observed, resultThunk)
  }

  // ---- internals ----

  /** Tiered metric collection: fused -> per-validator -> error-marked.
    * Returns (metrics, tierUsed, validatorsWhoseMetricsFailed). */
  private def collectTiered(df: DataFrame, validators: Seq[Validator],
      schema: org.apache.spark.sql.types.StructType,
      stats: Metrics = Metrics.empty,
      statsAlreadyCounted: Boolean = false)
      : (Metrics, Int, Set[String], Int) = {
    // a validator whose metricExprs CONSTRUCTION throws (bad param match,
    // bad column ref) is isolated here too, not just execution failures
    val constructed = validators.filterNot(_.schemaOnly).map { v =>
      try Right(v -> v.metricExprs(schema, stats))
      catch { case e: Exception => Left(v.name) }
    }
    val constructFailed = constructed.collect { case Left(n) => n }.toSet
    val byValidator = constructed.collect { case Right(ve) => ve }
    val fused = dedup(byValidator.flatMap(_._2) ++
      (if (statsAlreadyCounted) Nil else Seq(rowCountKey -> count(lit(1)))))
    if (fused.isEmpty) return (Metrics.empty, 1, constructFailed, 0)
    try {
      val (m, extra) = collectSplitDistinct(df, fused)
      (m, 1, constructFailed, extra)
    } catch {
      case _: Exception =>
        // tier 2: isolate per validator so one bad expression can't sink
        // the suite; row count computed separately
        var acc = Map.empty[MetricKey, Any]
        val failed = scala.collection.mutable.Set.empty[String]
        try {
          val rc = df.agg(count(lit(1)).as("n")).head().getLong(0)
          acc += rowCountKey -> rc
        } catch { case _: Exception => }
        byValidator.foreach { case (v, exprs) =>
          if (exprs.nonEmpty) {
            try {
              val m = collectAgg(df, dedup(exprs))
              acc ++= dedup(exprs).map(_._1).flatMap(k =>
                m.get(k).map(k -> _))
            } catch { case _: Exception => failed += v.name }
          }
        }
        (new Metrics(acc), 2, constructFailed ++ failed, byValidator.size)
    }
  }

  private def evaluateAll(validators: Seq[Validator], metrics: Metrics,
      total: Long, failedExec: Set[String],
      schema: org.apache.spark.sql.types.StructType,
      df: Option[DataFrame] = None,
      config: Config = Config()): Seq[CheckResult] = {
    // dedicated scans first (optionally concurrent — Spark schedules the
    // jobs in parallel on the shared session)
    val dedicated: Map[String, Seq[ValidationIssue]] = df match {
      case Some(d) =>
        val ds = validators.collect { case v: Validator with DedicatedScan => v }
        if (ds.isEmpty) Map.empty
        else if (config.parallelDedicated && ds.size > 1) {
          Par.map(ds) { v =>
            v.name -> (try v.asInstanceOf[DedicatedScan].runScan(d, total)
            catch { case e: Exception =>
              Seq(ValidationIssue(v.name, "*", "execution_error", 0, total,
                Severity.Critical.label, "", String.valueOf(e.getMessage))) })
          }.toMap
        } else ds.map(v => v.name ->
          (try v.asInstanceOf[DedicatedScan].runScan(d, total)
           catch { case e: Exception =>
             Seq(ValidationIssue(v.name, "*", "execution_error", 0, total,
               Severity.Critical.label, "", String.valueOf(e.getMessage))) })).toMap
      case None => Map.empty
    }

    // evaluate everything first, then apply skip-conditions to a fixpoint
    // (order-independent: a dependency listed AFTER its dependent still
    // triggers the skip; transitive failures propagate)
    val evaluated: Seq[CheckResult] = validators.map { v =>
      val t0 = System.nanoTime()
      if (failedExec.contains(v.name))
        CheckResult(v.name, v.category, passed = false,
          Seq(ValidationIssue(v.name, "*", "execution_error", 0, total,
            Severity.Critical.label, "", "metric computation failed")), 0L)
      else {
        val issues =
          // schemaIssues is consulted for EVERY validator (default Nil):
          // metric-based validators use it to report structurally-missing
          // columns (e.g. ConsentCheck's absent consent column) that their
          // metricExprs can only silently omit
          try v match {
            case _ if v.schemaOnly => v.schemaIssues(schema)
            case _: DedicatedScan =>
              v.schemaIssues(schema) ++ dedicated.getOrElse(v.name, Nil)
            case _ => v.schemaIssues(schema) ++ v.evaluate(metrics, total)
          } catch {
            case e: Exception =>
              Seq(ValidationIssue(v.name, "*", "execution_error", 0, total,
                Severity.Critical.label, "", String.valueOf(e.getMessage)))
          }
        CheckResult(v.name, v.category, issues.isEmpty, issues,
          (System.nanoTime() - t0) / 1000000)
      }
    }
    val failedNames = evaluated.filterNot(_.passed).map(_.validator).toSet
    val byName = validators.map(v => v.name -> v).toMap
    var changed = true
    val skipped = scala.collection.mutable.Set.empty[String]
    while (changed) {
      changed = false
      validators.foreach { v =>
        // skip when a dependency either failed or was itself skipped —
        // checking the union keeps the fixpoint independent of listing
        // order (a dependency that both failed and got skipped still
        // propagates)
        if (!skipped.contains(v.name) &&
            v.dependencies.exists(d =>
              failedNames.contains(d) || skipped.contains(d))) {
          skipped += v.name
          changed = true
        }
      }
    }
    evaluated.map { r =>
      if (skipped.contains(r.validator))
        r.copy(passed = true, issues = Seq(ValidationIssue(r.validator, "*",
          "skipped_dependency_failed", 0, total, Severity.Low.label,
          "", byName(r.validator).dependencies.mkString(","))))
      else r
    }
  }

  /** Scale integer counts by the sampling factor. Every Long metric is a
    * row count and extrapolates linearly EXCEPT cardinality-derived ones
    * (distinct counts, and dupes = total - distinct): cardinality does not
    * scale linearly, so distinct/dupe-based checks are unsupported under
    * sampling and keep their raw sample values (documented limitation —
    * the reference's sampled mode has the same caveat). Doubles (means,
    * quantiles, ratios) are scale-free. */
  private def scaled(m: Metrics, scale: Double): Metrics =
    if (scale == 1.0) m
    else new Metrics(m.asMap.map {
      case (k, v: java.lang.Long)
          if !k.metric.contains("distinct") && !k.metric.contains("dupes") &&
             !k.metric.startsWith("max_ts") && !k.metric.startsWith("abs_max") =>
        k -> java.lang.Long.valueOf(math.round(v.longValue() * scale))
      case kv => kv
    })

  /** Fused collection that avoids Spark's two DISTINCT-aggregate plan
    * traps. (1) Expand blow-up: two or more DISTINCT aggregates in one
    * Aggregate make the planner EXPAND the input N-fold (verified on
    * the physical plan), so the scan volume multiplies by the number of
    * distinct groups — each extra distinct always runs as its own
    * column-pruned job. (2) Per-group partial buffers: even a SINGLE
    * distinct fused with plain metrics plans via
    * planAggregateWithOneDistinct, whose partial stages GROUP BY the
    * distinct column — every fused IMPERATIVE buffer (percentile,
    * percentile_approx, HLL, collect_*) is then built and merged per
    * distinct VALUE, a cliff the sf1000 decade probe measured at >100x
    * on Learn's stats pass (QuantileSummaries.merge-bound, 150M-distinct
    * column: >30 min vs ~12 s unfused). Declarative companions
    * (count/sum/min/max/avg/stddev) are safe to fuse: their per-group
    * state is a few struct words inside the hash row, and the grouped
    * partial is the distinct's own cost. So the FIRST distinct fuses
    * with the plain metrics only when no plain metric carries an
    * imperative aggregate; otherwise every distinct splits into its own
    * job. Split jobs run concurrently (wall time = slowest job). */
  private def collectSplitDistinct(df: DataFrame,
      exprs: Seq[(MetricKey, Column)]): (Metrics, Int) = {
    val (distincts, plain) = exprs.partition { case (_, c) =>
      org.apache.spark.sql.graft.ColumnBridge.hasDistinctAgg(c)
    }
    if (distincts.isEmpty) (collectAgg(df, exprs), 0)
    else {
      val fuseFirst =
        plain.isEmpty || !hasImperativeAgg(df, plain)
      val groups: Seq[Seq[(MetricKey, Column)]] =
        if (fuseFirst) (plain ++ distincts.take(1)) +: distincts.drop(1).map(Seq(_))
        else (if (plain.nonEmpty) Seq(plain) else Nil) ++ distincts.map(Seq(_))
      if (groups.size == 1) (collectAgg(df, groups.head), 0)
      else {
        val collected = graft.core.Par.map(groups)(g => collectAgg(df, g))
        (collected.reduce(_ ++ _), groups.size - 1)
      }
    }
  }

  /** Whether any metric column resolves to an ImperativeAggregate
    * (non-codegen buffer: percentile family, HLL, collect_*). Checked on
    * the ANALYZED plan — `expr("percentile(...)")`-built columns carry
    * opaque node trees that name-based Column inspection misses. */
  private def hasImperativeAgg(df: DataFrame,
      exprs: Seq[(MetricKey, Column)]): Boolean = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{
      AggregateExpression, ImperativeAggregate}
    val cols = exprs.zipWithIndex.map { case ((_, c), i) => c.as(s"m$i") }
    df.agg(cols.head, cols.tail: _*).queryExecution.analyzed.expressions
      .exists(_.exists {
        case ae: AggregateExpression =>
          ae.aggregateFunction.isInstanceOf[ImperativeAggregate]
        case _ => false
      })
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
