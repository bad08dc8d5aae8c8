package graft.stores

import graft.core._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Validation-result store (reference: truthound `stores/base.py` BaseStore
  * CRUD + StoreQuery, `stores/results.py` ValidationResult records,
  * `stores/backends/filesystem.py` — persist run results, query history,
  * fetch latest).
  *
  * Spark-first shape: the store IS a parquet dataset partitioned by
  * `dataset`, so "query the last 30 runs of table X" is a partition-pruned
  * scan, and drift-over-runs is an ordinary DataFrame the existing drift
  * operators consume directly. One row per check per run, issues nested —
  * the same grain as the reference's per-validator results. Run volume is
  * tiny relative to the data being validated (a few rows per run), so the
  * store stays cheap at any fleet size; the layout still scales to
  * millions of runs because every query prunes to one dataset partition.
  */
final case class StoredIssue(column: String, issueType: String, count: Long,
    totalCount: Long, severity: String, expected: String, actual: String)

final case class StoredCheck(dataset: String, runId: String, runTs: Long,
    validator: String, category: String, passed: Boolean,
    elapsedMillis: Long, rowCount: Long, executionMode: String,
    scanCount: Int, issues: Seq[StoredIssue], tags: Map[String, String])

final case class ResultStore(workspace: String) {
  private def root = s"$workspace/store/results"
  // runId -> dataset sidecar index: one empty marker path per (run,
  // dataset) pair, written by save(). Lets delete() find its victim
  // partition(s) with two directory listings instead of scanning every
  // dataset partition of a millions-of-runs store. Advisory only: a
  // missing entry (store written by an older version, index wiped by
  // hand) falls back to the full scan, and a stale entry is harmless
  // because the rewrite re-filters the actual rows.
  private def indexRoot = s"$workspace/store/.runindex"
  private def indexDir(runId: String) = new org.apache.hadoop.fs.Path(
    indexRoot, "run=" + org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.escapePathName(runId))
  private def indexMarker(runId: String, ds: String) =
    new org.apache.hadoop.fs.Path(indexDir(runId),
      "ds=" + org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.escapePathName(ds))

  /** Persist one run. Appends a small parquet file under the dataset's
    * partition; returns the runId. Idempotency is the caller's contract
    * (re-saving the same runId appends duplicate rows — use a fresh runId
    * per run, which is what Checkpoint does). */
  def save(spark: SparkSession, r: ValidationRunResult, runId: String,
           runTs: Long, tags: Map[String, String] = Map.empty): String = {
    import spark.implicits._
    val rows = r.checks.map { c =>
      StoredCheck(r.dataset, runId, runTs, c.validator, c.category, c.passed,
        c.elapsedMillis, r.rowCount, r.executionMode, r.scanCount,
        c.issues.map(i => StoredIssue(i.column, i.issueType, i.count,
          i.totalCount, i.severity, i.expected, i.actual)), tags)
    }
    // index marker BEFORE the parquet append: a crash between the two
    // writes then leaves a STALE marker (harmless — delete() confirms
    // every candidate against real rows) instead of an unindexed
    // partition that a later index-routed delete would never visit
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(indexMarker(runId, r.dataset))
    rows.toDS().toDF().write.mode("append").partitionBy("dataset")
      .parquet(root)
    runId
  }

  /** Persist several runs in ONE parquet append (r15) — a backfill of N
    * runs otherwise pays N sequential write commits for a few rows each
    * (and appends into one store root cannot run concurrently: they
    * share the commit protocol's `_temporary` directory). Rows, layout
    * and index markers are identical to N [[save]] calls; only the
    * commit count changes. Returns the runIds. */
  def saveAll(spark: SparkSession,
      runs: Seq[(ValidationRunResult, String, Long)],
      tags: Map[String, String] = Map.empty): Seq[String] = {
    if (runs.isEmpty) return Nil
    import spark.implicits._
    val rows = runs.flatMap { case (r, runId, runTs) =>
      r.checks.map { c =>
        StoredCheck(r.dataset, runId, runTs, c.validator, c.category,
          c.passed, c.elapsedMillis, r.rowCount, r.executionMode,
          r.scanCount,
          c.issues.map(i => StoredIssue(i.column, i.issueType, i.count,
            i.totalCount, i.severity, i.expected, i.actual)), tags)
      }
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    runs.foreach { case (r, runId, _) =>
      fs.mkdirs(indexMarker(runId, r.dataset))
    }
    rows.toDS().toDF().write.mode("append").partitionBy("dataset")
      .parquet(root)
    runs.map(_._2)
  }

  /** All stored checks for one dataset — partition-pruned scan. */
  def history(spark: SparkSession, dataset: String): DataFrame =
    runs(spark).filter(col("dataset") === dataset)

  /** True once at least one run has been saved. */
  def isInitialized(spark: SparkSession): Boolean = {
    val p = new org.apache.hadoop.fs.Path(root)
    org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Whole store (all datasets). A never-written store reads as an EMPTY
    * frame with the store schema (so history()/metricTrend()/latestRunId
    * compose without every caller guarding AnalysisException); real read
    * errors on an existing store still propagate. */
  def runs(spark: SparkSession): DataFrame =
    if (isInitialized(spark)) spark.read.parquet(root)
    else {
      import spark.implicits._
      Seq.empty[StoredCheck].toDS().toDF()
    }

  /** Issue-grain history: one row per issue, for trend queries over a
    * specific metric/validator (drift-over-runs feeds straight into the
    * drift operators). */
  def issueHistory(spark: SparkSession, dataset: String): DataFrame =
    history(spark, dataset)
      .select(col("runId"), col("runTs"), col("validator"), col("rowCount"),
        explode(col("issues")).as("i"))
      .select(col("runId"), col("runTs"), col("validator"), col("rowCount"),
        col("i.column").as("column"), col("i.issueType").as("issueType"),
        col("i.count").as("violations"), col("i.totalCount").as("totalCount"),
        col("i.severity").as("severity"))

  /** Run-grain trend: one row per run with pass/violation aggregates,
    * ordered by time — "has null-rate drifted over the last N runs?" is a
    * filter + window over this frame. */
  def metricTrend(spark: SparkSession, dataset: String): DataFrame =
    history(spark, dataset)
      .groupBy(col("runId"), col("runTs"))
      .agg(first(col("rowCount")).as("rowCount"),
        count(lit(1)).as("checks"),
        count(when(!col("passed"), 1)).as("failedChecks"),
        sum(expr(
          "aggregate(issues, 0L, (acc, i) -> acc + i.count)"))
          .as("violations"))
      .orderBy(col("runTs"))

  /** Most recent runId for a dataset, if any. */
  def latestRunId(spark: SparkSession, dataset: String): Option[String] =
    history(spark, dataset).orderBy(col("runTs").desc)
      .select("runId").limit(1).collect().headOption.map(_.getString(0))

  /** Checks of one run (across datasets — runIds are globally unique). */
  def get(spark: SparkSession, runId: String): DataFrame =
    runs(spark).filter(col("runId") === runId)

  def exists(spark: SparkSession, runId: String): Boolean =
    !get(spark, runId).isEmpty

  /** Remove a run. BOTH the victim lookup and the rewrite touch ONLY the
    * dataset partition(s) containing the run: the runId→dataset sidecar
    * index (or the caller's `datasetHint`) names the candidate
    * partitions, each candidate is confirmed with a single
    * partition-directory read, and only confirmed partitions are
    * rewritten — at millions of stored runs a delete reads one dataset's
    * directory, never the whole store. Falls back to a full scan only
    * when the index has no entry (older store / hand-wiped index). */
  def delete(spark: SparkSession, runId: String,
      datasetHint: Option[String] = None): Boolean = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val idx = indexDir(runId)
    val fromIndex = datasetHint.isEmpty && fs.exists(idx)
    val candidates: Seq[String] = datasetHint match {
      case Some(ds) => Seq(ds)
      case None if fromIndex =>
        fs.listStatus(idx).map(s => org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.unescapePathName(
            s.getPath.getName.stripPrefix("ds="))).toSeq
      case None =>
        runs(spark).filter(col("runId") === runId)
          .select("dataset").distinct().collect().map(_.getString(0)).toSeq
    }
    // confirm each candidate with a read scoped to its partition dir (a
    // stale index entry, double delete, or wrong hint must report false
    // without rewriting anything)
    def confirm(dss: Seq[String]): Seq[String] = dss.filter { ds =>
      val partDir = new Path(s"$root/${partDirName(ds)}")
      fs.exists(partDir) && !spark.read.parquet(partDir.toString)
        .filter(col("runId") === runId).isEmpty
    }
    val hitFromCandidates = confirm(candidates)
    // an index whose every entry failed confirmation may be PARTIAL, not
    // just stale (save() orders marker-then-append, but stores written
    // by an older version did the opposite and could crash in between):
    // distrust it and fall back to the full scan before reporting false.
    // Datasets the scan returns are confirmed by construction (they come
    // from the run's own rows) — no per-partition re-read needed.
    val hitDs =
      if (hitFromCandidates.isEmpty && fromIndex)
        runs(spark).filter(col("runId") === runId)
          .select("dataset").distinct().collect().map(_.getString(0)).toSeq
      else hitFromCandidates
    if (hitDs.nonEmpty)
      rewriteScoped(spark, hitDs, _ => col("runId") =!= runId)
    // retire index markers: every dataset just rewritten, plus — when the
    // candidates came from the index itself — stale entries that failed
    // confirmation. A WRONG datasetHint must leave the index untouched,
    // or it would degrade the run's later (correct) delete to a scan and
    // orphan markers for datasets the hint never covered.
    val retire = if (fromIndex) (candidates ++ hitDs).distinct else hitDs
    retire.foreach(ds => fs.delete(indexMarker(runId, ds), false))
    if (fs.exists(idx) && fs.listStatus(idx).isEmpty) fs.delete(idx, true)
    hitDs.nonEmpty
  }

  /** Retention policy (reference `stores/retention/`): keep at most
    * `keepLastRuns` newest runs per dataset and/or drop runs older than
    * `maxAgeMs` relative to `nowTs`. Returns the number of runs
    * removed. The victim list is run-grain (tiny at any fleet size) and
    * the rewrite touches only the dataset partitions that actually lose
    * runs, each with its own per-dataset victim set. */
  def prune(spark: SparkSession, keepLastRuns: Option[Int] = None,
      maxAgeMs: Option[Long] = None,
      nowTs: Long = System.currentTimeMillis()): Int = {
    require(keepLastRuns.nonEmpty || maxAgeMs.nonEmpty,
      "prune needs keepLastRuns and/or maxAgeMs")
    val all = runs(spark)
    if (all.isEmpty) return 0
    import org.apache.spark.sql.expressions.Window
    val runGrain = all.select("dataset", "runId", "runTs").distinct()
    val ranked = runGrain.withColumn("__rk",
      row_number().over(Window.partitionBy(col("dataset"))
        .orderBy(col("runTs").desc, col("runId").desc)))
    val keepPred = keepLastRuns.map(n => col("__rk") <= n)
      .getOrElse(lit(true)) &&
      maxAgeMs.map(a => col("runTs") >= nowTs - a).getOrElse(lit(true))
    val victims = ranked.filter(!keepPred)
      .select("dataset", "runId").collect()
      .map(r => (r.getString(0), r.getString(1)))
    if (victims.nonEmpty) {
      val byDs = victims.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      rewriteScoped(spark, byDs.keys.toSeq,
        ds => !col("runId").isInCollection(byDs(ds)))
      // retire the victims' sidecar index markers (per dataset — a run
      // pruned from one dataset may survive in another)
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      victims.foreach { case (ds, rid) =>
        fs.delete(indexMarker(rid, ds), false)
      }
      victims.map(_._2).distinct.foreach { rid =>
        val d = indexDir(rid)
        if (fs.exists(d) && fs.listStatus(d).isEmpty) fs.delete(d, true)
      }
    }
    victims.map(_._2).distinct.length
  }

  /** Per-check diff between two stored runs (reference
    * `stores/versioning/store.py:552` diff + `_calculate_diff`): a
    * full-outer join on (dataset, validator) classifying every check as
    * new_failure / fixed / still_failing / still_passing / added /
    * removed, with violation-count deltas. "What changed since the last
    * run?" as an ordinary DataFrame — distributable at any run width. */
  def diffRuns(spark: SparkSession, runA: String, runB: String): DataFrame = {
    def side(runId: String, tag: String) = get(spark, runId).select(
      col("dataset"), col("validator"),
      col("passed").as(s"passed_$tag"),
      expr("aggregate(issues, 0L, (acc, i) -> acc + i.count)")
        .as(s"violations_$tag"))
    val joined = side(runA, "a")
      .join(side(runB, "b"), Seq("dataset", "validator"), "full_outer")
    joined.select(col("dataset"), col("validator"),
      col("passed_a"), col("passed_b"),
      coalesce(col("violations_a"), lit(0L)).as("violations_a"),
      coalesce(col("violations_b"), lit(0L)).as("violations_b"),
      when(col("passed_a").isNull, "added")
        .when(col("passed_b").isNull, "removed")
        .when(col("passed_a") && !col("passed_b"), "new_failure")
        .when(!col("passed_a") && col("passed_b"), "fixed")
        .when(!col("passed_a") && !col("passed_b"), "still_failing")
        .otherwise("still_passing").as("change"))
  }

  /** Rewrite ONLY the named dataset partitions, keeping rows matching
    * `keepFor(dataset)`, each with its own rename-aside swap. The
    * surviving rows are written DISTRIBUTED (filter → parquet write into
    * staging) — no driver collect — and untouched dataset partitions are
    * never read, so a delete/prune stays O(affected datasets) at
    * millions of stored runs. A partition whose rows are all removed is
    * deleted outright, and when the last partition goes the store root
    * goes with it (an empty partitioned dir has no schema-bearing files
    * and would poison every later read).
    *
    * Crash contract: a multi-partition delete/prune is NOT atomic across
    * partitions — a crash mid-loop leaves earlier partitions rewritten
    * and later ones untouched. That is safe for this store's operations
    * (delete/prune are idempotent; re-running converges), and a crash
    * INSIDE one partition's swap window leaves the full old copy at
    * `.results_retired/<partition>`, which the next rewriteScoped call
    * restores automatically if the live dir went missing. */
  private def rewriteScoped(spark: SparkSession, datasets: Seq[String],
      keepFor: String => org.apache.spark.sql.Column): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val stagingRoot = new Path(s"$workspace/store/.results_rewrite")
    val retiredRoot = new Path(s"$workspace/store/.results_retired")
    fs.delete(stagingRoot, true)
    // a retired copy with no surviving live dir is the recovery copy of
    // a swap that crashed between its two renames — restore it before
    // discarding leftovers (never silently drop the only live data)
    if (fs.exists(retiredRoot)) {
      fs.listStatus(retiredRoot).foreach { s =>
        val live = new Path(s"$root/${s.getPath.getName}")
        if (!fs.exists(live)) fs.rename(s.getPath, live)
      }
      fs.delete(retiredRoot, true)
    }
    datasets.foreach { ds =>
      val partName = partDirName(ds)
      val partDir = new Path(s"$root/$partName")
      if (fs.exists(partDir)) {
        // reading the partition dir directly drops the `dataset` column
        // (it lives in the dir name), which is exactly the file schema
        // the write-back must preserve
        val kept = spark.read.parquet(partDir.toString).filter(keepFor(ds))
        if (kept.isEmpty) {
          fs.delete(partDir, true)
        } else {
          val staging = new Path(stagingRoot, partName)
          val retired = new Path(retiredRoot, partName)
          kept.write.mode("overwrite").parquet(staging.toString)
          // Swap via rename-aside: the partition is only ever absent for
          // the instant between the two renames, and a crash in that
          // window leaves the full old copy at `retired` for manual
          // recovery instead of losing the partition.
          fs.mkdirs(retiredRoot)
          if (!fs.rename(partDir, retired))
            // an unchecked failure here would let the promote rename
            // nest the staging dir INSIDE the still-live partition,
            // silently duplicating rows — abort the swap instead
            throw new java.io.IOException(
              s"ResultStore: failed to retire $partDir for rewrite")
          if (!fs.rename(staging, partDir)) {
            fs.rename(retired, partDir)
            throw new java.io.IOException(
              s"ResultStore: failed to promote rewrite at $staging")
          }
          fs.delete(retired, true)
        }
      }
    }
    fs.delete(stagingRoot, true)
    fs.delete(retiredRoot, true)
    val rootPath = new Path(root)
    val anyLeft = fs.exists(rootPath) && fs.listStatus(rootPath)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("dataset="))
    if (!anyLeft) {
      fs.delete(rootPath, true)
      fs.delete(new Path(indexRoot), true)
    }
  }

  /** Hive-style partition dir name for a dataset value, escaped with
    * Spark's OWN partition-path escaping (so the scoped rewrite finds
    * the dir `partitionBy("dataset")` created even for names with
    * spaces/specials). */
  private def partDirName(ds: String): String =
    "dataset=" + org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.escapePathName(ds)
}

/** Expectation-suite store (reference `stores/expectations.py`:
  * ExpectationSuite persistence with versioning). Suites are stored in the
  * CLI's round-trippable spec grammar (`null:c;range:col:lo:hi;...`) as
  * versioned JSON records — small driver-side config artifacts, no Spark
  * coupling. `Cli.parseChecks` turns a loaded spec back into validators. */
final case class SuiteStore(workspace: String) {
  import java.nio.file.{Files, Paths}
  private def dir(name: String) = {
    // suite names come straight from CLI argv — refuse anything that
    // could escape the workspace (suite-save "../../etc" would otherwise
    // create, read, or DELETE files outside the store). Only genuine
    // traversal vectors are rejected, so names a pre-guard store wrote
    // (quotes, spaces, even backslashes — plain chars on POSIX) stay
    // readable, listable, and deletable.
    require(name.nonEmpty && name != "." && name != ".." &&
      !name.contains('/') && !name.contains(java.io.File.separatorChar),
      s"suite name must be a plain directory name, got '$name'")
    Paths.get(workspace, "store", "suites", name)
  }

  /** Save a new version of `name`; returns the version number (1-based). */
  def save(name: String, spec: String, createdTs: Long): Int = {
    Files.createDirectories(dir(name))
    val v = versions(name).lastOption.getOrElse(0) + 1
    val body = s"""{"name":${q(name)},"version":$v,"createdTs":$createdTs,""" +
      s""""spec":${q(spec)}}"""
    Files.writeString(dir(name).resolve(f"v$v%05d.json"), body)
    v
  }

  def versions(name: String): Seq[Int] =
    if (!Files.isDirectory(dir(name))) Nil
    else {
      val s = Files.list(dir(name))
      try {
        val it = s.iterator()
        val b = Seq.newBuilder[Int]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.startsWith("v") && n.endsWith(".json"))
            b += n.substring(1, n.length - 5).toInt
        }
        b.result().sorted
      } finally s.close()
    }

  def list(): Seq[String] = {
    val p = Paths.get(workspace, "store", "suites")
    if (!Files.isDirectory(p)) Nil
    else {
      val s = Files.list(p)
      try {
        val it = s.iterator()
        val b = Seq.newBuilder[String]
        while (it.hasNext) b += it.next().getFileName.toString
        b.result().sorted
      } finally s.close()
    }
  }

  /** Load the spec string of `name` at `version` (default: latest). */
  def get(name: String, version: Option[Int] = None): Option[String] = {
    val vs = versions(name)
    val v = version.orElse(vs.lastOption)
    v.filter(vs.contains).map { ver =>
      val body = Files.readString(dir(name).resolve(f"v$ver%05d.json"))
      // proper JSON parse (Jackson ships on Spark's classpath) — a regex
      // extraction would silently mis-read a spec containing the literal
      // text "spec": or a reordered writer
      val node = SuiteStore.mapper.readTree(body)
      Option(node.get("spec")).map(_.asText()).getOrElse(body)
    }
  }

  def delete(name: String): Boolean = {
    if (!Files.isDirectory(dir(name))) false
    else {
      val s = Files.list(dir(name))
      try {
        val it = s.iterator()
        while (it.hasNext) Files.delete(it.next())
      } finally s.close()
      Files.delete(dir(name)); true
    }
  }

  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}

object SuiteStore {
  private[stores] val mapper =
    new com.fasterxml.jackson.databind.ObjectMapper
}
