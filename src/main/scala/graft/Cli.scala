package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core._
import graft.validators._
import graft.profiler._
import graft.reporters.Reporters

/** CLI entrypoint (reference: truthound Typer CLI, `cli.py:22-117` —
  * `truthound check|profile|scan|compare ...`). spark-submit-able:
  *
  *   graft.Cli check   <path> [--checks null:c1,c2;range:c:0:100] [--format json|md|html|console]
  *   graft.Cli profile <path>
  *   graft.Cli learn   <path> <baseline-out>
  *   graft.Cli check-auto <path> <baseline>      (suite synthesized from baseline)
  *   graft.Cli scan    <path>                    (PII sweep)
  *   graft.Cli compare <pathA> <pathB> <column>  (drift report)
  *
  * Exit code 0 = all checks passed, 1 = issues found, 2 = usage/error.
  */
object Cli {
  def main(args: Array[String]): Unit = {
    if (args.isEmpty) { usage(); sys.exit(2) }
    // session-free commands answer instantly — no SparkSession startup
    args.toList match {
      case "list-validators" :: _ =>
        ValidatorRegistry.registered.foreach(println); sys.exit(0)
      case _ => ()
    }
    val spark = graft.ops.Exprs.sessionDefaults(SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val code =
      try dispatch(spark, args.toList)
      catch { case e: Exception =>
        System.err.println(s"error: ${e.getMessage}"); 2 }
    spark.stop()
    sys.exit(code)
  }

  private def load(spark: SparkSession, path: String): DataFrame =
    if (path.endsWith(".csv"))
      spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    else if (path.endsWith(".json") || path.endsWith(".ndjson"))
      spark.read.json(path)
    else spark.read.parquet(path)

  private[graft] def dispatch(spark: SparkSession, args: List[String]): Int =
    args match {
      case "check" :: path :: rest =>
        val checks = (argOf(rest, "--checks"), argOf(rest, "--suite")) match {
          case (Some(_), Some(_)) => throw new IllegalArgumentException(
            "--checks and --suite are mutually exclusive (one silently " +
              "shadowing the other would validate less than intended)")
          case (Some(spec), _) => parseChecks(spec)
          case (None, Some(name)) =>
            // run a stored expectation suite (reference
            // stores/expectations.py workflow): --workspace locates the
            // store, --suite-version pins a version (default latest)
            val ws = argOf(rest, "--workspace").getOrElse(".")
            graft.stores.SuiteStore(ws)
              .get(name, argOf(rest, "--suite-version").map(_.toInt))
              .map(parseChecks).getOrElse(throw new IllegalArgumentException(
                s"no stored suite '$name' in workspace $ws"))
          case _ => defaultChecks(spark, path)
        }
        val result = SuiteRunner.run(load(spark, path), checks,
          SuiteRunner.Config(datasetName = path))
        emit(result, argOf(rest, "--format").getOrElse("console"))
        if (result.passed) 0 else 1

      case "profile" :: path :: _ =>
        val b = Learn.learn(load(spark, path))
        println(f"rows: ${b.rowCount}")
        b.columns.foreach { c =>
          println(f"${c.name}%-20s ${c.dtype}%-10s nulls=${c.nullCount}%-8d " +
            f"distinct=${c.distinctCount}%-8d " +
            c.mean.map(m => f"mean=$m%.4f ").getOrElse("") +
            c.min.map(v => s"min=$v ").getOrElse("") +
            c.max.map(v => s"max=$v").getOrElse(""))
        }
        0

      case "learn" :: path :: out :: _ =>
        Learn.save(spark, Learn.learn(load(spark, path)), out)
        println(s"baseline written to $out"); 0

      case "check-auto" :: path :: baselinePath :: rest =>
        val baseline = Learn.load(spark, baselinePath)
        val result = SuiteRunner.run(load(spark, path),
          TableSchemaCheck(baseline) +: AutoSuite.build(baseline),
          SuiteRunner.Config(datasetName = path))
        emit(result, argOf(rest, "--format").getOrElse("console"))
        if (result.passed) 0 else 1

      case "scan" :: path :: _ =>
        val report = Pii.scan(load(spark, path))
        if (report.flagged.isEmpty) { println("no PII detected"); 0 }
        else {
          report.flagged.foreach(h =>
            println(f"${h.column}%-20s ${h.pattern}%-14s ${h.count}%8d hits " +
              f"(${h.ratio * 100}%.2f%%)"))
          1
        }

      case "compare" :: a :: b :: column :: _ =>
        // per-dtype dispatch, reference th.compare() style: categorical
        // columns get frequency-table statistics, numeric get CDF/binned
        val (da, db) = (load(spark, a), load(spark, b))
        val isNumeric = da.schema(column).dataType
          .isInstanceOf[org.apache.spark.sql.types.NumericType]
        if (!isNumeric) {
          val cells = graft.drift.Drift.categoricalPq(da, db, column)
          val pq = cells.zipWithIndex.map { case ((_, p, q, _, _), i) => (i, p, q) }
          println(f"chi2        = ${graft.drift.Drift.chiSquare(cells)}%.6f")
          println(f"js          = ${graft.drift.Drift.jsDivergence(pq)}%.6f")
          println(f"tv          = ${graft.drift.Drift.totalVariation(pq)}%.6f")
        } else {
          val stats = da.selectExpr(s"min($column) as lo", s"max($column) as hi").head()
          val (lo, hi) = (stats.getAs[Any]("lo").toString.toDouble,
            stats.getAs[Any]("hi").toString.toDouble)
          val pq = graft.drift.Drift.binnedPq(da, db, column, 20, lo, hi)
          println(f"psi         = ${graft.drift.Drift.psi(pq)}%.6f")
          println(f"js          = ${graft.drift.Drift.jsDivergence(pq)}%.6f")
          println(f"tv          = ${graft.drift.Drift.totalVariation(pq)}%.6f")
          println(f"hellinger   = ${graft.drift.Drift.hellinger(pq)}%.6f")
          println(f"ks          = ${graft.drift.Drift.ksStatistic(da, db, column)}%.6f")
          println(f"ks_binned   = ${graft.drift.Drift.ksBinned(da, db, column, 20, lo, hi)}%.6f")
          println(f"wasserstein = ${graft.drift.Drift.wasserstein(da, db, column)}%.6f")
        }
        0

      case "mask" :: path :: out :: rest =>
        // reference `truthound mask`: scan, mask every flagged column by
        // strategy, write the masked frame
        val df = load(spark, path)
        val report = Pii.scan(df)
        val strategy = argOf(rest, "--strategy").getOrElse("redact")
        Pii.maskFlagged(df, report, strategy)
          .write.mode("overwrite").parquet(out)
        println(s"masked ${report.flagged.map(_.column).distinct.size} " +
          s"column(s) [$strategy] -> $out")
        0

      case "schema-diff" :: path :: baselinePath :: _ =>
        // reference `truthound schema-diff`: learned baseline vs current
        val baseline = Learn.load(spark, baselinePath)
        val result = SuiteRunner.run(load(spark, path),
          Seq(TableSchemaCheck(baseline)),
          SuiteRunner.Config(datasetName = path))
        val issues = result.checks.flatMap(_.issues)
        if (issues.isEmpty) { println("schema matches baseline"); 0 }
        else {
          issues.foreach(i =>
            println(f"${i.issueType}%-24s ${i.column}%-20s " +
              s"expected=${i.expected} actual=${i.actual}"))
          1
        }

      case "generate-suite" :: path :: _ =>
        // reference `truthound generate-suite`: emit the auto-suite in
        // EXACTLY the grammar `check --checks` accepts, so the output
        // round-trips: graft.Cli check <path> --checks "$(generate-suite)"
        val baseline = Learn.learn(load(spark, path))
        val specs = AutoSuite.decisions(baseline).map {
          case AutoSuite.Decision(c, "null") =>
            val r = baseline(c).nullRatio
            if (r > 0) f"null:$c:$r%.6f" else s"null:$c"
          case AutoSuite.Decision(c, "range") =>
            val b = baseline(c)
            s"range:$c:${b.min.getOrElse("0")}:${b.max.getOrElse("0")}"
          case AutoSuite.Decision(c, "type")   => s"type:$c:0.0"
          case AutoSuite.Decision(c, "unique") => s"unique:$c"
          case AutoSuite.Decision(c, other) =>
            throw new IllegalStateException(s"unmapped decision $other")
        }
        println(specs.mkString(";"))
        0

      case "check-incremental" :: path :: ws :: dataset :: wmCol :: rest =>
        // watermark-delta validation: only rows past the store's last
        // high-water mark are scanned. The mark advances whether the run
        // passes or fails (each slice is scanned once; failures surface
        // via the stored run + exit code) unless --no-advance-on-failure
        // keeps the old mark so a failed delta is re-scanned next run.
        import org.apache.spark.sql.functions.{col, unix_micros}
        val df = load(spark, path)
        // Both timestamp flavors map to epoch micros (NTZ via the UTC-pinned
        // session cast) so the stored high-water mark keeps one unit contract
        // regardless of the source's physical encoding.
        val wm = df.schema(wmCol).dataType match {
          case _: org.apache.spark.sql.types.TimestampType =>
            unix_micros(col(wmCol))
          case _: org.apache.spark.sql.types.TimestampNTZType =>
            unix_micros(col(wmCol).cast("timestamp"))
          case _ => col(wmCol)
        }
        val checks = argOf(rest, "--checks")
          .map(parseChecks).getOrElse(defaultChecks(spark, path))
        val inc = graft.stores.Incremental.run(spark,
          graft.stores.ResultStore(ws), df, wm, checks, dataset,
          runId = java.util.UUID.randomUUID().toString,
          runTs = System.currentTimeMillis(),
          advanceOnFailure = !rest.contains("--no-advance-on-failure"))
        println(s"delta rows: ${inc.deltaRows} " +
          s"(watermark ${inc.fromWatermark.getOrElse("-")} -> " +
          s"${inc.toWatermark.getOrElse("-")})")
        emit(inc.result, argOf(rest, "--format").getOrElse("console"))
        if (inc.result.passed) 0 else 1

      case "history" :: ws :: dataset :: _ =>
        val trend = graft.stores.ResultStore(ws).metricTrend(spark, dataset)
          .collect()
        if (trend.isEmpty) { println(s"no runs stored for $dataset"); 0 }
        else {
          trend.foreach(r => println(
            f"${r.getAs[String]("runId")}%-38s ts=${r.getAs[Long]("runTs")} " +
            f"rows=${r.getAs[Long]("rowCount")}%-10d " +
            f"failed=${r.getAs[Long]("failedChecks")}%-4d " +
            f"violations=${r.getAs[Long]("violations")}"))
          0
        }

      case "prune" :: ws :: rest =>
        val keep = argOf(rest, "--keep").map(_.toInt)
        val maxAge = argOf(rest, "--max-age-ms").map(_.toLong)
        val n = graft.stores.ResultStore(ws).prune(spark, keep, maxAge)
        println(s"removed $n run(s)"); 0

      case "suite-save" :: ws :: name :: rest =>
        argOf(rest, "--checks") match {
          case None =>
            System.err.println("suite-save needs --checks \"<spec>\""); 2
          case Some(spec) =>
            parseChecks(spec) // reject an unexecutable spec up front
            val v = graft.stores.SuiteStore(ws)
              .save(name, spec, System.currentTimeMillis())
            println(s"saved suite '$name' v$v"); 0
        }

      case "suite-list" :: ws :: _ =>
        val ss = graft.stores.SuiteStore(ws)
        val names = ss.list()
        if (names.isEmpty) println("no suites stored")
        else names.foreach(n =>
          println(f"$n%-32s versions=${ss.versions(n).mkString(",")}"))
        0

      case "suite-show" :: ws :: name :: rest =>
        graft.stores.SuiteStore(ws)
          .get(name, argOf(rest, "--version").map(_.toInt)) match {
          case Some(spec) => println(spec); 0
          case None => System.err.println(s"no suite '$name'"); 2
        }

      case "delete" :: ws :: runId :: rest =>
        // --dataset routes the delete straight to one partition; without
        // it the store's runId->dataset index (or a full scan on very old
        // stores) finds the victim
        val hint = argOf(rest, "--dataset")
        val ok = graft.stores.ResultStore(ws).delete(spark, runId, hint)
        if (ok) { println(s"deleted $runId"); 0 }
        else { println(s"run $runId not found"); 2 }

      case "diff" :: ws :: runA :: runB :: _ =>
        val d = graft.stores.ResultStore(ws).diffRuns(spark, runA, runB)
          .orderBy(org.apache.spark.sql.functions.col("validator"))
          .collect()
        if (d.isEmpty) { println("no stored checks for either run"); 2 }
        else {
          d.foreach(r => println(
            f"${r.getAs[String]("change")}%-14s " +
            f"${r.getAs[String]("validator")}%-36s " +
            f"violations ${r.getAs[Long]("violations_a")}%6d -> " +
            f"${r.getAs[Long]("violations_b")}%-6d"))
          val changed = d.exists(r => Set("new_failure", "still_failing")
            .contains(r.getAs[String]("change")))
          if (changed) 1 else 0
        }

      case _ => usage(); 2
    }

  /** `--checks "null:c1,c2;range:col:0:100;unique:id;format:email_col:email"` */
  /** Public so stored suite specs (stores.SuiteStore) round-trip back into
    * executable validators. */
  private[graft] def parseChecks(spec: String): Seq[Validator] =
    spec.split(";").toSeq.map(_.trim).filter(_.nonEmpty).map { s =>
      s.split(":").toList match {
        case "null" :: cols :: Nil =>
          ValidatorRegistry.create("null", Map("columns" -> cols))
        case "null" :: cols :: ratio :: Nil =>
          ValidatorRegistry.create("null",
            Map("columns" -> cols, "max_null_ratio" -> ratio))
        case "unique" :: cols :: Nil =>
          ValidatorRegistry.create("unique", Map("columns" -> cols))
        case "range" :: c :: lo :: hi :: Nil =>
          ValidatorRegistry.create("range", Map("column" -> c, "min" -> lo, "max" -> hi))
        case "outlier" :: c :: Nil =>
          ValidatorRegistry.create("outlier", Map("column" -> c))
        case "format" :: c :: f :: Nil =>
          ValidatorRegistry.create("format", Map("column" -> c, "format" -> f))
        case "type" :: c :: Nil =>
          ValidatorRegistry.create("type", Map("column" -> c))
        case "type" :: c :: minRatio :: Nil =>
          ValidatorRegistry.create("type",
            Map("column" -> c, "min_ratio" -> minRatio))
        case other =>
          throw new IllegalArgumentException(s"bad check spec: $s")
      }
    }

  /** Zero-config default: learn a quick baseline and auto-build the suite
    * (th.check with validators=None semantics). */
  private def defaultChecks(spark: SparkSession, path: String): Seq[Validator] =
    AutoSuite.build(Learn.learn(load(spark, path)))

  private def emit(r: ValidationRunResult, format: String): Unit =
    format match {
      case "json"    => println(Reporters.json(r))
      case "md"      => println(Reporters.markdown(r))
      case "html"    => println(Reporters.html(r))
      case _         => print(Reporters.console(r))
    }

  private def argOf(args: List[String], key: String): Option[String] =
    args.sliding(2).collectFirst { case `key` :: v :: Nil => v }

  private def usage(): Unit = System.err.println(
    """usage: graft.Cli <command> ...
      |  check <path> [--checks spec] [--format console|json|md|html]
      |  check-auto <path> <baseline> [--format ...]
      |  profile <path>
      |  learn <path> <baseline-out>
      |  scan <path>
      |  mask <path> <out> [--strategy redact|hash|partial]
      |  schema-diff <path> <baseline>
      |  generate-suite <path>
      |  list-validators
      |  compare <pathA> <pathB> <column>
      |  check-incremental <path> <workspace> <dataset> <wmCol> [--checks spec]
      |  history <workspace> <dataset>
      |  prune <workspace> [--keep N] [--max-age-ms M]
      |  delete <workspace> <runId> [--dataset NAME]
      |  diff <workspace> <runA> <runB>
      |  suite-save <workspace> <name> --checks "<spec>"
      |  suite-list <workspace>
      |  suite-show <workspace> <name> [--version N]
      |  check <path> --suite <name> [--workspace W] [--suite-version N]""".stripMargin)
}
