package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reusable aggregate-expression builders shared by the validator catalog
  * and the query surface. Everything here is a plain Catalyst `Column`, so
  * any combination fuses into one whole-stage-codegen'd aggregation pass
  * with map-side partial aggregation — the only shape that survives 100 TB.
  */
object Exprs {
  /** count of rows where `p` (null-safe: null predicate counts as false). */
  def cnt(p: Column): Column = count(when(p, 1))

  def nullCount(c: String): Column = cnt(col(c).isNull)
  def emptyCount(c: String): Column = cnt(trim(col(c)) === "")
  def nanCount(c: String): Column = cnt(isnan(col(c)))

  def outOfRange(c: String, lo: Double, hi: Double): Column =
    cnt(col(c) < lo || col(c) > hi)
  def belowCount(c: String, lo: Double): Column = cnt(col(c) < lo)
  def notInSet(c: String, values: Seq[String]): Column =
    cnt(!col(c).isin(values: _*) && col(c).isNotNull)

  /** duplicate rows over a (composite) key = total - distinct. The struct
    * wrapper keeps NULL-keyed rows in the distinct count. */
  def duplicateRows(keyCols: Seq[String]): Column =
    count(lit(1)) - count_distinct(struct(keyCols.map(col): _*))

  def regexMissCount(c: String, pattern: String): Column =
    cnt(col(c).isNotNull && !col(c).rlike(pattern))

  /** Exact-vs-approx percentile routing for direct query bodies — the
    * same distinct-count gate [[graft.core.SizeGate]] applies inside the
    * validator family. One cheap HLL probe on `column` decides whether
    * exact `percentile`'s O(distinct) value buffer is affordable (the
    * multi-GiB GCLocker allocations observed at sf100 come from exactly
    * this aggregate); over-budget columns route to the t-digest
    * `percentile_approx`. Returns a builder taking (sqlExpr, p) so
    * multi-quantile callers — including derived expressions like
    * `abs(x - med)`, whose distinct count never exceeds the base
    * column's — pay the probe once. The gate never trips below ~8M
    * distinct, so oracle-scale results stay bit-exact. */
  def gatedPct(df: DataFrame, column: String,
      budget: Long = graft.core.SizeGate.DefaultMaxExactDistinct)
      : (String, Double) => Column = {
    val exact = budget <= 0 ||
      df.agg(approx_count_distinct(col(column), 0.05)).head()
        .getLong(0) <= budget
    (sql, p) =>
      if (exact) expr(s"percentile($sql, $p)")
      else expr(s"percentile_approx($sql, $p, 10000)")
  }

  /** Shannon entropy (nats) of a categorical column from its group counts;
    * call on the OUTPUT of df.groupBy(c).count() — shuffle is O(distinct). */
  def entropyFromCounts(countCol: String = "cnt"): Column = {
    val total = sum(col(countCol)).cast("double")
    -sum(col(countCol) * log(col(countCol)))./(total) + log(total)
  }

  /** Normalizes an event-time column to Spark's session-tz TimestampType
    * no matter which physical encoding the fixture generation happened to
    * use. Fixtures have shipped `ts` three ways across driver versions:
    *
    *   - parquet `timestamp[ns]` → read as LongType nanos under the
    *     session's `spark.sql.legacy.parquet.nanosAsLong=true`
    *     (nanos are unsupported by the vectorized reader);
    *   - parquet `timestamp[us]` (no tz) → read as TIMESTAMP_NTZ, which
    *     `unix_micros`/`window` reject or mishandle;
    *   - parquet `timestamp[us, tz=UTC]` → already TimestampType.
    *
    * All three converge to identical micros here (sessions pin
    * `spark.sql.session.timeZone=UTC`, so the NTZ cast is a pure
    * reinterpretation). Every consumer — the batch loader, the streaming
    * specs, the scale-fixture generator — must route through this one
    * function so they can never diverge again. */
  def normalizeTs(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.schema.fields.find(_.name == tsCol).map(_.dataType) match {
      case Some(org.apache.spark.sql.types.LongType) =>
        df.withColumn(tsCol, expr(s"timestamp_micros($tsCol div 1000)"))
      case Some(org.apache.spark.sql.types.TimestampNTZType) =>
        df.withColumn(tsCol, col(tsCol).cast("timestamp"))
      case _ => df
    }

  /** Loads a test table. Filter/projection pushdown reaches the parquet
    * scan because this returns the raw relation untouched — except
    * `events`, whose `ts` is normalized by [[normalizeTs]] (a projection
    * over the scan; pushdown below it is unaffected). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeTs(df) else df
  }

  /** A scratch directory deleted recursively at JVM exit — for
    * round-trip queries and the session warehouse, so repeated bench
    * sweeps (135 queries × min-of-N × several scale factors) don't
    * accumulate unbounded data under /tmp. */
  def scratchDir(prefix: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      import java.nio.file.{Files, Path}
      import java.util.Comparator
      try Files.walk(dir).sorted(Comparator.reverseOrder[Path]())
        .forEach(p => { Files.deleteIfExists(p); () })
      catch { case _: Exception => () } // best-effort cleanup
    }))
    dir.toString
  }

  /** Session settings every graft entrypoint applies. The warehouse is
    * ONE fresh temp dir per JVM (lazy val — getOrCreate callers must
    * not each mint a stray directory): managed tables
    * (Bucketing.writeBucketed) never collide with a PREVIOUS run's
    * leftover location — the in-memory catalog forgets tables across
    * JVMs but the default cwd-anchored warehouse directory would
    * survive, and saveAsTable then fails with LOCATION_ALREADY_EXISTS
    * on a name the new catalog has never seen. Deleted at JVM exit. */
  private lazy val jvmWarehouse: String = scratchDir("graft_warehouse")
  def sessionDefaults(b: SparkSession.Builder): SparkSession.Builder =
    b.config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", jvmWarehouse)
      // AQE sort-merge -> shuffled-hash rewrite threshold (guide §3.1):
      // when every post-shuffle build-side partition is under this size
      // AQE drops the sort on BOTH join sides at runtime. 0 = off (the
      // Spark default). Env-overridable for A/B; the checked-in default
      // is the measured choice (see OPTIMIZATION_r15.md).
      .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
        sys.env.getOrElse("SPARK_GRAFT_SHJ_LOCALMAP", "0"))

  /** [[sessionDefaults]] plus a shuffle width sized from the data
    * directory — the local analogue of sizing reduce width to the
    * cluster/data on a real deployment. AQE's initialPartitionNum is
    * clamp(on-disk bytes / 64 MB, 32, 512) and AQE coalesces DOWN to
    * the ~64 MB advisory size at runtime, so fixtures at and below
    * sf10 keep the exact 32-wide plans every anchor was recorded at
    * (bytes/64MB < 32 there), while sf100's 600M-row sort-joins get
    * ~250-way reduces whose per-task sort state fits memory instead
    * of external-sorting 19M rows per task. Measurement notes
    * (BASELINE.md round-9): a STATIC 256 tripled the many-small-stage
    * dedup queries at sf0.1 (width must follow the data, hence this
    * form); at sf100 the first A/B read q105 44.8 -> 34.5 s and q03
    * 56.5 -> 28.3 s, but an interleaved same-JVM replication put the
    * width effect inside the host's ±30% noise envelope — the sized
    * width is kept for the principled reason (a fixed 32-wide reduce
    * cannot be right at 1000x the data), with local effect recorded
    * as neutral-to-positive, not as a measured win. */
  def sizedDefaults(b: SparkSession.Builder, dataDir: String)
      : SparkSession.Builder = {
    val bytes =
      try {
        val p = java.nio.file.Paths.get(dataDir)
        if (java.nio.file.Files.isDirectory(p)) {
          val s = java.nio.file.Files.walk(p)
          try s.filter(q => java.nio.file.Files.isRegularFile(q))
            .mapToLong(q => java.nio.file.Files.size(q)).sum
          finally s.close()
        } else 0L
      } catch { case _: Throwable => 0L }
    val parts = math.min(512L, math.max(32L, bytes / (64L << 20)))
    sessionDefaults(b).config(
      "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
      parts.toString)
  }

  /** Driver-side GC nudge used by the band-/slice-serial operators right
    * after a `localCheckpoint` cuts a pass's plan: the pass's exchange
    * becomes unreachable and the nudge lets `ContextCleaner` reap its
    * shuffle files before the next pass writes, which is what bounds peak
    * scratch disk in those modes. On a shared driver JVM a forced full GC
    * stalls every concurrent query, and `-XX:+DisableExplicitGC` silently
    * turns `System.gc()` into a no-op (defeating the reclamation) — so the
    * nudge is conf-gated via `spark.graft.gcNudge`:
    *
    *   - `auto` (default): fire only when the CALLER is in the
    *     disk-pressure regime the nudge exists for (`pressure = true` —
    *     the serial operators pass their own exceeds-scratch-threshold
    *     estimate). A serial pass forced at small scale (a correctness
    *     pin, a unit test) pays zero forced GCs.
    *   - `true`: fire on every serial pass regardless of the estimate
    *     (the r11/r12 behavior — the conservative choice on a dedicated
    *     driver whose scratch is tighter than the estimator assumes).
    *   - `false`: never; rely on `spark.cleaner.periodicGC.interval`
    *     (default 30 min — lower it when disabling the nudge). */
  def gcNudge(spark: SparkSession, pressure: Boolean = true): Unit =
    spark.conf.get("spark.graft.gcNudge", "auto") match {
      case "auto" => if (pressure) System.gc()
      case other  => if (other.toBoolean) System.gc()
    }

  /** Silence known-benign ERROR-level logging that would otherwise land in
    * the process stdout the bench driver tail-parses. JDBCScanBuilder logs a
    * full Derby stack trace at ERROR when an aggregate pushdown attempt is
    * rejected by the dialect (it falls back to a plain scan and the query
    * still succeeds) — that is a planning fallback, not a failure. */
  def quietNoisyLoggers(): Unit = {
    import org.apache.logging.log4j.Level
    import org.apache.logging.log4j.core.config.Configurator
    Configurator.setLevel(
      "org.apache.spark.sql.execution.datasources.v2.jdbc.JDBCScanBuilder",
      Level.OFF)
  }
}
