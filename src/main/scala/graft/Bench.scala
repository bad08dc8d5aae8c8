package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  *
  * Timing protocol: one untimed warm-up action on lineitem to absorb
  * JVM/codegen/session startup (the reference benchmarks also measure
  * warm runs — `benchmark/runner.py` warmup+measured iterations), then
  * each query timed once end-to-end (plan + execute + consume via count). */
object Bench {
  /** The r12 driver host's single-core `calibrate(1)` seconds — the
    * reference point of BASELINE.md's "calib-anchored comparison
    * protocol" section: `calib_norm = total * (anchor / calib1)` maps
    * any sweep's total onto that host's speed axis so cross-round
    * totals compare on one scale. */
  val Calib1AnchorSec = 0.76

  /** Timed min-of-N sweep over a query catalog. A query that throws maps
    * to `Seq(-1.0)` and its name lands in the second return slot —
    * extracted from main() so the broken-query-turns-the-sweep-red
    * contract is unit-testable (BenchSpec) instead of only observable in
    * a committed driver artifact, which is how six -1.0 rows survived
    * two rounds unnoticed. */
  def sweep(spark: SparkSession, sfDir: String,
            queries: Seq[(String, (SparkSession, String) => DataFrame)],
            onFail: (String, Throwable) => Unit = (_, _) => ())
      : (Seq[(String, Seq[Double])], Seq[String]) = {
    val results = queries.sortBy(_._1).map { case (name, fn) =>
      def timed(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      // r03 postmortem: lexically adjacent tiny queries read 2-4x slow in
      // one driver run (host-contention window). When the two timings
      // disagree by >50%, one extra run tightens the min without inflating
      // the protocol for stable queries.
      val runs = try {
        val t1 = timed(); val t2 = timed()
        if (math.abs(t1 - t2) > 0.5 * math.min(t1, t2)) Seq(t1, t2, timed())
        else Seq(t1, t2)
      } catch { case e: Throwable => onFail(name, e); Seq(-1.0) }
      name -> runs
    }
    (results, results.filter(_._2.min < 0).map(_._1))
  }

  /** Host-speed calibration: a fixed, deterministic CPU-bound loop whose
    * wall time depends only on per-core speed under the CURRENT host load.
    * The `contention` stamp below is the median of each query's max/min
    * ratio across its own runs — it catches run-to-run VARIANCE but is
    * blind to a UNIFORM slowdown (a tenant pegging cores through both
    * runs inflates every min while every ratio stays ~1; the r11 driver
    * sweep read 81 s against a 48.5 s same-code ladder with an innocent
    * 1.35 stamp). This loop is the cross-round rescaling anchor: compare
    * `calib` between two sweeps before comparing their totals.
    * `threads = 1` measures single-core speed; `threads = n` saturates
    * the box and exposes whole-machine contention. */
  def calibrate(threads: Int): Double = {
    val iters = 400000000L
    def spin(): Long = {
      var x = 0x9E3779B97F4A7C15L; var i = 0L
      while (i < iters) {
        x = x * 6364136223846793005L + 1442695040888963407L
        x ^= (x >>> 33); i += 1
      }
      x
    }
    val t0 = System.nanoTime()
    val ts = (1 until threads).map { _ =>
      val t = new Thread(() => { val r = spin(); if (r == 42L) print("") })
      t.start(); t
    }
    val r = spin(); if (r == 42L) print("") // defeat dead-code elimination
    ts.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.ops.Exprs.sizedDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")),
      sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Exprs.quietNoisyLoggers()

    // warm-up: JVM + codegen + file listing, untimed
    graft.ops.Exprs.table(spark, sfDir, "lineitem").count()

    // host-speed stamps before and after the sweep (see calibrate's doc):
    // calib1 = single-core, calibN = all-cores saturated. JIT-warm the
    // loop once untimed so the stamps measure the host, not C2.
    val nCores = Runtime.getRuntime.availableProcessors()
    calibrate(1)
    val calib1Pre = calibrate(1)
    val calibNPre = calibrate(nCores)

    // warm protocol matching the reference harness (benchmark/runner.py:
    // warmup + measured iterations): first execution warms plan/codegen
    // caches, second is measured
    // Both executions are timed and the MIN is reported: run 1 pays
    // plan/codegen warm-up, run 2 is the conventional warm number, and
    // taking the min absorbs one-off GC/host-contention spikes (the r02
    // driver run recorded 5.4 s for a query that warm-times at 0.7 s).
    // Loud, immediate failure evidence on stderr (stdout stays JSON-only
    // for the driver's tail-parse): the r7/r8 postmortem found six -1.0
    // rows sitting unnoticed in two committed sweeps because nothing
    // ever surfaced WHICH queries broke or WHY.
    val (results, failed) = sweep(spark, sfDir, SparkEntry.queries.toSeq,
      onFail = (name, e) =>
        System.err.println(s"[bench] FAILED $name: ${e.getClass.getName}: " +
          s"${String.valueOf(e.getMessage).takeWhile(_ != '\n')}"))
    val total = results.map(_._2.min).filter(_ >= 0).sum
    val calib1Post = calibrate(1)
    val calibNPost = calibrate(nCores)
    // ALL numeric JSON rendering goes through Locale.ROOT: the f""
    // interpolator is default-locale-dependent and would emit comma
    // decimals (invalid JSON) on a comma-decimal locale.
    def num(v: Double, decimals: Int): String =
      String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))
    // Host-contention forensics, machine-readable (four rounds of driver
    // runs read 1.2x a quiet-machine anchor with identical code; the
    // judge had to separate contention from regression by hand): each
    // query's max/min ratio across its timed runs, and the suite-level
    // median of those ratios. A quiet run medians ~1.0x; a contended one
    // inflates most ratios uniformly — so `contention` close to 1 says
    // the min-of-N numbers are trustworthy, and a high value says
    // re-measure before calling a regression.
    val ratios = results.map(_._2).filter(_.min > 0)
      .map(r => r.max / r.min).sorted
    val contention =
      if (ratios.isEmpty) 1.0
      else if (ratios.size % 2 == 1) ratios(ratios.size / 2)
      else (ratios(ratios.size / 2 - 1) + ratios(ratios.size / 2)) / 2
    // Full-name per-query detail goes to BENCH.json (unbounded length):
    // min-of-N plus each query's run spread.
    val qsFull = results.map { case (k, v) => "\"" + k + "\":" + num(v.min, 4) }
      .mkString("{", ",", "}")
    val spreadFull = results.map { case (k, v) =>
      "\"" + k + "\":[" + v.map(t => num(t, 4)).mkString(",") + "]" }
      .mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // Calib-normalized total (BASELINE.md "calib-anchored comparison
    // protocol"): suite seconds rescaled to the r12 driver host's
    // single-core speed (calib1 = 0.76 s), so cross-round totals
    // compare on one axis. A slower/loaded host has a larger calib1
    // and its total scales DOWN proportionally.
    val calibNorm = {
      val mean = (calib1Pre + calib1Post) / 2
      // guard: a stubbed/clock-glitched calibration recording 0.0 would
      // otherwise emit Infinity, which is not valid JSON
      if (mean > 0) Some(total * (Calib1AnchorSec / mean)) else None
    }
    val calibJson = s""""calib1":[${num(calib1Pre, 2)},${num(calib1Post, 2)}],"calibN":[${num(calibNPre, 2)},${num(calibNPost, 2)}],"calib_norm":${calibNorm.map(num(_, 1)).getOrElse("null")}"""
    val fullLine =
      s"""{"metric":"suite_total","value":${num(total, 4)},"unit":"sec","queries":$qsFull,"runs":$spreadFull,"failed":$failedJson,"contention_median_ratio":${num(contention, 3)},$calibJson,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.json"), fullLine + "\n")
    catch { case _: Throwable => () }
    // The driver captures only the LAST ~2000 chars of stdout and parses
    // the final line (BENCH_r02 had "parsed":null because the 2829-char
    // full-name line was truncated mid-JSON). Print a compact line using
    // each query's unique qNNN prefix (mapping recorded in BASELINE.md)
    // at centisecond precision — at 137 queries the millisecond form hit
    // 1851 chars, one failed-list entry away from truncation; 10 ms
    // resolution keeps ~300 chars of headroom (ms detail in BENCH.json).
    // As the suite grows even the centisecond form will eventually brush
    // the window, so the precision is adaptive: render at 2 decimals,
    // and if the whole line would exceed the 1900-char budget fall back
    // to 1 decimal, then to whole seconds (ms detail is always in
    // BENCH.json either way — the compact values are a preview, the
    // driver's per-query analysis reads the full file).
    def render(decimals: Int): String = {
      val qsShort = results.map { case (k, v) =>
        "\"" + k.takeWhile(_ != '_') + "\":" + num(v.min, decimals) }
        .mkString("{", ",", "}")
      s"""{"metric":"suite_total","value":${num(total, 4)},"unit":"sec","queries":$qsShort,"failed":$failedJson,"contention":${num(contention, 3)},$calibJson,"sf":"$sfDir","detail":"BENCH.json"}"""
    }
    val line = Iterator(2, 1, 0).map(render)
      .find(_.length <= 1900).getOrElse(render(0))
    // last-resort guard: if even the 1-decimal form exceeds the driver's
    // ~2000-char stdout tail window, say so loudly on stderr — a silently
    // truncated JSON line cost round 2 its bench parse.
    if (line.length > 1900)
      System.err.println(s"[bench] WARNING: compact line ${line.length} chars" +
        " exceeds the 1900-char budget even at 1 decimal — the driver's" +
        " tail-parse may truncate it; shard the suite or shorten names")
    spark.stop()
    // Print AFTER spark.stop() so no executor/shutdown logging can land
    // between the JSON line and process exit.
    println(line)
    // A broken query must never hide inside a "successful" sweep again:
    // exit non-zero so any wrapper (driver, CI, make) goes red. The JSON
    // line is already printed, so the driver still records the sweep.
    if (failed.nonEmpty) {
      System.err.println(s"[bench] ${failed.size} queries FAILED: " +
        failed.mkString(", "))
      sys.exit(1)
    }
  }
}
