package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.validators._
import graft.profiler._
import graft.drift.Drift

class ProfilerDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("learn: one-pass baseline with stats + allowed values, save/load") {
    val df = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0), (4, null, 40.0))
      .toDF("id", "cat", "v")
    val b = Learn.learn(df, lowCardinality = 5)
    assert(b.rowCount == 4)
    assert(b("id").uniqueRatio == 1.0)
    assert(b("cat").nullCount == 1)
    assert(b("cat").allowedValues.contains(Seq("a", "b")))
    assert(b("v").mean.contains(25.0))
    assert(b("v").q50.contains(25.0))
    assert(b("id").min.contains("1"))
    val path = java.nio.file.Files.createTempDirectory("baseline").toString + "/b"
    Learn.save(spark, b, path)
    val loaded = Learn.load(spark, path)
    assert(loaded.rowCount == 4)
    assert(loaded("cat").allowedValues.contains(Seq("a", "b")))
    assert(loaded("v").mean.contains(25.0))
  }

  test("learn: size-gated exact->approx switch flags columns over budget") {
    val df = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "customer")
    // default budget (8M) never trips at test scale: identical to the
    // ungated form, every column exact
    val gated = Learn.learn(df)
    val ungated = Learn.learn(df, maxExactDistinct = 0L)
    assert(gated.columns.forall(!_.approxStats))
    assert(gated.columns.map(c => (c.name, c.distinctCount, c.q50)) ==
      ungated.columns.map(c => (c.name, c.distinctCount, c.q50)))
    // force the gate: a 10-distinct budget flips the high-cardinality
    // columns (c_custkey, c_name, ...) to HLL distinct + t-digest
    // percentiles while low-cardinality ones stay exact
    val forced = Learn.learn(df, maxExactDistinct = 10L)
    assert(forced("c_custkey").approxStats)
    assert(!forced("c_mktsegment").approxStats) // 5 segments, under budget
    val n = gated.rowCount
    val est = forced("c_custkey").distinctCount
    assert(math.abs(est - n) <= math.max(3, (0.1 * n).toLong),
      s"HLL estimate $est vs $n")
    assert(forced("c_custkey").q50.isDefined) // approx percentiles present
    // the flag round-trips through save/load (recorded in baseline JSON)
    val path = java.nio.file.Files.createTempDirectory("gate").toString + "/b"
    Learn.save(spark, forced, path)
    val loaded = Learn.load(spark, path)
    assert(loaded("c_custkey").approxStats && !loaded("c_mktsegment").approxStats)
  }

  test("auto-suite decisions are deterministic baseline functions") {
    val df = Seq((1, "x", 5.0), (2, "y", 6.0)).toDF("user_id", "name", "score")
    val d = AutoSuite.decisions(Learn.learn(df))
    assert(d.contains(AutoSuite.Decision("user_id", "unique"))) // name match
    assert(d.contains(AutoSuite.Decision("score", "range")))
    assert(d.contains(AutoSuite.Decision("name", "type")))
    assert(d.count(_.check == "null") == 3)
    // suite materializes and runs
    val suite = AutoSuite.build(Learn.learn(df))
    assert(SuiteRunner.run(df, suite).checks.nonEmpty)
  }

  test("PII scan single-pass + maskers") {
    val df = Seq(
      ("call me at x", "a@b.com"),
      ("ssn 123-45-6789 leaked", "c@d.org"),
      ("clean", "not-an-email")).toDF("notes", "contact")
    val report = Pii.scan(df)
    val hits = report.flagged.map(h => (h.column, h.pattern, h.count)).toSet
    assert(hits.contains(("notes", "ssn_us", 1L)))
    assert(hits.contains(("contact", "email", 2L)))
    val masked = Pii.maskFlagged(df, report, "redact")
    val vals = masked.select("notes").as[String].collect()
    assert(vals.exists(_.contains("[REDACTED]")))
    val hashed = Pii.maskFlagged(df, report, "hash")
    assert(hashed.select("contact").as[String].collect().forall(_.length == 64))
  }

  test("scrubText tags every default pattern, in order, idempotently") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      "mail a@b.com then +82 10-1234-5678 done",
      "ssn 123-45-6789 card 4111-1111-1111-1111 ip 10.1.2.3",
      "two mails a@b.com b@c.org",
      "clean prose with numbers 12 345 and a date 2024-01-02"
    ).toDF("t")
    val out = df.select(Pii.scrubText(col("t")).as("c"))
      .as[String].collect()
    assert(out(0) == "mail [EMAIL] then [PHONE_INTL] done")
    assert(out(1) == "ssn [SSN_US] card [CREDIT_CARD] ip [IPV4]")
    assert(out(2) == "two mails [EMAIL] [EMAIL]") // global, not first-only
    assert(out(3) == "clean prose with numbers 12 345 and a date 2024-01-02")
    // idempotent: tags contain no digits or '@', second pass is a no-op
    val twice = df.select(
      Pii.scrubText(Pii.scrubText(col("t"))).as("c")).as[String].collect()
    assert(twice.sameElements(out))
    // a card number is NOT half-eaten by the earlier SSN pattern (the
    // {3}-{2}-{4} shape can't anchor inside 4-4-4-4 digit groups)
    assert(!out(1).contains("[SSN_US]-"))
  }

  test("fake masking is deterministic and format-preserving") {
    import org.apache.spark.sql.functions.col
    val df = Seq("alice@real.com", "bob@real.com", "alice@real.com").toDF("e")
    val fakes = df.select(Pii.fakeMask(col("e"), "email").as("f"))
      .collect().map(_.getString(0))
    assert(fakes(0) == fakes(2)) // equal inputs -> equal fakes
    assert(fakes(0) != fakes(1))
    assert(fakes.forall(f => f.startsWith("user") && f.endsWith("@example.com")))
    intercept[IllegalArgumentException] {
      df.select(Pii.fakeMask(col("e"), "ssn")).collect()
    }
  }

  test("sketches: HLL estimate, bloom pre-filter") {
    val df = (1 to 1000).toDF("k")
    val est = df.agg(Sketches.approxDistinct($"k", 0.02)).head().getLong(0)
    assert(math.abs(est - 1000) < 100)
    val keys = Seq(1L, 2L, 3L).toDF("id")
    val probed = Sketches.bloomPreFilter(df.withColumn("k", $"k".cast("long")),
      "k", keys, "id")
    val n = probed.count()
    assert(n >= 3 && n < 100) // no false negatives, few false positives
  }

  test("drift: PSI/JS/TV/chi2 on shifted distributions") {
    val ref = (1 to 1000).map(i => i % 100 / 10.0).toDF("v")
    val same = (1 to 1000).map(i => i % 100 / 10.0).toDF("v")
    val shifted = (1 to 1000).map(i => i % 100 / 10.0 + 5.0).toDF("v")
    val pqSame = Drift.binnedPq(same, ref, "v", 10, 0.0, 15.0)
    val pqShift = Drift.binnedPq(shifted, ref, "v", 10, 0.0, 15.0)
    assert(Drift.psi(pqSame) < 0.01)
    assert(Drift.psi(pqShift) > 0.5)
    assert(Drift.jsDivergence(pqSame) < 0.01)
    assert(Drift.jsDivergence(pqShift) > 0.1)
    assert(Drift.totalVariation(pqShift) > 0.3)
    val cat1 = Seq.fill(100)("a").toDF("c").union(Seq.fill(50)("b").toDF("c"))
    val cat2 = Seq.fill(50)("a").toDF("c").union(Seq.fill(100)("b").toDF("c"))
    assert(Drift.chiSquare(Drift.categoricalPq(cat1, cat2, "c")) > 10)
  }

  test("drift: rangeDrift flags shrinkage, allowExpansion suppresses growth") {
    val ref = Seq(1.0, 5.0, 10.0).toDF("v")
    val shrunk = Seq(2.0, 5.0, 8.0).toDF("v")   // min up 100%, max down 20%
    val grown = Seq(0.5, 5.0, 20.0).toDF("v")   // min down 50%, max up 100%
    def flags(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getBoolean(4))).toMap
    val s = flags(Drift.rangeDrift(shrunk, ref, "v"))
    assert(s("min") && s("max"))
    // allowExpansion: growth is fine, shrinkage still flags
    val g = flags(Drift.rangeDrift(grown, ref, "v", allowExpansion = true))
    assert(!g("min") && !g("max"))
    val s2 = flags(Drift.rangeDrift(shrunk, ref, "v", allowExpansion = true))
    assert(s2("min") && s2("max"))
    // zero reference stat never flags; checkMin/checkMax select rows
    val zref = Seq(0.0, 0.0).toDF("v")
    val z = flags(Drift.rangeDrift(Seq(3.0).toDF("v"), zref, "v"))
    assert(!z("min") && !z("max"))
    assert(Drift.rangeDrift(shrunk, ref, "v", checkMin = false)
      .collect().map(_.getString(0)).toSeq == Seq("max"))
    // empty frames: null min/max coerce to 0.0, no flags, no throw
    val e = flags(Drift.rangeDrift(ref.limit(0), ref.limit(0), "v"))
    assert(!e("min") && !e("max"))
  }

  test("drift: exact KS and Wasserstein") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    assert(Drift.ksStatistic(a, b, "v") == 0.0)
    val c = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    assert(math.abs(Drift.ksStatistic(a, c, "v") - 0.5) < 1e-9)
    assert(math.abs(Drift.wasserstein(a, c, "v") - 2.0) < 1e-9)
    // tie-robustness: duplicated values must not inflate KS
    val t1 = (Seq.fill(50)(1.0) ++ Seq.fill(50)(2.0)).toDF("v")
    val t2 = (Seq.fill(50)(1.0) ++ Seq.fill(50)(2.0)).toDF("v")
    assert(Drift.ksStatistic(t1, t2, "v") == 0.0)
    // r15 regression pin: a single pooled distinct value (two identical
    // degenerate samples) leaves zero integration intervals — the
    // distance is 0.0, not a ROW_VALUE_IS_NULL crash (GraftProps seed
    // found the null aggregate; latent since the operator landed)
    val s1 = Seq(16.0).toDF("v"); val s2 = Seq(16.0).toDF("v")
    assert(Drift.wasserstein(s1, s2, "v") == 0.0)
    assert(Drift.ksStatistic(s1, s2, "v") == 0.0)
  }

  test("anomaly: MAD, percentile, Grubbs, multi-z, Mahalanobis") {
    val base = Seq.fill(200)(10.0) ++ Seq(10.5, 9.5) ++ Seq(1000.0)
    val df = base.toDF("v")
    val r = SuiteRunner.run(df, Seq(
      MadOutlierCheck("v"),
      GrubbsCheck("v"),
      MultiZScoreCheck(Seq("v"), z = 3.0)))
    val m = r.checks.map(c => c.validator -> c.passed).toMap
    assert(!m("grubbs[v]"))
    assert(!m("multi_zscore[v]"))
    // MAD==0 here (median abs dev of constant-ish data) -> no crash, no issue
    val spread = (1 to 100).map(_.toDouble) ++ Seq(10000.0)
    val r2 = SuiteRunner.run(spread.toDF("v"), Seq(MadOutlierCheck("v", k = 5)))
    assert(!r2.checks.head.passed)
    val mv = Seq((1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 40.0),
      (5.0, 50.0), (100.0, -100.0)).toDF("x", "y")
    val r3 = SuiteRunner.run(mv, Seq(MahalanobisCheck(Seq("x", "y"), 4.0)))
    assert(!r3.checks.head.passed)
  }
}
