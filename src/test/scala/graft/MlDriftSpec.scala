package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.drift.{ConceptDrift, MultivariateDrift}

class MlDriftSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // y = 2x + noise-free; z uncorrelated-ish deterministic pattern
  private def frame(slope: Double, n: Int = 200) =
    (1 to n).map { i =>
      val x = i.toDouble
      (x, slope * x, (i % 7).toDouble) }.toDF("x", "y", "z")

  test("concept drift: stable correlations -> none") {
    val r = ConceptDrift.detect(frame(2.0), frame(2.0), Seq("x", "z"), "y")
    assert(!r.isDrifted && r.driftType == "none")
    assert(r.columnScores.find(_._1 == "x").exists(_._2 < 0.05))
  }

  test("concept drift: relationship reversal fires with sign penalty") {
    val r = ConceptDrift.detect(frame(2.0), frame(-2.0), Seq("x", "z"), "y")
    assert(r.isDrifted)
    assert(r.columnScores.find(_._1 == "x").exists(_._2 == 1.0))
    assert(r.details.contains("sign changed"))
  }

  test("concept drift: target mean shift surfaces as target_shift") {
    val ref = (1 to 300).map(i => ((i % 10).toDouble, (i % 10).toDouble))
      .toDF("x", "y")
    val cur = (1 to 300).map(i => ((i % 10).toDouble, (i % 10) + 100.0))
      .toDF("x", "y")
    val r = ConceptDrift.detect(ref, cur, Seq("x"), "y")
    assert(r.isDrifted && r.driftType == "target_shift")
    assert(r.columnScores.exists(_._1 == "_target_distribution"))
  }

  test("correlation matrix is symmetric with unit diagonal; fused one-job") {
    val m = MultivariateDrift.corrMatrix(frame(2.0), Seq("x", "y", "z"))
    assert(m(0)(0) == 1.0 && m(1)(1) == 1.0)
    assert(math.abs(m(0)(1) - 1.0) < 1e-9) // perfect linear x~y
    assert(m(0)(2) == m(2)(0))
  }

  test("multivariate correlation drift: break one pair") {
    val ref = frame(2.0)
    // current: y independent of x (constant-slope replaced by modular)
    val cur = (1 to 200).map { i =>
      (i.toDouble, ((i * 17) % 13).toDouble, (i % 7).toDouble)
    }.toDF("x", "y", "z")
    val r = MultivariateDrift.detectCorrelation(ref, cur, Seq("x", "y", "z"))
    assert(r.isDrifted && r.driftType == "correlation_shift")
    assert(r.columnScores.find(_._1 == "y").exists(_._2 > 0.2))
    assert(r.details.contains("Changed pairs"))
  }

  test("power iteration recovers dominant eigenpair of a known matrix") {
    val m = Array(Array(2.0, 0.0), Array(0.0, 0.5))
    val (comps, eigs) = MultivariateDrift.powerIteration(m, 2)
    assert(math.abs(eigs(0) - 2.0) < 1e-6)
    assert(math.abs(math.abs(comps(0)(0)) - 1.0) < 1e-6)
    assert(math.abs(eigs(1) - 0.5) < 1e-6)
  }

  test("pca drift: same distribution scores ~0, structural break scores high") {
    val same = MultivariateDrift.detectPca(frame(2.0), frame(2.0),
      Seq("x", "y", "z"))
    assert(same.driftScore < 0.05)
    val cur = (1 to 200).map { i =>
      (i.toDouble, ((i * 17) % 13).toDouble, (i % 7).toDouble)
    }.toDF("x", "y", "z")
    val broke = MultivariateDrift.detectPca(frame(2.0), cur, Seq("x", "y", "z"))
    assert(broke.driftScore > same.driftScore + 0.2)
  }

  test("mahalanobis drift: mean shift detected, stable means are not") {
    val ref = frame(2.0)
    val shifted = (1 to 200).map { i =>
      val x = i.toDouble + 1000.0
      (x, 2.0 * x, (i % 7).toDouble) }.toDF("x", "y", "z")
    val stable = MultivariateDrift.detectMahalanobis(ref, frame(2.0),
      Seq("x", "y", "z"))
    val moved = MultivariateDrift.detectMahalanobis(ref, shifted,
      Seq("x", "y", "z"))
    assert(stable.driftScore < 0.05)
    assert(moved.isDrifted && moved.driftType == "multivariate_shift")
  }

  test("feature drift: mean shift, std shift, range breach, stability") {
    import graft.drift.FeatureDrift
    val ref = (1 to 100).map(i => (i.toDouble, (i % 10).toDouble))
      .toDF("a", "b")
    // a: +1000 mean shift (>> 3 sigma -> component 1.0); b: unchanged
    val cur = (1 to 100).map(i => (i + 1000.0, (i % 10).toDouble))
      .toDF("a", "b")
    val r = FeatureDrift.detectNumeric(ref, cur, Seq("a", "b"))
    assert(r.isDrifted && r.driftType == "feature_drift")
    assert(r.columnScores.find(_._1 == "a").exists(_._2 == 1.0))
    assert(r.columnScores.find(_._1 == "b").exists(_._2 < 0.01))
    val same = FeatureDrift.detectNumeric(ref, ref, Seq("a", "b"))
    assert(!same.isDrifted && same.driftScore == 0.0)
    // std doubled with same mean: std component dominates
    val wide = (1 to 100).map(i =>
      ((i - 50.5) * 2 + 50.5, (i % 10).toDouble)).toDF("a", "b")
    val rs = FeatureDrift.detectNumeric(ref, wide, Seq("a", "b"))
    assert(rs.columnScores.find(_._1 == "a").exists(_._2 >= 0.5))
  }

  test("numeric profiles survive decimal columns and all-null columns") {
    import graft.drift.FeatureDrift
    import org.apache.spark.sql.functions.{col, expr}
    val df = (1 to 10).map(i => (i.toDouble, Option.empty[Double]))
      .toDF("a", "b")
      .withColumn("a", col("a").cast("decimal(10,2)"))
    val p = FeatureDrift.profileNumeric(df, Seq("a", "b"))
    assert(math.abs(p("a").mean - 5.5) < 1e-9)
    assert(p("b").count == 0 && p("b").nullRatio == 1.0 &&
      p("b").mean == 0.0)
  }

  test("categorical drift: new values, vanished values, proportion shift") {
    import graft.drift.FeatureDrift
    val ref = ((1 to 80).map(_ => "x") ++ (1 to 20).map(_ => "y"))
      .toDF("c")
    val cur = ((1 to 40).map(_ => "x") ++ (1 to 20).map(_ => "y")
      ++ (1 to 40).map(_ => "z")).toDF("c")
    val (rp, rn) = FeatureDrift.profileCategorical(ref, "c")
    val (cp, cn) = FeatureDrift.profileCategorical(cur, "c")
    val score = FeatureDrift.categoricalScore(rp, rn, cp, cn)
    assert(score >= 0.4) // new value 'z' at 40% share dominates
    assert(FeatureDrift.categoricalScore(rp, rn, rp, rn) == 0.0)
  }

  test("profileCategorical reads the input in ONE pass") {
    import graft.drift.FeatureDrift
    val df = (Seq.fill(6)(Some("a")) ++ Seq.fill(3)(Some("b")) ++
      Seq.fill(1)(Option.empty[String])).toDF("c")
    val sc = spark.sparkContext
    sc.setJobGroup("pc_one_pass", "profileCategorical job-count check")
    val (props, nullRatio) =
      try FeatureDrift.profileCategorical(df, "c")
      finally sc.clearJobGroup()
    assert(props == Map("a" -> 0.6, "b" -> 0.3))
    assert(nullRatio == 0.1)
    // the status tracker is listener-fed (async): poll until work
    // appears, then re-check nothing else trickles in. AQE surfaces the
    // aggregate's shuffle materialization as its own job, so a single
    // pass is ≤ 2 jobs; the retired separate count() made it 3+.
    def jobs = sc.statusTracker.getJobIdsForGroup("pc_one_pass").length
    val deadline = System.currentTimeMillis() + 10000
    while (jobs < 1 && System.currentTimeMillis() < deadline)
      Thread.sleep(50)
    Thread.sleep(300)
    assert(jobs <= 2, s"expected a single input pass (<=2 jobs), saw $jobs")
  }

  test("matrix inverse round-trips") {
    val m = Array(Array(4.0, 1.0), Array(1.0, 3.0))
    val inv = MultivariateDrift.invert(m)
    val prod = Array.tabulate(2, 2)((i, j) =>
      (0 until 2).map(k => m(i)(k) * inv(k)(j)).foldLeft(0.0)(_ + _))
    assert(math.abs(prod(0)(0) - 1.0) < 1e-9 &&
      math.abs(prod(0)(1)) < 1e-9)
  }
}
