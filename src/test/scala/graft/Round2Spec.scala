package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.validators._

/** Round-2 primitives: SeqScan boundary fixup, drift auto-binning,
  * cascade depth, seasonal decomposition, checksum expressions, info
  * gain. */
class Round2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("SeqScan matches the global-window monotonic count incl. boundaries") {
    // deterministic pseudo-random walk with planted drops; enough rows to
    // span many range partitions so cross-partition pairs matter
    val df = (1 to 50000).map { i =>
      (i.toLong, (i * 37 % 1000).toDouble + (if (i % 997 == 0) -5000.0 else 0.0))
    }.toDF("ord", "v")
    val distributed = graft.ops.SeqScan.adjacentViolations(
      df, col("ord"), col("v"),
      (_, pv, _, cv) => pv.nonEmpty && cv.nonEmpty && cv.get < pv.get)
    val w = Window.partitionBy().orderBy(col("ord"))
    val prev = lag(col("v"), 1).over(w)
    val expected = df
      .withColumn("__x", when(prev.isNotNull && col("v") < prev, 1).otherwise(0))
      .agg(sum(col("__x"))).head().getLong(0)
    assert(distributed == expected)
  }

  test("SeqScan handles nulls like the window form") {
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 5.0), (2L, null), (3L, 3.0), (4L, 4.0), (5L, 1.0))
      .toDF("ord", "v")
    val n = graft.ops.SeqScan.adjacentViolations(df, col("ord"), col("v"),
      (_, pv, _, cv) => pv.nonEmpty && cv.nonEmpty && cv.get < pv.get)
    // pairs: (5,null) skip, (null,3) skip, (3,4) ok, (4,1) violation
    assert(n == 1)
  }

  test("drift autoBin keeps exact results under the threshold and stays close above") {
    val a = (1 to 4000).map(i => (i % 997).toDouble).toDF("x")
    val b = (1 to 4000).map(i => (i % 997).toDouble + 30.0).toDF("x")
    val exact = graft.drift.Drift.ksStatistic(a, b, "x")
    val auto = graft.drift.Drift.ksAuto(a, b, "x") // under threshold: same path
    assert(auto == exact)
    val binned = graft.drift.Drift.ksAuto(a, b, "x",
      maxExactDistinct = 10, bins = 512) // force the bin-midpoint rewrite
    assert(math.abs(binned - exact) < 0.05, s"binned=$binned exact=$exact")
  }

  test("cascade depth over a declared FK chain") {
    val chk = CascadeDepthCheck(Seq(
      "nation" -> "region", "customer" -> "nation",
      "orders" -> "customer", "lineitem" -> "orders"), maxDepth = 3)
    assert(chk.depthOf("region") == 5)
    val issues = chk.run(Map.empty)
    assert(issues.exists(_.issueType == "cascade_depth_exceeded"))
  }

  test("seasonal decomposition separates a planted periodic signal") {
    val vals = Array.tabulate(140)(i => 100.0 + (i % 7) * 50.0 + i * 0.01)
    val (_, seasonal, residual) = SeriesOps.decompose(vals, 7)
    val tot = SeriesOps.variance(vals)
    assert(SeriesOps.variance(seasonal) / tot > 0.8)
    assert(SeriesOps.variance(residual) / tot < 0.05)
  }

  test("trend break detection finds a planted level shift") {
    val vals = Array.tabulate(80)(i => if (i < 40) 100.0 else 200.0)
    val breaks = SeriesOps.detectBreaks(vals, window = 10, minMagnitude = 0.3)
    assert(breaks == Seq(40))
    assert(SeriesOps.detectBreaks(
      Array.tabulate(80)(_ => 100.0), 10, 0.3).isEmpty)
  }

  test("localization checksums accept valid ids and reject digit bumps") {
    val rows = Seq(
      ("11010519491231002X", "123456789018", "91350100M000100738"),
      ("360102198001011235", "987654321093", "91110000X0001WT23Q"))
      .toDF("cn", "jp", "uscc")
    val r = rows.agg(
      graft.ops.Exprs.cnt(LocalFormats.chineseIdValid(col("cn"))),
      graft.ops.Exprs.cnt(LocalFormats.myNumberValid(col("jp"))),
      graft.ops.Exprs.cnt(LocalFormats.usccValid(col("uscc")))).head()
    assert(r.getLong(0) == 2 && r.getLong(1) == 2 && r.getLong(2) == 2)
    val bumped = rows.select(
      concat(lit("2"), expr("substr(cn, 2)")).as("cn"),
      concat(lit("2"), expr("substr(jp, 2)")).as("jp"),
      concat(lit("0"), expr("substr(uscc, 2)")).as("uscc"))
    val rb = bumped.agg(
      graft.ops.Exprs.cnt(LocalFormats.chineseIdValid(col("cn"))),
      graft.ops.Exprs.cnt(LocalFormats.myNumberValid(col("jp"))),
      graft.ops.Exprs.cnt(LocalFormats.usccValid(col("uscc")))).head()
    assert(rb.getLong(0) == 0 && rb.getLong(1) == 0 && rb.getLong(2) == 0)
  }

  test("information gain: zero for independence, H(target) for identity") {
    val dep = (1 to 400).map(i => (s"f${i % 4}", s"t${i % 4}"))
      .toDF("f", "t") // t fully determined by f
    val r = InfoGain.informationGain(dep, "f", "t").head()
    assert(math.abs(r.getDouble(0) - 2.0) < 1e-9) // ig == H(t) == log2(4)
    val indep = (1 to 400).map(i => (s"f${i % 4}", s"t${(i / 4) % 4}"))
      .toDF("f", "t")
    val r2 = InfoGain.informationGain(indep, "f", "t").head()
    assert(math.abs(r2.getDouble(0)) < 1e-9)
  }

  test("percentage / covariance / variance-ratio validators") {
    val df = (1 to 100).map(i => (i.toDouble, 100.0, i * 2.0))
      .toDF("part", "whole", "b")
    val pct = PercentageCheck("part", "whole", 10.0, 90.0)
    val m = graft.core.SuiteRunner.run(df, Seq(pct,
      CovarianceCheck("part", "b", 0.0, 1e9),
      MultiColumnVarianceCheck(Seq("part", "b"), maxRatio = 2.0)),
      graft.core.SuiteRunner.Config(datasetName = "pctcov"))
    val byName = m.checks.map(c => c.validator -> c).toMap
    assert(!byName(pct.name).passed) // 1..9 and 91..100 outside [10,90]%
    assert(byName(pct.name).issues.head.count == 19)
    assert(byName("covariance[part,b]").passed) // positive covariance
    assert(!byName("multi_variance[part,b]").passed) // var ratio 4 > 2
  }
  test("simhash64 registers as a SQL function (FunctionBridge runtime path)") {
    org.apache.spark.sql.graft.FunctionBridge.registerSimhash(spark)
    val r = spark.sql(
      "SELECT simhash64(array('a','b')) AS h, simhash64(array('a','b')) AS h2")
      .head()
    assert(r.getLong(0) == r.getLong(1)) // deterministic
    // matches the Column-API form on the shared implementation
    val viaCol = Seq(Seq("a", "b")).toDF("t")
      .select(graft.functions.SimHash64(col("t"))).head().getLong(0)
    assert(viaCol == r.getLong(0))
  }

}
