package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.validators._

class MlAnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic 2-D blob around (0,0) with 3 planted far-out points
  private def blob = {
    val inliers = (1 to 400).map { i =>
      (math.sin(i * 0.7) * 10.0, math.cos(i * 1.3) * 10.0, false)
    }
    val planted = Seq((500.0, 500.0, true), (-400.0, 300.0, true),
      (350.0, -450.0, true))
    (inliers ++ planted).toDF("x", "y", "planted")
  }

  test("isolation forest scores planted outliers above all inliers") {
    val df = blob
    val sample = MlAnomaly.hashSample(df, Seq("x", "y"), 4096)
    val forest = MlAnomaly.fitForest(sample)
    val scored = df.withColumn("s", MlAnomaly.scoreCol(forest, Seq("x", "y")))
    val top3 = scored.orderBy(desc("s")).limit(3)
      .agg(count(when(col("planted"), 1))).head().getLong(0)
    assert(top3 == 3L)
    // scores are deterministic across fits (hash sample + fixed seed)
    val forest2 = MlAnomaly.fitForest(MlAnomaly.hashSample(df, Seq("x", "y"), 4096))
    val s1 = scored.orderBy(col("s")).select(col("s")).head().getDouble(0)
    val s2 = df.withColumn("s", MlAnomaly.scoreCol(forest2, Seq("x", "y")))
      .orderBy(col("s")).select(col("s")).head().getDouble(0)
    assert(s1 == s2)
  }

  test("isolation forest validator flags anomalies") {
    val issues = IsolationForestCheck(Seq("x", "y"), scoreThreshold = 0.65)
      .runScan(blob, 403)
    assert(issues.nonEmpty && issues.head.count >= 3)
  }

  test("LOF ranks planted outliers on top") {
    val pts = ((1 to 300).map(i =>
      Array(math.sin(i * 0.7) * 10.0, math.cos(i * 1.3) * 10.0)) ++
      Seq(Array(500.0, 500.0), Array(-400.0, 300.0))).toArray
    val scores = MlAnomaly.lofScores(pts, k = 10)
    val top2 = scores.zipWithIndex.sortBy(-_._1).take(2).map(_._2).toSet
    assert(top2 == Set(300, 301))
    assert(scores.take(300).forall(_ < scores(300)))
  }

  test("DBSCAN labels isolated points as noise") {
    val pts = ((1 to 300).map(i =>
      Array(math.sin(i * 0.7) * 10.0, math.cos(i * 1.3) * 10.0)) ++
      Seq(Array(500.0, 500.0), Array(-400.0, 300.0))).toArray
    assert(MlAnomaly.dbscanNoise(pts, eps = 5.0, minPts = 5) == 2L)
    // everything clustered when eps spans the blob
    assert(MlAnomaly.dbscanNoise(pts.take(300), eps = 50.0, minPts = 3) == 0L)
  }

  test("DBSCAN validator flags noise in the sample") {
    val issues = DbscanCheck(Seq("x", "y"), eps = 5.0, minPts = 5)
      .runScan(blob, 403)
    assert(issues.nonEmpty && issues.head.count == 3)
  }

  test("OCSVM decision separates planted outliers from the blob") {
    val pts = (1 to 400).map(i =>
      Array(math.sin(i * 0.7) * 10.0, math.cos(i * 1.3) * 10.0)).toArray
    val model = MlAnomaly.fitOcsvm(pts, nu = 0.05)
    val planted = Seq(Array(500.0, 500.0), Array(-400.0, 300.0),
      Array(350.0, -450.0))
    // every planted far-out point scores negative (outlier)
    assert(planted.forall(p => model.decision(p) < 0))
    // training outlier fraction tracks nu (subgradient solver tolerance)
    val trainOut = pts.count(p => model.decision(p) < 0)
    assert(trainOut <= (0.05 * 3 * pts.length).toInt,
      s"train outliers $trainOut")
    // deterministic refit
    val model2 = MlAnomaly.fitOcsvm(pts, nu = 0.05)
    assert(model.decision(planted.head) == model2.decision(planted.head))
  }

  test("OCSVM validator flags planted outliers, scoring distributed") {
    val issues = OneClassSvmCheck(Seq("x", "y"), nu = 0.02)
      .runScan(blob, 403)
    assert(issues.nonEmpty && issues.head.count >= 3)
  }

  test("LOF validator reports sampled outliers") {
    val issues = LofCheck(Seq("x", "y"), k = 10, threshold = 2.0)
      .runScan(blob, 403)
    assert(issues.nonEmpty && issues.head.count >= 3)
  }

  // r16: scoring went native (ScoreArray expression). Parity: the
  // expression must be bit-identical to the former UDF closure form
  // (both call the same model method), and the scoring plan must carry
  // no ScalaUDF / BatchEval node.
  test("native ScoreArray is bit-identical to the UDF scoring form") {
    val df = blob
    val forest = MlAnomaly.fitForest(
      MlAnomaly.hashSample(df, Seq("x", "y"), 4096))
    val model = MlAnomaly.fitOcsvm(
      MlAnomaly.hashSample(df, Seq("x", "y"), 4096), nu = 0.05)
    val fUdf = udf((xs: scala.collection.Seq[Double]) =>
      forest.score(xs.toArray))
    val oUdf = udf((xs: scala.collection.Seq[Double]) =>
      model.decision(xs.toArray))
    val arr = array(col("x").cast("double"), col("y").cast("double"))
    val rows = df.select(
        MlAnomaly.scoreCol(forest, Seq("x", "y")).as("ifN"),
        fUdf(arr).as("ifU"),
        MlAnomaly.ocsvmDecisionCol(model, Seq("x", "y")).as("ocN"),
        oUdf(arr).as("ocU"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1)) // bit-exact, not approx
      assert(r.getDouble(2) == r.getDouble(3))
    }
    val plan = df.select(MlAnomaly.scoreCol(forest, Seq("x", "y")),
        MlAnomaly.ocsvmDecisionCol(model, Seq("x", "y")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEval"),
      s"scoring plan still carries a UDF:\n$plan")
  }

  test("ScoreArray null array input yields null") {
    val forest = MlAnomaly.fitForest(Array(Array(0.0, 0.0), Array(1.0, 1.0)))
    val out = Seq((1, true), (2, false)).toDF("id", "present")
      .select(graft.functions.ScoreArray(
        when(col("present"), array(lit(0.5), lit(0.5))), forest).as("s"))
      .orderBy(col("s").asc_nulls_first).collect()
    assert(out(0).isNullAt(0) && !out(1).isNullAt(0))
  }
}
