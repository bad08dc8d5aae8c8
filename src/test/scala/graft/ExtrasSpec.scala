package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.validators._
import graft.drift.Drift

class ExtrasSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("table schema check vs learned baseline") {
    val df = Seq((1, "a", 2.0)).toDF("id", "name", "score")
    val baseline = graft.profiler.Learn.learn(df)
    assert(SuiteRunner.run(df, Seq(TableSchemaCheck(baseline))).passed)
    val drifted = Seq((1, 2.0, true)).toDF("id", "score", "extra")
    val r = SuiteRunner.run(drifted, Seq(TableSchemaCheck(baseline)))
    val types = r.issues.map(_.issueType).toSet
    assert(types == Set("missing_column", "unexpected_column"))
  }

  test("grouped duplicates, extremum relations, histogram shape") {
    val df = Seq((1, "k1", 5.0, 9.0), (1, "k1", 6.0, 9.0), (2, "k1", 7.0, 8.0))
      .toDF("grp", "key", "a", "b")
    val r = SuiteRunner.run(df, Seq(
      GroupedDuplicateCheck(Seq("grp"), Seq("key")),
      ExtremumRelationCheck(Seq("a", "b"), "b", useMax = true)))
    assert(r.checks.head.issues.head.count == 1) // (1,k1) appears twice
    assert(r.checks(1).passed) // max(a,b)==b everywhere
    val skewed = (Seq.fill(90)(1.0) ++ Seq.fill(10)(9.0)).toDF("v")
    val r2 = SuiteRunner.run(skewed, Seq(
      HistogramShapeCheck("v", 0, 10, Seq(0.5, 0.5), tolerance = 0.1)))
    assert(!r2.checks.head.passed) // actual is 0.9/0.1
  }

  test("multi-format date + multi-table orphans") {
    val df = Seq("2024-01-01", "01/15/2024", "garbage").toDF("d")
    val r = SuiteRunner.run(df, Seq(MultiFormatDateCheck("d")))
    assert(r.checks.head.issues.head.count == 1)
    val child = Seq(1, 2, 99).toDF("k")
    val p1 = Seq(1).toDF("id"); val p2 = Seq(2).toDF("id")
    val cr = CrossSuiteRunner.run(Map("c" -> child, "p1" -> p1, "p2" -> p2),
      Seq(MultiTableOrphanCheck("c", "k", Seq(("p1", "id"), ("p2", "id")))))
    assert(cr.checks.head.issues.head.count == 1) // 99 in neither parent
  }

  test("privacy policy bundles route to pattern sets") {
    val df = Seq("reach me at a@b.com", "rrn 990101-1234563").toDF("notes")
    val gdpr = PrivacyPolicies.scan(df, "gdpr")
    assert(gdpr.exists(v => v.pattern == "email" && v.count == 1))
    val kisa = PrivacyPolicies.scan(df, "kisa")
    assert(kisa.exists(_.pattern == "korean_rrn"))
    val br = Seq("cpf 123.456.789-09 and cep 01310-100").toDF("notes")
    val lgpd = PrivacyPolicies.scan(br, "lgpd")
    assert(lgpd.exists(v => v.pattern == "cpf_br" && v.count == 1))
    assert(lgpd.exists(v => v.pattern == "cep_br" && v.count == 1))
    val ca = Seq("sin 046-454-286 postal K1A 0B1").toDF("notes")
    val pipeda = PrivacyPolicies.scan(ca, "pipeda")
    assert(pipeda.exists(v => v.pattern == "sin_ca" && v.count == 1))
    assert(pipeda.exists(v => v.pattern == "postal_ca" && v.count == 1))
    intercept[IllegalArgumentException] { PrivacyPolicies.scan(df, "nope") }
  }

  test("validator registry creates and rejects") {
    val v = ValidatorRegistry.create("range",
      Map("column" -> "x", "min" -> "0", "max" -> "10"))
    assert(v.name == "range[x]")
    assert(ValidatorRegistry.registered.contains("unique"))
    intercept[IllegalArgumentException] {
      ValidatorRegistry.create("bogus", Map())
    }
  }

  test("country bounding-box check") {
    val df = Seq((37.5, 127.0), (48.9, 2.3), (0.0, 0.0))
      .toDF("lat", "lon") // Seoul, Paris, null island
    val r = SuiteRunner.run(df, Seq(CountryCheck("lat", "lon", Seq("KR", "FR"))))
    assert(r.checks.head.issues.head.count == 1) // only (0,0) outside
    intercept[IllegalArgumentException] { CountryCheck("lat", "lon", Seq("XX")) }
  }

  test("PCA anomaly flags off-subspace points") {
    // data on the line y=2x with one point far off the line
    val pts = (1 to 200).map(i => (i.toDouble, 2.0 * i)) :+ (100.0, -100.0)
    val df = pts.toDF("x", "y")
    val r = SuiteRunner.run(df, Seq(PcaAnomalyCheck(Seq("x", "y"), 1, 100.0)))
    assert(!r.checks.head.passed)
    assert(r.checks.head.issues.head.count == 1)
    // clean data on the line passes
    val clean = (1 to 200).map(i => (i.toDouble, 2.0 * i)).toDF("x", "y")
    assert(SuiteRunner.run(clean,
      Seq(PcaAnomalyCheck(Seq("x", "y"), 1, 100.0))).passed)
  }

  test("CvM / AD / energy / MMD detectors separate shifted samples") {
    val a = (1 to 300).map(_ % 50 / 5.0).toDF("v")
    val b = (1 to 300).map(_ % 50 / 5.0).toDF("v")
    val c = (1 to 300).map(i => i % 50 / 5.0 + 4.0).toDF("v")
    assert(Drift.cramerVonMises(a, b, "v") < 0.01)
    assert(Drift.cramerVonMises(a, c, "v") > 1.0)
    assert(Drift.andersonDarling(a, b, "v") < 0.1)
    assert(Drift.andersonDarling(a, c, "v") > 5.0)
    assert(Drift.energyDistance(a, b, "v") < 0.01)
    assert(Drift.energyDistance(a, c, "v") > 1.0)
    assert(Drift.mmd(a, b, "v") < 0.01)
    assert(Drift.mmd(a, c, "v") > 0.1)
  }
}
