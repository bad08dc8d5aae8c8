package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.validators._

class MultiTableSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("foreign key orphans via anti-join") {
    val child = Seq((1, "a"), (2, "b"), (9, "orphan"), (3, "c")).toDF("fk", "v")
    val parent = Seq(1, 2, 3, 4).toDF("id")
    val r = CrossSuiteRunner.run(
      Map("child" -> child, "parent" -> parent),
      Seq(ForeignKeyCheck("child", Seq("fk"), "parent", Seq("id"),
        broadcastParent = true)))
    assert(r.checks.head.issues.head.count == 1)
  }

  test("composite FK + null keys excluded") {
    val child = Seq((Some(1), Some(10)), (Some(1), Some(99)), (None, Some(10)))
      .toDF("a", "b")
    val parent = Seq((1, 10), (2, 20)).toDF("x", "y")
    val r = CrossSuiteRunner.run(Map("c" -> child, "p" -> parent),
      Seq(ForeignKeyCheck("c", Seq("a", "b"), "p", Seq("x", "y"))))
    assert(r.checks.head.issues.head.count == 1) // (1,99); null row skipped
  }

  test("self-referential FK and hierarchy cycle detection") {
    val emp = Seq((1, None), (2, Some(1)), (3, Some(2)), (4, Some(99)))
      .toDF("id", "manager")
    val r = CrossSuiteRunner.run(Map("emp" -> emp),
      Seq(SelfReferentialFKCheck("emp", "manager", "id")))
    assert(r.checks.head.issues.head.count == 1) // manager 99 dangling

    val cyc = Seq((1, 2), (2, 3), (3, 1)).toDF("id", "parent")
    val r2 = CrossSuiteRunner.run(Map("t" -> cyc),
      Seq(HierarchyCheck("t", "id", "parent", maxDepth = 10)))
    assert(r2.checks.head.issues.exists(_.issueType == "circular_reference"))
  }

  test("cross-table row count and aggregate compare") {
    val a = (1 to 100).toDF("v")
    val b = (1 to 25).toDF("v")
    val r = CrossSuiteRunner.run(Map("a" -> a, "b" -> b), Seq(
      RowCountCompareCheck("a", "b", 3.0, 5.0),          // ratio 4 ok
      RowCountCompareCheck("a", "b", 5.0, 9.0),          // fails
      AggregateCompareCheck("a", "v", "b", "v", "max"))) // 100 vs 25 fails
    assert(r.checks.map(_.passed) == Seq(true, false, false))
  }

  test("grouped aggregate compare counts mismatched groups") {
    val a = Seq((1, 10.0), (1, 20.0), (2, 5.0)).toDF("k", "v")
    val b = Seq((1, 30.0), (3, 1.0)).toDF("k", "v")
    val r = CrossSuiteRunner.run(Map("a" -> a, "b" -> b),
      Seq(GroupedAggregateCompareCheck("a", "b", "k", "k", "v", "v", "sum")))
    // group1: 30 vs 30 ok; group2 missing in b; group3 missing in a => 2
    assert(r.checks.head.issues.head.count == 2)
  }

  test("query validator assertions + SQL safety screen") {
    val t = Seq(1, 2, 3).toDF("v")
    import QueryAssertion._
    assert(QueryCheck("SELECT * FROM t WHERE v > 10", ReturnsNoRows)
      .run(spark, Map("t" -> t)).passed)
    assert(!QueryCheck("SELECT * FROM t WHERE v > 1", ReturnsNoRows, "viol")
      .run(spark, Map("t" -> t)).passed)
    assert(QueryCheck("SELECT sum(v) FROM t", SingleValueBetween(5, 7))
      .run(spark, Map("t" -> t)).passed)
    intercept[IllegalArgumentException] {
      QueryCheck("DROP TABLE t", QueryAssertion.ReturnsRows)
    }
    intercept[IllegalArgumentException] {
      QueryCheck("SELECT 1; SELECT 2", QueryAssertion.ReturnsRows)
    }
  }

  test("Luhn / ISBN / IBAN / SWIFT checksums") {
    val df = Seq(
      ("4539578763621486", "0306406152", "GB82WEST12345698765432", "DEUTDEFF"),
      ("1234567812345678", "0306406153", "GB82WEST12345698765433", "X1")
    ).toDF("card", "isbn", "iban", "swift")
    val r = SuiteRunner.run(df, Seq(
      LuhnCheck("card"), IsbnCheck("isbn"), IbanCheck("iban"), SwiftCheck("swift")))
    assert(r.checks.forall(c => c.issues.head.count == 1)) // exactly row 2 fails each
  }

  test("geospatial: coordinate, bbox, haversine distance") {
    val df = Seq((0.0, 0.0), (91.0, 10.0), (48.8566, 2.3522), (40.7128, -74.006))
      .toDF("lat", "lon")
    val r = SuiteRunner.run(df, Seq(
      CoordinateCheck("lat", "lon"),
      BoundingBoxCheck("lat", "lon", -60, 60, -120, 120),
      GeoDistanceCheck("lat", "lon", 48.8566, 2.3522, 1000.0)))
    val byName = r.checks.map(c => c.validator -> c).toMap
    assert(byName("coordinate[lat,lon]").issues
      .exists(i => i.issueType == "invalid_latitude" && i.count == 1))
    assert(byName("coordinate[lat,lon]").issues
      .exists(i => i.issueType == "null_island" && i.count == 1))
    assert(byName("bbox[lat,lon]").issues.head.count == 1) // 91 lat
    // Paris->NYC ~5837km; (0,0)->Paris ~5400km; 91-lat row is garbage-in
    assert(byName("geo_distance[lat,lon]").issues.head.count >= 2)
  }

  test("Korean RRN checksum + localization formats") {
    // synthetic RRN with valid check digit: 990101-1 + serial 23456, check:
    // weights 2,3,4,5,6,7,8,9,2,3,4,5 over 990101123456
    val digits = "990101123456"
    val sum = digits.zip(Seq(2, 3, 4, 5, 6, 7, 8, 9, 2, 3, 4, 5))
      .map { case (d, w) => (d - '0') * w }.sum
    val check = (11 - sum % 11) % 10
    val valid = s"990101-123456$check".patch(6, "-", 1)
    val validRrn = s"990101-123456".take(13) + check // 990101-123456C
    val df = Seq(validRrn, "990101-9234567", "nope").toDF("rrn")
    val r = SuiteRunner.run(df, Seq(KoreanRrnCheck("rrn")))
    assert(r.checks.head.issues.head.count == 2)
    val df2 = Seq("123-45-67890", "bad").toDF("biz")
    val r2 = SuiteRunner.run(df2, Seq(LocalFormatCheck("biz", "korean_biz")))
    assert(r2.checks.head.issues.head.count == 1)
  }

  test("KoreanPhoneCheck: mobile/landline/special classes and separators") {
    import spark.implicits._
    val df = Seq(
      "010-1234-5678",   // mobile (dashes)
      "011 123 4567",    // mobile, 10-digit legacy prefix (spaces)
      "02.123.4567",     // landline (dots)
      "031-1234-5678",   // landline
      "080-123-4567",    // special toll-free
      "1588-1234",       // special service number
      "015-123",         // too short, 015 not a class
      "12345",           // garbage
      "+82-10-1234-5678" // not digits after strip -> invalid
    ).toDF("ph")
    val all = SuiteRunner.run(df, Seq(KoreanPhoneCheck("ph")))
    assert(all.checks.head.issues.head.count == 3)
    // per-class flags: only the allowed class validates
    val mobileOnly = SuiteRunner.run(df, Seq(KoreanPhoneCheck("ph",
      allowLandline = false, allowSpecial = false)))
    assert(mobileOnly.checks.head.issues.head.count == 7)
    // null is not an issue (mask only counts non-null invalids)
    val withNull = SuiteRunner.run(
      Seq(Some("010-1234-5678"), None).toDF("ph"),
      Seq(KoreanPhoneCheck("ph")))
    assert(withNull.checks.head.issues.isEmpty)
  }
}
