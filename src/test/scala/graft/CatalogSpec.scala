package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.validators._

class CatalogSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("string validators: regex, length, format, casing, like") {
    val df = Seq("a@x.com", "nope", "B@Y.COM", "x@y.io").toDF("email")
    val r = SuiteRunner.run(df, Seq(
      FormatCheck("email", "email"),
      LengthCheck("email", Some(5), Some(10)),
      CasingCheck("email", "lower"),
      LikePatternCheck("email", "%@%"),
      RegexCheck("email", "^[a-z]"))) // 'nope' matches, B@Y.COM doesn't
    val m = r.checks.map(c => c.validator -> c.issues.map(_.count).sum).toMap
    assert(m("format_email[email]") == 1) // 'nope'
    assert(m("length[email]") == 1)       // 'nope' len 4
    assert(m("casing[email]") == 1)       // B@Y.COM
    assert(m("like[email]") == 1)         // 'nope'
    assert(m("regex[email]") == 1)        // B@Y.COM
  }

  test("ReDoS safety screen rejects nested quantifiers") {
    assert(RegexSafety.isSafe("^[a-z]+$"))
    assert(!RegexSafety.isSafe("(a+)+b"))
    intercept[IllegalArgumentException] { RegexCheck("c", "(a*)*x") }
  }

  test("json parseable via try_parse_json") {
    val df = Seq("""{"a":1}""", "not json", """[1,2]""").toDF("j")
    val r = SuiteRunner.run(df, Seq(JsonParseableCheck("j")))
    assert(r.checks.head.issues.head.count == 1)
  }

  test("datetime: format parse, range, order, coverage") {
    val df = Seq(
      ("2024-01-01 10:00:00", "2024-01-02", "2024-01-03"),
      ("bogus", "2024-05-05", "2024-01-01")
    ).toDF("s", "start", "end")
      .selectExpr("s", "cast(start as timestamp) start", "cast(end as timestamp) end")
    val r = SuiteRunner.run(df, Seq(
      DateFormatCheck("s", "yyyy-MM-dd HH:mm:ss"),
      DateOrderCheck("start", "end"),
      DatePartCoverageCheck("start", "month", 3)))
    val m = r.checks.map(c => c.validator -> c.issues.map(_.count).sum).toMap
    assert(m("date_format[s]") == 1)
    assert(m("date_order[start<=end]") == 1)
    assert(m.exists { case (k, v) => k.startsWith("date_part_coverage") && v == 1 })
  }

  test("aggregate between checks + inferred type") {
    val df = Seq("1.5", "2.5", "oops", "4.0").toDF("v")
    val r = SuiteRunner.run(df, Seq(InferredTypeCheck("v", "numeric", 0.9)))
    assert(!r.checks.head.passed) // 3/4 parseable < 0.9
    val nums = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val r2 = SuiteRunner.run(nums, Seq(
      MeanBetweenCheck("x", 2.0, 3.0),
      MedianBetweenCheck("x", 0.0, 10.0),
      SumBetweenCheck("x", 0.0, 5.0), // sum=10 fails
      MinBetweenCheck("x", 0.0, 2.0),
      MaxBetweenCheck("x", 0.0, 3.0))) // max=4 fails
    assert(r2.checks.count(!_.passed) == 2)
  }

  test("multi-column: arithmetic, consistency, chain, correlation") {
    val df = Seq((1.0, 2.0, 3.0, 10.0), (2.0, 3.0, 99.0, 20.0))
      .toDF("a", "b", "c", "d")
    val r = SuiteRunner.run(df, Seq(
      ArithmeticCheck("a", "b", "c", "sum"),     // row2: 2+3 != 99
      ChainComparisonCheck(Seq("a", "b", "d")),  // both rows a<=b<=d ok
      CorrelationCheck("a", "d", lo = 0.99)))    // perfectly correlated
    val m = r.checks.map(c => c.validator -> c.passed).toMap
    assert(!m("arith_sum[a,b=c]"))
    assert(m("chain[a<=b<=d]"))
    assert(m("corr[a,d]"))
  }

  test("profiling: entropy, value frequency, cardinality, shape") {
    val df = (Seq.fill(90)("a") ++ Seq.fill(10)("b")).toDF("c")
    val r = SuiteRunner.run(df, Seq(
      EntropyCheck("c", 0.9, 10.0),      // H ≈ 0.325 nats — fails lo bound
      ValueFrequencyCheck("c", 0.5),     // 'a' at 0.9 > 0.5
      CardinalityCheck("c", "binary")))  // passes
    val m = r.checks.map(c => c.validator -> c.passed).toMap
    assert(!m("entropy[c]"))
    assert(!m("value_frequency[c]"))
    assert(m("cardinality[c]"))
  }
}
