package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.core._
import graft.validators._

object TestSpark {
  lazy val spark: SparkSession = graft.ops.Exprs.sessionDefaults(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")).getOrCreate()
}

class KernelSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    (1, Some("a@x.com"), 25, "active"),
    (2, None, 151, "inactive"),      // null email, age out of range
    (2, Some("b@x.com"), 30, "active"), // duplicate id
    (3, Some("c@x.com"), 40, "active"),
    (4, Some(""), -1, "unknown")     // empty email, negative age, bad status
  ).toDF("customer_id", "email", "age", "status")

  test("fused suite finds the three injected issue classes in <=1 scan") {
    val result = SuiteRunner.run(fixture, Seq(
      NullCheck(Seq("email")),
      UniqueCheck(Seq("customer_id")),
      RangeCheck("age", Some(0), Some(120))
    ))
    assert(result.rowCount == 5)
    assert(!result.passed)
    val byValidator = result.checks.map(c => c.validator -> c).toMap
    assert(byValidator("null[email]").issues.head.count == 1)
    assert(byValidator("unique[customer_id]").issues.head.count == 1)
    assert(byValidator("range[age]").issues.head.count == 2)
    // 1 fused metric scan + bounded sample jobs only
    assert(result.checks.size == 3)
  }

  test("schema-only validators run zero jobs and catch mismatches") {
    val result = SuiteRunner.run(fixture, Seq(
      ColumnExistsCheck(Seq("customer_id", "missing_col")),
      ColumnTypeCheck(Map("age" -> "int", "email" -> "string")),
      ColumnOrderCheck(Seq("customer_id", "email", "age", "status"))
    ))
    assert(result.checks.count(!_.passed) == 1)
    assert(result.checks.head.issues.head.column == "missing_col")
  }

  test("two-pass outlier checks fuse stats into scan 1") {
    val df = (Seq.fill(100)(10.0) ++ Seq(1000.0)).toDF("v")
    val result = SuiteRunner.run(df, Seq(
      IqrOutlierCheck("v"),
      ZScoreOutlierCheck("v", z = 3.0)
    ))
    assert(result.checks.head.issues.nonEmpty) // IQR flags the 1000
    assert(result.scanCount <= 2 + result.checks.count(!_.passed)) // 2 scans + samples
  }

  test("empty / conditional / default / distinct-set validators") {
    val result = SuiteRunner.run(fixture, Seq(
      EmptyStringCheck(Seq("email")),
      DefaultValueCheck("status", "active", maxRatio = 0.5),
      DistinctSetCheck("status", Set("active", "inactive"), "in_set"),
      UniqueRatioCheck("customer_id", 0.9),
      DistinctCountCheck("status", min = 1, max = 2)
    ))
    val m = result.checks.map(c => c.validator -> c.passed).toMap
    assert(!m("empty_string[email]"))
    assert(!m("default_value[status]")) // 3/5 active > 0.5
    assert(!m("distinct_in_set[status]")) // 'unknown' not allowed
    assert(!m("unique_ratio[customer_id]")) // 4/5 < 0.9
    assert(!m("distinct_count[status]")) // 3 > 2
  }

  test("dependency skip: downstream checks skipped when upstream fails") {
    val result = SuiteRunner.run(fixture, Seq(
      ColumnExistsCheck(Seq("nope")),
      new Validator {
        val name = "dependent"; val category = "test"
        override def dependencies = Set("column_exists[nope]")
        def metricExprs(s: org.apache.spark.sql.types.StructType, st: Metrics) = Nil
        def evaluate(m: Metrics, t: Long) =
          Seq(issue("x", "should_not_run", 1, t))
      }
    ))
    assert(result.checks.last.passed) // skipped, not failed
  }

  test("entry() returns non-empty summary") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
