package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.Readers

class ReadersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def write(name: String, content: String): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_readers")
    val f = dir.resolve(name)
    java.nio.file.Files.writeString(f, content)
    f.toString
  }

  test("csv honors the multi-token null_values list (reference fixture shape)") {
    // mirror of the reference's local_core.csv: empty AND literal NULL
    val p = write("core.csv",
      """customer_id,email,age,status
        |1,a@x.com,34,active
        |2,,151,inactive
        |2,NULL,40,active
        |3,c@x.com,28,active
        |4,d@x.com,NULL,active
        |""".stripMargin)
    val df = Readers.csv(spark, p, nullValues = Seq("", "NULL"))
    assert(df.count() == 5)
    assert(df.filter(col("email").isNull).count() == 2)
    assert(df.filter(col("age").isNull).count() == 1)
    // a secondary null token inside a NUMERIC column must not degrade the
    // column to string — inference runs after token removal
    assert(df.schema("age").dataType == org.apache.spark.sql.types.LongType)
    assert(df.schema("customer_id").dataType == org.apache.spark.sql.types.LongType)
    // inferred types survive: age numeric, range check works
    val bad = df.filter(col("age") > 120).count()
    assert(bad == 1)
    // the flagship validators run over the loaded frame
    val res = graft.core.SuiteRunner.run(df, Seq(
      graft.validators.NullCheck(Seq("email")),
      graft.validators.UniqueCheck(Seq("customer_id")),
      graft.validators.RangeCheck("age", Some(0), Some(120))
    ), graft.core.SuiteRunner.Config(datasetName = "core_csv"))
    assert(res.checks.count(!_.passed) == 3) // nulls, dup id 2, age 151
  }

  test("ndjson and multiline json load") {
    val nd = write("d.ndjson",
      """{"id":1,"v":10}
        |{"id":2,"v":20}
        |""".stripMargin)
    assert(Readers.ndjson(spark, nd).count() == 2)
    val js = write("d.json", """[{"id":1,"v":10},{"id":2,"v":20},{"id":3}]""")
    val df = Readers.json(spark, js)
    assert(df.count() == 3 && df.filter(col("v").isNull).count() == 1)
  }
}
