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

  test("orc round-trips schema and values through Spark's native reader") {
    val dir = java.nio.file.Files.createTempDirectory("graft_orc").toString
    val df = spark.range(100).selectExpr("id", "cast(id * 1.5 as double) AS v",
      "concat('s', id % 3) AS s")
    df.write.mode("overwrite").orc(dir)
    val back = Readers.orc(spark, dir)
    // file sources read back nullable; names + types must survive exactly
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq
      == df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.count() == 100)
    assert(back.agg(sum(col("v"))).head().getDouble(0)
      == df.agg(sum(col("v"))).head().getDouble(0))
    // pushdown reaches the ORC scan like parquet
    val plan = back.filter(col("id") > 90).select("id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,90)]"),
      plan)
  }

  test("textLines: line-per-row and whole-file modes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_txt")
    java.nio.file.Files.writeString(dir.resolve("a.txt"), "l1\nl2\n\nl4\n")
    java.nio.file.Files.writeString(dir.resolve("b.txt"), "only")
    val lines = Readers.textLines(spark, dir.toString)
    assert(lines.columns.toSeq == Seq("value"))
    assert(lines.count() == 5) // l1, l2, "", l4, only
    assert(lines.filter(col("value") === "").count() == 1)
    val whole = Readers.textLines(spark, dir.toString, wholeFile = true)
    assert(whole.count() == 2)
    assert(whole.filter(col("value").contains("l1\nl2")).count() == 1)
    // the documents corpus is \r-free, so q155's explode-split('\n')
    // line accounting is exact under Hadoop's \n|\r|\r\n line reader
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    assert(docs.filter(col("text").contains("\r")).count() == 0)
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
