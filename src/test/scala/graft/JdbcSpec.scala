package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.sources.JdbcSource

class JdbcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val dbDir =
    java.nio.file.Files.createTempDirectory("graft_derby").toString
  private lazy val url = s"jdbc:derby:$dbDir/db;create=true"

  private def setup(): Unit = {
    val df = (1 to 500).map(i => (i.toLong, i * 1.5, s"name_$i"))
      .toDF("ID", "VAL", "NAME")
    JdbcSource.loadIntoDerby(df, url, "APP.METRICS",
      "ID BIGINT, VAL DOUBLE, NAME VARCHAR(32)", 1000)
    JdbcSource.registerCatalog(spark, "graftdb", url)
  }

  test("fused metric aggregate pushes down to the database") {
    setup()
    val t = JdbcSource.table(spark, "graftdb", "APP", "METRICS")
    val agg = t.agg(
      count(lit(1)).as("n"), min(col("ID")).as("mn"),
      max(col("ID")).as("mx"), sum(col("VAL")).as("s"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("PushedAggregates") &&
      plan.contains("COUNT") && plan.contains("MAX"),
      s"aggregates not pushed:\n$plan")
    val r = agg.head()
    assert(r.getLong(0) == 500 && r.getLong(1) == 1L && r.getLong(2) == 500L)
    assert(math.abs(r.getDouble(3) - (1 to 500).map(_ * 1.5).sum) < 1e-6)
  }

  test("filters push down to the database") {
    setup()
    val t = JdbcSource.table(spark, "graftdb", "APP", "METRICS")
    val q = t.filter(col("ID") <= 10).select(col("ID"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("ID"),
      s"filters not pushed:\n$plan")
    assert(q.count() == 10)
  }

  test("suite-runner validators compute against the JDBC relation") {
    setup()
    val t = JdbcSource.table(spark, "graftdb", "APP", "METRICS")
    val result = graft.core.SuiteRunner.run(t, Seq(
      graft.validators.NullCheck(Seq("ID", "VAL")),
      graft.validators.UniqueCheck(Seq("ID")),
      graft.validators.RangeCheck("VAL", Some(0), Some(1000))
    ), graft.core.SuiteRunner.Config(datasetName = "jdbc_metrics"))
    assert(result.checks.forall(_.passed))
  }
}
