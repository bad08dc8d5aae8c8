package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.profiler._
import graft.core.SuiteRunner

class LearnAllTablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val tables = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  test("learn + auto-suite run on every test table without error") {
    tables.foreach { t =>
      val df = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", t)
      val b = Learn.learn(df)
      assert(b.rowCount > 0, s"$t rowcount")
      assert(b.columns.size == df.columns.length, s"$t columns")
      val r = SuiteRunner.run(df, AutoSuite.build(b),
        SuiteRunner.Config(datasetName = t,
          format = graft.core.ResultFormat.BooleanOnly))
      assert(r.checks.nonEmpty, s"$t suite")
      // auto-suite from own baseline: range/null checks must self-pass
      val nullRange = r.checks.filter(c =>
        c.validator.startsWith("null") || c.validator.startsWith("range"))
      assert(nullRange.forall(_.passed), s"$t self-checks: " +
        nullRange.filterNot(_.passed).map(_.validator).mkString(","))
    }
  }
}
