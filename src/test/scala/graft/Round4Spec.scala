package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import graft.validators._

/** Round-4 regression specs: fused single-job forms of operators that
  * previously executed their plan twice. */
class Round4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Count Spark ACTIONS (query executions) while `body` runs — AQE splits
    * one action into several scheduler jobs, so onJobStart over-counts; the
    * double-execution defect being guarded is one action too many. */
  private def countActions(body: => Unit): Int = {
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = n.incrementAndGet()
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try { body; Thread.sleep(300) } // listener delivery is async
    finally spark.listenerManager.unregister(l)
    n.get()
  }

  test("GroupedAggregateCompareCheck runs its full-outer join once") {
    val a = Seq((1, 10), (1, 20), (2, 5), (3, 7)).toDF("k", "v")
    val b = Seq((1, 30), (2, 5), (4, 1)).toDF("k", "v")
    val chk = GroupedAggregateCompareCheck("a", "b", "k", "k", "v", "v",
      agg = "sum")
    var issues: Seq[graft.core.ValidationIssue] = Nil
    val actions = countActions {
      issues = chk.run(Map("a" -> a, "b" -> b))
    }
    // groups: k=1 sum 30 vs 30 ok; k=2 5 vs 5 ok; k=3 only in a; k=4 only
    // in b => 2 mismatches over 4 groups
    assert(issues.nonEmpty)
    assert(issues.head.count == 2)
    assert(issues.head.totalCount == 4)
    assert(actions == 1, s"expected one fused action, saw $actions")
  }

  test("Drift.autoBin decides dispatch and bounds in one scan") {
    val cur = (1 to 500).map(_.toDouble).toDF("v")
    val ref = (1 to 500).map(i => i.toDouble + 0.5).toDF("v")
    // force the binned path with a tiny threshold; the single fused agg
    // must supply cardinality AND min/max
    var out: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = null
    val actions = countActions {
      out = graft.drift.Drift.autoBin(cur, ref, "v",
        maxExactDistinct = 10, bins = 8)
    }
    assert(actions == 1, s"expected one fused dispatch action, saw $actions")
    // bucketized frames are lazy — materialize to check validity
    assert(out._1.agg(org.apache.spark.sql.functions.count_distinct(
      org.apache.spark.sql.functions.col("v"))).head().getLong(0) <= 8)
    assert(out._2.count() == 500)
  }

  test("autoBin exact path unchanged below the cardinality threshold") {
    val cur = Seq(1.0, 2.0, 3.0).toDF("v")
    val ref = Seq(1.5, 2.5).toDF("v")
    val (c, r) = graft.drift.Drift.autoBin(cur, ref, "v")
    assert(c.collect().map(_.getDouble(0)).sorted.sameElements(
      Array(1.0, 2.0, 3.0)))
    assert(r.count() == 2)
  }

  test("bounded CSV inference infers from the prefix only") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_r4")
    val f = dir.resolve("t.csv")
    // first 3 rows numeric, a late string value would fail BIGINT
    val rows = (1 to 50).map(i => s"$i") :+ "not_a_number"
    java.nio.file.Files.writeString(f, "x\n" + rows.mkString("\n") + "\n")
    val bounded = graft.sources.Readers.csv(spark, f.toString,
      inferRows = Some(10))
    assert(bounded.schema("x").dataType ==
      org.apache.spark.sql.types.LongType)
    // the non-conforming tail value becomes NULL under bounded inference
    assert(bounded.filter(bounded("x").isNull).count() == 1)
    // exact inference (default) sees the string and keeps the column string
    val exact = graft.sources.Readers.csv(spark, f.toString)
    assert(exact.schema("x").dataType ==
      org.apache.spark.sql.types.StringType)
  }
}
