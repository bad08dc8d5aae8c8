package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Pins the contract the round-7/8 postmortem demanded: a broken query
  * must turn the sweep RED — named in the failed list, -1.0 in its runs,
  * surfaced through onFail — never silently folded into a "successful"
  * total. (Bench.main additionally prints the failed list in both JSON
  * lines and exits non-zero when it is non-empty; the sweep result here
  * is exactly what drives those.) */
class BenchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def good(n: Long): (SparkSession, String) => DataFrame =
    (s, _) => s.range(n).toDF("id")
  private val broken: (SparkSession, String) => DataFrame =
    (s, _) => throw new IllegalStateException("deliberately broken")

  test("a deliberately-broken query turns the sweep red") {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val (results, failed) = Bench.sweep(spark, "/unused",
      Seq("q_ok_a" -> good(10), "q_broken" -> broken, "q_ok_b" -> good(5)),
      onFail = (name, e) => seen += s"$name:${e.getMessage}")
    assert(failed == Seq("q_broken"))
    assert(seen == Seq("q_broken:deliberately broken"))
    val byName = results.toMap
    assert(byName("q_broken") == Seq(-1.0))
    // healthy queries still timed normally around the failure
    assert(byName("q_ok_a").forall(_ >= 0) && byName("q_ok_b").forall(_ >= 0))
    assert(byName("q_ok_a").size >= 2)
  }

  test("an all-green sweep reports no failures") {
    val (results, failed) =
      Bench.sweep(spark, "/unused", Seq("q1" -> good(3), "q2" -> good(4)))
    assert(failed.isEmpty)
    assert(results.map(_._1) == Seq("q1", "q2"))
    assert(results.forall(_._2.min >= 0))
  }
}
