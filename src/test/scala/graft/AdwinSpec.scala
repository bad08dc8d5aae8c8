package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.monitoring.Adwin

class AdwinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("stable stream never signals and the window keeps growing") {
    val det = new Adwin()
    val changes = (1 to 500).map(i =>
      det.add(10.0 + (i % 5) * 0.1)).count(identity)
    assert(changes == 0)
    assert(det.size == 500)
    assert(math.abs(det.mean - 10.2) < 0.05)
  }

  test("level shift is detected and the window forgets the old regime") {
    val det = new Adwin()
    (1 to 200).foreach(_ => det.add(1.0))
    var detectedAt = -1
    (1 to 100).foreach { i =>
      if (det.add(5.0) && detectedAt < 0) detectedAt = i
    }
    assert(detectedAt >= 1 && detectedAt <= 40) // few points after shift
    assert(det.size < 300)              // old regime dropped
    assert(det.mean > 3.0)              // tracks the new level
  }

  test("memory stays logarithmic: exponential histogram compresses") {
    val det = new Adwin()
    (1 to 10000).foreach(i => det.add((i % 7).toDouble))
    assert(det.size == 10000) // no spurious cut on a periodic stream
  }

  test("changePoints runs per series in parallel and flags the shifted one") {
    val stable = (0 until 300).map(i => ("a", "m", i.toLong, 2.0 + (i % 3) * 0.1))
    val shifted = (0 until 300).map(i =>
      ("b", "m", i.toLong, if (i < 200) 2.0 + (i % 3) * 0.1 else 9.0))
    val df = (stable ++ shifted).toDF("series", "metric", "ts", "value")
    val cp = Adwin.changePoints(spark, df).collect()
    assert(cp.nonEmpty)
    assert(cp.forall(_.getAs[String]("series") == "b"))
    assert(cp.map(_.getAs[Long]("ts")).min >= 200L)
  }
}
