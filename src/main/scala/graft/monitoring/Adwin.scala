package graft.monitoring

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ADWIN — ADaptive WINdowing (Bifet & Gavaldà 2007; the third change
  * -detection method the reference names in `ml/drift_detection/
  * concept.py:41` alongside ddm and page_hinkley).
  *
  * The detector keeps an exponential-histogram window (at most
  * `maxBucketsPerRow` buckets per power-of-two capacity, so memory is
  * O(log n)); on every insert it checks all bucket-boundary splits and
  * drops the oldest buckets while any split's subwindow means differ by
  * more than the variance-aware Hoeffding/Bernstein cut.
  *
  * ADWIN is inherently sequential PER SERIES — but independent across
  * series, which is the axis that scales: `changePoints` runs one
  * detector per (series, metric) group inside `flatMapGroups`, so a
  * million metric series process in parallel, each over its own
  * (runs-over-time, i.e. small) history. This mirrors how the engine
  * treats all monitoring state: per-key, never global.
  */
final class Adwin(delta: Double = 0.002, maxBucketsPerRow: Int = 5) {
  require(delta > 0 && delta < 1, s"delta in (0,1): $delta")
  // bucket rows: row r holds buckets of capacity 2^r; each bucket is
  // (sum, sumSq). Newest data lives at row 0, position 0.
  private var rows = Vector(Vector.empty[(Double, Double)])
  private var total = 0L
  private var sum = 0.0
  private var sumSq = 0.0

  def size: Long = total
  def mean: Double = if (total == 0) 0.0 else sum / total
  def variance: Double =
    if (total == 0) 0.0
    else math.max(0.0, sumSq / total - (sum / total) * (sum / total))

  /** Insert a value; returns true when the window shrank (change). */
  def add(x: Double): Boolean = {
    rows = rows.updated(0, (x, x * x) +: rows(0))
    total += 1; sum += x; sumSq += x * x
    compress()
    shrinkIfDrift()
  }

  private def compress(): Unit = {
    var r = 0
    while (r < rows.size) {
      if (rows(r).size > maxBucketsPerRow) {
        // merge the two OLDEST buckets of this row into the next row
        val row = rows(r)
        val (s1, q1) = row(row.size - 1)
        val (s2, q2) = row(row.size - 2)
        val merged = (s1 + s2, q1 + q2)
        rows = rows.updated(r, row.dropRight(2))
        if (r + 1 == rows.size) rows = rows :+ Vector.empty
        rows = rows.updated(r + 1, merged +: rows(r + 1))
      }
      r += 1
    }
  }

  /** All buckets oldest-first as (sum, sumSq, capacity). */
  private def oldestFirst: Seq[(Double, Double, Long)] =
    rows.zipWithIndex.reverse.flatMap { case (row, r) =>
      row.reverse.map { case (s, q) => (s, q, 1L << r) }
    }

  private def shrinkIfDrift(): Boolean = {
    var changed = false
    var again = total >= 2
    while (again) {
      again = false
      val bs = oldestFirst
      var n0 = 0L; var s0 = 0.0
      var i = 0
      // try every split; cut at the FIRST (oldest) violating boundary
      while (i < bs.size - 1 && !again) {
        n0 += bs(i)._3; s0 += bs(i)._1
        val n1 = total - n0
        val s1 = sum - s0
        if (n0 >= 1 && n1 >= 1) {
          val diff = math.abs(s0 / n0 - s1 / n1)
          // Bernstein-style cut (ADWIN2 paper, eq. for eps_cut):
          // dp = delta / ln(n); m = harmonic mean of n0, n1
          val dp = delta / math.max(math.log(total.toDouble), 1.0)
          val m = 1.0 / (1.0 / n0 + 1.0 / n1)
          val v = variance
          val eps = math.sqrt(2.0 / m * v * math.log(2.0 / dp)) +
            2.0 / (3.0 * m) * math.log(2.0 / dp)
          if (diff > eps) {
            // drop the single oldest bucket and re-check
            val (ds, dq, dn) = bs.head
            dropOldest()
            total -= dn; sum -= ds; sumSq -= dq
            changed = true
            again = total >= 2
          }
        }
        i += 1
      }
    }
    changed
  }

  private def dropOldest(): Unit = {
    var r = rows.size - 1
    while (r >= 0) {
      if (rows(r).nonEmpty) {
        rows = rows.updated(r, rows(r).dropRight(1))
        while (rows.size > 1 && rows.last.isEmpty) rows = rows.dropRight(1)
        return
      }
      r -= 1
    }
  }
}

object Adwin {
  /** Change points over a metric-series frame `(series, metric, ts,
    * value)`: one ADWIN per (series, metric) group, groups processed in
    * parallel. Rows within a group sort in memory — series are
    * runs-over-time histories, bounded by run cadence, never data-scale.
    * Returns `(series, metric, ts, value, windowMean)` — one row per
    * point at which the window shrank. */
  def changePoints(spark: SparkSession, series: DataFrame,
      delta: Double = 0.002): DataFrame = {
    import spark.implicits._
    val typed = series.select(col("series").cast("string"),
      col("metric").cast("string"), col("ts").cast("long"),
      col("value").cast("double"))
      .as[(String, String, Long, Double)]
    typed.groupByKey(r => (r._1, r._2))
      .flatMapGroups((key: (String, String),
          it: Iterator[(String, String, Long, Double)]) => {
        val pts = it.toSeq.sortBy(_._3)
        val det = new Adwin(delta)
        pts.iterator.flatMap { case (_, _, ts, v) =>
          if (det.add(v)) Some((key._1, key._2, ts, v, det.mean)) else None
        }
      })
      .toDF("series", "metric", "ts", "value", "windowMean")
  }
}
