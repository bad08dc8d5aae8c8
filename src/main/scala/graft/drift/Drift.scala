package graft.drift

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Two-dataset drift detection (reference: truthound `drift/` — 14 detector
  * classes dispatched per-dtype by `th.compare()`, `drift/compare.py:30-157`,
  * `drift/detectors.py:82-1421`, plus drift validators `validators/drift/`).
  *
  * Strategy (per SURVEY §2.13): per column build ONE binned histogram per
  * dataset (`groupBy(bucket).count` — shuffle O(bins)), join the two
  * k-row bin tables, finish the statistic driver-side on <= k bins.
  * Binned detectors (PSI/KL/JS/Hellinger/TV/Bhattacharyya/ChiSquare) are
  * exact-on-bins; KS and Wasserstein run exact via a merged sort + window
  * cumulative CDFs (global window = one task for the k distinct values —
  * fine for validator-sized columns; at 100 TB use the binned variant:
  * `ksBinned`). */
object Drift {

  /** Equal-width histogram counts: (bucket, cnt). Bucket 0..bins-1,
    * clamped at edges; nulls dropped. */
  def histogram(df: DataFrame, column: String, bins: Int,
                lo: Double, hi: Double): DataFrame = {
    // degenerate range (constant column): one bucket, zero drift —
    // avoids NaN bucket ids / ANSI cast failures
    val w = if (hi > lo) (hi - lo) / bins else 1.0
    val b = least(greatest(floor((col(column) - lo) / w), lit(0)),
      lit(bins - 1)).cast("int")
    df.filter(col(column).isNotNull)
      .groupBy(b.as("bucket")).agg(count(lit(1)).as("cnt"))
  }

  /** Joined normalized bin distribution of two datasets: (bucket, p, q). */
  def binnedPq(cur: DataFrame, ref: DataFrame, column: String, bins: Int,
               lo: Double, hi: Double): Seq[(Int, Double, Double)] = {
    val h1 = histogram(cur, column, bins, lo, hi).withColumnRenamed("cnt", "c1")
    val h2 = histogram(ref, column, bins, lo, hi).withColumnRenamed("cnt", "c2")
    val joined = h1.join(h2, Seq("bucket"), "full_outer")
      .na.fill(0L, Seq("c1", "c2")).orderBy("bucket").collect()
    val n1 = joined.map(_.getAs[Long]("c1")).sum.toDouble
    val n2 = joined.map(_.getAs[Long]("c2")).sum.toDouble
    joined.toSeq.map(r => (r.getAs[Int]("bucket"),
      r.getAs[Long]("c1") / math.max(n1, 1),
      r.getAs[Long]("c2") / math.max(n2, 1)))
  }

  /** Categorical distribution join: (value, p, q, c1, c2). The driver
    * collect is bounded by `maxCategories` — a column with more distinct
    * values than that is not categorical; fail loudly instead of OOMing
    * the driver at scale (use the binned numeric path instead). */
  def categoricalPq(cur: DataFrame, ref: DataFrame, column: String,
                    maxCategories: Int = 100000)
      : Seq[(String, Double, Double, Long, Long)] = {
    val h1 = cur.groupBy(col(column).cast("string").as("v"))
      .agg(count(lit(1)).as("c1"))
    val h2 = ref.groupBy(col(column).cast("string").as("v"))
      .agg(count(lit(1)).as("c2"))
    val joined = h1.join(h2, Seq("v"), "full_outer")
      .na.fill(0L, Seq("c1", "c2")).orderBy("v")
      .limit(maxCategories + 1).collect()
    require(joined.length <= maxCategories,
      s"$column has >$maxCategories distinct values — not categorical; " +
        "use binnedPq for numeric drift")
    val n1 = joined.map(_.getAs[Long]("c1")).sum.toDouble
    val n2 = joined.map(_.getAs[Long]("c2")).sum.toDouble
    joined.toSeq.map(r => (r.getAs[String]("v"),
      r.getAs[Long]("c1") / math.max(n1, 1), r.getAs[Long]("c2") / math.max(n2, 1),
      r.getAs[Long]("c1"), r.getAs[Long]("c2")))
  }

  private val eps = 1e-10

  /** Population Stability Index over bins (reference `drift/psi.py:29`). */
  def psi(pq: Seq[(Int, Double, Double)]): Double =
    pq.map { case (_, p, q) =>
      val pp = math.max(p, eps); val qq = math.max(q, eps)
      (pp - qq) * math.log(pp / qq)
    }.sum

  /** KL(p||q) with epsilon smoothing. */
  def klDivergence(pq: Seq[(Int, Double, Double)]): Double =
    pq.map { case (_, p, q) =>
      if (p <= 0) 0.0 else p * math.log(p / math.max(q, eps))
    }.sum

  /** Jensen-Shannon divergence (base e, in [0, ln 2]). */
  def jsDivergence(pq: Seq[(Int, Double, Double)]): Double = {
    def kl(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) =>
        if (x <= 0) 0.0 else x * math.log(x / math.max(y, eps)) }.sum
    val p = pq.map(_._2); val q = pq.map(_._3)
    val m = p.zip(q).map { case (x, y) => (x + y) / 2 }
    0.5 * kl(p, m) + 0.5 * kl(q, m)
  }

  /** Hellinger distance in [0,1]. */
  def hellinger(pq: Seq[(Int, Double, Double)]): Double =
    math.sqrt(math.max(0.0,
      1.0 - pq.map { case (_, p, q) => math.sqrt(p * q) }.sum)) match {
      case d => d
    }

  /** Total variation distance = 0.5 * L1. */
  def totalVariation(pq: Seq[(Int, Double, Double)]): Double =
    0.5 * pq.map { case (_, p, q) => math.abs(p - q) }.sum

  /** Bhattacharyya distance. */
  def bhattacharyya(pq: Seq[(Int, Double, Double)]): Double =
    -math.log(math.max(pq.map { case (_, p, q) => math.sqrt(p * q) }.sum, eps))

  /** Pearson chi-square statistic over categorical cells (observed=cur,
    * expected scaled from ref). */
  def chiSquare(cells: Seq[(String, Double, Double, Long, Long)]): Double = {
    val n1 = cells.map(_._4).sum.toDouble
    cells.map { case (_, _, q, c1, _) =>
      val e = q * n1
      if (e <= 0) 0.0 else (c1 - e) * (c1 - e) / e
    }.sum
  }

  /** Exact two-sample Kolmogorov-Smirnov statistic: max |F1 - F2| via a
    * merged sort with running per-source counts. Deterministic and
    * SQL-restatable. */
  def ksStatistic(cur: DataFrame, ref: DataFrame, column: String): Double = {
    val n1 = cur.filter(col(column).isNotNull).count().toDouble
    val n2 = ref.filter(col(column).isNotNull).count().toDouble
    val a = cur.select(col(column).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("s1", lit(1L)).withColumn("s2", lit(0L))
    val b = ref.select(col(column).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .withColumn("s1", lit(0L)).withColumn("s2", lit(1L))
    // aggregate ties per distinct value FIRST: the CDF is defined at step
    // points, and cumulating raw rows would make the result depend on the
    // arbitrary ordering of tied rows
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a.unionAll(b)
      .groupBy(col("v")).agg(sum(col("s1")).as("c1"), sum(col("s2")).as("c2"))
      .withColumn("f1", sum(col("c1")).over(w) / n1)
      .withColumn("f2", sum(col("c2")).over(w) / n2)
      // coalesce: both samples empty -> no step points -> max() is NULL;
      // two empty distributions are identical, statistic 0 (same
      // degenerate-input hardening as wasserstein above)
      .agg(coalesce(max(abs(col("f1") - col("f2"))), lit(0.0)))
      .head().getDouble(0)
  }

  /** 1-D Wasserstein-1 distance = ∫|F1-F2| dv over the merged support. */
  def wasserstein(cur: DataFrame, ref: DataFrame, column: String): Double = {
    val n1 = cur.filter(col(column).isNotNull).count().toDouble
    val n2 = ref.filter(col(column).isNotNull).count().toDouble
    val a = cur.select(col(column).cast("double").as("v"))
      .filter(col("v").isNotNull).withColumn("s1", lit(1L)).withColumn("s2", lit(0L))
    val b = ref.select(col(column).cast("double").as("v"))
      .filter(col("v").isNotNull).withColumn("s1", lit(0L)).withColumn("s2", lit(1L))
    val cum = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val step = a.unionAll(b)
      .groupBy(col("v")).agg(sum(col("s1")).as("c1"), sum(col("s2")).as("c2"))
      .withColumn("f1", sum(col("c1")).over(Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)) / n1)
      .withColumn("f2", sum(col("c2")).over(Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, 0)) / n2)
      .withColumn("next_v", lead(col("v"), 1).over(Window.orderBy(col("v"))))
    // coalesce: with a SINGLE pooled distinct value (two identical
    // degenerate samples) every row's next_v is null, the filter leaves
    // zero rows and sum() is NULL — the integral over an empty support
    // is 0, not a ROW_VALUE_IS_NULL crash (r15: surfaced by a GraftProps
    // seed; latent since the operator landed)
    step.filter(col("next_v").isNotNull)
      .agg(coalesce(
        sum(abs(col("f1") - col("f2")) * (col("next_v") - col("v"))),
        lit(0.0)))
      .head().getDouble(0)
  }

  /** Per-distinct-value pooled CDF table used by CvM / AD: rows of
    * (value, c1, c2, F1, F2, H) with H the pooled CDF. Bounded collect:
    * only distinct values travel to the driver — callers document the
    * moderate-cardinality contract (same practical bound the reference
    * accepts for these statistics). */
  private def pooledCdf(cur: DataFrame, ref: DataFrame, column: String)
      : (Double, Double, Seq[(Double, Long, Long, Double, Double)]) = {
    val a = cur.select(col(column).cast("double").as("v"))
      .filter(col("v").isNotNull).withColumn("s1", lit(1L)).withColumn("s2", lit(0L))
    val b = ref.select(col(column).cast("double").as("v"))
      .filter(col("v").isNotNull).withColumn("s1", lit(0L)).withColumn("s2", lit(1L))
    val w = Window.orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val maxDistinct = 1000000
    val rows = a.unionAll(b)
      .groupBy(col("v")).agg(sum(col("s1")).as("c1"), sum(col("s2")).as("c2"))
      .withColumn("F1c", sum(col("c1")).over(w))
      .withColumn("F2c", sum(col("c2")).over(w))
      .orderBy(col("v")).limit(maxDistinct + 1).collect()
    require(rows.length <= maxDistinct,
      s"$column has >$maxDistinct distinct values — exact CvM/AD would " +
        "collect unboundedly; bin the column first")
    val n1 = rows.map(_.getAs[Long]("c1")).sum.toDouble
    val n2 = rows.map(_.getAs[Long]("c2")).sum.toDouble
    (n1, n2, rows.toSeq.map(r => (r.getAs[Double]("v"), r.getAs[Long]("c1"),
      r.getAs[Long]("c2"), r.getAs[Long]("F1c") / n1, r.getAs[Long]("F2c") / n2)))
  }

  /** Two-sample Cramér-von Mises statistic:
    * T = n1*n2/(n1+n2)^2 * Σ_pooled (F1(x)-F2(x))^2 (each pooled
    * observation weighted by its multiplicity). */
  def cramerVonMises(cur: DataFrame, ref: DataFrame, column: String): Double = {
    val (n1, n2, rows) = pooledCdf(cur, ref, column)
    val s = rows.map { case (_, c1, c2, f1, f2) =>
      (c1 + c2) * (f1 - f2) * (f1 - f2)
    }.sum
    n1 * n2 / math.pow(n1 + n2, 2) * s
  }

  /** Two-sample Anderson-Darling statistic (weighted tail-sensitive CDF
    * distance): A2 = (n1*n2/N) * Σ (F1-F2)^2 * (c1+c2) / (H(1-H) * N),
    * skipping pooled-CDF endpoints where H(1-H)=0. */
  def andersonDarling(cur: DataFrame, ref: DataFrame, column: String): Double = {
    val (n1, n2, rows) = pooledCdf(cur, ref, column)
    val nTot = n1 + n2
    val s = rows.map { case (_, c1, c2, f1, f2) =>
      val h = (f1 * n1 + f2 * n2) / nTot
      val w = h * (1 - h)
      if (w <= 0) 0.0 else (c1 + c2) * (f1 - f2) * (f1 - f2) / w
    }.sum
    n1 * n2 / (nTot * nTot) * s
  }

  /** One-job bounded sample: order by a seeded hash of (value, row-id)
    * and take the global top-k — Spark plans this as
    * TakeOrderedAndProject (per-partition top-k + driver merge), so it is
    * a single job with O(k) driver memory: no count() pre-pass, no full
    * collect. Hashing the row-id in keeps heavy-tie columns unbiased (a
    * value's copies scatter across the hash order instead of clumping);
    * like the seeded `sample()` it replaces, the draw is deterministic
    * for a fixed partition layout. */
  private def hashSample(df: DataFrame, column: String,
                         sampleSize: Int): Array[Double] =
    df.select(col(column).cast("double").as("v"))
      .filter(col("v").isNotNull)
      .orderBy(xxhash64(col("v"), monotonically_increasing_id() + lit(42L)))
      .limit(sampleSize)
      .collect().map(_.getDouble(0))

  /** Energy distance on bounded deterministic samples (the reference also
    * computes the O(n^2) statistics on samples). */
  def energyDistance(cur: DataFrame, ref: DataFrame, column: String,
                     sampleSize: Int = 500): Double = {
    val x = hashSample(cur, column, sampleSize)
    val y = hashSample(ref, column, sampleSize)
    def meanAbsDiff(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0
      var i = 0
      while (i < a.length) {
        var j = 0
        while (j < b.length) { s += math.abs(a(i) - b(j)); j += 1 }
        i += 1
      }
      s / (a.length.toDouble * b.length)
    }
    2 * meanAbsDiff(x, y) - meanAbsDiff(x, x) - meanAbsDiff(y, y)
  }

  /** Maximum Mean Discrepancy (RBF kernel, bandwidth = median pairwise
    * distance heuristic) on bounded deterministic samples. */
  def mmd(cur: DataFrame, ref: DataFrame, column: String,
          sampleSize: Int = 500): Double = {
    val x = hashSample(cur, column, sampleSize)
    val y = hashSample(ref, column, sampleSize)
    val all = x ++ y
    val dists = for (i <- all.indices; j <- (i + 1) until all.length)
      yield math.abs(all(i) - all(j))
    val sorted = dists.sorted
    val gamma = {
      val med = if (sorted.isEmpty) 1.0 else sorted(sorted.length / 2)
      if (med == 0) 1.0 else 1.0 / (2 * med * med)
    }
    def k(a: Double, b: Double) = math.exp(-gamma * (a - b) * (a - b))
    def meanK(p: Array[Double], q: Array[Double]) =
      p.flatMap(a => q.map(b => k(a, b))).sum / (p.length.toDouble * q.length)
    meanK(x, x) + meanK(y, y) - 2 * meanK(x, y)
  }

  /** Binned approximate KS: max CDF gap over equal-width bin boundaries.
    * The 100 TB path — shuffle O(bins), no per-distinct-value state; error
    * vs exact KS is bounded by the largest single-bin mass. */
  def ksBinned(cur: DataFrame, ref: DataFrame, column: String,
               bins: Int, lo: Double, hi: Double): Double = {
    val pq = binnedPq(cur, ref, column, bins, lo, hi).sortBy(_._1)
    var (f1, f2, best) = (0.0, 0.0, 0.0)
    pq.foreach { case (_, p, q) =>
      f1 += p; f2 += q
      best = math.max(best, math.abs(f1 - f2))
    }
    best
  }

  /** Cardinality guard for the exact per-distinct-value CDF statistics
    * (KS / W1 / CvM / AD). Their global window is over DISTINCT values —
    * fine at oracle scale, but a single-task sort when a continuous
    * column has 100 TB-scale cardinality. Above `maxExactDistinct`
    * merged distinct values, both frames are re-expressed on equal-width
    * bin MIDPOINTS and the SAME exact machinery runs over ≤ bins
    * distinct values: shuffle and sort become O(bins), error bounded by
    * the largest single-bin mass. This is the default dispatch the
    * q-surface uses; the raw exact forms stay available for bounded
    * domains. */
  def autoBin(cur: DataFrame, ref: DataFrame, column: String,
      maxExactDistinct: Long = 65536, bins: Int = 4096)
      : (DataFrame, DataFrame) = {
    // One fused scan decides the dispatch AND supplies the bin bounds —
    // cardinality, min and max are all global aggregates over the same
    // union, so computing them in separate jobs would read the data twice.
    val row = cur.select(col(column).cast("double").as("v"))
      .unionAll(ref.select(col(column).cast("double").as("v")))
      .agg(approx_count_distinct(col("v")), min(col("v")), max(col("v")))
      .head()
    val d = row.getLong(0)
    if (d <= maxExactDistinct) (cur, ref)
    else {
      val (lo, hi) = (row.getDouble(1), row.getDouble(2))
      val w = if (hi > lo) (hi - lo) / bins else 1.0
      def bucketize(df: DataFrame): DataFrame = {
        val b = least(greatest(floor((col(column).cast("double") - lo) / w),
          lit(0)), lit(bins - 1))
        df.withColumn(column, (lit(lo) + (b + 0.5) * w).cast("double"))
      }
      (bucketize(cur), bucketize(ref))
    }
  }

  def ksAuto(cur: DataFrame, ref: DataFrame, column: String,
      maxExactDistinct: Long = 65536, bins: Int = 4096): Double = {
    val (c, r) = autoBin(cur, ref, column, maxExactDistinct, bins)
    ksStatistic(c, r, column)
  }
  def wassersteinAuto(cur: DataFrame, ref: DataFrame, column: String,
      maxExactDistinct: Long = 65536, bins: Int = 4096): Double = {
    val (c, r) = autoBin(cur, ref, column, maxExactDistinct, bins)
    wasserstein(c, r, column)
  }
  def cramerVonMisesAuto(cur: DataFrame, ref: DataFrame, column: String,
      maxExactDistinct: Long = 65536, bins: Int = 4096): Double = {
    val (c, r) = autoBin(cur, ref, column, maxExactDistinct, bins)
    cramerVonMises(c, r, column)
  }
  def andersonDarlingAuto(cur: DataFrame, ref: DataFrame, column: String,
      maxExactDistinct: Long = 65536, bins: Int = 4096): Double = {
    val (c, r) = autoBin(cur, ref, column, maxExactDistinct, bins)
    andersonDarling(c, r, column)
  }

  /** Mean / variance / quantile drift: relative stat difference. The
    * median form is size-gated like the validator family
    * ([[graft.core.SizeGate]]): per frame, an HLL probe routes
    * over-budget columns to `percentile_approx` instead of exact
    * `percentile`'s O(distinct) buffer. */
  def statDrift(cur: DataFrame, ref: DataFrame, column: String,
                stat: String,
                maxExactDistinct: Long =
                  graft.core.SizeGate.DefaultMaxExactDistinct): Double = {
    def one(df: DataFrame): Double = {
      val c = stat match {
        case "mean"     => avg(col(column))
        case "variance" => var_samp(col(column))
        case "median"   =>
          graft.ops.Exprs.gatedPct(df, column, maxExactDistinct)(column, 0.5)
      }
      df.agg(c).head().getDouble(0)
    }
    val a = one(cur); val b = one(ref)
    if (b == 0) (if (a == 0) 0.0 else Double.PositiveInfinity)
    else math.abs(a - b) / math.abs(b)
  }

  /** RangeDriftValidator (reference `drift/numeric.py:295`): min/max
    * shift versus a reference frame, as one row per checked stat with
    * the reference's flagging rule — pct change above `thresholdPct`,
    * and under `allowExpansion` only SHRINKAGE alerts (min rising or
    * max falling); a zero reference stat never flags. One min+max
    * aggregate per frame; the comparison is driver math over four
    * scalars, like the other drift statistics. */
  def rangeDrift(cur: DataFrame, ref: DataFrame, column: String,
                 thresholdPct: Double = 10.0, allowExpansion: Boolean = false,
                 checkMin: Boolean = true, checkMax: Boolean = true)
      : DataFrame = {
    def minMax(df: DataFrame): (Double, Double) = {
      val r = df.agg(min(col(column)).cast("double"),
        max(col(column)).cast("double")).head()
      (if (r.isNullAt(0)) 0.0 else r.getDouble(0),
       if (r.isNullAt(1)) 0.0 else r.getDouble(1))
    }
    val (refMin, refMax) = minMax(ref)
    val (curMin, curMax) = minMax(cur)
    val stats =
      (if (checkMin) Seq(("min", refMin, curMin)) else Nil) ++
      (if (checkMax) Seq(("max", refMax, curMax)) else Nil)
    val rows = stats.map { case (stat, r, c) =>
      val pct = if (r == 0) 0.0 else math.abs(c - r) / math.abs(r) * 100.0
      val shrink = (stat == "min" && c > r) || (stat == "max" && c < r)
      val flagged = r != 0 && pct > thresholdPct &&
        (!allowExpansion || shrink)
      (stat, r, c, math.rint(pct * 1e6) / 1e6, flagged)
    }
    val spark = cur.sparkSession
    import spark.implicits._
    rows.toDF("stat", "ref_value", "cur_value", "pct_change", "flagged")
  }
}
