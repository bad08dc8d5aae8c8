package graft.validators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Anomaly validators (reference: truthound `validators/anomaly/`, 17
  * classes — statistical.py: IQR/MAD/Grubbs/TukeyFences/Percentile;
  * multivariate.py: Mahalanobis/ZScoreMultivariate; ml_based.py delegates
  * to sampled sklearn — here the statistical ones are exact-distributed
  * and the multivariate ones use fused covariance aggregates + driver-side
  * small-matrix math. IQR lives in Distribution.scala (IqrOutlierCheck);
  * TukeyFences is IqrOutlierCheck(k=3). */

/** MADOutlierValidator: |x - median| > k * MAD (robust z). Three bounded
  * aggregation passes (median -> MAD -> count), each map-side combined. */
final case class MadOutlierCheck(column: String, k: Double = 3.0,
    exact: Boolean = true,
    maxExactDistinct: Long = SizeGate.DefaultMaxExactDistinct)
    extends Validator with DedicatedScan {
  val name = s"mad_outlier[$column]"
  val category = "anomaly"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  // exact mode uses interpolating `percentile` (matches SQL quantile_cont);
  // approximate mode uses the t-digest percentile_approx for huge inputs.
  // As a DedicatedScan this validator owns its jobs, so the SizeGate
  // probe runs inline: one cheap HLL agg before the median passes, and
  // over-budget columns route to approx (distinct(abs(x - med)) never
  // exceeds distinct(x), so one probe covers both passes).
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val ex = exact && (maxExactDistinct <= 0 ||
      df.agg(approx_count_distinct(col(column), 0.05)).head().getLong(0)
        <= maxExactDistinct)
    def pct(sql: String): Column =
      if (ex) expr(s"percentile($sql, 0.5)")
      else expr(s"percentile_approx($sql, 0.5, 10000)")
    val med = df.agg(pct(column)).head().getDouble(0)
    val mad = df.agg(pct(s"abs($column - $med)")).head().getDouble(0)
    if (mad == 0.0) return Nil
    val n = df.filter(abs(col(column) - med) > k * mad).count()
    if (n > 0)
      Seq(issue(column, "mad_outliers", n, total, Severity.Medium,
        expected = f"|x-$med%.4f| <= $k*$mad%.4f")) else Nil
  }
}

/** PercentileAnomalyValidator: values outside [pLow, pHigh] empirical
  * percentiles. Two-pass, fused. */
final case class PercentileAnomalyCheck(column: String, pLow: Double = 0.01,
    pHigh: Double = 0.99, maxRatio: Double = 0.0,
    maxExactDistinct: Long = SizeGate.DefaultMaxExactDistinct)
    extends Validator {
  val name = s"percentile_anomaly[$column]"
  val category = "anomaly"
  private val lk = MetricKey("p_low", column, s"$pLow/$maxExactDistinct")
  private val hk = MetricKey("p_high", column, s"$pHigh/$maxExactDistinct")
  private val vk = MetricKey("percentile_violations", column, s"$pLow/$pHigh")
  override def probeExprs(schema: StructType) =
    if (maxExactDistinct > 0) Seq(SizeGate.probeExpr(column)) else Nil
  override def statsExprs(schema: StructType) =
    statsExprs(schema, Metrics.empty)
  override def statsExprs(schema: StructType, probes: Metrics) =
    if (SizeGate.exactOk(probes, column, maxExactDistinct)) Seq(
      lk -> expr(s"percentile($column, $pLow)"),
      hk -> expr(s"percentile($column, $pHigh)"))
    else Seq(
      lk -> percentile_approx(col(column), lit(pLow), lit(10000)),
      hk -> percentile_approx(col(column), lit(pHigh), lit(10000)))
  def metricExprs(schema: StructType, stats: Metrics) = {
    val lo = stats.double(lk).getOrElse(Double.NegativeInfinity)
    val hi = stats.double(hk).getOrElse(Double.PositiveInfinity)
    Seq(vk -> count(when(col(column) < lo || col(column) > hi, 1)))
  }
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(vk)
    val ratio = if (total == 0) 0.0 else n.toDouble / total
    if (ratio > maxRatio && n > 0)
      Seq(issue(column, "percentile_outliers", n, total, Severity.Low)) else Nil
  }
}

/** GrubbsTestValidator: single-outlier test — max |z| vs the Grubbs
  * critical value at alpha (two-sided). Driver math uses the standard
  * t-distribution approximation. Two-pass fused. */
final case class GrubbsCheck(column: String, alpha: Double = 0.05)
    extends Validator {
  val name = s"grubbs[$column]"
  val category = "anomaly"
  private val mk = MetricKey("mean", column)
  private val sk = MetricKey("stddev", column)
  private val xk = MetricKey("grubbs_maxdev", column)
  override def statsExprs(schema: StructType) =
    Seq(mk -> avg(col(column)), sk -> stddev_samp(col(column)))
  def metricExprs(schema: StructType, stats: Metrics) = {
    val mean = stats.double(mk).getOrElse(0.0)
    Seq(xk -> max(abs(col(column) - mean)))
  }
  private def criticalValue(n: Long): Double = Grubbs.criticalValue(n, alpha)
  def evaluate(m: Metrics, total: Long) = {
    val sd = m.double(sk).getOrElse(0.0)
    if (sd == 0.0 || total < 3) Nil
    else {
      val g = m.double(xk).getOrElse(0.0) / sd
      val crit = criticalValue(total)
      if (g > crit)
        Seq(issue(column, "grubbs_outlier_detected", 1, total, Severity.Medium,
          expected = f"G<=$crit%.4f", actual = f"$g%.4f"))
      else Nil
    }
  }
}

/** Grubbs test driver math, shared by GrubbsCheck and the query surface
  * (public so the oracle query runs the exact same approximation chain). */
object Grubbs {
  /** Two-sided Grubbs critical value G = ((n-1)/sqrt(n)) *
    * sqrt(t^2 / (n - 2 + t^2)), t = t_{alpha/(2n), n-2}. */
  def criticalValue(n: Long, alpha: Double): Double = {
    if (n < 3) return Double.PositiveInfinity
    val dof = (n - 2).toDouble
    val p = alpha / (2.0 * n)
    val t = tQuantile(1 - p, dof)
    ((n - 1).toDouble / math.sqrt(n.toDouble)) *
      math.sqrt(t * t / (dof + t * t))
  }
  /** Student-t quantile via Cornish-Fisher expansion on the normal
    * quantile (standard approximation, adequate for the test). */
  def tQuantile(p: Double, dof: Double): Double = {
    val z = normQuantile(p)
    val g1 = (math.pow(z, 3) + z) / 4
    val g2 = (5 * math.pow(z, 5) + 16 * math.pow(z, 3) + 3 * z) / 96
    val g3 = (3 * math.pow(z, 7) + 19 * math.pow(z, 5) + 17 * math.pow(z, 3) - 15 * z) / 384
    z + g1 / dof + g2 / (dof * dof) + g3 / math.pow(dof, 3)
  }
  /** Acklam-style rational approximation of the standard normal quantile. */
  private def normQuantile(p: Double): Double = {
    // Beasley-Springer-Moro
    val a = Array(-3.969683028665376e+01, 2.209460984245205e+02,
      -2.759285104469687e+02, 1.383577518672690e+02, -3.066479806614716e+01,
      2.506628277459239e+00)
    val b = Array(-5.447609879822406e+01, 1.615858368580409e+02,
      -1.556989798598866e+02, 6.680131188771972e+01, -1.328068155288572e+01)
    val c = Array(-7.784894002430293e-03, -3.223964580411365e-01,
      -2.400758277161838e+00, -2.549732539343734e+00, 4.374664141464968e+00,
      2.938163982698783e+00)
    val d = Array(7.784695709041462e-03, 3.224671290700398e-01,
      2.445134137142996e+00, 3.754408661907416e+00)
    val pl = 0.02425
    if (p < pl) {
      val q = math.sqrt(-2 * math.log(p))
      (((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    } else if (p <= 1 - pl) {
      val q = p - 0.5; val r = q * q
      (((((a(0) * r + a(1)) * r + a(2)) * r + a(3)) * r + a(4)) * r + a(5)) * q /
        (((((b(0) * r + b(1)) * r + b(2)) * r + b(3)) * r + b(4)) * r + 1)
    } else {
      val q = math.sqrt(-2 * math.log(1 - p))
      -(((((c(0) * q + c(1)) * q + c(2)) * q + c(3)) * q + c(4)) * q + c(5)) /
        ((((d(0) * q + d(1)) * q + d(2)) * q + d(3)) * q + 1)
    }
  }
}

/** ZScoreMultivariateValidator: rows where ANY of the columns exceeds |z|>k
  * (marginal multivariate screen). Two-pass fused. */
final case class MultiZScoreCheck(columns: Seq[String], z: Double = 3.0,
    maxRatio: Double = 0.0) extends Validator {
  val name = s"multi_zscore[${columns.mkString(",")}]"
  val category = "anomaly"
  private def mk(c: String) = MetricKey("mean", c)
  private def sk(c: String) = MetricKey("stddev", c)
  private val vk = MetricKey("multi_z_violations", columns.mkString("+"), z.toString)
  override def statsExprs(schema: StructType) =
    columns.flatMap(c => Seq(mk(c) -> avg(col(c)), sk(c) -> stddev_samp(col(c))))
  def metricExprs(schema: StructType, stats: Metrics) = {
    val preds = columns.flatMap { c =>
      val m = stats.double(mk(c)).getOrElse(0.0)
      val s = stats.double(sk(c)).getOrElse(0.0)
      if (s == 0.0) None else Some(abs(col(c) - m) / s > z)
    }
    if (preds.isEmpty) Nil
    else Seq(vk -> count(when(preds.reduce(_ || _), 1)))
  }
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(vk)
    val ratio = if (total == 0) 0.0 else n.toDouble / total
    if (ratio > maxRatio && n > 0)
      Seq(issue(columns.mkString(","), "multivariate_z_outliers", n, total,
        Severity.Medium)) else Nil
  }
}

/** PCAAnomalyValidator (reference `anomaly/multivariate.py`): rows whose
  * reconstruction residual outside the top-k principal subspace exceeds
  * `maxResidual` are anomalies. Covariance from fused aggregates; the
  * small d x d eigendecomposition runs on the driver (cyclic Jacobi);
  * the residual is a quadratic form evaluated distributed in pass 2. */
final case class PcaAnomalyCheck(columns: Seq[String], k: Int,
    maxResidual: Double, maxRatio: Double = 0.0)
    extends Validator with DedicatedScan {
  require(columns.size >= 2 && k >= 1 && k < columns.size)
  val name = s"pca_anomaly[${columns.mkString(",")}]"
  val category = "anomaly"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val d = columns.size
    val aggs = columns.map(c => avg(col(c))) ++
      (for (i <- 0 until d; j <- 0 until d)
        yield covar_samp(col(columns(i)), col(columns(j))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    if (row.isNullAt(0)) return Nil
    val mu = (0 until d).map(row.getDouble)
    val cov = Array.tabulate(d, d)((i, j) => row.getDouble(d + i * d + j))
    val (vals, vecs) = jacobiEigen(cov)
    // residual projector: I - V_k V_k' over the top-k eigenvectors
    val order = vals.indices.sortBy(i => -vals(i)).take(k)
    val proj = Array.tabulate(d, d) { (i, j) =>
      val vv = order.map(e => vecs(i)(e) * vecs(j)(e)).sum
      (if (i == j) 1.0 else 0.0) - vv
    }
    val centered = columns.zipWithIndex.map { case (c, i) => col(c) - mu(i) }
    val residual = (for (i <- 0 until d; j <- 0 until d)
      yield centered(i) * centered(j) * proj(i)(j)).reduce(_ + _)
    val n = df.filter(residual > maxResidual).count()
    val ratio = if (total == 0) 0.0 else n.toDouble / total
    if (ratio > maxRatio && n > 0)
      Seq(issue(columns.mkString(","), "pca_residual_outliers", n, total,
        Severity.Medium, expected = s"residual<=$maxResidual")) else Nil
  }
  /** Cyclic Jacobi eigendecomposition for small symmetric matrices:
    * returns (eigenvalues, eigenvectors as columns of V). */
  private def jacobiEigen(m0: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val d = m0.length
    val a = m0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    while (sweep < 50) {
      var off = 0.0
      for (p <- 0 until d; q <- (p + 1) until d) off += a(p)(q) * a(p)(q)
      if (off < 1e-18) sweep = 50
      else {
        for (p <- 0 until d; q <- (p + 1) until d if math.abs(a(p)(q)) > 1e-15) {
          val theta = (a(q)(q) - a(p)(p)) / (2 * a(p)(q))
          val t = math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1))
          val c = 1.0 / math.sqrt(t * t + 1); val s = t * c
          for (i <- 0 until d) {
            val aip = a(i)(p); val aiq = a(i)(q)
            a(i)(p) = c * aip - s * aiq; a(i)(q) = s * aip + c * aiq
          }
          for (i <- 0 until d) {
            val api = a(p)(i); val aqi = a(q)(i)
            a(p)(i) = c * api - s * aqi; a(q)(i) = s * api + c * aqi
          }
          for (i <- 0 until d) {
            val vip = v(i)(p); val viq = v(i)(q)
            v(i)(p) = c * vip - s * viq; v(i)(q) = s * vip + c * viq
          }
        }
        sweep += 1
      }
    }
    ((0 until d).map(i => a(i)(i)).toArray, v)
  }
}

/** MahalanobisValidator: distance^2 = (x-mu)' Sigma^-1 (x-mu) > chi2
  * threshold. Covariance matrix from fused pairwise covar aggregates;
  * inverse on the driver (d x d, d small); second pass counts. */
final case class MahalanobisCheck(columns: Seq[String], threshold: Double,
    maxRatio: Double = 0.0) extends Validator with DedicatedScan {
  require(columns.size >= 2)
  val name = s"mahalanobis[${columns.mkString(",")}]"
  val category = "anomaly"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val d = columns.size
    val aggs = columns.map(c => avg(col(c))) ++
      (for (i <- 0 until d; j <- 0 until d)
        yield covar_samp(col(columns(i)), col(columns(j))))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val mu = (0 until d).map(row.getDouble)
    val cov = Array.tabulate(d, d)((i, j) => row.getDouble(d + i * d + j))
    val inv = invert(cov) match {
      case Some(m) => m
      case None => return Seq(issue(columns.mkString(","),
        "singular_covariance", 0, total, Severity.Low))
    }
    // dist^2 as a Column expression (d small => expression stays compact)
    val centered = columns.zipWithIndex.map { case (c, i) => col(c) - mu(i) }
    val dist2 = (for (i <- 0 until d; j <- 0 until d)
      yield centered(i) * centered(j) * inv(i)(j)).reduce(_ + _)
    val n = df.filter(dist2 > threshold).count()
    val ratio = if (total == 0) 0.0 else n.toDouble / total
    if (ratio > maxRatio && n > 0)
      Seq(issue(columns.mkString(","), "mahalanobis_outliers", n, total,
        Severity.Medium, expected = s"d2<=$threshold")) else Nil
  }
  /** Gauss-Jordan inverse for the small covariance matrix. */
  private def invert(m0: Array[Array[Double]]): Option[Array[Array[Double]]] = {
    val n = m0.length
    val a = m0.map(_.clone())
    val inv = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (c <- 0 until n) {
      val pivot = (c until n).maxBy(r => math.abs(a(r)(c)))
      if (math.abs(a(pivot)(c)) < 1e-12) return None
      val t = a(c); a(c) = a(pivot); a(pivot) = t
      val ti = inv(c); inv(c) = inv(pivot); inv(pivot) = ti
      val p = a(c)(c)
      for (j <- 0 until n) { a(c)(j) /= p; inv(c)(j) /= p }
      for (r <- 0 until n if r != c) {
        val f = a(r)(c)
        for (j <- 0 until n) { a(r)(j) -= f * a(c)(j); inv(r)(j) -= f * inv(c)(j) }
      }
    }
    Some(inv)
  }
}
