package graft.drift

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concept and multivariate drift detection (reference: truthound
  * `ml/drift_detection/concept.py` ConceptDriftDetector — feature-target
  * correlation change + target-distribution shift — and
  * `ml/drift_detection/multivariate.py` MultivariateDriftDetector —
  * correlation-matrix change, PCA-subspace variance change, Mahalanobis
  * mean shift).
  *
  * Spark-first shape: the reference collects frames and loops per column
  * in Python. Every statistic here reduces to ONE fused aggregate per
  * frame — `corr`/`covar_samp`/`avg`/`stddev` pairs all evaluate in a
  * single scan regardless of column count — followed by O(k²) driver math
  * on the k×k matrix (k = feature count, never data-scale). Power
  * iteration for the PCA path runs on the driver over the k×k matrix with
  * a deterministic start vector, so results are reproducible and no
  * per-row projection job is needed: the variance of data projected onto
  * component v equals vᵀ·C·v for the (reference-standardized) covariance
  * C, which comes out of the same fused aggregate. */
final case class DriftScore(isDrifted: Boolean, driftScore: Double,
    driftType: String, columnScores: Seq[(String, Double)], details: String)

object ConceptDrift {

  /** corr(feature, target) for every feature in ONE scan. Null-safe:
    * Spark's `corr` ignores null pairs; a constant column yields NaN which
    * we map to 0.0 (no linear relationship), matching the reference's
    * exception fallback (`concept.py:283-286`). */
  def correlations(df: DataFrame, features: Seq[String], target: String)
      : Map[String, Double] = {
    val aggs = features.map(f => corr(col(f), col(target)).as(f))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    features.zipWithIndex.map { case (f, i) =>
      val v = if (row.isNullAt(i)) 0.0 else row.getDouble(i)
      f -> (if (v.isNaN) 0.0 else v)
    }.toMap
  }

  /** Mean/std of the target in one scan (numeric targets; the reference
    * additionally histograms categorical targets — use Drift.psi/tv on
    * the target column for that case). */
  private def targetStats(df: DataFrame, target: String): (Double, Double) = {
    val r = df.agg(avg(col(target)), stddev_pop(col(target))).head()
    (if (r.isNullAt(0)) 0.0 else r.getDouble(0),
     if (r.isNullAt(1)) 0.0 else r.getDouble(1))
  }

  /** Reference `concept.py:224-326`: per-feature score =
    * min(1, |Δcorr| / 0.5), +0.5 sign-change penalty when both |corr| >
    * 0.1; target-shift score from the standardized mean move; overall =
    * max score; drifted when max ≥ `threshold`. */
  def detect(reference: DataFrame, current: DataFrame,
      features: Seq[String], target: String,
      threshold: Double = 0.5): DriftScore = {
    val refC = correlations(reference, features, target)
    val curC = correlations(current, features, target)
    val changes = Seq.newBuilder[String]
    val scores = features.map { f =>
      val (r0, c0) = (refC(f), curC(f))
      var diff = math.abs(c0 - r0)
      if (r0 * c0 < 0 && math.abs(r0) > 0.1 && math.abs(c0) > 0.1) {
        diff += 0.5
        changes += s"$f: sign changed"
      }
      val score = math.min(1.0, diff / 0.5)
      if (score > 0.3) changes += f"$f: $r0%.2f -> $c0%.2f"
      f -> score
    }
    // target shift: standardized mean move, 3 reference-sigmas = score 1
    val (mRef, sRef) = targetStats(reference, target)
    val (mCur, _) = targetStats(current, target)
    val targetScore =
      if (sRef > 0) math.min(1.0, math.abs(mCur - mRef) / (3 * sRef))
      else if (mCur != mRef) 1.0 else 0.0
    val all = if (targetScore > 0.3)
      scores :+ ("_target_distribution" -> targetScore) else scores
    val maxScore = if (all.isEmpty) 0.0 else all.map(_._2).max
    val driftType =
      if (targetScore >= threshold) "target_shift"
      else if (maxScore >= threshold) {
        val n = scores.count(_._2 >= threshold)
        if (n > features.size / 2) "concept_shift" else "partial_concept_drift"
      } else "none"
    DriftScore(maxScore >= threshold, maxScore, driftType, all,
      changes.result().mkString("; ") match {
        case "" => "No significant changes"; case s => s })
  }
}

/** Per-feature drift profiles and scores (reference
  * `ml/drift_detection/feature.py`: numeric mean/std/range/null-ratio
  * drift, categorical new/missing-value and proportion drift; overall
  * score = max over components).
  *
  * Spark-first: the reference profiles column-by-column over a collected
  * frame; here ALL numeric profiles come out of ONE fused aggregate per
  * frame, and each categorical column is one bounded groupBy (the same
  * maxCategories discipline as Drift.categoricalPq). */
object FeatureDrift {

  final case class NumericProfile(count: Long, nullCount: Long,
      mean: Double, std: Double, min: Double, max: Double) {
    def nullRatio: Double =
      if (count + nullCount == 0) 0.0
      else nullCount.toDouble / (count + nullCount)
  }

  /** Numeric profiles for every column in ONE scan. */
  def profileNumeric(df: DataFrame, cols: Seq[String])
      : Map[String, NumericProfile] = {
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      count(when(col(c).isNull, 1)).as(s"${c}__nn"),
      // double casts: decimal columns would otherwise surface as
      // java.math.BigDecimal and break the typed row reads below
      avg(col(c)).cast("double").as(s"${c}__mean"),
      stddev_samp(col(c)).cast("double").as(s"${c}__std"),
      min(col(c)).cast("double").as(s"${c}__min"),
      max(col(c)).cast("double").as(s"${c}__max")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.zipWithIndex.map { case (c, i) =>
      val b = i * 6
      def d(j: Int) = if (row.isNullAt(b + j)) 0.0 else
        row.getDouble(b + j) match { case v if v.isNaN => 0.0; case v => v }
      c -> NumericProfile(row.getLong(b), row.getLong(b + 1),
        d(2), d(3), d(4), d(5))
    }.toMap
  }

  /** Categorical proportions (value -> share of ALL rows, matching the
    * reference's `c / total`); bounded driver collect. ONE job: the
    * groupBy is null-INCLUSIVE, so total rows and the null share derive
    * from the same aggregate instead of a separate count() scan. */
  def profileCategorical(df: DataFrame, column: String,
      maxCategories: Int = 100000): (Map[String, Double], Double) = {
    val rows = df.groupBy(col(column).cast("string").as("v"))
      .agg(count(lit(1)).as("n")).limit(maxCategories + 2).collect()
    val (nullRows, valRows) = rows.partition(_.isNullAt(0))
    require(valRows.length <= maxCategories,
      s"$column exceeds $maxCategories categories — not categorical")
    // no truncation happened: ≤ maxCategories value groups + ≤ 1 null
    // group is strictly under the limit, so the sums below are complete
    val nulls = nullRows.map(_.getAs[Long]("n")).sum
    val total = nulls + valRows.map(_.getAs[Long]("n")).sum
    (valRows.map(r => r.getString(0) ->
        r.getAs[Long]("n").toDouble / math.max(total, 1)).toMap,
     if (total == 0) 0.0 else nulls.toDouble / total)
  }

  /** Reference `feature.py:322-381` numeric scoring
    * (relative_threshold form): mean shift in reference sigmas (3σ
    * saturates), std ratio change, range-exceeded adds a 0.5 component,
    * null-ratio change above 0.1; score = max component. */
  def numericScore(ref: NumericProfile, cur: NumericProfile): Double = {
    val comps = Seq.newBuilder[Double]
    val meanDrift =
      if (ref.std > 0) math.min(1.0, (math.abs(cur.mean - ref.mean) / ref.std) / 3.0)
      else if (cur.mean != ref.mean) math.min(1.0, math.abs(cur.mean - ref.mean) / 3.0)
      else 0.0
    comps += meanDrift
    if (ref.std > 0) comps += math.min(1.0, math.abs(cur.std / ref.std - 1.0))
    if (cur.min < ref.min || cur.max > ref.max) comps += 0.5
    val nullDrift = math.abs(cur.nullRatio - ref.nullRatio)
    if (nullDrift > 0.1) comps += nullDrift
    val all = comps.result()
    if (all.isEmpty) 0.0 else all.max
  }

  /** Reference `feature.py:383-434` categorical scoring: new-value
    * share > 5%, vanished-value reference share > 10%, max proportion
    * change > 10%, null-ratio change > 10%; score = max component. */
  def categoricalScore(refProps: Map[String, Double], refNull: Double,
      curProps: Map[String, Double], curNull: Double): Double = {
    val comps = Seq.newBuilder[Double]
    val newShare = (curProps.keySet -- refProps.keySet).toSeq
      .map(curProps).sum
    if (newShare > 0.05) comps += newShare
    val missingShare = (refProps.keySet -- curProps.keySet).toSeq
      .map(refProps).sum
    if (missingShare > 0.1) comps += missingShare
    val common = refProps.keySet & curProps.keySet
    val maxProp = if (common.isEmpty) 0.0
      else common.map(v => math.abs(curProps(v) - refProps(v))).max
    if (maxProp > 0.1) comps += maxProp
    val nullDrift = math.abs(curNull - refNull)
    if (nullDrift > 0.1) comps += nullDrift
    val all = comps.result()
    if (all.isEmpty) 0.0 else all.max
  }

  /** Per-feature drift over numeric columns: two fused scans total. */
  def detectNumeric(reference: DataFrame, current: DataFrame,
      cols: Seq[String], threshold: Double = 0.5): DriftScore = {
    val ref = profileNumeric(reference, cols)
    val cur = profileNumeric(current, cols)
    val scores = cols.map(c => c -> numericScore(ref(c), cur(c)))
    val maxScore = if (scores.isEmpty) 0.0 else scores.map(_._2).max
    DriftScore(maxScore >= threshold, maxScore,
      if (maxScore >= threshold) "feature_drift" else "none", scores,
      scores.filter(_._2 >= threshold).map(_._1).mkString(", ") match {
        case "" => "No drifted features"; case s => s"Drifted: $s" })
  }
}

object MultivariateDrift {

  /** Full k×k correlation matrix in ONE scan (k(k-1)/2 corr aggregates
    * fused); NaN (constant column) → 0. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): Array[Array[Double]] = {
    val k = cols.size
    val pairs = for { i <- 0 until k; j <- (i + 1) until k }
      yield (i, j, corr(col(cols(i)), col(cols(j))))
    val row = df.agg(pairs.head._3, pairs.tail.map(_._3): _*).head()
    val m = Array.fill(k, k)(0.0)
    for (i <- 0 until k) m(i)(i) = 1.0
    pairs.zipWithIndex.foreach { case ((i, j, _), idx) =>
      val v = if (row.isNullAt(idx)) 0.0 else row.getDouble(idx)
      val c = if (v.isNaN) 0.0 else v
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  /** Per-column mean and population std in one scan. */
  def meansStds(df: DataFrame, cols: Seq[String])
      : (Array[Double], Array[Double]) = {
    val aggs = cols.map(c => avg(col(c))) ++ cols.map(c => stddev_pop(col(c)))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def get(i: Int) =
      if (row.isNullAt(i)) 0.0
      else { val v = row.getDouble(i); if (v.isNaN) 0.0 else v }
    (Array.tabulate(cols.size)(get),
     Array.tabulate(cols.size)(i => get(cols.size + i)))
  }

  /** Reference `multivariate.py:352-385` correlation method: max pairwise
    * |Δcorr|, score = min(1, max/0.5); per-column score = its average
    * |Δcorr| against the other columns. */
  def detectCorrelation(reference: DataFrame, current: DataFrame,
      cols: Seq[String], threshold: Double = 0.5,
      correlationThreshold: Double = 0.3): DriftScore = {
    require(cols.size >= 2, "multivariate drift needs >= 2 columns")
    val ref = corrMatrix(reference, cols)
    val cur = corrMatrix(current, cols)
    val k = cols.size
    var maxDiff = 0.0
    val changed = Seq.newBuilder[String]
    for (i <- 0 until k; j <- (i + 1) until k) {
      val d = math.abs(cur(i)(j) - ref(i)(j))
      if (d > maxDiff) maxDiff = d
      if (d > correlationThreshold)
        changed += f"${cols(i)}-${cols(j)}: ${ref(i)(j)}%.2f->${cur(i)(j)}%.2f"
    }
    val colScores = cols.zipWithIndex.map { case (c, i) =>
      val ds = (0 until k).filter(_ != i)
        .map(j => math.abs(ref(i)(j) - cur(i)(j)))
      c -> (if (ds.isEmpty) 0.0 else ds.sum / ds.size)
    }
    val score = math.min(1.0, maxDiff / 0.5)
    DriftScore(score >= threshold, score,
      if (score >= threshold) "correlation_shift" else "none", colScores,
      f"Max correlation change: $maxDiff%.3f" + {
        val c = changed.result(); if (c.isEmpty) "" else
          ", Changed pairs: " + c.take(3).mkString(", ") })
  }

  /** Power iteration on a k×k symmetric matrix with deterministic start
    * (unit vector with mild index skew — no RNG, reproducible plans).
    * Returns (components, eigenvalues), largest first, deflating between
    * components (reference `multivariate.py:195-268`). */
  def powerIteration(m: Array[Array[Double]], nComponents: Int,
      iters: Int = 100): (Array[Array[Double]], Array[Double]) = {
    val k = m.length
    val a = m.map(_.clone())
    val comps = Array.ofDim[Array[Double]](nComponents)
    val eigs = Array.ofDim[Double](nComponents)
    for (c <- 0 until nComponents) {
      var v = Array.tabulate(k)(i => 1.0 + 0.01 * (i + 1))
      val n0 = math.sqrt(v.map(x => x * x).sum)
      v = v.map(_ / n0)
      var it = 0
      while (it < iters) {
        val nv = Array.tabulate(k)(i =>
          (0 until k).map(j => a(i)(j) * v(j)).sum)
        val norm = math.sqrt(nv.map(x => x * x).sum)
        if (norm > 0) v = nv.map(_ / norm)
        it += 1
      }
      val eig = (0 until k).map(i =>
        v(i) * (0 until k).map(j => a(i)(j) * v(j)).sum).sum
      comps(c) = v; eigs(c) = math.max(0, eig)
      for (i <- 0 until k; j <- 0 until k) a(i)(j) -= eig * v(i) * v(j)
    }
    (comps, eigs)
  }

  /** Covariance matrix of current data standardized by REFERENCE
    * means/stds, in one scan: cov(z_i, z_j) = covar_pop(x_i, x_j)/(s_i
    * s_j). This is what the reference's per-row projection loop computes
    * (`multivariate.py:386-460`) — var(proj onto v) = vᵀ C v. */
  private def stdCov(df: DataFrame, cols: Seq[String], stds: Array[Double])
      : Array[Array[Double]] = {
    val k = cols.size
    val pairs = for { i <- 0 until k; j <- i until k }
      yield (i, j, covar_pop(col(cols(i)), col(cols(j))))
    val row = df.agg(pairs.head._3, pairs.tail.map(_._3): _*).head()
    val m = Array.fill(k, k)(0.0)
    pairs.zipWithIndex.foreach { case ((i, j, _), idx) =>
      val v = if (row.isNullAt(idx)) 0.0 else row.getDouble(idx)
      val si = if (stds(i) > 0) stds(i) else 1.0
      val sj = if (stds(j) > 0) stds(j) else 1.0
      val c = (if (v.isNaN) 0.0 else v) / (si * sj)
      m(i)(j) = c; m(j)(i) = c
    }
    m
  }

  /** PCA method: fit top components on the reference's standardized
    * covariance (= correlation) matrix; score = max relative change of
    * the variance captured by each reference component on current data. */
  def detectPca(reference: DataFrame, current: DataFrame, cols: Seq[String],
      nComponents: Int = 0, threshold: Double = 0.5): DriftScore = {
    require(cols.size >= 2, "multivariate drift needs >= 2 columns")
    val k = cols.size
    val nc = if (nComponents > 0) nComponents else math.min(5, k)
    val (_, refStds) = meansStds(reference, cols)
    val refCorr = corrMatrix(reference, cols)
    val (comps, refVar) = powerIteration(refCorr, nc)
    val curCov = stdCov(current, cols, refStds)
    def quad(v: Array[Double], m: Array[Array[Double]]): Double =
      (0 until k).map(i => v(i) * (0 until k).map(j => m(i)(j) * v(j)).sum).sum
    var maxVarDiff = 0.0
    for (c <- 0 until nc if refVar(c) > 0) {
      val cv = quad(comps(c), curCov)
      maxVarDiff = math.max(maxVarDiff, math.abs(cv - refVar(c)) / refVar(c))
    }
    val score = math.min(1.0, maxVarDiff)
    val colScores = cols.zipWithIndex.map { case (c, i) =>
      c -> comps.map(v => math.abs(v(i))).sum * score }
    DriftScore(score >= threshold, score,
      if (score >= threshold) "manifold_shift" else "none", colScores,
      f"Max variance change ratio: $maxVarDiff%.3f")
  }

  /** Mahalanobis method (reference `multivariate.py:447+`): distance of
    * the current mean vector from the reference mean under the
    * reference's correlation structure (Gauss-Jordan inverse of the k×k
    * matrix, ridge-regularized for stability). Score = min(1, d/3) —
    * three sigmas of standardized mean shift saturate the score. */
  def detectMahalanobis(reference: DataFrame, current: DataFrame,
      cols: Seq[String], threshold: Double = 0.5): DriftScore = {
    require(cols.size >= 2, "multivariate drift needs >= 2 columns")
    val k = cols.size
    val (refMeans, refStds) = meansStds(reference, cols)
    val (curMeans, _) = meansStds(current, cols)
    val corrM = corrMatrix(reference, cols)
    // ridge for invertibility of near-singular correlation structures
    val a = Array.tabulate(k, k)((i, j) =>
      corrM(i)(j) + (if (i == j) 1e-6 else 0.0))
    val inv = invert(a)
    val d = Array.tabulate(k)(i =>
      (curMeans(i) - refMeans(i)) / (if (refStds(i) > 0) refStds(i) else 1.0))
    val dist = math.sqrt(math.max(0.0, (0 until k).map(i =>
      d(i) * (0 until k).map(j => inv(i)(j) * d(j)).sum).sum))
    val score = math.min(1.0, dist / 3.0)
    val colScores = cols.indices.map(i => cols(i) -> math.abs(d(i)))
    DriftScore(score >= threshold, score,
      if (score >= threshold) "multivariate_shift" else "none", colScores,
      f"Mahalanobis mean distance: $dist%.3f")
  }

  /** Gauss-Jordan inverse of a small k×k matrix (driver-side, k =
    * feature count). */
  private[graft] def invert(m: Array[Array[Double]]): Array[Array[Double]] = {
    val k = m.length
    val a = m.map(_.clone())
    val inv = Array.tabulate(k, k)((i, j) => if (i == j) 1.0 else 0.0)
    for (col0 <- 0 until k) {
      var piv = col0
      for (r <- col0 + 1 until k)
        if (math.abs(a(r)(col0)) > math.abs(a(piv)(col0))) piv = r
      val t = a(col0); a(col0) = a(piv); a(piv) = t
      val ti = inv(col0); inv(col0) = inv(piv); inv(piv) = ti
      val p = a(col0)(col0)
      require(math.abs(p) > 1e-12, "singular matrix in Mahalanobis inverse")
      for (j <- 0 until k) { a(col0)(j) /= p; inv(col0)(j) /= p }
      for (r <- 0 until k if r != col0) {
        val f = a(r)(col0)
        if (f != 0.0)
          for (j <- 0 until k) {
            a(r)(j) -= f * a(col0)(j); inv(r)(j) -= f * inv(col0)(j)
          }
      }
    }
    inv
  }
}
