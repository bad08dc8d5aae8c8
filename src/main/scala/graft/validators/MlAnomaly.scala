package graft.validators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** ML-based anomaly detection (reference: truthound
  * `validators/anomaly/ml_based.py` — IsolationForestValidator,
  * LOFValidator; the reference fits sklearn estimators on a row-capped
  * sample).
  *
  * Scale contract (mirrors the reference's, made reproducible):
  *  - FIT is driver-side on a bounded sample. Sampling is hash-mod
  *    (`xxhash64(features) % m == 0`), not RNG-based, so the fitted model
  *    is identical on every run/cluster for the same data — the same
  *    trick the dedup operators use for determinism.
  *  - SCORING distributes: the fitted forest is tiny (arrays of split
  *    nodes), ships in the UDF closure, and scores every row at scan
  *    speed. A UDF is the honest tool here — tree traversal has no
  *    Column-API form (same justification as the bloom probe).
  *  - LOF is O(sample²) pairwise and stays a sample-only diagnostic, as
  *    in the reference; its issue reports sampled counts (documented like
  *    the Energy/MMD samplers). */
object MlAnomaly {

  /** Squared euclidean distance (shared by the O(n²) sample diagnostics). */
  private def d2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  // ---- Isolation Forest ----

  /** Flat-encoded tree node; feature == -1 marks a leaf of `size` rows. */
  final case class Node(feature: Int, split: Double, left: Int, right: Int,
      size: Int)

  final case class IsoForest(trees: Seq[Array[Node]], psi: Int)
      extends graft.functions.ArrayScorer {
    private def c(n: Double): Double =
      if (n <= 1) 0.0 else 2.0 * (math.log(n - 1) + 0.5772156649) -
        2.0 * (n - 1) / n
    private def pathLength(x: Array[Double], t: Array[Node]): Double = {
      var i = 0; var depth = 0.0
      while (t(i).feature >= 0) {
        i = if (x(t(i).feature) < t(i).split) t(i).left else t(i).right
        depth += 1.0
      }
      depth + c(t(i).size.toDouble)
    }
    /** Anomaly score in (0,1): 2^(-E[h(x)]/c(psi)); > ~0.6 is anomalous. */
    def score(x: Array[Double]): Double = {
      val avg = trees.map(pathLength(x, _)).sum / trees.size
      math.pow(2.0, -avg / c(psi.toDouble))
    }
  }

  /** Fit an isolation forest on pre-collected rows (driver-side; callers
    * bound the sample). Deterministic under the fixed seed. */
  def fitForest(data: Array[Array[Double]], nTrees: Int = 50,
      psi: Int = 256, seed: Long = 42L): IsoForest = {
    require(data.nonEmpty, "isolation forest needs a non-empty sample")
    val nFeat = data(0).length
    val rnd = new scala.util.Random(seed)
    val effPsi = math.min(psi, data.length)
    val heightLimit = math.ceil(math.log(effPsi.toDouble) / math.log(2)).toInt
    val trees = (0 until nTrees).map { _ =>
      val sub = Array.fill(effPsi)(data(rnd.nextInt(data.length)))
      val buf = scala.collection.mutable.ArrayBuffer.empty[Node]
      def build(idx: Array[Int], depth: Int): Int = {
        if (depth >= heightLimit || idx.length <= 1) {
          buf += Node(-1, 0.0, -1, -1, idx.length); buf.size - 1
        } else {
          val f = rnd.nextInt(nFeat)
          var lo = Double.MaxValue; var hi = Double.MinValue
          idx.foreach { i =>
            val v = sub(i)(f)
            if (v < lo) lo = v
            if (v > hi) hi = v
          }
          if (lo >= hi) { buf += Node(-1, 0.0, -1, -1, idx.length); buf.size - 1 }
          else {
            val split = lo + rnd.nextDouble() * (hi - lo)
            val (li, ri) = idx.partition(i => sub(i)(f) < split)
            val l = build(li, depth + 1)
            val r = build(ri, depth + 1)
            buf += Node(f, split, l, r, idx.length); buf.size - 1
          }
        }
      }
      val root = build(sub.indices.toArray, 0)
      // re-root: traversal starts at the LAST node appended (post-order)
      assert(root == buf.size - 1)
      // store with root last; pathLength starts at index... flip to root-first
      val arr = buf.toArray
      remapRootFirst(arr)
    }
    IsoForest(trees, effPsi)
  }

  /** Post-order build appends the root last; rewrite indices so the root
    * sits at 0 (pathLength starts at 0). */
  private def remapRootFirst(arr: Array[Node]): Array[Node] = {
    val n = arr.length
    val perm = new Array[Int](n) // old index -> new index
    var next = 0
    def visit(old: Int): Unit = {
      perm(old) = next; next += 1
      if (arr(old).feature >= 0) { visit(arr(old).left); visit(arr(old).right) }
    }
    visit(n - 1)
    val out = new Array[Node](n)
    arr.zipWithIndex.foreach { case (nd, old) =>
      out(perm(old)) =
        if (nd.feature < 0) nd
        else nd.copy(left = perm(nd.left), right = perm(nd.right))
    }
    out
  }

  /** Deterministic bounded fit-sample: hash-mod filter, collected in a
    * canonical sort order. No `limit` — a limit's row choice depends on
    * partition layout, which would break the "identical on every
    * run/cluster" contract; ceil(total/maxN) keeps the expected sample at
    * or under maxN (hash noise can add a few percent, which the O(n²)
    * consumers absorb). The sort makes the row ORDER deterministic too —
    * the seeded forest subsamples by index. */
  def hashSample(df: DataFrame, cols: Seq[String], maxN: Int)
      : Array[Array[Double]] = {
    val feats = df.select(cols.map(c => col(c).cast("double")): _*)
      .na.drop()
    val total = feats.count()
    val m = math.max(1L, (total + math.max(1, maxN) - 1) / math.max(1, maxN))
    val sampled = if (m <= 1) feats
      else feats.filter(pmod(xxhash64(cols.map(col): _*), lit(m)) === 0)
    sampled.orderBy(cols.map(col): _*).collect()
      .map(r => Array.tabulate(cols.size)(r.getDouble))
  }

  /** Score every row distributed via the broadcast forest — a native
    * [[graft.functions.ScoreArray]] expression (whole-stage codegen,
    * zero per-row boxing; r16 — the former `udf` form paid two
    * Seq/array conversions per scored row). Scores are bit-identical:
    * the expression calls the same `IsoForest.score`. */
  def scoreCol(forest: IsoForest, cols: Seq[String]): Column =
    graft.functions.ScoreArray(
      array(cols.map(c => col(c).cast("double")): _*), forest)

  // ---- Local Outlier Factor (sample-only, O(n²)) ----

  /** Classic LOF over a point sample; returns one score per input point
    * (≈1 inlier, >> 1 outlier). */
  def lofScores(pts: Array[Array[Double]], k: Int = 20): Array[Double] = {
    val n = pts.length
    require(n > k, s"LOF needs more than k=$k points, got $n")
    // k nearest neighbors per point (indices + distances)
    val neigh = Array.ofDim[Array[(Int, Double)]](n)
    var i = 0
    while (i < n) {
      val ds = new Array[(Int, Double)](n - 1)
      var j = 0; var w = 0
      while (j < n) {
        if (j != i) { ds(w) = (j, math.sqrt(d2(pts(i), pts(j)))); w += 1 }
        j += 1
      }
      neigh(i) = ds.sortBy(_._2).take(k)
      i += 1
    }
    val kDist = neigh.map(_.last._2)
    def reachDist(a: Int, b: Int): Double = {
      // dist(a,b) is recomputed (cheap) rather than materializing n² dists
      math.max(kDist(b), math.sqrt(d2(pts(a), pts(b))))
    }
    val lrd = Array.tabulate(n) { a =>
      val s = neigh(a).map { case (b, _) => reachDist(a, b) }.sum
      if (s == 0) Double.PositiveInfinity else k / s
    }
    Array.tabulate(n) { a =>
      val s = neigh(a).map { case (b, _) => lrd(b) }.sum
      if (lrd(a) == Double.PositiveInfinity) 1.0 else s / (k * lrd(a))
    }
  }

  // ---- One-Class SVM (random Fourier features + subgradient) ----

  /** Fitted ν-OCSVM in random-Fourier-feature space. φ(x) =
    * sqrt(2/D)·cos(Ω·z + b) with z the standardized input, Ω ~ N(0, 2γ)
    * (Rahimi & Recht 2007 approximation of the RBF kernel
    * k(x,y)=exp(-γ‖x−y‖²)); decision f(x) = w·φ(x) − ρ, f < 0 ⇒ outlier.
    * The model is a few hundred doubles — broadcast-trivial, so scoring
    * distributes like the isolation forest's. */
  final case class OcsvmModel(w: Array[Double], rho: Double,
      omega: Array[Array[Double]], bias: Array[Double],
      mean: Array[Double], std: Array[Double])
      extends graft.functions.ArrayScorer {
    /** [[graft.functions.ArrayScorer]] surface — the decision function. */
    override def score(xs: Array[Double]): Double = decision(xs)
    private[validators] def features(x: Array[Double]): Array[Double] = {
      val d = omega.length
      val out = new Array[Double](d)
      var j = 0
      while (j < d) {
        var dot = bias(j); var i = 0
        while (i < x.length) {
          dot += omega(j)(i) * (x(i) - mean(i)) / std(i); i += 1
        }
        out(j) = math.sqrt(2.0 / d) * math.cos(dot); j += 1
      }
      out
    }
    def decision(x: Array[Double]): Double = {
      val phi = features(x)
      var s = 0.0; var j = 0
      while (j < phi.length) { s += w(j) * phi(j); j += 1 }
      s - rho
    }
  }

  /** Fit a ν-one-class SVM on pre-collected rows (driver-side, bounded by
    * the caller like `fitForest`). Objective (Schölkopf et al. 2001):
    *   min_{w,ρ}  ½‖w‖² − ρ + (1/(νn)) Σ max(0, ρ − w·φ(xᵢ))
    * The dual is a simplex-constrained QP whose box constraint
    * αᵢ ≤ 1/(νn) binds for ALL points when ν = 1, giving the exact
    * closed-form solution w = (1/n)Σφ(xᵢ) — the kernel mean map. We take
    * that closed form and set the offset ρ at the ν-quantile of the
    * training scores, which is precisely Schölkopf's ν-property (at most
    * a ν fraction of training points outside the boundary). In kernel
    * terms the decision is a Parzen-window density threshold — the
    * behavior sklearn's OneClassSVM exhibits on clearly-separated
    * outliers, with no iterative solver to de-determinize the fit (the
    * reference reaches the same contract through sklearn on a sampled
    * frame, `anomaly/ml_based.py`). */
  def fitOcsvm(data: Array[Array[Double]], nu: Double = 0.1,
      dim: Int = 256, gammaOpt: Option[Double] = None,
      seed: Long = 42L): OcsvmModel = {
    require(data.nonEmpty, "ocsvm needs a non-empty sample")
    require(nu > 0 && nu <= 1, s"nu must be in (0,1], got $nu")
    val n = data.length; val nFeat = data(0).length
    val mean = Array.tabulate(nFeat)(i => data.map(_(i)).sum / n)
    val std = Array.tabulate(nFeat) { i =>
      val v = data.map(x => { val t = x(i) - mean(i); t * t }).sum / n
      val s = math.sqrt(v); if (s < 1e-12) 1.0 else s
    }
    // kernel width on standardized inputs: 1/(2·nFeat) keeps within-blob
    // similarities high while far outliers still decay to ~0
    val gamma = gammaOpt.getOrElse(1.0 / (2.0 * nFeat))
    val rnd = new scala.util.Random(seed)
    val omega = Array.fill(dim)(Array.fill(nFeat)(
      math.sqrt(2.0 * gamma) * rnd.nextGaussian()))
    val bias = Array.fill(dim)(rnd.nextDouble() * 2.0 * math.Pi)
    val model0 = OcsvmModel(new Array[Double](dim), 0.0, omega, bias,
      mean, std)
    val phi = data.map(model0.features)
    val w = new Array[Double](dim)
    phi.foreach { p => var j = 0
      while (j < dim) { w(j) += p(j) / n; j += 1 } }
    val scores = phi.map { p =>
      var s = 0.0; var j = 0
      while (j < dim) { s += w(j) * p(j); j += 1 }
      s
    }
    // ρ = ν-quantile boundary: the ⌈νn⌉-th lowest training score
    val nSv = math.max(1, math.ceil(nu * n).toInt)
    val rho = scores.sorted.apply(nSv - 1)
    model0.copy(w = w, rho = rho)
  }

  /** Distributed decision-function column via the broadcast model —
    * native [[graft.functions.ScoreArray]] expression like `scoreCol`
    * (r16; same bit-identical-by-construction argument). f < 0 ⇒
    * outlier. */
  def ocsvmDecisionCol(model: OcsvmModel, cols: Seq[String]): Column =
    graft.functions.ScoreArray(
      array(cols.map(c => col(c).cast("double")): _*), model)

  // ---- DBSCAN (sample-only, O(n²)) ----

  /** Count of DBSCAN noise points (not density-reachable from any core
    * point) in a point sample. Classic algorithm, euclidean metric. */
  def dbscanNoise(pts: Array[Array[Double]], eps: Double, minPts: Int)
      : Long = {
    val n = pts.length
    val eps2 = eps * eps
    val neighbors = Array.tabulate(n)(i =>
      (0 until n).filter(j => j != i && d2(pts(i), pts(j)) <= eps2).toArray)
    val core = neighbors.map(_.length + 1 >= minPts)
    val labeled = new Array[Boolean](n)
    var i = 0
    while (i < n) {
      if (core(i) && !labeled(i)) {
        // flood fill the density-connected component
        val stack = scala.collection.mutable.ArrayDeque(i)
        labeled(i) = true
        while (stack.nonEmpty) {
          val p = stack.removeLast()
          neighbors(p).foreach { q =>
            if (!labeled(q)) {
              labeled(q) = true
              if (core(q)) stack.append(q)
            }
          }
        }
      }
      i += 1
    }
    labeled.count(_ == false).toLong
  }
}

/** IsolationForestValidator: fit on a bounded deterministic sample, score
  * all rows distributed; rows with score > `scoreThreshold` are anomalous. */
final case class IsolationForestCheck(columns: Seq[String],
    scoreThreshold: Double = 0.65, nTrees: Int = 50, sampleN: Int = 4096)
    extends Validator with DedicatedScan {
  val name = s"isolation_forest[${columns.mkString(",")}]"
  val category = "anomaly"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val sample = MlAnomaly.hashSample(df, columns, sampleN)
    if (sample.isEmpty) return Nil
    val forest = MlAnomaly.fitForest(sample, nTrees)
    val n = df.na.drop(columns)
      .filter(MlAnomaly.scoreCol(forest, columns) > scoreThreshold).count()
    if (n > 0)
      Seq(issue(columns.mkString(","), "isolation_forest_anomalies", n, total,
        Severity.Medium, expected = s"score<=$scoreThreshold")) else Nil
  }
}

/** LOFValidator: sample-only local-outlier-factor diagnostic (the
  * reference's sklearn LOF is likewise fit_predict on the sampled frame). */
final case class LofCheck(columns: Seq[String], k: Int = 20,
    threshold: Double = 1.5, sampleN: Int = 2000)
    extends Validator with DedicatedScan {
  val name = s"lof[${columns.mkString(",")}]"
  val category = "anomaly"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val sample = MlAnomaly.hashSample(df, columns, sampleN)
    if (sample.length <= k) return Nil
    val scores = MlAnomaly.lofScores(sample, k)
    val n = scores.count(_ > threshold).toLong
    if (n > 0)
      Seq(issue(columns.mkString(","), "lof_outliers_in_sample", n,
        sample.length.toLong, Severity.Low,
        expected = s"lof<=$threshold (sampled diagnostic)")) else Nil
  }
}

/** OneClassSVMValidator (reference `anomaly/ml_based.py` OneClassSVM
  * wrapper): fit the ν-OCSVM on the bounded deterministic sample
  * (novelty-detection contract — train on the frame, flag rows whose
  * decision function is negative), score ALL rows distributed via the
  * broadcast model. Closes the last documented exclusion: the
  * closed-form kernel-mean solution in random-Fourier-feature space
  * (see `fitOcsvm`) replaces sklearn's SMO with the same decision
  * semantics on separated outliers, and deterministically. */
final case class OneClassSvmCheck(columns: Seq[String], nu: Double = 0.05,
    sampleN: Int = 4096, dim: Int = 100)
    extends Validator with DedicatedScan {
  val name = s"one_class_svm[${columns.mkString(",")}]"
  val category = "anomaly"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val sample = MlAnomaly.hashSample(df, columns, sampleN)
    if (sample.isEmpty) return Nil
    val model = MlAnomaly.fitOcsvm(sample, nu = nu, dim = dim)
    val n = df.na.drop(columns)
      .filter(MlAnomaly.ocsvmDecisionCol(model, columns) < 0).count()
    if (n > 0)
      Seq(issue(columns.mkString(","), "ocsvm_outliers", n, total,
        Severity.Low, expected = s"decision>=0 (nu=$nu)")) else Nil
  }
}

/** DBSCANValidator (reference `anomaly/ml_based.py` DBSCAN wrapper):
  * density clustering on the bounded hash-sample; points labeled noise
  * (no eps-neighborhood of minPts) are anomalies. Sample-only O(n²)
  * diagnostic like LOF — the reference's sklearn call has the same
  * contract. */
final case class DbscanCheck(columns: Seq[String], eps: Double,
    minPts: Int = 5, sampleN: Int = 2000)
    extends Validator with DedicatedScan {
  val name = s"dbscan[${columns.mkString(",")}]"
  val category = "anomaly"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val pts = MlAnomaly.hashSample(df, columns, sampleN)
    if (pts.isEmpty) return Nil
    val noise = MlAnomaly.dbscanNoise(pts, eps, minPts)
    if (noise > 0)
      Seq(issue(columns.mkString(","), "dbscan_noise_in_sample", noise,
        pts.length.toLong, Severity.Low,
        expected = s"density-reachable (eps=$eps, minPts=$minPts; sampled)"))
    else Nil
  }
}
