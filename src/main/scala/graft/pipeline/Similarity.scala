package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Similarity search over embedding columns (BASELINE.json north-star
  * surface): brute-force cosine top-k as the exact baseline, and a
  * random-hyperplane LSH bucketed variant as the scale path.
  *
  * Scale design: queries are broadcast (they're the small side by
  * definition); the corpus is never collected. Brute force is
  * O(|corpus| * |queries| * d) of pure codegen'd arithmetic; the LSH
  * variant prunes to bucket-colliding rows first (sign-bit buckets from
  * deterministic seeded hyperplanes), turning the crossJoin into an
  * equi-join — the shape that survives a billion-row corpus. */
object Similarity {

  /** Cosine similarity between two array<float/double> columns — the
    * native codegen kernel ([[graft.functions.CosineSim]]): one
    * primitive double loop per row, no boxed lambda per element. The
    * HOF reference form below is kept as the parity-fuzz oracle
    * (GraftProps pins bit-identical results), the same kernel-vs-HOF
    * discipline as HyperplaneBucket and NormalizeText. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.CosineSim(a, b)

  /** Reference HOF form of [[cosine]] (fused zip_with/aggregate) — the
    * semantics the kernel must match exactly; parity-fuzzed, not used on
    * hot paths. */
  def cosineHof(a: Column, b: Column): Column = {
    val ad = a.cast("array<double>")
    val bd = b.cast("array<double>")
    val dot = aggregate(zip_with(ad, bd, (x, y) => x * y), lit(0.0), _ + _)
    val na = sqrt(aggregate(ad, lit(0.0), (acc, x) => acc + x * x))
    val nb = sqrt(aggregate(bd, lit(0.0), (acc, x) => acc + x * x))
    when(na === 0 || nb === 0, 0.0).otherwise(dot / (na * nb))
  }

  /** Exact top-k neighbors per query: broadcast queries, score the whole
    * corpus, window top-k per query. Rank is on (round(cos, 9) desc, id)
    * so tiny float noise can't flip the ordering nondeterministically. */
  def bruteForceTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     k: Int): DataFrame = {
    val scored = corpus.select(col(corpusId).as("nn_id"), col(corpusVec).as("cv"))
      .crossJoin(broadcast(
        queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 9).desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Sign-bit LSH bucket id from `planes` hyperplanes over a `dim`-wide
    * vector — a native codegen expression
    * ([[graft.functions.HyperplaneBucket]]): one primitive double loop
    * per row, weight matrix built once per plan. Two earlier forms were
    * retired by the scaling ladder: per-row xxhash64 weight generation
    * (17× super-linear at sf10) and a constant-literal HOF pipeline
    * (correct scaling but boxed lambda evaluation that degraded
    * several-fold under long-JVM GC pressure in the full-suite bench). */
  def lshBucket(vec: Column, planes: Int, dim: Int,
                planeOffset: Int = 0): Column =
    graft.functions.HyperplaneBucket(vec, planes, dim, planeOffset)

  /** ANN top-k: only corpus rows in the query's LSH bucket are scored.
    * Recall is tunable via `planes` (fewer planes = bigger buckets =
    * higher recall, more compute). Multi-probe: also match buckets at
    * Hamming distance 1 when `probe1` is set.
    *
    * Assumes a uniform vector width across the corpus (the plane matrix
    * is sized from `dim`, or probed from one non-null row when not
    * given; shorter/longer vectors are zero-padded/truncated by the
    * bucketer). An empty or all-null-vector corpus returns an empty
    * result rather than throwing. */
  def lshTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
              queries: DataFrame, queryId: String, queryVec: String,
              k: Int, planes: Int = 8, probe1: Boolean = true,
              dim: Int = 0): DataFrame = {
    // vector width for the constant plane matrix; one 1-row probe job
    // when the caller doesn't pass it
    val probed = if (dim > 0) Some(dim)
      else corpus.filter(col(corpusVec).isNotNull)
        .select(size(col(corpusVec)).as("d")).take(1)
        .headOption.map(_.getInt(0))
    if (probed.isEmpty)
      return corpus.select(col(corpusId).as("nn_id")).limit(0)
        .crossJoin(queries.select(col(queryId).as("query_id")).limit(0))
        .select(col("query_id"), lit(0).as("rank"), col("nn_id"),
          lit(0.0).as("cos"))
    val d = probed.get
    val cb = corpus.select(col(corpusId).as("nn_id"), col(corpusVec).as("cv"),
      lshBucket(col(corpusVec), planes, d).as("cb"))
    val qb0 = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"),
      lshBucket(col(queryVec), planes, d).as("qb"))
    // multi-probe: expand each query to its bucket + all 1-bit flips
    val qb =
      if (!probe1) qb0.withColumn("probe", col("qb"))
      else qb0.withColumn("probe", explode(array(
        (col("qb") +: (0 until planes).map(p =>
          col("qb").bitwiseXOR(lit(1L << p)))): _*)))
    val scored = cb.join(broadcast(qb), col("cb") === col("probe"))
      .withColumn("cos", cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 9).desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Count of neighbors above a cosine threshold per query (robust
    * correctness surface: no rank ties to worry about). */
  def neighborsAbove(corpus: DataFrame, corpusId: String, corpusVec: String,
                     queries: DataFrame, queryId: String, queryVec: String,
                     threshold: Double): DataFrame =
    corpus.select(col(corpusId).as("nn_id"), col(corpusVec).as("cv"))
      .crossJoin(broadcast(
        queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"))))
      .withColumn("cos", cosine(col("cv"), col("qv")))
      .filter(col("cos") >= threshold && col("nn_id") =!= col("query_id"))
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_neighbors"))
}

/** IVF (inverted-file) ANN: a k-means coarse quantizer partitions the
  * corpus into `nlist` cells; queries probe only their `nprobe` nearest
  * cells. Complements the hyperplane-LSH path: IVF adapts to the data
  * distribution (clustered corpora get balanced cells where fixed
  * hyperplanes can't), at the cost of a driver-side fit.
  *
  * Scale contract: the quantizer FITS on a deterministic bounded sample
  * (hash-filtered + hash-ordered — same reproducibility discipline as
  * MlAnomaly.hashSample); cell ASSIGNMENT is a pure Column expression
  * (argmin over nlist zip_with distances, whole-stage codegen), so the
  * corpus partitioning runs at scan speed and the search is an equi-join
  * on cell id — the same join shape as the LSH path, no crossJoin. */
object Ivf {
  import org.apache.spark.sql.{Column, DataFrame}
  import org.apache.spark.sql.functions._
  import org.apache.spark.sql.expressions.Window

  /** Deterministic k-means (Lloyd) on a bounded sample of the vector
    * column. Init: every (n/k)-th point of the hash-ordered sample. */
  def fitCentroids(df: DataFrame, vecCol: String, nlist: Int,
      iters: Int = 10, sampleN: Int = 4096): Array[Array[Double]] = {
    val total = df.filter(col(vecCol).isNotNull).count()
    val m = math.max(1L, (total + sampleN - 1) / sampleN)
    val sample = df.filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>").as("v"),
        xxhash64(col(vecCol).cast("array<string>")).as("h"))
      .filter(pmod(col("h"), lit(m)) === 0)
      .orderBy(col("h"))
      // hash-filter targets ~sampleN points in expectation; the limit
      // makes the driver allocation worst-case bounded even when the
      // modulus is unlucky relative to the corpus
      .limit(4 * sampleN)
      .collect().map(_.getSeq[Double](0).toArray)
    require(sample.length >= nlist, s"sample ${sample.length} < nlist $nlist")
    lloyd(sample, nlist, iters)
  }

  /** Driver Lloyd core shared by [[fitCentroids]] and
    * [[fitSubCentroids]]: deterministic given the sample order (init =
    * every (n/k)-th point; empty clusters keep their previous mean). */
  private def lloyd(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    var centroids = Array.tabulate(k)(i =>
      sample((i * sample.length) / k).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](centroids(0).length))
      val counts = new Array[Long](k)
      sample.foreach { p =>
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var d = 0.0; var i = 0
          while (i < p.length) {
            val t = p(i) - centroids(c)(i); d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        counts(best) += 1
        var i = 0
        while (i < p.length) { sums(best)(i) += p(i); i += 1 }
      }
      centroids = Array.tabulate(k)(c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c)))
    }
    centroids
  }

  /** Per-coarse-cell sub-centroids for the TWO-LEVEL quantizer: for
    * each cell of an already-fit `coarse` matrix, Lloyd on a bounded
    * per-cell sample of the rows that cell actually receives (cosine
    * assignment — the mode the semantic-dedup callers use), giving
    * `subK` sub-centroids per cell (fewer when a cell's sample is
    * smaller; an empty cell keeps its coarse centroid as the lone sub).
    *
    * Scale contract: the corpus is pre-thinned by a hash filter to
    * ~4 × coarse × samplePerCell rows IN EXPECTATION before the
    * per-cell window caps each cell at samplePerCell — so the one
    * shuffle here moves a bounded sample, not the corpus, and the
    * driver allocation is hard-bounded at coarse × samplePerCell × dim
    * doubles regardless of skew (256 cells × 256 rows × 64 dims
    * ≈ 34 MB). Per-cell point order is (hash, values) — fully
    * deterministic, same discipline as [[fitCentroids]]. */
  def fitSubCentroids(df: DataFrame, vecCol: String,
      coarse: Array[Array[Double]], subK: Int, iters: Int = 10,
      samplePerCell: Int = 256): Array[Array[Array[Double]]] = {
    require(subK >= 1, s"subK must be >= 1: $subK")
    val target = coarse.length.toLong * samplePerCell
    val nn = df.filter(col(vecCol).isNotNull).count()
    val m = math.max(1L, nn / math.max(1L, 4L * target))
    val w = Window.partitionBy(col("__c"))
      .orderBy(col("__h"), col("__v").cast("array<string>"))
    val sample = df.filter(col(vecCol).isNotNull)
      .select(col(vecCol).cast("array<double>").as("__v"),
        xxhash64(col(vecCol).cast("array<string>")).as("__h"))
      .filter(pmod(col("__h"), lit(m)) === 0)
      .withColumn("__c", cellOfCosine(col("__v"), coarse))
      .filter(col("__c").isNotNull)
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") <= samplePerCell)
      .select(col("__c"), col("__v"), col("__h"))
      .collect() // hard-bounded: coarse.length * samplePerCell rows
    val byCell = sample.groupBy(_.getInt(0)).map { case (c, rows) =>
      c -> rows.sortBy(r => (r.getLong(2), r.getSeq[Double](1).mkString(",")))
        .map(_.getSeq[Double](1).toArray)
    }
    Array.tabulate(coarse.length) { c =>
      val pts = byCell.getOrElse(c, Array.empty[Array[Double]])
      if (pts.isEmpty) Array(coarse(c).clone())
      else lloyd(pts, math.min(subK, pts.length), iters)
    }
  }

  /** Two-level cosine cell id: coarse assignment via [[cellOfCosine]],
    * then the winning cell's sub-centroids via the ragged
    * [[graft.functions.NearestSubCell]] kernel. The returned id is the
    * GLOBAL flat sub-centroid index — unique across cells, directly
    * usable as an equi-join key. Per-row cost is
    * (coarse + subK) × dim flops vs (coarse × subK) × dim for a flat
    * quantizer of the same resolution. */
  def cellOfCosineTwoLevel(vec: Column, coarse: Array[Array[Double]],
      subs: Array[Array[Array[Double]]]): Column = {
    require(subs.length == coarse.length,
      s"subs.length ${subs.length} != coarse.length ${coarse.length}")
    graft.functions.NearestSubCell(
      cellOfCosine(vec, coarse), vec, subs, cosine = true)
  }

  /** Squared distances from a vector column to EVERY centroid, as one
    * array column. The centroid matrix ships as a single 2-D array
    * literal (`typedlit`) and the loop is `transform`/`zip_with` — the
    * expression tree is constant-size regardless of nlist × dim, where
    * per-centroid literal arrays made codegen compile time grow with the
    * quantizer (nlist=16, d=64 was ~6k nodes and ~1 s of janino per
    * fresh plan; nlist=4096 at cluster scale would be impossible). */
  private def dist2All(vec: Column, centroids: Array[Array[Double]]): Column = {
    val cents = typedlit(centroids.map(_.toSeq).toSeq)
    transform(cents, c =>
      aggregate(zip_with(vec.cast("array<double>"), c,
        (x, y) => (x - y) * (x - y)), lit(0.0), _ + _))
  }

  /** Cosine similarity from a vector column to EVERY centroid, as one
    * array column — same constant-size typedlit/HOF shape as dist2All
    * (the expression tree does not grow with nlist × dim). */
  private def cosAll(vec: Column, centroids: Array[Array[Double]]): Column = {
    val cents = typedlit(centroids.map(_.toSeq).toSeq)
    val v = vec.cast("array<double>")
    val vn = sqrt(aggregate(v, lit(0.0), (a, x) => a + x * x))
    transform(cents, c =>
      aggregate(zip_with(v, c, (x, y) => x * y), lit(0.0), _ + _) /
        (vn * sqrt(aggregate(c, lit(0.0), (a, x) => a + x * x))))
  }

  /** Max-cosine cell id (argmax; ties to the lower centroid index,
    * matching array_position's first-occurrence semantics). The natural
    * quantizer when downstream similarity is cosine — L2 argmin (cellOf)
    * only agrees with cosine argmax after normalizing both sides.
    * Native kernel ([[graft.functions.NearestCell]]): the HOF form paid
    * nlist × dim boxed lambda calls per row and dominated the semantic
    * dedup probe; parity with [[cellOfCosineHof]] is spec-pinned by the
    * GraftProps `nearest_cell` properties (random vectors × centroids ×
    * {cosine, L2} × {float, double} with planted score ties, codegen +
    * interpreted eval, plus explicit zero-norm/null/dim corner rows). */
  def cellOfCosine(vec: Column, centroids: Array[Array[Double]]): Column =
    if (centroids.length == 1) lit(0)
    else graft.functions.NearestCell(vec, centroids, cosine = true)

  /** Reference HOF form of [[cellOfCosine]] (parity spec only). */
  def cellOfCosineHof(vec: Column, centroids: Array[Array[Double]]): Column =
    if (centroids.length == 1) lit(0)
    else {
      val cs = cosAll(vec, centroids)
      (array_position(cs, array_max(cs)) - 1).cast("int")
    }

  /** Nearest-centroid cell id (argmin squared L2; ties to the lower
    * index). Same native kernel as [[cellOfCosine]]. */
  def cellOf(vec: Column, centroids: Array[Array[Double]]): Column =
    if (centroids.length == 1) lit(0)
    else graft.functions.NearestCell(vec, centroids, cosine = false)

  /** Reference HOF form of [[cellOf]] (parity spec only). */
  def cellOfHof(vec: Column, centroids: Array[Array[Double]]): Column =
    if (centroids.length == 1) lit(0)
    else {
      val d = dist2All(vec, centroids)
      (array_position(d, array_min(d)) - 1).cast("int")
    }

  /** The query's `nprobe` nearest cell ids (array column). */
  def probeCells(vec: Column, centroids: Array[Array[Double]],
      nprobe: Int): Column =
    if (centroids.length == 1) array(lit(0))
    else {
      val scored = zip_with(dist2All(vec, centroids),
        sequence(lit(0), lit(centroids.length - 1)),
        (d, i) => struct(d.as("d"), i.as("i")))
      transform(slice(array_sort(scored), 1, nprobe), s => s.getField("i"))
    }

  /** IVF top-k: corpus rows in the query's nprobe nearest cells are
    * scored by cosine; same output shape as Similarity.lshTopK. */
  def ivfTopK(corpus: DataFrame, corpusId: String, corpusVec: String,
      queries: DataFrame, queryId: String, queryVec: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int = 2): DataFrame = {
    val cb = corpus.select(col(corpusId).as("nn_id"), col(corpusVec).as("cv"),
      cellOf(col(corpusVec), centroids).as("cell"))
    val qb = queries.select(col(queryId).as("query_id"), col(queryVec).as("qv"),
        probeCells(col(queryVec), centroids, nprobe).as("cells"))
      .withColumn("cell", explode(col("cells"))).drop("cells")
    val scored = cb.join(broadcast(qb), Seq("cell"))
      .withColumn("cos", Similarity.cosine(col("cv"), col("qv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(round(col("cos"), 9).desc, col("nn_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("nn_id"),
        round(col("cos"), 6).as("cos"))
  }
}
