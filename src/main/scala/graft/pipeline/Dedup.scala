package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Deduplication operators for training-data pipelines (BASELINE.json
  * north-star surface): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup.
  *
  * Scale design:
  *  - exact dedup: hash-groupBy on the md5 fingerprint — one shuffle keyed
  *    by digest, O(distinct) reducers;
  *  - MinHash LSH: signature is computed per-row at scan speed (no UDFs),
  *    then ONE explode to (band, bucket) rows and a bucket self-join —
  *    the join key (band, bucket-hash) is uniform, so no skew; candidate
  *    verification re-computes exact Jaccard only on candidates;
  *  - SimHash: 64-bit fingerprint per row via the native SimHash64
  *    expression; near-dups found by exact-match on rotated bit-bands
  *    (Hamming-distance blocking), again a groupBy not a cross join;
  *  - embedding near-dup: cosine via fused zip_with dot product; the
  *    brute-force form is for verification, the hyperplane-LSH form is
  *    the 100 TB path (buckets via sign bits, join within bucket). */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Contraction rounds taken by the most recent [[dupClusters]] call on
    * this thread: -1 before any call, 0 when the driver union-find fast
    * path (or an empty edge set) short-circuited, otherwise the number of
    * large-star/small-star alternations to fixpoint. Observability only
    * (production monitors read it after a dedup to watch convergence —
    * contraction should stay single-digit; see the [[dupClusters]] doc);
    * thread-local so parallel runners in one JVM don't race. The same
    * figure is INFO-logged per call. */
  private val lastRoundsTl = new ThreadLocal[Int] {
    override def initialValue(): Int = -1
  }
  def lastContractionRounds: Int = lastRoundsTl.get()

  /** Whether the most recent [[embedDupLabels]] call on this thread ran
    * its banded joins band-serially (see `bandSerial` there). -1 before
    * any call / 0 fused / 1 serial; observability only, INFO-logged. */
  private val lastSerialTl = new ThreadLocal[Int] {
    override def initialValue(): Int = -1
  }
  def lastBandSerial: Int = lastSerialTl.get()

  /** Estimated on-the-wire bytes of the exploded banded self-join input:
    * n rows × nb bands, each carrying the float vector (4·d + array
    * header), nb 8-byte signatures, id/band/bits and row overhead. The
    * `bandSerial = -1` auto mode in [[embedDupLabels]] compares this
    * against [[SerialBandAutoBytes]]. */
  private[graft] def explodeBytes(n: Long, nb: Int, d: Int): Long =
    n * nb * (28L + 4L * d + 8L * nb)

  /** Auto threshold for band-serial execution: past ~16 GiB of exploded
    * banded-join input the one-job fused form's shuffle footprint is the
    * dominant cluster resource (and on a single node it is a disk
    * cliff — the sf1000 probe filled 24 GB of scratch in under two
    * minutes at 20M×64-dim×7-band); below it the extra per-band job
    * scheduling is pure overhead. */
  private[graft] val SerialBandAutoBytes: Long = 16L << 30

  /** Exact duplicate groups by normalized-content fingerprint:
    * (fingerprint, cnt) with cnt > 1. */
  def exactDupGroups(df: DataFrame, textCol: String): DataFrame =
    df.groupBy(Text.fingerprint(col(textCol)).as("fp"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)

  /** Keep one row per distinct normalized content (first by `keyCol`). */
  def exactDedup(df: DataFrame, textCol: String, keyCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(Text.fingerprint(col(textCol))).orderBy(col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash signature: k independent minima of seeded xxhash64 over an
    * already-materialized shingle array column (see Text.shinglesOf for
    * why materialization matters). Pure Column expression. */
  def minhashSignatureOf(shinglesCol: Column, k: Int = 32): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      array_min(transform(shinglesCol, s => xxhash64(concat(s, lit("#"), i)))))

  /** LSH candidate pairs: split the k-signature into `bands` bands of
    * k/bands rows; two docs are candidates if any band hashes equal.
    * Returns (id_a, id_b, jaccard) for verified pairs with exact shingle
    * Jaccard >= threshold. */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 32, bands: Int = 8, shingleN: Int = 3,
                      threshold: Double = 0.7): DataFrame = {
    val rows = k / bands
    val sig = df.select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("__t", Text.tokens(col("text")))
      .withColumn("__sh", Text.shinglesOf(col("__t"), shingleN))
      .withColumn("sig", minhashSignatureOf(col("__sh"), k))
    val banded = sig.withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bucket", hash(col("band"), slice(col("sig"),
        col("band") * rows + 1, lit(rows))))
      .select(col("id"), col("band"), col("bucket"))
      .persist(StorageLevel.MEMORY_AND_DISK) // both sides of the self-join
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b")).distinct()
    // build the verification shingle relation HERE so it can be released
    // (verifyJaccard's internal one would have no unpersist path)
    val sh = df.select(col(idCol).as("__id"),
        Text.tokens(col(textCol)).as("__t"))
      .select(col("__id"),
        array_distinct(Text.shinglesOf(col("__t"), shingleN)).as("__sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val result = verifyJaccardWith(cand, sh)
      .filter(col("jaccard") >= threshold)
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count() // materialize eagerly so the intermediates can be dropped
    banded.unpersist()
    sh.unpersist()
    result
  }

  /** Exact n-gram Jaccard similarity for given candidate id pairs.
    * Lazily-evaluating direct callers keep the internal shingle cache for
    * reuse; pipelines that need deterministic release should build the
    * shingle relation themselves and use verifyJaccardWith. */
  def verifyJaccard(pairs: DataFrame, df: DataFrame, idCol: String,
                    textCol: String, shingleN: Int): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
        Text.tokens(col(textCol)).as("__t"))
      .select(col("__id"),
        array_distinct(Text.shinglesOf(col("__t"), shingleN)).as("__sh"))
      .persist(StorageLevel.MEMORY_AND_DISK) // joined twice (a and b sides)
    verifyJaccardWith(pairs, sh)
  }

  /** Jaccard verification against a caller-owned (id, shingle-set)
    * relation — the caller controls its persistence lifecycle. */
  def verifyJaccardWith(pairs: DataFrame, sh: DataFrame): DataFrame = {
    pairs
      .join(sh.withColumnRenamed("__id", "id_a").withColumnRenamed("__sh", "sh_a"),
        Seq("id_a"))
      .join(sh.withColumnRenamed("__id", "id_b").withColumnRenamed("__sh", "sh_b"),
        Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("uni", size(array_union(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        when(col("uni") === 0, 0.0)
          .otherwise(col("inter").cast("double") / col("uni")))
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Exhaustive n-gram Jaccard pairs >= threshold via shingle-inverted
    * index: explode shingles, join docs sharing a shingle (the classic
    * candidate generator — exact, no hashing). Quadratic only within
    * shingle posting lists. */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    // the shingle-set relation feeds both posting sides and the size join;
    // persist it (rows are (id, ~100 short strings) — tiny next to the
    // shingling compute it saves 3x)
    val sh = df.select(col(idCol).as("__id"),
        Text.tokens(col(textCol)).as("__t"))
      .select(col("__id"),
        array_distinct(Text.shinglesOf(col("__t"), shingleN)).as("__sh"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.select(col("__id"), size(col("__sh")).as("__sz"))
    val posting = sh.select(col("__id"), explode(col("__sh")).as("s"))
    // |A ∩ B| falls out of the posting-list join directly (postings are
    // distinct shingles), so jaccard = c / (|A| + |B| - c) with no array
    // re-verification — one join + one groupBy, exact
    val result = posting.as("a").join(posting.as("b"),
        col("a.s") === col("b.s") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .agg(count(lit(1)).as("__c"))
      .join(sizes.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__sz", "sz_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__sz", "sz_b"), Seq("id_b"))
      .withColumn("jaccard",
        col("__c").cast("double") / (col("sz_a") + col("sz_b") - col("__c")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    result.count() // materialize eagerly so the shingle cache can be dropped
    sh.unpersist()
    result
  }

  /** SimHash fingerprints + Hamming-blocked near-dup pairs: candidates
    * share at least one of `bands` 16-bit bands (guarantees recall for
    * Hamming distance < bands); verified by bit_count(a^b) <= maxHamming. */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val fp = df.select(col(idCol).as("id"), Text.tokens(col(textCol)).as("__t"))
      .select(col("id"), graft.functions.SimHash64(col("__t")).as("fp"))
    val bands = 4 // 16 bits each
    val banded = fp.withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("key", struct(col("band"),
        expr("shiftright(fp, band * 16) & 65535").as("bits")))
    banded.as("a").join(banded.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b")).distinct()
      .withColumn("hamming", bit_count(col("fp_a").bitwiseXOR(col("fp_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Embedding near-duplicate pairs: cosine >= threshold. Brute-force
    * within `df` (verification scale); use Similarity.lshBuckets for the
    * production path. */
  def embeddingDupPairs(df: DataFrame, idCol: String, vecCol: String,
                        threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos", Similarity.cosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }

  /** Embedding near-duplicate pairs at scale (the SemDeDup-style semantic
    * dedup shape): a banded hyperplane-signature self-join turns the
    * O(n²) all-pairs cosine of [[embeddingDupPairs]] into an equi-join,
    * the same Hamming-blocking discipline [[simhashPairs]] uses for
    * text. Exact-cosine verification runs only on band-colliding
    * candidates, so reported pairs are TRUE positives by construction —
    * LSH only affects recall, never precision.
    *
    * Shape: a `bands * bandBits`-bit sign signature per row (one native
    * codegen'd bucketer call), exploded to `bands` (band, bits) keys,
    * self-joined on the key. A pair is compared iff SOME band of the two
    * signatures agrees exactly — identical vectors agree on every band,
    * so exact duplicates are found with probability 1; a pair at cosine
    * c survives with 1-(1-q^bandBits)^bands for q = 1-arccos(c)/π
    * (bands=4, bandBits=14: ~95% at c=0.99, ~99.9% at c=0.999).
    *
    * Scale contract: candidate volume is governed by bandBits — the
    * per-band key space is 2^bandBits, so size bandBits ≈ log₂(n) to
    * hold expected bucket occupancy at O(1) (the earlier fixed-bucket
    * 1-bit-probe form went quadratic the moment n outgrew 2^planes).
    * Each band draws its own `bandBits`-plane signature from a DISJOINT
    * plane range (plane offset b·bandBits), so bands and bandBits are
    * independent — there is no bands·bandBits ≤ 63 packing ceiling, and
    * a billion-vector corpus can run bandBits = 30 with as many bands
    * as the recall target needs ([[lshPlan]] sizes both). For
    * bands·bandBits ≤ 63 the per-band keys are bit-identical to the
    * old packed-single-long form (same global plane schedule; pinned in
    * GraftProps), so existing oracles and anchors carry over.
    * Two cheap bit-level filters run between the join and the exact
    * cosine so the expensive arithmetic touches ~only true candidates:
    *
    *  - FIRST-MATCHING-BAND: a pair agreeing on several bands would be
    *    emitted once per band; keeping only the lowest agreeing band
    *    (three bit comparisons against the full signatures, which ride
    *    the join anyway) makes each pair unique WITHOUT a distinct —
    *    no post-join shuffle at all.
    *  - HAMMING SCREEN: a pair at cosine t differs on ≈ B·acos(t)/π of
    *    its B sign bits, while a random band-colliding pair differs on
    *    ≈ (B-bandBits)/2; `bit_count(sig_a ^ sig_b)` ≤ 2× the expected
    *    true-pair distance rejects ~all random collisions for ≲2% recall
    *    cost at t = 0.99 (`maxHamming` overrides the auto bound).
    *
    * Dense semantic clusters still collide by construction — that is
    * the point — and their verify cost is proportional to TRUE near-dup
    * pairs, not corpus size; AQE skew handling covers the join. */
  def embeddingDupPairsLsh(df: DataFrame, idCol: String, vecCol: String,
                           threshold: Double, bands: Int = 4,
                           bandBits: Int = 14, dim: Int = 0,
                           maxHamming: Int = -1): DataFrame = {
    require(bands >= 1, s"bands must be >= 1: $bands")
    require(bandBits >= 1 && bandBits <= 63,
      s"bandBits must be in [1,63]: $bandBits")
    val totalBits = bands * bandBits
    val hmax =
      if (maxHamming >= 0) maxHamming
      else math.min(totalBits,
        math.ceil(2.0 * totalBits * math.acos(threshold) / math.Pi).toInt
          .max(1))
    val v = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("v"))
    val probed = if (dim > 0) Some(dim)
      else v.select(size(col("v")).as("d")).take(1).headOption.map(_.getInt(0))
    if (probed.isEmpty)
      return v.select(col("id").as("id_a"), col("id").as("id_b"),
        lit(0.0).as("cos")).limit(0)
    val d = probed.get
    // one bandBits-plane signature per band, each from its own disjoint
    // plane range — all computed in a single projection (one codegen'd
    // loop per band over the row's vector)
    val sigCols = (0 until bands).map(b =>
      Similarity.lshBucket(col("v"), bandBits, d, b * bandBits).as(s"s$b"))
    val sig = v.select(col("id") +: col("v") +: sigCols: _*)
    val keyed = sig.withColumn("band",
        explode(array((0 until bands).map(lit): _*)))
      .withColumn("bits", element_at(
        array((0 until bands).map(b => col(s"s$b")): _*), col("band") + 1))
    // lowest agreeing band only: every band below the joined one differs
    val firstMatch = (0 until bands - 1).map { b =>
      col("a.band") <= b || col(s"a.s$b") =!= col(s"b.s$b")
    }.reduceOption(_ && _).getOrElse(lit(true))
    val hamming = (0 until bands)
      .map(b => bit_count(col(s"a.s$b").bitwiseXOR(col(s"b.s$b"))))
      .reduce(_ + _)
    keyed.as("a").join(keyed.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
          col("a.id") < col("b.id"))
      .filter(firstMatch)
      .filter(hamming <= hmax)
      .withColumn("cos", Similarity.cosine(col("a.v"), col("b.v")))
      .filter(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("cos"), 6).as("cos"))
  }

  /** Size (bands, bandBits) for [[embeddingDupPairsLsh]] from the corpus
    * size and the recall target: bandBits = ⌈log₂ n⌉ (clamped to
    * [8, 63]) holds expected random bucket occupancy at O(1) — candidate
    * volume stays O(bands · n) instead of O(n²/2^bandBits) — and bands
    * is the smallest count reaching `recall` for a pair at cosine
    * `threshold` under the sign-LSH collision model
    * P(agree) = (1 - arccos(c)/π)^bandBits per band (capped at 64: past
    * that the threshold is too far below what sign-LSH banding can
    * retrieve economically and the caller should lower `recall` or
    * raise `threshold`).
    *
    * Caveat measured on the sf100 ladder: for CLUSTER-CONCENTRATED
    * corpora, sign-key occupancy is bound by the cluster structure, not
    * the key space (the sf100 embeddings populate only ~34k of 2^21
    * keys), so widening bandBits past the data's sign-entropy stops
    * shrinking buckets and each extra band adds near-linear candidate
    * cost. The irreducible floor is the true-pair count itself — every
    * pair above `threshold` must be verified and emitted — so on
    * dup-dense corpora wall time tracks recall, and lowering `recall`
    * is the honest cost knob. */
  def lshPlan(n: Long, threshold: Double,
              recall: Double = 0.95, minBandBits: Int = 8): (Int, Int) = {
    require(n >= 0, s"n must be >= 0: $n")
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1]: $threshold")
    require(recall > 0.0 && recall < 1.0, s"recall must be in (0,1): $recall")
    require(minBandBits >= 1 && minBandBits <= 63,
      s"minBandBits must be in [1,63]: $minBandBits")
    // callers needing a bandBits floor pass it HERE (not by overriding the
    // returned value) so the band count is computed for the bandBits
    // actually used — an external max(floor, bb) override would leave
    // bands sized for a higher per-band collision probability than the
    // widened key space delivers, silently missing the recall target
    val bandBits = math.min(63, math.max(minBandBits,
      64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, n - 1))))
    val q = 1.0 - math.acos(math.min(1.0, threshold)) / math.Pi
    val pBand = math.pow(q, bandBits.toDouble)
    val bands =
      if (pBand >= 1.0) 1
      else math.min(64, math.max(1,
        math.ceil(math.log1p(-recall) / math.log1p(-pBand)).toInt))
    (bands, bandBits)
  }

  /** Fused representative-only embedding dedup labels — the 100 TB path
    * for near-dup REMOVAL. [[embeddingDupPairsLsh]] materializes the
    * verified pair LIST, which is the wrong plan when the caller only
    * wants the deduped corpus: on dup-dense corpora output ≈ true-pair
    * count (the sf100 ladder fixture plants ~210M pairs at cosine ≥
    * 0.99; a 100× corpus at that density implies ~21B pair rows before
    * clustering even starts). This operator never materializes pairs:
    * each round recomputes the banded sign-LSH self-join and immediately
    * AGGREGATES the minimum verified-neighbor label per id — partial
    * aggregation collapses the pair stream map-side, so shuffle traffic
    * and storage stay O(n · bands) at ANY pair density, and the pair
    * verification (the irreducible exact-cosine work) is compute-only.
    *
    * Semantics: connected components over the SAME verified-candidate
    * graph that `embeddingDupPairsLsh |> dupClusters` would build (banded
    * hyperplane signatures, first-matching-band uniqueness, Hamming
    * screen, exact-cosine verify at `threshold`) — every id that appears
    * in the graph is labeled with the minimum id reachable through
    * verified pairs. LSH affects recall only, identically to the pair
    * path: exact duplicates share every band by construction.
    *
    * Algorithm — EXACTLY TWO banded joins, no data-dependent loop over
    * the expensive verify (an earlier hash-min-per-round form re-ran the
    * full join once per propagation round and lost badly on
    * filament-shaped clusters, whose diameter forces many rounds):
    *
    *  1. SPANNING PASS: banded join + verify, aggregated per id to its
    *     MINIMUM verified partner — n rows, a spanning subgraph of the
    *     verified graph (every paired id contributes one true edge).
    *  2. Close that subgraph with [[dupClusters]] — vector-free, O(n)
    *     edges, pointer-jumping rounds cost megabytes, not the join.
    *  3. RECONCILIATION PASS: re-run the banded join with the step-2
    *     labels attached; a label EQUALITY check runs BEFORE the
    *     hamming/cosine arithmetic, so intra-component candidates (the
    *     vast majority) cost one long compare; surviving verified
    *     cross-component pairs aggregate to DISTINCT (label, label)
    *     edges — a component graph, map-side-collapsed.
    *  4. Close the component graph (tiny) and compose the labelings.
    *
    * Exactness: every verified candidate pair either already shares a
    * step-2 label (in one component of the spanning subgraph — a
    * subgraph of the true graph, so sound) or is verified in step 3 and
    * its components are merged in step 4. Hence the final components
    * are exactly the connected components of the full verified-candidate
    * graph: the same answer as `embeddingDupPairsLsh |> dupClusters`,
    * in two joins instead of one join plus a pair-list-sized shuffle.
    *
    * `bandSerial` (−1 auto / 0 fused / 1 serial) bounds the PEAK shuffle
    * footprint: the fused one-job form materializes the full exploded
    * relation — n·bands rows each carrying the float VECTOR — in the
    * shuffle store at once, which is O(n·bands·dim) bytes and the
    * dominant resource at production dims (at 20M×64-dim×7-band it
    * filled 24 GB of local scratch in under two minutes; at dim 768 it
    * is ~30× the corpus). Serial mode runs the same self-join ONE BAND
    * AT A TIME — band b joins on s_b alone, the first-match screen
    * becomes "every band below b differs", each band's min-partner
    * (pass 1) / component-edge (pass 2) aggregate is materialized via
    * localCheckpoint and its shuffle released — so the live footprint is
    * one band's O(n·dim) and the label output is byte-identical (same
    * verified pair set, partitioned by first matching band; min and
    * distinct are associative across the union). Auto engages past
    * [[SerialBandAutoBytes]] of estimated exploded input; below it the
    * extra job scheduling is pure overhead and fused wins. */
  def embedDupLabels(df: DataFrame, idCol: String, vecCol: String,
                     threshold: Double, bands: Int = 0, bandBits: Int = 0,
                     dim: Int = 0, maxHamming: Int = -1,
                     maxIter: Int = 25, bandSerial: Int = -1,
                     knownRows: Long = -1L): DataFrame = {
    val v0 = df.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("v"))
    val probed = if (dim > 0) Some(dim)
      else v0.select(size(col("v")).as("d")).take(1).headOption.map(_.getInt(0))
    if (probed.isEmpty)
      return v0.select(col("id"), col("id").as("cluster")).limit(0)
    val d = probed.get
    // knownRows: callers that already counted the corpus (for their own
    // lshPlan call, say) pass it here so the auto band-serial estimate
    // never re-scans the corpus just to re-learn the row count (r15 —
    // one full pass saved per call at any scale).
    lazy val nRows = if (knownRows >= 0) knownRows else v0.count()
    val (nb, bb) =
      if (bands > 0 && bandBits > 0) (bands, bandBits)
      else {
        val plan = lshPlan(nRows, threshold)
        (if (bands > 0) bands else plan._1,
         if (bandBits > 0) bandBits else plan._2)
      }
    // lazy: with explicit (bands, bandBits) and forced/disabled serial
    // mode nothing else needs nRows, so the estimate must not force the
    // count; checkpointBand short-circuits it when serial was forced.
    lazy val scratchPressure =
      explodeBytes(nRows, nb, d) > SerialBandAutoBytes
    val serial = bandSerial match {
      case 0          => false
      case x if x > 0 => true
      case _          => scratchPressure
    }
    lastSerialTl.set(if (serial) 1 else 0)
    log.info(s"embedDupLabels bands=$nb bandBits=$bb dim=$d " +
      s"serial=$serial")
    val totalBits = nb * bb
    val hmax =
      if (maxHamming >= 0) maxHamming
      else math.min(totalBits,
        math.ceil(2.0 * totalBits * math.acos(threshold) / math.Pi).toInt
          .max(1))
    val sigCols = (0 until nb).map(b =>
      Similarity.lshBucket(col("v"), bb, d, b * bb).as(s"s$b"))
    val sig = v0.select(col("id") +: col("v") +: sigCols: _*)
      .persist(StorageLevel.MEMORY_AND_DISK) // feeds both banded joins
    val firstMatch = (0 until nb - 1).map { b =>
      col("a.band") <= b || col(s"a.s$b") =!= col(s"b.s$b")
    }.reduceOption(_ && _).getOrElse(lit(true))
    val hamming = (0 until nb)
      .map(b => bit_count(col(s"a.s$b").bitwiseXOR(col(s"b.s$b"))))
      .reduce(_ + _)
    def banded(rel: DataFrame): DataFrame = rel
      .withColumn("band", explode(array((0 until nb).map(lit): _*)))
      .withColumn("bits", element_at(
        array((0 until nb).map(b => col(s"s$b")): _*), col("band") + 1))
    // Serial building block: self-join of `rel` on band b's signature
    // alone, restricted to pairs whose FIRST agreeing band is b (every
    // earlier signature differs) — across b, exactly the fused join's
    // firstMatch-screened candidate set, each pair exactly once.
    def bandPairs(rel: DataFrame, b: Int): DataFrame = {
      val l = rel.withColumn("bits", col(s"s$b"))
      val first = (0 until b).map(p => col(s"a.s$p") =!= col(s"b.s$p"))
        .reduceOption(_ && _).getOrElse(lit(true))
      l.as("a").join(l.as("b"),
          col("a.bits") === col("b.bits") && col("a.id") < col("b.id"))
        .filter(first)
    }
    // Materialize one band's aggregate and let its join shuffle go: the
    // checkpoint cuts the plan to a LogicalRDD, the band's exchange
    // becomes unreachable, and the conf-gated GC nudge (spark.graft.gcNudge,
    // see Exprs.gcNudge) lets ContextCleaner reap its files before the next
    // band writes (driver-side, once per band).
    def checkpointBand(bandResult: DataFrame): DataFrame = {
      val r = bandResult.localCheckpoint()
      graft.ops.Exprs.gcNudge(r.sparkSession,
        bandSerial > 0 || scratchPressure)
      r
    }
    // Pass 1: per-id min verified partner — the pair stream collapses
    // map-side into the n-row aggregate; pairs never hit the shuffle.
    def minPartner(pairs: DataFrame): DataFrame = pairs
      .filter(Similarity.cosine(col("a.v"), col("b.v")) >= threshold)
      .select(explode(array(
        struct(col("a.id").as("id"), col("b.id").as("p")),
        struct(col("b.id").as("id"), col("a.id").as("p")))).as("c"))
      .select(col("c.id").as("id"), col("c.p").as("p"))
      .groupBy(col("id")).agg(min(col("p")).as("p"))
    val keyed = banded(sig)
    val e1 = {
      if (!serial)
        minPartner(keyed.as("a").join(keyed.as("b"),
            col("a.band") === col("b.band") &&
              col("a.bits") === col("b.bits") && col("a.id") < col("b.id"))
          .filter(firstMatch)
          .filter(hamming <= hmax))
      else (0 until nb)
        .map(b => checkpointBand(
          minPartner(bandPairs(sig, b).filter(hamming <= hmax))))
        .reduce(_ unionAll _)
        .groupBy(col("id")).agg(min(col("p")).as("p"))
    }
      // materialize ONCE before clustering: dupClusters symmetrizes its
      // input (two scans of the plan), which would re-run the expensive
      // banded join twice if left lazy — measured 2x the pass-1 cost
      .persist(StorageLevel.MEMORY_AND_DISK)
    val e1Count = e1.count()
    val l1 = dupClusters(e1.select(col("id").as("id_a"), col("p").as("id_b")),
      maxIter = maxIter, knownPairCount = e1Count)
      .withColumnRenamed("cluster", "lbl")
      .persist(StorageLevel.MEMORY_AND_DISK) // pass 2 + composition
    // Pass 2: cross-component verified edges; label equality screens
    // BEFORE the arithmetic, and the output is the distinct component
    // graph — bounded by component count, not pair count.
    def componentEdges(pairs: DataFrame): DataFrame = pairs
      .filter(col("a.lbl") =!= col("b.lbl"))
      .filter(hamming <= hmax)
      .filter(Similarity.cosine(col("a.v"), col("b.v")) >= threshold)
      .select(least(col("a.lbl"), col("b.lbl")).as("id_a"),
        greatest(col("a.lbl"), col("b.lbl")).as("id_b"))
      .distinct()
    val labeled0 = sig.join(l1, Seq("id"), "left")
      .withColumn("lbl", coalesce(col("lbl"), col("id")))
    // serial mode scans the labeled relation once per band — persist it
    // there; fused scans it once (exchange reuse covers the self-join)
    val labeled =
      if (serial) labeled0.persist(StorageLevel.MEMORY_AND_DISK) else labeled0
    val keyedL = banded(labeled)
    val cross = {
      if (!serial)
        componentEdges(keyedL.as("a").join(keyedL.as("b"),
            col("a.band") === col("b.band") &&
              col("a.bits") === col("b.bits") && col("a.id") < col("b.id"))
          .filter(firstMatch))
      else (0 until nb)
        .map(b => checkpointBand(componentEdges(bandPairs(labeled, b))))
        .reduce(_ unionAll _)
        .distinct()
    }
      // same once-only materialization: the reconciliation join must not
      // re-run inside dupClusters' symmetrize-and-count
      .persist(StorageLevel.MEMORY_AND_DISK)
    val crossCount = cross.count()
    if (serial) labeled.unpersist()
    val l2 = dupClusters(cross, maxIter = maxIter,
      knownPairCount = crossCount)
      .withColumnRenamed("id", "lbl").withColumnRenamed("cluster", "c2")
    // Compose: final(x) = l2(l1(x)) if its component was merged further,
    // else l1(x); unpaired ids are their own representative.
    val labels = sig.select(col("id"))
      .join(l1, Seq("id"), "left")
      .withColumn("lbl", coalesce(col("lbl"), col("id")))
      .join(l2, Seq("lbl"), "left")
      .select(col("id"), coalesce(col("c2"), col("lbl")).as("cluster"))
      .localCheckpoint()
    sig.unpersist()
    l1.unpersist()
    e1.unpersist()
    cross.unpersist()
    labels
  }

  /** Keep one representative (the min id) per embedding near-dup cluster,
    * without ever materializing the pair list — see [[embedDupLabels]]
    * for the contract. Rows with null vectors survive untouched. */
  def dedupByEmbedding(df: DataFrame, idCol: String, vecCol: String,
                       threshold: Double, bands: Int = 0, bandBits: Int = 0,
                       dim: Int = 0, maxHamming: Int = -1,
                       maxIter: Int = 25, bandSerial: Int = -1,
                       knownRows: Long = -1L): DataFrame =
    dedupByClusters(df, idCol,
      embedDupLabels(df, idCol, vecCol, threshold, bands, bandBits, dim,
        maxHamming, maxIter, bandSerial, knownRows))

  /** SemDeDup-style semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): a coarse quantizer partitions the embedding
    * space into cells and near-duplicate pruning runs WITHIN each cell
    * only — the paper's approximation that replaces the O(n²) global
    * similarity graph (or [[dedupByEmbedding]]'s banded LSH over it)
    * with O(Σ|cell|²) local work, |cell| ≈ n/nlist, at the cost of
    * missing cross-cell pairs. A semantic tier above the reference's
    * near-dup surface (reference dedup stops at MinHash/SimHash text
    * similarity); [[dedupByEmbedding]] remains the graph-exact path
    * when cross-cell recall matters.
    *
    * Keep rule (deterministic and restatable by an external SQL
    * oracle): a row is DROPPED iff some smaller-id row in the SAME
    * cell has cosine ≥ `threshold`. One pass, no transitive closure —
    * identical to closure on clique-shaped dup groups (exact/near
    * copies, the regime SemDeDup targets), intentionally simpler on
    * chains. The paper keeps the member FARTHEST from the centroid
    * per group; min-id keep is the deterministic choice that makes
    * the kept set a pure function of the data.
    *
    * Scale shape: centroids are a driver-bounded structure (caller
    * `seedIds`, whose vectors become centroids verbatim — zero Lloyd
    * iterations, so an oracle can restate the assignment — or
    * [[Ivf.fitCentroids]]' bounded-sample Lloyd when seeds are empty);
    * assignment is the native [[graft.functions.NearestCell]] codegen
    * kernel via [[Ivf.cellOfCosine]] (the HOF form is retained as its
    * parity reference, pinned in GraftProps); the only shuffle keys
    * (id, vec, cell) by
    * cell — nlist ≫ partitions spreads cells across the cluster — and
    * the per-cell self-join's compute is Σ|cell|², so nlist should
    * track n / (intended cell size). The dropped-id set (bounded by
    * the duplicate count) flows into one anti-join. */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, nlist: Int = 0, seedIds: Seq[Long] = Nil,
      iters: Int = 10): DataFrame = {
    require(seedIds.nonEmpty || nlist > 0,
      "semanticDedup needs seedIds or nlist > 0")
    val v0 = df.filter(col(vecCol).isNotNull)
    val centroids: Array[Array[Double]] =
      if (seedIds.nonEmpty) {
        val byId = v0.filter(col(idCol).isin(seedIds: _*))
          .select(col(idCol).cast("long").as("id"),
            col(vecCol).cast("array<double>").as("v"))
          .collect() // bounded by seedIds.size
          .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
        seedIds.toArray.map(id => byId.getOrElse(id,
          sys.error(s"semanticDedup: seed id $id has no vector")))
      } else Ivf.fitCentroids(v0, vecCol, nlist, iters)
    val base = v0.select(col(idCol).as("__sd_id"), col(vecCol).as("__sd_v"),
      Ivf.cellOfCosine(col(vecCol), centroids).as("__sd_cell"))
    semanticDropJoin(df, idCol, base, threshold)
  }

  /** Shared core of the SemDeDup family: within-cell min-id prune over
    * any cell assignment. `base` carries (__sd_id, __sd_v, __sd_cell);
    * a row is dropped iff a smaller-id row in the SAME cell has cosine
    * ≥ threshold. The join is an equi-join on the cell id (plan-shape
    * pinned: never cartesian); null cells join nothing by SQL
    * three-valued semantics, so unassignable rows are always kept. */
  private def semanticDropJoin(df: DataFrame, idCol: String,
      base: DataFrame, threshold: Double): DataFrame = {
    val dropped = base.as("a").join(base.as("b"),
        col("a.__sd_cell") === col("b.__sd_cell") &&
          col("a.__sd_id") < col("b.__sd_id"))
      .filter(Similarity.cosine(col("a.__sd_v"), col("b.__sd_v"))
        >= threshold)
      .select(col("b.__sd_id").as(idCol))
      .distinct()
    df.join(dropped, Seq(idCol), "left_anti")
  }

  /** [[semanticDedup]] with a TWO-LEVEL quantizer — the form whose
    * fitted mode scales past the flat quantizer's practical ceiling.
    * The flat form's per-row assignment costs nlist × dim flops, so
    * holding SemDeDup's |cell| ≈ 500 as n grows (nlist ≈ n/500) turns
    * assignment into a compute wall around nlist ≈ 2048; past it the
    * cells grow linearly instead and the within-cell Σ|cell|² join
    * dominates quadratically. Two levels break the trade: coarse cells
    * (≤ ~2048, [[Ivf.fitCentroids]]) each get `subPerCell`
    * sub-centroids fit from a bounded per-cell sample
    * ([[Ivf.fitSubCentroids]]), for effective nlist = coarse ×
    * subPerCell at (coarse + subPerCell) × dim flops per row — both
    * levels inside one whole-stage-codegen projection
    * ([[Ivf.cellOfCosineTwoLevel]]). The min-id keep rule, the
    * equi-join-on-cell plan shape, and the one anti-join are identical
    * to the flat form (shared [[semanticDropJoin]] core).
    *
    * Seeded mode (`seedIds` + `subSeedIds`) makes the whole assignment
    * restatable by an external SQL oracle, exactly like the flat form's
    * seeded mode: coarse centroids are `seedIds`' vectors verbatim and
    * cell i's sub-centroids are `subSeedIds(i)`'s vectors verbatim —
    * zero Lloyd anywhere. Fitted mode (`coarseNlist` + `subPerCell`)
    * is the scale path; its driver work is bounded by the two sample
    * collects, never by the corpus. */
  def semanticDedupTwoLevel(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, coarseNlist: Int = 0, subPerCell: Int = 0,
      iters: Int = 10, samplePerCell: Int = 256,
      seedIds: Seq[Long] = Nil,
      subSeedIds: Seq[Seq[Long]] = Nil): DataFrame = {
    val seeded = seedIds.nonEmpty
    require(seeded == subSeedIds.nonEmpty,
      "seeded two-level dedup needs BOTH seedIds and subSeedIds")
    require(seeded || (coarseNlist > 0 && subPerCell > 0),
      "fitted two-level dedup needs coarseNlist > 0 and subPerCell > 0")
    require(!seeded || subSeedIds.length == seedIds.length,
      "subSeedIds must carry one seed list per coarse seed")
    val v0 = df.filter(col(vecCol).isNotNull)
    val (coarse, subs): (Array[Array[Double]], Array[Array[Array[Double]]]) =
      if (seeded) {
        val byId = seedVectors(v0, idCol, vecCol,
          (seedIds ++ subSeedIds.flatten).distinct)
        (seedIds.toArray.map(byId),
         subSeedIds.toArray.map(_.toArray.map(byId)))
      } else {
        val c = Ivf.fitCentroids(v0, vecCol, coarseNlist, iters)
        (c, Ivf.fitSubCentroids(v0, vecCol, c, subPerCell, iters,
          samplePerCell))
      }
    val base = v0.select(col(idCol).as("__sd_id"), col(vecCol).as("__sd_v"),
      Ivf.cellOfCosineTwoLevel(col(vecCol), coarse, subs).as("__sd_cell"))
    semanticDropJoin(df, idCol, base, threshold)
  }

  /** Bounded driver lookup of seed vectors by id (collect is bounded by
    * the seed count). */
  private def seedVectors(v0: DataFrame, idCol: String, vecCol: String,
      ids: Seq[Long]): Map[Long, Array[Double]] = {
    val byId = v0.filter(col(idCol).isin(ids: _*))
      .select(col(idCol).cast("long").as("id"),
        col(vecCol).cast("array<double>").as("v"))
      .collect() // bounded by ids.size
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    ids.foreach(id => require(byId.contains(id),
      s"seed id $id has no vector"))
    byId
  }

  // ---- near-duplicate cluster assignment ----

  /** Connected-component cluster labels over a near-duplicate pair
    * relation: returns (id, cluster) where cluster is the minimum id
    * reachable through any chain of pairs. Pairwise similarity is not
    * transitive (A~B and B~C does not imply A~C) but dedup policy must
    * be — this is the standard grouping step between pair generation
    * (minhash / simhash / jaccard / embedding) and representative
    * selection (reference near-dup surface: dedup/near_duplicate.py).
    *
    * Scale shape: alternating LARGE-STAR / SMALL-STAR edge contraction
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014 — the production MapReduce CC algorithm): each half-round
    * is one groupBy-min plus one join over the CURRENT edge set, and the
    * graph contracts geometrically — a clique collapses to a star in one
    * large-star pass, chains halve every alternation — so rounds are
    * O(log² n) worst case and single digits in practice, with the edge
    * set SHRINKING as supernodes form. This replaced a hash-min +
    * label-of-label loop whose convergence plateaued (~400 labels/round
    * for 15+ rounds) on the dense-clique-with-filament graphs real
    * near-dup pair sets produce — measured on the sf10 embedding pair
    * graph (2.1M pairs, 2k ~100-member near-cliques), where hash-min
    * blew the round budget and contraction converges in a handful of
    * alternations. Lineage is truncated per round via localCheckpoint;
    * on a real cluster swap in reliable checkpoints for executor-loss
    * tolerance. Only ids that appear in some pair are labeled —
    * singletons are trivially their own cluster and never enter the
    * shuffle.
    *
    * Driver fast path: verified pair graphs are typically orders of
    * magnitude smaller than the corpus, so when the (long-keyed)
    * symmetric edge list fits under `driverEdgeLimit` it is collected
    * and solved by union-find on the driver — a bounded collect (2^20
    * edges ≈ 16 MB) in the same spirit as the IVF driver k-means fit,
    * producing byte-identical labels. The contraction path engages for
    * genuinely huge graphs (or non-long ids). */
  def dupClusters(pairs: DataFrame, idA: String = "id_a",
                  idB: String = "id_b", maxIter: Int = 25,
                  driverEdgeLimit: Long = 1L << 20,
                  knownPairCount: Long = -1L): DataFrame = {
    val pairsLongKeyed =
      pairs.schema(idA).dataType == org.apache.spark.sql.types.LongType &&
        pairs.schema(idB).dataType == org.apache.spark.sql.types.LongType
    def unionFind(rows: Array[org.apache.spark.sql.Row]): DataFrame = {
      val spark = pairs.sparkSession
      import spark.implicits._
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      // iterative find + path compression: union-by-min can build deep
      // chains before compression, so no recursion
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElseUpdate(r, r) != r) r = parent(r)
        var c = x
        while (c != r) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      rows.foreach { r =>
        val (ra, rb) = (find(r.getLong(0)), find(r.getLong(1)))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      lastRoundsTl.set(0)
      parent.keys.toSeq.map(id => (id, find(id))).toDF("id", "cluster")
    }
    // Fast path for callers that ALREADY materialized + counted their
    // pair relation (the fused embed-dedup passes persist-and-count both
    // of theirs): union-find neither needs the symmetric closure nor
    // dedup — raw pairs yield identical components — so when the caller
    // vouches for the size we collect the pairs directly instead of
    // paying a symmetrize+distinct shuffle, a count job and a second
    // collect over it (r15: two shuffles + two jobs saved per call).
    if (knownPairCount >= 0 && 2 * knownPairCount <= driverEdgeLimit &&
        pairsLongKeyed)
      return unionFind(pairs.select(col(idA), col(idB)).collect())
    val e = pairs.select(col(idA).as("src"), col(idB).as("dst"))
      .unionAll(pairs.select(col(idB).as("src"), col(idA).as("dst")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val longKeyed = e.schema("src").dataType ==
      org.apache.spark.sql.types.LongType
    if (longKeyed && e.count() <= driverEdgeLimit) {
      val rows = e.collect() // bounded by driverEdgeLimit
      e.unpersist()
      return unionFind(rows)
    }
    // all ids of the graph — label targets (fixed; supernode contraction
    // below rewrites edges, so the final star edges alone would lose
    // intermediate members)
    val nodes = e.select(col("src").as("id")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()
    // large-star: every node connects its LARGER neighbors to the
    // minimum of its whole neighborhood (including itself)
    def largeStar(ed: DataFrame): DataFrame = {
      val sym = ed.unionAll(ed.select(col("dst").as("src"), col("src").as("dst")))
      val m = sym.groupBy(col("src"))
        .agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      sym.filter(col("dst") > col("src"))
        .join(m, Seq("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    // small-star: every node connects its SMALLER-or-equal neighbors
    // (and itself) to the minimum among them
    def smallStar(ed: DataFrame): DataFrame = {
      val or = ed.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      val m = or.groupBy(col("src")).agg(min(col("dst")).as("m"))
      or.join(m, Seq("src"))
        .select(explode(array(
          struct(col("dst").as("s"), col("m").as("d")),
          struct(col("src").as("s"), col("m").as("d")))).as("c"))
        .select(col("c.s").as("src"), col("c.d").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }
    // fingerprint for convergence: edge count + order-independent hash
    // sum — equal fingerprints across an alternation ⇒ fixpoint (the
    // star set is stable under both passes)
    def fp(ed: DataFrame): (Long, Long) = {
      // mod keeps the order-independent hash sum overflow-safe under
      // ANSI arithmetic (raw xxhash64 sums overflow Long immediately);
      // fp equality is only a cheap pre-check — exceptAll confirms
      val r = ed.agg(count(lit(1)).as("c"),
        coalesce(sum(pmod(xxhash64(col("src"), col("dst")),
          lit(1000000007L))), lit(0L)).as("h")).head()
      (r.getLong(0), r.getLong(1))
    }
    var cur = e.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct().localCheckpoint()
    var curFp = fp(cur)
    var iter = 0
    var converged = cur.isEmpty
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(cur)).localCheckpoint()
      val nextFp = fp(next)
      converged = nextFp == curFp && next.exceptAll(cur).isEmpty
      cur = next
      curFp = nextFp
      iter += 1
    }
    e.unpersist()
    lastRoundsTl.set(iter)
    log.info(s"dupClusters contraction converged in $iter rounds " +
      s"(maxIter=$maxIter)")
    if (!converged && iter >= maxIter)
      throw new IllegalStateException(
        s"dupClusters contraction did not converge in $maxIter rounds — " +
          "raise maxIter")
    // fixpoint: every component is a star (member -> root, root = the
    // component minimum). Large-star/small-star never drops a
    // non-root node from the edge set, so at fixpoint every non-root
    // appears as src of exactly one star edge; composing back onto the
    // ORIGINAL node set, coalesce(c1, id) labels non-roots with their
    // star root and roots (the only nodes absent as src) with themselves.
    val stars = cur
    val labels = nodes
      .join(stars.select(col("src").as("id"), col("dst").as("c1")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("c1"), col("id")).as("cluster"))
      .localCheckpoint()
    nodes.unpersist()
    labels
  }

  /** Drop every clustered row except its representative (the cluster's
    * min id): the keep-one-per-near-dup-group operation. Rows that never
    * appeared in a pair survive untouched (anti-join against the loser
    * set only — the 100 TB side streams through one hash anti-join). */
  def dedupByClusters(df: DataFrame, idCol: String, clusters: DataFrame): DataFrame =
    df.join(clusters.filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol)), Seq(idCol), "left_anti")

  /** End-to-end near-dedup: MinHash-LSH pairs → connected-component
    * clusters → keep the min-id representative per cluster. */
  def nearDedup(df: DataFrame, idCol: String, textCol: String,
                k: Int = 32, bands: Int = 8, shingleN: Int = 3,
                threshold: Double = 0.7): DataFrame = {
    val pairs = minhashLshPairs(df, idCol, textCol, k, bands, shingleN, threshold)
    val clusters = dupClusters(pairs) // checkpointed: independent of pairs
    pairs.unpersist()
    dedupByClusters(df, idCol, clusters)
  }

  /** Incremental near-dedup: dedup an incoming batch against an
    * existing corpus — the production mode (daily crawl vs index).
    * Semantics, in order:
    *   1. an incoming doc with a qualifying pair to ANY existing doc is
    *      dropped (direct index match — similarity is not transitive,
    *      so an incoming doc linked to the index only THROUGH another
    *      dropped incoming doc survives);
    *   2. survivors are then transitively deduped among themselves
    *      (dupClusters, keep the min-id representative).
    * Ids must be distinct across the two frames. The existing corpus is
    * never modified or re-deduped — at 100 TB it participates only as
    * the far side of the candidate join (LSH banding keeps that an
    * equi-join, never a cross join). */
  def dedupIncrement(existing: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String, shingleN: Int = 3,
      threshold: Double = 0.7, useLsh: Boolean = true): DataFrame = {
    val tagged = existing.select(col(idCol), col(textCol))
      .withColumn("__side", lit(0))
      .unionAll(incoming.select(col(idCol), col(textCol))
        .withColumn("__side", lit(1)))
    val pairs =
      if (useLsh) minhashLshPairs(tagged, idCol, textCol,
        shingleN = shingleN, threshold = threshold)
      else jaccardPairs(tagged, idCol, textCol, shingleN, threshold)
    val side = tagged.select(col(idCol).as("__id"), col("__side"))
    val p = pairs
      .join(side.withColumnRenamed("__id", "id_a")
        .withColumnRenamed("__side", "sa"), Seq("id_a"))
      .join(side.withColumnRenamed("__id", "id_b")
        .withColumnRenamed("__side", "sb"), Seq("id_b"))
      .persist(StorageLevel.MEMORY_AND_DISK) // pairs relation: small
    // materialized: the returned plan must not re-derive the pair
    // relation after it is unpersisted below
    val hitByExisting = p.filter(col("sa") === 0 && col("sb") === 1)
      .select(col("id_b").as(idCol))
      .unionAll(p.filter(col("sa") === 1 && col("sb") === 0)
        .select(col("id_a").as(idCol)))
      .distinct().localCheckpoint()
    // r15: the hit set is bounded by the incoming BATCH and already
    // materialized (checkpoint), so its exact size is a cached-read
    // count — broadcast the anti-join side when it is genuinely small
    // (the planner otherwise has no stats for the checkpointed RDD and
    // plans a sort-merge anti-join that exchanges the incoming side).
    // The gate keeps a pathologically large hit set (huge batch, dense
    // matches) on the shuffled plan instead of forcing an oversized
    // broadcast.
    //
    // r16 — the gate is in BYTES, not rows (ADVICE r15): a row gate
    // admits 4M WIDE STRING ids into a broadcast that builds to
    // hundreds of MB per executor (guide §5). Estimated built size =
    // rows × (hash-relation entry overhead ≈ 48 B + key width); string
    // keys measure their exact total bytes in the same cached-read job
    // as the count, fixed-width keys are 8 B. Default budget 256 MB
    // (`spark.graft.incrementBroadcastBytes`) keeps the former 4M-row
    // behavior for long ids (4M × 56 B = 224 MB) and falls back to the
    // shuffled anti-join for ids wide enough to blow the budget.
    val gateBytes = incoming.sparkSession.conf
      .get("spark.graft.incrementBroadcastBytes", (256L << 20).toString)
      .toLong
    val idIsString = incoming.schema(idCol).dataType ==
      org.apache.spark.sql.types.StringType
    val (hitCount, hitIdBytes) =
      if (idIsString) {
        val r = hitByExisting.agg(count(lit(1)),
          coalesce(sum(octet_length(col(idCol))), lit(0L))).head()
        (r.getLong(0), r.getLong(1))
      } else {
        val c = hitByExisting.count(); (c, 8L * c)
      }
    val avgIdW = if (hitCount > 0) hitIdBytes.toDouble / hitCount else 8.0
    val hitsSide =
      if (48L * hitCount + hitIdBytes <= gateBytes) broadcast(hitByExisting)
      else hitByExisting
    val survivors = incoming.join(hitsSide, Seq(idCol), "left_anti")
    // in-batch edges restricted to still-surviving incoming docs
    val ii = p.filter(col("sa") === 1 && col("sb") === 1)
      .join(survivors.select(col(idCol).as("id_a")), Seq("id_a"), "left_semi")
      .join(survivors.select(col(idCol).as("id_b")), Seq("id_b"), "left_semi")
      .select(col("id_a"), col("id_b"))
      // r15: materialize + count once so dupClusters takes its
      // known-size driver path (skips the symmetrize shuffle + recount)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val iiCount = ii.count()
    val clusters = dupClusters(ii, knownPairCount = iiCount)
    ii.unpersist()
    p.unpersist()
    pairs.unpersist()
    // the loser set is bounded by the in-batch pair graph: when the
    // graph took the known-size driver path (≤ 2^19 pairs) the loser
    // relation is at most 2^20 ids — broadcast it; a bigger graph keeps
    // the plain anti-join (AQE decides from runtime sizes). r16: the
    // bound is in BYTES like the hit gate above — loser ids draw from
    // the same batch-id domain, so the hit set's measured average width
    // (8 B for fixed-width ids) prices them without another job.
    val losers = clusters.filter(col("id") =!= col("cluster"))
      .select(col("id").as(idCol))
    val losersSide =
      if ((2 * iiCount * (48.0 + avgIdW)).toLong <= math.min(
            gateBytes, 64L << 20)) broadcast(losers)
      else losers
    survivors.join(losersSide, Seq(idCol), "left_anti")
  }

  /** Incremental EMBEDDING near-dedup: dedup an incoming embedding batch
    * against an existing corpus index — [[dedupIncrement]]'s semantics
    * restated in cosine space (the production semantic-dedup flow: daily
    * embedding batch vs index). Semantics, in order:
    *   1. an incoming row whose vector has cosine >= `threshold` to ANY
    *      existing row is dropped (direct index match — similarity is
    *      not transitive, so an incoming row linked to the index only
    *      THROUGH another dropped incoming row survives);
    *   2. survivors are then transitively deduped among themselves
    *      ([[dedupByEmbedding]] — the fused representative-only path,
    *      min-id representative per cluster).
    * Ids must be distinct across the two frames; the existing corpus is
    * never modified or re-deduped.
    *
    * Scale shape: both sides project to the same banded sign-LSH
    * signatures (identical deterministic hyperplanes by construction),
    * so the index participates ONLY as the far side of one banded
    * equi-join — scan-speed signature projection, no persist, never a
    * cross join — and the per-band first-match screen plus Hamming
    * prefilter keep verified-cosine work on collided candidates only.
    * With `broadcastBatch` (default — the daily-batch-vs-index regime),
    * the exploded batch signatures broadcast and the CORPUS NEVER
    * SHUFFLES: candidates are probed, Hamming-screened and
    * cosine-verified map-side at scan speed, and the only shuffled
    * relation all job is the batch-bounded hit-id set. Disable it for
    * batch sizes past driver memory (batch rows × bands × (vector +
    * signatures) must fit; Spark's 8 GB broadcast cap fails loudly) —
    * the plan degrades to a shuffled equi-join, still never a cross
    * join. The hit set is bounded by the BATCH size; everything after
    * step 1 (anti-join + in-batch fused dedup) is batch-sized. */
  def dedupIncrementEmbedding(existing: DataFrame, incoming: DataFrame,
      idCol: String, vecCol: String, threshold: Double,
      bands: Int = 0, bandBits: Int = 0, dim: Int = 0,
      maxHamming: Int = -1, maxIter: Int = 25,
      broadcastBatch: Boolean = true, bandSerial: Int = -1): DataFrame = {
    val ex = existing.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("v"))
    val inc = incoming.filter(col(vecCol).isNotNull)
      .select(col(idCol).as("id"), col(vecCol).as("v"))
    val probed = if (dim > 0) Some(dim)
      else inc.select(size(col("v")).as("d")).take(1).headOption
        .map(_.getInt(0))
    if (probed.isEmpty) return incoming // vector-less batch: nothing to do
    val d = probed.get
    val (nb, bb) =
      if (bands > 0 && bandBits > 0) (bands, bandBits)
      else {
        // one fused count job over both sides (same scan work as two
        // counts, half the job-scheduling latency on small batches)
        val n = ex.select(col("id")).unionAll(inc.select(col("id"))).count()
        val plan = lshPlan(n, threshold)
        (if (bands > 0) bands else plan._1,
         if (bandBits > 0) bandBits else plan._2)
      }
    val totalBits = nb * bb
    val hmax =
      if (maxHamming >= 0) maxHamming
      else math.min(totalBits,
        math.ceil(2.0 * totalBits * math.acos(threshold) / math.Pi).toInt
          .max(1))
    val sigCols = (0 until nb).map(b =>
      Similarity.lshBucket(col("v"), bb, d, b * bb).as(s"s$b"))
    def banded(rel: DataFrame): DataFrame = rel
      .select(col("id") +: col("v") +: sigCols: _*)
      .withColumn("band", explode(array((0 until nb).map(lit): _*)))
      .withColumn("bits", element_at(
        array((0 until nb).map(b => col(s"s$b")): _*), col("band") + 1))
    val firstMatch = (0 until nb - 1).map { b =>
      col("a.band") <= b || col(s"a.s$b") =!= col(s"b.s$b")
    }.reduceOption(_ && _).getOrElse(lit(true))
    val hamming = (0 until nb)
      .map(b => bit_count(col(s"a.s$b").bitwiseXOR(col(s"b.s$b"))))
      .reduce(_ + _)
    // Step 1: direct index hits. Distinct collapses map-side; the hit
    // ids are checkpointed so the anti-join below never re-drives the
    // banded join. In broadcast mode the exploded CORPUS side never
    // shuffles (it streams map-side against the broadcast batch), so
    // band-serial never applies there; the shuffled fallback DOES
    // materialize the exploded corpus — O(n·bands·dim) bytes, the same
    // cliff [[embedDupLabels]]' bandSerial bounds — so it goes
    // band-serial under the same auto rule (one corpus-sized band live
    // at a time, identical hit set: the per-band first-match partition
    // covers every screened candidate exactly once).
    val hits = (if (broadcastBatch) {
      val incKeyed = banded(inc)
      broadcast(incKeyed).as("a").join(banded(ex).as("b"),
          col("a.band") === col("b.band") && col("a.bits") === col("b.bits"))
        .filter(firstMatch)
        .filter(hamming <= hmax)
        .filter(Similarity.cosine(col("a.v"), col("b.v")) >= threshold)
        .select(col("a.id").as(idCol)).distinct()
    } else {
      lazy val scratchPressure =
        explodeBytes(ex.count(), nb, d) > SerialBandAutoBytes
      val serial = bandSerial match {
        case 0          => false
        case x if x > 0 => true
        case _          => scratchPressure
      }
      def sigOf(rel: DataFrame): DataFrame =
        rel.select(col("id") +: col("v") +: sigCols: _*)
      if (!serial) {
        val incKeyed = banded(inc)
        incKeyed.as("a").join(banded(ex).as("b"),
            col("a.band") === col("b.band") && col("a.bits") === col("b.bits"))
          .filter(firstMatch)
          .filter(hamming <= hmax)
          .filter(Similarity.cosine(col("a.v"), col("b.v")) >= threshold)
          .select(col("a.id").as(idCol)).distinct()
      } else {
        val exSig = sigOf(ex).persist(StorageLevel.MEMORY_AND_DISK)
        val incSig = sigOf(inc).persist(StorageLevel.MEMORY_AND_DISK)
        val perBand = (0 until nb).map { b =>
          val first = (0 until b).map(p => col(s"a.s$p") =!= col(s"b.s$p"))
            .reduceOption(_ && _).getOrElse(lit(true))
          val r = incSig.withColumn("bits", col(s"s$b")).as("a")
            .join(exSig.withColumn("bits", col(s"s$b")).as("b"),
              col("a.bits") === col("b.bits"))
            .filter(first)
            .filter(hamming <= hmax)
            .filter(Similarity.cosine(col("a.v"), col("b.v")) >= threshold)
            .select(col("a.id").as(idCol)).distinct()
            .localCheckpoint()
          // conf-gated (spark.graft.gcNudge): reap band b's join shuffle.
          // Forced serial (bandSerial > 0) short-circuits the pressure
          // estimate — evaluating the lazy here would run an ex.count()
          // job the forced path otherwise never needs; a user forcing
          // serial is asking for the pressure regime's behavior anyway.
          graft.ops.Exprs.gcNudge(incoming.sparkSession,
            bandSerial > 0 || scratchPressure)
          r
        }
        // the union+distinct reads only the checkpointed band results,
        // so the sig caches can go before the outer materialization
        val u = perBand.reduce(_ unionAll _).distinct()
        exSig.unpersist(); incSig.unpersist()
        u
      }
    }).localCheckpoint()
    // In broadcast mode the hit-id set is DRIVER-BOUNDED by contract
    // (it is a subset of the batch ids, and the exploded batch already
    // broadcast), so the anti-join broadcasts it — without the hint the
    // checkpointed RDD has no size statistics and the planner falls
    // back to a sort-merge anti-join that EXCHANGES the incoming side
    // (r15 plan audit: one Exchange + Sort per incoming union arm, for
    // a relation the driver already bounded). In the shuffled fallback
    // mode the batch carries no driver-fit guarantee, so the hint is
    // NOT forced there — AQE still converts at runtime when the hit set
    // turns out small.
    val hitsSide = if (broadcastBatch) broadcast(hits) else hits
    val survivors = incoming.join(hitsSide, Seq(idCol), "left_anti")
    // Step 2: in-batch transitive dedup over survivors only, with the
    // same LSH geometry. In broadcast mode the batch (hence survivors)
    // fits the driver by contract, so its exploded banded-join input can
    // never reach the band-serial scratch threshold — pin fused mode
    // instead of letting embedDupLabels run a survivors-count job (a
    // full re-scan of the anti-join) just to conclude the same thing.
    val step2Serial =
      if (bandSerial == -1 && broadcastBatch) 0 else bandSerial
    dedupByEmbedding(survivors, idCol, vecCol, threshold, nb, bb, d,
      maxHamming, maxIter, step2Serial)
  }

  // ---- line-level corpus dedup ----

  /** Corpus-wide exact line deduplication: every line of at least
    * `minLineLen` characters that occurs more than once ACROSS the corpus
    * keeps only its first occurrence (ordered by (id, position)); later
    * occurrences are removed from their documents and the surviving lines
    * are rejoined in original order. Lines shorter than `minLineLen` are
    * never touched — blank lines and short boilerplate ("Home", "***")
    * occur everywhere, and deduping them would shred unrelated documents.
    * This is the C4/RefinedWeb-style preprocessing step that document-level
    * dedup cannot express: boilerplate (cookie banners, nav menus, license
    * headers) repeats across documents whose full texts are unique.
    *
    * Scale shape: explode to (id, pos, line) once; find each duplicated
    * line's first occurrence with a partial-aggregatable min(struct) — NOT
    * a per-line window, whose per-key sort would hot-spot on
    * mega-duplicated boilerplate keys — then one equi-join back on the
    * line and a groupBy(id) rebuild. The min-agg combines map-side, so
    * reducer traffic for a line duplicated a billion times is one row per
    * map partition; the join back is skewed on exactly those keys, which
    * is AQE skew-join territory (one small row fanned to many). */
  def dedupLinesCorpus(df: DataFrame, idCol: String, textCol: String,
                       minLineLen: Int = 30): DataFrame = {
    val lines = df.select(col(idCol),
      posexplode(split(col(textCol), "\n", -1)).as(Seq("__pos", "__line")))
    // every instance of a given line shares its length, so filtering
    // before the groupBy only shrinks the shuffle — it cannot change
    // which occurrence of an eligible line ranks first
    val first = lines.filter(length(col("__line")) >= minLineLen)
      .groupBy(col("__line"))
      .agg(min(struct(col(idCol).as("fid"), col("__pos").as("fpos")))
        .as("__f"))
    val kept = lines.join(first, Seq("__line"), "left")
      .filter(col("__f").isNull ||
        (col("__f.fid") === col(idCol) && col("__f.fpos") === col("__pos")))
    val rebuilt = kept.groupBy(col(idCol))
      .agg(concat_ws("\n", transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        s => s.getField("__line"))).as("__text"))
    // a document whose every line was a later duplicate has no kept rows
    // at all — it survives as an empty text, for a downstream minTokens
    // stage to drop or keep by policy
    df.join(rebuilt, Seq(idCol), "left")
      .withColumn(textCol, coalesce(col("__text"), lit("")))
      .drop("__text")
  }

  // ---- benchmark decontamination ----

  /** Corpus documents contaminated by a benchmark/eval set: any shared
    * word n-gram (n = 13, the published GPT-3/LLaMA decontamination
    * shingle size) OR an exact normalized-content match (covers docs
    * shorter than n words, which have no shingles).
    *
    * Scale shape: the benchmark side is distinct n-gram HASHES — small by
    * definition (eval sets, not corpora) — and is broadcast; the corpus
    * explodes to (id, gram-hash) at scan speed and semi-joins, so the
    * 100 TB side never shuffles more than its own shingle stream and the
    * output is just the distinct contaminated ids. */
  def contaminatedIds(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13): DataFrame = {
    // rolling token-hash shingles in ONE native codegen pass
    // (Text.shingleHashes → ShingleHashes64): tokens hash once per doc,
    // windows combine by rotate-xor in a primitive loop — no
    // per-position shingle string, no boxed lambdas. Docs shorter than
    // the shingle width yield an empty array (no explode rows) and are
    // covered by the exact-fingerprint arm below.
    val bGrams = benchmark
      .withColumn("__toks", Text.tokens(col(benchTextCol)))
      .select(explode(Text.shingleHashes(col("__toks"), n)).as("gh"))
      .distinct()
    val byGram = corpus
      .withColumn("__toks", Text.tokens(col(textCol)))
      .select(col(idCol), explode(Text.shingleHashes(col("__toks"), n)).as("gh"))
      .join(broadcast(bGrams), Seq("gh"), "left_semi")
      .select(col(idCol))
    val bFp = benchmark.select(Text.fingerprint(col(benchTextCol)).as("fp"))
      .distinct()
    val byExact = corpus
      .select(col(idCol), Text.fingerprint(col(textCol)).as("fp"))
      .join(broadcast(bFp), Seq("fp"), "left_semi")
      .select(col(idCol))
    byGram.unionAll(byExact).distinct()
  }

  /** Remove contaminated documents (anti-join on the flagged id set). */
  def decontaminate(corpus: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchTextCol: String, n: Int = 13): DataFrame =
    corpus.join(
      contaminatedIds(corpus, idCol, textCol, benchmark, benchTextCol, n),
      Seq(idCol), "left_anti")

  // ---- corpus-wide exact substring dedup (repeated k-gram spans) ----

  /** Second shingle seed: with the default seed this forms a 128-bit
    * gram key (pair collision ~2^-128 per gram pair — exact-match
    * grouping without ever shuffling gram TEXT). Golden-ratio constant,
    * the standard public mixing seed. */
  private val GramSeed2 = 0x9E3779B97F4A7C15L

  /** Every non-canonical occurrence of a corpus-duplicated k-token-gram:
    * (id, pos) where pos is the 0-based token index the gram starts at.
    * A gram is duplicated when its exact normalized-token text occurs
    * `minCount`+ times corpus-wide (within- and cross-document alike);
    * its canonical occurrence — the lexicographically smallest (id, pos)
    * — is never flagged, so one copy of every repeated region survives
    * any downstream removal (the keep-one contract of Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better").
    *
    * Reference scope note: truthound's dedup surface is document-level
    * (`validators/uniqueness/duplicate.py`); substring-level dedup is
    * part of the LLM-pipeline extension (BASELINE.json north star).
    *
    * Scale shape: the suffix-array construction of the paper is a
    * single-machine design; the distributed equivalent is this gram
    * stream. Tokens hash ONCE per doc (native ShingleHashes64 rolling
    * kernel, two seeds → a 16-byte gram key), so shuffle 1 — the
    * duplicated-gram census — carries a CONSTANT ~28 bytes per token
    * position regardless of k, partial-aggregated map-side. Shuffle 2
    * re-joins the (small by definition: duplicated grams only) flagged
    * key set back to the stream; AQE sees the aggregate's true size and
    * broadcasts it in the healthy-corpus regime, so the corpus side is
    * scanned, never re-shuffled. The output is redundant occurrences
    * only — a vanishing fraction of a healthy corpus, the whole corpus
    * in the boilerplate-heavy worst case, either way bounded by the
    * token count. */
  def redundantGramStarts(df: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Long = 2L): DataFrame = {
    require(k >= 1, s"gram width k must be >= 1: $k")
    require(minCount >= 2, s"minCount must be >= 2: $minCount")
    val base = df.filter(col(textCol).isNotNull)
      .select(col(idCol).as("id"), Text.tokens(col(textCol)).as("__t"))
    val g = base.select(col("id"),
        posexplode(arrays_zip(
          Text.shingleHashes(col("__t"), k).as("h1"),
          Text.shingleHashes(col("__t"), k, GramSeed2).as("h2"))))
      .select(col("id"), col("pos"),
        col("col.h1").as("h1"), col("col.h2").as("h2"))
    // r16 — the flagged set is materialized (it is O(duplicated grams),
    // small by definition on a healthy corpus) so its EXACT size picks
    // the join-back strategy instead of leaving the corpus-sized stream
    // exchange to plan-time estimates (guide §3.1/§3.2):
    //   - at or under `spark.graft.gramFlagBroadcastRows` (default 4M)
    //     the flagged set BROADCASTS — the position stream is scanned,
    //     never shuffled;
    //   - past the gate (boilerplate-heavy corpora), a broadcast BLOOM
    //     over the flagged 128-bit keys screens the stream BEFORE the
    //     join exchange (guide §3.2) — false positives only cost a
    //     little extra shuffle, no false negatives, so the join output
    //     is unchanged; the exchange then carries ~the duplicated
    //     positions instead of every token position in the corpus.
    val flagged = g.groupBy(col("h1"), col("h2"))
      .agg(count(lit(1)).as("__c"),
        min(struct(col("id"), col("pos"))).as("__canon"))
      .filter(col("__c") >= minCount)
      .select(col("h1"), col("h2"), col("__canon"))
      .localCheckpoint()
    val nFlag = flagged.count()
    val bcastGate = df.sparkSession.conf
      .get("spark.graft.gramFlagBroadcastRows", "4000000").toLong
    val joined =
      if (nFlag <= bcastGate) g.join(broadcast(flagged), Seq("h1", "h2"))
      else {
        val bf = flagged.select(xxhash64(col("h1"), col("h2")).as("__k"))
          .stat.bloomFilter("__k", math.max(nFlag, 1L), 0.03)
        val bfB = df.sparkSession.sparkContext.broadcast(bf)
        g.filter(coalesce(graft.functions.BloomMightContainLong(
            xxhash64(col("h1"), col("h2")), bfB), lit(false)))
          .join(flagged, Seq("h1", "h2"))
      }
    joined
      .filter(col("id") =!= col("__canon.id") ||
        col("pos") =!= col("__canon.pos"))
      .select(col("id"), col("pos"))
  }

  /** Maximal per-document spans [span_start, span_end) of token indexes
    * covered by redundant duplicated-gram occurrences (see
    * [[redundantGramStarts]]): overlapping and ADJACENT gram intervals
    * [pos, pos+k) merge, so each row is one contiguous repeated region.
    * Classic gaps-and-islands; the window partitions by document, so
    * per-partition work is bounded by tokens-per-doc and the doc axis
    * distributes. */
  def repeatedGramSpans(df: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Long = 2L): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    redundantGramStarts(df, idCol, textCol, k, minCount)
      // equal-length intervals: the running max end IS prev pos + k, so
      // a new island starts exactly when pos > lag(pos) + k
      .withColumn("__new",
        when(lag(col("pos"), 1).over(w).isNull ||
          col("pos") > lag(col("pos"), 1).over(w) + k, 1).otherwise(0))
      .withColumn("__isl", sum(col("__new")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("id"), col("__isl"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + k).as("span_end"))
      .select(col("id").as(idCol), col("span_start"), col("span_end"))
  }

  /** Cut every repeated span out of the corpus, keeping the canonical
    * occurrence (see [[redundantGramStarts]]): affected documents are
    * rewritten as their surviving normalized tokens re-joined with
    * single spaces; documents with no redundant span pass through
    * BYTE-IDENTICAL (the rewrite join is left — a healthy corpus is
    * mostly untouched and never re-serialized). Token j is removed iff
    * some merged span covers it, i.e. iff some redundant gram occurrence
    * [pos, pos+k) ∋ j — the same per-token rule the Lee et al. cut
    * applies; a canonical copy overlapped by a DIFFERENT redundant gram
    * still loses those overlapped tokens, exactly like the paper's
    * span-level cut. */
  def stripRepeatedSubstrings(df: DataFrame, idCol: String,
      textCol: String, k: Int, minCount: Long = 2L): DataFrame = {
    val spans = repeatedGramSpans(df, idCol, textCol, k, minCount)
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("span_start"), col("span_end")))
        .as("__spans"))
    val toks = Text.tokens(col(textCol))
    val kept = array_join(
      transform(
        filter(
          transform(toks, (t, i) => struct(t.as("t"), i.as("i"))),
          s => !exists(col("__spans"), sp =>
            s.getField("i") >= sp.getField("span_start") &&
              s.getField("i") < sp.getField("span_end"))),
        s => s.getField("t")),
      " ")
    df.join(spans, Seq(idCol), "left")
      .withColumn(textCol,
        when(col("__spans").isNull, col(textCol)).otherwise(kept))
      .drop("__spans")
  }
}
