package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: generate a MODERATE-DENSITY near-duplicate embedding fixture
  * — clusters of 2..maxSize near-identical unit vectors (default 2..100)
  * instead of the replica-scaled fixtures' 100-/1000-deep stacks, so
  * full-pass semantic-dedup rungs measure the OPERATOR's scaling rather
  * than the fixture's duplicate mass (BASELINE.md r13 notes: on
  * replica-stacked fixtures the within-cell Σ|cell|² term is the
  * fixture's true-pair count, irreducible for any blocking scheme).
  *
  *   runMain graft.GenClusters <destDir> <nVectors> [maxSize] [dim]
  *
  * Deterministic and seed-free by construction (every random draw is an
  * xxhash64 of the cluster/member/coordinate ids): regenerating produces
  * byte-identical vectors on any partitioning. Cluster sizes are uniform
  * on [2, maxSize]; members are the cluster's base direction plus
  * per-member Gaussian noise (Box–Muller over hash-uniforms) scaled to
  * ~0.05 L2, so member↔member cosine ~0.9975 — comfortably inside the
  * 0.99 dedup threshold without being byte-identical. All vectors are
  * unit-norm like the driver fixtures. vec_id = clusterId * (maxSize+1)
  * + memberIdx keeps ids unique and the cluster structure recoverable
  * for validation. Writes `<destDir>/embeddings.parquet` with the
  * driver-fixture schema (vec_id long, embedding array<float>). */
object GenClusters {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenClusters <destDir> <nVectors> [maxSize] [dim]")
    val dest = args(0)
    val nVectors = args(1).toLong
    val maxSize = if (args.length > 2) args(2).toInt else 100
    val dim = if (args.length > 3) args(3).toInt else 64
    require(maxSize >= 2 && dim >= 2)
    val spark = graft.ops.Exprs.sessionDefaults(SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // mean cluster size = (2 + maxSize) / 2; over-provision clusters and
    // cut the member stream at nVectors exactly via the id ordering
    val meanSize = (2.0 + maxSize) / 2.0
    val nClusters = math.ceil(nVectors / meanSize * 1.1).toLong + 1

    // hash-uniform in (0,1): xxhash64 of the tagged ids, folded to 30
    // bits (plenty of entropy per draw; +0.5 keeps it off 0 for log())
    def u(tag: String, cols: org.apache.spark.sql.Column*) = {
      val h = xxhash64((lit(tag) +: cols): _*)
      (pmod(h, lit(1L << 30)).cast("double") + lit(0.5)) / lit((1L << 30).toDouble)
    }
    // Box–Muller standard normal from two hash-uniforms
    def gauss(tag: String, cols: org.apache.spark.sql.Column*) =
      sqrt(lit(-2.0) * log(u(tag + "_a", cols: _*))) *
        cos(lit(2.0 * math.Pi) * u(tag + "_b", cols: _*))

    val c = spark.range(0, nClusters).toDF("cid")
      .withColumn("csize",
        (pmod(xxhash64(lit("size"), col("cid")), lit(maxSize - 1)) + 2)
          .cast("int"))
    val members = c
      .withColumn("m", explode(sequence(lit(0), col("csize") - 1)))
      .withColumn("vec_id",
        col("cid") * (maxSize + 1) + col("m"))
    // base direction + 0.05-L2 member noise, normalized; one array expr
    val j = sequence(lit(0), lit(dim - 1))
    // base ~ N(0,1)^dim has L2 ~ sqrt(dim); per-dim noise sd 0.05 gives
    // noise L2 ~ 0.05*sqrt(dim) = 5% of the base direction, so
    // member<->member cosine ~ 1 - 0.05^2 = 0.9975
    val noiseSd = 0.05
    val raw = transform(j, jj =>
      gauss("base", col("cid"), jj) +
        lit(noiseSd) * gauss("noise", col("vec_id"), jj))
    val withVec = members
      .withColumn("rawv", raw)
      .withColumn("nrm", sqrt(aggregate(col("rawv"), lit(0.0),
        (acc, x) => acc + x * x)))
      .withColumn("embedding",
        transform(col("rawv"), x => (x / col("nrm")).cast("float")))
      .filter(col("vec_id").isNotNull)
    // exact nVectors rows: keep whole clusters in cid order until the
    // size budget is spent, then truncate the boundary cluster. The cut
    // is computed DRIVER-side from the O(nClusters) size column — a
    // running-sum window over the member stream would single-task it.
    val sizes = c.select(col("cid"), col("csize")).orderBy("cid")
      .collect() // nClusters ~ n/51 rows: bounded, driver-side prefix sum
    var acc = 0L; var cutCid = -1L; var lastKeep = 0L
    sizes.foreach { r =>
      if (acc < nVectors) {
        cutCid = r.getLong(0)
        lastKeep = math.min(r.getInt(1).toLong, nVectors - acc)
        acc += r.getInt(1)
      }
    }
    val fin = withVec.filter(col("cid") < cutCid ||
      (col("cid") === cutCid && col("m") < lastKeep))
      .select(col("vec_id"), col("embedding"))
    fin.write.mode("overwrite").parquet(s"$dest/embeddings.parquet")
    val n = spark.read.parquet(s"$dest/embeddings.parquet").count()
    println(s"[genclusters] wrote $dest n=$n clusters<=$cutCid maxSize=$maxSize dim=$dim")
    spark.stop()
  }
}
