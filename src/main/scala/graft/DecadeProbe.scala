package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: per-decade scale probes for the heaviest operators, on the
  * tables a partial scale fixture actually carries.
  *
  *   runMain graft.DecadeProbe <sfDir> <op> [more ops...]
  *
  * Ops (each prints one `[probe] <op> <seconds>` line, min over
  * SPARK_GRAFT_PROBE_RUNS timed runs, default 1 — the sf1000 rows are
  * too expensive for QTime's min-of-2-plus-warm-up protocol):
  *
  *   - `dupgroups` — q03's two-col groupBy-count>1 shuffle shape on
  *     orders (o_custkey, o_orderdate); lineitem does not fit the
  *     sandbox disk at sf1000 (~110 GB), so the decade ratio is taken
  *     on the same operator over the 1.5B-row orders table instead.
  *   - `bloomfk` — q97's bloom-guarded orphan count, substituted as
  *     orders.o_custkey -> customer.c_custkey (worst-case regime: all
  *     children pass the bloom, exact anti-join runs on everything —
  *     the same regime q97's lineitem->orders check exercises).
  *   - `bucketfk` — q157's pay-once bucketed layout + exchange-free
  *     anti-join, substituted as fact=orders(o_custkey) vs
  *     dim=customer(c_custkey % 97 =!= 0), 8 buckets, broadcast off.
  *   - `learn` / `embdedup` — q60 / q168 run verbatim via SparkEntry
  *     (their tables ship in the partial fixture).
  */
object DecadeProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DecadeProbe <sfDir> <op...>")
    val sfDir = args(0)
    val ops = args.drop(1)
    val runs = sys.env.getOrElse("SPARK_GRAFT_PROBE_RUNS", "1").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.ops.Exprs.sizedDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory",
        sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")),
      sfDir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.ops.Exprs.quietNoisyLoggers()
    import graft.ops.Exprs.table

    def probe(name: String)(body: => Unit): Unit = {
      val times = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-12s ${times.min}%10.3f s  (runs=$runs)")
    }

    ops.foreach {
      case "dupgroups" => probe("dupgroups") {
        table(spark, sfDir, "orders")
          .groupBy(col("o_custkey"), col("o_orderdate"))
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(count(lit(1)).as("dup_groups"),
            coalesce(sum(col("c") - 1), lit(0L)).cast("long")
              .as("excess_rows"))
          .collect()
      }
      case "dupgroups_sliced" => probe("dupgroups_sliced") {
        // the scratch-bounded serial-pass form (SPARK_GRAFT_SLICES,
        // default 4): peak shuffle 1/slices of the one-pass census —
        // the path that survives the sf1000 rung's 24 GB scratch
        graft.ops.DupGroups.statsSliced(
          table(spark, sfDir, "orders"), Seq("o_custkey", "o_orderdate"),
          sys.env.getOrElse("SPARK_GRAFT_SLICES", "4").toInt)
          .collect()
      }
      case "dupgroups_hashed" => probe("dupgroups_hashed") {
        // q03's shape via the 8-byte-shuffle path (ops/DupGroups): the
        // exchange carries (hash, partial count) instead of the key
        // tuple — the regime argument is in DupGroups' doc comment
        graft.ops.DupGroups.stats(
          table(spark, sfDir, "orders"), Seq("o_custkey", "o_orderdate"))
          .collect()
      }
      case "docdup" => probe("docdup_direct") {
        // q149's wide-key regime: whole-text duplicate groups over
        // documents, direct groupBy (shuffles the text itself)...
        table(spark, sfDir, "documents").groupBy(col("text"))
          .agg(count(lit(1)).as("c")).filter(col("c") > 1)
          .agg(count(lit(1)).as("dup_groups")).collect()
      }
      case "docdup_hashed" => probe("docdup_hashed") {
        // ...vs the hashed path (shuffles 16 bytes/row regardless of
        // text width)
        graft.ops.DupGroups.stats(
          table(spark, sfDir, "documents"), Seq("text")).collect()
      }
      case "incrembed" => probe("incrembed") {
        // dedupIncrementEmbedding ladder rung (BASELINE.md): corpus =
        // the full embeddings table as the standing index; batch =
        // 0.5% exact copies of corpus rows (direct index hits — every
        // one must drop) + 0.5% negated copies (negation flips the
        // cosine sign so nothing matches the index, but the in-batch
        // dup structure mirrors the corpus slice's own near-dup
        // clusters). kept is printed for cross-scale sanity — it
        // tracks the CLUSTER count of the negated slice, not the
        // batch size, so it stays near-constant per decade while the
        // corpus-side cost is what the rung measures.
        val emb = table(spark, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val n = emb.agg(max(col("vec_id"))).head().getLong(0) + 1
        val slice = math.max(1L, n / 200)
        val copies = emb.filter(col("vec_id") < slice)
          .select((col("vec_id") + 1000000000L).as("vec_id"),
            col("embedding"))
        val negated = emb
          .filter(col("vec_id") >= slice && col("vec_id") < 2 * slice)
          .select((col("vec_id") + 2000000000L).as("vec_id"),
            expr("transform(embedding, x -> -x)").as("embedding"))
        val batch = copies.unionByName(negated)
        val kept = graft.pipeline.Dedup.dedupIncrementEmbedding(
          emb, batch, "vec_id", "embedding", threshold = 0.99, dim = 64)
          .count()
        println(s"[probe]   incrembed corpus=$n batch=${2 * slice} " +
          s"kept=$kept")
      }
      case "semdedup" => probe("semdedup") {
        // semanticDedup ladder rung: cell count tracks ~500-row cells
        // (SemDeDup's regime) at every scale. Up to 2048 cells the FLAT
        // quantizer serves — its ceiling is per-row assignment flops
        // (nlist × dim per vector) plus the driver Lloyd fit, not
        // expression-tree size (the NearestCell kernel attaches the
        // centroid matrix as one codegen reference object). Past 2048
        // the rung switches to the TWO-LEVEL form
        // (semanticDedupTwoLevel): coarse × sub ≈ n/500 effective
        // cells at (coarse + sub) × dim flops per row, which is what
        // keeps |cell| ~constant as n grows instead of letting the
        // within-cell Σ|cell|² join go quadratic.
        val emb = table(spark, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val n = emb.count()
        val target = math.max(16L, n / 500)
        val kept =
          if (target <= 2048)
            graft.pipeline.Dedup.semanticDedup(emb, "vec_id",
              "embedding", threshold = 0.99, nlist = target.toInt).count()
          else {
            val coarse = math.min(2048L,
              math.ceil(math.sqrt(target.toDouble)).toLong).toInt
            val sub = math.ceil(target.toDouble / coarse).toInt
            graft.pipeline.Dedup.semanticDedupTwoLevel(emb, "vec_id",
              "embedding", threshold = 0.99, coarseNlist = coarse,
              subPerCell = sub).count()
          }
        println(s"[probe]   semdedup n=$n target=$target kept=$kept")
      }
      case "semdedup2l" => probe("semdedup2l") {
        // semanticDedupTwoLevel END-TO-END, forced at any corpus size
        // (the auto rung above picks flat below 2048 cells, which
        // would compare two different code paths across a decade).
        // Run on the GenClusters moderate-density fixtures
        // (testdata-scale/modden*) to measure the operator's OWN
        // full-pass scaling — cluster sizes 2..100, so the within-cell
        // join term is bounded by 100·n instead of the replica-stacked
        // fixtures' quadratic duplicate mass.
        val emb = table(spark, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val n = emb.count()
        val target = math.max(16L, n / 500)
        val coarse = math.min(2048L,
          math.ceil(math.sqrt(target.toDouble)).toLong).toInt
        val sub = math.ceil(target.toDouble / coarse).toInt
        val kept = graft.pipeline.Dedup.semanticDedupTwoLevel(emb,
          "vec_id", "embedding", threshold = 0.99,
          coarseNlist = coarse, subPerCell = sub).count()
        println(s"[probe]   semdedup2l n=$n target=$target " +
          s"coarse=$coarse sub=$sub kept=$kept")
      }
      case "semassign" => probe("semassign") {
        // Quantizer-side HALF of the semdedup rung, isolated: fit +
        // full-corpus cell assignment + cell-size census, WITHOUT the
        // within-cell join. The replica-scaled fixtures plant 100-
        // (sf100) / 1000-deep (sf1000) near-identical replica stacks,
        // so the join term there measures the fixture's duplicate MASS
        // (irreducible for any cell partitioner — same hot-bucket
        // regime the banded q168 path hits; see BASELINE.md r13
        // notes), while the quantizer claims — assignment stays
        // scan-speed, cell count tracks target, fit stays bounded —
        // are exactly what this probe measures per decade.
        val emb = table(spark, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding"))
        val n = emb.count()
        val target = math.max(16L, n / 500)
        val cellCol =
          if (target <= 2048) {
            val c = graft.pipeline.Ivf.fitCentroids(emb, "embedding",
              target.toInt)
            graft.pipeline.Ivf.cellOfCosine(col("embedding"), c)
          } else {
            val coarseK = math.min(2048L,
              math.ceil(math.sqrt(target.toDouble)).toLong).toInt
            val subK = math.ceil(target.toDouble / coarseK).toInt
            val c = graft.pipeline.Ivf.fitCentroids(emb, "embedding",
              coarseK)
            val s = graft.pipeline.Ivf.fitSubCentroids(emb, "embedding",
              c, subK)
            graft.pipeline.Ivf.cellOfCosineTwoLevel(col("embedding"), c, s)
          }
        val stats = emb.select(cellCol.as("cell"))
          .groupBy(col("cell")).agg(count(lit(1)).as("m"))
          .agg(count(lit(1)).as("cells"), max(col("m")).as("maxm"),
            avg(col("m")).as("avgm"),
            expr("percentile_approx(m, 0.99)").as("p99m"))
          .head()
        println(s"[probe]   semassign n=$n target=$target " +
          s"cells=${stats.getLong(0)} max=${stats.getLong(1)} " +
          f"avg=${stats.getDouble(2)}%.1f p99=${stats.getLong(3)}")
      }
      case "bloomfk" => probe("bloomfk") {
        val n = graft.profiler.Sketches.orphanCount(
          table(spark, sfDir, "orders"), "o_custkey",
          table(spark, sfDir, "customer"), "c_custkey")
        println(s"[probe]   bloomfk orphans=$n")
      }
      case "bucketfk" => probe("bucketfk") {
        val fact = table(spark, sfDir, "orders").select(col("o_custkey"))
        val dim = table(spark, sfDir, "customer").select(col("c_custkey"))
          .filter(col("c_custkey") % 97 =!= 0)
        graft.sources.Bucketing.writeBucketed(fact, "probe_fact",
          Seq("o_custkey"), 8, Seq("o_custkey"))
        graft.sources.Bucketing.writeBucketed(dim, "probe_dim",
          Seq("c_custkey"), 8, Seq("c_custkey"))
        val f = spark.table("probe_fact"); val d = spark.table("probe_dim")
        val orphans = graft.sources.Bucketing.withoutBroadcast(spark) {
          f.join(d, f("o_custkey") === d("c_custkey"), "left_anti").count()
        }
        println(s"[probe]   bucketfk orphans=$orphans")
      }
      case q =>
        SparkEntry.queries.filter(_._1.startsWith(q)).toSeq.sortBy(_._1)
          .foreach { case (name, fn) =>
            probe(name) { fn(spark, sfDir).count(); () }
          }
    }
    spark.stop()
  }
}
