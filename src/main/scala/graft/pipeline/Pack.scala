package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing planner: the concat-and-chunk layout every GPT-style
  * pretraining pipeline runs before writing training shards — documents
  * are laid out in one deterministic global order, their token streams
  * concatenated, and the stream cut into fixed-length sequences of
  * `seqLen` tokens. The plan assigns every document its global token
  * offset and the first/last sequence it lands in, which is all a shard
  * writer needs to materialize batches (and all an auditor needs to
  * account for boundary-crossing documents).
  *
  * Reference scope: truthound has no packing operator — this is part of
  * the beyond-reference training-pipeline surface (like sampleQuota /
  * sampleTokenBudget, which specify the corpus this operator then lays
  * out).
  *
  * Scale shape — the global prefix-sum is the textbook two-phase scan,
  * expressed declaratively:
  *
  *   1. every doc gets a deterministic sort key `md5(id)` (layout- and
  *      run-independent, SQL-restatable) and a bucket = the key's first
  *      `bucketHexChars` hex chars — a PREFIX of the key, so bucket
  *      order is consistent with key order and (bucket, key, id) is the
  *      same total order as (key, id);
  *   2. per-bucket token totals (one partial-aggregatable groupBy over
  *      ≤ 16^bucketHexChars rows) come back to the driver, where the
  *      running bucket offsets are a trivial prefix sum over at most
  *      65k values — broadcast back as a tiny join side;
  *   3. the within-bucket cumulative sum is a window PARTITIONED BY
  *      bucket — never a global single-partition window (the
  *      "No Partition Defined" plan shape that dies first at scale).
  *
  * One full shuffle (hash by bucket for the window), one tiny aggregate.
  * The default 4 hex chars = 65,536 buckets keeps per-bucket window
  * sorts ~1.5 GB at a 100 TB corpus; the id+count projection is scanned
  * twice (bucket totals, then the window pass) — two pushed-down
  * two-column scans beat caching the corpus.
  *
  * Determinism: everything derives from data values (no
  * spark_partition_id, no RNG), so the same corpus packs identically on
  * every run, cluster layout, and partition count — and a DuckDB oracle
  * can restate the layout exactly (global window over the same
  * (md5, id) order).
  */
object Pack {

  /** Per-document placement: (idCol, n_tokens, offset, seq_first,
    * seq_last, spans_boundary). `offset` is the document's 0-based
    * position in the concatenated token stream; zero-token documents
    * occupy no tokens and report seq_last = seq_first. */
  def packPlan(df: DataFrame, idCol: String, tokens: Column, seqLen: Int,
               bucketHexChars: Int = 4): DataFrame =
    packPlanWithTotal(df, idCol, tokens, seqLen, bucketHexChars)._1

  /** [[packPlan]] plus the corpus token total, which phase 1's bucket
    * aggregate already computes (the running offset after the last
    * bucket IS sum(n_tokens)) — callers that size shards or sequences
    * from the total read it here instead of paying one more full
    * corpus scan for a separate sum aggregate. */
  def packPlanWithTotal(df: DataFrame, idCol: String, tokens: Column,
      seqLen: Int, bucketHexChars: Int = 4): (DataFrame, Long) = {
    require(seqLen > 0, "seqLen must be positive")
    require(bucketHexChars >= 1 && bucketHexChars <= 8,
      "bucketHexChars must be in [1, 8]")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df.select(col(idCol),
      coalesce(tokens.cast("long"), lit(0L)).as("n_tokens"),
      md5(col(idCol).cast("string")).as("__k"))
      .withColumn("__b", substring(col("__k"), 1, bucketHexChars))
    // Phase 1: bucket totals — partial-aggregated, ≤ 16^bucketHexChars
    // rows to the driver (bounded by construction, not by data size).
    val totals = keyed.groupBy("__b").agg(sum("n_tokens").as("__t"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val bucketOffsets = totals.map { case (b, t) =>
      val o = acc; acc += t; (b, o)
    }.toSeq
    val offDf = bucketOffsets.toDF("__b", "__boff")
    // Phase 2: within-bucket cumsum + broadcast bucket base offsets.
    val w = Window.partitionBy(col("__b")).orderBy(col("__k"), col(idCol))
    val plan = keyed.join(broadcast(offDf), Seq("__b"))
      .withColumn("__cum", sum(col("n_tokens")).over(w))
      .withColumn("offset", col("__boff") + col("__cum") - col("n_tokens"))
      .withColumn("seq_first", expr(s"offset div ${seqLen}L"))
      .withColumn("seq_last",
        expr(s"(offset + greatest(n_tokens, 1L) - 1L) div ${seqLen}L"))
      .withColumn("spans_boundary", col("seq_last") > col("seq_first"))
      .drop("__k", "__b", "__boff", "__cum")
    (plan, acc)
  }

  /** Shard assignment over a pack plan: shard = seq_first div
    * `seqsPerShard` — every document belongs to the shard that owns its
    * FIRST training sequence; the reader of shard s consumes the
    * spillover tail of the last boundary-crossing document of shard s-1
    * (the standard concat-and-chunk layout). Pure arithmetic on the
    * plan, no extra scan. */
  def shardAssign(plan: DataFrame, seqsPerShard: Long): DataFrame = {
    require(seqsPerShard > 0, "seqsPerShard must be positive")
    plan.withColumn("shard", expr(s"seq_first div ${seqsPerShard}L"))
  }

  /** Materialize a pack plan as on-disk training shards: one parquet
    * file per shard under `path`/shard=N, rows pre-sorted in pack order
    * ((md5(id), id) — the identical total order packPlan laid out).
    * `repartition(col("shard"))` clusters every shard into exactly one
    * task, so `partitionBy("shard")` emits exactly one file per shard;
    * with more shards than shuffle partitions a task just writes several
    * shard files sequentially — shard size, not shard count, is what
    * must fit a task. Returns the shard count. */
  def writeShards(plan: DataFrame, idCol: String, seqsPerShard: Long,
                  path: String): Long = {
    val sharded = shardAssign(plan, seqsPerShard)
    sharded
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"),
        md5(col(idCol).cast("string")), col(idCol))
      // r16: STATIC overwrite pinned per-write (ADVICE r15) — the
      // directory-listing shard count below is exact only if overwrite
      // clears stale shard= dirs from a prior write to the same path;
      // a session running in dynamic partition-overwrite mode would
      // keep them and inflate the count.
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "static")
      .partitionBy("shard").parquet(path)
    // Shard count = the number of shard=N partition directories the
    // write just created (partitionBy emits exactly one per distinct
    // shard value) — a driver-side listing of a bounded directory,
    // replacing the count_distinct aggregate that re-ran the whole
    // pack-plan window pass a second time (r15: one full corpus pass
    // saved per shard write).
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(
      plan.sparkSession.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .count(s => s.isDirectory && s.getPath.getName.startsWith("shard="))
      .toLong
  }

  /** One-aggregate accounting of a pack plan: document/token totals, the
    * sequence count `ceil(total_tokens / seqLen)`, boundary-crossing
    * docs, and the padding wasted in the final partial sequence. */
  def packStats(plan: DataFrame, seqLen: Int): DataFrame =
    plan.agg(
      count(lit(1)).as("docs"),
      sum(col("n_tokens")).as("total_tokens"),
      expr(s"(sum(n_tokens) + ${seqLen - 1}L) div ${seqLen}L")
        .as("n_sequences"),
      sum(when(col("spans_boundary"), 1L).otherwise(0L))
        .as("boundary_docs"),
      expr(s"(${seqLen}L - pmod(sum(n_tokens), ${seqLen}L)) % ${seqLen}L")
        .as("tail_padding"))
}
