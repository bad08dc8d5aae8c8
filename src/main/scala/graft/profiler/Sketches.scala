package graft.profiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Probabilistic sketches (reference: truthound `profiler/sketches/` —
  * hand-rolled HyperLogLog `hyperloglog.py:25-211`, CountMin
  * `countmin.py`, Bloom `bloom.py`, plus `uniqueness/approximate.py`).
  *
  * Spark ships all three natively as mergeable aggregates, so the rebuild
  * wraps built-ins instead of porting buffer math:
  *   - HLL++        -> approx_count_distinct / hll_sketch_agg (mergeable
  *                     across runs via hll_union_agg)
  *   - CountMin     -> count_min_sketch(col, eps, confidence, seed)
  *   - Bloom filter -> bloom_filter_agg / might_contain
  * All are partial-aggregate friendly: each partition builds a sketch,
  * the merge is sketch-union — exactly the 100 TB shape. */
object Sketches {
  /** HLL++ distinct estimate with relative standard deviation `rsd`. */
  def approxDistinct(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Persistable HLL sketch (binary) — union-able across runs/partitions,
    * for cross-run cardinality baselines. */
  def hllSketch(c: Column, lgConfigK: Int = 12): Column =
    hll_sketch_agg(c, lit(lgConfigK))
  def hllUnion(sketchCol: Column): Column = hll_union_agg(sketchCol)
  def hllEstimate(sketchCol: Column): Column = hll_sketch_estimate(sketchCol)

  /** CountMin sketch binary for heavy-hitter / frequency estimation. */
  def countMin(c: Column, eps: Double = 0.001, confidence: Double = 0.99,
               seed: Int = 42): Column =
    count_min_sketch(c, lit(eps), lit(confidence), lit(seed))

  /** Bloom filter over a key column via the public
    * DataFrameStatFunctions.bloomFilter (distributed build, driver merge). */
  def bloom(df: DataFrame, keyCol: String, expectedItems: Long = 1000000L,
            fpp: Double = 0.03): org.apache.spark.util.sketch.BloomFilter =
    df.stat.bloomFilter(keyCol, expectedItems, fpp)

  /** Approximate membership join filter: probe rows of `df` against a bloom
    * filter built from `keys` — the scalable pre-filter for FK checks when
    * the parent is too big to broadcast exactly. No false negatives, so
    * orphan detection stays sound (survivors still need the exact join).
    * r16: the probe is the native broadcast-backed
    * [[graft.functions.BloomMightContainLong]] expression (whole-stage
    * codegen, zero boxing) — it calls the same `mightContainLong`, with
    * `coalesce(..., false)` restating the former UDF's null→false rule. */
  def bloomPreFilter(df: DataFrame, probeCol: String,
                     keys: DataFrame, keyCol: String,
                     expectedItems: Long = 1000000L): DataFrame = {
    val bf = bloom(keys, keyCol, expectedItems)
    val bfB = df.sparkSession.sparkContext.broadcast(bf)
    df.filter(coalesce(graft.functions.BloomMightContainLong(
      col(probeCol).cast("long"), bfB), lit(false)))
  }

  /** Orphan count via the bloom path, CORRECTLY: rows the bloom
    * definitively rejects are guaranteed orphans (no false negatives on
    * membership means no false POSITIVES on orphan-hood for rejects);
    * only the might-contain survivors need the exact anti-join. Total =
    * definite rejects + anti-join orphans among survivors.
    *
    * `expectedItems <= 0` (the default) sizes the bloom from the
    * parent's actual row count — an UNDERSIZED bloom saturates, passes
    * every probe, and silently degenerates this into a full anti-join
    * plus a wasted scan (the sf10 ladder caught exactly that with a
    * fixed 100k sizing against a 15M-key parent; the answer stays
    * correct either way, only the scalability claim dies). The count is
    * one cheap column-pruned job next to the bitmap build it sizes. */
  def orphanCount(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  expectedItems: Long = 0L): Long = {
    val items = if (expectedItems > 0) expectedItems
      else math.max(parent.count(), 1L)
    val bf = bloom(parent, parentKey, items)
    val bfB = child.sparkSession.sparkContext.broadcast(bf)
    // r16: native codegen probe (see bloomPreFilter) — value-identical
    // to the former UDF incl. its null→false rule (coalesce), minus the
    // per-row boxing on the operator's full-child-scan passes.
    val mightContain = (c: Column) => coalesce(
      graft.functions.BloomMightContainLong(c, bfB), lit(false))
    val keyed = child.filter(col(childKey).isNotNull)
    val survivors = keyed.filter(mightContain(col(childKey).cast("long")))
    // Exact residual check over the bloom survivors: a PLAIN anti-join —
    // no forced broadcast of the parent. The bloom path exists precisely
    // because the parent may be too big to broadcast; forcing it here
    // would re-create the driver OOM the sketch was meant to avoid. AQE
    // still converts to broadcast at runtime when the parent turns out
    // small. The bloom has already cut the probe side to ~fpp of rows.
    // r15: the definite-reject count and the residual anti-join are
    // independent child passes — submit them concurrently (guide §2.6).
    val Seq(definiteOrphans, residual) = graft.core.Par.map(Seq[() => Long](
      () => keyed.filter(!mightContain(col(childKey).cast("long"))).count(),
      () => survivors.join(
        parent.select(col(parentKey)).distinct(),
        survivors(childKey) === col(parentKey), "left_anti").count()))(
      _.apply())
    definiteOrphans + residual
  }
}
