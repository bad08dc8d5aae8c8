package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-group detection with an 8-byte shuffle key (reference:
  * truthound `validators/uniqueness/duplicate.py` DuplicateValidator —
  * group-and-count over the key columns).
  *
  * A direct `groupBy(keyCols)` shuffles the full key tuple per distinct
  * key — for whole-row or wide-string keys that is the row itself. Here
  * the shuffle key is a single `xxhash64(keyCols)`: phase 1 aggregates
  * counts per 64-bit hash (the exchange carries only (hash, partial
  * count) regardless of key width), phase 2 re-reads ONLY the rows
  * whose hash landed in a >1 bucket — the duplicate candidates, a
  * vanishing fraction of a healthy table — and re-groups them on the
  * REAL key columns, so two distinct keys sharing a hash can never
  * merge a group or inflate a count. The candidate set is tiny, so AQE
  * turns phase 2's semi join into a broadcast probe and the exact
  * re-group shuffles almost nothing.
  *
  * WHEN TO USE (measured, BASELINE.md round-7 note): the hashed path
  * trades ONE wide shuffle for TWO scans plus a narrow shuffle. On
  * local[32] — where "shuffle" is memory-speed and scans dominate — the
  * direct groupBy wins even for whole-row text keys (sf10 documents:
  * direct 2.4 s vs hashed 4.0 s; sf10 q03's (int,int) key: direct
  * 6.4-7.8 s vs hashed 12.4 s), so the shipped q03 stays direct. The
  * hashed path is for the cluster regime the numbers can't show
  * locally: key bytes ≫ 16/row and exchanges crossing a real network,
  * where shuffling 100 TB of text to count duplicates is the bottleneck
  * and two columnar scans are cheap. That is exactly LLM-corpus
  * whole-row dedup — and for content-only keys, prefer the
  * fingerprint-projection in `pipeline.Dedup.exactDupGroups` (one scan,
  * one narrow shuffle, approximate only under md5 collision).
  */
object DupGroups {

  /** One row: (dup_groups, excess_rows) over `cols` as the key. */
  def stats(df: DataFrame, cols: Seq[String]): DataFrame =
    exactGroups(df, cols)
      .agg(count(lit(1)).as("dup_groups"),
        coalesce(sum(col("__dup_c") - 1), lit(0L)).cast("long")
          .as("excess_rows"))

  /** [[stats]] with the shuffle cut into `slices` hash-disjoint passes
    * that run ONE AT A TIME: pass s aggregates only rows whose key
    * hashes into slice s (every row of a group lands in the same slice,
    * so per-group counts are complete within their pass and the two
    * totals are sums across passes — byte-identical to the one-pass
    * answer), and each pass's one-row aggregate is localCheckpoint'd so
    * its exchange is released before the next pass writes.
    *
    * This bounds PEAK shuffle-store footprint at 1/slices of the
    * one-pass groupBy in exchange for `slices` scans — the same
    * live-footprint-vs-rescans trade as `Dedup.embedDupLabels`'
    * band-serial mode, for the regime where the duplicate census itself
    * overflows scratch (the sf1000 decade probe: 1.5B-row orders,
    * ~20+ GB of shuffle+sort spill against 24 GB free — BASELINE.md).
    * On a healthy cluster the aggregate shuffle store makes slices=1
    * the right default; this is the knob for scratch-constrained
    * nodes and for bounding worst-case disk at any cluster size. */
  def statsSliced(df: DataFrame, cols: Seq[String], slices: Int): DataFrame = {
    require(slices >= 1, s"slices must be >= 1: $slices")
    if (slices == 1) stats(df, cols)
    else {
      val h = xxhash64(cols.map(col): _*)
      // disk-pressure estimate for the auto gcNudge mode: the census'
      // shuffle scales with the scanned input, so a multi-GiB source is
      // the regime where reaping each pass's shuffle files matters; a
      // small forced-slices run (correctness pin, unit test) stays
      // GC-free. Plan stats come from file sizes — no job is run.
      val pressure = df.queryExecution.optimizedPlan.stats.sizeInBytes >
        BigInt(8L << 30)
      val per = (0 until slices).map { s =>
        val r = df.filter(pmod(h, lit(slices.toLong)) === s)
          .groupBy(cols.map(col): _*).agg(count(lit(1)).as("__dup_c"))
          .filter(col("__dup_c") > 1)
          .agg(count(lit(1)).as("dup_groups"),
            coalesce(sum(col("__dup_c") - 1), lit(0L)).cast("long")
              .as("excess_rows"))
          .localCheckpoint()
        // conf-gated (spark.graft.gcNudge): reap the pass's shuffle files
        graft.ops.Exprs.gcNudge(df.sparkSession, pressure)
        r
      }
      per.reduce(_ unionAll _)
        .agg(sum(col("dup_groups")).cast("long").as("dup_groups"),
          sum(col("excess_rows")).cast("long").as("excess_rows"))
    }
  }

  /** The duplicate groups themselves: key columns + `__dup_c` (> 1),
    * exact (hash-collision-proof). */
  def exactGroups(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(!cols.contains("__dup_c"),
      "__dup_c is reserved for the group-count output column")
    require(!cols.contains("__h"),
      "__h is reserved for the internal hash key; alias the column first")
    val h = xxhash64(cols.map(col): _*)
    val candidates = df
      .groupBy(h.as("__h")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") > 1)
      .select("__h")
    // candidates("__h") qualifies the probe side, so an input frame that
    // happens to carry its own __h column stays joinable
    df.join(candidates, h === candidates("__h"), "left_semi")
      .groupBy(cols.map(col): _*).agg(count(lit(1)).as("__dup_c"))
      .filter(col("__dup_c") > 1)
  }
}
