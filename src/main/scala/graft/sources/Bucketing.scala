package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed-table persistence for repeated co-located validation.
  *
  * The scale story: referential checks (FK / orphan / cross-table
  * compare) re-run daily against the same fact and dimension tables,
  * and at 100 TB the dominant cost of every run is the shuffle that
  * co-locates join keys. Persisting both sides bucketed by the join
  * key makes every subsequent validation join plan with ZERO exchange
  * on either side — the shuffle is paid once at write time and
  * amortized across every future run. With `sortCols` the sort-merge
  * join's per-partition sorts disappear too (buckets are written
  * pre-ordered). Standard public Spark contract:
  * `DataFrameWriter.bucketBy`/`sortBy` + catalog tables; both sides
  * must share the bucket count and key for the exchange-free plan.
  *
  * Beyond the reference surface (truthound validates the frames it is
  * handed and has no persistence-layout layer, `datasources/base.py`)
  * — included because at warehouse scale the join layout, not the
  * validator arithmetic, decides the wall clock. */
object Bucketing {

  /** Persist `df` as a bucketed managed parquet table (overwrite).
    * `sortCols` additionally orders rows within each bucket file so a
    * downstream sort-merge join skips its sort stage. */
  def writeBucketed(df: DataFrame, name: String, keys: Seq[String],
      buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "bucket keys required")
    require(buckets > 0, "bucket count must be positive")
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
     else w).saveAsTable(name)
  }

  /** True when the physical plan moves no data: no shuffle AND no
    * broadcast exchange anywhere in the tree — the proof that a
    * bucketed join is actually co-located (string-level scan so the
    * check sees through the AQE wrapper, whose `children` hides the
    * live plan from collect()). */
  def exchangeFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange")
}
