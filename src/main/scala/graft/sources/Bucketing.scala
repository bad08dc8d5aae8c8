package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    * broadcast exchange node anywhere in the tree — the proof that a
    * bucketed join is actually co-located. Typed node walk (a string
    * scan would false-flag a plan whose filter LITERAL contains
    * "Exchange"); the AQE wrapper is a leaf to collect(), so its
    * pre-adaptive input plan is traversed explicitly — exchanges AQE
    * could later touch all exist there already, and AQE never adds
    * one the input plan lacks. */
  def exchangeFree(df: DataFrame): Boolean = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.Exchange
    // the AQE wrapper is a leaf whose CURRENT plan (initial before any
    // execution, final after) carries the inserted exchanges; its
    // inputPlan predates EnsureRequirements and would show none
    def hasExchange(p: SparkPlan): Boolean =
      p.collectFirst { case e: Exchange => e }.isDefined ||
        p.collect { case a: AdaptiveSparkPlanExec => a.executedPlan }
          .exists(hasExchange)
    !hasExchange(df.queryExecution.executedPlan)
  }

  /** Run `f` with auto-broadcast disabled, restoring the previous
    * threshold afterwards — the measurement harness for
    * [[exchangeFree]]: without it a small dimension side turns the
    * join into a BroadcastExchange and the co-location claim is
    * untestable. */
  def withoutBroadcast[A](spark: SparkSession)(f: => A): A = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try f finally spark.conf.set(key, prev)
  }
}
