package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared distinct-count size gate for the exact-percentile validator
  * family (reference semantics: truthound's exact quantile validators,
  * `validators/distribution/outlier.py` / `aggregate/central.py`).
  *
  * Spark's exact `percentile` aggregate buffers an (value -> count) map
  * whose size is O(distinct values) — at 10^8+ distinct values the merge
  * buffers become multi-GiB single allocations (observed as
  * `GCLocker ... allocating 536870914 words` retries at sf100). The same
  * probe-then-route pattern [[graft.profiler.Learn.learn]] uses for its
  * stats pass applies here: one cheap fused `approx_count_distinct`
  * (rsd 0.05 — the gate needs an order of magnitude, not a count) decides
  * per column whether the exact form is affordable; over-budget columns
  * route to the t-digest `percentile_approx`, and the switch is recorded
  * in any emitted issue's `actual` field so approximate results are
  * never silent.
  *
  * At test scale factors the gate never trips (the default budget is
  * 2^23 ≈ 8.4M distinct — orders at sf0.1 holds ~150k), so DuckDB
  * oracle rows stay exact-green; the approx route only engages in the
  * regime where exact was already an allocation hazard.
  */
object SizeGate {

  /** Distinct-value budget above which exact percentile is deemed unsafe.
    * Matches [[graft.profiler.Learn.learn]]'s `maxExactDistinct` default.
    * `<= 0` disables the gate (always exact — the pre-gate behavior). */
  val DefaultMaxExactDistinct: Long = 1L << 23

  def probeKey(column: String): MetricKey = MetricKey("distinct_probe", column)

  /** The fused probe aggregate: coarse HLL estimate of the column's
    * distinct count. Deduped by key across validators probing the same
    * column, so a suite pays each column's probe once. */
  def probeExpr(column: String): (MetricKey, Column) =
    probeKey(column) -> approx_count_distinct(col(column), 0.05)

  /** True when the exact form is affordable: the gate is disabled, the
    * probe is absent (early-termination sample pass / observed mode —
    * both bounded inputs), or the estimate fits the budget. */
  def exactOk(m: Metrics, column: String, budget: Long): Boolean =
    budget <= 0 || m.double(probeKey(column)).forall(_ <= budget)

  /** Issue-metadata note for a tripped gate, appended to `actual` so a
    * reader of the issue knows the quantile underneath is approximate. */
  def note(m: Metrics, column: String, budget: Long, exactRequested: Boolean)
      : String =
    if (exactRequested && !exactOk(m, column, budget))
      s" [approx quantile: ~${m.long(probeKey(column))} distinct > budget $budget]"
    else ""
}
