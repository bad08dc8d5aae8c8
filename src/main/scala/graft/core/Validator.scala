package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.StructType

/** Typed read access to metric results keyed by [[MetricKey]]. Values come
  * from a single collected Spark `Row`, so they may be boxed Long/Int/Double/
  * Decimal/String/null. */
final class Metrics(private val m: Map[MetricKey, Any]) {
  def get(k: MetricKey): Option[Any] = m.get(k).filter(_ != null)
  def long(k: MetricKey): Long = get(k) match {
    case Some(n: Number) => n.longValue()
    case _               => 0L
  }
  def double(k: MetricKey): Option[Double] = get(k) match {
    case Some(n: Number)               => Some(n.doubleValue())
    case Some(d: java.math.BigDecimal) => Some(d.doubleValue())
    case _                             => None
  }
  def string(k: MetricKey): Option[String] = get(k).map(_.toString)
  def contains(k: MetricKey): Boolean = m.get(k).exists(_ != null)
  def size: Int = m.size
  def asMap: Map[MetricKey, Any] = m
  def ++(other: Metrics): Metrics = new Metrics(m ++ other.m)
}
object Metrics { val empty = new Metrics(Map.empty) }

/** A data-quality check compiled to Spark aggregate `Column`s.
  *
  * The contract mirrors the reference's expression-based fast path
  * (truthound `validators/base.py:1770-1895` ValidationExpressionSpec /
  * ExpressionValidatorProtocol) but here it is the ONLY path: the suite
  * runner fuses every validator's `metricExprs` into one
  * `df.select(aggs)` — a single scan with partial+final aggregation and
  * whole-stage codegen, which is the shape that survives 100 TB inputs.
  *
  * Two-pass validators (outliers, z-scores: need mean/stddev/quantiles
  * before they can count violations) declare `statsExprs`; the runner
  * fuses ALL validators' stats into scan 1 and ALL metrics into scan 2,
  * so a suite costs at most 2 scans regardless of validator count.
  */
trait Validator {
  def name: String
  def category: String

  /** Probe aggregates (scan 0 — runs only when some validator in the
    * suite declares probes). Cheap sketches (HLL distinct estimates)
    * whose results feed size gates: validators that pick between an
    * exact and an approximate form based on data volume declare the
    * probe here and read it back in `statsExprs`/`metricExprs` via the
    * merged [[Metrics]]. Fused and key-deduped across validators like
    * every other stage, so a suite pays one cheap scan total — and
    * nothing at all when no validator probes. */
  def probeExprs(schema: StructType): Seq[(MetricKey, Column)] = Nil

  /** Pre-pass aggregates (scan 1). Empty for single-pass validators. */
  def statsExprs(schema: StructType): Seq[(MetricKey, Column)] = Nil

  /** Probe-aware stats overload: the runner calls this form, passing the
    * collected `probeExprs` results. Default delegates to the 1-arg form
    * (probe-free validators never notice the extra stage). */
  def statsExprs(schema: StructType, probes: Metrics): Seq[(MetricKey, Column)] =
    statsExprs(schema)

  /** Main aggregates (scan 2, or scan 1 if no validator in the suite has
    * stats). `stats` holds this validator's collected `statsExprs`. */
  def metricExprs(schema: StructType, stats: Metrics): Seq[(MetricKey, Column)]

  /** Turn collected metrics into issues. Pure driver-side logic. */
  def evaluate(metrics: Metrics, total: Long): Seq[ValidationIssue]

  /** Row-level predicate selecting failing rows, for enrichment phases
    * (sample collection at ResultFormat >= Basic). */
  def failPredicate(schema: StructType, stats: Metrics): Option[Column] = None

  /** Schema-only validators (column exists/type/order) never touch data:
    * they override `schemaIssues` and the runner skips their scans. */
  def schemaOnly: Boolean = false

  /** Metadata-only issues computed from the StructType alone. */
  def schemaIssues(schema: StructType): Seq[ValidationIssue] = Nil

  /** Validators this one should be skipped after, if they failed
    * (reference skip-conditions, `validators/base.py:903-945`). */
  def dependencies: Set[String] = Set.empty

  /** Human-readable Spark-plan summary for plan inspection tooling. */
  def describe: String = s"$category/$name"

  protected def issue(
      column: String,
      issueType: String,
      count: Long,
      total: Long,
      severity: Severity = Severity.Medium,
      expected: String = "",
      actual: String = ""
  ): ValidationIssue =
    ValidationIssue(name, column, issueType, count, total, severity.label, expected, actual)
}

/** Validators whose semantics cannot be expressed as global aggregates
  * (window-function ordering checks, group-by top-k). They run as their own
  * Spark job; the suite still fuses everything else. Implementations must
  * stay distributed (no unbounded driver collect). */
trait DedicatedScan { self: Validator =>
  def runScan(df: org.apache.spark.sql.DataFrame, total: Long): Seq[ValidationIssue]
}
