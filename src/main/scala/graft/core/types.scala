package graft.core

/** Core result model for the validation kernel.
  *
  * Mirrors the reference's result contract (truthound `src/truthound/types.py:18-280`,
  * `core/results.py:34-80`) re-expressed as plain Scala case classes so results
  * are themselves representable as a `Dataset[ValidationIssue]`.
  */
sealed abstract class Severity(val rank: Int, val label: String)
    extends Ordered[Severity] {
  def compare(that: Severity): Int = rank.compare(that.rank)
}
object Severity {
  case object Low      extends Severity(0, "low")
  case object Medium   extends Severity(1, "medium")
  case object High     extends Severity(2, "high")
  case object Critical extends Severity(3, "critical")
  val all: Seq[Severity] = Seq(Low, Medium, High, Critical)
  def parse(s: String): Severity =
    all.find(_.label == s.toLowerCase).getOrElse(Medium)
}

/** How much enrichment to run after the single-pass metric scan.
  * Reference: ResultFormat BOOLEAN_ONLY < BASIC < SUMMARY < COMPLETE
  * (`types.py:51-174`). Each step up adds bounded follow-up Spark jobs. */
sealed abstract class ResultFormat(val rank: Int)
object ResultFormat {
  case object BooleanOnly extends ResultFormat(0)
  case object Basic       extends ResultFormat(1)
  case object Summary     extends ResultFormat(2)
  case object Complete    extends ResultFormat(3)
}

/** One detected data-quality problem. Counts are exact unless the validator
  * documents an approximation (e.g. HLL-backed distinct counts). */
final case class ValidationIssue(
    validator: String,
    column: String,
    issueType: String,
    count: Long,
    totalCount: Long,
    severity: String,
    expected: String,
    actual: String,
    sampleValues: Seq[String] = Nil
) {
  def ratio: Double = if (totalCount == 0) 0.0 else count.toDouble / totalCount
}

/** Result of one validator run within a suite. */
final case class CheckResult(
    validator: String,
    category: String,
    passed: Boolean,
    issues: Seq[ValidationIssue],
    elapsedMillis: Long
)

/** Whole-suite result: the single artifact a caller consumes.
  * Reference: ValidationRunResult (`core/results.py`). */
final case class ValidationRunResult(
    dataset: String,
    rowCount: Long,
    checks: Seq[CheckResult],
    executionMode: String,
    scanCount: Int
) {
  def passed: Boolean = checks.forall(_.passed)
  def issues: Seq[ValidationIssue] = checks.flatMap(_.issues)
  def failedChecks: Seq[CheckResult] = checks.filterNot(_.passed)
}

/** Key identifying one scalar metric over a dataset; the unit of
  * cross-validator deduplication (reference SharedMetricStore,
  * `validators/metrics.py:109-254`). */
final case class MetricKey(metric: String, column: String, params: String = "") {
  override def toString: String =
    if (params.isEmpty) s"$metric($column)" else s"$metric($column,$params)"
}
