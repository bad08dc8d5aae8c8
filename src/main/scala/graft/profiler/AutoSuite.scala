package graft.profiler

import graft.core._
import graft.validators._

/** Deterministic auto-suite construction from a learned baseline
  * (reference: truthound AutoSuiteBuilder, `core/suite.py:438-578`):
  *   - always a null check per column;
  *   - "type" check on string columns (inferred-type drift guard);
  *   - "range" on numeric columns using learned min/max;
  *   - "unique" on key-like columns: learned unique flag, unique_ratio
  *     >= 0.98, or name matching id/key/uuid/guid/email/code/slug.
  * The decisions are pure functions of the baseline — same baseline,
  * same suite. */
object AutoSuite {
  private val keyNamePattern =
    "(?i).*(\\bid\\b|_id$|^id$|key|uuid|guid|email|code|slug).*".r

  def isKeyLikeName(name: String): Boolean =
    keyNamePattern.matches(name)

  final case class Decision(column: String, check: String)

  /** The decision list (stable order: column order, then check kind). */
  def decisions(baseline: TableBaseline): Seq[Decision] =
    baseline.columns.flatMap { b =>
      val numeric = Set("tinyint", "smallint", "int", "bigint", "float",
        "double").contains(b.dtype) || b.dtype.startsWith("decimal")
      Seq(Decision(b.column, "null")).map(identity) ++
        (if (numeric) Seq(Decision(b.column, "range")) else Nil) ++
        (if (b.dtype == "string") Seq(Decision(b.column, "type")) else Nil) ++
        (if (b.uniqueRatio >= 0.98 || isKeyLikeName(b.column))
          Seq(Decision(b.column, "unique")) else Nil)
    }

  /** Materialize validators for the decisions. */
  def build(baseline: TableBaseline): Seq[Validator] =
    decisions(baseline).map {
      case Decision(c, "null") =>
        NullCheck(Seq(c), maxNullRatio = math.max(baseline(c).nullRatio, 0.0))
      case Decision(c, "range") =>
        val b = baseline(c)
        RangeCheck(c, b.min.flatMap(s => scala.util.Try(s.toDouble).toOption),
          b.max.flatMap(s => scala.util.Try(s.toDouble).toOption))
      case Decision(c, "type") => InferredTypeCheck(c, "numeric", minRatio = 0.0)
      case Decision(c, "unique") => UniqueCheck(Seq(c))
    }

  implicit private class BaselineCol(b: ColumnBaseline) {
    def column: String = b.name
  }
}
