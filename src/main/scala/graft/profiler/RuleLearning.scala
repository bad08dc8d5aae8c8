package graft.profiler

import graft.core._
import graft.validators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** History-driven rule learning (reference: truthound
  * `ml/rule_learning/` — ConstraintMiner/DataProfileRuleLearner learn
  * validator suggestions with confidence + support from observed data;
  * `ml/monitoring/` trends metrics over runs).
  *
  * Two inputs, two learners:
  *   - `fromBaselines`: a SEQUENCE of profiles of the same table over time
  *     (Learn.learn per run). Bounds that held on every profile become
  *     suggested validators — stable min/max → range, stable null-rate →
  *     completeness bound, always-unique → unique, stable value set →
  *     inset. Confidence = fraction of profiles satisfying the rule; only
  *     rules at confidence 1.0 with >= minRuns supporting profiles are
  *     emitted (the reference's min_confidence/min_support filter).
  *   - `fromHistory`: the run-history store. Validators that PASSED every
  *     stored run are confirmed expectations; validators that failed in
  *     >= flakyRatio of runs are flagged for threshold review. This learns
  *     from RESULTS, complementing the profile-based learner.
  *
  * Both emit AutoSuite-style `Decision` records plus a confidence score,
  * so downstream consumers (CLI generate-suite, SuiteStore) treat learned
  * and auto-built suites identically. All driver-side math is over
  * O(runs x columns) summaries, never row-level data.
  */
object RuleLearning {

  /** A suggested rule with its provenance (reference LearnedRule:
    * rule + confidence + support). */
  final case class LearnedRule(column: String, check: String,
      params: Map[String, String], confidence: Double, support: Int,
      rationale: String) {
    def decision: AutoSuite.Decision = AutoSuite.Decision(column, check)
  }

  /** Relative wiggle applied to learned numeric bounds (a bound observed
    * stable across history should not fire on the first value a hair
    * outside it — the reference widens mined ranges the same way). */
  val boundSlack = 0.05

  def fromBaselines(history: Seq[TableBaseline], minRuns: Int = 3)
      : Seq[LearnedRule] = {
    if (history.size < minRuns) return Nil
    val n = history.size
    val columns = history.last.columns.map(_.name)
    columns.flatMap { c =>
      val obs = history.flatMap(_.columns.find(_.name == c))
      if (obs.size < minRuns) Nil
      else {
        val rules = Seq.newBuilder[LearnedRule]
        // stable numeric bounds -> range check over the widened envelope
        val mins = obs.flatMap(_.min.flatMap(s =>
          scala.util.Try(s.toDouble).toOption))
        val maxs = obs.flatMap(_.max.flatMap(s =>
          scala.util.Try(s.toDouble).toOption))
        if (mins.size == obs.size && maxs.size == obs.size) {
          val (lo, hi) = (mins.min, maxs.max)
          val spread = math.max(math.abs(hi - lo), 1e-9)
          val stable = (mins.max - mins.min) <= boundSlack * spread &&
            (maxs.max - maxs.min) <= boundSlack * spread
          if (stable)
            rules += LearnedRule(c, "range",
              Map("min" -> (lo - boundSlack * spread).toString,
                  "max" -> (hi + boundSlack * spread).toString),
              1.0, obs.size,
              f"min/max stable across ${obs.size} profiles " +
                f"(envelope [$lo%.4g, $hi%.4g])")
        }
        // stable null-rate -> completeness bound at observed ceiling
        val nullRatios = obs.map(_.nullRatio)
        val nullCeil = nullRatios.max
        if (nullCeil == 0.0)
          rules += LearnedRule(c, "null", Map("maxNullRatio" -> "0.0"),
            1.0, obs.size, s"no nulls in any of ${obs.size} profiles")
        else if (nullRatios.min > 0 &&
            nullCeil - nullRatios.min <= boundSlack)
          rules += LearnedRule(c, "null",
            Map("maxNullRatio" ->
              math.min(nullCeil * (1 + boundSlack), 1.0).toString),
            1.0, obs.size,
            f"null-rate stable at ${nullCeil * 100}%.2f%% ceiling")
        // always unique -> unique check
        if (obs.forall(_.uniqueRatio >= 1.0 - 1e-12))
          rules += LearnedRule(c, "unique", Map.empty, 1.0, obs.size,
            s"unique in all ${obs.size} profiles")
        // stable small value set -> inset check over the union
        val sets = obs.map(_.allowedValues)
        if (sets.forall(_.isDefined)) {
          val all = sets.flatMap(_.get).distinct.sorted
          val last = sets.last.get.toSet
          if (all.forall(last.contains))
            rules += LearnedRule(c, "inset",
              Map("values" -> all.mkString("|")), 1.0, obs.size,
              s"value set closed over ${obs.size} profiles (${all.size} values)")
        }
        rules.result()
      }
    }
  }

  /** Learn from stored run RESULTS: confirmed expectations (passed every
    * run) and flaky validators (failed in >= flakyRatio of runs — their
    * thresholds disagree with reality and need review). */
  final case class HistoryFinding(validator: String, kind: String,
      passRate: Double, runs: Long)

  def fromHistory(spark: SparkSession, store: graft.stores.ResultStore,
      dataset: String, minRuns: Int = 3, flakyRatio: Double = 0.5)
      : Seq[HistoryFinding] = {
    val perValidator = store.history(spark, dataset)
      .groupBy(col("validator"))
      .agg(count(lit(1)).as("runs"),
        avg(when(col("passed"), 1.0).otherwise(0.0)).as("passRate"))
      .collect()                                  // O(validators), bounded
    perValidator.toIndexedSeq.flatMap { r =>
      val (v, runs, rate) = (r.getAs[String]("validator"),
        r.getAs[Long]("runs"), r.getAs[Double]("passRate"))
      if (runs < minRuns) None
      else if (rate >= 1.0) Some(HistoryFinding(v, "confirmed", rate, runs))
      else if (1.0 - rate >= flakyRatio)
        Some(HistoryFinding(v, "threshold_review", rate, runs))
      else Some(HistoryFinding(v, "intermittent", rate, runs))
    }
  }

  /** Materialize learned profile rules into executable validators. */
  def build(rules: Seq[LearnedRule]): Seq[Validator] = rules.map {
    case LearnedRule(c, "range", p, _, _, _) =>
      RangeCheck(c, p.get("min").map(_.toDouble), p.get("max").map(_.toDouble))
    case LearnedRule(c, "null", p, _, _, _) =>
      NullCheck(Seq(c), maxNullRatio =
        p.get("maxNullRatio").map(_.toDouble).getOrElse(0.0))
    case LearnedRule(c, "unique", _, _, _, _) => UniqueCheck(Seq(c))
    case LearnedRule(c, "inset", p, _, _, _) =>
      SetMembershipCheck(c, p("values").split("\\|").toIndexedSeq)
    case r => throw new IllegalArgumentException(s"unmapped rule ${r.check}")
  }
}
