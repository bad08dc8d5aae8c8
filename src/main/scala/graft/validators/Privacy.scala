package graft.validators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** Behavioral privacy validators (reference: truthound
  * `validators/privacy/base.py` DataRetentionValidator/ConsentValidator,
  * `privacy/gdpr.py` SpecialCategory/DataMinimization/RightToErasure,
  * `privacy/ccpa.py` DoNotSell). The regulation *pattern* bundles live in
  * `Extras.PrivacyPolicies` over the shared `Pii.scan`; these validators
  * cover the reference's non-pattern compliance checks — retention
  * windows, consent tracking, erasure flags, opt-out honoring — as fused
  * aggregate expressions (zero extra scans in a suite), plus the
  * schema-only Article 9 special-category sweep. */

/** GDPR Art. 5(1)(e) DataRetentionValidator: records older than the
  * retention window still present. `asOf` is injected for deterministic
  * replays (same contract as FreshnessCheck). */
final case class DataRetentionCheck(dateColumn: String, retentionDays: Int,
    asOf: java.time.Instant = java.time.Instant.now())
    extends Validator {
  val name = s"data_retention[$dateColumn>$retentionDays d]"
  val category = "privacy"
  private val k = MetricKey("retention_violations", dateColumn,
    s"$retentionDays/$asOf")
  private def cutoff: Column =
    lit(java.sql.Timestamp.from(asOf.minusSeconds(retentionDays * 86400L)))
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(col(dateColumn) < cutoff, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0)
      Seq(issue(dateColumn, "retention_period_exceeded", n, total,
        Severity.High, expected = s"age <= $retentionDays days")) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) =
    Some(col(dateColumn) < cutoff)
}

/** GDPR Art. 7 ConsentValidator: rows carrying PII in `piiColumns`
  * without a valid consent value. One fused count per PII column. */
final case class ConsentCheck(consentColumn: String, piiColumns: Seq[String],
    validConsentValues: Seq[String] = Seq("yes", "true", "1", "explicit",
      "granted", "accepted")) extends Validator {
  val name = s"consent_tracking[$consentColumn]"
  val category = "privacy"
  private def noConsent: Column =
    !lower(coalesce(col(consentColumn).cast("string"), lit("")))
      .isin(validConsentValues.map(_.toLowerCase): _*)
  private def keyOf(c: String) = MetricKey("consent_violations", c, consentColumn)
  def metricExprs(schema: StructType, stats: Metrics) =
    if (!schema.fieldNames.contains(consentColumn)) Nil
    else piiColumns.filter(schema.fieldNames.contains).map(c =>
      keyOf(c) -> count(when(col(c).isNotNull && noConsent, 1)))
  def evaluate(m: Metrics, total: Long) =
    piiColumns.flatMap { c =>
      val n = m.long(keyOf(c))
      if (n > 0) Some(issue(c, "pii_without_consent", n, total,
        Severity.Critical, expected = s"$consentColumn in " +
          validConsentValues.mkString("{", ",", "}"))) else None
    }
  override def schemaIssues(schema: StructType) =
    if (!schema.fieldNames.contains(consentColumn))
      Seq(issue(consentColumn, "consent_column_missing", 0, 0,
        Severity.Critical, expected = "documented consent column")) else Nil
}

/** GDPR Art. 9 SpecialCategoryValidator: schema-only sweep for column
  * names hinting at special-category data (health, ethnicity, politics,
  * religion, union, genetic, biometric, orientation, criminal — the Art.
  * 9/10 list, hints mirrored from `privacy/gdpr.py:234-357`). */
final case class SpecialCategoryCheck() extends Validator {
  val name = "gdpr_special_category"
  val category = "privacy"
  override val schemaOnly = true
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  override def schemaIssues(schema: StructType) =
    schema.fieldNames.toSeq.flatMap { c =>
      val lc = c.toLowerCase
      SpecialCategoryCheck.hints.collectFirst {
        case (categoryName, words) if words.exists(lc.contains) =>
          issue(c, "gdpr_special_category_detected", 0, 0, Severity.Critical,
            expected = "explicit consent or Art. 9 legal basis",
            actual = categoryName)
      }
    }
}
object SpecialCategoryCheck {
  val hints: Seq[(String, Seq[String])] = Seq(
    "health" -> Seq("health", "medical", "diagnosis", "treatment",
      "medication", "prescription", "allergy", "symptom", "disease",
      "blood_type", "disability", "mental_health", "patient"),
    "racial_ethnic" -> Seq("race", "ethnicity", "ethnic", "racial",
      "nationality"),
    "political" -> Seq("political", "party_affiliation", "vote", "voting",
      "election"),
    "religious" -> Seq("religion", "religious", "faith", "denomination",
      "spiritual"),
    "trade_union" -> Seq("trade_union", "labor_union", "union_member"),
    "genetic" -> Seq("genetic", "dna", "genome", "genotype", "hereditary"),
    "biometric" -> Seq("biometric", "fingerprint", "face_id", "facial",
      "iris", "retina", "voice_print"),
    "sex_life" -> Seq("sexual", "orientation", "gender_identity", "lgbtq"),
    "criminal" -> Seq("criminal", "conviction", "offense", "arrest",
      "felony", "misdemeanor"))
}

/** GDPR Art. 5(1)(c) DataMinimizationValidator: declared PII columns that
  * are mostly null (collected but unused → unnecessary), and too many PII
  * columns overall. */
final case class DataMinimizationCheck(piiColumns: Seq[String],
    maxNullRatio: Double = 0.9, maxPiiColumns: Int = 10) extends Validator {
  val name = s"gdpr_data_minimization[${piiColumns.size} cols]"
  val category = "privacy"
  private def keyOf(c: String) = MetricKey("minimization_nulls", c, "")
  def metricExprs(schema: StructType, stats: Metrics) =
    piiColumns.filter(schema.fieldNames.contains)
      .map(c => keyOf(c) -> count(when(col(c).isNull, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val sparse = piiColumns.flatMap { c =>
      val nulls = m.long(keyOf(c))
      val ratio = if (total == 0) 0.0 else nulls.toDouble / total
      if (m.contains(keyOf(c)) && ratio > maxNullRatio)
        Some(issue(c, "gdpr_unnecessary_pii_column", nulls, total,
          Severity.Medium, expected = f"null ratio <= $maxNullRatio%.2f",
          actual = f"$ratio%.4f")) else None
    }
    val excess =
      if (piiColumns.size > maxPiiColumns)
        Seq(issue("*", "gdpr_excessive_pii_columns",
          piiColumns.size.toLong, maxPiiColumns.toLong, Severity.Medium,
          expected = s"<= $maxPiiColumns PII columns")) else Nil
    sparse ++ excess
  }
}

/** GDPR Art. 17 RightToErasureValidator: rows flagged deleted whose PII
  * columns still hold values. */
final case class RightToErasureCheck(deletionFlagColumn: String,
    piiColumns: Seq[String],
    deletedValues: Seq[String] = Seq("deleted", "erased", "true", "1", "yes"))
    extends Validator {
  val name = s"gdpr_right_to_erasure[$deletionFlagColumn]"
  val category = "privacy"
  private def flagged: Column =
    lower(coalesce(col(deletionFlagColumn).cast("string"), lit("")))
      .isin(deletedValues.map(_.toLowerCase): _*)
  private def keyOf(c: String) =
    MetricKey("erasure_violations", c, deletionFlagColumn)
  def metricExprs(schema: StructType, stats: Metrics) =
    if (!schema.fieldNames.contains(deletionFlagColumn)) Nil
    else piiColumns.filter(schema.fieldNames.contains).map(c =>
      keyOf(c) -> count(when(flagged && col(c).isNotNull, 1)))
  def evaluate(m: Metrics, total: Long) =
    piiColumns.flatMap { c =>
      val n = m.long(keyOf(c))
      if (n > 0) Some(issue(c, "pii_present_after_erasure", n, total,
        Severity.Critical,
        expected = s"$c null where $deletionFlagColumn marks deletion"))
      else None
    }
  override def schemaIssues(schema: StructType) =
    if (!schema.fieldNames.contains(deletionFlagColumn))
      Seq(issue(deletionFlagColumn, "gdpr_erasure_flag_missing", 0, 0,
        Severity.High, expected = "deletion tracking column")) else Nil
}

/** CCPA §1798.120 DoNotSellValidator: rows opted out of sale whose
  * sharing indicators still mark the record as shared/sold. */
final case class DoNotSellCheck(optoutColumn: String,
    sharingIndicatorColumns: Seq[String],
    optedOutValues: Seq[String] = Seq("true", "1", "yes", "opted_out"),
    sharedValues: Seq[String] = Seq("true", "1", "yes", "sold", "shared"))
    extends Validator {
  val name = s"ccpa_do_not_sell[$optoutColumn]"
  val category = "privacy"
  private def optedOut: Column =
    lower(coalesce(col(optoutColumn).cast("string"), lit("")))
      .isin(optedOutValues.map(_.toLowerCase): _*)
  private def sharedIn(c: String): Column =
    lower(coalesce(col(c).cast("string"), lit("")))
      .isin(sharedValues.map(_.toLowerCase): _*)
  private def keyOf(c: String) = MetricKey("optout_violations", c, optoutColumn)
  def metricExprs(schema: StructType, stats: Metrics) =
    if (!schema.fieldNames.contains(optoutColumn)) Nil
    else sharingIndicatorColumns.filter(schema.fieldNames.contains)
      .map(c => keyOf(c) -> count(when(optedOut && sharedIn(c), 1)))
  def evaluate(m: Metrics, total: Long) =
    sharingIndicatorColumns.flatMap { c =>
      val n = m.long(keyOf(c))
      if (n > 0) Some(issue(c, "ccpa_sold_after_optout", n, total,
        Severity.Critical,
        expected = s"no sharing where $optoutColumn opts out")) else None
    }
  override def schemaIssues(schema: StructType) =
    if (!schema.fieldNames.contains(optoutColumn))
      Seq(issue(optoutColumn, "ccpa_optout_column_missing", 0, 0,
        Severity.High, expected = "opt-out tracking column")) else Nil
}
