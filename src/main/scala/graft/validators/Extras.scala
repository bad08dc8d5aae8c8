package graft.validators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gap-fill validators completing the SURVEY §2 inventory. */

/** TableSchemaValidator (§2.1): whole-schema diff vs a learned baseline. */
final case class TableSchemaCheck(baseline: graft.profiler.TableBaseline,
    allowExtra: Boolean = false) extends Validator {
  val name = "table_schema"
  val category = "schema"
  override def schemaOnly = true
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  override def schemaIssues(schema: StructType): Seq[ValidationIssue] = {
    val actual = schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    val expected = baseline.columns.map(b => b.name -> b.dtype).toMap
    val missing = expected.keySet -- actual.keySet
    val extra = actual.keySet -- expected.keySet
    val mismatched = expected.keySet.intersect(actual.keySet)
      .filter(c => expected(c) != actual(c))
    missing.toSeq.sorted.map(c =>
      issue(c, "missing_column", 1, 0, Severity.Critical, expected = expected(c))) ++
    (if (allowExtra) Nil else extra.toSeq.sorted.map(c =>
      issue(c, "unexpected_column", 1, 0, Severity.Medium, actual = actual(c)))) ++
    mismatched.toSeq.sorted.map(c =>
      issue(c, "type_mismatch", 1, 0, Severity.High,
        expected = expected(c), actual = actual(c)))
  }
}

/** DuplicateWithinGroupValidator (§2.3): duplicate key values inside each
  * group partition. */
final case class GroupedDuplicateCheck(groupCols: Seq[String],
    keyCols: Seq[String]) extends Validator {
  val name = s"grouped_duplicate[${groupCols.mkString(",")}:${keyCols.mkString(",")}]"
  val category = "uniqueness"
  private val k = MetricKey("grouped_dupes",
    (groupCols ++ keyCols).mkString("+"))
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> (count(lit(1)) -
      count_distinct(struct((groupCols ++ keyCols).map(col): _*))))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(keyCols.mkString(","), "duplicates_within_group", n,
      total, Severity.High)) else Nil
  }
}

/** DistributionValidator (§2.4): binned histogram shape vs expected bin
  * ratios (within per-bin tolerance). Dedicated groupBy(bucket) scan. */
final case class HistogramShapeCheck(column: String, lo: Double, hi: Double,
    expectedRatios: Seq[Double], tolerance: Double = 0.05)
    extends Validator with DedicatedScan {
  val name = s"histogram_shape[$column]"
  val category = "distribution"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val bins = expectedRatios.size
    val counts = graft.drift.Drift.histogram(df, column, bins, lo, hi)
      .collect().map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("cnt")).toMap
    val n = counts.values.sum.toDouble
    if (n == 0) return Nil
    val bad = expectedRatios.zipWithIndex.filter { case (exp, i) =>
      math.abs(counts.getOrElse(i, 0L) / n - exp) > tolerance
    }
    if (bad.nonEmpty)
      Seq(issue(column, "histogram_shape_mismatch", bad.size.toLong, total,
        Severity.Medium, expected = expectedRatios.mkString(","),
        actual = (0 until bins).map(i => f"${counts.getOrElse(i, 0L) / n}%.3f")
          .mkString(",")))
    else Nil
  }
}

/** DateutilParseableValidator (§2.6) equivalent: value parses under ANY of
  * the candidate formats (multi-format coalesce — no UDF). */
final case class MultiFormatDateCheck(column: String,
    formats: Seq[String] = Seq("yyyy-MM-dd", "yyyy-MM-dd HH:mm:ss",
      "yyyy/MM/dd", "dd-MM-yyyy", "MM/dd/yyyy")) extends Validator {
  val name = s"multi_format_date[$column]"
  val category = "datetime"
  private val k = MetricKey("multiformat_fail", column, formats.mkString("|"))
  private def parsed: Column =
    coalesce(formats.map(f => try_to_timestamp(col(column), lit(f))): _*)
  private def pred: Column = col(column).isNotNull && parsed.isNull
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "unparseable_any_format", n, total,
      Severity.Medium)) else Nil
  }
}

/** MaxOfColumns / MinOfColumns relations (§2.10): target must equal the
  * row-wise greatest/least of the inputs. */
final case class ExtremumRelationCheck(inputs: Seq[String], target: String,
    useMax: Boolean = true, eps: Double = 1e-9) extends Validator {
  val name = s"${if (useMax) "max" else "min"}_relation[$target]"
  val category = "multi_column"
  private val k = MetricKey("extremum_violations",
    s"${inputs.mkString("+")}=$target", useMax.toString)
  private def pred: Column = {
    val ext = if (useMax) greatest(inputs.map(col): _*)
              else least(inputs.map(col): _*)
    abs(ext - col(target)) > eps
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(target, "extremum_mismatch", n, total,
      Severity.Medium)) else Nil
  }
}

/** TableSizeValidator (§2.11): estimated bytes + rows/columns ratio. */
final case class TableSizeCheck(maxBytes: Long = Long.MaxValue,
    minRowsPerColumn: Double = 0.0) extends Validator with DedicatedScan {
  val name = "table_size"
  val category = "table"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val cols = df.columns.length
    val ratio = if (cols == 0) 0.0 else total.toDouble / cols
    (if (bytes > BigInt(maxBytes))
      Seq(issue("*", "table_too_large", 1, total, Severity.Medium,
        expected = s"<=$maxBytes bytes", actual = bytes.toString)) else Nil) ++
    (if (ratio < minRowsPerColumn)
      Seq(issue("*", "degenerate_shape", 1, total, Severity.Low,
        expected = s">=$minRowsPerColumn rows/col", actual = f"$ratio%.1f"))
     else Nil)
  }
}

/** MultiTableOrphanValidator (§2.15): child rows whose key exists in NONE
  * of several parents. */
final case class MultiTableOrphanCheck(childTable: String, childKey: String,
    parents: Seq[(String, String)]) extends CrossTableValidator {
  val name = s"multi_orphan[$childTable.$childKey]"
  val category = "referential"
  def run(tables: Map[String, DataFrame]): Seq[ValidationIssue] = {
    val child = tables(childTable)
    var orphans = child.filter(col(childKey).isNotNull)
    parents.foreach { case (pt, pk) =>
      val parent = broadcast(tables(pt).select(col(pk)).distinct())
      orphans = orphans.join(parent, orphans(childKey) === parent(pk), "left_anti")
    }
    val n = orphans.count()
    if (n > 0)
      Seq(issue(childKey, "orphans_in_all_parents", n, child.count(),
        Severity.Critical)) else Nil
  }
}

/** Privacy policy bundles (§2.21 GDPR/CCPA/...): named groups of PII
  * patterns + severity, evaluated through the same single-pass scan. */
object PrivacyPolicies {
  /** pattern-name sets per regulation (structural mapping of the
    * reference's policy validators; the regexes live in Pii.patterns). */
  val bundles: Map[String, Seq[String]] = Map(
    "gdpr" -> Seq("email", "phone_intl", "ipv4"),
    "ccpa" -> Seq("email", "phone_intl", "ssn_us", "credit_card"),
    "appi" -> Seq("email", "phone_intl", "my_number_jp"),
    "kisa" -> Seq("korean_rrn", "email", "phone_intl"),
    "lgpd" -> Seq("email", "phone_intl", "cpf_br", "cnpj_br", "cep_br"),
    "pipeda" -> Seq("email", "phone_intl", "sin_ca", "postal_ca"),
    "pipl" -> Seq("email", "phone_intl", "chinese_id"),
    // plugin regulations (reference `privacy/plugins.py`)
    "popia" -> Seq("email", "phone_intl", "sa_id_za"),
    "pdpa_th" -> Seq("email", "phone_intl", "thai_id"),
    "pdpb_in" -> Seq("email", "phone_intl", "aadhaar_in", "pan_in"),
    "kvkk" -> Seq("email", "phone_intl", "tckn_tr"),
    "hipaa" -> Seq("email", "phone_us", "ssn_us", "mrn_us"),
    "pci_dss" -> Seq("email", "credit_card"))

  final case class PolicyViolation(policy: String, column: String,
      pattern: String, count: Long)

  def scan(df: DataFrame, policy: String,
           columns: Seq[String] = Nil): Seq[PolicyViolation] = {
    val patterns = bundles.getOrElse(policy,
      throw new IllegalArgumentException(s"unknown policy $policy"))
    graft.profiler.Pii.scan(df, columns, patterns).flagged
      .map(h => PolicyViolation(policy, h.column, h.pattern, h.count))
  }
}

/** Validator registry (§2.24 extensibility): named factories so suites can
  * be described as data (reference `validators/registry.py:171-330`). */
object ValidatorRegistry {
  type Factory = Map[String, String] => Validator
  private val registry = scala.collection.mutable.Map.empty[String, Factory]

  def register(name: String)(f: Factory): Unit = registry(name) = f
  def create(name: String, params: Map[String, String]): Validator =
    registry.getOrElse(name, throw new IllegalArgumentException(
      s"unknown validator: $name (registered: ${registry.keys.toSeq.sorted.mkString(",")})"))(params)
  def registered: Seq[String] = registry.keys.toSeq.sorted

  // canned factories for the core-7 auto-instantiable set
  register("null")(p => NullCheck(p("columns").split(",").toSeq,
    p.getOrElse("max_null_ratio", "0.0").toDouble))
  register("unique")(p => UniqueCheck(p("columns").split(",").toSeq))
  register("duplicate")(p => GroupedDuplicateCheck(
    p.getOrElse("group", "").split(",").filter(_.nonEmpty).toSeq,
    p("columns").split(",").toSeq))
  register("type")(p => InferredTypeCheck(p("column"),
    p.getOrElse("expect", "numeric"),
    p.getOrElse("min_ratio", "0.95").toDouble))
  register("range")(p => RangeCheck(p("column"),
    p.get("min").map(_.toDouble), p.get("max").map(_.toDouble)))
  register("outlier")(p => IqrOutlierCheck(p("column"),
    p.getOrElse("k", "1.5").toDouble))
  register("format")(p => FormatCheck(p("column"), p("format")))

  // round-2 additions
  register("isolation_forest")(p => IsolationForestCheck(
    p("columns").split(",").toSeq,
    p.getOrElse("threshold", "0.65").toDouble))
  register("lof")(p => LofCheck(p("columns").split(",").toSeq,
    p.getOrElse("k", "20").toInt, p.getOrElse("threshold", "1.5").toDouble))
  register("dbscan")(p => DbscanCheck(p("columns").split(",").toSeq,
    p("eps").toDouble, p.getOrElse("min_pts", "5").toInt))
  register("one_class_svm")(p => OneClassSvmCheck(
    p("columns").split(",").toSeq, p.getOrElse("nu", "0.05").toDouble))

  // round-3 additions: expression family (validators/query/expression.py);
  // SQL fragments are parsed via expr() so YAML/CLI suites can use them
  register("custom_expression")(p => CustomExpressionCheck(
    expr(p("predicate")), p.getOrElse("description", p("predicate")),
    p.getOrElse("mostly", "1.0").toDouble))
  register("conditional_expression")(p => ConditionalExpressionCheck(
    expr(p("condition")), expr(p("then")),
    p.getOrElse("description", s"if ${p("condition")} then ${p("then")}"),
    p.getOrElse("mostly", "1.0").toDouble))
  register("multi_condition")(p => MultiConditionCheck(
    p("conditions").split(";").toSeq.map(c => expr(c) -> c),
    p.getOrElse("logic", "and"), p.getOrElse("mostly", "1.0").toDouble))

  // round-3 additions: behavioral privacy (validators/privacy/)
  register("data_retention")(p => DataRetentionCheck(p("date_column"),
    p("retention_days").toInt,
    p.get("as_of").map(java.time.Instant.parse)
      .getOrElse(java.time.Instant.now())))
  register("consent_tracking")(p => ConsentCheck(p("consent_column"),
    p("pii_columns").split(",").toSeq))
  register("gdpr_special_category")(_ => SpecialCategoryCheck())
  register("gdpr_data_minimization")(p => DataMinimizationCheck(
    p("pii_columns").split(",").toSeq,
    p.getOrElse("max_null_ratio", "0.9").toDouble,
    p.getOrElse("max_pii_columns", "10").toInt))
  register("gdpr_right_to_erasure")(p => RightToErasureCheck(
    p("deletion_flag_column"), p("pii_columns").split(",").toSeq))
  register("ccpa_do_not_sell")(p => DoNotSellCheck(p("optout_column"),
    p("sharing_columns").split(",").toSeq))
  register("percentage")(p => PercentageCheck(p("part"), p("whole"),
    p.getOrElse("min", "0").toDouble, p.getOrElse("max", "100").toDouble))
  register("covariance")(p => CovarianceCheck(p("a"), p("b"),
    p.getOrElse("min", Double.MinValue.toString).toDouble,
    p.getOrElse("max", Double.MaxValue.toString).toDouble))
  register("information_gain")(p => InformationGainCheck(p("feature"),
    p("target"), p.getOrElse("min", "0").toDouble))
  register("nan_ratio")(p => NaNRatioCheck(p("column"),
    p.getOrElse("max_ratio", "0.0").toDouble))
  register("json_typed")(p => JsonTypedSchemaCheck(p("column"),
    // ';'-separated entries, ':' splits key from type ONCE — parameterized
    // types like decimal(10,2) or map<string,int> stay intact
    p("types").split(";").toSeq.map { kv =>
      val Array(k, t) = kv.split(":", 2); k -> t
    }))
  register("seasonal_decomposition")(p => SeasonalDecompositionCheck(
    p("ts"), p("value"), p("period").toInt, p.getOrElse("bucket", "day")))
  register("trend_break")(p => TrendBreakCheck(p("ts"), p("value"),
    p.getOrElse("bucket", "day"), p.getOrElse("window", "10").toInt,
    p.getOrElse("min_magnitude", "0.05").toDouble))
}
