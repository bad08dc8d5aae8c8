package graft.validators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** String validators (reference: truthound `validators/string/`, 20 classes —
  * regex.py, length.py, format.py, json.py, charset.py, casing.py,
  * like_pattern.py). All are `rlike`/`length` predicate counts that fuse
  * into the suite's single scan; regexes are codegen'd by Catalyst, no UDFs.
  */
object RegexSafety {
  /** Static ReDoS screen (reference RegexSafetyChecker,
    * `validators/base.py:140-165`): reject nested quantifiers and
    * overlapping alternation under a quantifier. Heuristic, conservative. */
  private val nestedQuantifier = """\([^)]*[+*]\)[+*{]""".r
  private val quantifiedAlternation = """\((?:[^)|]*\|)+[^)]*\)[+*]\{?""".r
  def isSafe(pattern: String): Boolean =
    nestedQuantifier.findFirstIn(pattern).isEmpty &&
      quantifiedAlternation.findFirstIn(pattern.replace("\\|", "")).isEmpty
  def require(pattern: String): Unit =
    if (!isSafe(pattern))
      throw new IllegalArgumentException(
        s"regex rejected by ReDoS safety screen: $pattern")
}

/** RegexValidator: non-null values must match `pattern`. */
final case class RegexCheck(column: String, pattern: String,
    negate: Boolean = false, mostly: Double = 1.0) extends Validator {
  RegexSafety.require(pattern)
  val name = s"regex[$column]"
  val category = "string"
  private val k = MetricKey("regex_miss", column, s"$negate/$pattern")
  private def pred: Column = {
    val m = col(column).rlike(pattern)
    col(column).isNotNull && (if (negate) m else !m)
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    val allowed = math.floor((1.0 - mostly) * total).toLong
    if (n > allowed) Seq(issue(column, if (negate) "regex_forbidden_match" else "regex_mismatch",
      n, total, Severity.Medium, expected = pattern)) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** RegexListValidator: value must match ANY (mode=any) / ALL of patterns. */
final case class RegexListCheck(column: String, patterns: Seq[String],
    mode: String = "any") extends Validator {
  patterns.foreach(RegexSafety.require)
  val name = s"regex_list[$column]"
  val category = "string"
  private val k = MetricKey("regex_list_miss", column, s"$mode/${patterns.mkString("|")}")
  private def pred: Column = {
    val ms = patterns.map(col(column).rlike)
    val ok = if (mode == "any") ms.reduce(_ || _) else ms.reduce(_ && _)
    col(column).isNotNull && !ok
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "regex_list_mismatch", n, total)) else Nil
  }
}

/** LengthValidator: string length within bounds. */
final case class LengthCheck(column: String, min: Option[Int], max: Option[Int])
    extends Validator {
  val name = s"length[$column]"
  val category = "string"
  private val k = MetricKey("length_violations", column, s"$min..$max")
  private def pred: Column = {
    val l = length(col(column))
    val lo = min.map(l < _); val hi = max.map(l > _)
    col(column).isNotNull &&
      (lo.toSeq ++ hi.toSeq).reduceOption(_ || _).getOrElse(lit(false))
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "length_out_of_bounds", n, total,
      Severity.Medium, expected = s"[${min.getOrElse(0)},${max.getOrElse("∞")}]"))
    else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** Canned format library (reference `string/format.py` + PhonePatterns).
  * Kept RE2-compatible so SQL oracles can restate them verbatim. */
object Formats {
  val email = "^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$"
  val url = "^(https?|ftp)://[A-Za-z0-9.-]+(:[0-9]+)?(/[^ ]*)?$"
  val uuid = "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$"
  val ipv4 = "^([0-9]{1,3}\\.){3}[0-9]{1,3}$"
  val ipv6 = "^[0-9a-fA-F:]+:[0-9a-fA-F:]*$"
  val phoneE164 = "^\\+[1-9][0-9]{6,14}$"
  val alphanumeric = "^[A-Za-z0-9]*$"
  val all: Map[String, String] = Map("email" -> email, "url" -> url,
    "uuid" -> uuid, "ipv4" -> ipv4, "ipv6" -> ipv6, "phone" -> phoneE164,
    "alphanumeric" -> alphanumeric)
}

/** Email/Url/Uuid/Ip/Phone/AlphanumericValidator via the format library. */
final case class FormatCheck(column: String, format: String,
    mostly: Double = 1.0) extends Validator {
  private val pattern = Formats.all.getOrElse(format,
    throw new IllegalArgumentException(s"unknown format $format"))
  val name = s"format_$format[$column]"
  val category = "string"
  private val k = MetricKey("format_miss", column, format)
  private def pred: Column = col(column).isNotNull && !col(column).rlike(pattern)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    val allowed = math.floor((1.0 - mostly) * total).toLong
    if (n > allowed) Seq(issue(column, s"invalid_$format", n, total, Severity.Medium,
      expected = pattern)) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** JsonParseableValidator: values must parse as JSON. Uses try_parse_json
  * (variant) — codegen'd, no UDF. */
final case class JsonParseableCheck(column: String) extends Validator {
  val name = s"json_parseable[$column]"
  val category = "string"
  private val k = MetricKey("json_invalid", column)
  private def pred: Column =
    col(column).isNotNull && try_parse_json(col(column)).isNull
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "invalid_json", n, total, Severity.Medium))
    else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** JsonSchemaValidator (lite): JSON documents must contain the required
  * paths with non-null values (`$.key` JSONPath form). get_json_object is
  * codegen'd; full JSON-Schema validation would need a UDF — the required
  * keys + parseability combination covers the reference's practical use. */
final case class JsonRequiredKeysCheck(column: String, paths: Seq[String])
    extends Validator {
  require(paths.nonEmpty, "at least one JSONPath required")
  val name = s"json_keys[$column]"
  val category = "string"
  private val k = MetricKey("json_missing_keys", column, paths.mkString("|"))
  private def pred: Column =
    col(column).isNotNull &&
      paths.map(p => get_json_object(col(column), p).isNull).reduce(_ || _)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "missing_json_keys", n, total,
      Severity.Medium, expected = paths.mkString(","))) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** JsonTypedSchemaValidator: flat JSON schema with per-key declared Spark
  * SQL types. A key that is PRESENT but not parseable as its declared type
  * counts as a type violation (from_json PERMISSIVE null-out semantics);
  * `required` paths must also be present. Closes the gap between the
  * reference's full JSON-Schema validator and the required-keys lite form
  * — still zero UDFs (from_json + get_json_object are codegen'd). */
final case class JsonTypedSchemaCheck(column: String,
    types: Seq[(String, String)], required: Seq[String] = Nil)
    extends Validator {
  require(types.nonEmpty, "at least one typed key required")
  val name = s"json_typed[$column]"
  val category = "string"
  private val ddl = types.map { case (k, t) => s"`$k` $t" }.mkString(", ")
  private val kType = MetricKey("json_type_violations", column, ddl)
  private val kMissing = MetricKey("json_missing_required", column,
    required.mkString("|"))
  private def parsed: Column =
    from_json(col(column), ddl, Map.empty[String, String])
  private def wrongType: Column =
    col(column).isNotNull && types.map { case (k, _) =>
      get_json_object(col(column), s"$$.$k").isNotNull &&
        parsed.getField(k).isNull
    }.reduce(_ || _)
  private def missing: Column =
    if (required.isEmpty) lit(false)
    else col(column).isNotNull &&
      required.map(p => get_json_object(col(column), p).isNull).reduce(_ || _)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(kType -> count(when(wrongType, 1)),
        kMissing -> count(when(missing, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val t = m.long(kType); val r = m.long(kMissing)
    (if (t > 0) Seq(issue(column, "json_type_violation", t, total,
      Severity.Medium, expected = ddl)) else Nil) ++
    (if (r > 0) Seq(issue(column, "missing_json_keys", r, total,
      Severity.Medium, expected = required.mkString(","))) else Nil)
  }
}

/** ConsistentCasingValidator: column must be uniformly lower/upper/title. */
final case class CasingCheck(column: String, casing: String = "lower")
    extends Validator {
  require(Set("lower", "upper", "title").contains(casing),
    s"unsupported casing: $casing")
  val name = s"casing[$column]"
  val category = "string"
  private val k = MetricKey("casing_violations", column, casing)
  private def pred: Column = {
    val c = col(column)
    val want = casing match {
      case "lower" => c === lower(c)
      case "upper" => c === upper(c)
      case "title" => c === initcap(c)
    }
    c.isNotNull && !want
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, s"not_${casing}case", n, total, Severity.Low))
    else Nil
  }
}

/** LikePatternValidator: SQL LIKE pattern (reference `string/like_pattern.py`). */
final case class LikePatternCheck(column: String, pattern: String,
    negate: Boolean = false) extends Validator {
  val name = s"like[$column]"
  val category = "string"
  private val k = MetricKey("like_miss", column, s"$negate/$pattern")
  private def pred: Column = {
    val m = col(column).like(pattern)
    col(column).isNotNull && (if (negate) m else !m)
  }
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "like_mismatch", n, total, Severity.Low,
      expected = pattern)) else Nil
  }
}
