package graft.validators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Geospatial validators (reference: truthound `validators/geospatial/`,
  * 11 classes — coordinate.py, distance.py, boundary.py). All plain
  * trigonometric Column math; no UDFs. */
object Geo {
  val earthRadiusKm = 6371.0
  /** Haversine great-circle distance in km between two (lat, lon) pairs
    * given in degrees. */
  def haversineKm(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1) / 2
    val dLon = radians(lon2 - lon1) / 2
    val a = pow(sin(dLat), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon), 2)
    lit(2 * earthRadiusKm) * asin(sqrt(a))
  }
}

/** LatitudeValidator / LongitudeValidator / CoordinateValidator. */
final case class CoordinateCheck(latCol: String, lonCol: String) extends Validator {
  val name = s"coordinate[$latCol,$lonCol]"
  val category = "geospatial"
  private val klat = MetricKey("lat_invalid", latCol)
  private val klon = MetricKey("lon_invalid", lonCol)
  private val knull = MetricKey("null_island", s"$latCol/$lonCol")
  def metricExprs(schema: StructType, stats: Metrics) = Seq(
    klat -> count(when(col(latCol) < -90 || col(latCol) > 90, 1)),
    klon -> count(when(col(lonCol) < -180 || col(lonCol) > 180, 1)),
    knull -> count(when(col(latCol) === 0.0 && col(lonCol) === 0.0, 1)))
  def evaluate(m: Metrics, total: Long) =
    Seq(
      (klat, latCol, "invalid_latitude", "[-90,90]"),
      (klon, lonCol, "invalid_longitude", "[-180,180]"),
      (knull, s"$latCol,$lonCol", "null_island", "not (0,0)")
    ).flatMap { case (k, c, t, exp) =>
      val n = m.long(k)
      if (n > 0) Some(issue(c, t, n, total, Severity.Medium, expected = exp))
      else None
    }
}

/** BoundingBoxValidator: all points inside [minLat..maxLat]x[minLon..maxLon]. */
final case class BoundingBoxCheck(latCol: String, lonCol: String,
    minLat: Double, maxLat: Double, minLon: Double, maxLon: Double)
    extends Validator {
  val name = s"bbox[$latCol,$lonCol]"
  val category = "geospatial"
  private val k = MetricKey("bbox_violations", s"$latCol/$lonCol",
    s"$minLat,$maxLat,$minLon,$maxLon")
  private def pred: Column =
    col(latCol) < minLat || col(latCol) > maxLat ||
      col(lonCol) < minLon || col(lonCol) > maxLon
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(s"$latCol,$lonCol", "outside_bounding_box", n, total,
      Severity.Medium)) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** GeoDistanceFromPointValidator: all points within maxKm of a fixed point. */
final case class GeoDistanceCheck(latCol: String, lonCol: String,
    centerLat: Double, centerLon: Double, maxKm: Double) extends Validator {
  val name = s"geo_distance[$latCol,$lonCol]"
  val category = "geospatial"
  private val k = MetricKey("distance_violations", s"$latCol/$lonCol",
    s"$centerLat,$centerLon,$maxKm")
  private def pred: Column =
    Geo.haversineKm(col(latCol), col(lonCol), lit(centerLat), lit(centerLon)) > maxKm
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(s"$latCol,$lonCol", "too_far_from_center", n, total,
      Severity.Medium, expected = s"<=${maxKm}km of ($centerLat,$centerLon)"))
    else Nil
  }
}

/** CountryValidator (reference `geospatial/boundary.py`): points must fall
  * inside the bounding boxes of allowed countries. The box table is tiny —
  * broadcast join, or for the fused path a disjunction of box predicates. */
object CountryBoxes {
  /** (country, minLat, maxLat, minLon, maxLon) — coarse bounding boxes. */
  val boxes: Map[String, (Double, Double, Double, Double)] = Map(
    "US" -> (24.5, 49.4, -125.0, -66.9),
    "KR" -> (33.0, 38.7, 124.6, 131.9),
    "JP" -> (24.0, 45.6, 122.9, 153.9),
    "DE" -> (47.3, 55.1, 5.9, 15.0),
    "FR" -> (41.3, 51.1, -5.1, 9.6),
    "BR" -> (-33.8, 5.3, -73.9, -34.8))

  def inCountry(lat: Column, lon: Column, country: String): Column = {
    val (la, lb, lo, hi) = boxes(country)
    lat.between(la, lb) && lon.between(lo, hi)
  }
}

/** Points must fall inside at least one allowed country's box. */
final case class CountryCheck(latCol: String, lonCol: String,
    allowed: Seq[String]) extends Validator {
  allowed.foreach(c => require(CountryBoxes.boxes.contains(c),
    s"unknown country: $c"))
  val name = s"country[$latCol,$lonCol]"
  val category = "geospatial"
  private val k = MetricKey("country_violations", s"$latCol/$lonCol",
    allowed.mkString("|"))
  private def pred: Column =
    col(latCol).isNotNull && col(lonCol).isNotNull &&
      !allowed.map(c => CountryBoxes.inCountry(col(latCol), col(lonCol), c))
        .reduce(_ || _)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(s"$latCol,$lonCol", "outside_allowed_countries",
      n, total, Severity.Medium, expected = allowed.mkString(","))) else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** Localization validators (reference: truthound `validators/localization/`,
  * 9 classes — korean.py, japanese.py, chinese.py). Regex structure +
  * weighted-checksum math via higher-order functions, mirroring the
  * published check-digit algorithms. */
object LocalFormats {
  /** Korean resident registration number (RRN) YYMMDD-GNNNNNC structure. */
  val koreanRrn = "^[0-9]{6}-[1-8][0-9]{6}$"
  /** Korean business registration number NNN-NN-NNNNN. */
  val koreanBizNo = "^[0-9]{3}-[0-9]{2}-[0-9]{5}$"
  /** Japanese postal code NNN-NNNN. */
  val japanesePostal = "^[0-9]{3}-[0-9]{4}$"
  /** Chinese 18-digit citizen ID (last digit may be X). */
  val chineseId = "^[0-9]{17}[0-9Xx]$"

  /** Korean RRN check digit: weights 2..9,2..5 over first 12 digits,
    * check = (11 - sum % 11) % 10. Pure Column-API (zip_with/aggregate),
    * so it composes over computed columns — the earlier {c.toString} SQL
    * interpolation silently broke on anything but a bare attribute. */
  def koreanRrnValid(c: Column): Column = {
    val digits = regexp_replace(c, "-", "")
    val weights = array((Seq(2, 3, 4, 5, 6, 7, 8, 9, 2, 3, 4, 5)).map(lit): _*)
    val ds = transform(sequence(lit(0), lit(11)),
      i => ascii(digits.substr(i + lit(1), lit(1))) - lit(48))
    val sumExpr = aggregate(zip_with(ds, weights, (d, w) => d * w),
      lit(0), (acc, x) => acc + x)
    val check = (lit(11) - (sumExpr % 11)) % 10
    c.rlike(koreanRrn) &&
      check === (ascii(substring(digits, 13, 1)) - 48)
  }

  /** Chinese 18-digit resident ID WITH the ISO-7064 MOD 11-2 weighted check
    * digit (reference `localization/chinese.py` — the r1 build had shape
    * only). Weights 7,9,10,5,8,4,2,1,6,3,... over the first 17 digits;
    * check char = "10X98765432"[sum % 11]. */
  def chineseIdValid(c: Column): Column = {
    val weights = array(Seq(7, 9, 10, 5, 8, 4, 2, 1, 6, 3, 7, 9, 10, 5, 8,
      4, 2).map(lit): _*)
    val ds = transform(sequence(lit(0), lit(16)),
      i => ascii(c.substr(i + lit(1), lit(1))) - lit(48))
    val s = aggregate(zip_with(ds, weights, (d, w) => d * w),
      lit(0), (a, x) => a + x)
    val expected = lit("10X98765432").substr((s % 11) + 1, lit(1))
    c.rlike(chineseId) && upper(c.substr(lit(18), lit(1))) === expected
  }

  /** Japanese My Number (12 digits): check = 11 − (Σ Pn·Qn mod 11), where
    * Pn is the n-th digit from the right of the first 11 and Qn = n+1 for
    * n ≤ 6 else n − 5; results ≤ 1 collapse to 0 (reference
    * `localization/japanese.py`). */
  def myNumberValid(c: Column): Column = {
    val s = aggregate(transform(sequence(lit(1), lit(11)), n => {
      val p = ascii(c.substr(lit(12) - n, lit(1))) - lit(48)
      val q = when(n <= 6, n + 1).otherwise(n - 5)
      p * q
    }), lit(0), (a, x) => a + x)
    val r = s % 11
    val check = when(r <= 1, lit(0)).otherwise(lit(11) - r)
    c.rlike("^[0-9]{12}$") &&
      check === (ascii(c.substr(lit(12), lit(1))) - lit(48))
  }

  /** Chinese Unified Social Credit Code (18 chars, base-31 alphabet
    * 0-9A-HJ-NP-RTUWXY, weights 3^i mod 31; reference
    * `localization/chinese.py` USCC validator). */
  val usccShape = "^[0-9A-HJ-NP-RTUWXY]{18}$"
  def usccValid(c: Column): Column = {
    def code(ch: Column): Column =
      when(ch.between("0", "9"), ascii(ch) - 48)
        .when(ch.between("A", "H"), ascii(ch) - 55)
        .when(ch.between("J", "N"), ascii(ch) - 56)
        .when(ch.between("P", "R"), ascii(ch) - 57)
        .when(ch === "T", lit(26)).when(ch === "U", lit(27))
        .when(ch === "W", lit(28)).when(ch === "X", lit(29))
        .when(ch === "Y", lit(30)).otherwise(lit(-1))
    val weights = array(Seq(1, 3, 9, 27, 19, 26, 16, 17, 20, 29, 25, 13, 8,
      24, 10, 30, 28).map(lit): _*)
    val cs = transform(sequence(lit(0), lit(16)),
      i => code(c.substr(i + lit(1), lit(1))))
    val s = aggregate(zip_with(cs, weights, (d, w) => d * w),
      lit(0), (a, x) => a + x)
    val check = (lit(31) - (s % 31)) % 31
    c.rlike(usccShape) && check === code(c.substr(lit(18), lit(1)))
  }

  /** Korean bank-account shape (institution-prefixed digit groups — no
    * national checksum exists; regex structure per reference
    * `localization/korean.py`). */
  val koreanBankAccount = "^[0-9]{2,6}-[0-9]{2,6}-[0-9]{4,8}$"

  /** Korean phone numbers (reference `localization/korean.py:250-312`):
    * mobile `01[016789]` + 7-8 digits, landline `0[2-6]` + 7-9 digits,
    * special (toll-free/service) `080`+7 or `1NNN`+4. Separators
    * (whitespace, dash, dot) are stripped first, matching the reference
    * base preprocessor (`localization/base.py:86`). */
  def koreanPhoneValid(c: Column, allowMobile: Boolean = true,
      allowLandline: Boolean = true, allowSpecial: Boolean = true): Column = {
    val d = regexp_replace(c, "[\\s\\-.]", "")
    Seq(
      allowMobile -> "^01[016789][0-9]{7,8}$",
      allowLandline -> "^0[2-6][0-9]{7,9}$",
      allowSpecial -> "^(080[0-9]{7}|1[0-9]{3}[0-9]{4})$")
      .collect { case (true, p) => d.rlike(p) }
      .reduceOption(_ || _).getOrElse(lit(false))
  }
}

/** KoreanPhoneValidator: mobile/landline/special formats with per-class
  * allow flags (reference `localization/korean.py:250`). */
final case class KoreanPhoneCheck(column: String,
    allowMobile: Boolean = true, allowLandline: Boolean = true,
    allowSpecial: Boolean = true) extends Validator {
  val name = s"korean_phone[$column]"
  val category = "localization"
  private val k = MetricKey("kr_phone_invalid", column)
  private def pred: Column = col(column).isNotNull &&
    !LocalFormats.koreanPhoneValid(col(column), allowMobile, allowLandline,
      allowSpecial)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "invalid_korean_phone", n, total,
      Severity.Medium)) else Nil
  }
}

/** KoreanRRNValidator: structure + check digit. */
final case class KoreanRrnCheck(column: String) extends Validator {
  val name = s"korean_rrn[$column]"
  val category = "localization"
  private val k = MetricKey("rrn_invalid", column)
  private def pred: Column =
    col(column).isNotNull && !LocalFormats.koreanRrnValid(col(column))
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "invalid_korean_rrn", n, total,
      Severity.High)) else Nil
  }
}

/** Regex-structural localization checks (postal codes, business numbers,
  * Chinese ID shape). */
final case class LocalFormatCheck(column: String, format: String)
    extends Validator {
  private val pattern = format match {
    case "korean_biz"      => LocalFormats.koreanBizNo
    case "japanese_postal" => LocalFormats.japanesePostal
    case "chinese_id"      => LocalFormats.chineseId
  }
  val name = s"local_$format[$column]"
  val category = "localization"
  private val k = MetricKey("local_format_invalid", column, format)
  private def pred: Column = col(column).isNotNull && !col(column).rlike(pattern)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, s"invalid_$format", n, total, Severity.Medium))
    else Nil
  }
}
