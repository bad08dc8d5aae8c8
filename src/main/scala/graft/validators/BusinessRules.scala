package graft.validators

import graft.core._
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Business-rule validators (reference: truthound `validators/business_rule/`,
  * 7 classes — checksum.py: Luhn/ISBN/CreditCard; financial.py: IBAN/VAT/
  * SWIFT). Checksum digit-math is expressed with Catalyst higher-order
  * functions (transform/aggregate over char arrays) — fully codegen-able,
  * no UDFs, so the checks fuse into the single validation scan. */
object Checksums {
  /** Luhn validity as a Column over a digit-string column. */
  def luhnValid(c: Column): Column = {
    val digitsOnly = c.rlike("^[0-9]{2,}$")
    val sumExpr =
      "aggregate(transform(sequence(0, length({C}) - 1), i -> " +
        "CASE WHEN i % 2 = 1 THEN " +
        "  IF((ascii(substr(reverse({C}), i + 1, 1)) - 48) * 2 > 9, " +
        "     (ascii(substr(reverse({C}), i + 1, 1)) - 48) * 2 - 9, " +
        "     (ascii(substr(reverse({C}), i + 1, 1)) - 48) * 2) " +
        "ELSE ascii(substr(reverse({C}), i + 1, 1)) - 48 END), 0, " +
        "(acc, x) -> acc + x) % 10 = 0"
    digitsOnly && exprOn(sumExpr, c)
  }

  /** ISBN-10 validity: sum(i * d_i, i=1..10) % 11 == 0, 'X' = 10 as last. */
  def isbn10Valid(c: Column): Column = {
    val shape = c.rlike("^[0-9]{9}[0-9Xx]$")
    val sumExpr =
      "aggregate(transform(sequence(0, 9), i -> " +
        "(i + 1) * (CASE WHEN i = 9 AND upper(substr({C}, 10, 1)) = 'X' THEN 10 " +
        "ELSE ascii(substr({C}, i + 1, 1)) - 48 END)), 0, " +
        "(acc, x) -> acc + x) % 11 = 0"
    shape && exprOn(sumExpr, c)
  }

  /** IBAN mod-97: move first 4 chars to the end, letters->10..35, running
    * mod so no big-int is needed (fold keeps acc < 97). */
  def ibanValid(c: Column): Column = {
    val shape = c.rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}$")
    val rearranged = "concat(substr({C}, 5), substr({C}, 1, 4))"
    val foldExpr =
      s"aggregate(split($rearranged, ''), 0, (acc, ch) -> " +
        "CASE WHEN ch BETWEEN '0' AND '9' THEN (acc * 10 + (ascii(ch) - 48)) % 97 " +
        "WHEN ch BETWEEN 'A' AND 'Z' THEN (acc * 100 + (ascii(ch) - 55)) % 97 " +
        "ELSE acc END) = 1"
    shape && exprOn(foldExpr, c)
  }

  val swiftBic = "^[A-Z]{4}[A-Z]{2}[A-Z0-9]{2}([A-Z0-9]{3})?$"
  val euVat = "^[A-Z]{2}[A-Z0-9]{2,12}$"

  /** Substitute the column's SQL into a {C}-templated expression.
    * Column must be a simple name (validator columns always are). */
  private def exprOn(template: String, c: Column): Column = {
    val sql = c.toString
    require(sql.matches("[A-Za-z0-9_.`]+"), s"expected simple column ref: $sql")
    expr(template.replace("{C}", sql))
  }
}

/** LuhnValidator / CreditCardValidator: non-null values must pass Luhn. */
final case class LuhnCheck(column: String) extends Validator {
  val name = s"luhn[$column]"
  val category = "business_rule"
  private val k = MetricKey("luhn_invalid", column)
  private def pred: Column =
    col(column).isNotNull && !Checksums.luhnValid(col(column))
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "luhn_invalid", n, total, Severity.Medium))
    else Nil
  }
  override def failPredicate(schema: StructType, stats: Metrics) = Some(pred)
}

/** ISBNValidator (ISBN-10). */
final case class IsbnCheck(column: String) extends Validator {
  val name = s"isbn[$column]"
  val category = "business_rule"
  private val k = MetricKey("isbn_invalid", column)
  private def pred: Column =
    col(column).isNotNull && !Checksums.isbn10Valid(col(column))
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "isbn_invalid", n, total, Severity.Medium))
    else Nil
  }
}

/** IBANValidator: structure + mod-97 checksum. */
final case class IbanCheck(column: String) extends Validator {
  val name = s"iban[$column]"
  val category = "business_rule"
  private val k = MetricKey("iban_invalid", column)
  private def pred: Column =
    col(column).isNotNull && !Checksums.ibanValid(col(column))
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "iban_invalid", n, total, Severity.Medium))
    else Nil
  }
}

/** SWIFTValidator / VATValidator: structural regexes. */
final case class SwiftCheck(column: String) extends Validator {
  val name = s"swift[$column]"
  val category = "business_rule"
  private val k = MetricKey("swift_invalid", column)
  private def pred: Column =
    col(column).isNotNull && !col(column).rlike(Checksums.swiftBic)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(k -> count(when(pred, 1)))
  def evaluate(m: Metrics, total: Long) = {
    val n = m.long(k)
    if (n > 0) Seq(issue(column, "swift_invalid", n, total, Severity.Medium))
    else Nil
  }
}
