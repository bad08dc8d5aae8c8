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
  /** Luhn validity as a Column over a digit-string column. Pure Column-API
    * higher-order functions, so it composes over COMPUTED columns too (a
    * {C}-string template would only accept bare attribute refs). */
  def luhnValid(c: Column): Column = {
    val digitsOnly = c.rlike("^[0-9]{2,}$")
    val rev = reverse(c)
    val terms = transform(sequence(lit(0), length(c) - 1), i => {
      val d = ascii(rev.substr(i + lit(1), lit(1))) - lit(48)
      when(i % 2 === 1,
        when(d * 2 > 9, d * 2 - 9).otherwise(d * 2)).otherwise(d)
    })
    val s = aggregate(terms, lit(0), (acc, x) => acc + x)
    digitsOnly && s % 10 === 0
  }

  /** ISBN-10 validity: sum(i * d_i, i=1..10) % 11 == 0, 'X' = 10 as last. */
  def isbn10Valid(c: Column): Column = {
    val shape = c.rlike("^[0-9]{9}[0-9Xx]$")
    val terms = transform(sequence(lit(0), lit(9)), i =>
      (i + 1) * when(i === 9 && upper(c.substr(lit(10), lit(1))) === "X", lit(10))
        .otherwise(ascii(c.substr(i + lit(1), lit(1))) - lit(48)))
    val s = aggregate(terms, lit(0), (acc, x) => acc + x)
    shape && s % 11 === 0
  }

  /** IBAN mod-97: move first 4 chars to the end, letters->10..35, running
    * mod so no big-int is needed (fold keeps acc < 97). */
  def ibanValid(c: Column): Column = {
    val shape = c.rlike("^[A-Z]{2}[0-9]{2}[A-Z0-9]{10,30}$")
    val rearranged = concat(c.substr(lit(5), length(c)), c.substr(lit(1), lit(4)))
    val folded = aggregate(split(rearranged, ""), lit(0), (acc, ch) =>
      when(ch.between("0", "9"), (acc * 10 + (ascii(ch) - 48)) % 97)
        .when(ch.between("A", "Z"), (acc * 100 + (ascii(ch) - 55)) % 97)
        .otherwise(acc))
    shape && folded === 1
  }

  val swiftBic = "^[A-Z]{4}[A-Z]{2}[A-Z0-9]{2}([A-Z0-9]{3})?$"
  val euVat = "^[A-Z]{2}[A-Z0-9]{2,12}$"

  /** CreditCardValidator (reference `business_rule/financial.py`): network
    * prefix + length shape + Luhn check digit. */
  def creditCardValid(c: Column): Column = {
    val visa = c.rlike("^4[0-9]{12}([0-9]{3})?$")
    val mastercard = c.rlike("^5[1-5][0-9]{14}$")
    val amex = c.rlike("^3[47][0-9]{13}$")
    (visa || mastercard || amex) && luhnValid(c)
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
