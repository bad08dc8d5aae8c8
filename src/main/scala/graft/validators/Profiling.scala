package graft.validators

import graft.core._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Profiling validators (reference: truthound `validators/profiling/`,
  * 8 classes — cardinality.py, entropy.py, frequency.py). Entropy and
  * frequency need a groupBy(column) — a dedicated scan whose shuffle is
  * O(distinct values) thanks to map-side partial aggregation. */

/** CardinalityValidator: distinct count category (constant / binary / low /
  * high / unique) must match expectation. Fused via count_distinct. */
final case class CardinalityCheck(column: String, expected: String)
    extends Validator {
  require(Set("constant", "binary", "low", "high", "unique").contains(expected))
  val name = s"cardinality[$column]"
  val category = "profiling"
  private val dk = MetricKey("distinct_count", column)
  def metricExprs(schema: StructType, stats: Metrics) =
    Seq(dk -> count_distinct(struct(col(column))))
  private def classify(d: Long, total: Long): String =
    if (d <= 1) "constant"
    else if (d == 2) "binary"
    else if (total > 0 && d.toDouble / total >= 0.99) "unique"
    else if (d <= 20) "low"
    else "high"
  def evaluate(m: Metrics, total: Long) = {
    val actual = classify(m.long(dk), total)
    if (actual != expected)
      Seq(issue(column, "cardinality_mismatch", m.long(dk), total,
        Severity.Low, expected = expected, actual = actual))
    else Nil
  }
}

/** EntropyValidator: Shannon entropy (nats) of a categorical column within
  * bounds. Dedicated groupBy scan; entropy finished as one more tiny agg. */
final case class EntropyCheck(column: String, lo: Double, hi: Double)
    extends Validator with DedicatedScan {
  val name = s"entropy[$column]"
  val category = "profiling"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val h = df.groupBy(col(column)).agg(count(lit(1)).as("cnt"))
      .agg(graft.ops.Exprs.entropyFromCounts("cnt").as("h"))
      .head().getDouble(0)
    if (h < lo || h > hi)
      Seq(issue(column, "entropy_out_of_bounds", 1, total, Severity.Low,
        expected = s"[$lo,$hi]", actual = f"$h%.6f"))
    else Nil
  }
}

/** ValueFrequencyValidator: no single value may exceed maxRatio of rows
  * (degenerate-distribution smell). Dedicated top-1 groupBy scan. */
final case class ValueFrequencyCheck(column: String, maxRatio: Double)
    extends Validator with DedicatedScan {
  val name = s"value_frequency[$column]"
  val category = "profiling"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: DataFrame, total: Long): Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val top = df.groupBy(col(column)).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt")).limit(1).collect()
    top.headOption match {
      case Some(r) if total > 0 && r.getLong(1).toDouble / total > maxRatio =>
        Seq(issue(column, "dominant_value", r.getLong(1), total, Severity.Medium,
          expected = s"top ratio<=$maxRatio",
          actual = f"${String.valueOf(r.get(0))} @ ${r.getLong(1).toDouble / total}%.4f"))
      case _ => Nil
    }
  }
}

/** DistributionShapeValidator: skewness/kurtosis within bounds.
  * Computed from central moments (population form) so a SQL oracle can
  * restate it engine-independently. Two-pass. */
final case class ShapeCheck(column: String, maxAbsSkew: Double = Double.MaxValue,
    maxKurtosis: Double = Double.MaxValue) extends Validator {
  val name = s"shape[$column]"
  val category = "profiling"
  private val mk = MetricKey("mean", column)
  private val sk = MetricKey("stddev_pop", column)
  private val m3 = MetricKey("m3", column)
  private val m4 = MetricKey("m4", column)
  override def statsExprs(schema: StructType) =
    Seq(mk -> avg(col(column)), sk -> stddev_pop(col(column)))
  def metricExprs(schema: StructType, stats: Metrics) = {
    val mu = stats.double(mk).getOrElse(0.0)
    val sd = stats.double(sk).getOrElse(0.0)
    if (sd == 0.0) Nil
    else Seq(
      m3 -> avg(pow(col(column) - mu, 3) / math.pow(sd, 3)),
      m4 -> avg(pow(col(column) - mu, 4) / math.pow(sd, 4)))
  }
  def evaluate(m: Metrics, total: Long) = {
    val skew = m.double(m3).getOrElse(0.0)
    val kurt = m.double(m4).getOrElse(0.0)
    (if (math.abs(skew) > maxAbsSkew)
      Seq(issue(column, "excess_skew", 1, total, Severity.Low,
        expected = s"|skew|<=$maxAbsSkew", actual = f"$skew%.6f")) else Nil) ++
    (if (kurt > maxKurtosis)
      Seq(issue(column, "excess_kurtosis", 1, total, Severity.Low,
        expected = s"kurtosis<=$maxKurtosis", actual = f"$kurt%.6f")) else Nil)
  }
}

/** Top-K frequency profile as a reusable operator (profiler building block):
  * returns (value, cnt) for the k most frequent values. */
object TopK {
  def apply(df: DataFrame, column: String, k: Int): DataFrame =
    df.groupBy(col(column)).agg(count(lit(1)).as("cnt"))
      .orderBy(desc("cnt"), col(column).asc_nulls_last).limit(k)
}

/** InformationGainValidator (reference `profiling/entropy.py:205`):
  * IG = H(target) − H(target|feature) in bits.
  *
  * Scale shape: ONE groupBy(feature, target) count — shuffle is
  * O(|feature| × |target| cardinality product); the entropies then reduce
  * from the (tiny) joint-count relation with two more aggregations. No
  * row-level collect anywhere. */
object InfoGain {
  import org.apache.spark.sql.DataFrame

  /** One-row DataFrame (ig, h_target, h_t_given_f) in bits. */
  def informationGain(df: DataFrame, feature: String, target: String)
      : DataFrame = {
    val joint = df.groupBy(col(feature).as("__f"), col(target).as("__t"))
      .agg(count(lit(1)).cast("double").as("__c"))
    val total = joint.agg(sum(col("__c")).as("__n"))
    val byT = joint.groupBy(col("__t")).agg(sum(col("__c")).as("__ct"))
    val byF = joint.groupBy(col("__f")).agg(sum(col("__c")).as("__cf"))
    val ht = byT.crossJoin(total).agg(
      (-sum((col("__ct") / col("__n")) * log(2.0, col("__ct") / col("__n"))))
        .as("h_target"))
    // null-safe join: a NULL feature value is a legitimate group — a
    // plain equi-join would drop it from H(target|feature) while H(target)
    // and n still include it, inflating IG beyond H(target)
    val htf = joint.join(byF, joint("__f") <=> byF("__f")).crossJoin(total)
      .agg(
        (-sum((col("__c") / col("__n")) * log(2.0, col("__c") / col("__cf"))))
          .as("h_t_given_f"))
    ht.crossJoin(htf).select(
      (col("h_target") - col("h_t_given_f")).as("ig"),
      col("h_target"), col("h_t_given_f"))
  }
}

/** InformationGainCheck: IG(feature -> target) within [minIg, maxIg]. */
final case class InformationGainCheck(feature: String, target: String,
    minIg: Double = 0.0, maxIg: Double = Double.MaxValue)
    extends Validator with DedicatedScan {
  val name = s"information_gain[$feature->$target]"
  val category = "profiling"
  def metricExprs(schema: StructType, stats: Metrics) = Nil
  def evaluate(m: Metrics, total: Long) = Nil
  def runScan(df: org.apache.spark.sql.DataFrame, total: Long)
      : Seq[ValidationIssue] = {
    if (total == 0) return Nil
    val ig = InfoGain.informationGain(df, feature, target)
      .head().getDouble(0)
    if (ig < minIg || ig > maxIg)
      Seq(issue(feature, "information_gain_out_of_bounds", 1, total,
        Severity.Medium, expected = s"[$minIg,$maxIg]", actual = f"$ig%.6f"))
    else Nil
  }
}
