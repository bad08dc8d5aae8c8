package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Distributed adjacent-pair scan for order-dependent checks (monotonic
  * sequences, timestamp gaps) when there is NO series key to partition by.
  *
  * A `Window.partitionBy()` (empty) global window collapses the whole
  * table into ONE task — correct at sf0.1, a scale-killer at 100 TB
  * (reference analog: truthound `validators/timeseries/gap.py` sorts the
  * whole frame in one process, which is its single-node contract; ours
  * must distribute). This helper keeps the check fully distributed with
  * ONE shuffle:
  *
  *   1. project (ord, value) as doubles, range-partition by ord
  *   2. sort within partitions, scan each partition linearly
  *      (per-partition adjacent pairs) emitting a tiny summary
  *   3. fix up the P−1 cross-partition boundary pairs on the driver
  *      from the P summaries (range partitions are emitted in key order)
  *
  * Restriction: ord and value must be castable to double (numeric / date /
  * timestamp). Callers with non-numeric values keep a keyed window.
  */
object SeqScan {

  /** Per-partition scan summary: row count, in-partition violations, and
    * the boundary (first/last) pairs for the driver-side fixup. */
  final case class PartSummary(n: Long, viol: Long,
      firstO: Option[Double], firstV: Option[Double],
      lastO: Option[Double], lastV: Option[Double])

  /** Count adjacent-pair violations over the ord-sorted stream of
    * (ord, value) rows. `viol(prevOrd, prevVal, curOrd, curVal)` must be a
    * pure serializable function; `None` encodes SQL NULL (predicates
    * should skip pairs with relevant NULLs, matching lag-window
    * semantics where NULL comparisons never count as violations). */
  def adjacentViolations(df: DataFrame, ord: Column, value: Column,
      viol: (Option[Double], Option[Double], Option[Double], Option[Double]) => Boolean)
      : Long = {
    val proj = df.select(ord.cast("double").as("o"), value.cast("double").as("v"))
      .repartitionByRange(col("o"))        // nulls-first, ranges in pid order
      .sortWithinPartitions(col("o"))
    val summaries = proj
      .map { r =>
        (if (r.isNullAt(0)) None else Some(r.getDouble(0)),
         if (r.isNullAt(1)) None else Some(r.getDouble(1)))
      }(Encoders.product[(Option[Double], Option[Double])])
      .mapPartitions { it =>
        var n = 0L; var v = 0L
        var first: (Option[Double], Option[Double]) = null
        var prev: (Option[Double], Option[Double]) = null
        while (it.hasNext) {
          val cur = it.next()
          if (first == null) first = cur
          else if (viol(prev._1, prev._2, cur._1, cur._2)) v += 1
          prev = cur
          n += 1
        }
        if (n == 0) Iterator.empty
        else Iterator.single(PartSummary(n, v,
          first._1, first._2, prev._1, prev._2))
      }(Encoders.product[PartSummary])
      .collect()                            // preserves partition order
    val inPart = summaries.iterator.map(_.viol).sum
    val boundary = summaries.iterator.sliding(2).withPartial(false).count {
      case Seq(a, b) => viol(a.lastO, a.lastV, b.firstO, b.firstV)
      case _ => false
    }
    inPart + boundary
  }

  /** Long-typed summary for the exact integral path. */
  final case class PartSummaryL(n: Long, viol: Long,
      firstO: Option[Long], firstV: Option[Long],
      lastO: Option[Long], lastV: Option[Long])

  /** Exact variant for integral (ord, value) columns: bigint ids beyond
    * 2^53 lose distinctness under a double cast (ulp at 1e18 is ~256), so
    * snowflake-style keys MUST take this path — same algorithm, Long
    * projection, no precision loss. Keep in sync with
    * [[adjacentViolations]]. */
  def adjacentViolationsLong(df: DataFrame, ord: Column, value: Column,
      viol: (Option[Long], Option[Long], Option[Long], Option[Long]) => Boolean)
      : Long = {
    val proj = df.select(ord.cast("long").as("o"), value.cast("long").as("v"))
      .repartitionByRange(col("o"))
      .sortWithinPartitions(col("o"))
    val summaries = proj
      .map { r =>
        (if (r.isNullAt(0)) None else Some(r.getLong(0)),
         if (r.isNullAt(1)) None else Some(r.getLong(1)))
      }(Encoders.product[(Option[Long], Option[Long])])
      .mapPartitions { it =>
        var n = 0L; var v = 0L
        var first: (Option[Long], Option[Long]) = null
        var prev: (Option[Long], Option[Long]) = null
        while (it.hasNext) {
          val cur = it.next()
          if (first == null) first = cur
          else if (viol(prev._1, prev._2, cur._1, cur._2)) v += 1
          prev = cur
          n += 1
        }
        if (n == 0) Iterator.empty
        else Iterator.single(PartSummaryL(n, v,
          first._1, first._2, prev._1, prev._2))
      }(Encoders.product[PartSummaryL])
      .collect()
    val inPart = summaries.iterator.map(_.viol).sum
    val boundary = summaries.iterator.sliding(2).withPartial(false).count {
      case Seq(a, b) => viol(a.lastO, a.lastV, b.firstO, b.firstV)
      case _ => false
    }
    inPart + boundary
  }

  /** True when casting to double is ORDER- and VALUE-exact: floats,
    * doubles, dates, timestamps, and sub-long integrals (int fits a
    * double exactly). LongType and DecimalType do NOT qualify — route
    * integrals to [[adjacentViolationsLong]] instead. */
  def doubleExact(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case FloatType | DoubleType | DateType | TimestampType |
           TimestampNTZType | IntegerType | ShortType | ByteType => true
      case _ => false
    }
  }

  /** Integral types that cast to long exactly. */
  def longExact(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType | DateType => true
      case _ => false
    }
  }

  /** Retained name from r02-early: now means "handled by SOME distributed
    * path" (double-exact or long-exact). */
  def doubleOrderable(dt: org.apache.spark.sql.types.DataType): Boolean =
    doubleExact(dt) || longExact(dt)
}
