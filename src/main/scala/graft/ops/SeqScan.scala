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

  /** True when the column type can round-trip through double for ordering
    * purposes (numerics, dates, timestamps). */
  def doubleOrderable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType | DateType | TimestampType | TimestampNTZType => true
      case _ => false
    }
  }
}
