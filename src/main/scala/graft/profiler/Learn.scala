package graft.profiler

import org.apache.spark.sql.{Column, DataFrame, SparkSession, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Learned per-column statistics baseline (reference: truthound
  * `schema.py:18-172` ColumnSchema/Schema — a YAML-persisted profile that
  * carries statistics beyond engine types).
  *
  * `learn` runs ONE wide aggregation pass over the table (reference does
  * the same: `schema.py:243-277` single collect of stat exprs); a second
  * bounded pass collects `allowedValues` for low-cardinality columns
  * (`schema.py:340-363`). At 100 TB switch `exactDistinct` off: HLL++
  * `approx_count_distinct` replaces exact distinct counting and everything
  * else stays one map-side-combinable pass. The exact mode's N per-column
  * count_distincts force Spark's Expand (input multiplied N-fold) — it is
  * the oracle-scale path only; approx mode is Expand-free. */
final case class ColumnBaseline(
    name: String, dtype: String, nullable: Boolean,
    nullCount: Long, distinctCount: Long, nullRatio: Double, uniqueRatio: Double,
    min: Option[String], max: Option[String],
    mean: Option[Double], std: Option[Double],
    q25: Option[Double], q50: Option[Double], q75: Option[Double],
    minLength: Option[Int], maxLength: Option[Int],
    allowedValues: Option[Seq[String]],
    approxStats: Boolean = false)

final case class TableBaseline(rowCount: Long, columns: Seq[ColumnBaseline]) {
  def apply(c: String): ColumnBaseline = columns.find(_.name == c).get
}

object Learn {
  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  /** One-pass learn; optional second pass for allowed values of columns
    * whose distinct count is <= lowCardinality.
    *
    * Size gate (`maxExactDistinct`): exact distinct counting and exact
    * `percentile` both hold a per-distinct-value buffer through the
    * final merge — the ONE aggregation family whose driver/merge
    * footprint grows with distinct-value count (the sf100 ladder showed
    * 1-4.3 GB single-array allocations; 10x that OOMs). Before the
    * stats pass, a cheap fused HLL probe (`approx_count_distinct`, one
    * Expand-free scan) estimates each column's cardinality; columns over
    * the budget automatically run the approx path (HLL distinct +
    * t-digest percentiles) and are flagged `approxStats = true` in the
    * baseline, which `save` records. Oracle-scale runs stay exact: the
    * gate only trips past ~8M distinct values per column. Set
    * `maxExactDistinct = 0` to disable the gate (the pre-gate behavior),
    * or `exactDistinct = false` to force approx for every column. */
  def learn(df: DataFrame, lowCardinality: Int = 20,
            exactDistinct: Boolean = true, rsd: Double = 0.02,
            maxExactDistinct: Long = 1L << 23): TableBaseline = {
    val fields = df.schema.fields
    // the probe pass: one fused HLL estimate per column (coarse rsd —
    // the gate needs an order of magnitude, not a count)
    val approxCols: Set[String] =
      if (!exactDistinct || maxExactDistinct <= 0 || fields.isEmpty) Set.empty
      else {
        val pAggs = fields.map(f =>
          approx_count_distinct(col(f.name), 0.05).as(f.name))
        val r = df.agg(pAggs.head, pAggs.tail: _*).head()
        fields.map(_.name)
          .filter(n => r.getAs[Long](n) > maxExactDistinct).toSet
      }
    def colExact(c: String): Boolean = exactDistinct && !approxCols(c)
    def distinctOf(c: String): Column =
      if (colExact(c)) count_distinct(struct(col(c)))
      else approx_count_distinct(col(c), rsd)
    // Distinct-fusion guard (same lesson as SuiteRunner
    // .collectSplitDistinct): 2+ exact DISTINCT aggregates in ONE
    // Aggregate make Spark Expand the input N-fold, and even ONE exact
    // distinct fused with the stats pass is a scale cliff — Spark plans
    // single-distinct via planAggregateWithOneDistinct, whose partial
    // stages GROUP BY the distinct column, so every other fused
    // aggregate (here: the per-column percentile/percentile_approx
    // buffers) is materialized and merged PER DISTINCT VALUE. The sf1000
    // decade probe measured learn(customer, 150M rows) at >30 min in
    // QuantileSummaries.merge under that plan vs ~12 s for the same
    // percentile as a plain single-group aggregate. So: NO exact
    // distinct is ever fused with the stats pass — each runs as its own
    // column-pruned single-aggregate job (concurrently, below). Approx
    // (HLL) columns are regular fixed-size aggregates, not DISTINCT
    // plans — all fused.
    def fuseDistinct(c: String): Boolean = !colExact(c)
    val aggs: Seq[Column] = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = f.name
      val base = Seq(count(when(col(c).isNull, 1)).as(s"${c}__nulls")) ++
        (if (fuseDistinct(c)) Seq(distinctOf(c).as(s"${c}__distinct")) else Nil)
      // the same per-column gate selects exact (sort-based, driver-heavy)
      // vs t-digest approximate percentiles. ONE array-form aggregate per
      // column: three scalar percentile(c, p) calls each build their own
      // value buffer over the whole column (3x the memory and merge work
      // for identical values — sf10's dominant learn cost);
      // percentile(c, array(...)) shares one.
      val pcts: Column =
        if (colExact(c)) expr(s"percentile($c, array(0.25, 0.5, 0.75))")
        else percentile_approx(col(c),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000))
      val numeric =
        if (isNumeric(f.dataType)) Seq(
          min(col(c)).cast("string").as(s"${c}__min"),
          max(col(c)).cast("string").as(s"${c}__max"),
          avg(col(c)).as(s"${c}__mean"),
          stddev_samp(col(c)).as(s"${c}__std"),
          pcts.getItem(0).as(s"${c}__q25"),
          pcts.getItem(1).as(s"${c}__q50"),
          pcts.getItem(2).as(s"${c}__q75"))
        else Seq(
          min(col(c).cast("string")).as(s"${c}__min"),
          max(col(c).cast("string")).as(s"${c}__max"))
      val strings = f.dataType match {
        case StringType => Seq(
          min(length(col(c))).as(s"${c}__minlen"),
          max(length(col(c))).as(s"${c}__maxlen"))
        case _ => Nil
      }
      base ++ numeric ++ strings
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    // split-off exact distincts: one column-pruned scan per column —
    // N cheap single-column jobs instead of an N-fold Expand (2+ fused)
    // or a per-distinct-value-buffered stats pass (1 fused).
    // Submitted CONCURRENTLY (same pattern as SuiteRunner's parallel
    // dedicated scans): the jobs are independent, so wall time is the
    // slowest job, not the sum of N-1 scheduler round-trips.
    val splitDistinct: Map[String, Long] =
      graft.core.Par.map(fields.filterNot(f => fuseDistinct(f.name)).toSeq) {
        f => f.name -> df.select(col(f.name))
          .agg(count_distinct(struct(col(f.name)))).head().getLong(0)
      }.toMap
    def get[T](n: String): Option[T] = {
      val i = row.fieldIndex(n)
      if (row.isNullAt(i)) None else Some(row.get(i).asInstanceOf[T])
    }
    def getD(n: String): Option[Double] =
      get[Any](n).map { case v: Number => v.doubleValue() }
    val total = row.getAs[Long]("__n")

    val prelim = fields.map { f =>
      val c = f.name
      val nulls = row.getAs[Long](s"${c}__nulls")
      val distinct = splitDistinct.getOrElse(c, row.getAs[Long](s"${c}__distinct"))
      ColumnBaseline(
        name = c, dtype = f.dataType.simpleString, nullable = nulls > 0,
        nullCount = nulls, distinctCount = distinct,
        nullRatio = if (total == 0) 0 else nulls.toDouble / total,
        uniqueRatio = if (total == 0) 0 else distinct.toDouble / total,
        min = get[String](s"${c}__min"), max = get[String](s"${c}__max"),
        mean = if (isNumeric(f.dataType)) getD(s"${c}__mean") else None,
        std = if (isNumeric(f.dataType)) getD(s"${c}__std") else None,
        q25 = if (isNumeric(f.dataType)) getD(s"${c}__q25") else None,
        q50 = if (isNumeric(f.dataType)) getD(s"${c}__q50") else None,
        q75 = if (isNumeric(f.dataType)) getD(s"${c}__q75") else None,
        minLength = if (f.dataType == StringType)
          get[Any](s"${c}__minlen").map { case v: Number => v.intValue() } else None,
        maxLength = if (f.dataType == StringType)
          get[Any](s"${c}__maxlen").map { case v: Number => v.intValue() } else None,
        allowedValues = None,
        approxStats = !colExact(c))
    }

    // pass 2: allowed values for low-cardinality columns, fused into ONE agg
    val lowCard = prelim.filter(b => b.distinctCount <= lowCardinality &&
      b.distinctCount > 0)
    val withValues: Map[String, Seq[String]] =
      if (lowCard.isEmpty) Map.empty
      else {
        val vAggs = lowCard.map(b =>
          array_sort(collect_set(col(b.name).cast("string"))).as(b.name))
        val vRow = df.agg(vAggs.head, vAggs.tail: _*).head()
        lowCard.zipWithIndex.map { case (b, i) =>
          b.name -> vRow.getSeq[String](i).toSeq
        }.toMap
      }
    TableBaseline(total,
      prelim.map(b => b.copy(allowedValues = withValues.get(b.name))).toSeq)
  }

  /** Persist / load the baseline as JSON via Spark itself (no extra deps);
    * one row per column. */
  def save(spark: SparkSession, baseline: TableBaseline, path: String): Unit = {
    import spark.implicits._
    baseline.columns.map(b => (baseline.rowCount, b.name, b.dtype, b.nullable,
      b.nullCount, b.distinctCount, b.nullRatio, b.uniqueRatio,
      b.min, b.max, b.mean, b.std, b.q25, b.q50, b.q75,
      b.minLength, b.maxLength, b.allowedValues, b.approxStats))
      .toDF("rowCount", "name", "dtype", "nullable", "nullCount",
        "distinctCount", "nullRatio", "uniqueRatio", "min", "max", "mean",
        "std", "q25", "q50", "q75", "minLength", "maxLength", "allowedValues",
        "approxStats")
      .coalesce(1).write.mode("overwrite").json(path)
  }

  def load(spark: SparkSession, path: String): TableBaseline = {
    val rows = spark.read.json(path).collect()
    def opt[T](r: Row, n: String): Option[T] = {
      val i = r.fieldIndex(n)
      if (r.isNullAt(i)) None else Some(r.get(i).asInstanceOf[T])
    }
    def optD(r: Row, n: String): Option[Double] =
      opt[Any](r, n).map { case v: Number => v.doubleValue() }
    val cols = rows.map { r =>
      ColumnBaseline(r.getAs[String]("name"), r.getAs[String]("dtype"),
        r.getAs[Boolean]("nullable"), r.getAs[Long]("nullCount"),
        r.getAs[Long]("distinctCount"), r.getAs[Double]("nullRatio"),
        r.getAs[Double]("uniqueRatio"), opt[String](r, "min"),
        opt[String](r, "max"), optD(r, "mean"), optD(r, "std"),
        optD(r, "q25"), optD(r, "q50"), optD(r, "q75"),
        optD(r, "minLength").map(_.toInt), optD(r, "maxLength").map(_.toInt),
        opt[scala.collection.Seq[String]](r, "allowedValues").map(_.toSeq),
        // absent in baselines written before the size gate -> exact
        approxStats = if (r.schema.fieldNames.contains("approxStats"))
          opt[Boolean](r, "approxStats").getOrElse(false) else false)
    }
    TableBaseline(rows.headOption.map(_.getAs[Long]("rowCount")).getOrElse(0),
      cols.toSeq)
  }
}
