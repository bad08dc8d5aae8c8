package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** File-source loaders mirroring the reference's ingestion semantics
  * (truthound loads CSV with a null_values LIST — e.g. ["", "NULL"] in
  * `benchmarks/workloads/local-mixed-core-suite.json:10-13` — plus
  * parquet/JSON/NDJSON fixtures, `tests/e2e/fixtures.py:64-70`).
  *
  * Spark's csv reader takes a single nullValue; the multi-token contract
  * is applied as a post-scan projection over string columns — codegen'd
  * whens, no UDF, fused into the scan stage. */
object Readers {

  /** CSV with header and a MULTI-value null token list, with type
    * inference applied AFTER null-token removal. Spark's own inferSchema
    * only knows one nullValue token, so a numeric column containing a
    * secondary token (e.g. "NULL") would silently degrade to string; here
    * the file is read untyped, tokens are nulled, and each column is
    * promoted to the narrowest type that try_casts cleanly (bigint →
    * double → timestamp → string) in ONE inference aggregation. */
  /** @param inferRows when set, the type-inference aggregation reads only
    *   the first N rows instead of the whole file — the reference infers
    *   from bounded reads too, and at 100 TB of CSV an exact inference
    *   pass doubles ingestion cost. Values outside the sampled prefix that
    *   fail the inferred cast become NULL (standard bounded-inference
    *   semantics, same as Spark's samplingRatio). Default None = exact. */
  def csv(spark: SparkSession, path: String,
          nullValues: Seq[String] = Seq("", "NULL"),
          delimiter: String = ",", header: Boolean = true,
          inferRows: Option[Int] = None): DataFrame = {
    val raw = spark.read
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("nullValue", nullValues.headOption.getOrElse(""))
      .csv(path)
    val extra = nullValues.drop(1)
    val cleaned = if (extra.isEmpty) raw
    else raw.select(raw.schema.fields.map { f =>
      when(col(f.name).isin(extra: _*), lit(null)).otherwise(col(f.name))
        .as(f.name)
    }.toIndexedSeq: _*)
    inferTypes(cleaned, inferRows)
  }

  /** Promote string columns to the narrowest type every non-null value
    * try_casts to — one fused aggregation over all columns (bounded to a
    * row prefix when `inferRows` is set). */
  private def inferTypes(df: DataFrame, inferRows: Option[Int]): DataFrame = {
    val cols = df.columns.toSeq
    if (cols.isEmpty) return df
    def fails(c: String, t: String): org.apache.spark.sql.Column =
      count(when(col(c).isNotNull &&
        expr(s"try_cast(`$c` AS $t)").isNull, 1))
    val aggs = cols.flatMap(c => Seq(
      count(col(c)).as(s"${c}__n"),
      fails(c, "BIGINT").as(s"${c}__nl"),
      fails(c, "DOUBLE").as(s"${c}__nd"),
      fails(c, "TIMESTAMP").as(s"${c}__nt")))
    val inferSrc = inferRows.map(df.limit).getOrElse(df)
    val row = inferSrc.agg(aggs.head, aggs.tail: _*).head()
    df.select(cols.map { c =>
      val n = row.getAs[Long](s"${c}__n")
      val t =
        if (n == 0) "string" // all-null column stays string
        else if (row.getAs[Long](s"${c}__nl") == 0) "bigint"
        else if (row.getAs[Long](s"${c}__nd") == 0) "double"
        else if (row.getAs[Long](s"${c}__nt") == 0) "timestamp"
        else "string"
      // try_cast, not cast: under bounded inference a value outside the
      // sampled prefix may not conform (and ANSI mode would throw on it)
      expr(s"try_cast(`$c` AS $t)").as(c)
    }.toIndexedSeq: _*)
  }

  /** Newline-delimited JSON (Spark's native json format). */
  def ndjson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** A single JSON document or array of documents. */
  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)

  /** ORC via Spark's native columnar reader — same pushdown/pruning
    * contract as parquet (PushedFilters + ReadSchema reach the scan).
    * Beyond the reference's format registry (truthound
    * `datasources/factory.py:70-74` stops at csv/json/parquet/ndjson);
    * included because ORC is the other columnar interchange format a
    * warehouse-scale corpus actually arrives in. */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Raw text: one row per line in a `value` string column — the entry
    * point for web-crawl-style corpora that arrive as flat text files
    * rather than columnar tables. `wholeFile = true` yields one row per
    * FILE instead (document-per-file corpora); at scale prefer
    * line-per-row, which splits on block boundaries and parallelises
    * across executors, over whole-file rows which cannot split. */
  def textLines(spark: SparkSession, path: String,
                wholeFile: Boolean = false): DataFrame =
    spark.read.option("wholetext", wholeFile.toString).text(path)
}
