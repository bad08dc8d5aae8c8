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

  /** CSV with header + schema inference and a MULTI-value null token list. */
  def csv(spark: SparkSession, path: String,
          nullValues: Seq[String] = Seq("", "NULL"),
          delimiter: String = ",", header: Boolean = true): DataFrame = {
    val raw = spark.read
      .option("header", header.toString)
      .option("inferSchema", "true")
      .option("sep", delimiter)
      // first token handled natively (covers typed columns pre-inference)
      .option("nullValue", nullValues.headOption.getOrElse(""))
      .csv(path)
    val extra = nullValues.drop(1)
    if (extra.isEmpty) raw
    else raw.select(raw.schema.fields.map { f =>
      if (f.dataType == StringType)
        when(col(f.name).isin(extra: _*), lit(null)).otherwise(col(f.name))
          .as(f.name)
      else col(f.name)
    }.toIndexedSeq: _*)
  }

  /** Newline-delimited JSON (Spark's native json format). */
  def ndjson(spark: SparkSession, path: String): DataFrame =
    spark.read.json(path)

  /** A single JSON document or array of documents. */
  def json(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", "true").json(path)
}
