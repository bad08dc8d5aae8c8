package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Canary for the physical schema of the driver-generated fixtures the
  * engine depends on. The round-7/8 postmortem: the driver silently
  * re-encoded events.ts from timestamp[ns] (read as LongType under
  * nanosAsLong) to timestamp[us] (read as TIMESTAMP_NTZ) and six queries
  * broke with no single named test pointing at the cause. This spec makes
  * the NEXT silent fixture re-encode fail here, by name, instead.
  *
  * Two layers of assertion:
  *   1. the RAW type of each depended-on column is one of the encodings
  *      the loader shim knows how to normalize (a new fourth encoding
  *      must come with a new Exprs.normalizeTs branch — this test is the
  *      reminder);
  *   2. the POST-SHIM contract every query compiles against: events.ts is
  *      session-tz TimestampType after Exprs.table, always.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def rawType(tbl: String, col: String): DataType =
    spark.read.parquet(s"$sf/$tbl.parquet").schema(col).dataType

  test("events.ts physical encoding is one the loader shim handles") {
    val t = rawType("events", "ts")
    assert(
      t == LongType || t == TimestampNTZType || t == TimestampType,
      s"events.ts arrived as $t — a fixture encoding Exprs.normalizeTs has " +
        "no branch for; add one (and keep the old branches for old fixtures)")
  }

  test("events.ts is TimestampType after the loader, at every sf on disk") {
    for (dir <- Seq("sf0.001", "sf0.01", "sf0.1")
         if new java.io.File(s"/root/testdata/$dir/events.parquet").exists()) {
      val loaded = graft.ops.Exprs.table(spark, s"/root/testdata/$dir", "events")
      assert(loaded.schema("ts").dataType == TimestampType,
        s"$dir events.ts not normalized to TimestampType")
      // unix_micros is the operation that broke in r7 — prove it analyzes
      // and returns sane epochs (fixture dates are in 2023-2025).
      val us = loaded.agg(org.apache.spark.sql.functions
        .unix_micros(org.apache.spark.sql.functions.max(loaded("ts"))))
        .head().getLong(0)
      assert(us > 1600000000000000L && us < 1900000000000000L,
        s"$dir max(unix_micros(ts)) = $us outside plausible epoch range")
    }
  }

  test("embeddings.embedding is array<float>") {
    assert(rawType("embeddings", "embedding") == ArrayType(FloatType, true) ||
      rawType("embeddings", "embedding") == ArrayType(FloatType, false))
  }

  test("documents text columns keep their contract") {
    assert(rawType("documents", "text") == StringType)
    assert(Seq(LongType, IntegerType).contains(rawType("documents", "doc_id")))
  }

  test("lineitem core numeric/date columns keep their contract") {
    assert(rawType("lineitem", "l_quantity").isInstanceOf[NumericType])
    // Current fixtures encode shipdate as timestamp[us] no-tz; date-typed
    // or string-typed re-encodes are also fine (queries cast/compare
    // through date semantics either way). Anything else is a new contract.
    val ship = rawType("lineitem", "l_shipdate")
    assert(ship == DateType || ship == StringType || ship == TimestampType ||
      ship == TimestampNTZType, s"l_shipdate arrived as $ship")
  }
}
