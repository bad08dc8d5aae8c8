package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.window.WindowExec
import graft.pipeline.{Pack, Text}

/** Sequence-packing planner: the two-phase distributed prefix-sum must
  * equal the single-global-window reference layout exactly, stay
  * deterministic across partition layouts, and never plan an
  * unpartitioned window. */
class PackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "documents")

  test("pack plan equals the global-window reference layout") {
    val plan = Pack.packPlan(docs, "doc_id",
      Text.tokenCount(col("text")), seqLen = 512)
    // reference: one global window over the same (md5, id) order —
    // correct at test scale, the exact shape packPlan exists to avoid
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    val ref = docs.select(col("doc_id"),
      coalesce(Text.tokenCount(col("text")).cast("long"), lit(0L))
        .as("n_tokens"))
      .withColumn("offset", sum("n_tokens").over(w) - col("n_tokens"))
      .withColumn("seq_first", expr("offset div 512L"))
      .withColumn("seq_last",
        expr("(offset + greatest(n_tokens, 1L) - 1L) div 512L"))
      .withColumn("spans_boundary", col("seq_last") > col("seq_first"))
    assert(plan.exceptAll(ref).count() == 0 && ref.exceptAll(plan).count() == 0)
  }

  test("offsets are contiguous and start at zero") {
    val rows = Pack.packPlan(docs, "doc_id",
      Text.tokenCount(col("text")), seqLen = 2048)
      .select("offset", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(rows.head._1 == 0L)
    rows.sliding(2).foreach { case Array((o1, t1), (o2, _)) =>
      assert(o2 == o1 + t1, s"gap after offset $o1")
    case _ => ()
    }
  }

  test("layout is independent of input partitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Pack.packPlan(df, "doc_id", Text.tokenCount(col("text")), 1024,
        bucketHexChars = 2)
    val a = run(docs.repartition(17))
    val b = run(docs.coalesce(1))
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("zero-token and null-text docs occupy no tokens") {
    val d = Seq((1L, "alpha beta"), (2L, ""), (3L, null), (4L, "gamma"))
      .toDF("doc_id", "text")
    val p = Pack.packPlan(d, "doc_id", Text.tokenCount(col("text")), 4)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(p(2)._1 == 0L && p(3)._1 == 0L) // n_tokens
    assert(p.values.map(v => v._1).sum == 3L) // alpha beta + gamma
    // zero-token docs never span a boundary
    assert(p(2)._3 == p(2)._4 && p(3)._3 == p(3)._4)
  }

  test("packStats accounting is exact") {
    // 5 docs x 3 tokens, seqLen 4: 15 tokens -> 4 sequences, tail pad 1;
    // doc offsets 0,3,6,9,12 -> docs at 3 and 6 cross the 4/8 bounds etc.
    val d = (1L to 5L).map(i => (i, "a b c")).toDF("doc_id", "text")
    val stats = Pack.packStats(
      Pack.packPlan(d, "doc_id", Text.tokenCount(col("text")), 4), 4)
      .collect().head
    assert(stats.getLong(0) == 5L)      // docs
    assert(stats.getLong(1) == 15L)     // total tokens
    assert(stats.getLong(2) == 4L)      // ceil(15/4)
    assert(stats.getLong(4) == 1L)      // tail padding
    // boundary docs: a doc crosses iff its 3 tokens straddle a multiple
    // of 4 — offsets 3 (tokens 3..5) and 6 (6..8) cross; 0, 9 (9..11,
    // inside sequence 8..11) and 12 don't: 2 crossers
    assert(stats.getLong(3) == 2L)
  }

  test("writeShards: one file per shard, in-file pack order, lossless") {
    val plan = Pack.packPlan(docs, "doc_id",
      Text.tokenCount(col("text")), 512)
    val tmp = graft.ops.Exprs.scratchDir("graft_shards_spec")
    val nShards = Pack.writeShards(plan, "doc_id", 4L, tmp)
    val back = spark.read.parquet(tmp)
    // lossless: same doc set, same offsets
    assert(back.count() == plan.count())
    assert(back.join(plan.withColumnRenamed("offset", "o2"), "doc_id")
      .filter($"offset" =!= $"o2").count() == 0)
    // one physical file per shard
    val files = back.select($"shard", input_file_name().as("f"))
      .groupBy($"shard").agg(count_distinct($"f").as("nf"))
    assert(files.filter($"nf" =!= 1).count() == 0)
    assert(files.count() == nShards)
    // rows inside each file are in pack order (md5(id), id): offset,
    // which is cumulative in exactly that order, must be nondecreasing
    // in file-row order within a shard
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"shard").orderBy(monotonically_increasing_id())
    val viol = back.select($"shard", $"offset")
      .withColumn("prev", lag($"offset", 1).over(w))
      .filter($"prev".isNotNull && $"prev" > $"offset")
    assert(viol.count() == 0, "shard file rows out of pack order")
  }

  test("plan contains no unpartitioned window") {
    val plan = Pack.packPlan(docs, "doc_id",
      Text.tokenCount(col("text")), 2048)
    plan.count() // force execution so executedPlan is final
    val bad = plan.queryExecution.executedPlan.collect {
      case wx: WindowExec if wx.partitionSpec.isEmpty => wx
    }
    assert(bad.isEmpty, "global single-partition window in pack plan")
  }
}
