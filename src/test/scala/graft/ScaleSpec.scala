package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.validators._

/** Scale-discipline assertions: the properties that must survive a 1000x
  * scale-up, checked on sf0.1 (the largest local fixture). */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("a 27-validator suite stays within the two-scan bound at sf0.1") {
    val li = graft.ops.Exprs.table(spark, "/root/testdata/sf0.1", "lineitem")
    val numeric = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val suite: Seq[Validator] =
      numeric.map(c => NullCheck(Seq(c))) ++                     // 4
      numeric.map(c => RangeCheck(c, Some(-1e9), Some(1e9))) ++  // 4
      numeric.map(c => MeanBetweenCheck(c, -1e9, 1e9)) ++        // 4
      numeric.map(c => ZScoreOutlierCheck(c, z = 6.0)) ++        // 4 (two-pass)
      Seq(
        UniqueCheck(Seq("l_orderkey", "l_linenumber")),
        SetMembershipCheck("l_returnflag", Seq("A", "N", "R")),
        SetMembershipCheck("l_linestatus", Seq("O", "F")),
        ColumnPairCheck("l_discount", "l_quantity", "<="),
        ChainComparisonCheck(Seq("l_discount", "l_tax", "l_quantity")),
        CorrelationCheck("l_quantity", "l_extendedprice"),
        RowCountCheck(min = 1),
        ColumnExistsCheck(Seq("l_orderkey")),
        FeatureScaleCheck("l_discount", maxAbs = 1.0),
        GroupedDuplicateCheck(Seq("l_returnflag"), Seq("l_orderkey", "l_linenumber")),
        CardinalityCheck("l_linestatus", "binary"))
    assert(suite.size == 27)
    val t0 = System.nanoTime()
    val r = SuiteRunner.run(li, suite,
      SuiteRunner.Config(format = ResultFormat.BooleanOnly))
    val sec = (System.nanoTime() - t0) / 1e9
    info(f"27 validators over ${r.rowCount} rows: ${r.scanCount} scans, $sec%.2f s")
    assert(r.rowCount == 600000)
    // stats pass + metric pass + TWO distinct-split jobs: the suite has
    // three DISTINCT metrics (unique key, grouped dup, cardinality);
    // fusing them would Expand the input 3x — the split keeps every job
    // Expand-free and column-pruned, so scans grow by distincts-1, not
    // scan VOLUME by distincts
    assert(r.scanCount == 4, s"scans=${r.scanCount}")
    assert(sec < 60.0)
  }

  test("imperative companion forces the distinct out of the fused pass") {
    // ONE fused distinct plans via planAggregateWithOneDistinct: partial
    // stages GROUP BY the distinct column, so imperative companions
    // (HLL/percentile buffers) would be built and merged per distinct
    // value — the sf1000 cliff. With an HLL metric in the batch, the
    // distinct must split into its own scan (2 scans, not 1) and the
    // results must be identical to the fused path's.
    val c = graft.ops.Exprs.table(spark, "/root/testdata/sf0.1", "customer")
    val r = SuiteRunner.run(c, Seq(
      UniqueCheck(Seq("c_custkey")),
      ApproxDistinctCheck("c_custkey", min = 14000, max = 16000),
      RangeCheck("c_acctbal", Some(-1e6), Some(1e6))),
      SuiteRunner.Config(format = ResultFormat.BooleanOnly))
    assert(r.scanCount == 2, s"scans=${r.scanCount}")
    assert(r.passed)
  }

  test("single-pass-only suite is exactly one scan") {
    val c = graft.ops.Exprs.table(spark, "/root/testdata/sf0.1", "customer")
    val r = SuiteRunner.run(c, Seq(
      NullCheck(Seq("c_name")), UniqueCheck(Seq("c_custkey")),
      RangeCheck("c_acctbal", Some(-1e6), Some(1e6)),
      SetMembershipCheck("c_mktsegment",
        Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"))),
      SuiteRunner.Config(format = ResultFormat.BooleanOnly))
    assert(r.scanCount == 1, s"scans=${r.scanCount}")
    assert(r.passed)
  }
}

/** Plan-shape regressions for the round-2 scale-defect fixes. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import org.apache.spark.sql.functions._

  test("q40 anti-joins do not force-broadcast the large parent") {
    val df = SparkEntry.queries("q40_fk_orphans")(spark,
      "/root/testdata/sf0.01")
    val plan = df.queryExecution.optimizedPlan.toString
    // the only explicit broadcast hints must be on nation-key parents;
    // an orders-side ResolvedHint was the r1 scale-killer
    val hints = "(?s)ResolvedHint".r.findAllIn(plan).size
    assert(hints <= 2, s"unexpected forced broadcasts:\n$plan")
    assert(!plan.matches("(?s).*ResolvedHint[^\\n]*\\n[^\\n]*o_orderkey.*"),
      "orders parent must not carry a broadcast hint")
  }

  test("DupGroups: exact parity with direct groupBy; narrow hash shuffle") {
    import spark.implicits._
    val ev = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "events")
    val key = Seq("user_id", "event_type", "props")
    val hashed = graft.ops.DupGroups.stats(ev, key).head()
    val direct = ev.groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
      .agg(count(lit(1)), coalesce(sum(col("c") - 1), lit(0L)).cast("long"))
      .head()
    assert(hashed.getLong(0) == direct.getLong(0) &&
      hashed.getLong(1) == direct.getLong(1))
    assert(hashed.getLong(0) > 0, "fixture must actually contain dup groups")
    // planted duplicate + near-miss fixture exercises the verify phase
    val fx = Seq((1L, "a", "p"), (1L, "a", "p"), (1L, "a", "q"),
      (2L, "b", "p"), (2L, "b", "p"), (2L, "b", "p"), (3L, "c", "r"))
      .toDF("user_id", "event_type", "props")
    val s = graft.ops.DupGroups.stats(fx, key).head()
    assert(s.getLong(0) == 2 && s.getLong(1) == 3)
    // empty-result path: no dup groups -> (0, 0), not (0, null)
    val none = graft.ops.DupGroups.stats(
      Seq((1L, "a", "p"), (2L, "b", "q")).toDF("user_id", "event_type",
        "props"), key).head()
    assert(none.getLong(0) == 0 && none.getLong(1) == 0)
    // plan shape: phase 1's full-table exchange partitions on the single
    // xxhash64 key (real key columns ride a shuffle only in the
    // candidate-scoped verify phase)
    val plan = graft.ops.DupGroups.stats(ev, key)
      .queryExecution.executedPlan.toString
    // (the optimizer may rewrite the __h alias to _groupingexpression)
    assert("hashpartitioning\\((__h|_groupingexpression)#\\d+L, \\d+\\)".r
        .findFirstIn(plan).nonEmpty,
      s"phase-1 shuffle must key on the single 64-bit hash:\n${plan.take(3000)}")
    assert(plan.contains("LeftSemi"),
      "verify phase must be candidate-scoped via a semi join")
  }

  test("DupGroups.statsSliced: identical totals across slice counts") {
    import spark.implicits._
    val ev = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "events")
    val key = Seq("user_id", "event_type", "props")
    val one = graft.ops.DupGroups.stats(ev, key).head()
    for (s <- Seq(2, 3, 7)) {
      val sliced = graft.ops.DupGroups.statsSliced(ev, key, s).head()
      assert(sliced.getLong(0) == one.getLong(0) &&
        sliced.getLong(1) == one.getLong(1),
        s"slices=$s diverged: $sliced vs $one")
    }
    assert(one.getLong(0) > 0, "fixture must actually contain dup groups")
    // slices=1 short-circuits to the one-pass hashed form
    val direct = graft.ops.DupGroups.statsSliced(ev, key, 1).head()
    assert(direct == one)
  }

  test("embeddingDupPairsLsh plan: no distinct, no post-join exchange") {
    val emb = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001",
      "embeddings")
    val pairs = graft.pipeline.Dedup.embeddingDupPairsLsh(
      emb, "vec_id", "embedding", 0.9, dim = 64)
    pairs.count()
    val plan = pairs.queryExecution.executedPlan.toString
    // the first-matching-band filter replaces the old distinct: the only
    // exchanges are the two join-input shuffles (plus AQE readers), so
    // nothing above the join re-shuffles the (potentially huge) pair set
    assert(!plan.contains("HashAggregate(keys=[id_a"),
      s"pair-level distinct resurfaced:\n${plan.take(3000)}")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 2, s"post-join exchange appeared ($exchanges):\n" +
      plan.take(3000))
    // the Hamming screen and exact cosine stay in the join stage
    assert(plan.contains("bit_count") && plan.contains("cosine_sim"),
      s"bit screen / native cosine missing:\n${plan.take(3000)}")
  }

  test("q74 evaluates the language argmax once per row") {
    val df = SparkEntry.queries("q74_language_id")(spark,
      "/root/testdata/sf0.001")
    val plan = df.queryExecution.optimizedPlan.toString
    // one native lang_best(...) in the projection — the r1 shape inlined
    // a greatest(struct...) argmax twice into the grouping key (score
    // test + label), and the r5 HOF form ran five boxed filter lambdas
    val n = "lang_best".r.findAllIn(plan).size
    assert(n == 1, s"argmax evaluated $n times:\n${plan.take(2000)}")
    assert(!plan.contains("greatest("),
      s"HOF argmax resurfaced:\n${plan.take(2000)}")
  }

  /** Capture every executed physical plan while `body` runs (listener
    * events are async — a short drain wait follows the body). */
  private def capturePlans(body: => Unit): Seq[String] = {
    val plans = java.util.Collections.synchronizedList(
      new java.util.ArrayList[String]())
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit = plans.add(qe.executedPlan.toString)
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try body finally {
      Thread.sleep(2000) // QueryExecutionListener posts asynchronously
      spark.listenerManager.unregister(l)
    }
    import scala.jdk.CollectionConverters._
    plans.asScala.toSeq
  }

  test("unkeyed TimeGap runs the distributed SeqScan, not a global window") {
    val ev = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "events")
    val total = ev.count()
    val plans = capturePlans {
      val issues = TimeGapCheck("ts", None, Some(60.0)).runScan(
        ev.repartition(8), total)
      assert(issues.nonEmpty) // 1000 events over 30 days: gaps > 60s exist
    }
    // the r1 regression shape was a Window with an EMPTY partition spec
    // (single task); the SeqScan path plans no Window operator at all
    assert(plans.nonEmpty)
    assert(!plans.exists(_.contains("Window")),
      s"global window leaked back into the unkeyed gap check:\n${plans.mkString("\n---\n").take(3000)}")
  }

  test("line dedup plans a partial min-agg, not a per-line window") {
    val docs = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001",
      "documents")
    val out = graft.pipeline.Dedup.dedupLinesCorpus(docs, "doc_id", "text")
    val plan = out.queryExecution.executedPlan.toString
    // first-occurrence selection must be the partial-aggregatable
    // min(struct), never a row_number window — a mega-duplicated
    // boilerplate line would hot-spot a per-key sort, while partial_min
    // reduces it map-side to one row per partition
    assert(!plan.contains("Window"),
      s"per-line window leaked into line dedup:\n${plan.take(3000)}")
    assert(plan.contains("partial_min"),
      s"first-occurrence min-agg must combine map-side:\n${plan.take(3000)}")
  }

  test("Learn exact mode plans no N-fold Expand") {
    val c = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "customer")
    val plans = capturePlans {
      val b = graft.profiler.Learn.learn(c)
      assert(b.columns.size == c.schema.size)
      assert(b("c_custkey").distinctCount == 150)
      assert(b("c_mktsegment").distinctCount == 5)
    }
    assert(plans.nonEmpty)
    // multiple exact DISTINCTs in one Aggregate plan an Expand that
    // multiplies the scan N-fold — the split path never plans one
    assert(!plans.exists(_.contains("Expand")),
      s"Expand returned to Learn's exact mode:\n${plans.filter(_.contains("Expand")).mkString.take(3000)}")
  }

  test("dupClusters >2^20 edges takes the DISTRIBUTED branch, exact labels") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // Every oracle fixture fits the <=2^20-edge driver union-find, so the
    // pointer-jumping path had only property-scale coverage. This graph
    // exceeds the limit BY CONSTRUCTION: 800k ids in 4-cliques-by-chain
    // (600k edges) plus a 2000-node chain (diameter ~2000 — the regime
    // the pointer-jumping term exists for). Symmetric-distinct edge count
    // = 2 * 602k = 1.204M > 2^20, so the driver fast path cannot engage.
    val blocks = spark.range(800000L).filter(col("id") % 4 < 3)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val chain = spark.range(1000000L, 1001999L)
      .select(col("id").as("id_a"), (col("id") + 1).as("id_b"))
    val pairs = blocks.unionAll(chain)
    assert(pairs.count() * 2 > (1L << 20))
    val labels = graft.pipeline.Dedup.dupClusters(pairs)
    // ... and the contraction path reports its (single-digit-per-log₂-
    // diameter) round count: 2000-node chain diameter halves per
    // alternation, so rounds ∈ [1, maxIter), captured before the small
    // run below overwrites the thread-local.
    val bigRounds = graft.pipeline.Dedup.lastContractionRounds
    assert(bigRounds >= 1 && bigRounds < 25, s"rounds=$bigRounds")
    // branch assertion, not just the answer: the driver path materializes
    // a LocalRelation (driver union-find -> toDF); the distributed path
    // ends in a localCheckpoint -> LogicalRDD. Prove the discriminator on
    // a small graph first.
    val small = graft.pipeline.Dedup.dupClusters(
      Seq((1L, 2L)).toDF("id_a", "id_b"))
    assert(small.queryExecution.optimizedPlan.toString.contains("LocalRelation"))
    // convergence diagnostics: the driver fast path reports 0 rounds ...
    assert(graft.pipeline.Dedup.lastContractionRounds == 0)
    val plan = labels.queryExecution.optimizedPlan.toString
    assert(plan.contains("LogicalRDD") && !plan.contains("LocalRelation"),
      s"expected distributed branch (checkpointed LogicalRDD), got:\n$plan")
    // exact-labels oracle: block member id -> id - id%4; chain -> 1000000
    val expected = spark.range(800000L)
      .select(col("id"), (col("id") - col("id") % 4).as("exp"))
      .unionAll(spark.range(1000000L, 1002000L)
        .select(col("id"), lit(1000000L).as("exp")))
    val joined = labels.join(expected, Seq("id"), "full")
    assert(joined.filter(col("cluster").isNull || col("exp").isNull ||
      col("cluster") =!= col("exp")).count() == 0)
    assert(labels.count() == 802000L)
  }
}
