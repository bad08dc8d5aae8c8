package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.validators.Hierarchy

/** Round-3 regressions: pointer-doubled hierarchy semantics, bench
  * short-key invariants, OCSVM registry surface. */
class Round3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bench short keys (qNNN prefixes) are unique across all queries") {
    // Bench prints the per-query map under each query's prefix before the
    // first underscore so the line fits the driver's ~2KB stdout capture;
    // a collision would silently drop a timing
    val keys = SparkEntry.queries.keys.toSeq
    val short = keys.map(_.takeWhile(_ != '_'))
    assert(short.distinct.size == keys.size,
      s"colliding prefixes: ${short.diff(short.distinct).distinct}")
    // and the compact line stays inside the 2000-char capture window:
    // Bench renders at 2 decimals and adaptively falls back to 1 then 0
    // decimals when the line would brush the budget, so the invariant to
    // pin is the LAST fallback form (worst-case "999" whole-second
    // values) with wrapper overhead (metric/value/unit/failed/contention
    // + the r11 calib stamps + sf/detail ≈ 190 chars; 200 for margin)
    val line = short.sorted.map(k => "\"" + k + "\":999").mkString(",")
    assert(line.length + 200 < 1900, s"compact line too long: ${line.length}")
  }

  test("pointer-doubled depths matches explicit BFS on a deep chain") {
    // single chain 1 <- 2 <- ... <- 60: depth(i) = i, well past one
    // doubling round, so composition must accumulate dist exactly
    val chain = (1L to 60L).map(i =>
      (i, if (i == 1) None else Some(i - 1))).toDF("id", "parent")
    val got = Hierarchy.depths(chain, "id", "parent", 64)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(got.length == 60)
    assert(got.forall { case (id, d) => d == id.toInt })
  }

  test("depths caps at maxDepth and excludes deeper nodes") {
    val chain = (1L to 30L).map(i =>
      (i, if (i == 1) None else Some(i - 1))).toDF("id", "parent")
    val got = Hierarchy.depths(chain, "id", "parent", 10)
      .orderBy("id").collect().map(_.getLong(0))
    assert(got.toSeq == (1L to 10L))
  }

  test("depthHistogram buckets cycles and dangling chains as -1") {
    // forest: root 1 with children 2,3; cycle 10<->11 with hanger-on 12;
    // dangling 20 -> missing 99
    val edges = Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(1L)),
      (10L, Some(11L)), (11L, Some(10L)), (12L, Some(10L)),
      (20L, Some(99L))).toDF("id", "parent")
    val hist = Hierarchy.depthHistogram(edges, "id", "parent", 16)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(hist == Map(1 -> 1L, 2 -> 2L, -1 -> 4L))
  }

  test("depthHistogram matches q106's planted-cycle construction") {
    // mirror of the q106 shape at small scale: binary tree over 1..511,
    // roots 0/1, planted cycle 100-109 (their subtrees become unreachable)
    val nodes = (0L to 511L).map { k =>
      val parent =
        if (k <= 1) None
        else if (k >= 100 && k <= 109) Some(100L + ((k - 99) % 10))
        else Some(k / 2)
      (k, parent)
    }.toDF("id", "parent")
    val hist = Hierarchy.depthHistogram(nodes, "id", "parent", 20)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // every node is either reached at a positive depth or in the -1 bucket
    assert(hist.values.sum == 512L)
    assert(hist(-1) > 0) // the cycle + its subtrees
    assert(hist(1) == 2L) // roots 0 and 1
    // reachable depths are contiguous from 1
    val depths = hist.keys.filter(_ > 0).toSeq.sorted
    assert(depths == (1 to depths.max))
  }

  test("expression-family checks count violations and honor mostly") {
    import graft.validators._
    val df = Seq(
      ("shipped", Some("T1"), 10.0), ("shipped", None, 20.0),
      ("pending", None, 30.0), ("shipped", Some("T2"), -5.0))
      .toDF("status", "tracking", "amount")
    val r = graft.core.SuiteRunner.run(df, Seq(
      CustomExpressionCheck(col("amount") > 0, "amount>0"),
      ConditionalExpressionCheck(col("status") === "shipped",
        col("tracking").isNotNull, "shipped has tracking"),
      MultiConditionCheck(Seq(
        (col("amount") > 0) -> "amt", col("status").isNotNull -> "st"), "and"),
      RowLevelCheck(Seq("amount"),
        row => !row.isNullAt(0) && row.getDouble(0) < 25.0, "amount<25")),
      graft.core.SuiteRunner.Config(datasetName = "t"))
    val by = r.checks.map(c => c.validator -> c).toMap
    assert(by("custom_expression[amount>0]").issues.head.count == 1)
    assert(by("conditional_expression[shipped has tracking]").issues.head.count == 1)
    assert(by("multi_condition[amt, st]").issues.head.count == 1)
    assert(by("row_level[amount<25]").issues.head.count == 1)
    // mostly: 1 failure in 4 rows passes at mostly=0.7
    val lenient = graft.core.SuiteRunner.run(df, Seq(
      CustomExpressionCheck(col("amount") > 0, "amount>0", mostly = 0.7)),
      graft.core.SuiteRunner.Config(datasetName = "t"))
    assert(lenient.checks.head.passed)
  }

  test("query asserts: ratio, count-compare, agg value, agg compare") {
    import graft.validators.{QueryCheck, QueryAssertion => QA}
    val tables = Map("t" -> Seq(("a", 1.0), ("a", 2.0), ("b", 3.0))
      .toDF("k", "v"))
    def passed(qc: QueryCheck) = qc.run(spark, tables).passed
    assert(passed(QueryCheck("SELECT * FROM t WHERE k = 'a'",
      QA.RowCountRatioBetween("SELECT * FROM t", 0.5, 0.7))))
    assert(!passed(QueryCheck("SELECT * FROM t WHERE k = 'a'",
      QA.RowCountRatioBetween("SELECT * FROM t", 0.9, 1.0))))
    assert(passed(QueryCheck("SELECT * FROM t WHERE v > 0",
      QA.RowCountCompare("SELECT * FROM t", "equal"))))
    assert(passed(QueryCheck("SELECT * FROM t WHERE k = 'b'",
      QA.RowCountCompare("SELECT * FROM t", "less_than"))))
    assert(!passed(QueryCheck("SELECT * FROM t",
      QA.RowCountCompare("SELECT * FROM t", "not_equal"))))
    assert(passed(QueryCheck("SELECT sum(v) AS s FROM t",
      QA.AggValue("s", expected = Some(6.0), tolerance = 1e-9))))
    assert(!passed(QueryCheck("SELECT sum(v) AS s FROM t",
      QA.AggValue("s", min = Some(10.0)))))
    assert(passed(QueryCheck("SELECT sum(v) AS s FROM t WHERE k IN ('a','b')",
      QA.AggCompare("SELECT sum(v) AS s FROM t", "s", "equal", 1e-9))))
    assert(!passed(QueryCheck("SELECT sum(v) AS s FROM t WHERE k = 'a'",
      QA.AggCompare("SELECT sum(v) AS s FROM t", "s", "greater_than"))))
  }

  test("expression registry entries parse SQL fragments") {
    val v = graft.validators.ValidatorRegistry.create("conditional_expression",
      Map("condition" -> "status = 'shipped'",
          "then" -> "tracking IS NOT NULL"))
    val df = Seq(("shipped", Some("T1")), ("shipped", None), ("pending", None))
      .toDF("status", "tracking")
    val r = graft.core.SuiteRunner.run(df, Seq(v),
      graft.core.SuiteRunner.Config(datasetName = "t"))
    assert(!r.checks.head.passed && r.checks.head.issues.head.count == 1)
  }

  test("behavioral privacy checks: consent, erasure, do-not-sell, retention") {
    import graft.validators._
    val df = Seq(
      // (name, consent, deleted, optout, shared)
      ("alice", "granted", "active", "no", "no"),
      ("bob", "no", "active", "no", "sold"),          // consent violation
      ("carol", "granted", "deleted", "no", "no"),    // erasure violation
      ("dave", "granted", "active", "opted_out", "sold"), // dns violation
      (null.asInstanceOf[String], "no", "deleted", "opted_out", "no"))
      .toDF("pii_name", "consent", "del_flag", "optout", "shared")
    val r = graft.core.SuiteRunner.run(df, Seq(
      ConsentCheck("consent", Seq("pii_name")),
      RightToErasureCheck("del_flag", Seq("pii_name")),
      DoNotSellCheck("optout", Seq("shared"))),
      graft.core.SuiteRunner.Config(datasetName = "t"))
    val by = r.checks.map(c => c.validator -> c.issues.map(_.count).sum).toMap
    assert(by("consent_tracking[consent]") == 1)   // bob (null name row has no PII)
    assert(by("gdpr_right_to_erasure[del_flag]") == 1) // carol
    assert(by("ccpa_do_not_sell[optout]") == 1)    // dave
    // retention: fixed asOf, rows older than 10 days flagged
    val ev = Seq(
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
      java.sql.Timestamp.valueOf("2024-01-20 00:00:00")).toDF("ts")
    val ret = graft.core.SuiteRunner.run(ev, Seq(
      DataRetentionCheck("ts", 10,
        java.time.Instant.parse("2024-01-25T00:00:00Z"))),
      graft.core.SuiteRunner.Config(datasetName = "ev"))
    assert(ret.checks.head.issues.head.count == 1)
  }

  test("special-category sweep and minimization are schema/aggregate-only") {
    import graft.validators._
    val df = Seq((1, "a")).toDF("blood_type", "k")
    val issues = SpecialCategoryCheck().schemaIssues(df.schema)
    assert(issues.map(_.column) == Seq("blood_type"))
    assert(SpecialCategoryCheck().schemaIssues(
      Seq((1, "a")).toDF("id", "k").schema).isEmpty)
    val sparse = Seq((Some("x"), 1), (None, 2), (None, 3), (None, 4))
      .toDF("fax", "id")
    val r = graft.core.SuiteRunner.run(sparse, Seq(
      DataMinimizationCheck(Seq("fax"), maxNullRatio = 0.5)),
      graft.core.SuiteRunner.Config(datasetName = "t"))
    assert(r.checks.head.issues.exists(_.issueType == "gdpr_unnecessary_pii_column"))
  }

  test("missing consent column surfaces as a schema issue through the suite") {
    import graft.validators._
    val df = Seq(("alice", 1)).toDF("pii_name", "id") // no consent column
    val r = graft.core.SuiteRunner.run(df, Seq(
      ConsentCheck("consent", Seq("pii_name"))),
      graft.core.SuiteRunner.Config(datasetName = "t"))
    assert(!r.checks.head.passed)
    assert(r.checks.head.issues.exists(_.issueType == "consent_column_missing"))
  }

  test("same-description expression checks do not collide in metric dedup") {
    import graft.validators._
    val df = Seq((1.0, -1.0), (2.0, -2.0), (3.0, 3.0)).toDF("a", "b")
    val r = graft.core.SuiteRunner.run(df, Seq(
      CustomExpressionCheck(col("a") > 0, "positive"),
      CustomExpressionCheck(col("b") > 0, "positive")),
      graft.core.SuiteRunner.Config(datasetName = "t"))
    val counts = r.checks.map(c => c.issues.map(_.count).sum)
    assert(counts == Seq(0, 2)) // a: none fail; b: two fail
  }

  test("row-count compare stays exact on Long counts") {
    import graft.validators.QueryCheck
    // 2^53 + 1 vs 2^53: distinct as Long, equal as Double
    val a = 9007199254740993L; val b = 9007199254740992L
    assert(a.toDouble == b.toDouble) // the trap being guarded against
    assert(QueryCheck.compareCounts(a, b, "not_equal", 0))
    assert(!QueryCheck.compareCounts(a, b, "equal", 0))
    assert(QueryCheck.compareCounts(a, b, "equal", 1))
    assert(QueryCheck.compareCounts(a, b, "greater_than", 0))
  }

  test("row-count ratio flags rows over an empty base") {
    import graft.validators.{QueryCheck, QueryAssertion => QA}
    val tables = Map("t" -> Seq(("a", 1.0)).toDF("k", "v"))
    // base empty + query rows => +inf ratio => fails the max bound
    assert(!QueryCheck("SELECT * FROM t",
      QA.RowCountRatioBetween("SELECT * FROM t WHERE k = 'zzz'", 0.0, 2.0))
      .run(spark, tables).passed)
    // both empty => passes (reference semantics on empty tables)
    assert(QueryCheck("SELECT * FROM t WHERE k = 'zzz'",
      QA.RowCountRatioBetween("SELECT * FROM t WHERE k = 'zzz'", 0.5, 2.0))
      .run(spark, tables).passed)
  }

  test("plugin-regulation bundles scan their patterns") {
    import graft.validators.PrivacyPolicies
    val df = Seq("patient MRN1234567 on file", "clean row")
      .toDF("notes")
    val hits = PrivacyPolicies.scan(df, "hipaa", Seq("notes"))
    assert(hits.exists(h => h.pattern == "mrn_us" && h.count == 1))
    // all bundles resolve against the pattern registry
    PrivacyPolicies.bundles.foreach { case (_, pats) =>
      pats.foreach(p => assert(graft.profiler.Pii.patterns.contains(p), p))
    }
  }

  test("decontamination flags n-gram overlap and short exact copies") {
    import graft.pipeline.Dedup
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (1L, words),                       // contains the benchmark 13-gram
      (2L, "totally unrelated content here"),
      (3L, "short exact copy"),          // < 13 words, exact match path
      (4L, (100 to 140).map(i => s"x$i").mkString(" ")))
      .toDF("doc_id", "text")
    val bench = Seq(
      (1 to 13).map(i => s"w$i").mkString(" "), // 13-gram prefix of doc 1
      "short exact copy").toDF("text")
    val flagged = Dedup.contaminatedIds(corpus, "doc_id", "text",
      bench, "text").collect().map(_.getLong(0)).toSet
    assert(flagged == Set(1L, 3L))
    assert(Dedup.decontaminate(corpus, "doc_id", "text", bench, "text")
      .collect().map(_.getLong(0)).toSet == Set(2L, 4L))
  }

  test("duplicate n-gram fraction detects repetition") {
    import graft.pipeline.{Text => T}
    val df = Seq(
      "spam spam spam spam spam spam",         // all 3-grams identical
      "one two three four five six seven")     // all distinct
      .toDF("text").withColumn("__toks", T.tokens(col("text")))
    val fr = df.select(round(
      T.duplicateNgramFractionOf(col("__toks"), 3), 4)).collect()
      .map(_.getDouble(0))
    assert(fr(0) == 0.75)  // 4 grams, 1 distinct
    assert(fr(1) == 0.0)
    // gopher flags shape: stopword-free spam fails stopwords_ok
    val flags = df.select(T.gopherFlags(col("text"), col("__toks"))
      .as("f")).select(col("f.stopwords_ok")).collect()
    assert(flags.forall(!_.getBoolean(0)))
  }

  test("domain mixing is deterministic and respects weights") {
    import graft.pipeline.Curate
    val docs = (1 to 2000).map(i => (i.toLong, s"text $i",
      if (i % 2 == 0) "heavy" else "light")).toDF("doc_id", "text", "source")
    def kept() = Curate(docs, "doc_id", "text")
      .mixDomains("source", Map("heavy" -> 0.25)).df
    val k1 = kept().collect().map(_.getLong(0)).toSet
    val k2 = kept().collect().map(_.getLong(0)).toSet
    assert(k1 == k2) // same hash decisions every run
    val heavyKept = k1.count(_ % 2 == 0)
    assert(heavyKept > 150 && heavyKept < 350, s"heavy kept $heavyKept")
    assert(k1.count(_ % 2 == 1) == 1000) // unlisted source keeps all
    // chained mixes compose: the stage-position salt decorrelates the
    // hash decisions, so two 0.5 mixes keep ~25%, not ~50%
    val twice = Curate(docs, "doc_id", "text")
      .mixDomains("source", Map("heavy" -> 0.5))
      .mixDomains("source", Map("heavy" -> 0.5))
      .df.filter(col("source") === "heavy").count()
    assert(twice > 150 && twice < 350, s"chained kept $twice of 1000")
  }

  test("data-docs page renders baseline stats; audit log round-trips") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, null.asInstanceOf[String]))
      .toDF("id", "v")
    val baseline = graft.profiler.Learn.learn(df)
    val page = graft.reporters.Reporters.dataDocs("t", baseline)
    assert(page.contains("<h1>t</h1>") && page.contains("3 rows"))
    assert(page.contains("id") && page.contains("v"))
    val log = java.nio.file.Files.createTempDirectory("audit")
      .resolve("audit.jsonl").toString
    val r = graft.core.SuiteRunner.run(df,
      Seq(graft.validators.NullCheck(Seq("v"))),
      graft.core.SuiteRunner.Config(datasetName = "t"))
    graft.reporters.AuditLog.recordRun(log, r, nowMs = 1000L)
    graft.reporters.AuditLog.recordRun(log, r.copy(dataset = "u"),
      nowMs = 2000L)
    assert(graft.reporters.AuditLog.read(log).size == 2)
    assert(graft.reporters.AuditLog.read(log,
      dataset = Some("t")).size == 1)
    assert(graft.reporters.AuditLog.read(log,
      outcome = Some("failure")).size == 2) // v has a null -> failed
  }

  test("graft SQL functions register and evaluate through spark.sql") {
    org.apache.spark.sql.graft.FunctionBridge.registerAll(spark)
    Seq(("The cat and the dog", Seq(1.0, 0.0), Seq(1.0, 0.0)))
      .toDF("text", "va", "vb").createOrReplaceTempView("fx")
    val r = spark.sql(
      """SELECT graft_normalize(text) AS n,
           graft_fingerprint(text) AS fp,
           graft_cosine(va, vb) AS cos
         FROM fx""").head()
    assert(r.getAs[String]("n") == "the cat and the dog")
    assert(r.getAs[String]("fp").length == 32)
    assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-9)
    // SQL and DataFrame forms agree (one semantics, two surfaces)
    val both = spark.sql("SELECT text FROM fx")
      .select(expr("graft_fingerprint(text)").as("sqlFp"),
        graft.pipeline.Text.fingerprint(col("text")).as("dfFp")).head()
    assert(both.getString(0) == both.getString(1))
    // crawl ops: SQL and DataFrame forms agree on adversarial inputs
    val crawl = Seq(
      ("<script>a<b</script><p>Hi &amp;lt; &nbsp;there</p>",
        "HTTP://www.Example.Com:80/A?q=1#f"),
      ("plain", "not a url")).toDF("h", "u")
    crawl.createOrReplaceTempView("crawl")
    val cmp = crawl.select(
        expr("graft_strip_html(h)").as("sqlH"),
        graft.pipeline.Text.stripHtml(col("h")).as("dfH"),
        expr("graft_canonical_url(u)").as("sqlU"),
        graft.pipeline.Text.canonicalUrl(col("u")).as("dfU")).collect()
    cmp.foreach { r =>
      assert(r.getString(0) == r.getString(1), s"stripHtml: $r")
      assert(r.getString(2) == r.getString(3), s"canonicalUrl: $r")
    }
    // DataFrame-API simhash and SQL simhash agree (shared expression)
    val toks = Seq(Seq("a", "b", "c")).toDF("t")
    toks.createOrReplaceTempView("tk")
    val viaSql = spark.sql("SELECT simhash64(t) FROM tk").head().getLong(0)
    val viaDf = toks.select(graft.functions.SimHash64(col("t")))
      .head().getLong(0)
    assert(viaSql == viaDf)
  }

  test("ocsvm registry entry constructs and runs") {
    val v = graft.validators.ValidatorRegistry.create("one_class_svm",
      Map("columns" -> "x,y", "nu" -> "0.05"))
    val df = ((1 to 200).map(i =>
      (math.sin(i * 0.7) * 10.0, math.cos(i * 1.3) * 10.0)) :+
      (9999.0, 9999.0)).toDF("x", "y")
    val issues = v.asInstanceOf[graft.core.DedicatedScan].runScan(df, 201)
    assert(issues.nonEmpty && issues.head.count >= 1)
  }
}
