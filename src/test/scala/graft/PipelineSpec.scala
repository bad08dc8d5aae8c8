package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.pipeline._

class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2L, "the quick brown fox jumps over the lazy dog near the river bend"), // near-dup of 1
    (3L, "completely different content about spark query engines and data"),
    (4L, "the quick brown fox jumps over the lazy dog near the river bank"), // exact dup of 1
    (5L, "unrelated short text")
  ).toDF("id", "text")

  test("exact dedup by fingerprint") {
    val groups = Dedup.exactDupGroups(docs, "text").collect()
    assert(groups.length == 1 && groups(0).getLong(1) == 2) // docs 1 & 4
    assert(Dedup.exactDedup(docs, "text", "id").count() == 4)
  }

  test("minhash LSH finds near-dups with exact-jaccard verification") {
    val pairs = Dedup.minhashLshPairs(docs, "id", "text",
      k = 32, bands = 16, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // exact dup always survives
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near-dup found
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("exhaustive jaccard pairs agree with LSH on high threshold") {
    val exact = Dedup.jaccardPairs(docs, "id", "text", 3, 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact == Set((1L, 4L))) // only the identical pair is >= 0.9
  }

  test("simhash expression: deterministic, near-dup small hamming") {
    val fp = docs.select($"id", graft.functions.SimHash64(Text.tokens($"text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) == fp(4L)) // identical text, identical fingerprint
    val h12 = java.lang.Long.bitCount(fp(1L) ^ fp(2L))
    val h13 = java.lang.Long.bitCount(fp(1L) ^ fp(3L))
    assert(h12 < h13) // near-dup closer than unrelated
    val pairs = Dedup.simhashPairs(docs, "id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L)))
  }

  test("native normalize matches the two-regex reference form") {
    val real = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001",
      "documents").limit(200).select($"doc_id", $"text")
    val edge = Seq(
      (9001L, ""), (9002L, "   "), (9003L, "!!!...###"),
      (9004L, "  Hello,   WORLD!!  42x "), (9005L, "a"),
      (9006L, "的是了 mixed 中文 text"), (9007L, "tabs\tand\nnewlines"),
      (9008L, "ÀÉÎøü ünïcödé"), (9009L, "0123456789"),
      (9010L, "trailing space "), (9011L, " leading"))
      .toDF("doc_id", "text")
    val t = real.unionAll(edge)
    val native = t.select($"doc_id", Text.normalize($"text").as("n"))
    val regex = t.select($"doc_id", Text.normalizeRegex($"text").as("n"))
    assert(native.exceptAll(regex).isEmpty && regex.exceptAll(native).isEmpty)
    // and the downstream split behaves identically on the empty result
    assert(t.filter($"doc_id" === 9003L)
      .select(Text.tokenCount($"text")).head().getInt(0) == 0)
  }

  test("native shingle hashes match the HOF reference form") {
    val real = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001",
      "documents").limit(100)
    for (n <- Seq(1, 3, 13)) {
      val t = real.withColumn("__toks", Text.tokens($"text"))
      val native = t.select($"doc_id",
        Text.shingleHashes($"__toks", n).as("h"))
      val hof = t.withColumn("__th", Text.tokenHashes($"__toks"))
        .select($"doc_id", Text.shingleHashesOf($"__th", n).as("h"))
      assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty,
        s"shingle hash mismatch at n=$n")
    }
    // short doc (< n tokens) yields an empty array, not null
    val short = Seq((1L, "two words")).toDF("doc_id", "text")
      .withColumn("__toks", Text.tokens($"text"))
    assert(short.select(Text.shingleHashes($"__toks", 13).as("h"))
      .head().getSeq[Long](0).isEmpty)
  }

  test("native language-ID argmax matches the HOF reference form") {
    val real = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001",
      "documents").limit(200)
    val tie = Seq((9001L, "the el"), (9002L, ""), (9003L, "xx yy zz"))
      .toDF("doc_id", "text")
    val t = real.select($"doc_id", $"text").unionAll(tie)
      .withColumn("__toks", Text.tokens($"text"))
    def shaped(c: org.apache.spark.sql.Column) = t.select($"doc_id",
      c.getField("s").as("s"), c.getField("l").as("l"))
    val native = shaped(Text.langBest($"text", $"__toks"))
    val hof = shaped(Text.langBestHof($"text", $"__toks"))
    assert(native.exceptAll(hof).isEmpty && hof.exceptAll(native).isEmpty)
    // tie semantics pinned: en=1 ("the") ties es=1 ("el") -> larger label
    val row = native.filter($"doc_id" === 9001L).head()
    assert(row.getInt(1) == 1 && row.getString(2) == "es")
  }

  test("shingle/lang expressions carry no boxed lambdas in the plan") {
    // regression in the HyperplaneBucket spirit: the hot per-token loops
    // must be native expressions, not HOF lambda chains
    val sh = Text.shingleHashes(col("t"), 13).toString.toLowerCase
    assert(sh.contains("shingle_hashes64") && !sh.contains("lambda"))
    val lb = Text.langBest(col("r"), col("t")).toString.toLowerCase
    assert(lb.contains("lang_best") && !lb.contains("lambda"))
  }

  test("cosine + brute-force topK + threshold counts") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.9f, 0.1f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      vecs.filter($"vec_id" === 0), "vec_id", "embedding", 2)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    assert(top.toSeq == Seq((1, 0L), (2, 1L))) // self first, then nearest
    val nn = Similarity.neighborsAbove(vecs, "vec_id", "embedding",
      vecs.filter($"vec_id" === 0), "vec_id", "embedding", 0.5)
      .collect()
    assert(nn.length == 1 && nn(0).getLong(1) == 1) // only vec 1 >= 0.5
  }

  test("LSH ANN recall vs brute force on real embeddings") {
    val emb = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "embeddings")
    val queries = emb.filter($"vec_id" < 3)
    val bf = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val ann = Similarity.lshTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", 5, planes = 3, probe1 = true)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    // recall@5 of the bucketed variant vs exact (multi-probe, few planes)
    val recall = (bf intersect ann).size.toDouble / bf.size
    assert(recall >= 0.5, s"recall $recall too low")
  }

  test("embeddingDupPairsLsh: precision exact, exact-dup recall 1, subset of brute") {
    val emb = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "embeddings")
    val copies = emb.filter($"vec_id" < 10)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val corpus = emb.select($"vec_id", $"embedding").unionByName(copies)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = pairSet(Dedup.embeddingDupPairs(corpus, "vec_id", "embedding", 0.8))
    val lsh = pairSet(Dedup.embeddingDupPairsLsh(corpus, "vec_id", "embedding",
      0.8, bands = 4, bandBits = 14, dim = 64))
    // every reported pair is exact-cosine verified -> subset of brute
    assert(lsh.subsetOf(brute), s"false positives: ${lsh diff brute}")
    // identical vectors always share a bucket -> all planted pairs found
    val planted = (0L until 10L).map(i => (i, i + 100000L)).toSet
    assert(planted.subsetOf(lsh), s"missed exact dups: ${planted diff lsh}")
    // layout independence: same pairs after a repartition
    val lsh2 = pairSet(Dedup.embeddingDupPairsLsh(corpus.repartition(7),
      "vec_id", "embedding", 0.8, bands = 4, bandBits = 14, dim = 64))
    assert(lsh2 == lsh)
    // empty corpus: empty result, not a throw
    assert(Dedup.embeddingDupPairsLsh(corpus.limit(0), "vec_id", "embedding",
      0.8).count() == 0)
    // wide mode (bands*bandBits > 63, per-band plane-offset signatures —
    // the regime the packed-long form could not reach): same invariants
    val wide = pairSet(Dedup.embeddingDupPairsLsh(corpus, "vec_id",
      "embedding", 0.8, bands = 6, bandBits = 20, dim = 64))
    assert(wide.subsetOf(brute), s"wide false positives: ${wide diff brute}")
    assert(planted.subsetOf(wide), s"wide missed exact dups: ${planted diff wide}")
  }

  test("dedupByEmbedding: fused labels match pairs|>dupClusters exactly") {
    // the fused representative-only path must produce the SAME components
    // as materializing the verified pair list and clustering it — both
    // run the identical banded-LSH candidate discipline, so parity is
    // deterministic regardless of recall. Threshold 0.8 on the real
    // fixture yields natural (non-planted) near-dup pairs too.
    val emb = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "embeddings")
    val copies = emb.filter($"vec_id" < 10)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val corpus = emb.select($"vec_id", $"embedding").unionByName(copies)
    val pairs = Dedup.embeddingDupPairsLsh(corpus, "vec_id", "embedding",
      0.8, bands = 4, bandBits = 14, dim = 64)
    val viaPairs = Dedup.dupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fusedAll = Dedup.embedDupLabels(corpus, "vec_id", "embedding",
      0.8, bands = 4, bandBits = 14, dim = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fused labels every vector (singletons label themselves); the pair
    // path labels only paired ids — restrict to those and compare exactly
    assert(viaPairs.keySet.subsetOf(fusedAll.keySet))
    assert(viaPairs.forall { case (id, c) => fusedAll(id) == c },
      s"label mismatch: ${viaPairs.filter { case (id, c) => fusedAll(id) != c }}")
    assert(fusedAll.filterNot { case (id, _) => viaPairs.contains(id) }
      .forall { case (id, c) => id == c }) // unpaired ids are their own rep
    // and the dedup form keeps exactly one representative per cluster
    val kept = Dedup.dedupByEmbedding(corpus, "vec_id", "embedding",
      0.8, bands = 4, bandBits = 14, dim = 64)
      .collect().map(_.getLong(0)).toSet
    val reps = fusedAll.values.toSet
    val losers = fusedAll.filter { case (id, c) => id != c }.keySet
    assert(kept == (fusedAll.keySet -- losers))
    assert(reps.subsetOf(kept))
  }

  test("embedDupLabels: band-serial labels identical to fused") {
    // Same corpus as the fused-parity test: threshold 0.8 on the real
    // fixture yields natural near-dup structure with MULTI-band
    // collisions — the regime where the per-band first-match partition
    // must cover every screened pair exactly once (no pair doubly
    // verified, none lost at a band boundary).
    val emb = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "embeddings")
    val copies = emb.filter($"vec_id" < 10)
      .select(($"vec_id" + 100000L).as("vec_id"), $"embedding")
    val corpus = emb.select($"vec_id", $"embedding").unionByName(copies)
    val fused = Dedup.embedDupLabels(corpus, "vec_id", "embedding",
      0.8, bands = 4, bandBits = 14, dim = 64, bandSerial = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Dedup.lastBandSerial == 0)
    val serial = Dedup.embedDupLabels(corpus, "vec_id", "embedding",
      0.8, bands = 4, bandBits = 14, dim = 64, bandSerial = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Dedup.lastBandSerial == 1)
    assert(serial == fused)
    // auto mode stays fused below the byte threshold on a tiny corpus...
    Dedup.embedDupLabels(corpus, "vec_id", "embedding", 0.8,
      bands = 4, bandBits = 14, dim = 64).count()
    assert(Dedup.lastBandSerial == 0)
    // ...and the estimate separates the measured regimes: 20M×64-dim×
    // 7-band (the sf1000 probe's 24 GB disk cliff) engages, the sf100
    // fixture (2M vectors, ran fine fused) does not
    assert(Dedup.explodeBytes(20000000L, 7, 64) > Dedup.SerialBandAutoBytes)
    assert(Dedup.explodeBytes(2000000L, 7, 64) < Dedup.SerialBandAutoBytes)
    // transitive chain through the serial path (labels must still close
    // across bands, not just within one)
    val step = math.toRadians(20)
    val chain = (0 until 5).map { i =>
      val a = i * step
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat) ++
        Array.fill(62)(0.0f))
    }
    val keptChain = Dedup.dedupByEmbedding(chain.toDF("vec_id", "embedding"),
      "vec_id", "embedding", threshold = 0.9, bands = 16, bandBits = 4,
      dim = 64, bandSerial = 1)
      .collect().map(_.getLong(0)).toSet
    assert(keptChain == Set(0L), s"kept $keptChain")
    // incremental shuffled fallback, band-serial: identical kept set to
    // the broadcast plan (fixture from the dedupIncrementEmbedding test)
    def at(deg: Double): Array[Float] = {
      val a = math.toRadians(deg)
      Array(math.cos(a).toFloat, math.sin(a).toFloat) ++
        Array.fill(62)(0.0f)
    }
    val existing = Seq((1L, at(0))).toDF("vec_id", "embedding")
    val incoming = Seq(
      (10L, at(6)), (11L, at(12)),
      (20L, at(90)), (21L, at(96)), (22L, at(102))
    ).toDF("vec_id", "embedding")
    val serialInc = Dedup.dedupIncrementEmbedding(existing, incoming,
      "vec_id", "embedding", threshold = 0.99, bands = 16, bandBits = 4,
      dim = 64, broadcastBatch = false, bandSerial = 1)
      .select("vec_id").as[Long].collect().toSet
    assert(serialInc == Set(11L, 20L), s"kept $serialInc")
  }

  test("dedupByEmbedding: chain-shaped cluster converges transitively") {
    // A ~ B ~ C with A !~ C (similarity is not transitive): unit vectors
    // rotated in 20-degree steps — adjacent cos ~0.94 >= 0.9, two-step
    // cos ~0.77 < 0.9. The whole chain is ONE component and only vec 0
    // survives; reaching that requires label propagation beyond round 1
    // (the min-neighbor of vec 4 is vec 3, not vec 0). Plan is sized for
    // ~1-2e-7 miss probability per adjacent pair (16 bands x 4 bits at
    // cos 0.94), so the test is deterministic in practice.
    val step = math.toRadians(20)
    val chain = (0 until 5).map { i =>
      val a = i * step
      (i.toLong, Array(math.cos(a).toFloat, math.sin(a).toFloat) ++
        Array.fill(62)(0.0f))
    }
    val far = Seq((100L, Array.fill(64)(0.0f).updated(30, 1.0f)))
    val df = (chain ++ far).toDF("vec_id", "embedding")
    val kept = Dedup.dedupByEmbedding(df, "vec_id", "embedding",
      threshold = 0.9, bands = 16, bandBits = 4, dim = 64)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 100L), s"kept $kept")
    // null-vector rows always survive (they cannot be near-duplicates)
    val withNull = df.unionByName(Seq((200L,
      null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val kept2 = Dedup.dedupByEmbedding(withNull, "vec_id", "embedding",
      threshold = 0.9, bands = 16, bandBits = 4, dim = 64)
      .collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(0L, 100L, 200L))
  }

  test("bpeCount: greedy longest-match kernel, hand-pinned + parity-fuzzed") {
    val v = Text.demoBpeVocab
    // hand-derived counts under the greedy longest-match rule
    val cases = Seq(
      ("hello world", 2),   // "hello" + "world"
      ("helloworld", 2),    // longest-match crosses nothing: hello|world
      ("heworld xyz", 5),   // he|world + x|y|z (unknown singles)
      ("The", 2),           // 'T' unknown (case-sensitive) + "he"
      ("", 0), ("   \t\n", 0),
      ("héllo", 4),    // h | é(unknown) | l | lo
      ("ingestion", 3))     // ing|es|tion
    val df = cases.zipWithIndex
      .map { case ((t, e), i) => (i.toLong, t, e) }.toDF("id", "t", "exp")
    val got = df.select($"id", $"exp",
      Text.bpeCount($"t", v).as("n")).collect()
    got.foreach(r => assert(r.getInt(2) == r.getInt(1),
      s"case ${r.getLong(0)}: got ${r.getInt(2)} want ${r.getInt(1)}"))
    // reference parity on the hand cases AND real fixture text (the trie
    // kernel must match the naive longest-prefix reference everywhere)
    cases.foreach { case (t, e) =>
      assert(Text.bpeCountReference(t, v) == e, s"reference on '$t'") }
    val real = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001",
      "documents").limit(300)
    val kernel = real.select($"doc_id", Text.bpeCount($"text", v).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ref = real.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> Text.bpeCountReference(r.getString(1), v))
      .toMap
    assert(kernel == ref)
    // vocab file loader round-trips (comments + blanks skipped)
    val p = java.nio.file.Files.createTempFile("vocab", ".txt")
    java.nio.file.Files.writeString(p,
      "# demo vocab\nhello\n\nworld\nhe\n")
    assert(Text.bpeVocabFromFile(p.toString) == Seq("hello", "world", "he"))
    // token-budget sampling denominated in BPE tokens: kept set equals
    // the same rule run over a precomputed count column
    val docsT = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001",
      "documents")
    val budgets = Map("src0" -> 300L, "src1" -> 40L)
    def ids(c: Curate) = c.df.select("doc_id").as[Long].collect().toSet
    val viaKernel = ids(Curate(docsT, "doc_id", "text")
      .sampleTokenBudget("source", budgets,
        tokensOf = Text.bpeCount(col("text"), v)))
    val pre = docsT.withColumn("__n", Text.bpeCount(col("text"), v))
    val viaColumn = ids(Curate(pre, "doc_id", "text")
      .sampleTokenBudget("source", budgets, tokensOf = col("__n")))
    assert(viaKernel == viaColumn && viaKernel.nonEmpty)
  }

  test("bpeMergeCount: merge-rank kernel, hand-pinned + parity-fuzzed") {
    val m = Text.demoBpeMerges
    // hand-derived counts under the lowest-rank-pair-first rule
    val cases = Seq(
      ("hello world", 2), // hello + world (full merge chains)
      ("helloworld", 5),  // hell|ow|o|r|ld — (o,w) outranks (hell,o)
      ("heworld xyz", 5), // he|world + 3 unknown singles
      ("The", 2),         // T unknown + he
      ("", 0), ("   \t\n", 0),
      ("héllo", 4),       // h|é|ll|o — é unknown blocks the hell chain
      ("wow", 2),         // (o,w) outranks (w,o): w|ow
      ("owow", 2),        // all-occurrences left-to-right: ow|ow
      ("lll", 2),         // leftmost non-overlapping (l,l): ll|l
      ("dl", 2),          // (d,l) unranked — only (l,d) merges
      ("ld", 1))
    val df = cases.zipWithIndex
      .map { case ((t, e), i) => (i.toLong, t, e) }.toDF("id", "t", "exp")
    val got = df.select($"id", $"exp",
      Text.bpeMergeCount($"t", m).as("n")).collect()
    got.foreach(r => assert(r.getInt(2) == r.getInt(1),
      s"case ${r.getLong(0)}: got ${r.getInt(2)} want ${r.getInt(1)}"))
    cases.foreach { case (t, e) =>
      assert(Text.bpeMergeCountReference(t, m) == e, s"reference on '$t'") }
    // the rule genuinely differs from greedy longest-match on
    // merge-order-sensitive strings (q169 vs q172's cls 1)
    assert(Text.bpeCountReference("helloworld", Text.demoBpeVocab) == 2)
    // reference parity on real fixture text
    val real = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001",
      "documents").limit(300)
    val kernel = real.select($"doc_id",
        Text.bpeMergeCount($"text", m).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val ref = real.select($"doc_id", $"text").collect()
      .map(r => r.getLong(0) -> Text.bpeMergeCountReference(r.getString(1), m))
      .toMap
    assert(kernel == ref)
    // merges file loader (GPT-2 merges.txt shape: rank = line order)
    val p = java.nio.file.Files.createTempFile("merges", ".txt")
    java.nio.file.Files.writeString(p,
      "#version: 0.2\nh e\n\nl l\nhe ll\n")
    assert(Text.bpeMergesFromFile(p.toString) ==
      Seq(("h", "e"), ("l", "l"), ("he", "ll")))
    // duplicate pairs keep their first (lowest) rank
    val dup = Seq(("h", "e"), ("l", "l"), ("h", "e"))
    assert(Text.bpeMergeCountReference("hell", dup) == 2) // he|ll
    assert(df.sparkSession.range(1).select(
      Text.bpeMergeCount(lit("hell"), dup).as("n"))
      .head().getInt(0) == 2)
  }

  test("salted two-pass samplers: identical kept sets vs single-window") {
    // the mega-stratum form (rank/prefix-sum within salted sub-groups,
    // then exact global pass over survivors) must keep EXACTLY the same
    // rows as the single-window form, for every cap/quota/budget/salt
    val docsT = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001",
      "documents")
    def ids(c: Curate) = c.df.select("doc_id").as[Long].collect().toSet
    for (cap <- Seq(0L, 1L, 3L, 40L); salt <- Seq(2, 7)) {
      val base = Curate(docsT, "doc_id", "text").capPerKey("source", cap)
      val salted = Curate(docsT, "doc_id", "text")
        .capPerKey("source", cap, salt = salt)
      assert(ids(salted) == ids(base), s"capPerKey cap=$cap salt=$salt")
    }
    val quotas = Map("src0" -> 5L, "src1" -> 100L, "src2" -> 0L)
    for (salt <- Seq(2, 7)) {
      assert(ids(Curate(docsT, "doc_id", "text")
          .sampleQuota("source", quotas, salt = salt)) ==
        ids(Curate(docsT, "doc_id", "text").sampleQuota("source", quotas)),
        s"sampleQuota salt=$salt")
    }
    val budgets = Map("src0" -> 400L, "src1" -> 5L, "src2" -> 10000000L)
    for (salt <- Seq(2, 7)) {
      assert(ids(Curate(docsT, "doc_id", "text")
          .sampleTokenBudget("source", budgets, salt = salt)) ==
        ids(Curate(docsT, "doc_id", "text")
          .sampleTokenBudget("source", budgets)),
        s"sampleTokenBudget salt=$salt")
    }
    // plan assertion: the salted form's FIRST window partitions by
    // (key, salt-hash) — the extra parallelism is in the plan, not
    // just intended
    // (Catalyst pre-projects the salt hash into a _wN attribute, so
    // match the projected expression plus a two-key window partition
    // spec; the optimizer also inserts WindowGroupLimit — per-partition
    // top-k pushdown — on both passes, which is the plan we want)
    val plan = Curate(docsT, "doc_id", "text")
      .capPerKey("source", 3L, salt = 8).df
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("pmod(xxhash64("), s"no salt hash in plan:\n$plan")
    assert(plan.linesIterator.exists(w => w.contains("WindowGroupLimit") &&
      w.contains("source") && w.contains(", _w")),
      s"no salted two-key window group limit in plan:\n$plan")
    // bucketed token-budget plan shape: the window partitions by
    // (stratum, bucket) — never the bare mega-stratum — and the driver
    // bucket offsets ride a broadcast join
    val tbPlan = Curate(docsT, "doc_id", "text")
      .sampleTokenBudget("source", budgets, salt = 32).df
      .queryExecution.executedPlan.toString
    assert(tbPlan.linesIterator.exists(w => w.contains("Window [") &&
      w.contains("source") && w.contains("__bk")),
      s"no (stratum, bucket) window in plan:\n$tbPlan")
    assert(!tbPlan.linesIterator.exists(w => w.contains("Window [") &&
      !w.contains("__bk")),
      s"bare single-stratum window survived in salted plan:\n$tbPlan")
    assert(tbPlan.contains("BroadcastHashJoin"),
      s"bucket offsets not broadcast:\n$tbPlan")
  }

  test("sampleTokenBudget auto-engages bucketing past the row threshold") {
    // the 100 TB contract shouldn't depend on the caller knowing their
    // stratum histogram: default salt = -1 probes budgeted stratum row
    // counts and engages the exact bucketed form automatically. Kept set
    // must be byte-identical to the forced single window in BOTH probe
    // outcomes.
    val docsT = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001",
      "documents")
    val budgets = Map("src0" -> 400L, "src1" -> 5L, "src2" -> 10000000L)
    def ids(c: Curate) = c.df.select("doc_id").as[Long].collect().toSet
    val single = Curate(docsT, "doc_id", "text")
      .sampleTokenBudget("source", budgets, salt = 0)
    // (1) under threshold: probe resolves to the single window
    val auto = Curate(docsT, "doc_id", "text")
      .sampleTokenBudget("source", budgets)
    assert(!auto.stages.last.contains("auto"))
    assert(ids(auto) == ids(single))
    // (2) over threshold (tiny override): probe engages bucketing —
    // stage marks it, plan partitions the window by (stratum, bucket),
    // kept set unchanged
    val tripped = Curate(docsT, "doc_id", "text")
      .sampleTokenBudget("source", budgets, autoBucketRows = 8L)
    assert(tripped.stages.last.contains("(auto)"),
      s"auto did not engage: ${tripped.stages.last}")
    val plan = tripped.df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(w => w.contains("Window [") &&
      w.contains("__bk")), s"no bucketed window in auto plan:\n$plan")
    assert(ids(tripped) == ids(single))
    // buckets sized ~autoBucketRows/2 rows each: 25-row strata at
    // autoBucketRows=8 -> ceil(25/4) = 7 buckets
    assert(tripped.stages.last.contains("salt=7"),
      s"bucket sizing off: ${tripped.stages.last}")
    // degenerate autoBucketRows=1: divisor clamps to 1 instead of
    // dividing by zero (r11 ADVICE), buckets cap at 1024, kept set intact
    val degenerate = Curate(docsT, "doc_id", "text")
      .sampleTokenBudget("source", budgets, autoBucketRows = 1L)
    assert(ids(degenerate) == ids(single))
  }

  test("lshPlan: O(1) bucket occupancy sizing and recall-driven band count") {
    // bandBits tracks ceil(log2 n), clamped to [8, 63]
    assert(Dedup.lshPlan(100L, 0.99)._2 == 8)
    assert(Dedup.lshPlan(2000000L, 0.99)._2 == 21)
    assert(Dedup.lshPlan(1L << 40, 0.99)._2 == 40)
    // band count reaches the recall target under the sign-LSH model
    val (bands, bits) = Dedup.lshPlan(2000000L, 0.99, recall = 0.95)
    val q = 1.0 - math.acos(0.99) / math.Pi
    val achieved = 1.0 - math.pow(1.0 - math.pow(q, bits), bands)
    assert(achieved >= 0.95, s"recall $achieved with $bands bands")
    // one band fewer would miss the target (minimality)
    val under = 1.0 - math.pow(1.0 - math.pow(q, bits), bands - 1)
    assert(under < 0.95, s"bands not minimal: $bands")
  }

  test("chunkPayload: lossless slicing — chunks reassemble to the original bytes") {
    import graft.pipeline.Multimodal
    val docs = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001",
      "documents").limit(50).select($"doc_id", $"text")
    val payload = Multimodal.asPayload(docs, "text", "audio/wav")
    val re = Multimodal.chunkPayload(payload, "content", 64)
      .groupBy($"doc_id")
      .agg(aggregate(
        array_sort(collect_list(struct($"chunk_idx", $"chunk"))),
        lit(Array.emptyByteArray),
        (acc, x) => concat(acc, x.getField("chunk"))).as("reassembled"))
    val mismatches = re.join(payload.select($"doc_id", $"content"), "doc_id")
      .filter(md5($"reassembled") =!= md5($"content")).count()
    assert(mismatches == 0)
    // chunk arithmetic: counts and final-window length per doc
    val bad = Multimodal.chunkPayload(payload, "content", 64)
      .groupBy($"doc_id", length($"content").as("b"))
      .agg(count(lit(1)).as("n"), max(length($"chunk")).as("maxlen"),
        min(length($"chunk")).as("minlen"))
      .filter($"n" =!= ceil($"b" / lit(64.0)).cast("long") ||
        $"maxlen" > 64 || $"minlen" =!= $"b" - ($"n" - 1) * 64)
    assert(bad.count() == 0)
    // null / empty payloads produce no chunk rows, not a throw
    val edge = Seq((1L, null.asInstanceOf[Array[Byte]]),
      (2L, Array.emptyByteArray)).toDF("doc_id", "content")
    assert(Multimodal.chunkPayload(edge, "content", 64).count() == 0)
  }

  test("stripHtml: blocks, tags, entities, double-escape, whitespace") {
    val rows = Seq(
      "<p>Hello <b>world</b></p>" -> "Hello world",
      "<script>if (a < b) { x(); }</script>after" -> "after",
      "<STYLE media=\"all\">p{}</style>ok" -> "ok",
      "a &lt;tag&gt; &quot;q&#39;s&quot; &amp; b" -> "a <tag> \"q's\" & b",
      // &amp;lt; must decode to the literal text "&lt;", never to "<"
      "&amp;lt;" -> "&lt;",
      "one\t\ntwo   three <br/> four" -> "one two three four",
      "plain text" -> "plain text")
    val df = rows.zipWithIndex.map { case ((in, want), i) => (i, in, want) }
      .toDF("i", "in", "want")
    val bad = df.filter(
      graft.pipeline.Text.stripHtml($"in") =!= $"want").collect()
    assert(bad.isEmpty, bad.mkString(";"))
  }

  test("canonicalUrl: case, ports, www, fragments, empty path, non-URLs") {
    val rows = Seq(
      "HTTP://Example.Com:80/A/b?Q=1#frag" -> "http://example.com/A/b?Q=1",
      "https://www.Example.com:443" -> "https://example.com/",
      "https://example.com:8443/x" -> "https://example.com:8443/x",
      "http://example.com" -> "http://example.com/",
      "ftp://Host.Com/File" -> "ftp://host.com/File",
      "not a url" -> "not a url",
      "http://www.example.com/www.keep" -> "http://example.com/www.keep")
    val df = rows.zipWithIndex.map { case ((in, want), i) => (i, in, want) }
      .toDF("i", "in", "want")
    val bad = df.filter(
      graft.pipeline.Text.canonicalUrl($"in") =!= $"want").collect()
    assert(bad.isEmpty, bad.mkString(";"))
    // stripWww = false preserves the www host
    val keep = df.filter($"i" === 1).select(
      graft.pipeline.Text.canonicalUrl($"in", stripWww = false))
      .head().getString(0)
    assert(keep == "https://www.example.com/")
  }

  test("lshTopK on an empty or all-null corpus returns empty, not a throw") {
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val q = Seq((0L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = Similarity.lshTopK(empty, "vec_id", "embedding",
      q, "vec_id", "embedding", 3)
    assert(r.count() == 0)
    assert(r.columns.toSeq == Seq("query_id", "rank", "nn_id", "cos"))
    val allNull = Seq((1L, null.asInstanceOf[Array[Float]]))
      .toDF("vec_id", "embedding")
    assert(Similarity.lshTopK(allNull, "vec_id", "embedding",
      q, "vec_id", "embedding", 3).count() == 0)
  }

  test("lsh bucket expression carries no per-row weight hashing") {
    // regression for the sf10 finding: the bucketer must ship its plane
    // matrix as a constant literal, not regenerate planes x dim weights
    // per row through xxhash64 inside the lambda
    import org.apache.spark.sql.functions.col
    val e = Similarity.lshBucket(col("embedding"), 8, 64).toString
    assert(!e.toLowerCase.contains("xxhash"))
  }

  test("text analysis: tokens, quality, language id, fingerprints") {
    val df = Seq(
      ("The quick brown fox, and the lazy dog!", "en"),
      ("el perro y el gato de la casa que los vio", "es"),
      ("", "empty")).toDF("text", "tag")
    val r = df.select(
      Text.tokenCount($"text").as("tc"),
      Text.approxBpeCount($"text").as("bpe"),
      Text.qualityScore($"text", minChars = 10).as("q"),
      Text.languageId($"text").as("lang"),
      Text.fingerprint($"text").as("fp")).collect()
    assert(r(0).getAs[Int]("tc") == 8)
    assert(r(0).getAs[String]("lang") == "en")
    assert(r(1).getAs[String]("lang") == "es")
    assert(r(2).getAs[Int]("tc") == 0)
    assert(r(2).getAs[String]("lang") == "und")
    assert(r(0).getAs[Double]("q") > 0.5)
    assert(r(0).getAs[String]("fp").length == 32)
  }

  test("curation pipeline chains quality/dedup/language stages") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs to the river"),
      (2L, "the quick brown fox jumps over the lazy dog and runs to the creek"), // near-dup of 1
      (3L, "the quick brown fox jumps over the lazy dog and runs to the river"), // exact dup of 1
      (4L, "el perro y el gato de la casa que los vio ayer por la tarde juntos"),
      (5L, "tiny")
    ).toDF("id", "text")
    val curated = Curate(corpus, "id", "text")
      .minTokens(5)          // drops 5
      .dedupExact()          // drops 3
      .dedupNear(0.5)        // drops 2 (keeps lowest id 1)
    assert(curated.df.select("id").collect().map(_.getLong(0)).sorted
      .toSeq == Seq(1L, 4L))
    assert(curated.stages == Seq("tokens>=5", "dedup_exact", "dedup_near>=0.5"))
    val en = Curate(corpus, "id", "text").keepLanguages("en")
      .df.select("id").collect().map(_.getLong(0)).toSet
    assert(en == Set(1L, 2L, 3L)) // spanish + tiny dropped
    val s = curated.summary.head()
    assert(s.getLong(0) == 2)
  }

  test("image decode: real PNG/JPEG dims+luma via JDK ImageIO, null on garbage") {
    def png(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    // 2x1 with one white and one black pixel: mean luma = 255/2
    val bw = png(2, 1, (x, _) => if (x == 0) 0xffffff else 0x000000)
    val jpg = {
      val img = new java.awt.image.BufferedImage(5, 4,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val df = Seq(
      (1L, bw), (2L, jpg), (3L, Array[Byte](1, 2, 3)),
      (4L, png(3, 3, (_, _) => 0x804020)),
      (5L, bw.take(16)),              // PNG magic + cut IHDR
      (6L, bw.dropRight(12)),         // body truncated before IEND
      (7L, Array.empty[Byte]))
      .toDF("id", "content")
      .select($"id", Multimodal.decodeImage($"content").as("d"))
    val rows = df.collect().map(r => r.getLong(0) ->
      Option(r.getStruct(1))).toMap
    // truncated/empty payloads: null, never a thrown task failure
    assert(rows(5L).isEmpty && rows(7L).isEmpty)
    assert(rows(6L).forall(d => d.getInt(0) == 2 && d.getInt(1) == 1))
    val d1 = rows(1L).get
    assert(d1.getInt(0) == 2 && d1.getInt(1) == 1 && d1.getInt(2) == 3)
    assert(math.abs(d1.getDouble(3) - 255.0 / 2) < 1e-9)
    val d2 = rows(2L).get // lossy jpeg: dims/channels exact, luma not asserted
    assert(d2.getInt(0) == 5 && d2.getInt(1) == 4)
    assert(rows(3L).isEmpty) // garbage bytes -> null, not a task failure
    val d4 = rows(4L).get
    val expLuma = 0.299 * 0x80 + 0.587 * 0x40 + 0.114 * 0x20
    assert(math.abs(d4.getDouble(3) - expLuma) < 1e-9)
    // extract() wires image_meta for image mimes, typed null otherwise
    val ext = Multimodal.extract(
      Seq((1L, "hello")).toDF("id", "text"), "text", "image/png")
    assert(ext.columns.contains("image_meta"))
    assert(ext.select($"image_meta").head().isNullAt(0)) // text isn't a PNG
    val ext2 = Multimodal.extract(
      Seq((1L, "hello")).toDF("id", "text"), "text", "text/plain")
    assert(ext2.select($"image_meta").head().isNullAt(0))
  }

  test("multimodal plumbing: payload schema, stub features, frame offsets") {
    val x = Multimodal.extract(docs, "text", "text/plain", dims = 8)
    assert(x.columns.contains("features") && x.columns.contains("byte_stats"))
    assert(!x.columns.contains("content")) // bytes dropped before anything wide
    val row = x.select($"features", $"byte_stats.n_bytes").head()
    assert(row.getSeq[Double](0).size == 8)
    assert(row.getSeq[Double](0).forall(v => v >= -1.0 && v <= 1.0))
    // determinism across runs
    val again = Multimodal.extract(docs, "text", "text/plain", dims = 8)
      .select($"features").head().getSeq[Double](0)
    assert(again == row.getSeq[Double](0))
    val offsets = spark.range(1).select(
      Multimodal.frameSampleOffsets(lit(1000L), 250L).as("o"))
      .head().getSeq[Long](0)
    assert(offsets == Seq(0L, 250L, 500L, 750L))
  }
  test("IVF quantizer: deterministic fit, self-match at rank 1, recall vs brute force") {
    val emb = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "embeddings")
    val c1 = Ivf.fitCentroids(emb, "embedding", nlist = 8)
    val c2 = Ivf.fitCentroids(emb, "embedding", nlist = 8)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq) // deterministic
    val queries = emb.filter(col("vec_id") < 3)
      .select((col("vec_id") + 1000).as("vec_id"), col("embedding"))
    val top = Ivf.ivfTopK(emb, "vec_id", "embedding", queries, "vec_id",
      "embedding", 3, c1, nprobe = 2).filter(col("rank") === 1).collect()
    assert(top.length == 3)
    top.foreach { r =>
      assert(r.getLong(2) == r.getLong(0) - 1000) // source at rank 1
      assert(math.abs(r.getDouble(3) - 1.0) < 1e-6)
    }
    // probing more cells monotonically recovers more of the brute-force set
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding",
      queries, "vec_id", "embedding", 5)
      .select(col("query_id"), col("nn_id"))
    def hits(nprobe: Int) = brute.join(
      Ivf.ivfTopK(emb, "vec_id", "embedding", queries, "vec_id",
        "embedding", 5, c1, nprobe).select(col("query_id"), col("nn_id")),
      Seq("query_id", "nn_id")).count()
    assert(hits(8) >= hits(1)) // full probe = exhaustive >= single cell
    assert(hits(8) == 15)      // probing ALL cells == brute force
  }

  test("dup clusters: transitive closure over pairs, chains converge") {
    // a 5-hop chain (forces multiple propagation rounds) + a disjoint pair;
    // pairwise similarity is NOT transitive but the cluster label must be
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("id_a", "id_b")
    // driverEdgeLimit = 0 forces the distributed propagation path (the
    // default would take the driver union-find fast path here)
    val cl = Dedup.dupClusters(pairs, driverEdgeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(cl(_) == 1L))
    assert(cl(10L) == 10L && cl(11L) == 10L)
    assert(cl.size == 7) // only paired ids are labeled
    // fast path agrees
    assert(Dedup.dupClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap == cl)
    // empty pair relation → empty labeling, no throw (both paths)
    assert(Dedup.dupClusters(Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
      .count() == 0)
    assert(Dedup.dupClusters(Seq.empty[(Long, Long)].toDF("id_a", "id_b"),
      driverEdgeLimit = 0L).count() == 0)
  }

  test("sampleQuota: exact per-stratum counts, deterministic, superset on grow") {
    val corpus = (1L to 100L).map(i => (i, s"doc number $i body", s"s${i % 4}"))
      .toDF("id", "text", "src") // strata s0..s3, 25 rows each
    def ids(q: Map[String, Long]) =
      Curate(corpus, "id", "text").sampleQuota("src", q)
        .df.select("id").as[Long].collect().toSet
    val q1 = ids(Map("s0" -> 10L, "s1" -> 30L)) // s1 quota over size
    assert(q1.count(_ % 4 == 0) == 10) // s0: exactly quota
    assert(q1.count(_ % 4 == 1) == 25) // s1: min(quota, size)
    assert(q1.count(_ % 4 == 2) == 25 && q1.count(_ % 4 == 3) == 25) // unmapped
    assert(ids(Map("s0" -> 10L, "s1" -> 30L)) == q1) // deterministic
    val q2 = ids(Map("s0" -> 5L, "s1" -> 30L))
    assert(q2.subsetOf(q1)) // growing a quota extends, never resamples
    assert(ids(Map("s0" -> 0L)).count(_ % 4 == 0) == 0) // zero quota legal
  }

  test("sampleTokenBudget: strict prefix, zero and huge budgets") {
    val corpus = (1L to 20L).map(i => (i, ("tok " * 5).trim, s"s${i % 2}"))
      .toDF("id", "text", "src") // every doc = 5 tokens
    def kept(b: Long) = Curate(corpus, "id", "text")
      .sampleTokenBudget("src", Map("s0" -> b))
      .df.filter($"src" === "s0").count()
    assert(kept(0L) == 0)     // zero budget keeps nothing
    assert(kept(4L) == 0)     // below one doc: first doc would overflow
    assert(kept(12L) == 2)    // 2×5 <= 12 < 3×5
    assert(kept(1000L) == 10) // budget over stratum total keeps all
    // unbudgeted stratum untouched regardless
    assert(Curate(corpus, "id", "text")
      .sampleTokenBudget("src", Map("s0" -> 0L))
      .df.filter($"src" === "s1").count() == 10)
  }

  test("dedupNearClustered drops a whole chain to one representative") {
    // 1~2 and 2~4-style chaining via the docs fixture: cluster {1,2,4}
    val out = Curate(docs, "id", "text")
      .dedupNearClustered(threshold = 0.5, useLsh = false)
      .df.select("id").as[Long].collect().toSet
    assert(out == Set(1L, 3L, 5L))
  }

  test("dedupIncrement: index matches drop first, then in-batch clusters") {
    // existing = {1}; incoming = {2 (near-dup of 1), 3, 4 (exact dup of
    // 1), 5} → 2 and 4 drop on the direct index match; 3 and 5 survive
    val out = Dedup.dedupIncrement(
      docs.filter($"id" === 1L), docs.filter($"id" =!= 1L),
      "id", "text", shingleN = 3, threshold = 0.5, useLsh = false)
      .select("id").as[Long].collect().toSet
    assert(out == Set(3L, 5L))
    // no existing corpus at all → pure in-batch transitive dedup:
    // cluster {1,2,4} keeps 1; survival through a dropped link: with
    // existing = {2}, incoming 1 and 4 match the index ONLY via doc 2 —
    // both 1~2 and 4~2 are direct pairs so both drop; 3, 5 survive
    val empty = docs.filter($"id" === -1L)
    assert(Dedup.dedupIncrement(empty, docs, "id", "text",
      shingleN = 3, threshold = 0.5, useLsh = false)
      .select("id").as[Long].collect().toSet == Set(1L, 3L, 5L))
    val viaTwo = Dedup.dedupIncrement(
      docs.filter($"id" === 2L), docs.filter($"id" =!= 2L),
      "id", "text", shingleN = 3, threshold = 0.5, useLsh = false)
      .select("id").as[Long].collect().toSet
    assert(viaTwo == Set(3L, 5L))
  }

  test("dedupIncrement byte gate: wide string ids fall back to the " +
      "shuffled anti-join with identical results") {
    // r16 — the hit/loser broadcast gates price rows × (48 + key
    // width) against spark.graft.incrementBroadcastBytes. With the
    // budget floored the hint must disappear (shuffled plan), with the
    // default it must broadcast; results identical either way.
    val wide = docs.select(
      concat(lit("k" * 200), $"id".cast("string")).as("id"), $"text")
    def run() = Dedup.dedupIncrement(
      wide.filter($"id".endsWith("1")), wide.filter(!$"id".endsWith("1")),
      "id", "text", shingleN = 3, threshold = 0.5, useLsh = false)
    // auto-broadcast OFF for both runs: on this tiny fixture the
    // checkpointed relations carry small origin stats and would
    // auto-broadcast regardless, masking what the test pins — that the
    // byte gate adds/removes the FORCED hint.
    def smjAnti(plan: String): Boolean = plan.linesIterator.exists(l =>
      l.contains("SortMergeJoin") && l.contains("LeftAnti"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val dflt = run()
      val defaultKept = dflt.select("id").as[String].collect().toSet
      val defaultPlan = dflt.queryExecution.sparkPlan.toString
      assert(!smjAnti(defaultPlan),
        s"default budget should broadcast the hit-set anti-join:\n" +
          defaultPlan)
      spark.conf.set("spark.graft.incrementBroadcastBytes", "1")
      val gated = run()
      val gatedPlan = gated.queryExecution.sparkPlan.toString
      assert(smjAnti(gatedPlan),
        s"1-byte budget must fall back to the shuffled anti-join:\n" +
          gatedPlan)
      assert(gated.select("id").as[String].collect().toSet == defaultKept)
    } finally {
      spark.conf.unset("spark.graft.incrementBroadcastBytes")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("dedupIncrementEmbedding: direct-hit drop, chain survival, in-batch") {
    // Cosine-space restatement of dedupIncrement's two-step semantics,
    // with the chain geometry exact copies cannot plant: unit vectors at
    // angles 0/6/12 degrees — adjacent cos ~0.9945 >= 0.99, two-step cos
    // ~0.978 < 0.99. Index = {1: 0 deg}; incoming = {10: 6 deg, 11:
    // 12 deg, 20: 90 deg, 21: 96 deg, 22: 102 deg}. Step 1 drops 10 (a
    // direct index hit); 11 is linked to the index ONLY through dropped
    // 10, so it survives. Step 2 clusters survivors {20,21,22}
    // transitively (21 bridges 20~22) and keeps min id 20. Plan 16x4
    // bits at cos 0.9945 → per-adjacent-pair miss ~1e-14: deterministic
    // in practice.
    def at(deg: Double): Array[Float] = {
      val a = math.toRadians(deg)
      Array(math.cos(a).toFloat, math.sin(a).toFloat) ++
        Array.fill(62)(0.0f)
    }
    val existing = Seq((1L, at(0))).toDF("vec_id", "embedding")
    val incoming = Seq(
      (10L, at(6)), (11L, at(12)),
      (20L, at(90)), (21L, at(96)), (22L, at(102))
    ).toDF("vec_id", "embedding")
    val kept = Dedup.dedupIncrementEmbedding(existing, incoming,
      "vec_id", "embedding", threshold = 0.99,
      bands = 16, bandBits = 4, dim = 64)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(11L, 20L), s"kept $kept")
    // empty index → pure in-batch fused dedup: chain {10,11} keeps 10
    val empty = existing.filter($"vec_id" === -1L)
    val noIdx = Dedup.dedupIncrementEmbedding(empty, incoming,
      "vec_id", "embedding", threshold = 0.99,
      bands = 16, bandBits = 4, dim = 64)
      .select("vec_id").as[Long].collect().toSet
    assert(noIdx == Set(10L, 20L), s"kept $noIdx")
    // null-vector incoming rows always survive
    val withNull = incoming.unionByName(Seq((200L,
      null.asInstanceOf[Array[Float]])).toDF("vec_id", "embedding"))
    val kept2 = Dedup.dedupIncrementEmbedding(existing, withNull,
      "vec_id", "embedding", threshold = 0.99,
      bands = 16, bandBits = 4, dim = 64)
      .select("vec_id").as[Long].collect().toSet
    assert(kept2 == Set(11L, 20L, 200L), s"kept $kept2")
    // the shuffled (non-broadcast) step-1 plan keeps identical results
    val shuffled = Dedup.dedupIncrementEmbedding(existing, incoming,
      "vec_id", "embedding", threshold = 0.99,
      bands = 16, bandBits = 4, dim = 64, broadcastBatch = false)
      .select("vec_id").as[Long].collect().toSet
    assert(shuffled == kept, s"kept $shuffled")
  }

  test("dedupByClusters keeps representatives; nearDedup end-to-end") {
    // docs fixture: 1~2 near-dup, 1=4 exact → one cluster {1,2,4}, rep 1
    val pairs = Dedup.jaccardPairs(docs, "id", "text", 3, 0.5)
    val cl = Dedup.dupClusters(pairs)
    pairs.unpersist()
    val kept = Dedup.dedupByClusters(docs, "id", cl)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 5L))
    val nd = Dedup.nearDedup(docs, "id", "text",
      k = 32, bands = 16, shingleN = 3, threshold = 0.6)
      .select("id").as[Long].collect().toSet
    assert(nd == Set(1L, 3L, 5L))
  }

  test("dedupLinesCorpus: first occurrence wins, short lines spared, order kept") {
    val la = "A" * 40 // eligible (>= 30 chars)
    val lb = "B" * 35
    val lc = "C" * 33
    val fx = Seq(
      (1L, s"$la\nshort\n$lb", "s"),
      (2L, s"intro\n$la\ntail", "s"),   // loses la (first lives in doc 1)
      (3L, s"$lb\n$lb\nshort", "s"),    // loses BOTH lb copies (first is doc 1's)
      (4L, la, "s"),                    // loses its only line → ""
      (5L, s"$lc\n$lc\nend", "s")       // intra-doc dup: keeps pos 0 only
    ).toDF("doc_id", "text", "source")
    val out = Dedup.dedupLinesCorpus(fx, "doc_id", "text")
      .orderBy("doc_id").select("text").as[String].collect()
    assert(out(0) == s"$la\nshort\n$lb") // doc 1 untouched (owns both firsts)
    assert(out(1) == "intro\ntail")
    assert(out(2) == "short")
    assert(out(3) == "")
    assert(out(4) == s"$lc\nend")
    // short duplicated lines ("short") survive everywhere; non-text
    // columns ride through; empty text stays empty
    val out2 = Dedup.dedupLinesCorpus(
      fx.unionAll(Seq((6L, "", "t")).toDF("doc_id", "text", "source")),
      "doc_id", "text")
    assert(out2.filter($"doc_id" === 6L).select("text", "source")
      .as[(String, String)].head() == ("", "t"))
    assert(out2.columns.toSeq == fx.columns.toSeq)
    // Curate stage wrapper records itself
    val c = Curate(fx, "doc_id", "text").dedupLines()
    assert(c.stages == Seq("dedup_lines>=30ch"))
    assert(c.df.count() == 5)
  }

  test("capPerKey: exact per-key counts, layout-independent, superset on grow") {
    val d = (1L to 200L).map(i => (i, s"doc $i", s"dom${i % 7}"))
      .toDF("doc_id", "text", "domain")
    def run(df: org.apache.spark.sql.DataFrame, k: Long) =
      Curate(df, "doc_id", "text").capPerKey("domain", k).df
        .select("doc_id", "domain")
    val kept = run(d, 10L)
    // every key capped exactly (each dom has ~28 docs >= 10)
    val byKey = kept.groupBy("domain").count().collect()
    assert(byKey.length == 7 && byKey.forall(_.getLong(1) == 10L))
    // identical selection under a different physical layout
    val kept17 = run(d.repartition(17), 10L)
    assert(kept.exceptAll(kept17).count() == 0 &&
      kept17.exceptAll(kept).count() == 0)
    // growing the cap keeps the old selection (stable md5 order)
    assert(kept.exceptAll(run(d, 25L)).count() == 0)
    // cap above key size keeps everything; cap 0 keeps nothing
    assert(run(d, 1000L).count() == 200L && run(d, 0L).count() == 0L)
  }

  // Naive single-machine reference for the exact-substring dedup family:
  // materialized gram strings, exhaustive occurrence lists, the same
  // keep-one (lexicographically smallest (id, pos)) and per-token cut
  // rules the distributed operator documents.
  private def naiveSubstring(docs: Seq[(Long, String)], k: Int,
      minCount: Int): (Set[(Long, Int, Int)], Map[Long, String]) = {
    def norm(s: String) = s.toLowerCase.replaceAll("[^a-z0-9 ]", " ")
      .replaceAll(" +", " ").trim
    val toks = docs.map { case (id, t) => id -> norm(t).split(" ").toSeq }
    val occ = scala.collection.mutable.Map
      .empty[Seq[String], Vector[(Long, Int)]]
    for ((id, ts) <- toks; i <- 0 to ts.length - k)
      occ(ts.slice(i, i + k)) = occ.getOrElse(ts.slice(i, i + k),
        Vector.empty) :+ (id -> i)
    val redundant = occ.values.filter(_.size >= minCount).flatMap { os =>
      val canon = os.minBy(identity)
      os.filterNot(_ == canon)
    }.toVector
    val byDoc = redundant.groupBy(_._1).map { case (id, os) =>
      id -> os.map(_._2).sorted
    }
    val spans = byDoc.flatMap { case (id, starts) =>
      val islands = starts.foldLeft(Vector.empty[(Int, Int)]) {
        case (acc :+ ((s, e)), p) if p <= e => acc :+ (s -> (p + k))
        case (acc, p)                       => acc :+ (p -> (p + k))
      }
      islands.map { case (s, e) => (id, s, e) }
    }.toSet
    val stripped = docs.map { case (id, t) =>
      val sp = spans.collect { case (i, s, e) if i == id => (s, e) }
      if (sp.isEmpty) id -> t
      else id -> toks.collectFirst { case (i, ts) if i == id => ts }.get
        .zipWithIndex
        .collect { case (tok, j) if !sp.exists(se => j >= se._1 && j < se._2) => tok }
        .mkString(" ")
    }.toMap
    (spans, stripped)
  }

  test("repeatedGramSpans/strip: hand-derived spans, keep-one contract") {
    val fx = Seq(
      (0L, "a b c d e f g h i j"),
      (1L, "x a b c d e y z w q"),
      (2L, "a b c d e f k k a b c d e f k k")
    ).toDF("id", "text")
    val spans = Dedup.repeatedGramSpans(fx, "id", "text", k = 4)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 0 holds every canonical; doc 1 duplicates "a b c d"/"b c d e"
    // at starts 1,2 -> merged [1,6); doc 2 repeats its first 6 tokens
    // (starts 0,1,2 and 8..12 with unique junction grams between) ->
    // [0,6) and [8,16)
    assert(spans == Set((1L, 1, 6), (2L, 0, 6), (2L, 8, 16)))
    val stripped = Dedup.stripRepeatedSubstrings(fx, "id", "text", k = 4)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // the canonical "d e f k" occurrence at doc2@3 is inside a removed
    // span (covered by OTHER redundant grams) and is cut with it — the
    // documented per-token rule
    assert(stripped == Map(
      0L -> "a b c d e f g h i j",
      1L -> "x y z w q",
      2L -> "k k"))
    // minCount=3: only grams occurring 3+ times flag; doc2's tail run
    // shrinks (the count-2 grams "d e f k"/"e f k k" no longer flag)
    val spans3 = Dedup.repeatedGramSpans(fx, "id", "text", k = 4,
        minCount = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(spans3 == Set((1L, 1, 6), (2L, 0, 6), (2L, 8, 14)))
    // naive reference agrees on all of the above
    val fxSeq = Seq(
      0L -> "a b c d e f g h i j",
      1L -> "x a b c d e y z w q",
      2L -> "a b c d e f k k a b c d e f k k")
    val (nSpans, nStrip) = naiveSubstring(fxSeq, 4, 2)
    assert(nSpans == spans && nStrip == stripped)
    assert(naiveSubstring(fxSeq, 4, 3)._1 == spans3)
    // r16: past the flagged-set broadcast gate the census join-back
    // engages the bloom screen path — spans/strips identical (the bloom
    // has no false negatives; false positives only re-enter the exact
    // join). Gate forced to 0 so the screen runs on this tiny fixture.
    spark.conf.set("spark.graft.gramFlagBroadcastRows", "0")
    try {
      val spansB = Dedup.repeatedGramSpans(fx, "id", "text", k = 4)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      assert(spansB == spans)
      val strippedB = Dedup.stripRepeatedSubstrings(fx, "id", "text", k = 4)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(strippedB == stripped)
    } finally spark.conf.unset("spark.graft.gramFlagBroadcastRows")
  }

  test("repeatedGramSpans/strip: naive parity on real fixture + plants") {
    val d = graft.ops.Exprs.table(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id", $"text")
    val ex = concat_ws(" ", slice(Text.tokens($"text"), 11, 20))
    val corpus = d
      .unionByName(d.filter($"doc_id" < 4)
        .select(($"doc_id" + 500000L).as("doc_id"), ex.as("text")))
      .unionByName(d.filter($"doc_id" < 2)
        .select(($"doc_id" + 600000L).as("doc_id"),
          concat_ws(" ", ex, ex).as("text")))
      .unionByName(d.filter($"doc_id" < 2)
        .select((-$"doc_id" - 1).cast("long").as("doc_id"), ex.as("text")))
    val spark_ = Dedup.repeatedGramSpans(corpus, "doc_id", "text", k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val strippedS = Dedup
      .stripRepeatedSubstrings(corpus, "doc_id", "text", k = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val local = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toSeq
    val (nSpans, nStrip) = naiveSubstring(local, 8, 2)
    assert(spark_ == nSpans)
    // organic fixture plants whole-doc exact duplicates: redundant
    // copies must strip to empty, and SOME doc must strip fully
    assert(strippedS.values.exists(_ == ""))
    // negative-id plants moved the canonical off docs 0/1: the organic
    // docs now carry a flagged span over the excerpt region
    assert(nSpans.exists { case (id, _, _) => id == 0L || id == 1L })
    val diff = nStrip.keySet.filter(k => nStrip(k) != strippedS(k))
    assert(diff.isEmpty, s"strip mismatch on ids: ${diff.take(5)}")
  }

  test("semanticDedup: within-cell min-id pruning, cross-cell pairs kept") {
    // two well-separated directions: e1-ish (cell of seed 1) and e2-ish
    // (cell of seed 2). ids 1,10,11 are mutual near-dups in cell A (min
    // id 1 survives); ids 2,20 near-dups in cell B (2 survives); id 30
    // sits in cell B but is NOT a near-dup of anything. ids 40/41 are an
    // exact pair STRADDLING cells is impossible (same vector -> same
    // cell), so the cross-cell miss is exercised with two vectors at
    // cosine ~0.995 that quantize to DIFFERENT seeds — both kept: the
    // documented SemDeDup approximation.
    val a = Array(1f, 0f, 0f, 0f); val b = Array(0f, 1f, 0f, 0f)
    def mix(x: Float, y: Float) = Array(x, y, 0f, 0f)
    val rows = Seq(
      1L -> a, 10L -> mix(1f, 0.01f), 11L -> mix(1f, -0.01f),
      2L -> b, 20L -> mix(0.01f, 1f),
      30L -> mix(0.3f, 1f), // cell B, cosine to 2/20 ~0.95 < threshold
      // straddling pair: ~45 degrees, one leans to a, one to b,
      // cosine(40,41) ~ 0.9995 but argmax cells differ
      40L -> mix(1f, 0.98f), 41L -> mix(0.98f, 1f)
    ).map { case (i, v) => (i, v.toSeq) }
    val df = rows.toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.99, seedIds = Seq(1L, 2L))
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 30L, 40L, 41L),
      s"got $kept")
    // and the graph-exact path DOES drop one of the straddling pair —
    // the contrast that defines the approximation
    val keptExact = Dedup.dedupByEmbedding(df, "vec_id", "embedding",
        threshold = 0.99, bands = 8, bandBits = 8, dim = 4)
      .collect().map(_.getLong(0)).toSet
    assert(!keptExact.contains(41L) && keptExact.contains(40L))
  }

  test("semanticDedup: plan is an equi-join on cell, never cartesian") {
    val df = (0L until 64L)
      .map(i => (i, Array.tabulate(8)(j => math.cos(i * 3 + j).toFloat).toSeq))
      .toDF("vec_id", "embedding")
    val plan = Dedup.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.99, nlist = 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("semanticDedup: fitted-centroid mode prunes exact copies") {
    // no seeds: Ivf.fitCentroids drives assignment; exact copies land in
    // the same cell whatever the centroids are, so they must drop
    val base = (0L until 64L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat).toSeq)
    }
    val copies = base.take(6).map { case (i, v) => (i + 1000L, v) }
    val df = (base ++ copies).toDF("vec_id", "embedding")
    val kept = Dedup.semanticDedup(df, "vec_id", "embedding",
        threshold = 0.999, nlist = 4)
      .collect().map(_.getLong(0)).toSet
    assert((1000L until 1006L).forall(!kept.contains(_)))
    assert((0L until 6L).forall(kept.contains))
  }

  test("semanticDedupTwoLevel: seeded kept set == driver restatement") {
    // 4 base directions -> 2 coarse cells (seeds 0, 2) with 2 sub-seeds
    // each; near-dup plants inside sub-cells must collapse to min id,
    // pairs split across SUB cells of the same coarse cell must both
    // survive (the two-level refinement is coarser-than-flat semantics,
    // restated by the driver reference below from cosine arithmetic).
    def v(xs: Double*) = xs.toArray
    val rows: Seq[(Long, Array[Double])] = Seq(
      0L -> v(1, 0, 0, 0), 1L -> v(0.95, 0.3, 0, 0), // coarse A subs
      2L -> v(0, 0, 1, 0), 3L -> v(0, 0, 0.95, 0.3), // coarse B subs
      10L -> v(1, 0.005, 0, 0), 11L -> v(1, -0.005, 0, 0), // dups of 0
      12L -> v(0.96, 0.29, 0, 0),                     // near 1
      20L -> v(0.001, 0, 1, 0),                       // dup of 2
      30L -> v(0.4, 0.4, 0.1, 0)) // lone row, no near-dup
    val df = rows.map { case (i, a) => (i, a.toSeq) }
      .toDF("vec_id", "embedding")
    val got = Dedup.semanticDedupTwoLevel(df, "vec_id", "embedding",
        threshold = 0.99, seedIds = Seq(0L, 2L),
        subSeedIds = Seq(Seq(0L, 1L), Seq(2L, 3L)))
      .collect().map(_.getLong(0)).toSet
    // driver restatement: coarse argmax over seeds {0,2}, then argmax
    // over that cell's sub-seeds; drop iff smaller-id same-(coarse,sub)
    // row has cosine >= 0.99
    val byId = rows.toMap
    def cos(a: Array[Double], b: Array[Double]) = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) *
        math.sqrt(b.map(x => x * x).sum))
    }
    val coarseSeeds = Seq(0L, 2L).map(byId)
    val subSeeds = Seq(Seq(0L, 1L).map(byId), Seq(2L, 3L).map(byId))
    def cell(a: Array[Double]): (Int, Int) = {
      val c = coarseSeeds.indices.maxBy(i => (cos(a, coarseSeeds(i)), -i))
      (c, subSeeds(c).indices.maxBy(i => (cos(a, subSeeds(c)(i)), -i)))
    }
    val want = rows.filter { case (id, a) =>
      !rows.exists { case (j, b) =>
        j < id && cell(b) == cell(a) && cos(a, b) >= 0.99 }
    }.map(_._1).toSet
    assert(got == want, s"got $got want $want")
    // the semantics this mode exists for: 10/11 collapse onto 0; the
    // exact copy 20 collapses onto 2; sub-cell split rows 1/12 survive
    // alongside 0's cluster; 30 untouched
    assert(got.contains(0L) && !got.contains(10L) && !got.contains(11L))
    assert(!got.contains(20L) && got.contains(2L))
    assert(got.contains(1L) || got.contains(12L))
  }

  test("fitSubCentroids: deterministic across partition layouts") {
    // the sub-quantizer fit claims full determinism (hash-ordered,
    // value-tie-broken per-cell samples): the same data in a different
    // physical layout must produce bit-identical sub-centroid matrices
    val rows = (0L until 256L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j)).toSeq)
    }
    val df = rows.toDF("vec_id", "embedding")
    val coarse = graft.pipeline.Ivf.fitCentroids(df, "embedding", 4)
    val s1 = graft.pipeline.Ivf.fitSubCentroids(df, "embedding", coarse,
      subK = 3, samplePerCell = 16)
    val s2 = graft.pipeline.Ivf.fitSubCentroids(
      df.repartition(7).sortWithinPartitions("embedding"), "embedding",
      coarse, subK = 3, samplePerCell = 16)
    assert(s1.length == s2.length)
    s1.indices.foreach { c =>
      assert(s1(c).length == s2(c).length, s"cell $c sub count")
      s1(c).indices.foreach(i =>
        assert(s1(c)(i).sameElements(s2(c)(i)), s"cell $c sub $i"))
    }
  }

  test("semanticDedupTwoLevel: fitted mode prunes copies; equi-join plan") {
    val base = (0L until 96L).map { i =>
      (i, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat).toSeq)
    }
    val copies = base.take(6).map { case (i, v) => (i + 1000L, v) }
    val df = (base ++ copies).toDF("vec_id", "embedding")
    val result = Dedup.semanticDedupTwoLevel(df, "vec_id", "embedding",
      threshold = 0.999, coarseNlist = 4, subPerCell = 3,
      samplePerCell = 16)
    val plan = result.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    val kept = result.collect().map(_.getLong(0)).toSet
    // exact copies share both quantizer levels whatever Lloyd fit, so
    // they must drop; the copied originals survive (copies have larger
    // ids and nothing else sits at cosine >= 0.999)
    assert((1000L until 1006L).forall(!kept.contains(_)))
    assert((0L until 6L).forall(kept.contains))
  }

  test("splitAssign: deterministic, group-atomic, proportional") {
    val rows = (0L until 10000L).map(i => (i, s"g${i / 5}"))
      .toDF("id", "grp")
    val fr = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val once = rows.withColumn("split",
      Curate.splitAssign($"grp", fr, seed = "s1"))
    // group-atomic: every group maps to exactly one split
    assert(once.groupBy("grp")
      .agg(countDistinct($"split").as("k")).filter($"k" > 1).count() == 0)
    // deterministic: recomputation is byte-identical
    val again = rows.withColumn("split",
      Curate.splitAssign($"grp", fr, seed = "s1"))
    assert(once.exceptAll(again).count() == 0)
    // proportions near fractions (2000 groups, +-5 pp)
    val by = once.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(math.abs(by("train") / 10000.0 - 0.8) < 0.05, by.toString)
    // a different seed re-deals
    val re = rows.withColumn("split",
      Curate.splitAssign($"grp", fr, seed = "s2"))
    assert(once.exceptAll(re).count() > 0)
    // null keys land in the LAST split
    val n = Seq((1L, null: String)).toDF("id", "grp")
      .select(Curate.splitAssign($"grp", fr)).collect()(0).getString(0)
    assert(n == "test")
    intercept[IllegalArgumentException] {
      Curate.splitAssign($"grp", Seq("a" -> 0.5, "b" -> 0.6))
    }
  }

  test("unigramLogProbs: hand-computed corpus LM scores") {
    val d = Seq((1L, "aa aa bb"), (2L, "bb cc"), (3L, ""), (4L, "  "))
      .toDF("doc_id", "text")
    // vocab: aa:2 bb:2 cc:1, total 5; minCount=2 -> cc is OOV (mass 0.5)
    val got = Text.unigramLogProbs(d, "doc_id", "text", minCount = 2L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    val lpA = math.log(2.0 / 5); val lpOov = math.log(0.5 / 5)
    assert(got(1L)._1 == 3 && math.abs(got(1L)._2.get - lpA) < 1e-12)
    assert(got(2L)._1 == 2 &&
      math.abs(got(2L)._2.get - (lpA + lpOov) / 2) < 1e-12)
    assert(got(3L) == (0L -> None) && got(4L) == (0L -> None))
    // topV=1 cuts the count-tied vocab deterministically by token: "aa"
    // stays, "bb" joins cc in the OOV mass
    val cut = Text.unigramLogProbs(d, "doc_id", "text", topV = 1)
      .filter($"doc_id" === 2L).collect()(0)
    assert(math.abs(cut.getDouble(2) - lpOov) < 1e-12)
  }

  test("bigramLogProbs: hand-computed stupid-backoff scores") {
    // corpus unigrams: aa:4 bb:3 cc:1, total 8
    // bigrams: (aa,bb):2 (bb,aa):2 (aa,cc):1
    val d = Seq((1L, "aa bb aa bb"), (2L, "aa cc"), (3L, "bb aa"),
      (4L, ""))
      .toDF("doc_id", "text")
    def fetch(minCount: Long) =
      Text.bigramLogProbs(d, "doc_id", "text", minCount = minCount)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toMap
    val got = fetch(1L)
    val lnAa = math.log(4.0 / 8); val lnBb = math.log(3.0 / 8)
    // doc1: aa | aa->bb | bb->aa | aa->bb = ln.5, ln(2/4), ln(2/3), ln(2/4)
    val d1 = (lnAa + math.log(2.0 / 4) * 2 + math.log(2.0 / 3)) / 4
    assert(got(1L)._1 == 4 && math.abs(got(1L)._2.get - d1) < 1e-12)
    // doc2: aa | aa->cc(count 1) = (ln.5 + ln(1/4)) / 2
    val d2 = (lnAa + math.log(1.0 / 4)) / 2
    assert(got(2L)._1 == 2 && math.abs(got(2L)._2.get - d2) < 1e-12)
    // doc3: bb | bb->aa = (ln(3/8) + ln(2/3)) / 2
    val d3 = (lnBb + math.log(2.0 / 3)) / 2
    assert(got(3L)._1 == 2 && math.abs(got(3L)._2.get - d3) < 1e-12)
    assert(got(4L) == (0L -> None))
    // minCount=2 prunes (aa,cc) and the cc unigram: doc2's second token
    // BACKS OFF to alpha * OOV — the stupid-backoff branch
    val got2 = fetch(2L)
    val d2b = (lnAa + (math.log(0.4) + math.log(0.5 / 8))) / 2
    assert(math.abs(got2(2L)._2.get - d2b) < 1e-12)
    // surviving bigrams are untouched by the pruning
    assert(math.abs(got2(1L)._2.get - d1) < 1e-12)
  }

  test("ngramLogProbs: hand-computed trigram scores + order-2 parity") {
    // corpus unigrams: a:5 b:5 c:1, total 11; bigrams ab:4 ba:3 bc:1;
    // trigrams aba:2 bab:2 abc:1
    val d = Seq((1L, "a b a b a"), (2L, "a b c"), (3L, "b a b"),
      (4L, "")).toDF("doc_id", "text")
    val got = Text.ngramLogProbs(d, "doc_id", "text", order = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
      .toMap
    // doc2 "a b c": uni a | bigram ab | trigram abc/ctx ab
    val d2 = (math.log(5.0 / 11) + math.log(4.0 / 5) +
      math.log(1.0 / 4)) / 3
    assert(got(2L)._1 == 3 && math.abs(got(2L)._2.get - d2) < 1e-12)
    // doc3 "b a b": uni b | bigram ba | trigram bab/ctx ba
    val d3 = (math.log(5.0 / 11) + math.log(3.0 / 5) +
      math.log(2.0 / 3)) / 3
    assert(got(3L)._1 == 3 && math.abs(got(3L)._2.get - d3) < 1e-12)
    assert(got(4L) == (0L -> None))
    // minCount=2: trigram abc, bigram bc AND unigram c all pruned ->
    // doc2's 3rd token pays TWO alpha steps down to the OOV floor
    val got2 = Text.ngramLogProbs(d, "doc_id", "text", order = 3,
        minCount = 2L)
      .filter($"doc_id" === 2L)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val d2b = (math.log(5.0 / 11) + math.log(4.0 / 5) +
      (2 * math.log(0.4) + math.log(0.5 / 11))) / 3
    assert(math.abs(got2(2L) - d2b) < 1e-12)
    // order=2 must agree with the oracle-pinned bigramLogProbs exactly
    val bi = Seq((1L, "aa bb aa bb"), (2L, "aa cc"), (3L, "bb aa"),
      (4L, "")).toDF("doc_id", "text")
    for (mc <- Seq(1L, 2L)) {
      val a = Text.bigramLogProbs(bi, "doc_id", "text", minCount = mc)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toMap
      val b = Text.ngramLogProbs(bi, "doc_id", "text", order = 2,
          minCount = mc)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toMap
      assert(a.keySet == b.keySet)
      a.foreach { case (k, (n, lp)) =>
        assert(b(k)._1 == n)
        (lp, b(k)._2) match {
          case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-12)
          case (x, y) => assert(x == y)
        }
      }
    }
  }

  test("ngramLogProbs: deterministic across repeated runs (local input)") {
    // r15 regression pin: a concurrent level-table build corrupted gram
    // keys when the levels shared `base`'s lambda-bearing tokenizer
    // subtree over a LOCAL relation (ConvertToLocalRelation evaluates
    // shared NamedLambdaVariable instances driver-side during each
    // job's optimization — see Par.scala's safety note). The corruption
    // was nondeterministic (~1 in 3 runs), so this pins bit-identical
    // results across repetitions on exactly the racy input class: a
    // local-relation corpus, order 5, both key modes.
    val d = Seq((0L, "d c d b b"), (1L, ""), (2L, "b c b d c c a a d c"),
      (3L, "a d c a a c d c d c"), (4L, "d c c a b"),
      (5L, "a a a d b a d c b c")).toDF("doc_id", "text")
    def fetch(fp: Boolean) =
      Text.ngramLogProbs(d, "doc_id", "text", order = 5, minCount = 1L,
          fingerprintKeys = fp)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toMap
    val first = fetch(true)
    (1 to 3).foreach { _ => assert(fetch(true) == first) }
    val firstStr = fetch(false)
    assert(firstStr.keySet == first.keySet)
    first.foreach { case (k, (n, lp)) =>
      assert(firstStr(k)._1 == n)
      (lp, firstStr(k)._2) match {
        case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-12)
        case (x, y) => assert(x == y)
      }
    }
    (1 to 2).foreach { _ => assert(fetch(false) == firstStr) }
  }

  test("ngramLogProbs: shuffled-hash level joins are value-identical " +
      "past the broadcast gate") {
    // r16 — with lmBroadcastRows=0 every level takes the over-gate path;
    // lmShuffledHash picks shuffled-hash vs sort-merge for it. All three
    // configurations must score identically, and the over-gate SHJ plan
    // must carry ShuffledHashJoin (not SortMergeJoin) level joins.
    val d = Seq((0L, "d c d b b a c d"), (1L, ""),
      (2L, "b c b d c c a a d c"), (3L, "a d c a a c d c d c"),
      (4L, "d c c a b"), (5L, "a a a d b a d c b c")).toDF("doc_id", "text")
    def run() = Text.ngramLogProbs(d, "doc_id", "text", order = 3,
      minCount = 1L)
    def fetch() = run().collect().map(r => r.getLong(0) ->
      (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    // join-strategy changes permute the rows feeding each doc's avg()
    // partial aggregates, so scores agree to FP-accumulation order
    // (1e-12), not bit-exactly — same tolerance as every LM parity
    // test here (declared queries round to 6 decimals).
    def sameScores(a: Map[Long, (Long, Option[Double])],
        b: Map[Long, (Long, Option[Double])]): Unit = {
      assert(a.keySet == b.keySet)
      a.foreach { case (k, (n, lp)) =>
        assert(b(k)._1 == n)
        (lp, b(k)._2) match {
          case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-12)
          case (x, y) => assert(x == y)
        }
      }
    }
    val dflt = fetch()
    try {
      // NB the level num/denom TABLE joins stay sort-merge in both
      // configs; only the order(=3) hinted STREAM joins flip strategy,
      // so compare counts, not absence. Auto-broadcast OFF: on this
      // tiny fixture the checkpointed level tables carry small origin
      // stats and would broadcast on their own, masking the hint.
      def nSmj(p: String) = p.sliding("SortMergeJoin".length)
        .count(_ == "SortMergeJoin")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.graft.lmBroadcastRows", "0")
      spark.conf.set("spark.graft.lmShuffledHash", "true")
      val shjPlan = run().queryExecution.sparkPlan.toString
      assert(shjPlan.contains("ShuffledHashJoin"),
        s"over-gate levels should plan shuffled-hash:\n$shjPlan")
      sameScores(fetch(), dflt)
      spark.conf.set("spark.graft.lmShuffledHash", "false")
      val smjPlan = run().queryExecution.sparkPlan.toString
      assert(!smjPlan.contains("ShuffledHashJoin") &&
        nSmj(smjPlan) >= nSmj(shjPlan) + 3,
        s"lmShuffledHash=false should restore sort-merge stream joins:\n" +
          smjPlan)
      sameScores(fetch(), dflt)
    } finally {
      spark.conf.unset("spark.graft.lmBroadcastRows")
      spark.conf.unset("spark.graft.lmShuffledHash")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

}
