package graft

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll
import graft.core._
import graft.validators._

/** Property layer (SURVEY §5: the reference has no property-based tests;
  * ScalaCheck adds it here). Each property cross-checks a distributed
  * metric against a plain-Scala reference computation on arbitrary data. */
object GraftProps extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withMaxDiscardRatio(10)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val smallInts: Gen[List[Int]] =
    Gen.nonEmptyListOf(Gen.choose(-50, 50)).map(_.take(200))

  property("null count matches injected nulls") =
    forAll(Gen.nonEmptyListOf(Gen.option(Gen.choose(0, 100))).map(_.take(200))) {
      xs =>
        val df = xs.toDF("v")
        val r = SuiteRunner.run(df, Seq(NullCheck(Seq("v"))),
          SuiteRunner.Config(format = ResultFormat.BooleanOnly))
        val expected = xs.count(_.isEmpty).toLong
        val got = r.checks.head.issues.headOption.map(_.count).getOrElse(0L)
        got == expected
    }

  property("range violations match manual count") =
    forAll(smallInts, Gen.choose(-40, 0), Gen.choose(1, 40)) { (xs, lo, hi) =>
      val df = xs.toDF("v")
      val r = SuiteRunner.run(df,
        Seq(RangeCheck("v", Some(lo.toDouble), Some(hi.toDouble))),
        SuiteRunner.Config(format = ResultFormat.BooleanOnly))
      val expected = xs.count(x => x < lo || x > hi).toLong
      r.checks.head.issues.headOption.map(_.count).getOrElse(0L) == expected
    }

  property("duplicate rows = n - distinct") =
    forAll(smallInts) { xs =>
      val df = xs.toDF("v")
      val r = SuiteRunner.run(df, Seq(UniqueCheck(Seq("v"))),
        SuiteRunner.Config(format = ResultFormat.BooleanOnly))
      val expected = (xs.size - xs.distinct.size).toLong
      r.checks.head.issues.headOption.map(_.count).getOrElse(0L) == expected
    }

  private def luhnRef(s: String): Boolean =
    s.length >= 2 && s.forall(_.isDigit) && {
      val sum = s.reverse.zipWithIndex.map { case (ch, i) =>
        val d = ch - '0'
        if (i % 2 == 1) { val x = d * 2; if (x > 9) x - 9 else x } else d
      }.sum
      sum % 10 == 0
    }

  property("Luhn expression agrees with reference implementation") =
    forAll(Gen.listOfN(12, Gen.numChar).map(_.mkString)) { digits =>
      val df = Seq(digits).toDF("c")
      val got = df.select(Checksums.luhnValid(
        org.apache.spark.sql.functions.col("c")).as("ok"))
        .head().getBoolean(0)
      got == luhnRef(digits)
    }

  property("PSI of identical distributions is ~0; TV symmetric bound") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 9)).map(_.take(300))) { xs =>
      val a = xs.toDF("v"); val b = xs.toDF("v")
      val pq = graft.drift.Drift.binnedPq(a, b, "v", 10, 0, 10)
      val psi = graft.drift.Drift.psi(pq)
      val tv = graft.drift.Drift.totalVariation(pq)
      math.abs(psi) < 1e-9 && tv >= 0 && tv <= 1
    }

  property("entropy within [0, ln k]") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 4)).map(_.take(300))) { xs =>
      val df = xs.toDF("v")
      val h = df.groupBy("v").count()
        .agg(graft.ops.Exprs.entropyFromCounts("count")).head().getDouble(0)
      val k = xs.distinct.size
      h >= -1e-9 && h <= math.log(k.toDouble) + 1e-9
    }

  property("SimHash deterministic and permutation-sensitive only to tokens") =
    forAll(Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
      .map(_.take(30))) { tokens =>
      val df = Seq((1, tokens), (2, tokens)).toDF("id", "toks")
      val fps = df.select(graft.functions.SimHash64(
        org.apache.spark.sql.functions.col("toks"))).collect().map(_.getLong(0))
      fps(0) == fps(1)
    }

  property("jaccard pairs match brute-force on tiny corpora") =
    forAll(Gen.listOfN(5, Gen.listOfN(8,
      Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" ")))) { docs =>
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("id", "text")
      val got = graft.pipeline.Dedup.jaccardPairs(df, "id", "text", 2, 0.4)
        .collect().map(r => ((r.getLong(0), r.getLong(1)),
          BigDecimal(r.getDouble(2)).setScale(9, BigDecimal.RoundingMode.HALF_UP)))
        .toMap
      def shingles(t: String): Set[String] =
        t.split(" ").toSeq.sliding(2).map(_.mkString(" ")).toSet
      val expected = (for {
        i <- docs.indices; j <- docs.indices if i < j
        si = shingles(docs(i)); sj = shingles(docs(j))
        uni = (si ++ sj).size if uni > 0
        jac = si.intersect(sj).size.toDouble / uni if jac >= 0.4
      } yield ((i.toLong, j.toLong),
        BigDecimal(jac).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toMap
      got == expected
    }
  property("digit bumps always break the CN-ID checksum") =
    forAll(Gen.oneOf("11010519491231002X", "360102198001011235",
        "440301197512304566", "120104198907056788"),
      Gen.choose(0, 16), Gen.choose(1, 9)) { (base, pos, delta) =>
      val bumped = base.substring(0, pos) +
        (((base.charAt(pos) - '0') + delta) % 10).toString +
        base.substring(pos + 1)
      val df = Seq(base, bumped).toDF("v")
      val r = df.select(graft.validators.LocalFormats.chineseIdValid(
        org.apache.spark.sql.functions.col("v")).as("ok")).collect()
      // weights are all coprime to 11, so any single-digit change shifts
      // the residue: base valid, bump invalid
      r(0).getBoolean(0) && !r(1).getBoolean(0)
    }

  property("single-digit bumps always break IBAN mod-97") =
    forAll(Gen.oneOf("GB82WEST12345698765432", "DE89370400440532013000",
        "NL91ABNA0417164300"),
      Gen.choose(1, 9)) { (base, delta) =>
      // bump a check-digit position (always numeric)
      val pos = 2
      val bumped = base.substring(0, pos) +
        (((base.charAt(pos) - '0') + delta) % 10).toString +
        base.substring(pos + 1)
      val df = Seq(base, bumped).toDF("v")
      val r = df.select(graft.validators.Checksums.ibanValid(
        org.apache.spark.sql.functions.col("v")).as("ok")).collect()
      r(0).getBoolean(0) && !r(1).getBoolean(0)
    }

  property("pointer-doubled depths equal naive BFS on random parent graphs") =
    forAll(Gen.choose(10, 80).flatMap { n =>
      // arbitrary parent function: root (null), valid id, self-loop, or a
      // dangling id outside the node set — every edge case at once
      Gen.listOfN(n, Gen.frequency(
        2 -> Gen.const(-1L),                  // root
        8 -> Gen.choose(0L, n.toLong - 1),    // some node (cycles possible)
        1 -> Gen.const(-2L),                  // self (marker)
        1 -> Gen.const(9999L)))               // dangling
    }) { parents =>
      val n = parents.length
      val maxDepth = 16
      val rows = parents.zipWithIndex.map { case (p, i) =>
        val parent: Option[Long] =
          if (p == -1L) None
          else if (p == -2L) Some(i.toLong)
          else Some(p)
        (i.toLong, parent)
      }
      // driver-side naive reference: bounded parent walk per node
      val parentOf = rows.toMap
      def depthOf(id: Long): Int = {
        var cur = id
        var steps = 0 // edges traversed so far
        while (steps <= maxDepth) {
          parentOf.get(cur) match {
            case None => return -1 // dangling: cur is not a node
            case Some(None) => // cur is a root
              return if (steps + 1 <= maxDepth) steps + 1 else -1
            case Some(Some(p)) => cur = p; steps += 1
          }
        }
        -1 // cycle or depth beyond the cap: the walk never terminated
      }
      val expected = rows.map(r => depthOf(r._1)).filter(_ > 0)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val unreached = n.toLong - expected.values.sum
      val expectedHist =
        if (unreached > 0) expected + (-1 -> unreached) else expected
      val got = graft.validators.Hierarchy
        .depthHistogram(rows.toDF("id", "parent"), "id", "parent", maxDepth)
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      got == expectedHist
    }

  property("decontaminate removes exactly the contaminated ids (idempotent)") =
    forAll(Gen.choose(5, 25), Gen.choose(0, 4)) { (nDocs, nBench) =>
      // random corpora of word sequences; benchmark = a prefix slice, so
      // overlap is guaranteed for copied docs and possible via shared runs
      val docs = (0 until nDocs).map { i =>
        (i.toLong, (0 until 20).map(j => s"w${(i * 7 + j * 3) % 11}").mkString(" "))
      }.toDF("doc_id", "text")
      val bench = docs.filter(org.apache.spark.sql.functions.col("doc_id") < nBench)
        .select(org.apache.spark.sql.functions.col("text"))
      val flagged = graft.pipeline.Dedup.contaminatedIds(
        docs, "doc_id", "text", bench, "text", n = 5)
        .collect().map(_.getLong(0)).toSet
      val surv = graft.pipeline.Dedup.decontaminate(
        docs, "doc_id", "text", bench, "text", n = 5)
      val survIds = surv.collect().map(_.getLong(0)).toSet
      // partition: survivors = all − flagged, planted docs always flagged
      survIds == (0L until nDocs).toSet -- flagged &&
        (0L until nBench).forall(flagged.contains) &&
        // idempotence: re-decontaminating survivors removes nothing new
        graft.pipeline.Dedup.decontaminate(surv, "doc_id", "text",
          bench, "text", n = 5).count() == survIds.size
    }

  property("mixDomains kept set is monotone in the keep probability") =
    forAll(Gen.choose(0.1, 0.5), Gen.choose(0.5, 0.9)) { (w1, w2) =>
      val docs = (1 to 300).map(i => (i.toLong, "t", "s"))
        .toDF("doc_id", "text", "source")
      def kept(w: Double) = graft.pipeline.Curate(docs, "doc_id", "text")
        .mixDomains("source", Map("s" -> w))
        .df.collect().map(_.getLong(0)).toSet
      val (k1, k2) = (kept(math.min(w1, w2)), kept(math.max(w1, w2)))
      // same stage position + seed => same hash; larger keep-probability
      // strictly widens the threshold, so the smaller sample is nested
      k1.subsetOf(k2)
    }

  property("SeqScan long path equals window count on random integer walks") =
    forAll(Gen.listOfN(200, Gen.choose(-5L, 50L))) { steps =>
      val rows = steps.zipWithIndex.map { case (dv, i) =>
        (i.toLong, steps.take(i + 1).sum)
      }
      val df = rows.toDF("ord", "v")
      val dist = graft.ops.SeqScan.adjacentViolationsLong(df,
        org.apache.spark.sql.functions.col("ord"),
        org.apache.spark.sql.functions.col("v"),
        (_, pv, _, cv) => pv.nonEmpty && cv.nonEmpty && cv.get < pv.get)
      val expected = rows.sortBy(_._1).map(_._2).sliding(2)
        .count { case Seq(a, b) => b < a; case _ => false }
      dist == expected
    }

  property("FK orphan count == set-difference on random key multisets") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0L, 30L)).map(_.take(100)),
      Gen.listOf(Gen.choose(0L, 20L)).map(_.take(40))) { (childKeys, parentKeys) =>
      val child = childKeys.map(k => (k, s"c$k")).toDF("fk", "payload")
      val parent = parentKeys.map(k => (k, s"p$k")).toDF("pk", "name")
      val issues = graft.validators.ForeignKeyCheck(
        "child", Seq("fk"), "parent", Seq("pk"))
        .run(Map("child" -> child, "parent" -> parent))
      val got = issues.headOption.map(_.count).getOrElse(0L)
      val expected = childKeys.count(k => !parentKeys.contains(k)).toLong
      got == expected
    }

  property("Grubbs fires exactly when max|x-mean|/sd exceeds the critical G") =
    forAll(Gen.listOfN(20, Gen.choose(-10.0, 10.0)), Gen.choose(0.0, 80.0)) {
      (base, spike) =>
        val xs = spike :: base
        val r = SuiteRunner.run(xs.toDF("v"),
          Seq(GrubbsCheck("v")),
          SuiteRunner.Config(format = ResultFormat.BooleanOnly))
        val n = xs.size
        val mean = xs.sum / n
        val sd = math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1))
        val fired = r.checks.head.issues.nonEmpty
        if (sd == 0.0) !fired
        else {
          val g = xs.map(x => math.abs(x - mean)).max / sd
          fired == (g > graft.validators.Grubbs.criticalValue(n, 0.05))
        }
    }

  property("learned baseline brackets every value and pins null columns") =
    forAll(Gen.nonEmptyListOf(Gen.option(Gen.choose(-1000, 1000)))
      .map(_.take(150))) { xs =>
      val df = xs.toDF("v")
      val b = graft.profiler.Learn.learn(df)
      val col = b.columns.find(_.name == "v").get
      val present = xs.flatten
      val minOk = col.min.forall(m =>
        present.isEmpty || present.min.toDouble >= m.toDouble)
      val maxOk = col.max.forall(m =>
        present.isEmpty || present.max.toDouble <= m.toDouble)
      val nullOk = math.abs(col.nullRatio -
        xs.count(_.isEmpty).toDouble / xs.size) < 1e-9
      minOk && maxOk && nullOk
    }

  // ---- native text kernels: parity fuzz vs the regex/HOF forms they
  // replaced, over adversarial unicode (case mappings that cross the
  // ASCII boundary, full-width chars, surrogate pairs, combining marks,
  // empty/whitespace) — exactly where a byte-loop rewrite can drift

  private val unicodeChunk: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(8)),
    Gen.listOfN(4, Gen.choose(32.toChar, 126.toChar)).map(_.mkString),
    Gen.oneOf("ÀÉÎøü", "ünïcödé", "ẞß", "İstanbul", "ıI",
      "KÅ",               // Kelvin sign -> k, Angstrom -> å
      "ΣΙΣΥΦΟΣ σίσυφος",            // final-sigma case mapping
      "０１２３４５６７８９", "ＡＢＣａｂｃ", // full-width digits/letters
      "的是了中文", "日本語テスト", "한국어",
      "😀🚀🎉", "𝐀𝐁𝐂", "𐍈",          // surrogate pairs
      "ȧb̈",             // combining marks
      "\t\n\r ", "  ", ""),
    Gen.listOfN(3, Gen.choose(0x20, 0x2fff)).map(_.map(_.toChar).mkString),
    Gen.listOfN(2, Gen.choose(0x10000, 0x1ffff))
      .map(_.flatMap(Character.toChars(_).toSeq).mkString))
  private val unicodeStr: Gen[String] =
    Gen.listOf(unicodeChunk).map(_.mkString(" ").take(120))

  property("normalize_text kernel == two-regex form on random unicode") =
    forAll(Gen.listOfN(8, unicodeStr)) { xs =>
      val df = xs.zipWithIndex.map { case (s, i) => (i.toLong, s) }
        .toDF("id", "text")
      val rows = df.select(
        graft.pipeline.Text.normalize($"text").as("n"),
        graft.pipeline.Text.normalizeRegex($"text").as("r")).collect()
      rows.forall(r => r.getString(0) == r.getString(1))
    }

  property("shingle_hashes64 kernel == HOF form on random unicode tokens") =
    forAll(Gen.listOf(unicodeChunk).map(_.take(30)), Gen.choose(1, 5)) {
      (toks, n) =>
        val df = Seq(Tuple1(toks)).toDF("toks")
        val native = df.select(
          graft.pipeline.Text.shingleHashes($"toks", n).as("h"))
          .head().getSeq[Long](0).toList
        val hof = df
          .withColumn("th", graft.pipeline.Text.tokenHashes($"toks"))
          .select(graft.pipeline.Text.shingleHashesOf($"th", n).as("h"))
          .head().getSeq[Long](0).toList
        native == hof
    }

  property("bpe_merge_count kernel == string-symbol reference") =
    forAll(Gen.listOf(Gen.frequency(
      8 -> Gen.oneOf('h', 'e', 'l', 'o', 'w', 'r', 'd'),
      2 -> Gen.oneOf('x', ' ', 'é', '中'))).map(_.take(40).mkString)) { s =>
      // dense in the demo table's alphabet so merge cascades and
      // order-sensitive shapes actually occur, plus unknowns and spaces
      val m = graft.pipeline.Text.demoBpeMerges
      val kernel = Seq(Tuple1(s)).toDF("t")
        .select(graft.pipeline.Text.bpeMergeCount($"t", m).as("n"))
        .head().getInt(0)
      kernel == graft.pipeline.Text.bpeMergeCountReference(s, m)
    }

  private val langWordPool: Gen[String] = Gen.frequency(
    6 -> Gen.oneOf("the", "and", "is", "of", "el", "la", "que", "los",
      "le", "les", "des", "der", "und", "die", "das", "de", "en",
      "xx", "yy", "zz"),
    2 -> Gen.oneOf("的", "是", "了", "在", "日本", "中文"),
    2 -> unicodeChunk)

  property("lang_best kernel == greatest-struct HOF form incl. ties") =
    forAll(Gen.listOf(langWordPool).map(_.take(40))) { ws =>
      val df = Seq((1L, ws.mkString(" "))).toDF("id", "text")
        .withColumn("toks", graft.pipeline.Text.tokens($"text"))
      def shaped(c: org.apache.spark.sql.Column) = df.select(
        c.getField("s").as("s"), c.getField("l").as("l")).head()
      val n = shaped(graft.pipeline.Text.langBest($"text", $"toks"))
      val h = shaped(graft.pipeline.Text.langBestHof($"text", $"toks"))
      n.getInt(0) == h.getInt(0) && n.getString(1) == h.getString(1)
    }

  // ---- exact distributional statistics vs naive driver references on
  // random samples (the oracle pins fixtures; this pins the math)

  private val sample: Gen[List[Int]] =
    Gen.nonEmptyListOf(Gen.choose(-20, 20)).map(_.take(80))

  property("KS statistic == naive two-sample sup-distance") =
    forAll(sample, sample) { (xs, ys) =>
      val ks = graft.drift.Drift.ksStatistic(
        xs.map(_.toDouble).toDF("v"), ys.map(_.toDouble).toDF("v"), "v")
      val pooled = (xs ++ ys).distinct.sorted
      def cdf(s: List[Int])(t: Int) = s.count(_ <= t).toDouble / s.size
      val expected = pooled.map(t =>
        math.abs(cdf(xs)(t) - cdf(ys)(t))).max
      math.abs(ks - expected) < 1e-9
    }

  property("Wasserstein-1 == naive CDF-difference integral") =
    forAll(sample, sample) { (xs, ys) =>
      val w = graft.drift.Drift.wasserstein(
        xs.map(_.toDouble).toDF("v"), ys.map(_.toDouble).toDF("v"), "v")
      // reference: integral over t of |F(t) - G(t)| — piecewise constant
      // between pooled distinct values
      val pooled = (xs ++ ys).distinct.sorted
      def cdf(s: List[Int])(t: Int) = s.count(_ <= t).toDouble / s.size
      val expected = pooled.sliding(2).collect { case List(a, b) =>
        math.abs(cdf(xs)(a) - cdf(ys)(a)) * (b - a) }.sum
      math.abs(w - expected) < 1e-9
    }

  property("Cramer-von Mises matches the naive pooled-CDF definition") =
    forAll(sample, sample) { (xs, ys) =>
      val t = graft.drift.Drift.cramerVonMises(
        xs.map(_.toDouble).toDF("v"), ys.map(_.toDouble).toDF("v"), "v")
      val n1 = xs.size.toDouble; val n2 = ys.size.toDouble
      def cdf(s: List[Int])(v: Int) = s.count(_ <= v).toDouble / s.size
      val expected = n1 * n2 / math.pow(n1 + n2, 2) *
        (xs ++ ys).map(v => math.pow(cdf(xs)(v) - cdf(ys)(v), 2)).sum
      math.abs(t - expected) < 1e-9
    }

  property("Anderson-Darling matches its weighted-CDF definition") =
    forAll(sample, sample) { (xs, ys) =>
      val a2 = graft.drift.Drift.andersonDarling(
        xs.map(_.toDouble).toDF("v"), ys.map(_.toDouble).toDF("v"), "v")
      val n1 = xs.size.toDouble; val n2 = ys.size.toDouble; val n = n1 + n2
      def cdf(s: List[Int])(v: Int) = s.count(_ <= v).toDouble / s.size
      val expected = n1 * n2 / (n * n) * (xs ++ ys).map { v =>
        val f1 = cdf(xs)(v); val f2 = cdf(ys)(v)
        val h = (f1 * n1 + f2 * n2) / n
        val w = h * (1 - h)
        if (w <= 0) 0.0 else (f1 - f2) * (f1 - f2) / w
      }.sum
      math.abs(a2 - expected) < 1e-9
    }

  property("binned divergences: Hellinger^2 <= TV <= Hellinger*sqrt(2)") =
    forAll(Gen.nonEmptyListOf(Gen.choose(0, 9)).map(_.take(150)),
      Gen.nonEmptyListOf(Gen.choose(0, 9)).map(_.take(150))) { (xs, ys) =>
      val pq = graft.drift.Drift.binnedPq(
        xs.toDF("v"), ys.toDF("v"), "v", 10, 0, 10)
      val hl = graft.drift.Drift.hellinger(pq)
      val tv = graft.drift.Drift.totalVariation(pq)
      // standard inequalities between Hellinger distance and TV
      hl * hl <= tv + 1e-9 && tv <= hl * math.sqrt(2) + 1e-9
    }

  property("energy distance matches the O(n^2) definition") =
    forAll(Gen.listOfN(12, Gen.choose(-10.0, 10.0)),
      Gen.listOfN(9, Gen.choose(-10.0, 10.0))) { (xs, ys) =>
      val e = graft.drift.Drift.energyDistance(
        xs.toDF("v"), ys.toDF("v"), "v")
      def mad(a: Seq[Double], b: Seq[Double]) =
        a.flatMap(x => b.map(y => math.abs(x - y))).sum / (a.size * b.size)
      val expected = 2 * mad(xs, ys) - mad(xs, xs) - mad(ys, ys)
      math.abs(e - expected) < 1e-9
    }

  property("DupGroups hashed stats == direct groupBy on random multisets") =
    forAll(Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 6),
      Gen.oneOf("x", "y", "zz"))).map(_.take(120))) { rows =>
      val df = rows.toDF("a", "b")
      val hashed = graft.ops.DupGroups.stats(df, Seq("a", "b")).head()
      val expected = rows.groupBy(identity).values.map(_.size).filter(_ > 1)
      hashed.getLong(0) == expected.size.toLong &&
        hashed.getLong(1) == expected.map(_ - 1).sum.toLong
    }

  property("suite store round-trips arbitrary unicode spec strings") =
    forAll(Gen.listOf(unicodeChunk).map(_.mkString(" ")),
      Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(20))) { (spec, name) =>
      // driver-side JSON writer + Jackson reader: escapes, controls,
      // embedded "spec": text, multi-byte — everything must survive
      val ws = java.nio.file.Files.createTempDirectory("graft_ssp").toString
      val ss = graft.stores.SuiteStore(ws)
      ss.save(name, spec, 1L)
      val got = ss.get(name)
      ss.delete(name)
      got.contains(spec)
    }

  // ---- image_decode: null-on-garbage contract (never throws, never
  // emits a malformed row) across random bytes and truncated real PNGs

  private lazy val realPngBytes: Array[Byte] = {
    val img = new java.awt.image.BufferedImage(7, 5,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until 7; y <- 0 until 5) img.setRGB(x, y, x * 40 + y)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private val garbageBytes: Gen[Array[Byte]] = Gen.oneOf(
    Gen.const(Array.empty[Byte]),
    Gen.nonEmptyListOf(Gen.choose(Byte.MinValue, Byte.MaxValue))
      .map(_.take(64).toArray),
    // valid PNG magic + cut body, at every kind of boundary
    Gen.choose(1, realPngBytes.length - 1).map(realPngBytes.take),
    // valid prefix + random tail corruption
    Gen.choose(0, 200).map(seed => realPngBytes.zipWithIndex.map {
      case (b, i) => if (i > 16 && (i * 31 + seed) % 7 == 0) (b ^ 0x5a).toByte else b
    }))

  property("image_decode never throws; garbage -> null, rows well-formed") =
    forAll(Gen.listOfN(6, garbageBytes)) { payloads =>
      val df = payloads.zipWithIndex.map { case (b, i) => (i.toLong, b) }
        .toDF("id", "content")
      // codegen path (df projection) and shared static kernel both hold
      val rows = df.select(graft.functions.ImageDecode($"content").as("d"))
        .collect()
      val planOk = rows.forall { r =>
        r.isNullAt(0) || {
          val s = r.getStruct(0)
          s.getInt(0) > 0 && s.getInt(1) > 0 &&
            s.getInt(2) >= 1 && s.getInt(2) <= 4 &&
            s.getDouble(3) >= 0.0 && s.getDouble(3) <= 255.0
        }
      }
      val kernelOk = payloads.forall { b =>
        val r = graft.functions.ImageDecode.decodeToRow(b)
        r == null || (r.getInt(0) > 0 && r.getInt(1) > 0)
      }
      planOk && kernelOk
    }

  // ---- ADWIN (driver-only: the detector itself, not the Spark wiring)

  private def adwinFirstChange(vals: Seq[Double], delta: Double): Int = {
    val det = new graft.monitoring.Adwin(delta)
    val i = vals.indexWhere(det.add)
    if (i < 0) Int.MaxValue else i
  }

  property("adwin: an iid-constant series never shrinks the window") =
    forAll(Gen.choose(-100.0, 100.0), Gen.choose(50, 300)) { (c, n) =>
      val det = new graft.monitoring.Adwin()
      (1 to n).forall { _ =>
        val fired = det.add(c)
        !fired
      } && det.size == n
    }

  property("adwin: detection delay is monotone in delta") =
    forAll(Gen.choose(0.0, 1.0), Gen.choose(5.0, 20.0)) { (base, shift) =>
      // larger delta = weaker evidence required = earlier (or equal)
      // first cut; before the first cut both detectors see identical
      // windows, and eps_cut is monotone decreasing in delta
      val s = Seq.fill(80)(base) ++ Seq.fill(80)(base + shift)
      adwinFirstChange(s, 0.05) <= adwinFirstChange(s, 0.0005)
    }

  property("adwin: window mean converges to the post-shift level") =
    forAll(Gen.choose(0.0, 5.0), Gen.choose(10.0, 30.0)) { (base, shift) =>
      val det = new graft.monitoring.Adwin(0.01)
      (Seq.fill(100)(base) ++ Seq.fill(100)(base + shift)).foreach(det.add)
      // the window must have dropped (most of) the pre-shift regime
      math.abs(det.mean - (base + shift)) < shift * 0.25
    }

  private val randomEdges: Gen[List[(Long, Long)]] =
    Gen.listOf(for {
      a <- Gen.choose(0L, 30L)
      b <- Gen.choose(0L, 30L) if a != b
    } yield (math.min(a, b), math.max(a, b))).map(_.take(60))

  property("sampleQuota: exact per-stratum counts + superset under growth") =
    forAll(Gen.choose(1, 120), Gen.choose(0L, 40L), Gen.choose(1, 5)) {
      (n, quota, nStrata) =>
        val rows = (1L to n.toLong).map(i => (i, s"t$i", s"s${i % nStrata}"))
        val df = rows.toDF("id", "text", "src")
        val quotas = Map("s0" -> quota)
        def ids(q: Map[String, Long]) =
          graft.pipeline.Curate(df, "id", "text").sampleQuota("src", q)
            .df.select("id").as[Long].collect().toSet
        val kept = ids(quotas)
        val s0Size = rows.count(_._3 == "s0").toLong
        val s0Kept = kept.count(_ % nStrata == 0).toLong
        val othersAll = rows.filterNot(_._3 == "s0").map(_._1).toSet
          .subsetOf(kept)
        val grown = ids(Map("s0" -> (quota + 7)))
        s0Kept == math.min(quota, s0Size) && othersAll &&
          kept.subsetOf(grown)
    }

  property("sampleTokenBudget == driver greedy prefix in hash order") =
    forAll(Gen.choose(1, 60), Gen.choose(0L, 200L),
           Gen.oneOf(0, 2, 3, 8)) { (n, budget, salt) =>
      // token count of doc i is i % 7 (ZERO-token docs included — the
      // exactness edge a filter-then-rescan salted form gets wrong);
      // stratum s0 = even ids
      val rows = (1L to n.toLong).map(i =>
        (i, ("w " * (i % 7).toInt).trim, s"s${i % 2}"))
      val df = rows.toDF("id", "text", "src")
      val got = graft.pipeline.Curate(df, "id", "text")
        .sampleTokenBudget("src", Map("s0" -> budget), salt = salt).df
        .select("id").as[Long].collect().toSet
      // driver reference: same hash order (read back from Spark so the
      // property tests the greedy window logic, not xxhash64 itself)
      val order = df.filter($"src" === "s0")
        .select($"id", org.apache.spark.sql.functions
          .xxhash64($"id", org.apache.spark.sql.functions.lit(42L)).as("h"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .sortBy { case (id, h) => (h, id) }.map(_._1)
      var cum = 0L
      val keep = scala.collection.mutable.Set.empty[Long]
      order.foreach { id =>
        cum += id % 7
        if (cum <= budget) keep += id
      }
      val unbudgeted = rows.filter(_._3 == "s1").map(_._1).toSet
      got == (keep.toSet ++ unbudgeted)
    }

  property("dupClusters == driver union-find on random graphs") =
    forAll(randomEdges) { edges =>
      // plain-Scala reference: union-find with min-id representatives
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Long, b: Long): Unit = {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      edges.foreach { case (a, b) => union(a, b) }
      val want = parent.keys.map(id => id -> find(id)).toMap
      // default = driver union-find fast path; driverEdgeLimit = 0
      // forces the distributed pointer-jumping path — both must agree
      // with the reference
      val fast = graft.pipeline.Dedup.dupClusters(edges.toDF("id_a", "id_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = graft.pipeline.Dedup.dupClusters(edges.toDF("id_a", "id_b"),
          driverEdgeLimit = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      fast == want && dist == want
    }

  private val lineDocs: Gen[List[(Long, String)]] = {
    // line pool straddling the 30-char eligibility bound: short lines
    // (never deduped, even when repeated) and long lines (deduped
    // corpus-wide), including empty lines and trailing-newline shapes
    val short = Gen.oneOf("", "a", "bb", "Home", "***")
    val long = Gen.oneOf("L1", "L2", "L3", "L4").map(_ * 20) // 40 chars
    val doc = Gen.choose(0, 6).flatMap(k =>
      Gen.listOfN(k, Gen.oneOf(short, long)).map(_.mkString("\n")))
    Gen.choose(1, 12).flatMap(n =>
      Gen.listOfN(n, doc).map(_.zipWithIndex.map { case (t, i) =>
        (i.toLong, t) }))
  }

  property("dedupLinesCorpus == sequential first-occurrence reference") =
    forAll(lineDocs) { docs =>
      val minLen = 30
      // plain-Scala reference: walk docs in (id, pos) order, keep a long
      // line only the first time it is seen anywhere in the corpus
      val seen = scala.collection.mutable.Set.empty[String]
      val want = docs.sortBy(_._1).map { case (id, t) =>
        id -> t.split("\n", -1)
          .filter(l => l.length < minLen || seen.add(l))
          .mkString("\n")
      }.toMap
      val got = graft.pipeline.Dedup.dedupLinesCorpus(
          docs.toDF("id", "text"), "id", "text", minLen)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      got == want
    }

  // --- Pii.scrubText: after scrubbing, NO default pattern can still
  // match, and a second scrub is the identity. Safe because the
  // replacement tags contain no digits, '@', '+', or '.', so no pass
  // can manufacture a match for any other pass — fuzzed here over
  // adversarial juxtapositions (PII glued to noise with no separator,
  // doubled '@', digit runs touching planted shapes).
  private val piiFrag: Gen[String] = Gen.oneOf(
    for { a <- Gen.choose(1, 999); b <- Gen.choose(1, 99) }
      yield s"user$a@host$b.com",
    for { a <- Gen.choose(1, 999); b <- Gen.choose(10, 9999)
          c <- Gen.choose(100, 9999); d <- Gen.choose(100, 9999) }
      yield s"+$a $b-$c-$d",
    for { a <- Gen.choose(100, 999); b <- Gen.choose(10, 99)
          c <- Gen.choose(1000, 9999) } yield s"$a-$b-$c",
    Gen.listOfN(4, Gen.choose(1000, 9999)).map(_.mkString("-")),
    Gen.listOfN(4, Gen.choose(1, 254)).map(_.mkString(".")))
  private val noiseFrag: Gen[String] = Gen.oneOf(
    Gen.alphaLowerStr.map(_.take(8)),
    Gen.numStr.map(_.take(6)),
    Gen.oneOf(".", "-", "+", "@", " ", "..", "@@", "-.-", "4.0"))

  property("scrubText output matches no scrubbed pattern; idempotent") =
    forAll(
      Gen.listOf(Gen.frequency(2 -> piiFrag, 3 -> noiseFrag)).map(_.take(30)),
      Gen.listOf(Gen.oneOf(" ", "", "\n")).map(_.take(30))) { (frags, seps) =>
      import org.apache.spark.sql.functions.col
      val text = frags.zipAll(seps, "", " ")
        .map { case (f, sep) => f + sep }.mkString
      val once = Seq(text).toDF("t")
        .select(graft.profiler.Pii.scrubText(col("t")).as("c"))
      val out = once.as[String].head()
      val leftover = graft.profiler.Pii.scrubDefaults.filter { p =>
        java.util.regex.Pattern.compile(graft.profiler.Pii.patterns(p))
          .matcher(out).find() }
      val twice = once
        .select(graft.profiler.Pii.scrubText(col("c")).as("c"))
        .as[String].head()
      Prop(leftover.isEmpty && twice == out) :|
        s"leftover=$leftover out=$out"
    }

  // ---- hyperplane_bucket: the last native kernel without parity fuzz.
  // The HOF reference form was retired from the library, so the oracle
  // here is an independent driver-side sign-bit computation over the
  // shared weight schedule — checked against BOTH execution paths
  // (whole-stage codegen via a DataFrame projection, interpreted eval
  // via a Literal child) on vectors with nulls, NaN, short/long/empty
  // arrays, and the float element type.

  private val bucketVec: Gen[List[Option[Double]]] =
    Gen.choose(0, 10).flatMap(n => Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(-10.0, 10.0).map(Some(_)),
      1 -> Gen.const(Some(Double.NaN)),
      1 -> Gen.const(Option.empty[Double]))))

  property("hyperplane_bucket == driver sign-bit ref (codegen + eval)") =
    forAll(Gen.listOfN(8, bucketVec)) { vecs =>
      import org.apache.spark.sql.functions.col
      val planes = 8; val dim = 6
      def ref(v: List[Option[Double]]): Long = {
        var bucket = 0L
        for (p <- 0 until planes) {
          var dot = 0.0
          for (d <- 0 until math.min(v.length, dim))
            v(d).foreach(x =>
              dot += x * graft.functions.HyperplaneBucket.weight(p, d))
          if (dot >= 0) bucket |= (1L << p) // NaN dot -> bit stays 0
        }
        bucket
      }
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val codegen = df.orderBy("id")
        .select(graft.functions.HyperplaneBucket(col("v"), planes, dim))
        .as[Long].collect().toList
      val floats = df.orderBy("id")
        .select(graft.functions.HyperplaneBucket(
          col("v").cast("array<float>"), planes, dim))
        .as[Long].collect().toList
      val evaled = vecs.map { v =>
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        graft.functions.HyperplaneBucket(
          Literal.create(v.map(_.map(java.lang.Double.valueOf).orNull), ArrayType(DoubleType)),
          planes, dim).eval(null)
      }
      val want = vecs.map(ref)
      val wantF = vecs.map(v => ref(v.map(_.map(x => x.toFloat.toDouble))))
      val nullIn = graft.functions.HyperplaneBucket(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          null, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.DoubleType)),
        planes, dim).eval(null)
      Prop(codegen == want && evaled == want && floats == wantF &&
        nullIn == null) :|
        s"codegen=$codegen eval=$evaled floats=$floats want=$want wantF=$wantF"
    }

  // plane-offset consistency: a k-plane signature at offset o is exactly
  // bits [o, o+k) of the packed (o+k)-plane signature — the invariant
  // that makes the banded per-signature dedup form (Dedup.
  // embeddingDupPairsLsh with bands*bandBits > 63) bit-compatible with
  // the old packed-single-long form on every band key.
  property("hyperplane_bucket planeOffset == packed signature slice") =
    forAll(Gen.listOfN(6, bucketVec),
           Gen.choose(1, 20), Gen.choose(0, 40)) { (vecs, k, o) =>
      import org.apache.spark.sql.functions.col
      val dim = 6
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val rows = df.orderBy("id").select(
          graft.functions.HyperplaneBucket(col("v"), k, dim, o).as("off"),
          graft.functions.HyperplaneBucket(col("v"), o + k, dim).as("packed"))
        .as[(Long, Long)].collect().toList
      val mask = (1L << k) - 1
      Prop(rows.forall { case (off, packed) =>
        off == ((packed >>> o) & mask) }) :|
        s"k=$k o=$o rows=$rows"
    }

  // ---- cosine_sim kernel vs the retained HOF reference form, over
  // adversarial inputs: nulls inside arrays, length mismatches, empty
  // and all-zero vectors, float element type. The HOF's corner rules
  // (zero-norm check precedes the null-poisoned dot) must match
  // bit-for-bit in both codegen and interpreted eval.
  // whole-NULL arrays included: the HOF's three-valued when-condition
  // makes cosineHof(NULL, null-free all-zero) = 0.0, not NULL — the
  // kernel must reproduce that corner (and the empty-array case, whose
  // norm is also a non-null 0) in both codegen and interpreted eval.
  private val maybeVec: Gen[Option[List[Option[Double]]]] =
    Gen.frequency(
      6 -> bucketVec.map(Some(_)),
      1 -> Gen.const(Option.empty[List[Option[Double]]]),
      1 -> Gen.choose(0, 4).map(n =>
        Some(List.fill(n)(Some(0.0)): List[Option[Double]])))

  property("cosine_sim kernel == HOF reference (codegen, floats, corners)") =
    forAll(Gen.listOfN(8, maybeVec), Gen.listOfN(8, maybeVec)) { (as, bs) =>
      import org.apache.spark.sql.functions.col
      val rows = as.zip(bs).zipWithIndex.map { case ((a, b), i) =>
        (i.toLong, a, b) }
      // NaN-free corpus for the equality check (NaN != NaN would flap);
      // NaN propagation itself is identical arithmetic in both forms.
      val clean = rows.map { case (i, a, b) =>
        (i, a.map(_.map(_.map(x => if (x.isNaN) 0.5 else x))),
            b.map(_.map(_.map(x => if (x.isNaN) 0.5 else x)))) }
      val df = clean.toDF("id", "a", "b").orderBy("id")
      def run(sel: org.apache.spark.sql.Column): List[Option[Double]] =
        df.select(sel).collect().toList
          .map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
      val kernel = run(graft.functions.CosineSim(col("a"), col("b")))
      val hof = run(graft.pipeline.Similarity.cosineHof(col("a"), col("b")))
      val kernelF = run(graft.functions.CosineSim(
        col("a").cast("array<float>"), col("b").cast("array<float>")))
      val hofF = run(graft.pipeline.Similarity.cosineHof(
        col("a").cast("array<float>"), col("b").cast("array<float>")))
      // interpreted eval path matches codegen
      val evaled = clean.map { case (_, a, b) =>
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        def l(v: Option[List[Option[Double]]]) = Literal.create(
          v.map(_.map(_.map(java.lang.Double.valueOf).orNull)).orNull,
          ArrayType(DoubleType))
        Option(graft.functions.CosineSim(l(a), l(b)).eval(null))
          .map(_.asInstanceOf[Double])
      }
      Prop(kernel == hof && kernelF == hofF && evaled == kernel) :|
        s"kernel=$kernel hof=$hof kernelF=$kernelF hofF=$hofF eval=$evaled"
    }

  // ---- nearest_cell kernel vs the retained HOF quantizer forms
  // (Ivf.cellOfCosineHof / cellOfHof) — the parity spec the kernel's
  // doc points at. Random vectors × random centroid matrices, cosine
  // and L2 modes, double and float element types, with an exact score
  // tie planted by construction (a duplicated centroid row plus a
  // vector equal to one centroid): argmax/argmin must keep the LOWEST
  // index in both forms (array_position first-occurrence rule). Both
  // execution paths are exercised: whole-stage codegen via a DataFrame
  // projection and interpreted eval via a Literal child. Zero-norm /
  // null / dim-mismatch corners are deliberate kernel DIVERGENCES from
  // the HOF's NaN-ordering behavior and are pinned separately below.

  private val cellDim = 4
  private val cellVecGen: Gen[List[Double]] =
    Gen.listOfN(cellDim, Gen.choose(-8.0, 8.0))
  private val centroidsGen: Gen[Array[Array[Double]]] =
    for {
      k <- Gen.choose(2, 6)
      rows <- Gen.listOfN(k, cellVecGen)
      dupAt <- Gen.choose(0, k - 1)
    } yield (rows :+ rows(dupAt)).map(_.toArray).toArray

  property("nearest_cell == HOF quantizer (cos+l2, float+double, ties)") =
    forAll(Gen.listOfN(8, cellVecGen), centroidsGen) { (vecs0, cents) =>
      import org.apache.spark.sql.functions.col
      import graft.pipeline.Ivf
      // zero-norm inputs are the kernel's documented divergence — keep
      // them out of the parity corpus (pinned in the corner property)
      val vecs = vecs0.map(v =>
        if (v.forall(_ == 0.0)) v.updated(0, 1.0) else v)
      // plant a vector EQUAL to the duplicated centroid: its score
      // ties exactly across the duplicate rows by construction
      val all = cents.last.toList :: vecs
      val df = all.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v").orderBy("id")
      def run(c: org.apache.spark.sql.Column): List[Option[Int]] =
        df.select(c.cast("int")).collect().toList
          .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
      val cosK  = run(Ivf.cellOfCosine(col("v"), cents))
      val cosH  = run(Ivf.cellOfCosineHof(col("v"), cents))
      val l2K   = run(Ivf.cellOf(col("v"), cents))
      val l2H   = run(Ivf.cellOfHof(col("v"), cents))
      val f     = col("v").cast("array<float>")
      val cosKF = run(Ivf.cellOfCosine(f, cents))
      val cosHF = run(Ivf.cellOfCosineHof(f, cents))
      val l2KF  = run(Ivf.cellOf(f, cents))
      val l2HF  = run(Ivf.cellOfHof(f, cents))
      // interpreted eval path matches codegen
      def evalAll(cosine: Boolean): List[Option[Int]] = all.map { v =>
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        Option(graft.functions.NearestCell(
            Literal.create(v, ArrayType(DoubleType)), cents, cosine)
          .eval(null)).map(_.asInstanceOf[Int])
      }
      Prop(cosK == cosH && l2K == l2H && cosKF == cosHF && l2KF == l2HF &&
        evalAll(true) == cosK && evalAll(false) == l2K) :|
        s"cosK=$cosK cosH=$cosH l2K=$l2K l2H=$l2H " +
          s"cosKF=$cosKF cosHF=$cosHF l2KF=$l2KF l2HF=$l2HF"
    }

  // ---- nearest_sub_cell (two-level quantizer dispatch) vs composing
  // the already-pinned NearestCell kernel per cell on the driver: the
  // global flat id must equal offsets(coarseCell) + the local winner
  // inside that cell's sub-matrix, for cosine and L2, codegen and
  // interpreted eval, double and float. Out-of-range / null coarse ids
  // must yield NULL (the join-nothing contract).
  property("nearest_sub_cell == per-cell NearestCell dispatch") =
    forAll(Gen.listOfN(6, cellVecGen), Gen.choose(2, 4),
           Gen.listOfN(16, cellVecGen)) { (vecs0, nc, pool) =>
      import org.apache.spark.sql.functions.{col, lit}
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, DoubleType}
      val vecs = vecs0.map(v =>
        if (v.forall(_ == 0.0)) v.updated(0, 1.0) else v)
      val coarse = pool.take(nc).map(_.toArray).toArray
      // ragged subs: cell c gets 1 + (c % 3) sub-centroids from the pool
      var at = nc
      val subs = Array.tabulate(nc) { c =>
        val k = 1 + (c % 3)
        val s = pool.slice(at, at + k)
        at += k
        // pool may run short for nc=4; pad by reusing the coarse row
        (if (s.length == k) s else List.fill(k)(coarse(c).toList))
          .map(_.toArray).toArray
      }
      val offsets = subs.scanLeft(0)(_ + _.length)
      def cellEval(v: List[Double], cs: Array[Array[Double]],
          cosine: Boolean): Option[Int] =
        Option(graft.functions.NearestCell(
            Literal.create(v, ArrayType(DoubleType)), cs, cosine)
          .eval(null)).map(_.asInstanceOf[Int])
      def want(cosine: Boolean): List[Option[Int]] = vecs.map { v =>
        cellEval(v, coarse, cosine).flatMap(c =>
          cellEval(v, subs(c), cosine).map(offsets(c) + _))
      }
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v").orderBy("id")
      def run(c: org.apache.spark.sql.Column): List[Option[Int]] =
        df.select(c).collect().toList
          .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
      val cosDf = run(graft.pipeline.Ivf.cellOfCosineTwoLevel(
        col("v"), coarse, subs))
      val cosDfF = run(graft.pipeline.Ivf.cellOfCosineTwoLevel(
        col("v").cast("array<float>"), coarse, subs))
      val l2Df = run(graft.functions.NearestSubCell(
        graft.functions.NearestCell(col("v"), coarse, cosine = false),
        col("v"), subs, cosine = false))
      def wantF(cosine: Boolean): List[Option[Int]] = vecs.map { v0 =>
        val v = v0.map(x => x.toFloat.toDouble)
        cellEval(v, coarse, cosine).flatMap(c =>
          cellEval(v, subs(c), cosine).map(offsets(c) + _))
      }
      // eval path + out-of-range / null coarse ids
      val evCos = vecs.map { v =>
        Option(graft.functions.NearestSubCell(
            graft.functions.NearestCell(
              Literal.create(v, ArrayType(DoubleType)), coarse,
              cosine = true),
            Literal.create(v, ArrayType(DoubleType)), subs, cosine = true)
          .eval(null)).map(_.asInstanceOf[Int])
      }
      val oob = run(graft.functions.NearestSubCell(lit(nc + 3), col("v"),
        subs, cosine = true))
      val nullCell = run(graft.functions.NearestSubCell(
        lit(null).cast("int"), col("v"), subs, cosine = true))
      Prop(cosDf == want(true) && l2Df == want(false) &&
        cosDfF == wantF(true) && evCos == want(true) &&
        oob.forall(_.isEmpty) && nullCell.forall(_.isEmpty)) :|
        s"cosDf=$cosDf want=${want(true)} l2Df=$l2Df wantL2=${want(false)} " +
          s"oob=$oob"
    }

  // ---- the general-order stupid-backoff LM must degenerate EXACTLY to
  // the oracle-pinned order-2 implementation: random tiny corpora over
  // a 4-token alphabet (dense n-gram collisions), both minCount regimes.
  property("ngramLogProbs(order=2) == bigramLogProbs on random corpora") =
    forAll(Gen.listOfN(6,
        Gen.listOf(Gen.oneOf("a", "b", "c", "d")).map(_.take(8))),
        Gen.oneOf(1L, 2L)) { (docs, mc) =>
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("id", "text")
      def fetch(r: org.apache.spark.sql.DataFrame) =
        r.collect().map(row => row.getLong(0) ->
          (row.getLong(1),
           Option(row.get(2)).map(_.asInstanceOf[Double]))).toMap
      val bi = fetch(graft.pipeline.Text.bigramLogProbs(
        df, "id", "text", minCount = mc))
      val ng = fetch(graft.pipeline.Text.ngramLogProbs(
        df, "id", "text", order = 2, minCount = mc))
      Prop(bi.keySet == ng.keySet && bi.forall { case (k, (n, lp)) =>
        ng(k)._1 == n && ((lp, ng(k)._2) match {
          case (Some(x), Some(y)) => math.abs(x - y) < 1e-12
          case (x, y) => x == y
        })
      }) :| s"bi=$bi ng=$ng"
    }

  // ---- the xxhash64 gram-fingerprint join keys (the default — 8-byte
  // shuffle keys once the top-order table stops broadcasting) must be
  // value-identical to the exact string-key form: random tiny corpora
  // over a 4-token alphabet (dense gram collisions ACROSS levels — the
  // same token string is a level-1 gram and a substring of level-3
  // grams), orders spanning the backoff cascade, both minCount regimes.
  property("ngramLogProbs fingerprint keys == string keys") =
    forAll(Gen.listOfN(6,
        Gen.listOf(Gen.oneOf("a", "b", "c", "d")).map(_.take(10))),
        Gen.chooseNum(1, 5), Gen.oneOf(1L, 2L)) { (docs, order, mc) =>
      val df = docs.zipWithIndex
        .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }
        .toDF("id", "text")
      def fetch(fp: Boolean) =
        graft.pipeline.Text.ngramLogProbs(df, "id", "text", order = order,
            minCount = mc, fingerprintKeys = fp)
          .collect().map(row => row.getLong(0) ->
            (row.getLong(1),
             Option(row.get(2)).map(_.asInstanceOf[Double]))).toMap
      val hashed = fetch(true)
      val exact = fetch(false)
      Prop(hashed.keySet == exact.keySet &&
        exact.forall { case (k, (n, lp)) =>
          hashed(k)._1 == n && ((lp, hashed(k)._2) match {
            case (Some(x), Some(y)) => math.abs(x - y) < 1e-12
            case (x, y) => x == y
          })
        }) :| s"order=$order mc=$mc hashed=$hashed exact=$exact"
    }

  property("nearest_cell corner semantics (zero-norm, nulls, dim)") = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, DoubleType}
    val cents = Array(Array(0.0, 0.0, 0.0), Array(1.0, 2.0, 2.0))
    val zeroCents = Array(Array(0.0, 0.0, 0.0), Array(0.0, 0.0, 0.0))
    val rows: List[(Long, List[java.lang.Double], String)] = List(
      (0L, List[java.lang.Double](0.0, 0.0, 0.0), "zero-norm"),
      (1L, List[java.lang.Double](2.0, 4.0, 4.0), "clean"),
      (2L, List[java.lang.Double](1.0, 2.0), "dim-mismatch"),
      (3L, List[java.lang.Double](1.0, null, 2.0), "null-elem"),
      (4L, null, "whole-null"))
    val df = rows.map { case (i, v, _) =>
        (i, Option(v).map(_.map(x => Option(x).map(_.doubleValue))))
      }.toDF("id", "v").orderBy("id")
    def run(c: org.apache.spark.sql.Column): List[Option[Int]] =
      df.select(c).collect().toList
        .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0)))
    val cos = run(graft.functions.NearestCell(col("v"), cents, cosine = true))
    val l2 = run(graft.functions.NearestCell(col("v"), cents, cosine = false))
    val cosZ = run(graft.functions.NearestCell(col("v"), zeroCents,
      cosine = true))
    def ev(v: List[java.lang.Double], cs: Array[Array[Double]],
        cosine: Boolean): Option[Int] =
      Option(graft.functions.NearestCell(
          Literal.create(v, ArrayType(DoubleType)), cs, cosine)
        .eval(null)).map(_.asInstanceOf[Int])
    val evCos = rows.map { case (_, v, _) => ev(v, cents, cosine = true) }
    val evL2 = rows.map { case (_, v, _) => ev(v, cents, cosine = false) }
    // cosine: zero-norm input unassignable; zero-norm centroid (idx 0)
    // never selected, so the clean row lands on 1; dim/null -> NULL.
    // L2: zero-norm is a perfectly good point — row 0 sits ON centroid
    // 0 and row 1 is closer to centroid 1; dim/null corners identical.
    // All-zero-centroid cosine: nothing selectable -> NULL everywhere
    // except the structurally-NULL rows (also NULL).
    Prop(cos == List(None, Some(1), None, None, None) &&
      l2 == List(Some(0), Some(1), None, None, None) &&
      cosZ == List(None, None, None, None, None) &&
      evCos == cos && evL2 == l2) :|
      s"cos=$cos l2=$l2 cosZ=$cosZ evCos=$evCos evL2=$evL2"
  }

  // r16: exact-duplicate pre-collapse must not change the kept set —
  // exact copies share every band signature and verify at cosine 1, so
  // the component structure over representatives expands to the same
  // components over members, and the min-id keep rule picks the same
  // ids (a group's representative IS its min id). Geometry is pinned
  // (explicit bands/bandBits) so both paths see the identical LSH plan.
  property("dedupByEmbedding preCollapseExact keeps the identical set") =
    forAll(
      Gen.choose(2, 6), // distinct base vectors
      Gen.listOfN(8, Gen.choose(1, 4)), // replication per vector (cycled)
      Gen.choose(0L, 1000L)) { (nVec, reps, seed) =>
      val rnd = new scala.util.Random(seed)
      val bases = Array.fill(nVec)(
        Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
      val rows = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Array[Float])]
      var id = 0L
      bases.zipWithIndex.foreach { case (v, i) =>
        (0 until reps(i % reps.size)).foreach { _ =>
          rows += ((id, v.clone())); id += 1
        }
      }
      val df = rnd.shuffle(rows.toSeq).toDF("vid", "emb")
        .unionByName(Seq((999L, null.asInstanceOf[Array[Float]]))
          .toDF("vid", "emb"))
      def kept(pc: Boolean): Set[Long] =
        graft.pipeline.Dedup.dedupByEmbedding(df, "vid", "emb",
            threshold = 0.95, bands = 8, bandBits = 4, dim = 8,
            preCollapseExact = pc)
          .select("vid").as[Long].collect().toSet
      val plain = kept(false)
      val collapsed = kept(true)
      Prop(plain == collapsed) :| s"plain=$plain collapsed=$collapsed"
    }

}
