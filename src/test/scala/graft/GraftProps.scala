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

}
