package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Composable training-data curation pipeline: the north-star operators
  * (quality scoring, dedup, language-ID, token accounting) chained the way
  * a 100 TB corpus pass actually runs them:
  *
  *   Curate(docs, "doc_id", "text")
  *     .minQuality(0.5)
  *     .dedupExact()
  *     .dedupNear(threshold = 0.8)
  *     .keepLanguages("en", "es")
  *     .df                        // surviving documents
  *
  * Ordering matters at scale and is fixed here deliberately: cheap
  * row-local filters (quality, language) run at scan speed and shrink the
  * corpus BEFORE the shuffling dedup stages; exact dedup (one hash
  * shuffle) runs before near-dup (candidate join).
  *
  * Near-dup removal semantics (deterministic, non-iterative): a document
  * is dropped iff it appears as the HIGHER id of any qualifying pair —
  * the lowest id of each near-dup cluster survives. This is the standard
  * single-pass rule (no transitive union-find), SQL-restatable. */
final case class Curate(df: DataFrame, idCol: String, textCol: String,
    stages: Seq[String] = Nil) {

  def minQuality(threshold: Double, minChars: Int = 50): Curate =
    copy(df = df.filter(Text.qualityScore(col(textCol), minChars) >= threshold),
      stages = stages :+ s"quality>=$threshold")

  def minTokens(n: Int): Curate =
    copy(df = df.filter(Text.tokenCount(col(textCol)) >= n),
      stages = stages :+ s"tokens>=$n")

  def keepLanguages(langs: String*): Curate =
    copy(df = df.withColumn("__toks", Text.tokens(col(textCol)))
      .filter(Text.languageIdOf(col(textCol), col("__toks")).isin(langs: _*))
      .drop("__toks"),
      stages = stages :+ s"lang in ${langs.mkString(",")}")

  /** Exact dedup on the normalized-content fingerprint, keep lowest id. */
  /** HTML -> text extraction stage (crawl ingest: run FIRST, before any
    * quality/dedup stage sees markup): replaces the text column with
    * [[Text.stripHtml]]'s extraction. */
  def extractHtml(): Curate =
    copy(df = df.withColumn(textCol, Text.stripHtml(col(textCol))),
      stages = stages :+ "extract_html")

  def dedupExact(): Curate =
    copy(df = Dedup.exactDedup(df, textCol, idCol),
      stages = stages :+ "dedup_exact")

  /** Near-dup removal: drop the higher id of every pair with n-gram
    * Jaccard >= threshold (exhaustive generator; swap in minhashLshPairs
    * for corpora where the posting join is too big). */
  def dedupNear(threshold: Double = 0.8, shingleN: Int = 3,
                useLsh: Boolean = false): Curate = {
    val pairs =
      if (useLsh) Dedup.minhashLshPairs(df, idCol, textCol,
        shingleN = shingleN, threshold = threshold)
      else Dedup.jaccardPairs(df, idCol, textCol, shingleN, threshold)
    val doomed = pairs.select(col("id_b").as("__drop")).distinct()
    copy(df = df.join(doomed, df(idCol) === col("__drop"), "left_anti"),
      stages = stages :+ s"dedup_near>=$threshold${if (useLsh) "(lsh)" else ""}")
  }

  /** Transitive near-dup removal: close the qualifying pairs into
    * connected components (Dedup.dupClusters) and keep each cluster's
    * min id. Unlike the single-pass dedupNear rule, a chain A~B~C with
    * A!~C keeps ONLY A (one representative per cluster), matching
    * cluster-based corpus dedup. Costs O(log diameter) propagation
    * rounds on the pair graph — pairs only, never the corpus. */
  def dedupNearClustered(threshold: Double = 0.8, shingleN: Int = 3,
                         useLsh: Boolean = true): Curate = {
    val pairs =
      if (useLsh) Dedup.minhashLshPairs(df, idCol, textCol,
        shingleN = shingleN, threshold = threshold)
      else Dedup.jaccardPairs(df, idCol, textCol, shingleN, threshold)
    val clusters = Dedup.dupClusters(pairs) // checkpointed
    pairs.unpersist()
    copy(df = Dedup.dedupByClusters(df, idCol, clusters),
      stages = stages :+
        s"dedup_clustered>=$threshold${if (useLsh) "(lsh)" else ""}")
  }

  /** Corpus-wide line dedup (C4/RefinedWeb-style): duplicated lines of
    * >= minLineLen chars keep only their first (id, position) occurrence
    * across the corpus; documents keep their remaining lines in order.
    * Runs AFTER document-level dedup in a standard pass — whole-doc dups
    * are already gone, this strips the cross-document boilerplate they
    * left behind. */
  def dedupLines(minLineLen: Int = 30): Curate =
    copy(df = Dedup.dedupLinesCorpus(df, idCol, textCol, minLineLen),
      stages = stages :+ s"dedup_lines>=${minLineLen}ch")

  /** Benchmark decontamination: drop documents sharing any 13-gram (or
    * an exact normalized match) with the eval set. */
  def decontaminate(benchmark: DataFrame, benchTextCol: String,
      n: Int = 13): Curate =
    copy(df = Dedup.decontaminate(df, idCol, textCol, benchmark,
      benchTextCol, n),
      stages = stages :+ s"decontaminate($n-gram)")

  /** Gopher repetition filter: drop documents whose duplicate word
    * n-gram fraction exceeds the threshold (Rae et al. 2021). */
  def maxRepetition(threshold: Double, n: Int = 3): Curate =
    copy(df = df.withColumn("__toks", Text.tokens(col(textCol)))
      .filter(Text.duplicateNgramFractionOf(col("__toks"), n) <= threshold)
      .drop("__toks"),
      stages = stages :+ s"dup_${n}gram<=$threshold")

  /** Deterministic stratified domain mixing: keep each row with its
    * source's target probability, decided by a seeded hash of the id —
    * identical sample on every run/cluster (no RNG, no partition-layout
    * dependence), executed as a scan-speed filter with zero shuffles.
    * Sources absent from `weights` default to keep-all.
    *
    * The hash is salted with the source column AND this stage's position
    * in the pipeline: without the salt, two hash-sampled stages keyed on
    * the same (id, seed) are perfectly correlated — chaining two 0.5
    * mixes would keep 50%, not 25%, because the second filter repeats
    * the first's exact predicate. Same (data, seed, stage position) ⇒
    * same sample, so reproducibility is preserved. */
  def mixDomains(sourceCol: String, weights: Map[String, Double],
      seed: Long = 42L): Curate = {
    require(weights.values.forall(w => w >= 0.0 && w <= 1.0),
      "weights must be keep-probabilities in [0,1]")
    val m = typedlit(weights)
    val keepP = coalesce(element_at(m, col(sourceCol)), lit(1.0))
    val h = xxhash64(col(idCol), col(sourceCol), lit(seed),
      lit(stages.length))
    copy(df = df.filter(
      pmod(h, lit(1000000L)).cast("double") < keepP * 1000000.0),
      stages = stages :+ s"mix(${weights.size} sources)")
  }

  /** Deterministic salt sub-group id for the two-pass mega-stratum
    * samplers: a pure function of the row id, so the kept set stays
    * layout- and run-independent. */
  private def saltOf(salt: Int): Column =
    pmod(xxhash64(col(idCol), lit(0x5a17L)), lit(salt.toLong))

  /** Exact-quota stratified sample: keep exactly min(quota, |stratum|)
    * rows per stratum — the form dataset mixtures are actually specified
    * in ("500M docs of web, 50M of code"), where rate-based mixDomains
    * can only hit quotas in expectation. Selection order is a seeded
    * hash of the id, so the sample is deterministic across runs and
    * cluster layouts, and re-running with a LARGER quota yields a
    * superset (hash order is stable — quotas can be grown incrementally
    * without resampling). Strata absent from `quotas` keep all rows.
    *
    * Scale shape: one rank-over-window shuffle keyed by stratum. A
    * mega-stratum makes that per-key sort ONE hot task; pass `salt > 1`
    * for the two-pass form: rows first rank WITHIN (stratum, salted
    * sub-group) — salt-times the parallelism — and only sub-group
    * survivors (≤ salt·quota rows per stratum, since a globally-kept
    * row's sub-rank never exceeds its global rank) enter the exact
    * global rank. Identical kept set by construction (property-pinned);
    * use when quota ≪ stratum, which is exactly the skew regime. */
  def sampleQuota(strataCol: String, quotas: Map[String, Long],
      seed: Long = 42L, salt: Int = 0): Curate = {
    require(quotas.values.forall(_ >= 0), "quotas must be non-negative")
    val m = typedlit(quotas)
    val q = element_at(m, col(strataCol))
    val ord = Seq(xxhash64(col(idCol), lit(seed)), col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(strataCol)).orderBy(ord: _*)
    val pre =
      if (salt <= 1) df
      else {
        val w1 = org.apache.spark.sql.expressions.Window
          .partitionBy(col(strataCol), saltOf(salt)).orderBy(ord: _*)
        df.withColumn("__srk", row_number().over(w1))
          .filter(q.isNull || col("__srk") <= q).drop("__srk")
      }
    copy(df = pre.withColumn("__rk", row_number().over(w))
      .filter(q.isNull || col("__rk") <= q).drop("__rk"),
      stages = stages :+ s"quota(${quotas.size} strata" +
        (if (salt > 1) s", salt=$salt" else "") + ")")
  }

  /** Per-key document cap — the web-curation "at most K documents per
    * domain" rule that stops a handful of mega-hosts dominating a crawl
    * corpus. Keeps the first `cap` documents of every key in
    * deterministic md5(id) order: layout- and run-independent like
    * sampleQuota, but the order key is md5 (not xxhash64) so an exact
    * kept-SET oracle can be restated in ANSI SQL, and every key gets the
    * same cap without enumerating keys up front (quotas enumerate).
    *
    * Scale shape: one rank-over-window shuffle keyed by `keyCol`; pass
    * `salt > 1` for the two-pass mega-key form (rank within (key,
    * salted sub-group) first, exact global rank over the ≤ salt·cap
    * survivors per key — identical kept set, property-pinned). */
  def capPerKey(keyCol: String, cap: Long, salt: Int = 0): Curate = {
    require(cap >= 0, "cap must be non-negative")
    val ord = Seq(md5(col(idCol).cast("string")), col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(ord: _*)
    val pre =
      if (salt <= 1) df
      else {
        val w1 = org.apache.spark.sql.expressions.Window
          .partitionBy(col(keyCol), saltOf(salt)).orderBy(ord: _*)
        df.withColumn("__srk", row_number().over(w1))
          .filter(col("__srk") <= cap).drop("__srk")
      }
    copy(df = pre.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= cap).drop("__rk"),
      stages = stages :+ s"cap_per_$keyCol<=$cap" +
        (if (salt > 1) s"(salt=$salt)" else ""))
  }

  /** Token-budget stratified sample: corpus recipes are specified in
    * tokens, not documents ("1T of web, 100B of code"). Per stratum,
    * documents are taken in seeded-hash order while the running token
    * total stays within the budget (strict prefix — the budget is never
    * exceeded; a first document alone over budget yields an empty
    * stratum). Deterministic across runs and layouts like sampleQuota;
    * strata absent from `budgets` keep all rows.
    *
    * `tokensOf` overrides the per-document token counter (default: the
    * whitespace `Text.tokenCount`; pass `Text.bpeCount(...)` for
    * tokenizer-accurate budgets). `salt > 1` selects the mega-stratum
    * form: the exact bucketed two-phase prefix sum (the
    * [[Pack.packPlan]] scan shape) with ≥ `salt` buckets. The bucket is
    * the hash key's HIGH BITS — a prefix of the sort key, so bucket
    * order is consistent with (hash, id) order and the per-bucket
    * window plus driver-side bucket offsets reproduce the single-window
    * prefix sum EXACTLY, for every input including zero-token rows (a
    * salted filter-then-rescan form is NOT exact: dropping a sub-group's
    * over-budget row discards token mass that globally precedes a
    * survivor). Driver traffic is one (stratum, bucket) total per
    * BUDGETED stratum — ≤ budgets.size × buckets rows by construction,
    * independent of data size.
    *
    * The default `salt = -1` is AUTO: one cheap probe (groupBy-count of
    * the budgeted strata — partial-aggregated, ≤ budgets.size driver
    * rows) engages the bucketed form when any budgeted stratum exceeds
    * `autoBucketRows` rows, with buckets sized to ~`autoBucketRows`/2
    * rows each (clamped to ≤ 1024). The 100 TB contract shouldn't
    * depend on the caller knowing their stratum histogram; the kept set
    * is identical either way (the bucketed form is exact), so auto only
    * changes plan shape. `salt = 0` forces the single window. */
  def sampleTokenBudget(strataCol: String, budgets: Map[String, Long],
      seed: Long = 42L, salt: Int = -1, tokensOf: Column = null,
      autoBucketRows: Long = Curate.DefaultAutoBucketRows): Curate = {
    require(budgets.values.forall(_ >= 0), "budgets must be non-negative")
    val m = typedlit(budgets)
    val b = element_at(m, col(strataCol))
    val tk = Option(tokensOf).getOrElse(Text.tokenCount(col(textCol)))
    val h = xxhash64(col(idCol), lit(seed))
    val eff =
      if (salt >= 0 || budgets.isEmpty) salt
      else {
        val maxRows = df
          .filter(col(strataCol).isin(budgets.keys.toSeq: _*))
          .groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
          .agg(coalesce(max(col("__n")), lit(0L))).head().getLong(0)
        if (maxRows <= autoBucketRows) 0
        else {
          // clamp: autoBucketRows = 1 would make the divisor 0 (r11 ADVICE)
          val per = math.max(1L, autoBucketRows / 2)
          math.min(1024L, (maxRows + per - 1) / per).toInt
        }
      }
    val out =
      if (eff <= 1) {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(strataCol)).orderBy(h, col(idCol))
        df.withColumn("__cum", sum(tk).over(w))
          .filter(b.isNull || col("__cum") <= b).drop("__cum")
      } else {
        val spark = df.sparkSession
        import spark.implicits._
        // bits = ceil(log2(buckets)); arithmetic shiftright of the signed
        // hash is monotone, so __bk sorts consistently with __h
        val bits = 32 - Integer.numberOfLeadingZeros(eff - 1)
        val keyed = df.withColumn("__tk", coalesce(tk.cast("long"), lit(0L)))
          .withColumn("__h", h)
          .withColumn("__bk", shiftright(col("__h"), 64 - bits))
        // Phase 1: per-(stratum, bucket) token totals for budgeted
        // strata only — bounded driver rows, partial-aggregated.
        val budgeted = col(strataCol).isin(budgets.keys.toSeq: _*)
        val totals = keyed.filter(budgeted)
          .groupBy(col(strataCol).cast("string").as("__s"), col("__bk"))
          .agg(sum(col("__tk")).as("__t"))
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        val offs = totals.groupBy(_._1).toSeq.flatMap { case (s, rs) =>
          var acc = 0L
          rs.sortBy(_._2).map { case (_, bk, t) =>
            val o = acc; acc += t; (s, bk, o)
          }
        }
        val offDf = offs.toDF("__s2", "__bk2", "__boff")
        // Phase 2: within-(stratum, bucket) cumsum + broadcast offsets —
        // never one mega-stratum window task.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col(strataCol), col("__bk"))
          .orderBy(col("__h"), col(idCol))
        keyed.join(broadcast(offDf),
            col(strataCol).cast("string") === col("__s2") &&
              col("__bk") === col("__bk2"), "left")
          .withColumn("__cum", col("__boff") + sum(col("__tk")).over(w))
          .filter(b.isNull || col("__cum") <= b)
          .drop("__tk", "__h", "__bk", "__s2", "__bk2", "__boff", "__cum")
      }
    copy(df = out,
      stages = stages :+ s"token_budget(${budgets.size} strata" +
        (if (eff > 1) s", salt=$eff${if (salt < 0) "(auto)" else ""}"
         else "") + ")")
  }

  /** Summary metrics of the surviving corpus (one aggregate). */
  def summary: DataFrame =
    df.agg(
      count(lit(1)).as("docs"),
      sum(Text.tokenCount(col(textCol))).cast("long").as("tokens"),
      count_distinct(Text.fingerprint(col(textCol))).as("distinct_fp"))

  /** Leakage-safe split assignment: adds a `split` column such that
    * every row sharing `groupCol` lands in the SAME split — pass a dup
    * cluster label ([[Dedup.dupClusters]] / [[Dedup.embedDupLabels]]),
    * a domain, or a URL host as the group so correlated rows (near
    * duplicates, same-site pages) never straddle train and eval.
    * Row-local, no shuffle: see [[Curate.splitAssign]]. */
  def withSplit(groupCol: String, fractions: Seq[(String, Double)],
      seed: String = ""): Curate =
    copy(df = df.withColumn("split",
        Curate.splitAssign(col(groupCol), fractions, seed)),
      stages = stages :+ s"split(${fractions.map(_._1).mkString("/")})")
}

object Curate {
  /** Deterministic hash split assignment: maps a group key to one of
    * `fractions`' names with the given probabilities, as a PURE column
    * expression — no shuffle, no RNG state, stable across runs, engines,
    * partitionings and cluster sizes (`rand()`-based splits are none of
    * these). The draw is the first 8 hex chars of md5(key || seed)
    * compared against cumulative cuts rendered as zero-padded hex
    * strings: lowercase-hex string order equals numeric order, and both
    * Spark and DuckDB emit lowercase md5 hex, so an external oracle can
    * restate the assignment verbatim. `seed` re-deals the whole split
    * (e.g. per experiment) without touching the data. A null key lands
    * in the LAST split (the residual bucket) deterministically.
    *
    * This is the split PRIMITIVE; leakage safety comes from what you
    * key it with — hash a dup-cluster label or a domain, not the row
    * id, and the whole correlated unit moves together. */
  def splitAssign(key: Column, fractions: Seq[(String, Double)],
      seed: String = ""): Column = {
    require(fractions.nonEmpty, "splitAssign needs at least one split")
    require(fractions.forall(_._2 >= 0.0) &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      s"fractions must be >= 0 and sum to 1: $fractions")
    val h = substring(
      md5(concat(key.cast("string"), lit(seed)).cast("binary")), 1, 8)
    if (fractions.size == 1) lit(fractions.head._1)
    else {
      var acc = 0.0
      val cuts = fractions.dropRight(1).map { case (name, f) =>
        acc += f
        name -> f"${math.min(4294967295L, (acc * 4294967296.0).toLong)}%08x"
      }
      val first = when(h < lit(cuts.head._2), lit(cuts.head._1))
      cuts.tail.foldLeft(first) { case (c, (n, cut)) =>
        c.when(h < lit(cut), lit(n))
      }.otherwise(lit(fractions.last._1))
    }
  }

  /** Auto-bucketing threshold for [[Curate.sampleTokenBudget]]: a
    * budgeted stratum above this many rows engages the exact bucketed
    * two-phase prefix sum (buckets sized to ~half this, so the hot
    * stratum's window sort splits into ≥2 tasks immediately past the
    * threshold). 2^22 ≈ 4.2M rows — the regime where the single
    * mega-stratum sort task was measured at 2.6× the bucketed form. */
  val DefaultAutoBucketRows: Long = 1L << 22
}
