package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (BASELINE.json
  * north-star surface): normalization, tokenization, token counting,
  * quality scoring, language-ID, fingerprinting. Everything is a codegen'd
  * Column expression — no UDFs — so the operators run at scan speed and
  * fuse with any other projection. SQL-restatable for oracle checks. */
object Text {

  /** Canonical normalization: lowercase, strip non-alphanumerics to
    * spaces, collapse runs, trim. The fingerprint/dedup key basis.
    * ONE native byte pass ([[graft.functions.NormalizeText]]) — the
    * two-regex form it replaces ([[normalizeRegex]]) was the dominant
    * sf10 text constant (~20 s/500k docs just normalizing, under every
    * tokens/fingerprint/quality call). */
  def normalize(c: Column): Column = graft.functions.NormalizeText(c)

  /** Regex reference form of [[normalize]] (value-identical; specs pin
    * the native expression against it, and oracle SQL restates THIS). */
  def normalizeRegex(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", " "),
      " +", " "))

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normalize(c), " ")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column =
    when(normalize(c) === "", 0).otherwise(size(tokens(c)))

  /** BPE-ish subword count estimate: words + digit runs + punctuation
    * marks, the standard cheap proxy when no tokenizer model ships with
    * the engine. */
  def approxBpeCount(c: Column): Column =
    regexp_count(c, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Tokenizer-accurate subword count over a loadable piece vocabulary
    * — greedy longest-match, one native codegen'd trie scan per row
    * ([[graft.functions.BpeCount]]). Token-budget sampling
    * ([[Curate.sampleTokenBudget]]'s `tokensOf`) and sequence packing
    * ([[Pack.packPlan]]'s token column) are token-denominated contracts;
    * pass this where the recipe counts real tokenizer pieces. Load a
    * vocab with [[bpeVocabFromFile]] (one piece per line, # comments). */
  def bpeCount(c: Column, vocab: Seq[String]): Column =
    graft.functions.BpeCount(c, vocab)

  /** Reference Scala form of [[bpeCount]]'s greedy longest-match rule
    * (naive prefix scan, no trie) — the semantics the kernel must match
    * exactly; parity-pinned in specs, not for hot paths. */
  def bpeCountReference(text: String, vocab: Seq[String]): Int = {
    val byLen = vocab.distinct.sortBy(-_.length)
    var i = 0
    var count = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (c <= ' ') i += 1
      else byLen.find(p => text.startsWith(p, i)) match {
        case Some(p) => count += 1; i += p.length
        case None =>
          count += 1
          i += (if (Character.isHighSurrogate(c) && i + 1 < text.length) 2
                else 1)
      }
    }
    count
  }

  /** Load a piece vocabulary: one piece per line, blank lines and
    * #-comments skipped. */
  def bpeVocabFromFile(path: String): Seq[String] = {
    val src = scala.io.Source.fromFile(path, "UTF-8")
    try src.getLines().map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toList
    finally src.close()
  }

  /** Tiny demonstration vocabulary (common English subword pieces) for
    * tests and the oracle queries; real deployments load their
    * tokenizer's merged-piece inventory via [[bpeVocabFromFile]]. */
  val demoBpeVocab: Seq[String] = Seq(
    "hello", "hell", "he", "world", "wor", "ld", "lo", "ing", "tion",
    "the", "th", "er", "an", "re", "on", "at", "en", "es", "or", "te",
    "of", "ed", "is", "it", "al", "ar", "st", "to", "nt", "ng", "se",
    "a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "l", "m",
    "n", "o", "p", "q", "r", "s", "t", "u", "v", "w", "x", "y", "z",
    "0", "1", "2", "3", "4", "5", "6", "7", "8", "9")

  /** Word n-gram shingles from an ALREADY-MATERIALIZED token array column.
    * Callers building multi-stage pipelines must project `tokens(c)` to a
    * named column first and pass that attribute here: Catalyst does not
    * CSE inside lambda bodies, so nesting `tokens(c)` under the transform
    * would re-run the normalize+split pipeline once per shingle per row
    * (measured ~10x slowdown). */
  def shinglesOf(t: Column, n: Int): Column =
    when(size(t) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))

  /** Convenience single-expression form (fine for one-shot projections;
    * see shinglesOf for the pipeline-internal variant). */
  def shingles(c: Column, n: Int): Column = shinglesOf(tokens(c), n)

  /** Per-token 64-bit hashes of a token array — project this ONCE, then
    * feed the attribute to shingleHashesOf (Catalyst does not CSE inside
    * lambda bodies; nesting this under the window transform would rehash
    * every token once per window position). */
  def tokenHashes(t: Column): Column = transform(t, tok => xxhash64(tok))

  /** 64-bit hashes of all word n-gram shingles WITHOUT materializing the
    * shingle strings — ONE native codegen pass
    * ([[graft.functions.ShingleHashes64]]): tokens are xxhash64'd once,
    * windows combine by rotate-5-left + XOR in a primitive long loop.
    * Equal shingle text ⇒ equal hash, so set-overlap semantics match
    * hashing the string form at a fraction of the cost. Two earlier
    * forms were retired by the scaling ladder: per-position shingle
    * STRINGS (~80-char concat + xxhash64 per window, the r4 sf10
    * bottleneck), then a HOF slice/aggregate pipeline whose boxed
    * lambdas and per-window allocations still dominated the sf10 bench
    * (the same GC-pressure profile that retired the HOF hyperplane
    * bucketer). */
  def shingleHashes(toks: Column, n: Int): Column =
    graft.functions.ShingleHashes64(toks, n)

  /** HOF reference form of [[shingleHashes]] (value-identical; specs pin
    * the native expression against it). `th` must be an
    * already-projected tokenHashes column — Catalyst does not CSE
    * inside lambda bodies. */
  def shingleHashesOf(th: Column, n: Int): Column =
    when(size(th) < n, array().cast("array<bigint>")).otherwise(
      transform(sequence(lit(0), size(th) - n),
        i => aggregate(slice(th, i + 1, lit(n)), lit(0L),
          (acc, h) => shiftleft(acc, 5)
            .bitwiseOR(shiftrightunsigned(acc, 59)).bitwiseXOR(h))))

  // ---- quality scoring (reference-style heuristics) ----
  def punctRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(regexp_count(c, lit("[^A-Za-z0-9\\s]")).cast("double") / length(c))

  def upperRatio(c: Column): Column =
    when(length(c) === 0, 0.0)
      .otherwise(regexp_count(c, lit("[A-Z]")).cast("double") / length(c))

  /** Mean word length over a MATERIALIZED token array (the *Of-variant
    * convention — see shinglesOf). Empty-text token arrays are [""] from
    * split, so the word count excludes empty tokens. */
  def meanWordLengthOf(toks: Column): Column = {
    val wc = wordCountOf(toks)
    when(wc === 0, 0.0)
      .otherwise(aggregate(toks, lit(0L), (acc, w) => acc + length(w))
        .cast("double") / wc)
  }

  def meanWordLength(c: Column): Column = meanWordLengthOf(tokens(c))

  /** Non-empty token count: `split("", " ")` yields [""] (one empty
    * token), so size() alone reports 1 word for an empty document. */
  def wordCountOf(toks: Column): Column =
    size(filter(toks, w => w =!= ""))

  val stopwordsEn: Seq[String] = Seq("the", "a", "an", "and", "or", "of",
    "to", "in", "is", "it", "that", "for", "on", "with", "as")

  def stopwordRatio(c: Column, stopwords: Seq[String] = stopwordsEn): Column = {
    val t = tokens(c)
    when(size(t) === 0, 0.0).otherwise(
      size(filter(t, w => w.isin(stopwords: _*))).cast("double") / size(t))
  }

  /** Composite quality score in [0,1]: length band + punctuation sanity +
    * stopword presence + word-length sanity. Deterministic heuristic. */
  def qualityScore(c: Column,
                   minChars: Int = 50, maxChars: Int = 100000): Column = {
    val lenOk = (length(c) >= minChars && length(c) <= maxChars).cast("double")
    val punctOk = (punctRatio(c) <= 0.3).cast("double")
    val stopOk = (stopwordRatio(c) >= 0.05).cast("double")
    val wordOk = (meanWordLength(c).between(2.0, 12.0)).cast("double")
    (lenOk + punctOk + stopOk + wordOk) / 4.0
  }

  // ---- language identification (marker-word heuristic) ----
  /** Marker lexicons: high-frequency function words per language. The
    * n-gram-profile approach of real LID distilled to a fuseable Column
    * op: score(lang) = count of marker hits in the token set. */
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it", "with"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por", "con"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ein", "mit", "ist"),
    "fr" -> Seq("le", "la", "les", "des", "est", "une", "que", "dans"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和", "不"))

  def langScore(c: Column, lang: String): Column =
    langScoreOf(tokens(c), lang)

  def langScoreOf(toks: Column, lang: String): Column =
    size(filter(toks, w => w.isin(markers(lang): _*)))

  /** Predicted language: argmax marker score, "und" when all zero.
    * Ties break by language name order (deterministic). Takes BOTH the
    * raw column and a materialized token column: CJK markers must be
    * scored on the raw text (normalize() strips non-latin characters, so
    * a token-only scorer could never return "zh"), while latin markers
    * score on tokens. Prefer this over `languageId` in pipelines — the
    * per-language scores would otherwise each re-tokenize (no CSE inside
    * lambdas). */
  def languageIdOf(raw: Column, toks: Column): Column = {
    val best = langBest(raw, toks)
    when(best.getField("s") === 0, "und").otherwise(best.getField("l"))
  }

  /** Argmax {s: score, l: lang} struct over the marker scores — ONE
    * native codegen pass ([[graft.functions.LangBest]]): a primitive
    * loop over tokens probing per-language marker hash-sets plus a char
    * scan of the raw text for CJK, ties to the lexicographically-larger
    * label (the `greatest(struct(s, l))` semantics of the HOF form it
    * replaces, which evaluated five boxed filter-lambda passes per row
    * and was the second-heaviest sf10 constant in the scaling ladder).
    * Prefer materializing THIS as a named column (one `withColumn`) and
    * deriving the label from the projected attribute: Catalyst will not
    * common-subexpression a non-trivial expression used twice inside a
    * grouping key — r01's q74 paid the scorer 2× per row. */
  def langBest(raw: Column, toks: Column): Column =
    graft.functions.LangBest(raw, toks, markers, "zh")

  /** HOF reference form of [[langBest]] (value-identical; specs pin the
    * native expression against it). */
  def langBestHof(raw: Column, toks: Column): Column = {
    val langs = markers.keys.toSeq.sorted
    val scored = langs.map { l =>
      val sc =
        if (l == "zh") regexp_count(raw, lit(markers("zh").mkString("|")))
        else langScoreOf(toks, l)
      struct(sc.as("s"), lit(l).as("l"))
    }
    greatest(scored: _*)
  }

  def languageId(c: Column): Column = languageIdOf(c, tokens(c))

  // ---- repetition / Gopher quality filters ----

  /** Fraction of repeated word n-grams within a document (the Gopher
    * repetition filters, Rae et al. 2021 — repeated 2..4-grams signal
    * boilerplate/spam): 1 − distinct/total over the shingle set; empty
    * shingle set (doc shorter than n words) scores 0. Takes a
    * MATERIALIZED token column (see shinglesOf's CSE note). */
  def duplicateNgramFractionOf(toks: Column, n: Int = 3): Column = {
    val g = shinglesOf(toks, n)
    when(size(g) === 0, 0.0).otherwise(
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g))
  }

  def duplicateNgramFraction(c: Column, n: Int = 3): Column =
    duplicateNgramFractionOf(tokens(c), n)

  /** Gopher document-quality flags (Rae et al. 2021, Appendix A1 —
    * published thresholds): a struct of booleans, TRUE = passes. All
    * codegen'd Column arithmetic over one materialized token array.
    *  - word_count in [50, 100 000]
    *  - mean word length in [3, 10]
    *  - symbol-to-word ratio (# or …) <= 0.1
    *  - >= 80% of words contain an alphabetic character
    *  - >= 2 distinct required stopwords present */
  def gopherFlags(raw: Column, toks: Column): Column = {
    // non-empty word count: size(toks) alone is 1 for an empty document
    // ([""] from split), which would make every wc-guard dead and let
    // symbol_ratio_ok pass zero-word docs
    val wc = wordCountOf(toks)
    val mwl = meanWordLengthOf(toks)
    val symbols = regexp_count(raw, lit("#|\\.\\.\\.")).cast("double")
    val alphaWords = size(filter(toks, w => w.rlike("[a-z]")))
    val requiredStop = Seq("the", "be", "to", "of", "and", "that",
      "have", "with")
    val stopHits = size(filter(typedlit(requiredStop),
      s => array_contains(toks, s)))
    struct(
      (wc >= 50 && wc <= 100000).as("word_count_ok"),
      (mwl >= 3.0 && mwl <= 10.0).as("mean_word_len_ok"),
      (wc > 0 && symbols / wc <= 0.1).as("symbol_ratio_ok"),
      (wc > 0 && alphaWords.cast("double") / wc >= 0.8).as("alpha_ratio_ok"),
      (stopHits >= 2).as("stopwords_ok"))
  }

  // ---- fingerprinting ----
  /** Content fingerprint: md5 of the normalized text (engine-portable). */
  def fingerprint(c: Column): Column = md5(normalize(c))

  /** Rolling min-hash fingerprint over k-gram shingles (winnowing-lite):
    * min xxhash64 over shingles — robust to small edits at the tails. */
  def rollingFingerprint(c: Column, n: Int = 3): Column =
    array_min(transform(shingles(c, n), s => xxhash64(s)))

  // ---- crawl text extraction ----
  /** HTML → text extraction for crawl corpora (the step before every
    * quality/dedup stage of a web pretraining pipeline): drop
    * script/style blocks, strip tags, decode the common entities, and
    * collapse whitespace. A chained codegen'd regexp_replace/replace
    * projection — no parser, no UDF — which is the deliberate contract:
    * it runs at scan speed on 100 TB of WARC-extracted payloads and is
    * engine-portable (every step restates in ANSI SQL, so the oracle can
    * replay it exactly). NOT a full HTML5 parser: malformed nesting
    * degrades to tag-stripping, which is what large-scale extraction
    * does anyway. The whitespace class is spelled explicitly
    * ([ \t\n\r]) because Java's \s and RE2's \s disagree on \x0B.
    * `&amp;` decodes LAST so `&amp;lt;` yields `&lt;`, not `<`. */
  def stripHtml(c: Column): Column = {
    val noBlocks = regexp_replace(c,
      "(?is)<(script|style)[^>]*>.*?</(script|style)[ \\t\\n\\r]*>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (e, (k, v)) => replace(e, lit(k), lit(v)) }
    trim(regexp_replace(decoded, "[ \\t\\n\\r]+", " "))
  }

  /** URL canonicalization for crawl-frontier dedup: lowercase scheme and
    * host, drop the default port (:80 http / :443 https), optionally
    * strip a leading `www.`, drop the fragment, and normalize an empty
    * path to `/`. Path case and the query string are PRESERVED — they
    * are semantic on most servers. Strings without a `scheme://` prefix
    * pass through unchanged. Pure regexp_extract/lower composition:
    * scan-speed, engine-portable (the oracle replays it in SQL), and no
    * java.net.URL per row (driver-side parsing is the anti-pattern). */
  def canonicalUrl(u: Column, stripWww: Boolean = true): Column = {
    val scheme = lower(regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostport =
      lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val noPort = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val host = if (stripWww) regexp_replace(noPort, "^www\\.", "") else noPort
    val rest =
      regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val path = when(rest === "", lit("/")).otherwise(rest)
    when(scheme === "", u).otherwise(concat(scheme, lit("://"), host, path))
  }
}
