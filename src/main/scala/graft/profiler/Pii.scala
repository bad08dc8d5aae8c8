package graft.profiler

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** PII scanning and masking (reference: truthound `th.scan()` regex sweep
  * producing PIIReport, `api.py:152-203` + `scanners.py`; `th.mask()` with
  * redact/hash/partial strategies, `api.py:206-268` + `maskers.py`).
  *
  * The scan is ONE fused aggregation: count(rlike) per (column, pattern) —
  * a single whole-stage-codegen'd pass no matter how many patterns. */
object Pii {
  /** Pattern registry. Substring-style (unanchored) like the reference's
    * scanners; RE2-compatible so SQL oracles can restate them. */
  val patterns: Map[String, String] = Map(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "phone_intl" -> "\\+[0-9]{1,3}[- ]?[0-9]{2,4}[- ]?[0-9]{3,4}[- ]?[0-9]{3,4}",
    "ssn_us" -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "credit_card" -> "\\b[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}[- ]?[0-9]{4}\\b",
    "ipv4" -> "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b",
    "korean_rrn" -> "\\b[0-9]{6}-[1-8][0-9]{6}\\b",
    // global pattern set (reference `privacy/global_patterns.py`),
    // substring-form like the rest of the registry
    "uuid" -> "\\b[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}\\b",
    "ipv6" -> "\\b([0-9a-fA-F]{1,4}:){7}[0-9a-fA-F]{1,4}\\b",
    "mac_address" -> "\\b([0-9A-Fa-f]{2}:){5}[0-9A-Fa-f]{2}\\b",
    "phone_us" -> "\\(?[0-9]{3}\\)?[ .-][0-9]{3}[ .-][0-9]{4}\\b",
    "cpf_br" -> "\\b[0-9]{3}\\.?[0-9]{3}\\.?[0-9]{3}-?[0-9]{2}\\b",
    "cnpj_br" -> "\\b[0-9]{2}\\.?[0-9]{3}\\.?[0-9]{3}/?[0-9]{4}-?[0-9]{2}\\b",
    "cep_br" -> "\\b[0-9]{5}-[0-9]{3}\\b",
    "sin_ca" -> "\\b[0-9]{3}[ -][0-9]{3}[ -][0-9]{3}\\b",
    "postal_ca" -> "\\b[A-Z][0-9][A-Z] ?[0-9][A-Z][0-9]\\b",
    "my_number_jp" -> "\\b[0-9]{12}\\b",
    "chinese_id" -> "\\b[0-9]{17}[0-9Xx]\\b",
    // plugin-regulation patterns (reference `privacy/plugins.py`: POPIA,
    // PDPA-TH, PDPB-IN, KVKK-TR, HIPAA, PCI-DSS), substring-form
    "sa_id_za" -> "\\b[0-9]{13}\\b",
    "thai_id" -> "\\b[0-9]{13}\\b",
    "aadhaar_in" -> "\\b[0-9]{12}\\b",
    "pan_in" -> "\\b[A-Z]{5}[0-9]{4}[A-Z]\\b",
    "tckn_tr" -> "\\b[0-9]{11}\\b",
    "mrn_us" -> "\\bMRN[0-9]{6,10}\\b")

  final case class PiiHit(column: String, pattern: String, count: Long,
      total: Long) {
    def ratio: Double = if (total == 0) 0 else count.toDouble / total
  }
  final case class PiiReport(hits: Seq[PiiHit]) {
    def flagged: Seq[PiiHit] = hits.filter(_.count > 0)
  }

  /** Scan all string columns (or `columns`) against all (or `selected`)
    * patterns in one aggregation pass. */
  def scan(df: DataFrame, columns: Seq[String] = Nil,
           selected: Seq[String] = Nil): PiiReport = {
    val cols =
      if (columns.nonEmpty) columns
      else df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq
    val pats = if (selected.nonEmpty) patterns.view.filterKeys(selected.contains).toMap
               else patterns
    if (cols.isEmpty || pats.isEmpty) return PiiReport(Nil)
    // several regulations share a regex shape (sa_id_za/thai_id are both
    // 13 digits, aadhaar_in/my_number_jp both 12): aggregate once per
    // DISTINCT regex and fan the count out to every pattern name, so the
    // fused scan never computes duplicate rlike aggregates
    val regexRep: Map[String, String] = pats.toSeq.groupBy(_._2)
      .map { case (regex, named) => regex -> named.map(_._1).min }
    val aggs: Seq[Column] = count(lit(1)).as("__n") +:
      (for { c <- cols; (regex, rep) <- regexRep.toSeq }
        yield count(when(col(c).isNotNull && col(c).rlike(regex), 1))
          .as(s"${c}__$rep")).toSeq
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getAs[Long]("__n")
    PiiReport(for { c <- cols; pn <- pats.keys.toSeq.sorted }
      yield PiiHit(c, pn,
        row.getAs[Long](s"${c}__${regexRep(pats(pn))}"), total))
  }

  // ---- maskers ----
  /** Redact every match of `pattern` with `replacement`. */
  def redact(c: Column, pattern: String, replacement: String = "[REDACTED]"): Column =
    regexp_replace(c, pattern, replacement)

  /** Deterministic irreversible hash mask (sha256 hex). */
  def hashMask(c: Column): Column = sha2(c.cast("string"), 256)

  /** Keep first `keep` chars, star the rest (fixed-width tail). */
  def partialMask(c: Column, keep: Int = 2, stars: Int = 6): Column =
    concat(substring(c, 1, keep), lit("*" * stars))

  /** Format-preserving deterministic fake (reference maskers' "fake"
    * strategy without a faker dependency): same kind of value, derived
    * from a hash of the original so equal inputs map to equal fakes
    * (join keys survive masking) while the original is unrecoverable
    * beyond the hash. */
  def fakeMask(c: Column, kind: String): Column = {
    val h = pmod(xxhash64(c), lit(1000000L)).cast("string")
    kind match {
      case "email" => concat(lit("user"), h, lit("@example.com"))
      case "phone" => concat(lit("+1555"), lpad(h, 7, "0"))
      case "name"  => concat(lit("Person_"), h)
      case _ => throw new IllegalArgumentException(s"unknown fake kind: $kind")
    }
  }

  /** Mask all columns flagged by a scan, by strategy name. Unknown
    * strategies are rejected — a typo must not silently fall back to a
    * different masking guarantee. */
  def maskFlagged(df: DataFrame, report: PiiReport,
                  strategy: String = "redact"): DataFrame = {
    require(Seq("redact", "hash", "partial").contains(strategy),
      s"unknown mask strategy: $strategy (redact|hash|partial)")
    report.flagged.map(_.column).distinct.foldLeft(df) { (d, c) =>
      val masked = strategy match {
        case "hash"    => hashMask(col(c))
        case "partial" => partialMask(col(c))
        case "redact" =>
          // one replace per DISTINCT regex (shared shapes fold together)
          report.flagged.filter(_.column == c).map(h => patterns(h.pattern))
            .distinct.foldLeft(col(c)) { (cc, regex) =>
              regexp_replace(cc, regex, "[REDACTED]")
            }
      }
      d.withColumn(c, masked)
    }
  }

  /** Free-text PII scrubbing for training corpora: every match of each
    * selected pattern is replaced by a bracketed type tag (`[EMAIL]`,
    * `[SSN_US]`, …) — the conventional pre-training redaction that keeps
    * sentence structure while removing the identifier (vs [[redact]]'s
    * single opaque token per column-level policy; reference maskers'
    * redact strategy is per-cell, `masking/maskers.py`).
    *
    * One chained `regexp_replace` per pattern, all codegen'd inside the
    * scan stage — no UDF, no extra pass. Patterns apply in the ORDER
    * GIVEN (deterministic): earlier scrubs can consume text later
    * patterns would have matched, so callers restating the chain (SQL
    * oracles, audits) must preserve the order. The default list is the
    * high-precision subset — broad shapes like my_number_jp (any 12
    * digits) would mangle ordinary numbers in prose.
    *
    * Idempotent for the default set: replacement tags contain no digits
    * or '@', so a second pass is a no-op. */
  val scrubDefaults: Seq[String] =
    Seq("email", "phone_intl", "ssn_us", "credit_card", "ipv4")
  def scrubText(c: Column, selected: Seq[String] = scrubDefaults): Column =
    selected.foldLeft(c) { (acc, p) =>
      // Locale.ROOT: under a Turkish-family default locale a bare
      // toUpperCase would emit dotted capital İ tags ([EMAİL], [İPV4])
      regexp_replace(acc, patterns(p),
        s"[${p.toUpperCase(java.util.Locale.ROOT)}]")
    }
}
