package graft.reporters

import graft.core._
import java.nio.file.{Files, Paths}

/** Result reporters (reference: truthound `reporters/{console,json,
  * markdown,html}_reporter.py` + data-docs builder `datadocs/`). Pure
  * string renderers over ValidationRunResult — no engine coupling. */
object Reporters {

  def console(r: ValidationRunResult): String = {
    val sb = new StringBuilder
    sb.append(s"Validation: ${r.dataset}  rows=${r.rowCount}  ")
      .append(if (r.passed) "PASSED" else "FAILED")
      .append(s"  (${r.checks.size} checks, ${r.scanCount} scans, ")
      .append(s"mode=${r.executionMode})\n")
    r.checks.foreach { c =>
      val mark = if (c.passed) "  ok " else "  FAIL"
      sb.append(f"$mark ${c.category}%-14s ${c.validator}\n")
      c.issues.foreach { i =>
        sb.append(f"       - ${i.issueType}: ${i.count}/${i.totalCount} ")
        if (i.expected.nonEmpty) sb.append(s"expected ${i.expected} ")
        if (i.actual.nonEmpty) sb.append(s"actual ${i.actual}")
        sb.append("\n")
      }
    }
    sb.toString
  }

  private def hesc(s: String): String = s.replace("&", "&amp;")
    .replace("<", "&lt;").replace(">", "&gt;")

  /** Locale-stable number rendering (the f interpolator follows the JVM
    * default locale — a de_DE driver would emit comma decimals). */
  private def num(d: Double, prec: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${prec}f", Double.box(d))

  private[reporters] def esc(s: String): String = s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case '\r' => "\\r"; case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def json(r: ValidationRunResult): String = {
    def issueJson(i: ValidationIssue): String =
      s"""{"validator":"${esc(i.validator)}","column":"${esc(i.column)}",""" +
        s""""issue_type":"${esc(i.issueType)}","count":${i.count},""" +
        s""""total":${i.totalCount},"severity":"${i.severity}",""" +
        s""""expected":"${esc(i.expected)}","actual":"${esc(i.actual)}"}"""
    def checkJson(c: CheckResult): String =
      s"""{"validator":"${esc(c.validator)}","category":"${c.category}",""" +
        s""""passed":${c.passed},"elapsed_ms":${c.elapsedMillis},""" +
        s""""issues":[${c.issues.map(issueJson).mkString(",")}]}"""
    s"""{"dataset":"${esc(r.dataset)}","row_count":${r.rowCount},""" +
      s""""passed":${r.passed},"execution_mode":"${r.executionMode}",""" +
      s""""scan_count":${r.scanCount},""" +
      s""""checks":[${r.checks.map(checkJson).mkString(",")}]}"""
  }

  def markdown(r: ValidationRunResult): String = {
    val head = s"# Validation report — ${r.dataset}\n\n" +
      s"**${if (r.passed) "PASSED" else "FAILED"}** · ${r.rowCount} rows · " +
      s"${r.checks.size} checks · ${r.scanCount} scans\n\n" +
      "| status | category | validator | issues |\n|---|---|---|---|\n"
    head + r.checks.map { c =>
      val issues = c.issues.map(i => s"${i.issueType}:${i.count}").mkString("; ")
      s"| ${if (c.passed) "✅" else "❌"} | ${c.category} | ${c.validator} | $issues |"
    }.mkString("\n") + "\n"
  }

  def html(r: ValidationRunResult): String = {
    val rows = r.checks.map { c =>
      val cls = if (c.passed) "ok" else "fail"
      val issues = c.issues.map(i =>
        s"${hesc(i.issueType)}: ${i.count}/${i.totalCount}").mkString("<br>")
      s"""<tr class="$cls"><td>${if (c.passed) "&#9989;" else "&#10060;"}</td>""" +
        s"<td>${hesc(c.category)}</td><td>${hesc(c.validator)}</td><td>$issues</td></tr>"
    }.mkString("\n")
    s"""<!DOCTYPE html><html><head><meta charset="utf-8">
       |<title>Validation — ${hesc(r.dataset)}</title>
       |<style>body{font-family:sans-serif;margin:2em}
       |table{border-collapse:collapse}td,th{border:1px solid #ccc;padding:4px 8px}
       |tr.fail{background:#fee}</style></head><body>
       |<h1>${hesc(r.dataset)} — ${if (r.passed) "PASSED" else "FAILED"}</h1>
       |<p>${r.rowCount} rows · ${r.checks.size} checks · ${r.scanCount} scans</p>
       |<table><tr><th></th><th>category</th><th>validator</th><th>issues</th></tr>
       |$rows</table></body></html>""".stripMargin
  }

  /** Persist run artifacts into a workspace directory (reference:
    * `.truthound/` workspace, `context.py:155-440` persist_run). */
  def persistRun(r: ValidationRunResult, workspace: String, runId: String): String = {
    val dir = Paths.get(workspace, "runs", runId)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve("result.json"), json(r))
    Files.writeString(dir.resolve("report.md"), markdown(r))
    Files.writeString(dir.resolve("report.html"), html(r))
    dir.toString
  }

  /** Data-docs profile page (reference `datadocs/` builder): one static
    * HTML page rendered from a learned baseline — table stats plus a
    * card per column. Pure string rendering, no engine coupling. */
  def dataDocs(tableName: String,
      baseline: graft.profiler.TableBaseline): String = {
    def od(v: Option[Double]): String = v.map(num(_, 4)).getOrElse("—")
    def os(v: Option[String]): String = v.map(hesc).getOrElse("—")
    val cards = baseline.columns.map { c =>
      val vals = c.allowedValues.map(_.take(20).map(hesc)
        .mkString("<div class=\"vals\">", ", ", "</div>")).getOrElse("")
      s"""<div class="card"><h3>${hesc(c.name)} <small>${hesc(c.dtype)}</small></h3>
         |<table>
         |<tr><td>nulls</td><td>${c.nullCount} (${num(c.nullRatio * 100, 2)}%)</td></tr>
         |<tr><td>distinct</td><td>${c.distinctCount} (uniq ${num(c.uniqueRatio * 100, 2)}%)</td></tr>
         |<tr><td>min / max</td><td>${os(c.min)} / ${os(c.max)}</td></tr>
         |<tr><td>mean ± std</td><td>${od(c.mean)} ± ${od(c.std)}</td></tr>
         |<tr><td>q25 / q50 / q75</td><td>${od(c.q25)} / ${od(c.q50)} / ${od(c.q75)}</td></tr>
         |${c.minLength.map(l => s"<tr><td>len</td><td>$l–${c.maxLength.getOrElse(l)}</td></tr>").getOrElse("")}
         |</table>$vals</div>""".stripMargin
    }.mkString("\n")
    s"""<!DOCTYPE html><html><head><meta charset="utf-8">
       |<title>Data docs — ${hesc(tableName)}</title>
       |<style>body{font-family:sans-serif;margin:2em}
       |.card{display:inline-block;vertical-align:top;margin:8px;padding:8px 12px;
       |border:1px solid #ccc;border-radius:6px}
       |.card table{border-collapse:collapse}.card td{padding:2px 8px}
       |.vals{max-width:320px;color:#666;font-size:90%}
       |small{color:#888}</style></head><body>
       |<h1>${hesc(tableName)}</h1>
       |<p>${baseline.rowCount} rows · ${baseline.columns.size} columns</p>
       |$cards</body></html>""".stripMargin
  }

  /** Data-docs index (reference `datadocs/` site builder: index page →
    * per-run pages → per-table profile pages). Rendered from the
    * run-history store: one section per dataset, one row per stored run,
    * linking the per-run report `persistRun` wrote under
    * `<workspace>/runs/<runId>/report.html` and any profile pages passed
    * in. Run metadata is bytes per run, so the driver-side collect is
    * bounded by run count, not data size. Returns the index path. */
  def dataDocsSite(spark: org.apache.spark.sql.SparkSession,
      store: graft.stores.ResultStore, workspace: String,
      profilePages: Map[String, String] = Map.empty): String = {
    import org.apache.spark.sql.functions._
    // A never-written store reads as an empty frame (ResultStore.runs), so
    // no catch-all here: a genuinely corrupt/unreadable store must fail the
    // build of the site, not render as "0 dataset(s)".
    val runs = store.runs(spark)
        .groupBy(col("dataset"), col("runId"), col("runTs"))
        .agg(count(lit(1)).as("checks"),
          count(when(!col("passed"), 1)).as("failed"),
          first(col("rowCount")).as("rows"))
        .orderBy(col("dataset"), col("runTs").desc)
        .collect().toIndexedSeq
    val byDataset = runs.groupBy(_.getAs[String]("dataset")).toSeq.sortBy(_._1)
    val sections = byDataset.map { case (ds, rs) =>
      val rows = rs.map { r =>
        val rid = r.getAs[String]("runId")
        val failed = r.getAs[Long]("failed")
        val status = if (failed == 0) "PASS" else s"FAIL ($failed)"
        val ts = java.time.Instant.ofEpochMilli(r.getAs[Long]("runTs"))
        s"""<tr><td><a href="../runs/${hesc(rid)}/report.html">${hesc(rid)}</a></td>
           |<td>$ts</td><td class="${if (failed == 0) "ok" else "bad"}">$status</td>
           |<td>${r.getAs[Long]("rows")}</td><td>${r.getAs[Long]("checks")}</td></tr>"""
          .stripMargin
      }.mkString("\n")
      val profile = profilePages.get(ds)
        .map(p => s""" · <a href="${hesc(p)}">profile</a>""").getOrElse("")
      s"""<h2>${hesc(ds)}$profile</h2>
         |<table><tr><th>run</th><th>time</th><th>status</th><th>rows</th>
         |<th>checks</th></tr>
         |$rows</table>""".stripMargin
    }.mkString("\n")
    val html =
      s"""<!DOCTYPE html><html><head><meta charset="utf-8">
         |<title>Data docs</title>
         |<style>body{font-family:sans-serif;margin:2em}
         |table{border-collapse:collapse}td,th{padding:4px 12px;
         |border-bottom:1px solid #ddd;text-align:left}
         |.ok{color:#0a0}.bad{color:#c00}</style></head><body>
         |<h1>Data docs</h1>
         |<p>${byDataset.size} dataset(s) · ${runs.size} stored run(s)</p>
         |$sections</body></html>""".stripMargin
    val dir = Paths.get(workspace, "datadocs")
    Files.createDirectories(dir)
    val idx = dir.resolve("index.html")
    Files.writeString(idx, html)
    idx.toString
  }
}

/** Audit trail (reference `audit/` — AuditEvent + JSONL storage +
  * filters, 8 classes distilled): append-only JSONL of validation-run
  * events with actor/outcome/severity, plus a predicate reader. Events
  * are driver-side metadata (bytes per run, not per row) — file IO is
  * the honest medium, exactly like the reference's file storage
  * backend. */
object AuditLog {
  final case class AuditEvent(timestampMs: Long, eventType: String,
      dataset: String, actor: String, outcome: String, severity: String,
      detail: String)

  def record(path: String, e: AuditEvent): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    // every field goes through the shared JSON escaper: un-escaped quotes/
    // backslashes/newlines would corrupt the JSONL stream and let one
    // field's content false-match another field's read() filter
    import Reporters.{esc => js}
    val line = s"""{"ts":${e.timestampMs},"event":"${js(e.eventType)}",""" +
      s""""dataset":"${js(e.dataset)}","actor":"${js(e.actor)}",""" +
      s""""outcome":"${js(e.outcome)}","severity":"${js(e.severity)}",""" +
      s""""detail":"${js(e.detail)}"}""" + "\n"
    Files.writeString(p, line,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  /** Record a validation run's outcome (the reference's
    * VALIDATION_COMPLETED event shape). */
  def recordRun(path: String, r: ValidationRunResult,
      actor: String = "graft", nowMs: Long = System.currentTimeMillis())
      : Unit =
    record(path, AuditEvent(nowMs, "validation_completed", r.dataset,
      actor, if (r.passed) "success" else "failure",
      if (r.passed) "info" else "warning",
      s"checks=${r.checks.size} failed=${r.checks.count(!_.passed)} " +
        s"rows=${r.rowCount}"))

  /** Read events back, newest last, optionally filtered. */
  def read(path: String, dataset: Option[String] = None,
      outcome: Option[String] = None): Seq[String] = {
    val p = Paths.get(path)
    if (!Files.exists(p)) return Nil
    import scala.jdk.CollectionConverters._
    Files.readAllLines(p).asScala.toSeq
      .filter(l => dataset.forall(d => l.contains(s""""dataset":"$d"""")))
      .filter(l => outcome.forall(o => l.contains(s""""outcome":"$o"""")))
  }
}
