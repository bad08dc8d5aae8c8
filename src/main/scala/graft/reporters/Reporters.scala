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

  private def esc(s: String): String = s.flatMap {
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
    def hesc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;")
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
}
