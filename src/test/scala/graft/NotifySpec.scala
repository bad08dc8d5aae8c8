package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.checkpoint._
import graft.checkpoint.Notify._
import graft.core._

class NotifySpec extends AnyFunSuite {

  private final class Recording(status: Int = 200) extends Transport {
    var sent = List.empty[Request]
    def send(req: Request): Response = { sent = sent :+ req; Response(status) }
  }

  private def result(status: CheckpointStatus,
      failed: Int = 1): CheckpointResult = {
    val checks = (1 to 3).map { i =>
      CheckResult(s"check$i", "completeness", passed = i > failed,
        issues = if (i <= failed)
          Seq(ValidationIssue(s"check$i", "c", "null_values", 7, 100,
            "low", "", "")) else Nil,
        elapsedMillis = 5)
    }
    CheckpointResult("orders-daily", status,
      Some(ValidationRunResult("orders", 100, checks, "fused", 1)),
      if (status == CheckpointStatus.Error) Some("boom") else None, 42)
  }

  test("slack payload carries status, counts and mentions on failure") {
    val p = slackPayload(result(CheckpointStatus.Fail),
      channel = Some("#dq"), mentionOnFailure = Seq("U123"))
    assert(p.contains("\"channel\":\"#dq\""))
    assert(p.contains("<@U123>") && p.contains(":x:"))
    assert(p.contains("1/3 checks failed") && p.contains("7 violation(s)"))
    val pass = slackPayload(result(CheckpointStatus.Pass, failed = 0),
      mentionOnFailure = Seq("U123"))
    assert(!pass.contains("<@U123>") && pass.contains(":white_check_mark:"))
  }

  test("teams/discord/pagerduty payload shapes") {
    val t = teamsPayload(result(CheckpointStatus.Error))
    assert(t.contains("MessageCard") && t.contains("DAA038") &&
      t.contains("\"Error\"") && t.contains("boom"))
    val d = discordPayload(result(CheckpointStatus.Pass, failed = 0))
    assert(d.contains("embeds") && d.contains("0/3 checks failed"))
    val pdFail = pagerDutyPayload(result(CheckpointStatus.Fail), "rk1")
    assert(pdFail.contains("\"event_action\":\"trigger\"") &&
      pdFail.contains("graft-orders-daily"))
    val pdPass = pagerDutyPayload(result(CheckpointStatus.Pass, 0), "rk1")
    assert(pdPass.contains("\"event_action\":\"resolve\""))
  }

  test("webhook template substitution and default payload") {
    val r = result(CheckpointStatus.Fail)
    val templ = webhookPayload(r, Some("""{"n":"{name}","s":"{status}","f":{failed}}"""))
    assert(templ == """{"n":"orders-daily","s":"FAIL","f":1}""")
    val dflt = webhookPayload(r, None)
    assert(dflt.contains("\"checks\":3") && dflt.contains("\"failed\":1") &&
      dflt.contains("\"violations\":7") && dflt.contains("\"error\":null"))
  }

  test("condition gating, auth header, and outcome classification") {
    val rec = new Recording()
    val act = webhook("https://example.invalid/hook",
      bearerToken = Some("tok"), notifyOn = Condition.OnFailure,
      transport = rec)
    act.run(result(CheckpointStatus.Pass, failed = 0))
    assert(rec.sent.isEmpty)
    assert(act.lastOutcome.exists(_.status == "skipped"))
    act.run(result(CheckpointStatus.Fail))
    assert(rec.sent.size == 1)
    assert(rec.sent.head.headers("Authorization") == "Bearer tok")
    assert(rec.sent.head.headers("Content-Type") == "application/json")
    assert(act.lastOutcome.exists(_.status == "success"))

    val bad = new Recording(status = 500)
    val act2 = slack("https://example.invalid/hook", transport = bad)
    act2.run(result(CheckpointStatus.Fail))
    assert(act2.lastOutcome.exists(_.status == "failure"))

    val boom = new Transport {
      def send(req: Request) = throw new RuntimeException("net down")
    }
    val act3 = teams("https://example.invalid/hook", transport = boom)
    act3.run(result(CheckpointStatus.Fail))
    assert(act3.lastOutcome.exists(o =>
      o.status == "error" && o.message.contains("net down")))
  }

  test("telegram payload HTML-escapes name and error text") {
    val r = result(CheckpointStatus.Error).copy(
      name = "suite<orders & lineitem>",
      error = Some("TypeError: Map<String, List<Int>> & more"))
    val tg = telegramPayload(r, "-1")
    // parse_mode=HTML: a raw '<'/'>'/'&' makes Telegram reject the whole
    // message with 400 — everything interpolated must be escaped
    assert(tg.contains("suite&lt;orders &amp; lineitem&gt;"))
    assert(tg.contains("Map&lt;String, List&lt;Int&gt;&gt; &amp; more"))
    assert(!tg.contains("suite<orders"))
    // the intentional markup survives
    assert(tg.contains("<b>") && tg.contains("</b>"))
  }

  test("opsgenie/telegram/github payloads and factory wiring") {
    val og = opsGeniePayload(result(CheckpointStatus.Error), Seq("prod"))
    assert(og.contains("\"priority\":\"P1\"") &&
      og.contains("graft-orders-daily") && og.contains("\"prod\""))
    assert(opsGeniePayload(result(CheckpointStatus.Fail))
      .contains("\"priority\":\"P2\""))
    val tg = telegramPayload(result(CheckpointStatus.Fail), "-100123")
    assert(tg.contains("\"chat_id\":\"-100123\"") &&
      tg.contains("parse_mode") && tg.contains("1/3 checks failed"))
    val gh = githubCheckRunPayload(result(CheckpointStatus.Pass, 0), "abc123")
    assert(gh.contains("\"conclusion\":\"success\"") &&
      gh.contains("\"head_sha\":\"abc123\""))
    // factory wiring: URL construction + auth headers + condition
    val rec = new Recording()
    telegram("tok", "-1", transport = rec).run(result(CheckpointStatus.Fail))
    assert(rec.sent.head.url == "https://api.telegram.org/bottok/sendMessage")
    val rec2 = new Recording()
    opsGenie("key", transport = rec2).run(result(CheckpointStatus.Pass, 0))
    assert(rec2.sent.isEmpty) // OnFailure default skips a pass
    opsGenie("key", transport = rec2).run(result(CheckpointStatus.Fail))
    assert(rec2.sent.head.headers("Authorization") == "GenieKey key")
    val rec3 = new Recording()
    githubCheckRun("org/repo", "sha1", "t0", transport = rec3)
      .run(result(CheckpointStatus.Fail))
    assert(rec3.sent.head.url ==
      "https://api.github.com/repos/org/repo/check-runs")
    assert(rec3.sent.head.headers("Accept") == "application/vnd.github+json")
  }

  test("email message is a well-formed RFC-5322 text") {
    val m = emailMessage(result(CheckpointStatus.Fail), "dq@x.io",
      Seq("a@x.io", "b@x.io"))
    assert(m.startsWith("From: dq@x.io\nTo: a@x.io, b@x.io\nSubject: "))
    assert(m.contains("[graft] orders-daily FAIL"))
    assert(m.contains("Checks: 3 (1 failed)"))
  }

  test("actions integrate with checkpoint routing") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rec = new Recording()
    val cp = Checkpoint("nulls",
      () => Seq((1, null.asInstanceOf[String]), (2, "b")).toDF("id", "v"),
      Seq(graft.validators.NullCheck(Seq("v"))),
      actions = Seq(ActionRule(
        webhook("https://example.invalid/h", transport = rec))))
    val r = cp.run()
    assert(r.status == CheckpointStatus.Fail)
    assert(rec.sent.size == 1 && rec.sent.head.body.contains("\"FAIL\""))
  }
}
