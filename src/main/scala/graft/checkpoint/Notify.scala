package graft.checkpoint

import graft.core.ValidationRunResult

/** Notification actions (reference: truthound `checkpoint/actions/` —
  * slack_notify.py, teams_notify.py, discord_notify.py, pagerduty.py,
  * webhook.py, email_notify.py). The reference's actions are thin HTTP
  * clients around service-specific payload shapes; the engineering
  * substance is the payload construction, condition gating, auth and
  * outcome classification, so those are real here, while the wire layer
  * is a pluggable [[Transport]] (JDK HttpClient by default, a recording
  * fake in tests, and anything else — queue, file, retry wrapper — by
  * injection). Zero new dependencies.
  */
object Notify {

  /** When to fire (reference NotifyCondition). */
  sealed trait Condition { def matches(s: CheckpointStatus): Boolean }
  object Condition {
    case object Always extends Condition {
      def matches(s: CheckpointStatus) = true
    }
    case object OnFailure extends Condition {
      def matches(s: CheckpointStatus) = s != CheckpointStatus.Pass
    }
    case object OnSuccess extends Condition {
      def matches(s: CheckpointStatus) = s == CheckpointStatus.Pass
    }
    case object OnError extends Condition {
      def matches(s: CheckpointStatus) = s == CheckpointStatus.Error
    }
  }

  final case class Request(url: String, method: String = "POST",
      headers: Map[String, String] = Map.empty, body: String = "")
  final case class Response(status: Int, body: String = "")

  /** Wire layer. Implementations must not throw for HTTP-level failures
    * (return the status); transport/IO failures may throw — the action
    * converts them to an error [[Outcome]]. */
  trait Transport { def send(req: Request): Response }

  /** JDK HttpClient transport — the real thing, no extra deps. */
  final class HttpTransport(timeoutMs: Long = 10000) extends Transport {
    def send(req: Request): Response = {
      import java.net.http.{HttpClient, HttpRequest, HttpResponse}
      val b = HttpRequest.newBuilder(java.net.URI.create(req.url))
        .timeout(java.time.Duration.ofMillis(timeoutMs))
        .method(req.method,
          HttpRequest.BodyPublishers.ofString(req.body))
      req.headers.foreach { case (k, v) => b.header(k, v) }
      val client = HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofMillis(timeoutMs)).build()
      val resp = client.send(b.build(), HttpResponse.BodyHandlers.ofString())
      Response(resp.statusCode(), resp.body())
    }
  }

  /** Outcome of one notification attempt (reference ActionResult). */
  final case class Outcome(action: String, status: String, message: String)

  // ---- payload builders (service shapes per the public API docs the
  // reference targets) -------------------------------------------------

  private[checkpoint] def jstr(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
    case '\r' => "\\r"; case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
  } + "\""

  private def statusWord(s: CheckpointStatus): String = s match {
    case CheckpointStatus.Pass => "PASS"
    case CheckpointStatus.Fail => "FAIL"
    case CheckpointStatus.Error => "ERROR"
  }

  private def stats(r: CheckpointResult): (Long, Long, Long) =
    r.result.map { v: ValidationRunResult =>
      (v.checks.size.toLong, v.checks.count(!_.passed).toLong,
        v.issues.map(_.count).sum)
    }.getOrElse((0L, 0L, 0L))

  /** Slack chat.postMessage / incoming-webhook payload: header block +
    * fields section (reference slack_notify._build_payload). */
  def slackPayload(r: CheckpointResult, channel: Option[String] = None,
      mentionOnFailure: Seq[String] = Nil): String = {
    val (checks, failed, violations) = stats(r)
    val emoji = r.status match {
      case CheckpointStatus.Pass => ":white_check_mark:"
      case CheckpointStatus.Fail => ":x:"
      case CheckpointStatus.Error => ":warning:"
    }
    val mention =
      if (r.status != CheckpointStatus.Pass && mentionOnFailure.nonEmpty)
        mentionOnFailure.map(u => s"<@$u>").mkString(" ") + " "
      else ""
    val text = s"$mention$emoji *${r.name}* ${statusWord(r.status)} — " +
      s"$failed/$checks checks failed, $violations violation(s), " +
      s"${r.elapsedMillis} ms" +
      r.error.map(e => s"\nerror: $e").getOrElse("")
    val ch = channel.map(c => s""","channel":${jstr(c)}""").getOrElse("")
    s"""{"text":${jstr(text)},"blocks":[{"type":"section",""" +
      s""""text":{"type":"mrkdwn","text":${jstr(text)}}}]$ch}"""
  }

  /** MS Teams MessageCard payload (reference teams_notify). */
  def teamsPayload(r: CheckpointResult): String = {
    val (checks, failed, violations) = stats(r)
    val color = r.status match {
      case CheckpointStatus.Pass => "2EB886"
      case CheckpointStatus.Fail => "A30200"
      case CheckpointStatus.Error => "DAA038"
    }
    val facts = Seq(
      "Status" -> statusWord(r.status), "Checks" -> checks.toString,
      "Failed" -> failed.toString, "Violations" -> violations.toString,
      "Elapsed" -> s"${r.elapsedMillis} ms") ++
      r.error.map("Error" -> _)
    val factJson = facts.map { case (n, v) =>
      s"""{"name":${jstr(n)},"value":${jstr(v)}}""" }.mkString(",")
    s"""{"@type":"MessageCard","@context":"http://schema.org/extensions",""" +
      s""""themeColor":"$color","summary":${jstr(s"${r.name} ${statusWord(r.status)}")},""" +
      s""""sections":[{"activityTitle":${jstr(r.name)},"facts":[$factJson]}]}"""
  }

  /** Discord webhook embed payload (reference discord_notify). */
  def discordPayload(r: CheckpointResult): String = {
    val (checks, failed, violations) = stats(r)
    val color = r.status match {
      case CheckpointStatus.Pass => 0x2EB886
      case CheckpointStatus.Fail => 0xA30200
      case CheckpointStatus.Error => 0xDAA038
    }
    s"""{"embeds":[{"title":${jstr(s"${r.name}: ${statusWord(r.status)}")},""" +
      s""""color":$color,"description":${jstr(
        s"$failed/$checks checks failed, $violations violation(s)")}}]}"""
  }

  /** PagerDuty Events API v2 payload — trigger on FAIL/ERROR, resolve on
    * PASS (reference pagerduty.py event lifecycle). */
  def pagerDutyPayload(r: CheckpointResult, routingKey: String): String = {
    val action =
      if (r.status == CheckpointStatus.Pass) "resolve" else "trigger"
    val sev =
      if (r.status == CheckpointStatus.Error) "critical" else "error"
    val (_, failed, violations) = stats(r)
    s"""{"routing_key":${jstr(routingKey)},"event_action":"$action",""" +
      s""""dedup_key":${jstr(s"graft-${r.name}")},"payload":{""" +
      s""""summary":${jstr(s"${r.name} ${statusWord(r.status)}: " +
        s"$failed failed checks, $violations violations")},""" +
      s""""source":"graft","severity":"$sev"}}"""
  }

  /** Generic webhook payload: either a caller template with `{name}`,
    * `{status}`, `{checks}`, `{failed}`, `{violations}`, `{elapsed_ms}`,
    * `{error}` placeholders (reference payload_template), or the default
    * full-result JSON. */
  def webhookPayload(r: CheckpointResult,
      template: Option[String] = None): String = {
    val (checks, failed, violations) = stats(r)
    template match {
      case Some(t) => t
        .replace("{name}", r.name)
        .replace("{status}", statusWord(r.status))
        .replace("{checks}", checks.toString)
        .replace("{failed}", failed.toString)
        .replace("{violations}", violations.toString)
        .replace("{elapsed_ms}", r.elapsedMillis.toString)
        .replace("{error}", r.error.getOrElse(""))
      case None =>
        s"""{"checkpoint":${jstr(r.name)},"status":${jstr(statusWord(r.status))},""" +
          s""""checks":$checks,"failed":$failed,"violations":$violations,""" +
          s""""elapsed_ms":${r.elapsedMillis},"error":${
            r.error.map(jstr).getOrElse("null")}}"""
    }
  }

  /** OpsGenie Alerts API v2 payload (reference opsgenie.py
    * AlertPayloadBuilder + auto-priority: Error→P1, Fail→P2, Pass→P5). */
  def opsGeniePayload(r: CheckpointResult, tags: Seq[String] = Nil): String = {
    val (checks, failed, violations) = stats(r)
    val prio = r.status match {
      case CheckpointStatus.Error => "P1"
      case CheckpointStatus.Fail => "P2"
      case CheckpointStatus.Pass => "P5"
    }
    val tagJson = tags.map(jstr).mkString("[", ",", "]")
    s"""{"message":${jstr(s"${r.name}: ${statusWord(r.status)}")},""" +
      s""""alias":${jstr(s"graft-${r.name}")},"priority":"$prio",""" +
      s""""source":"graft","tags":$tagJson,"details":{""" +
      s""""checks":"$checks","failed":"$failed",""" +
      s""""violations":"$violations","elapsed_ms":"${r.elapsedMillis}"}}"""
  }

  /** Telegram sendMessage payload (reference telegram_notify.py —
    * HTML parse mode; the bot token lives in the URL). Interpolated
    * name/error are HTML-escaped: parse_mode=HTML makes Telegram reject
    * the whole message with 400 on a stray `<`/`>`/`&` (routine in
    * exception text — generics, XML snippets), silently losing the
    * notification. */
  def telegramPayload(r: CheckpointResult, chatId: String): String = {
    def esc(s: String): String = s.replace("&", "&amp;")
      .replace("<", "&lt;").replace(">", "&gt;")
    val (checks, failed, violations) = stats(r)
    val text = s"<b>${esc(r.name)}</b>: ${statusWord(r.status)}\n" +
      s"$failed/$checks checks failed, $violations violation(s)" +
      r.error.map(e => s"\nerror: ${esc(e)}").getOrElse("")
    s"""{"chat_id":${jstr(chatId)},"text":${jstr(text)},""" +
      s""""parse_mode":"HTML"}"""
  }

  /** GitHub check-run payload (reference github_action.py:256 — a
    * completed check run with pass/fail conclusion on a commit). */
  def githubCheckRunPayload(r: CheckpointResult, headSha: String): String = {
    val (checks, failed, violations) = stats(r)
    val conclusion =
      if (r.status == CheckpointStatus.Pass) "success" else "failure"
    s"""{"name":${jstr(s"graft: ${r.name}")},"head_sha":${jstr(headSha)},""" +
      s""""status":"completed","conclusion":"$conclusion","output":{""" +
      s""""title":${jstr(s"Data Quality - ${statusWord(r.status)}")},""" +
      s""""summary":${jstr(s"$failed/$checks checks failed, " +
        s"$violations violation(s), ${r.elapsedMillis} ms")}}}"""
  }

  /** RFC 5322 message text (reference email_notify builds MIME and hands
    * it to SMTP; the SMTP hop is a Transport concern). */
  def emailMessage(r: CheckpointResult, from: String, to: Seq[String],
      subjectPrefix: String = "[graft]"): String = {
    val (checks, failed, violations) = stats(r)
    s"""From: $from
       |To: ${to.mkString(", ")}
       |Subject: $subjectPrefix ${r.name} ${statusWord(r.status)}
       |Content-Type: text/plain; charset=utf-8
       |
       |Checkpoint: ${r.name}
       |Status: ${statusWord(r.status)}
       |Checks: $checks ($failed failed)
       |Violations: $violations
       |Elapsed: ${r.elapsedMillis} ms${r.error.map(e => s"\nError: $e").getOrElse("")}
       |""".stripMargin
  }

  // ---- the action ----------------------------------------------------

  /** One notification binding: payload builder + endpoint + auth +
    * condition, delivered over an injected transport. Service-specific
    * factories below pre-wire the payload shape. */
  final case class NotifyAction(
      name: String,
      url: String,
      payload: CheckpointResult => String,
      method: String = "POST",
      headers: Map[String, String] = Map.empty,
      auth: Option[(String, String)] = None, // header name -> value
      notifyOn: Condition = Condition.Always,
      successCodes: Set[Int] = Set(200, 201, 202, 204),
      transport: Transport = new HttpTransport()) extends CheckpointAction {

    @volatile private var last: Option[Outcome] = None
    /** Outcome of the most recent run (actions never throw past the
      * checkpoint, so this is the observable result). */
    def lastOutcome: Option[Outcome] = last

    def run(result: CheckpointResult): Unit = {
      val out =
        if (!notifyOn.matches(result.status))
          Outcome(name, "skipped", s"condition $notifyOn not met")
        else if (url.isEmpty) Outcome(name, "error", "no URL configured")
        else try {
          val hdrs = Map("Content-Type" -> "application/json") ++
            headers ++ auth.toMap
          val resp = transport.send(Request(url, method, hdrs,
            payload(result)))
          if (successCodes(resp.status))
            Outcome(name, "success", s"HTTP ${resp.status}")
          else Outcome(name, "failure",
            s"HTTP ${resp.status}: ${resp.body.take(200)}")
        } catch {
          case e: Exception => Outcome(name, "error", String.valueOf(e))
        }
      last = Some(out)
      if (out.status == "failure" || out.status == "error")
        System.err.println(s"[graft] notify $name: ${out.status} ${out.message}")
    }
  }

  def slack(webhookUrl: String, channel: Option[String] = None,
      mentionOnFailure: Seq[String] = Nil,
      notifyOn: Condition = Condition.Always,
      transport: Transport = new HttpTransport()): NotifyAction =
    NotifyAction("slack", webhookUrl,
      slackPayload(_, channel, mentionOnFailure), notifyOn = notifyOn,
      transport = transport)

  def teams(webhookUrl: String, notifyOn: Condition = Condition.Always,
      transport: Transport = new HttpTransport()): NotifyAction =
    NotifyAction("teams", webhookUrl, teamsPayload(_), notifyOn = notifyOn,
      transport = transport)

  def discord(webhookUrl: String, notifyOn: Condition = Condition.Always,
      transport: Transport = new HttpTransport()): NotifyAction =
    NotifyAction("discord", webhookUrl, discordPayload(_),
      notifyOn = notifyOn, transport = transport)

  def pagerDuty(routingKey: String,
      url: String = "https://events.pagerduty.com/v2/enqueue",
      transport: Transport = new HttpTransport()): NotifyAction =
    NotifyAction("pagerduty", url, pagerDutyPayload(_, routingKey),
      transport = transport) // PD gets both triggers and resolves

  def opsGenie(apiKey: String, tags: Seq[String] = Nil,
      url: String = "https://api.opsgenie.com/v2/alerts",
      notifyOn: Condition = Condition.OnFailure,
      transport: Transport = new HttpTransport()): NotifyAction =
    NotifyAction("opsgenie", url, opsGeniePayload(_, tags),
      auth = Some("Authorization" -> s"GenieKey $apiKey"),
      notifyOn = notifyOn, transport = transport)

  def telegram(botToken: String, chatId: String,
      notifyOn: Condition = Condition.Always,
      transport: Transport = new HttpTransport()): NotifyAction =
    NotifyAction("telegram",
      s"https://api.telegram.org/bot$botToken/sendMessage",
      telegramPayload(_, chatId), notifyOn = notifyOn,
      transport = transport)

  def githubCheckRun(repository: String, headSha: String, token: String,
      notifyOn: Condition = Condition.Always,
      transport: Transport = new HttpTransport()): NotifyAction =
    NotifyAction("github-check-run",
      s"https://api.github.com/repos/$repository/check-runs",
      githubCheckRunPayload(_, headSha),
      headers = Map("Accept" -> "application/vnd.github+json"),
      auth = Some("Authorization" -> s"Bearer $token"),
      notifyOn = notifyOn, transport = transport)

  def webhook(url: String, method: String = "POST",
      headers: Map[String, String] = Map.empty,
      bearerToken: Option[String] = None,
      template: Option[String] = None,
      notifyOn: Condition = Condition.Always,
      transport: Transport = new HttpTransport()): NotifyAction =
    NotifyAction("webhook", url, webhookPayload(_, template), method,
      headers, bearerToken.map(t => "Authorization" -> s"Bearer $t"),
      notifyOn, transport = transport)
}
