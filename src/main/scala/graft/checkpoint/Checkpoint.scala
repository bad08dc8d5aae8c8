package graft.checkpoint

import graft.core._
import graft.reporters.Reporters
import org.apache.spark.sql.DataFrame

/** Checkpoint orchestration (reference: truthound `checkpoint/checkpoint.py
  * :220-450` — binds data + suite + actions, wraps th.check into a
  * CheckpointResult with PASS/FAIL/ERROR status, routes to actions via an
  * optional rule-based router; triggers live outside the engine). */
sealed trait CheckpointStatus
object CheckpointStatus {
  case object Pass extends CheckpointStatus
  case object Fail extends CheckpointStatus
  case object Error extends CheckpointStatus
}

final case class CheckpointResult(
    name: String,
    status: CheckpointStatus,
    result: Option[ValidationRunResult],
    error: Option[String],
    elapsedMillis: Long,
    /** What fired this run — e.g. the drained event batch of an
      * EventTrigger ([[EventTrigger.context]]); empty for direct or
      * schedule-fired runs. Actions read it off the result. */
    context: Map[String, String] = Map.empty)

/** An action receives the result after a run (reference
  * `checkpoint/actions/` — Slack/webhook/email/etc are thin HTTP clients
  * outside the engine core; the engine ships console/file/custom). */
trait CheckpointAction {
  def name: String
  def run(result: CheckpointResult): Unit
}

final case class ConsoleAction() extends CheckpointAction {
  val name = "console"
  def run(result: CheckpointResult): Unit =
    result.result.foreach(r => println(Reporters.console(r)))
}

final case class PersistAction(workspace: String, runId: String)
    extends CheckpointAction {
  val name = "persist"
  def run(result: CheckpointResult): Unit =
    result.result.foreach(r => Reporters.persistRun(r, workspace, runId))
}

final case class CustomAction(name: String, fn: CheckpointResult => Unit)
    extends CheckpointAction {
  def run(result: CheckpointResult): Unit = fn(result)
}

/** Rule-based action routing (reference ActionRouter,
  * `checkpoint.py:329-348`): actions fire only when their predicate
  * matches the run status. */
final case class ActionRule(action: CheckpointAction,
    when: CheckpointStatus => Boolean = _ => true)

final case class Checkpoint(
    name: String,
    data: () => DataFrame,
    validators: Seq[Validator],
    actions: Seq[ActionRule] = Nil,
    failOn: Severity = Severity.Low) {

  /** Run the suite, classify, route actions. Exceptions become ERROR
    * status (never thrown past the checkpoint — reference semantics). */
  def run(): CheckpointResult = run(Map.empty[String, String])

  /** Run with a trigger context (e.g. the event batch that fired this
    * run) — carried on the result for actions and observability. */
  def run(context: Map[String, String]): CheckpointResult = {
    val t0 = System.nanoTime()
    val cr =
      try {
        val r = SuiteRunner.run(data(), validators,
          SuiteRunner.Config(datasetName = name))
        val failing = r.issues.exists(i => Severity.parse(i.severity) >= failOn)
        CheckpointResult(name,
          if (failing) CheckpointStatus.Fail else CheckpointStatus.Pass,
          Some(r), None, (System.nanoTime() - t0) / 1000000, context)
      } catch {
        case e: Exception =>
          CheckpointResult(name, CheckpointStatus.Error, None,
            Some(e.getMessage), (System.nanoTime() - t0) / 1000000, context)
      }
    actions.foreach { rule =>
      if (rule.when(cr.status))
        try rule.action.run(cr)
        catch { case _: Exception => () } // actions never fail the checkpoint
    }
    cr
  }
}
