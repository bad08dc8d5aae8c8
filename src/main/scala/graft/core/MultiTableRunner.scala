package graft.core

import org.apache.spark.sql.DataFrame
import graft.validators.{CrossTableValidator, CrossSuiteRunner}

/** Multi-table validation scheduling (reference: ScanPlanner PARALLEL mode
  * + ValidatorDAG thread-pool execution, truthound `core/planning.py:46-93`
  * and `core/runtime.py:66-90`).
  *
  * Parallelism here means CONCURRENT JOB SUBMISSION on the shared
  * SparkSession: each table's fused suite is already one (or two)
  * aggregation jobs, so submitting suites for independent tables
  * concurrently lets the scheduler interleave their stages across the
  * cluster (fair-scheduler pools recommended on busy clusters). Within a
  * table the fused single-pass kernel is strictly better than any
  * per-validator parallelism — the reference's SEQUENTIAL/PARALLEL split
  * collapses into "how many tables at once". */
object MultiTableRunner {

  final case class TableSuite(tableName: String, df: DataFrame,
      validators: Seq[Validator],
      config: SuiteRunner.Config = SuiteRunner.Config())

  final case class MultiResult(perTable: Map[String, ValidationRunResult],
      crossTable: Option[ValidationRunResult]) {
    def passed: Boolean =
      perTable.values.forall(_.passed) && crossTable.forall(_.passed)
    def allChecks: Seq[CheckResult] =
      perTable.values.flatMap(_.checks).toSeq ++
        crossTable.toSeq.flatMap(_.checks)
  }

  /** Run every table's suite (concurrently when `parallel`), then the
    * cross-table validators over the full table map. */
  def run(suites: Seq[TableSuite],
          crossValidators: Seq[CrossTableValidator] = Nil,
          parallel: Boolean = true): MultiResult = {
    val perTable: Map[String, ValidationRunResult] =
      if (parallel && suites.size > 1) {
        import scala.concurrent.{Await, Future, ExecutionContext}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = ExecutionContext.global
        val futs = suites.map(s => s.tableName -> Future {
          SuiteRunner.run(s.df, s.validators,
            s.config.copy(datasetName = s.tableName))
        })
        futs.map { case (n, f) => n -> Await.result(f, Duration.Inf) }.toMap
      } else
        suites.map(s => s.tableName ->
          SuiteRunner.run(s.df, s.validators,
            s.config.copy(datasetName = s.tableName))).toMap
    val cross =
      if (crossValidators.nonEmpty)
        Some(CrossSuiteRunner.run(
          suites.map(s => s.tableName -> s.df).toMap, crossValidators))
      else None
    MultiResult(perTable, cross)
  }
}
