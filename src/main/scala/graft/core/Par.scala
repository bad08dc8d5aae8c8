package graft.core

/** Shared concurrent-submit helper for independent Spark jobs: wall time
  * becomes the slowest job instead of the sum of scheduler round-trips.
  * One place to later bound the pool or propagate Spark local properties
  * (job groups/tags) to the worker threads.
  *
  * SAFETY (r15 postmortem — a GraftProps catch): do NOT submit jobs
  * whose plans SHARE a higher-order-function subtree (transform/filter/
  * zip_with/aggregate lambdas) over a LOCAL relation. Catalyst's
  * `NamedLambdaVariable` carries a mutable per-row value slot, and
  * `ConvertToLocalRelation` evaluates such projections driver-side
  * during each job's optimization — two threads optimizing plans that
  * share the same lambda instances stomp each other's bindings and
  * silently corrupt values (~1 in 3 runs in the repro; parquet-sourced
  * plans are immune because nothing evaluates driver-side). Safe
  * patterns: per-thread-built Column trees, lambda-free shared trees,
  * or shared trees rooted at checkpointed/scan relations. */
object Par {
  def map[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futs = xs.map(x => Future(f(x)))
    futs.map(Await.result(_, Duration.Inf))
  }
}
