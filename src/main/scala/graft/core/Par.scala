package graft.core

/** Shared concurrent-submit helper for independent Spark jobs: wall time
  * becomes the slowest job instead of the sum of scheduler round-trips.
  * One place to later bound the pool or propagate Spark local properties
  * (job groups/tags) to the worker threads. */
object Par {
  def map[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    import scala.concurrent.{Await, Future, ExecutionContext}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    val futs = xs.map(x => Future(f(x)))
    futs.map(Await.result(_, Duration.Inf))
  }
}
