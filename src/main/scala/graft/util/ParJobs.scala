package graft.util

/** Submit independent Spark actions as CONCURRENT jobs from one driver
  * thread. At micro-batch cadence the per-job fixed cost (DAG schedule +
  * task launch + the parquet commit protocol over a handful of rows)
  * dominates tiny writes, so N sequential appends pay that latency N
  * times; SparkContext job submission is thread-safe, and a local[32]
  * scheduler runs these few-task jobs side by side. Used by the
  * streaming loops for their per-batch index write-backs and routing
  * appends — ONLY for actions with no ordering constraint between them
  * (the loops still await the whole index group before any routing
  * append starts, preserving the write-back-first replay discipline).
  *
  * Failure: the first thrown exception propagates to the caller (the
  * micro-batch fails and replays); concurrently-started siblings finish
  * in the background, which is safe because every write here is already
  * replay-idempotent by the loops' contract.
  */
object ParJobs {
  def run(tasks: (() => Unit)*): Unit =
    if (tasks.sizeIs <= 1) tasks.foreach(_.apply())
    else {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.ExecutionContext.Implicits.global
      import scala.concurrent.duration.Duration
      Await.result(
        Future.sequence(tasks.map(t => Future(t())).toVector),
        Duration.Inf)
      ()
    }
}
