package graft.util

import scala.annotation.tailrec
import scala.concurrent.duration._

/** Raised for failures that must NOT be retried (reference
  * `/root/reference/spark/utils/retry.py:18-22`).
  */
class NonRetryableError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** Retry with exponential backoff, mirroring the reference decorator
  * (`/root/reference/spark/utils/retry.py:25-77`): `maxRetries` additional
  * attempts, delay = initialDelay·factor^attempt capped at maxDelay, a
  * retryable-exception filter, and an on-retry callback.
  */
final case class RetryPolicy(
    maxRetries: Int = 3,
    initialDelay: FiniteDuration = 1.second,
    backoffFactor: Double = 2.0,
    maxDelay: FiniteDuration = 30.seconds,
    retryOn: Throwable => Boolean = {
      case _: NonRetryableError => false
      case _ => true
    },
    onRetry: (Int, Throwable, FiniteDuration) => Unit = (_, _, _) => (),
    sleep: FiniteDuration => Unit = d => Thread.sleep(d.toMillis)) {

  def delayFor(attempt: Int): FiniteDuration = {
    val d = initialDelay * math.pow(backoffFactor, attempt.toDouble)
    val capped = d.min(maxDelay)
    capped match {
      case f: FiniteDuration => f
      case _ => maxDelay
    }
  }

  /** Run `body`, retrying up to maxRetries times. The final failure (or any
    * non-retryable one) propagates.
    */
  def apply[T](body: => T): T = {
    @tailrec def loop(attempt: Int): T = {
      val result =
        try Right(body)
        catch { case e: Throwable => Left(e) }
      result match {
        case Right(v) => v
        case Left(e) if attempt >= maxRetries || !retryOn(e) => throw e
        case Left(e) =>
          val d = delayFor(attempt)
          onRetry(attempt + 1, e, d)
          sleep(d)
          loop(attempt + 1)
      }
    }
    loop(0)
  }
}

object Retry {
  /** Reference presets (`spark/utils/retry.py:237-293`). */
  val database: RetryPolicy = RetryPolicy(maxRetries = 5, initialDelay = 2.seconds)
  val network: RetryPolicy = RetryPolicy(maxRetries = 3, initialDelay = 1.second)
  val file: RetryPolicy = RetryPolicy(maxRetries = 2, initialDelay = 500.millis)
}
