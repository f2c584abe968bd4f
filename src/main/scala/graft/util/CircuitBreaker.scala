package graft.util

/** Circuit breaker mirroring the reference state machine
  * (`/root/reference/spark/utils/retry.py:95-234`):
  * CLOSED → OPEN after `failureThreshold` consecutive failures;
  * OPEN → HALF_OPEN after `resetTimeoutMs`; HALF_OPEN → CLOSED after
  * `halfOpenSuccesses` consecutive successes (any failure re-opens).
  * `clock` is injectable for deterministic tests.
  */
class CircuitBreakerOpenError(msg: String) extends RuntimeException(msg)

class CircuitBreaker(
    failureThreshold: Int = 5,
    resetTimeoutMs: Long = 60000,
    halfOpenSuccesses: Int = 3,
    clock: () => Long = () => System.currentTimeMillis()) {

  sealed trait State
  case object Closed extends State
  case object Open extends State
  case object HalfOpen extends State

  private var stateVar: State = Closed
  private var consecutiveFailures = 0
  private var halfOpenOk = 0
  private var openedAt = 0L
  private var totalCalls = 0L
  private var totalFailures = 0L
  private var totalRejections = 0L

  def state: State = synchronized {
    if (stateVar == Open && clock() - openedAt >= resetTimeoutMs) {
      stateVar = HalfOpen
      halfOpenOk = 0
    }
    stateVar
  }

  def apply[T](body: => T): T = {
    synchronized {
      state match {
        case Open =>
          totalRejections += 1
          throw new CircuitBreakerOpenError(
            s"circuit open; retry after ${resetTimeoutMs}ms")
        case _ => totalCalls += 1
      }
    }
    val result =
      try Right(body)
      catch { case e: Throwable => Left(e) }
    synchronized {
      result match {
        case Right(v) => onSuccess(); v
        case Left(e) => onFailure(); throw e
      }
    }
  }

  private def onSuccess(): Unit = stateVar match {
    case HalfOpen =>
      halfOpenOk += 1
      if (halfOpenOk >= halfOpenSuccesses) { stateVar = Closed; consecutiveFailures = 0 }
    case _ => consecutiveFailures = 0
  }

  private def onFailure(): Unit = {
    totalFailures += 1
    stateVar match {
      case HalfOpen =>
        stateVar = Open; openedAt = clock(); consecutiveFailures = failureThreshold
      case Closed =>
        consecutiveFailures += 1
        if (consecutiveFailures >= failureThreshold) { stateVar = Open; openedAt = clock() }
      case Open => ()
    }
  }

  def stats: Map[String, Long] = synchronized {
    Map(
      "total_calls" -> totalCalls,
      "total_failures" -> totalFailures,
      "total_rejections" -> totalRejections,
      "consecutive_failures" -> consecutiveFailures.toLong)
  }
}
