package graft.streaming

/** Bounded fixed-delay retry with retriable/non-retriable classification —
  * the Spark-side form of the reference's two retry policies (per-event
  * dispatch retry `EcommerceCDCEventDispatcherService.kt:38-66` and the
  * exception classification `exceptions/CdcException.kt:3-7`). In the
  * engine this wraps `foreachBatch` bodies (sink I/O): Spark's own task
  * retries (`spark.task.maxFailures`) and query-restart-from-checkpoint
  * (O16) cover everything below the sink.
  */
object Resilience {

  /** Marker for errors worth retrying (transient I/O, races). Mirrors the
    * reference's `CdcException.retriableError` flag. */
  class RetriableException(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  def isRetriable(t: Throwable): Boolean = t.isInstanceOf[RetriableException]

  /** Run `body`, retrying up to `maxAttempts` total attempts with a fixed
    * `delayMs` between them, but ONLY for retriable errors; non-retriable
    * errors and exhaustion propagate. */
  def withRetries[T](maxAttempts: Int, delayMs: Long)(body: => T): T = {
    var attempt = 1
    while (true) {
      try return body
      catch {
        case t: Throwable if isRetriable(t) && attempt < maxAttempts =>
          attempt += 1
          Thread.sleep(delayMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Wrap a foreachBatch body in the retry policy. */
  def retryingBatch[T](maxAttempts: Int, delayMs: Long)(
      fn: (T, Long) => Unit): (T, Long) => Unit =
    (batch, id) => withRetries(maxAttempts, delayMs)(fn(batch, id))
}
