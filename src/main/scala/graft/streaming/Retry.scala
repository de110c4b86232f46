package graft.streaming

/** Retry-forever with permanent-error escape — the reference's E1
  * operator (common/retry.go:41-76, error classing common/error.go:17-37).
  *
  * Spark's task scheduler already retries task-level failures; this
  * helper is for SINK-level retries inside `foreachBatch`, where the
  * reference retried each batch send until success but aborted on
  * errors it classified permanent (schema mismatch, auth, bad config —
  * things a retry can never fix). Retrying those forever is the
  * classic poison-pill stall; failing fast surfaces them to the
  * streaming query as a batch failure → visible in Status.
  */
object Retry {

  /** Marker for errors a retry cannot fix (reference: common/error.go:69-73
    * permanent-error constructor). */
  final class PermanentException(msg: String, cause: Throwable = null)
      extends RuntimeException(msg, cause)

  def permanent(msg: String, cause: Throwable = null): PermanentException =
    new PermanentException(msg, cause)

  /** Run `op`, retrying on any non-permanent failure every `intervalMs`
    * (reference default 100 ms, mux/mux.go:59) up to `maxAttempts`
    * (None = retry forever, the reference default). Permanent errors
    * rethrow immediately. Returns the number of attempts used. */
  def retryForever[T](intervalMs: Long = 100L, maxAttempts: Option[Int] = None)
                     (op: => T): (T, Int) = {
    var attempt = 0
    while (true) {
      attempt += 1
      try return (op, attempt)
      catch {
        case p: PermanentException => throw p
        case e: Throwable if maxAttempts.exists(attempt >= _) => throw e
        case _: Throwable => Thread.sleep(intervalMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
