package graft.operators

import scala.annotation.tailrec

/** Bounded retry with fixed delay (ref `safe_open_document`
  * `Batch Processor.py:376-385` — 5×4 s — and
  * `send_command_with_retry` `:387-397` — 3×2 s).
  *
  * Engine-level utility, not a query operator: Spark task retry
  * (`spark.task.maxFailures`) covers task-grain failures; this covers
  * record-grain calls to flaky external services inside a stage.
  */
object Retry {

  final case class RetriesExhausted(attempts: Int, last: Throwable)
    extends RuntimeException(
      s"failed after $attempts attempts: ${last.getMessage}", last)

  /** Run `f`, retrying up to `retries` times total, sleeping `delayMs`
    * between attempts; `onRetry` observes each failure (the reference
    * emits an orange status per retry, `:382-383`).
    */
  def apply[A](
      retries: Int,
      delayMs: Long = 0L,
      onRetry: (Int, Throwable) => Unit = (_, _) => ())(f: => A): A = {
    require(retries >= 1, "retries must be >= 1")

    @tailrec
    def loop(attempt: Int): A = {
      // NonFatal only: an OutOfMemoryError or a task-cancellation
      // interrupt must propagate immediately, not burn retry budget.
      val res = try Right(f)
        catch { case scala.util.control.NonFatal(e) => Left(e) }
      res match {
        case Right(a) => a
        case Left(e) if attempt < retries =>
          onRetry(attempt, e)
          if (delayMs > 0) Thread.sleep(delayMs)
          loop(attempt + 1)
        case Left(e) => throw RetriesExhausted(retries, e)
      }
    }
    loop(1)
  }
}
