package graft.engine

import java.util.concurrent.{Callable, ExecutionException, Executors, TimeUnit,
  TimeoutException}

import org.apache.spark.sql.SparkSession

/** Per-query hang protection for the driver harness mains (Verify/Bench).
  *
  * An exception in one query is already guarded there; a HANG is not — one
  * pathological plan would stall the whole correctness dump or bench run
  * until the round's stall detector fires (the round-7 lesson generalized:
  * a harness must never let one query take down the artifact). The body
  * runs on a watchdog thread inside its own Spark job group with
  * `interruptOnCancel`; on timeout the group's jobs are cancelled so
  * executors stop burning, and the caller records a failure and moves on.
  *
  * The job group MUST be set inside the watchdog thread — it is
  * thread-local to the job-submitting thread, so setting it on the caller
  * would tag nothing.
  */
object Watchdog {

  /** Run `body`, returning Left(reason) on timeout (jobs cancelled) —
    * exceptions from `body` propagate unchanged for the caller's existing
    * error handling.
    *
    * @param graceSec how long a timed-out worker gets to honor the
    *                 interrupt before being reported as leaked (the report
    *                 is advisory — a daemon thread stuck in
    *                 non-interruptible code cannot be killed, only named).
    */
  def run[T](spark: SparkSession, name: String, timeoutSec: Long,
             graceSec: Long = 10)(body: => T): Either[String, T] = {
    val group = s"graft-watchdog-$name"
    val ex = Executors.newSingleThreadExecutor(r => {
      val t = new Thread(r, s"watchdog-$name"); t.setDaemon(true); t
    })
    val fut = ex.submit(new Callable[T] {
      def call(): T = {
        spark.sparkContext.setJobGroup(group, name, interruptOnCancel = true)
        try body finally spark.sparkContext.clearJobGroup()
      }
    })
    try Right(fut.get(timeoutSec, TimeUnit.SECONDS))
    catch {
      case _: TimeoutException =>
        spark.sparkContext.cancelJobGroup(group)
        fut.cancel(true)
        ex.shutdownNow()
        // a body stuck in non-interruptible driver-side code ignores the
        // interrupt: the daemon thread then outlives the call and can pin
        // session state while later queries run — make the leak VISIBLE in
        // the round log instead of silent (grace period, then report)
        val died =
          try ex.awaitTermination(graceSec, TimeUnit.SECONDS)
          catch { case _: InterruptedException =>
            Thread.currentThread().interrupt(); false }
        if (!died)
          System.err.println(
            s"[graft] watchdog-$name worker ignored interrupt within " +
              s"${graceSec}s grace; daemon thread leaked")
        Left(s"timed out after ${timeoutSec}s (job group cancelled" +
          (if (died) ")" else "; worker thread leaked)"))
      case e: ExecutionException => throw e.getCause
    } finally ex.shutdownNow()
  }
}
