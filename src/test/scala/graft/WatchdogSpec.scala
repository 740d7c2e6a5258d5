package graft

import org.apache.spark.sql.functions._

import graft.engine.Watchdog

/** [[graft.engine.Watchdog]] — the harness hang guard. */
class WatchdogSpec extends SparkSpec {
  import spark.implicits._

  test("a healthy body returns Right with its value") {
    val got = Watchdog.run(spark, "ok", timeoutSec = 60) {
      Seq(1, 2, 3).toDF("x").count()
    }
    assert(got === Right(3L))
  }

  test("exceptions propagate unchanged (caller's error handling owns them)") {
    val e = intercept[IllegalStateException] {
      Watchdog.run(spark, "boom", timeoutSec = 60) {
        throw new IllegalStateException("query bug")
      }
    }
    assert(e.getMessage === "query bug")
  }

  test("a hanging Spark job is cancelled and reported within the timeout") {
    val sleeper = udf((x: Int) => { Thread.sleep(120000); x })
    val t0 = System.nanoTime()
    val got = Watchdog.run(spark, "hang", timeoutSec = 3) {
      // aggregate over the udf output so column pruning can't skip the sleep
      spark.range(8).select(sleeper(col("id").cast("int")).as("s"))
        .agg(sum(col("s"))).collect()
    }
    val waited = (System.nanoTime() - t0) / 1e9
    assert(got.isLeft, "a stuck job must report a timeout, not block")
    assert(got.swap.exists(_.contains("timed out")))
    assert(waited < 30, s"cancellation took ${waited}s — group cancel not working")
    // the session must remain usable for the next query after a cancel
    assert(spark.range(5).count() === 5L)
  }

  test("a worker that ignores the interrupt is reported as leaked, and one that honors it is not") {
    // ignores: swallow the interrupt once and keep sleeping past the grace
    // window (the thread dies naturally a few seconds later — bounded, no
    // busy loop left running under the rest of the suite)
    val leaked = Watchdog.run(spark, "stubborn", timeoutSec = 1, graceSec = 1) {
      try Thread.sleep(60000)
      catch { case _: InterruptedException => try Thread.sleep(4000) catch {
        case _: InterruptedException => () } }
      "done"
    }
    assert(leaked.swap.exists(_.contains("worker thread leaked")),
      s"an interrupt-ignoring body must be reported: $leaked")
    // honors: a plain sleep dies on the first interrupt within the grace
    val clean = Watchdog.run(spark, "polite", timeoutSec = 1, graceSec = 5) {
      Thread.sleep(60000); "done"
    }
    assert(clean.isLeft && !clean.swap.exists(_.contains("leaked")),
      s"an interruptible body must terminate inside the grace: $clean")
  }
}
