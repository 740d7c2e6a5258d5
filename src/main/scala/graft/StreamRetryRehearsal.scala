package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** Failure-injection rehearsal for the STREAMING standing-store processors
  * (a `main`, spawned by `RetryRehearsalSpec`'s streaming test): drive the
  * same deterministic micro-batch sequence as [[StreamSpillRehearsal]]
  * through the five foreachBatch bodies while first task attempts are
  * KILLED and FAILED ([[RetryRehearsal]]'s two injectors), and prove the
  * final standing-store state is bit-identical to the unfaulted run.
  *
  * This is the missing quadrant of the rehearsal matrix: [[RetryRehearsal]]
  * retries BATCH queries and gold builds; [[StreamSpillRehearsal]] starves
  * the streaming merge paths of MEMORY; the StandingStore specs replay
  * whole BATCHES. None of them had ever retried an individual TASK inside
  * a foreachBatch body — the store append's committer isolation, the probe
  * join's re-read, and the driver union-find's input stability under
  * partial re-execution were contractual until this ran. Driver-side
  * checkpoint IO has no TaskContext and is never faulted; every task-side
  * store read/append is.
  */
object StreamRetryRehearsal {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4, 4]") // the ", 4" is task maxFailures in local mode
      .appName("graft-stream-retry-rehearsal")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.fs.file.impl", classOf[RetryFaultFs].getName)
      .config("spark.hadoop.fs.file.impl.disable.cache", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    val killed = new AtomicLong(0L)
    val retriedOk = new AtomicLong(0L)
    sc.addSparkListener(
      RetryRehearsal.killFirstAttemptListener(sc, killed, retriedOk))

    try {
      RetryRehearsal.armed.set(true)
      val results =
        try StreamSpillRehearsal.runAll(spark)
        finally RetryRehearsal.armed.set(false)
      org.apache.spark.sql.graftbridge.bridge.waitListenerBusEmpty(sc)
      results.foreach { case (op, n, d) =>
        // scalastyle:off println — the stdout line IS the contract
        println(s"""STREAMRETRYJSON {"op":"$op","store_rows":$n,"digest":"$d"}""")
      }
      println(s"""STREAMRETRYJSON {"total_fs_faults":${RetryRehearsal.fsFaults.get()},""" +
        s""""total_killed":${killed.get()},"total_retried_ok":${retriedOk.get()}}""")
    } finally spark.stop()
  }
}
