package graft

import java.util.concurrent.atomic.{AtomicBoolean, AtomicLong}

import org.apache.hadoop.fs.{FSDataOutputStream, Path => HPath}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable
import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** Failure-injection retry rehearsal (a `main`, spawned by
  * `RetryRehearsalSpec` like [[SpillRehearsal]]): ACTUALLY kill and fail
  * first task attempts across the gold builds and the whitelisted
  * retry-sensitive queries, and prove the results are bit-identical to an
  * unfaulted run. PlanSpec's retry-determinism gate is a static expression
  * walk — it proves no nondeterministic expression escapes the documented
  * protocol, but the protocol RATIONALES (mono-id after a range
  * repartition, FD-first, input_file_name) were arguments until this
  * rehearsal ran them under real retries.
  *
  * Two injectors, because task populations differ:
  *
  *   1. **Deterministic FS fault** ([[RetryFaultFs]], installed as the
  *      `file:` scheme impl): the FIRST attempt of every task that opens or
  *      creates a file through the Hadoop FS API throws once — every scan
  *      task (exercising the `input_file_name` claim: the retry re-reads
  *      the same split) and every gold-build WRITE task (exercising the
  *      committer's attempt isolation) retries, deterministically, no race.
  *      Driver-side IO (footer reads, listings) has no TaskContext and is
  *      untouched.
  *   2. **Kill-first-attempts listener**: `SparkContext.killTaskAttempt` on
  *      every `attemptNumber == 0` task start — best-effort (a sub-ms task
  *      can finish before the kill lands) but it reaches the SHUFFLE-READ
  *      stages the FS fault never sees, which is where the
  *      `monotonically_increasing_id`-after-range-sort stamping of the
  *      globalIndex protocol actually runs.
  *
  * Master is `local[4, 4]` — the `, 4` IS `spark.task.maxFailures` in local
  * mode (plain `local[4]` fails the job on the first ExceptionFailure, and
  * the conf key is ignored); injector 1 needs the headroom, injector 2's
  * TaskKilled does not count against it.
  *
  * Output contract (parsed by the spec): one
  * `RETRYJSON {"target":...,"rows":N,"digest":...,"fs_faults":n,"killed":n,"retried_ok":n}`
  * line per target (counts are per-target deltas), then a cumulative
  * `RETRYJSON {"total_fs_faults":..,"total_killed":..,"total_retried_ok":..}`.
  * Exit 0 = every target completed despite the faults.
  */
object RetryRehearsal {

  /** Armed for the whole target phase (including eager gold-build
    * materialization — see main), NOT during session setup/teardown, so a
    * fault can never be attributed to harness bootstrap IO.
    */
  val armed = new AtomicBoolean(false)
  val fsFaults = new AtomicLong(0L)
  /** create()-site faults only — the committer-isolation evidence: a WRITE
    * task failed mid-output and its retry still produced correct files.
    */
  val fsCreateFaults = new AtomicLong(0L)
  private val fired = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Throw once per (stage, partition, site) on the first attempt that
    * actually REACHES the file — not pinned to attempt 0, because the kill
    * listener usually kills attempt 0 before it opens anything (observed:
    * 1506 kills, 0 FS faults on the attempt-0-only version), and a faulted
    * task must still have retry headroom below local maxFailures (= 4
    * total attempts; one ExceptionFailure per task keeps 2 spare). Called
    * from [[RetryFaultFs]] inside executor threads; the attempt AFTER the
    * fault passes through untouched.
    */
  def maybeFault(where: String): Unit = {
    val tc = TaskContext.get()
    if (armed.get() && tc != null && tc.attemptNumber() <= 1 &&
        fired.add(s"${tc.stageId()}:${tc.partitionId()}:$where")) {
      fsFaults.incrementAndGet()
      if (where == "create") fsCreateFaults.incrementAndGet()
      throw new java.io.IOException(
        s"graft retry-rehearsal injected fault at $where " +
          s"(stage ${tc.stageId()} partition ${tc.partitionId()} attempt 0)")
    }
  }

  /** Gold builds + the queries whose retry story rests on a documented
    * protocol (PlanSpec's whitelist): the six globalIndex-protocol queries,
    * silver_clean (input_file_name), kmeans_assign (FD-first). Gold builds
    * run FIRST so the injected faults land inside the real builds (this JVM's
    * GoldCache is cold), not against already-materialized parquet.
    */
  val QueryTargets: Seq[String] = Seq(
    "gto_rank_curve", "curriculum_order", "shuffle_index", "global_index",
    "snm_pairs", "quality_ensemble", "silver_clean", "kmeans_assign")

  /** The kill injector, shared with [[StreamRetryRehearsal]]: kill every
    * `attemptNumber == 0` task start while [[armed]]; count TaskKilled ends
    * and attempt>0 successes. Best-effort per task (a sub-ms task can finish
    * before the kill lands) — the FS injector covers the scan/write
    * population deterministically.
    */
  def killFirstAttemptListener(sc: org.apache.spark.SparkContext,
                               killed: AtomicLong,
                               retriedOk: AtomicLong): SparkListener =
    new SparkListener {
      override def onTaskStart(t: SparkListenerTaskStart): Unit =
        if (armed.get() && t.taskInfo.attemptNumber == 0) {
          try {
            sc.killTaskAttempt(t.taskInfo.taskId, interruptThread = false,
              reason = "graft retry-rehearsal: kill every first attempt")
            ()
          } catch { case scala.util.control.NonFatal(_) => }
        }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        t.reason match {
          case _: org.apache.spark.TaskKilled => killed.incrementAndGet(); ()
          case org.apache.spark.Success if t.taskInfo.attemptNumber > 0 =>
            retriedOk.incrementAndGet(); ()
          case _ => ()
        }
      }
    }

  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val spark = SparkSession.builder()
      .master("local[4, 4]") // the ", 4" is task maxFailures in local mode
      .appName("graft-retry-rehearsal")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // install the fault-injecting file: scheme for driver AND executors
      // (local mode: one JVM, statics shared with this object)
      .config("spark.hadoop.fs.file.impl", classOf[RetryFaultFs].getName)
      // The FileSystem cache keys on (scheme, authority, ugi) — NOT the impl
      // class — so a plain LocalFileSystem created during context startup
      // would be served to every later getFileSystem(conf) call and the
      // injector would never see a single open. Disable the cache for
      // `file:` in this JVM so each call constructs from the conf's impl.
      .config("spark.hadoop.fs.file.impl.disable.cache", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sc = spark.sparkContext

    val killed = new AtomicLong(0L)
    val retriedOk = new AtomicLong(0L)
    sc.addSparkListener(killFirstAttemptListener(sc, killed, retriedOk))

    def run(name: String, df: => org.apache.spark.sql.DataFrame): Unit = {
      val (f0, k0, r0) = (fsFaults.get(), killed.get(), retriedOk.get())
      val rows = df.collect()
      org.apache.spark.sql.graftbridge.bridge.waitListenerBusEmpty(sc)
      // scalastyle:off println — the stdout line IS the contract
      println(s"""RETRYJSON {"target":"$name","rows":${rows.length},""" +
        s""""digest":"${SpillRehearsal.digest(rows)}",""" +
        s""""fs_faults":${fsFaults.get() - f0},"killed":${killed.get() - k0},""" +
        s""""retried_ok":${retriedOk.get() - r0}}""")
    }

    try {
      // Armed for the WHOLE target phase, including goldBuilds() map
      // CONSTRUCTION: the GoldCache-backed stages (hourly, pairs, ring,
      // pq codebooks) materialize EAGERLY when the map literal evaluates —
      // arming only inside run() (the first cut) let every real gold WRITE
      // complete unfaulted and made the committer-isolation claim vacuous.
      // Faults during construction attribute to the totals, not a
      // per-target line; gold_write_faults pins that they happened.
      armed.set(true)
      try {
        val preGold = fsCreateFaults.get()
        val golds = SparkEntry.goldBuilds(spark, sfDir)
        val goldWriteFaults = fsCreateFaults.get() - preGold
        golds.toSeq.sortBy(_._1).foreach {
          case (name, df) => run(s"gold:$name", df)
        }
        QueryTargets.foreach { q =>
          run(q, SparkEntry.queries(q)(spark, sfDir))
        }
        println(s"""RETRYJSON {"gold_write_faults":$goldWriteFaults,""" +
          s""""total_fs_faults":${fsFaults.get()},""" +
          s""""total_killed":${killed.get()},"total_retried_ok":${retriedOk.get()}}""")
      } finally armed.set(false)
    } finally spark.stop()
  }
}

/** The `file:` scheme with first-attempt faults — see
  * [[RetryRehearsal.maybeFault]]. Extends the stock checksummed
  * LocalFileSystem, so behavior off the fault path is byte-identical.
  */
class RetryFaultFs extends org.apache.hadoop.fs.LocalFileSystem {
  override def open(f: HPath, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    RetryRehearsal.maybeFault("open")
    super.open(f, bufferSize)
  }

  override def create(f: HPath, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream = {
    RetryRehearsal.maybeFault("create")
    super.create(f, permission, overwrite, bufferSize, replication, blockSize,
      progress)
  }
}
