package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure rehearsal (a `main`, like [[Verify]]/[[Bench]]): run the
  * suite's two biggest shuffle queries under a DELIBERATELY starved memory
  * manager and prove they complete by SPILLING, not OOMing, with
  * bit-identical results. The green-path suite runs local[32] with 128 GiB —
  * nothing there pins behavior when a shuffle actually exceeds executor
  * memory, which is the common case at 100 TB, where a partition's
  * aggregation state or join buffer routinely outgrows its task's share.
  *
  * Why a separate JVM (spawned by `SpillRehearsalSpec`): Spark fixes the
  * memory manager at SparkContext creation — `spark.testing.memory`,
  * `spark.memory.fraction`, and the force-spill thresholds are all read at
  * env startup, and the test suites share one parallel-suite session that
  * cannot be stopped mid-run. A subprocess also converts a genuine OOM into
  * a clean nonzero exit instead of a poisoned shared JVM.
  *
  * The knobs, and why each:
  *   - `spark.testing.memory` 64 MB + `spark.testing.reservedMemory` 8 MB +
  *     `spark.memory.fraction` 0.2 → ~11 MB of unified memory across 4
  *     task threads: real acquisition pressure, the same shape as a 100-TB
  *     partition against a 4 GB executor share.
  *   - `spark.shuffle.spill.numElementsForceSpillThreshold` 2000 → every
  *     sorter/aggregator holding >2000 rows spills DETERMINISTICALLY, so
  *     the rehearsal's "spilled_bytes > 0" assertion cannot rot into a
  *     vacuous pass if the corpus fixture shrinks.
  *   - window/sort-merge-join buffer spill thresholds 2000 → the
  *     row-buffering operators take their spill paths too.
  *   - broadcast joins OFF (both planner and AQE thresholds) → the shingle
  *     self-join runs as the sort-merge join it IS at 100 TB (no 11 MB
  *     budget broadcasts a 100-TB corpus's dimension sides), which also
  *     puts a SortExec with tens of thousands of rows per task in the
  *     plan — without this, sf0.01 is small enough that every join
  *     broadcasts, no sorter ever runs, and nothing can spill at all
  *     (observed: spilled_bytes == 0 on the first cut of this harness).
  *
  * Output contract (parsed by the spec): one `SPILLJSON {...}` line per
  * query with row count + order-independent SHA-256 row digest, then one
  * `SPILLJSON {"spilled_bytes":N}` total after the listener bus drains.
  * Exit 0 = all queries completed.
  */
object SpillRehearsal {

  /** The rehearsal matrix: one representative of every shape that behaves
    * DIFFERENTLY under memory pressure, not just the biggest two shuffles.
    *   - dedup_ngram / containment_pairs: shingle explode → hot-key filter →
    *     sort-merge self-join → pair agg (the suite's biggest shuffles;
    *     ExternalSorter + aggregation hash map spill paths).
    *   - pair_components: the iterative two-tier connected-components loop —
    *     per-round persists + lineage truncation under eviction pressure, a
    *     shape where a cached plan silently recomputed mid-iteration would
    *     change convergence accounting.
    *   - quality_ensemble: the window-heavy quality battery — WindowExec's
    *     row buffer spills through a different code path
    *     (windowExec.buffer.spill.threshold) than sort-merge joins.
    *   - l_diversity: the multi-distinct Expand — one input row fans out per
    *     distinct-aggregate, so the aggregation state under the Expand is
    *     the largest in the suite relative to input size.
    *   - kmv_distinct: the typed-Aggregator (UDAF) path —
    *     ObjectHashAggregateExec's sort-based FALLBACK (forced via a tiny
    *     fallbackThreshold below) serializes the aggregation buffers and
    *     re-merges them in sort order, a merge-order + serialization
    *     round-trip no other matrix member exercises; only a
    *     commutative-associative-idempotent merge survives it bit-identical.
    *   - pairs_daily: runs LAST deliberately — in this fresh JVM the
    *     GoldCache is cold, so the query drives the full co-movement gold
    *     build (hourly rollup → hex self-join → pair-day distinct agg →
    *     parquet write) under the starved manager, then reads it back.
    */
  val Queries: Seq[String] = Seq(
    "dedup_ngram", "containment_pairs", "pair_components",
    "quality_ensemble", "l_diversity", "kmv_distinct", "pairs_daily")

  /** Order-independent row digest: SHA-256 over the sorted canonical row
    * strings. Rows are deterministic by the oracle discipline (rounded
    * floats, exact aggregates), so equal results ⟺ equal digests.
    */
  def digest(rows: Array[org.apache.spark.sql.Row]): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    rows.map(_.toString).sorted.foreach { s =>
      md.update(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      md.update('\n'.toByte)
    }
    md.digest().map("%02x".format(_)).mkString
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir) = args
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-spill-rehearsal")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.testing.memory", (64L * 1024 * 1024).toString)
      .config("spark.testing.reservedMemory", (8L * 1024 * 1024).toString)
      .config("spark.memory.fraction", "0.2")
      // The iterative-loop queries persist MEMORY_AND_DISK frames; the
      // unified manager PROTECTS storageFraction of the pool from
      // execution eviction, and at ~11 MB the default 0.5 leaves 4 tasks
      // x multiple memory consumers less than one 64 KB page each —
      // UNABLE_TO_ACQUIRE_MEMORY instead of a spill (observed when
      // pair_components joined the matrix). 0.05 keeps persists honest
      // (blocks degrade to disk, the 100-TB behavior) while execution
      // keeps enough pages to always be ABLE to spill. Page size pinned
      // 64 KB for the same reason: the auto heuristic scales pages with
      // pool size, and consumer minimums are one page each.
      .config("spark.memory.storageFraction", "0.05")
      .config("spark.buffer.pageSize", "64k")
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "2000")
      // force ObjectHashAggregateExec (typed-Aggregator UDAFs, e.g.
      // kmv_distinct's KmvSketch) into its sort-based fallback: buffers are
      // serialized and re-merged in sort order — the default threshold of
      // 128 in-memory keys would never trip at test-scale group counts
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4")
      .config("spark.sql.windowExec.buffer.spill.threshold", "2000")
      .config("spark.sql.sortMergeJoinExec.buffer.spill.threshold", "2000")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spilled = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) spilled.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
      }
    })
    try {
      Queries.foreach { name =>
        val df = SparkEntry.queries(name)(spark, sfDir)
        val rows = df.collect()
        // scalastyle:off println — the stdout line IS the contract
        println(s"""SPILLJSON {"query":"$name","rows":${rows.length},"digest":"${digest(rows)}"}""")
        // evidence that the UDAF leg exercised the sort-based fallback
        // (serialized-buffer re-merge) — without it the digest equality
        // above proves nothing about that path
        if (name == "kmv_distinct") {
          val fb = org.apache.spark.sql.graftbridge.bridge
            .objectAggFallbackTasks(df)
          println(s"""SPILLJSON {"objagg_fallback_tasks":$fb}""")
        }
      }
      org.apache.spark.sql.graftbridge.bridge.waitListenerBusEmpty(spark.sparkContext)
      println(s"""SPILLJSON {"spilled_bytes":${spilled.get()}}""")
    } finally spark.stop()
  }
}
