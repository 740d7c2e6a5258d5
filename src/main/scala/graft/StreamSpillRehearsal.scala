package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{StandingStore, StreamingClusters, StreamingCoMovement, StreamingNearDup, StreamingScrub}

/** Memory-pressure rehearsal for the STREAMING standing-store processors
  * (a `main`, spawned by `SpillRehearsalSpec`'s streaming test like
  * [[SpillRehearsal]]): drive the five foreachBatch bodies — near-dup
  * signature merge, scrub digest union, co-movement presence upsert,
  * cluster gate + remap, per-day KMV sketch fold — through a
  * deterministic micro-batch sequence
  * under the starved memory manager, and prove the FINAL STANDING-STORE
  * STATE is bit-identical to the unconstrained run, with spills observed.
  * [[SpillRehearsal]] covers five batch shapes; none of the streaming merge
  * paths (store read + window/join + store append inside foreachBatch, plus
  * the checkpoint machinery around them) had ever actually spilled.
  *
  * The batch sequence is shared with the spec through [[runAll]] so the
  * two sides can never drift: same seeded stores, same batches, same
  * digests — only the memory manager differs.
  */
object StreamSpillRehearsal {

  /** 60 deterministic pseudo-words per doc from a small vocabulary —
    * guarantees real cross-doc segment/shingle collisions so the merge
    * paths do work, not just IO.
    */
  private def docText(id: Long): String =
    (0 until 60).map(i => "w" + ((id * 17 + i * 5) % 97)).mkString(" ")

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Drive all five processors; returns op -> (storeRows, digest) over the
    * final standing-store state (sorted canonical rows — the stream output
    * dirs are at-least-once by contract, the STORES are the exactly-once
    * surface under test).
    */
  def runAll(spark: SparkSession): Seq[(String, Long, String)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    def digestOf(df: DataFrame): (Long, String) = {
      // BINARY columns (the scrub store is 16-byte digests) must be
      // canonicalized: Row.toString on Array[Byte] prints the JVM identity
      // hash — same set, different "digest" every run
      val canon = df.select(df.schema.fields.toIndexedSeq.map { f =>
        if (f.dataType == org.apache.spark.sql.types.BinaryType)
          hex(col(f.name)).as(f.name)
        else col(f.name)
      }: _*)
      val rows = canon.collect()
      (rows.length.toLong, SpillRehearsal.digest(rows))
    }

    // ---- neardup: banded-signature store merge -------------------------
    val neardup = {
      val store = tmp("ssr-nd-store"); val out = tmp("ssr-nd-out")
      val mem = MemoryStream[(Long, String)]
      val q = StreamingNearDup.nearDupStream(
        mem.toDF.toDF("doc_id", "text"), "doc_id", "text",
        store, out, tmp("ssr-nd-cp"), compactEvery = 3)
      try {
        (0 until 4).foreach { b =>
          // heavy overlap across batches: ids revisit earlier texts
          mem.addData((0 until 3000).map { i =>
            val id = b * 3000L + i
            (id, docText(id % 4000))
          })
          q.processAllAvailable()
        }
      } finally q.stop()
      // r19: the stream's default is the PRODUCTION path (fast=true,
      // band-partitioned store), so the rehearsal digests that store —
      // fastBandedSignature's schema (long buckets), band read back from
      // the partition dirs
      val sigSchema = graft.ops.Dedup.fastBandedSignature(
        Seq((0L, "a b c")).toDF("doc_id", "text"), "doc_id", "text",
        8, 2, 3).schema
      digestOf(StandingStore.read(spark, store, sigSchema).distinct())
    }

    // ---- scrub: segment-digest store union -----------------------------
    val scrub = {
      val store = tmp("ssr-sc-store"); val out = tmp("ssr-sc-out")
      val mem = MemoryStream[(Long, String)]
      val q = StreamingScrub.scrubStream(
        mem.toDF.toDF("doc_id", "text"), "doc_id", "text",
        store, out, tmp("ssr-sc-cp"), segTokens = 15, compactEvery = 3)
      try {
        (0 until 4).foreach { b =>
          mem.addData((0 until 2500).map { i =>
            val id = b * 2500L + i
            (id, docText(id % 3000))
          })
          q.processAllAvailable()
        }
      } finally q.stop()
      digestOf(StreamingScrub.readStore(spark, store).distinct())
    }

    // ---- comove: dt-partitioned presence upsert ------------------------
    val comove = {
      val store = tmp("ssr-cm-store"); val out = tmp("ssr-cm-out")
      val mem = MemoryStream[(Long, java.sql.Date, Int, Long)]
      val q = StreamingCoMovement.pairHourStream(
        mem.toDF.toDF("uid", "dt", "hr", "cell"),
        store, out, tmp("ssr-cm-cp"), compactEvery = 3)
      try {
        (0 until 4).foreach { b =>
          val day = java.sql.Date.valueOf(f"2024-01-${b % 2 + 1}%02d")
          mem.addData((0 until 3000).map { i =>
            ((i % 500).toLong, day, (i / 500) + b * 6, (i % 50).toLong)
          })
          q.processAllAvailable()
        }
      } finally q.stop()
      // the presence store exists after four batches; plain read (footer
      // schema) keeps this independent of the module's private schema val
      digestOf(spark.read.parquet(store).distinct())
    }

    // ---- clusters: label gate + remap ----------------------------------
    val clusters = {
      val root = tmp("ssr-cl-root")
      val mem = MemoryStream[(Long, Long)]
      val q = StreamingClusters.clusterStream(
        mem.toDF.toDF("a", "b"), "a", "b", root, tmp("ssr-cl-cp"),
        compactEvery = 3)
      try {
        (0 until 4).foreach { b =>
          // chains that repeatedly merge earlier batches' clusters
          mem.addData((0 until 2500).map { i =>
            val x = (b * 1500L + i).toLong
            (x, x + 1L)
          })
          q.processAllAvailable()
        }
      } finally q.stop()
      digestOf(StreamingClusters.resolvedLabels(spark, root))
    }

    // ---- kmv: per-day bottom-k sketch fold -----------------------------
    val kmv = {
      val store = tmp("ssr-kv-store")
      val mem = MemoryStream[(java.sql.Timestamp, Long)]
      val k = 16
      val q = graft.streaming.StreamingKmv.kmvStream(
        mem.toDF.toDF("ts", "uid"), "ts", "uid", k,
        store, tmp("ssr-kv-cp"), compactEvery = 3)
      try {
        (0 until 4).foreach { b =>
          // 3 days per batch, heavy cross-batch uid overlap: the committed
          // fold and the read-side k-min rank both do real merging
          mem.addData((0 until 3000).map { i =>
            val day = i % 3 + 1
            (java.sql.Timestamp.valueOf(f"2024-02-$day%02d 08:00:00"),
              (b * 700L + i) % 2500L)
          })
          q.processAllAvailable()
        }
      } finally q.stop()
      digestOf(graft.streaming.StreamingKmv.readMinhashes(spark, store, k))
    }

    Seq("neardup" -> neardup, "scrub" -> scrub, "comove" -> comove,
      "clusters" -> clusters, "kmv" -> kmv).map { case (op, (n, d)) => (op, n, d) }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-stream-spill-rehearsal")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // the starvation knobs, verbatim from SpillRehearsal (rationale there)
      .config("spark.testing.memory", (64L * 1024 * 1024).toString)
      .config("spark.testing.reservedMemory", (8L * 1024 * 1024).toString)
      .config("spark.memory.fraction", "0.2")
      .config("spark.memory.storageFraction", "0.05")
      .config("spark.buffer.pageSize", "64k")
      .config("spark.shuffle.spill.numElementsForceSpillThreshold", "2000")
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
      runAll(spark).foreach { case (op, n, d) =>
        // scalastyle:off println — the stdout line IS the contract
        println(s"""STREAMSPILLJSON {"op":"$op","store_rows":$n,"digest":"$d"}""")
      }
      org.apache.spark.sql.graftbridge.bridge.waitListenerBusEmpty(spark.sparkContext)
      println(s"""STREAMSPILLJSON {"spilled_bytes":${spilled.get()}}""")
    } finally spark.stop()
  }
}
