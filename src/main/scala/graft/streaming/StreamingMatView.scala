package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Merge

/** Streaming materialized aggregate: maintain a standing keyed rollup from
  * an event stream, one [[graft.ops.Merge.mergeAdditive]] merge per
  * micro-batch — the streaming half of the incremental-maintenance proof
  * the `incr_rollup` declared query establishes (merge(agg(old), agg(new))
  * ≡ agg(all)). Each batch aggregates ONLY its own rows (partial,
  * map-side-combinable) and folds into the snapshot with one keyed join;
  * the event stream itself is never re-read.
  *
  * Replay safety differs from [[StreamingUpsert]] in kind: `applyChangelog`
  * is idempotent, but additive merge is NOT — re-applying a replayed batch
  * would double-count. The standard idempotent-`foreachBatch` recipe
  * applies, HARDENED: the staged snapshot carries a `_applied_batch` marker
  * of `queryId:batchId` that swaps in atomically WITH the data
  * ([[StreamingUpsert.stageAndSwap]]'s `prepareStaging` hook). Batch ids
  * are only comparable within one checkpoint lineage, so the guard is
  * scoped by the stable query id:
  *   - same lineage, same batch → checkpoint-recovery replay, skipped;
  *   - same lineage, EARLIER batch → checkpoint/snapshot disagreement
  *     (a restored checkpoint) — fails loudly, because re-applying
  *     double-counts and skipping drops data;
  *   - different lineage → fails loudly with the take-ownership recipe
  *     (a naive skip-by-id here would silently swallow the first N real
  *     batches of a reset stream; a naive apply would double-count a
  *     reprocessing run).
  */
object StreamingMatView {

  private val Marker = "_applied_batch"

  /** (queryId, batchId) recorded in the live snapshot's marker, if any.
    * Batch ids are only meaningful WITHIN one checkpoint lineage — the
    * query id (stable across restarts, persisted in the checkpoint) scopes
    * them, so a marker from a different lineage can never silently swallow
    * real batches.
    */
  def appliedMarker(spark: SparkSession, snapshotDir: String)
      : Option[(String, Long)] = {
    val marker = new Path(snapshotDir, Marker)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      val txt =
        try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        finally in.close()
      val i = txt.lastIndexOf(':')
      require(i > 0, s"malformed $Marker marker: '$txt'")
      Some((txt.substring(0, i), txt.substring(i + 1).toLong))
    }
  }

  /** Last applied micro-batch id recorded in the live snapshot, or -1. */
  def appliedBatchId(spark: SparkSession, snapshotDir: String): Long =
    appliedMarker(spark, snapshotDir).map(_._2).getOrElse(-1L)

  /** The running stream's stable query id (StreamExecution publishes it as
    * a thread-local property on the micro-batch thread).
    */
  private def currentQueryId(spark: SparkSession): String =
    Option(spark.sparkContext.getLocalProperty("sql.streaming.queryId"))
      .getOrElse("unknown")

  /** Start a query maintaining the rollup at `snapshotDir`. `aggregate`
    * turns one micro-batch into its partial aggregates — keyed by
    * `keyCols`, carrying exactly `sumCols`/`minCols`/`maxCols` (the same
    * frame shape `Merge.mergeAdditive` merges). Derived columns (avg =
    * sum/count) belong in the READ path, not the stored rollup.
    */
  def maintain(stream: DataFrame, snapshotDir: String, checkpointDir: String,
               keyCols: Seq[String], sumCols: Seq[String],
               minCols: Seq[String] = Nil, maxCols: Seq[String] = Nil)
              (aggregate: DataFrame => DataFrame): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val qid = currentQueryId(spark)
        val replay = appliedMarker(spark, snapshotDir) match {
          case Some((mQid, applied)) if mQid == qid && batchId == applied =>
            true  // checkpoint-recovery re-attempt of the last batch: no-op
          case Some((mQid, applied)) if mQid == qid && batchId < applied =>
            // same lineage but the snapshot is AHEAD of the checkpoint —
            // a rolled-back/restored checkpoint; re-applying would
            // double-count, skipping would drop data: operator must decide
            throw new IllegalStateException(
              s"snapshot at $snapshotDir has applied batch $applied of this " +
                s"query but the stream is replaying batch $batchId — the " +
                "checkpoint and snapshot disagree; restore a matching " +
                "snapshot or start a fresh snapshotDir")
          case Some((mQid, _)) if mQid != qid =>
            // a DIFFERENT checkpoint lineage owns this snapshot; applying
            // batch 0 of a reprocessing run on top of accumulated state
            // would double-count every event — take ownership explicitly
            throw new IllegalStateException(
              s"snapshot at $snapshotDir was built by query $mQid; this " +
                s"stream is $qid — to continue accumulating onto it, delete " +
                s"the $Marker marker (new batches then merge in); to " +
                "reprocess from scratch, start a fresh snapshotDir")
          case _ => false  // next batch of this lineage, or a fresh snapshot
        }
        if (replay) ()
        else {
          val delta = aggregate(batch)
          val standing = StreamingUpsert.readSnapshot(spark, snapshotDir,
            delta.schema)
          val merged = Merge.mergeAdditive(standing, delta, keyCols,
            sumCols, minCols, maxCols)
          StreamingUpsert.stageAndSwap(spark, merged, snapshotDir,
            prepareStaging = { tmp =>
              val fs = tmp.getFileSystem(spark.sparkContext.hadoopConfiguration)
              val out = fs.create(new Path(tmp, Marker), true)
              try out.write(s"$qid:$batchId"
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              finally out.close()
            })
        }
      }
      .start()
}
