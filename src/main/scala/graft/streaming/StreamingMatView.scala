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
  * applies: the staged snapshot carries a `_applied_batch` marker that
  * swaps in atomically WITH the data ([[StreamingUpsert.stageAndSwap]]'s
  * `prepareStaging` hook), and a batch whose id is ≤ the live marker is
  * skipped — checkpoint-recovery replays become no-ops.
  */
object StreamingMatView {

  private val Marker = "_applied_batch"

  /** Last applied micro-batch id recorded in the live snapshot, or -1. */
  def appliedBatchId(spark: SparkSession, snapshotDir: String): Long = {
    val marker = new Path(snapshotDir, Marker)
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) -1L
    else {
      val in = fs.open(marker)
      try new String(in.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8).trim.toLong
      finally in.close()
    }
  }

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
        if (batchId <= appliedBatchId(spark, snapshotDir)) ()  // replay: no-op
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
              try out.write(batchId.toString
                .getBytes(java.nio.charset.StandardCharsets.UTF_8))
              finally out.close()
            })
        }
      }
      .start()
}
