package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.ops.Merge

/** Streaming CDC apply: maintain a keyed snapshot table from a change
  * stream, one [[graft.ops.Merge.applyChangelog]] merge per micro-batch via
  * `foreachBatch` — the streaming half of the incremental-maintenance story
  * (the batch half is the dynamic-partition-overwrite refresh in
  * [[graft.ops.GoldPipeline]], `refresh_gold_tables.py:156-170`).
  *
  * Exactly-once state: the snapshot is rewritten atomically per batch
  * (parquet overwrite of a single logical table), and the merge is
  * idempotent — re-applying a replayed batch nets to the same snapshot, so
  * checkpoint-recovery replays are safe. That idempotence is exactly what
  * `applyChangelog` guarantees: latest-by-seq netting makes duplicate or
  * re-ordered deliveries of the same change rows collapse.
  *
  * Scale: each micro-batch shuffles only the batch (netting) plus one keyed
  * merge against the snapshot. A production deployment points this at a
  * format with real MERGE/transaction support and bucketed layout; the
  * operator contract — net, merge, replace — is the same.
  */
object StreamingUpsert {

  /** Start a query that folds the change stream into a parquet snapshot at
    * `snapshotDir`. The stream must carry `keyCol`, `seqCol`, `opCol`
    * (`"D"` deletes, anything else upserts) and `payloadCols`.
    */
  def upsertStream(changes: DataFrame, snapshotDir: String,
                   checkpointDir: String, keyCol: String, seqCol: String,
                   opCol: String, payloadCols: Seq[String]): StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val merged = Merge.applyChangelog(
            readSnapshot(spark, snapshotDir, keyCol, seqCol, payloadCols),
            batch, keyCol, seqCol, opCol, payloadCols)
          .drop("changed")
        // materialize BEFORE overwriting: the merge reads the directory the
        // write replaces (collect-free: stage through a per-batch temp dir)
        val tmp = snapshotDir + ".staging"
        merged.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(snapshotDir)
      }
      .start()

  /** Current snapshot, or an empty keyed frame before the first batch. */
  def readSnapshot(spark: SparkSession, snapshotDir: String, keyCol: String,
                   seqCol: String, payloadCols: Seq[String]): DataFrame =
    try spark.read.parquet(snapshotDir)
    catch {
      case _: org.apache.spark.sql.AnalysisException =>
        // bootstrap: empty snapshot with the payload schema (key + payload);
        // seq lives in the payload when callers carry it through
        val cols = (keyCol +: payloadCols).distinct
        spark.range(0).select(
          col("id").as(keyCol) +:
            payloadCols.filterNot(_ == keyCol).map(c => lit(null).as(c)): _*)
          .select(cols.map(col): _*)
    }
}
