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
  * Exactly-once state: each batch stages the merged snapshot to a temp dir,
  * then swaps it in with renames (live → .bak, staging → live, drop .bak) —
  * a crash at any point leaves either the old snapshot or the backup on
  * disk, never silent emptiness, and [[readSnapshot]] refuses to bootstrap
  * when a backup exists (an interrupted swap must be restored, not papered
  * over). The merge itself is idempotent — re-applying a replayed batch
  * nets to the same snapshot, so checkpoint-recovery replays are safe.
  * That idempotence is exactly what `applyChangelog` guarantees:
  * latest-by-seq netting makes duplicate or re-ordered deliveries of the
  * same change rows collapse.
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
        // the bootstrap schema comes from the STREAM's own types — fabricating
        // one (e.g. a long key) breaks or corrupts the first batch of any
        // stream keyed by another type
        val snapSchema = org.apache.spark.sql.types.StructType(
          (keyCol +: payloadCols).distinct.map(n => batch.schema(n)))
        val merged = Merge.applyChangelog(
            readSnapshot(spark, snapshotDir, snapSchema),
            batch, keyCol, seqCol, opCol, payloadCols)
          .drop("changed")
        stageAndSwap(spark, merged, snapshotDir)
      }
      .start()

  /** Materialize `df` to `<dir>.staging`, then swap it in with checked
    * renames (live → .bak, staging → live, drop .bak). Materializing FIRST
    * matters because `df` typically READS the directory the swap replaces —
    * a parquet overwrite of the live dir would delete the only copy before
    * writing. Hadoop FileSystem signals most rename failures by returning
    * FALSE, not throwing — every step is `require`d before anything is
    * deleted, so a crash at any point leaves either the old snapshot or the
    * backup on disk, never silent emptiness. `prepareStaging` runs after
    * the parquet write and before the swap — marker files written there
    * become visible atomically WITH the data.
    */
  private[streaming] def stageAndSwap(spark: SparkSession, df: DataFrame,
      dir: String,
      prepareStaging: org.apache.hadoop.fs.Path => Unit = _ => ()): Unit = {
    val live = new org.apache.hadoop.fs.Path(dir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new org.apache.hadoop.fs.Path(dir + ".staging")
    val bak = new org.apache.hadoop.fs.Path(dir + ".bak")
    df.write.mode("overwrite").parquet(tmp.toString)
    prepareStaging(tmp)
    fs.delete(bak, true)
    if (fs.exists(live))
      require(fs.rename(live, bak), s"rename $live -> $bak failed")
    require(fs.rename(tmp, live), s"rename $tmp -> $live failed")
    // only now is the live dir confirmed in place; the backup is surplus
    fs.delete(bak, true)
  }

  /** Current snapshot; an empty frame of `bootstrapSchema` only before the
    * FIRST batch. A missing live dir with a backup present means a swap was
    * interrupted — fail loudly (restore `.bak`) instead of silently
    * restarting from empty.
    */
  def readSnapshot(spark: SparkSession, snapshotDir: String,
                   bootstrapSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val live = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bak = new org.apache.hadoop.fs.Path(snapshotDir + ".bak")
    if (fs.exists(live)) spark.read.parquet(snapshotDir)
    else if (fs.exists(bak))
      throw new IllegalStateException(
        s"snapshot at $snapshotDir is missing but a backup exists at $bak — " +
          "an interrupted swap; restore the backup before restarting the stream")
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], bootstrapSchema)
  }
}
