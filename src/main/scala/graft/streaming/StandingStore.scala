package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The append-only parquet "standing store" every foreachBatch processor
  * here keeps between micro-batches (kept-segment digests, banded
  * signatures, presence rows). One shared discipline, three invariants:
  *
  *   1. **Schema-enforced reads.** A crash during the very first store
  *      write can leave the dir holding only an uncommitted `_temporary`
  *      (no parquet footers); schema INFERENCE over that dir fails every
  *      restart, wedging the stream — with the declared schema the read
  *      yields zero rows and at-least-once recovery proceeds.
  *   2. **Set semantics under replay.** Every store here means a SET (the
  *      probes `distinct` it), so a torn replay appending duplicate rows
  *      can never change a decision — and compaction may rewrite the store
  *      as its distinct rows without changing meaning.
  *   3. **Bounded file count.** Append-per-batch accretes one job's worth
  *      of files per micro-batch; after B batches every standing read pays
  *      an O(B) listing/open cost. [[compact]] resets it: write the
  *      distinct set to a sibling `<store>.compact` snapshot, delete the
  *      store, rename the snapshot into place. A crash before the delete
  *      leaves the store authoritative (the stale snapshot is truncated on
  *      the next pass); a crash between delete and rename is healed by
  *      [[read]] promoting the snapshot — complete at swap time, because
  *      foreachBatch is sequential and nothing appends concurrently.
  */
object StandingStore {

  /** Schema-enforced standing read: heals an interrupted compaction swap,
    * tolerates a missing or footer-less dir (empty frame of `schema`).
    */
  def read(spark: SparkSession, storeDir: String,
           schema: StructType): DataFrame = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    heal(fs, p)
    if (fs.exists(p)) spark.read.schema(schema).parquet(storeDir)
    else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** Rewrite the store as its distinct rows via crash-safe
    * snapshot-and-swap (see the object doc, invariant 3). Heals an earlier
    * interrupted swap FIRST — recovery must not depend on the convention
    * that every batch reads before it appends: a direct compact() on the
    * crashed state would otherwise no-op while the snapshot holding the
    * full history sat stranded (and the first append would create a fresh
    * store that shadows it forever). `partitionCols` preserves a
    * partitioned store's layout (the pruning a partitioned probe relies
    * on must survive its own maintenance).
    */
  def compact(spark: SparkSession, storeDir: String, schema: StructType,
              partitionCols: Seq[String] = Nil): Unit = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    heal(fs, p)
    if (fs.exists(p)) {
      val snap = compactPath(p)
      val w = spark.read.schema(schema).parquet(storeDir).distinct()
        .write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(snap.toString)
      fs.delete(p, true)
      fs.rename(snap, p)
    }
  }

  /** Promote a completed snapshot whose swap was interrupted between
    * delete and rename; the snapshot held the complete distinct set at
    * swap time (foreachBatch is sequential), so promotion loses nothing.
    */
  private def heal(fs: org.apache.hadoop.fs.FileSystem, p: Path): Unit = {
    val snap = compactPath(p)
    if (!fs.exists(p) && fs.exists(snap)) { fs.rename(snap, p); () }
  }

  /** True on the micro-batches where a `compactEvery`-cadence store should
    * compact (after its appends); 0 disables.
    */
  def due(batchId: Long, compactEvery: Int): Boolean =
    compactEvery > 0 && batchId % compactEvery == compactEvery - 1

  private def compactPath(store: Path) =
    new Path(store.getParent, store.getName + ".compact")
}
