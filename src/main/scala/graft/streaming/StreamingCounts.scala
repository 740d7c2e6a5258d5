package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Exactly-once streaming frequency counting (the online top-k / heavy-
  * hitters primitive): maintain per-key totals across an unbounded stream
  * with at-least-once foreachBatch delivery, WITHOUT a monolithic state
  * store — totals live in an ordinary parquet standing store any batch
  * job can read.
  *
  * The exactly-once trick is determinism + provenance, not distributed
  * transactions: each micro-batch appends its PARTIAL counts keyed by
  * `(batch_id, key)`. A replayed batch (crash before the checkpoint
  * commit) recomputes the identical partial rows — same batch content,
  * same deterministic aggregate — so the reader's `distinct()` collapses
  * the duplicate appends and the summed totals are exactly-once. This is
  * the [[StandingStore]] replay-idempotence discipline extended from sets
  * to counts: the row VALUE (not just its key) is a pure function of the
  * batch identity.
  *
  * Store growth is O(batches × keys-per-batch); [[mergeCommitted]] bounds
  * it by folding all batches STRICTLY BELOW the newest batch id into one
  * base row per key (`batch_id = -1`). Safe because Structured Streaming
  * replays only the last in-flight batch after a crash — batches below
  * the newest present id have committed and can never re-append — while
  * the newest batch's rows stay untouched so ITS potential replay still
  * dedups against the original rows. The merge rides
  * [[StandingStore.rewrite]]'s all-renames crash-safe swap.
  *
  * Scale shape: per batch ONE map-side-combined groupBy of the batch
  * (partial counts), one append; reads are a keyed distinct + sum over
  * partial rows — never a scan of raw history. Top-k is a TakeOrdered
  * over the totals, driver-bounded at k.
  */
object StreamingCounts {

  val StoreSchema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("cnt", LongType),
    StructField("batch_id", LongType)))

  /** Start the counting stream: per-batch partial counts of `keyCol`
    * (cast to string) append to `storeDir`; every `compactEvery` batches
    * the committed history merges into base rows.
    */
  def countStream(rows: DataFrame, keyCol: String, storeDir: String,
                  checkpointDir: String, compactEvery: Int = 16): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val part = batch
            .select(col(keyCol).cast("string").as("key"))
            .filter(col("key").isNotNull)
            .groupBy("key").agg(count(lit(1)).as("cnt"))
            .withColumn("batch_id", lit(batchId))
          StandingStore.append(part, storeDir)
          if (StandingStore.due(batchId, compactEvery))
            mergeCommitted(spark, storeDir)
        }
        ()
      }
      .start()

  /** Exactly-once totals: distinct partials (collapsing any replay
    * re-appends — the rows are deterministic per batch), then one keyed
    * sum.
    */
  def readCounts(spark: SparkSession, storeDir: String): DataFrame =
    StandingStore.read(spark, storeDir, StoreSchema)
      .distinct()
      .groupBy("key").agg(sum(col("cnt")).as("cnt"))

  /** Current top-k heavy hitters (count DESC, key ASC — deterministic). */
  def topK(spark: SparkSession, storeDir: String, k: Int): DataFrame =
    readCounts(spark, storeDir)
      .orderBy(col("cnt").desc, col("key").asc).limit(k)

  /** Fold every batch STRICTLY BELOW the newest batch id present into one
    * `batch_id = -1` base row per key (see the object doc for why only
    * committed batches may merge). Idempotent; a store holding only base
    * rows + one batch is already minimal and rewrites to itself.
    */
  def mergeCommitted(spark: SparkSession, storeDir: String): Unit =
    StandingStore.rewrite(spark, storeDir, StoreSchema, { df =>
      val d = df.distinct()
      val latest = d.agg(max(col("batch_id")).as("__mx"))
      val tagged = d.crossJoin(broadcast(latest))
      tagged.filter(col("batch_id") < col("__mx"))
        .groupBy("key").agg(sum(col("cnt")).as("cnt"))
        .select(col("key"), col("cnt"), lit(-1L).as("batch_id"))
        .unionByName(tagged.filter(col("batch_id") === col("__mx"))
          .select("key", "cnt", "batch_id"))
    })
}
