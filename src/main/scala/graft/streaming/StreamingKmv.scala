package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DateType, LongType, StructField, StructType}

import graft.ops.Sketches

/** Streaming KMV (bottom-k / theta) sketch maintenance: per-day
  * k-minimum-value sketches over an unbounded keyed stream, held in an
  * ordinary parquet standing store any batch job can read. The store holds
  * SKETCHES, never raw keys — days × ≤ k longs regardless of stream volume
  * — and answers both per-day distinct estimates ([[readState]] →
  * [[Sketches.kmvEstimate]]) and the set operation HLL registers cannot
  * express: day-over-day audience overlap matrices ([[overlap]]), computed
  * from the standing sketches alone with no event rescan.
  *
  * Exactly-once by the [[StreamingCounts]] discipline (determinism +
  * provenance, not transactions): each micro-batch appends its per-day
  * batch-partial bottom-k rows keyed `(day, hv, batch_id)`. The partial is
  * a pure function of the batch content (the [[graft.ops.KmvSketch]]
  * aggregator is deterministic and merge-order-independent), so a
  * crash-replay re-appends identical rows and the reader's `distinct()`
  * collapses them. Reading folds partials with the k-min merge — idempotent,
  * commutative, associative — so any interleaving of batches, replays, and
  * compactions yields the same sketch: the k smallest distinct hashes of
  * everything the day has seen.
  *
  * Store growth is O(batches × days-per-batch × k); [[mergeCommitted]]
  * bounds it by folding all batches STRICTLY BELOW the newest present id
  * into ≤ k base rows per day (`batch_id = -1`) — the committed-only rule
  * ([[StreamingCounts]] scaladoc has the replay argument), riding
  * [[StandingStore.rewrite]]'s crash-safe swap. Folding partial bottom-k
  * rows to the union's bottom-k is lossless for the sketch: the k smallest
  * of a union of bottom-k sets IS the union's KMV sketch.
  */
object StreamingKmv {

  val StoreSchema: StructType = StructType(Seq(
    StructField("day", DateType),
    StructField("hv", LongType),
    StructField("batch_id", LongType)))

  /** Start the sketch-maintenance stream: per-batch bounded bottom-k per
    * day (ONE map-side-combined aggregation of the batch) appends to
    * `storeDir`; every `compactEvery` batches the committed history folds
    * to base rows.
    */
  def kmvStream(rows: DataFrame, tsCol: String, keyCol: String, k: Int,
                storeDir: String, checkpointDir: String,
                compactEvery: Int = 16): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val sk = Sketches.kmvSketch(k)
          val part = batch
            .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
            .select(to_date(col(tsCol)).as("day"),
              Sketches.kmvHash(col(keyCol)).as("__hv"))
            .groupBy("day").agg(sk(col("__hv")).as("__mins"))
            .select(col("day"), explode(col("__mins")).as("hv"))
            .withColumn("batch_id", lit(batchId))
          StandingStore.append(part, storeDir)
          if (StandingStore.due(batchId, compactEvery))
            mergeCommitted(batch.sparkSession, storeDir, k)
        }
        ()
      }
      .start()

  /** Current per-day bottom-k in relational form (day, rank 1..k, hv):
    * distinct collapses replay re-appends, then the k-min fold is a
    * day-partitioned rank over ≤ days × k × batches-since-compaction rows
    * — never stream history.
    */
  def readMinhashes(spark: SparkSession, storeDir: String,
                    k: Int): DataFrame =
    StandingStore.read(spark, storeDir, StoreSchema)
      .select("day", "hv").distinct()
      .withColumn("rank", row_number()
        .over(Window.partitionBy("day").orderBy("hv")).cast("int"))
      .filter(col("rank") <= k)

  /** Per-day exact-integer estimator state (n_kept, kth_scaled) — feed to
    * [[Sketches.kmvEstimate]] for distinct-count numbers.
    */
  def readState(spark: SparkSession, storeDir: String, k: Int): DataFrame =
    readMinhashes(spark, storeDir, k)
      .groupBy("day")
      .agg(count(lit(1)).as("n_kept"), max(col("hv")).as("kth_scaled"))

  /** Pairwise day-over-day overlap state from the STANDING SKETCHES alone
    * (`seg_a`, `seg_b`, `k_union`, `kth_union`, `n_inter` — see
    * [[Sketches.kmvOverlapOnSketches]]): the retention/overlap matrix over
    * an unbounded stream without rescanning any of it.
    */
  def overlap(spark: SparkSession, storeDir: String, k: Int,
              scope: graft.engine.CacheScope = graft.engine.CacheScope.global): DataFrame =
    Sketches.kmvOverlapOnSketches(
      // persisted for the same reason as Sketches.kmvOverlap: the
      // in-plan maxSegments guard's count subtree plus BOTH pair-join
      // sides read this frame — without the persist the store scan +
      // window-rank + collect runs three times (days × ≤ k longs)
      scope.persisted(readMinhashes(spark, storeDir, k)
        .groupBy(col("day").as("seg"))
        // bounded: ≤ k rows per day by construction; sort_array makes the
        // collect order-independent (the repo's oracle discipline)
        .agg(sort_array(collect_set(col("hv"))).as("__mins"))), k)

  /** Fold every batch STRICTLY BELOW the newest id present into ≤ k base
    * rows per day (`batch_id = -1`). Idempotent; committed-only, so the
    * newest batch's potential replay still dedups against its original
    * rows.
    */
  def mergeCommitted(spark: SparkSession, storeDir: String, k: Int): Unit =
    StandingStore.rewrite(spark, storeDir, StoreSchema, { df =>
      val d = df.distinct()
      val latest = d.agg(max(col("batch_id")).as("__mx"))
      val tagged = d.crossJoin(broadcast(latest))
      val folded = tagged.filter(col("batch_id") < col("__mx"))
        .select("day", "hv").distinct()
        .withColumn("__rk", row_number()
          .over(Window.partitionBy("day").orderBy("hv")))
        .filter(col("__rk") <= k)
        .select(col("day"), col("hv"), lit(-1L).as("batch_id"))
      folded.unionByName(
        tagged.filter(col("batch_id") === col("__mx"))
          .select("day", "hv", "batch_id"))
    })
}
