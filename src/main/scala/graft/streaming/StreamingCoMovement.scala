package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming co-movement discovery — the online twin of the flagship batch
  * self-join ([[graft.ops.CoMovement.pairHours]]). The reference runs the
  * pair join as a day-at-a-time gold refresh (`refresh_gold_tables.py` day
  * loop); this stream discovers each co-located vessel-pair-hour the moment
  * its SECOND vessel's hourly row arrives, without ever re-joining history
  * against itself.
  *
  * Input contract: a stream of FINALIZED hourly presence rows
  * (uid, dt, hr, cell) — exactly what [[StreamingRollup.hourly]] emits in
  * append mode once the watermark closes an hour (one row per (uid, hour)
  * per stream lifetime). Per micro-batch:
  *
  *   1. new pairs among the batch's own rows (batch ⋈ batch, uid_a < uid_b),
  *   2. new pairs between batch rows and the STANDING presence store,
  *      restricted by a semi-join to the space-time buckets the batch
  *      actually touches — the store's history is probed, never self-joined,
  *   3. batch rows append to the store.
  *
  * Equivalence contract (pinned in StreamingSpec): replaying a corpus's
  * hourly rows across any micro-batch partitioning yields EXACTLY the batch
  * `pairHours` multiset — each unordered pair-hour is discovered exactly
  * once, in the batch where its later side arrived.
  *
  * Scale: per-batch cost is O(batch ⋈ batch) + O(batch-day slice of the
  * store). The store is one narrow row per vessel-hour (the same table the
  * batch pipeline materializes as hourly gold), PARTITIONED BY dt and
  * probed under a literal `dt IN (batch days)` predicate — partition
  * pruning bounds the SCAN to the days the batch touches (the bucket
  * semi-join alone would bound shuffle volume but still scan all history,
  * so per-batch cost would grow with stream lifetime), and the semi-join
  * then narrows the shuffle to the touched space-time buckets. Day-grain scoring (the
  * gT > 1 gate, overlap coefficients, GTO) runs downstream as the standard
  * periodic rollup over the accumulated pair-hour log — the same lambda
  * split as [[StreamingNearDup]] documents.
  *
  * Recovery: standard foreachBatch at-least-once. A replayed batch re-appends
  * presence rows (the probe `distinct`s the store, so keep decisions don't
  * change) and re-emits its pair-hours — key downstream reads by
  * (uid_a, uid_b, dt, hr) or point outDir at an idempotent sink, as with any
  * foreachBatch pipeline.
  */
object StreamingCoMovement {

  /** Start the pair-hour stream: discovered co-located pair-hours
    * (uid_a, uid_b, dt, hr, cell_a, cell_b) append to `outDir`; presence
    * rows append to `storeDir`.
    *
    * `ringK = 0` (default) co-locates on exact cell equality — `cell` may be
    * any equi-joinable type. `ringK > 0` is the online twin of
    * [[graft.ops.CoMovement.pairsDailyRing]]: `cell` must be a
    * [[graft.expressions.GeoCell]] address, a pair-hour counts when the two
    * cells are within hex distance k, and the output carries BOTH cells
    * (`cell_a`/`cell_b`, aligned with `uid_a`/`uid_b`; in exact mode they
    * are equal). The batch side expands to its 1+3k(k+1) ring addresses by
    * the same pure long arithmetic as the batch operator; the store is
    * probed on the expanded addresses, never self-joined, and stays raw
    * presence rows either way.
    */
  def pairHourStream(hourly: DataFrame, storeDir: String, outDir: String,
                     checkpointDir: String, ringK: Int = 0,
                     compactEvery: Int = 8): StreamingQuery =
    hourly.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        if (!batch0.isEmpty) {
          val spark = batch0.sparkSession
          val batch = batch0.select("uid", "dt", "hr", "cell").persist()
          try {
            val pairs =
              if (ringK == 0) exactPairs(spark, batch, storeDir)
              else ringPairs(spark, batch, storeDir, ringK)
            pairs.write.mode("append").parquet(outDir)
            // dt-partitioned: the probe prunes the store to the days the
            // batch touches, so per-batch scan cost tracks the batch's
            // time span, not the stream's lifetime
            migrateFlatStore(spark, storeDir, batch.schema)
            StandingStore.append(batch, storeDir, Seq("dt"))
            if (StandingStore.due(batchId, compactEvery))
              StandingStore.compact(spark, storeDir, batch.schema, Seq("dt"))
          } finally batch.unpersist(blocking = false)
        }
        ()
      }
      .start()

  /** The batch's distinct days as literals: a `dt IN (...)` filter on the
    * dt-partitioned store is PARTITION PRUNING — the probe's scan cost
    * tracks the batch's time span, not the accumulated history. (The
    * bucket semi-join alone bounds shuffle volume but not scan volume; a
    * literal predicate prunes at planning time, no DPP reliance.) One tiny
    * driver collect per batch over the persisted batch frame.
    */
  private def batchDates(batch: DataFrame): Seq[Any] =
    batch.select("dt").distinct().collect().map(_.get(0)).toSeq

  /** Exact-cell batch step: batch × batch plus batch × bucket-probed store. */
  private def exactPairs(spark: SparkSession, batch: DataFrame,
                         storeDir: String): DataFrame = {
    val days = batchDates(batch)
    // path-level pruning: the probe lists ONLY the touched days' partition
    // dirs (O(batch time span)), not the store root (O(stream lifetime) —
    // the listing creep StreamBench measured). The row filter stays: it
    // restricts the legacy-flat fallback and is a no-op when pruned.
    val standing = StandingStore.readPartitions(
        spark, storeDir, batch.schema, "dt", days)
      .filter(col("dt").isInCollection(days))
      .distinct()
      // probe only the buckets this batch touches
      .join(batch.select("dt", "hr", "cell").distinct(),
        Seq("dt", "hr", "cell"), "left_semi")
    val bb = batch.select(col("uid").as("uid_a"), col("dt"), col("hr"),
        col("cell"))
      .join(batch.select(col("uid").as("uid_b"), col("dt"), col("hr"),
        col("cell")), Seq("dt", "hr", "cell"))
      .filter(col("uid_a") < col("uid_b"))
      .select(col("uid_a"), col("uid_b"), col("dt"), col("hr"),
        col("cell").as("cell_a"), col("cell").as("cell_b"))
    val bs = batch.select(col("uid").as("uid_x"), col("dt"), col("hr"),
        col("cell"))
      .join(standing.select(col("uid").as("uid_y"), col("dt"), col("hr"),
        col("cell")), Seq("dt", "hr", "cell"))
      .filter(col("uid_x") =!= col("uid_y"))
      .select(least(col("uid_x"), col("uid_y")).as("uid_a"),
        greatest(col("uid_x"), col("uid_y")).as("uid_b"),
        col("dt"), col("hr"),
        col("cell").as("cell_a"), col("cell").as("cell_b"))
    bb.union(bs)
  }

  /** Ring-k batch step: the batch side carries the 1+3k(k+1)-address
    * expansion on the decoded lattice address; each (pair, hour) matches at
    * most once because the expanded addresses are distinct and each side
    * holds one row per vessel-hour.
    */
  private def ringPairs(spark: SparkSession, batch: DataFrame,
                        storeDir: String, k: Int): DataFrame = {
    val deltas = graft.ops.CoMovement.ringDeltas(k)
    val b = batch.withColumn("v", conv(col("cell"), 16, 10).cast("long"))
    val expanded = b
      .withColumn("__d", explode(array(deltas.map(lit): _*)))
      .select(col("uid"), col("dt"), col("hr"), col("cell"),
        (col("v") + col("__d")).as("v"))
    val bb = b.select(col("uid").as("uid_a"), col("dt"), col("hr"),
        col("cell").as("cell_a"), col("v"))
      .join(expanded.select(col("uid").as("uid_b"), col("dt"), col("hr"),
        col("cell").as("cell_b"), col("v")), Seq("dt", "hr", "v"))
      .filter(col("uid_a") < col("uid_b"))
      .select("uid_a", "uid_b", "dt", "hr", "cell_a", "cell_b")
    val days = batchDates(batch)
    // same path-level pruning as exactPairs — see the comment there
    val standing = StandingStore.readPartitions(
        spark, storeDir, batch.schema, "dt", days)
      .filter(col("dt").isInCollection(days))
      .distinct()
      .withColumn("v", conv(col("cell"), 16, 10).cast("long"))
      // probe only the addresses the expanded batch can reach
      .join(expanded.select("dt", "hr", "v").distinct(),
        Seq("dt", "hr", "v"), "left_semi")
    val bs = expanded.select(col("uid").as("uid_x"), col("dt"), col("hr"),
        col("cell").as("cell_x"), col("v"))
      .join(standing.select(col("uid").as("uid_y"), col("dt"), col("hr"),
        col("cell").as("cell_y"), col("v")), Seq("dt", "hr", "v"))
      .filter(col("uid_x") =!= col("uid_y"))
      .select(least(col("uid_x"), col("uid_y")).as("uid_a"),
        greatest(col("uid_x"), col("uid_y")).as("uid_b"),
        col("dt"), col("hr"),
        when(col("uid_x") <= col("uid_y"), col("cell_x"))
          .otherwise(col("cell_y")).as("cell_a"),
        when(col("uid_x") <= col("uid_y"), col("cell_y"))
          .otherwise(col("cell_x")).as("cell_b"))
    bb.union(bs)
  }

  /** The standing presence store — [[StandingStore.read]] (schema-enforced,
    * compaction-swap heal, empty before the first batch lands).
    */
  def readStore(spark: SparkSession, storeDir: String,
                schema: StructType): DataFrame =
    StandingStore.read(spark, storeDir, schema)

  /** Migration shim for stores written before the dt-partitioned layout:
    * a store holding ROOT-LEVEL parquet files (flat layout, dt as a data
    * column) would become unreadable the moment a partitioned append lands
    * dt= dirs next to them. Detect the legacy shape and rewrite it
    * partitioned — one [[StandingStore.compact]] with partition columns,
    * the same crash-safe swap maintenance already uses — BEFORE the first
    * partitioned append touches the dir.
    */
  private def migrateFlatStore(spark: SparkSession, storeDir: String,
                               schema: StructType): Unit = {
    val p = new org.apache.hadoop.fs.Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val flat = fs.exists(p) && fs.listStatus(p)
      .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (flat) StandingStore.compact(spark, storeDir, schema, Seq("dt"))
  }
}
