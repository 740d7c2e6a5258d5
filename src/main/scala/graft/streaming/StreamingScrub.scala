package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

import graft.ops.Dedup

/** Streaming duplicate-passage SCRUB — the online twin of
  * [[graft.ops.Dedup.scrubSegments]] (CCNet/FineWeb-style sub-document
  * rewrite). [[StreamingNearDup]] only SUPPRESSES whole documents; this
  * REWRITES them: each micro-batch is segmented once, every segment keeps
  * only its corpus-wide first occurrence — "corpus" = everything the
  * standing store has seen plus earlier (doc, position) rows of the same
  * batch — and batch docs are re-stitched from their surviving segments.
  *
  * Equivalence contract (pinned in StreamingSpec): replaying a corpus in
  * doc-id order across micro-batches produces EXACTLY the batch
  * `scrubSegments` output, because both sides share the same segmentation
  * ([[Dedup.segmentize]]), keep rule (first (doc_id, seg_idx) per segment
  * digest), and re-stitch ([[Dedup.restitch]]). When arrival order differs
  * from id order, "first" means first ARRIVAL — the store is history, the
  * standard streaming keep-first semantics of [[StreamingDedup]].
  *
  * Scale: the store holds one 16-byte md5 digest per distinct segment ever
  * kept — never segment text — and per-batch cost is one digest-keyed
  * window over the batch plus a membership probe that SCANS the store but
  * never shuffles it: the batch's distinct digests broadcast into a
  * left-semi join against the store, and only the (≤ batch-sized) matches
  * come back to flag the batch. The store side therefore costs one
  * columnar scan per micro-batch — linear in history but exchange-free;
  * the previous `store.distinct()` + left-join shape shuffled the whole
  * history every batch, the O(store) term StreamBench's 1000× point
  * measured at 3.3× (1.12 s → 3.59 s per batch, 1M → 10M digests).
  * BOUNDEDNESS CONTRACT: the broadcast carries the batch's distinct
  * digests (16 bytes each), so the micro-batch must stay
  * broadcast-sized — ~10M digests ≈ 160 MB is comfortable, and trigger
  * sizing (maxFilesPerTrigger / maxOffsetsPerTrigger) is the knob that
  * already bounds every other per-batch resource; a catch-up batch too
  * large to broadcast fails loudly at the broadcast, never silently.
  *
  * Recovery: standard foreachBatch at-least-once. A replayed batch
  * re-appends digests, so the store may hold duplicate rows — the probe
  * `distinct`s it before joining, and re-appending cannot change any keep
  * decision (the digest was already present); periodic [[compactStore]]
  * squeezes the duplicates back out and resets the store's file count.
  * Point `outDir` at an idempotent sink or key downstream reads by doc id,
  * as with any foreachBatch pipeline.
  */
object StreamingScrub {

  /** Store schema: one row per distinct kept-segment digest. */
  private val StoreSchema = StructType(
    Seq(StructField("seg_key", BinaryType, nullable = false)))

  /** Span-store schema: one row per distinct kept-window digest. */
  private val SpanStoreSchema = StructType(
    Seq(StructField("wkey", BinaryType, nullable = false)))

  /** Start the scrub stream: re-stitched batch docs (`doc_id`, `n_segs`,
    * `n_kept`, `clean_text`) append to `outDir`; digests of newly-kept
    * segments append to `storeDir`. Every `compactEvery` batches the store
    * is rewritten `distinct` ([[compactStore]]) so its file count stays
    * O(shuffle partitions) instead of O(batches processed) and any
    * torn-replay duplicate rows are squeezed out.
    */
  def scrubStream(docs: DataFrame, idCol: String, textCol: String,
                  storeDir: String, outDir: String, checkpointDir: String,
                  segTokens: Int, compactEvery: Int = 8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val segs = Dedup.segmentize(batch, idCol, textCol, segTokens)
            .withColumn("seg_key", unhex(md5(col("seg")))).persist()
          try {
            // Membership probe WITHOUT shuffling the store: the old shape
            // (`store.distinct()` then left-join) shuffled the ENTIRE
            // digest history every micro-batch — the O(store) term the
            // StreamBench 1000× point measured at 3.3× (1.12 s → 3.59 s
            // per batch as the store grew 1M → 10M digests). The batch's
            // distinct digest set is small (≤ batch segments), so
            // semi-join the store against it BROADCAST: the store is
            // scanned once (columnar, no shuffle, no exchange), the
            // output is ≤ the batch's keys, and the post-semi distinct
            // (store may hold torn-replay duplicates) is over that tiny
            // set, not history.
            val batchKeys = segs.select("seg_key").distinct()
            val standing = readStore(spark, storeDir)
              .join(broadcast(batchKeys), Seq("seg_key"), "left_semi")
              .distinct()
              .withColumn("__seen", lit(true))
            // in-batch first occurrence per digest; kept only when the
            // store has never seen the digest either
            val w = Window.partitionBy(col("seg_key"))
              .orderBy(col("doc_id"), col("seg_idx"))
            val flagged = segs.withColumn("rn", row_number().over(w))
              .join(broadcast(standing), Seq("seg_key"), "left")
              .withColumn("kept", col("rn") === 1 && col("__seen").isNull)
              .persist()
            try {
              Dedup.restitch(flagged).write.mode("append").parquet(outDir)
              StandingStore.append(
                flagged.filter(col("kept")).select("seg_key"), storeDir)
            } finally flagged.unpersist(blocking = false)
          } finally segs.unpersist(blocking = false)
          if (StandingStore.due(batchId, compactEvery))
            compactStore(spark, storeDir, StoreSchema)
        }
        ()
      }
      .start()

  /** Streaming twin of the stride-1 ExactSubstr rewrite
    * ([[graft.ops.Dedup.scrubSpans]]): per micro-batch, every w-token
    * window at every offset keeps its first occurrence — against the
    * standing window-digest store (history) or an earlier (doc, position)
    * of the same batch — and every LATER occurrence covers its w token
    * positions; batch docs re-assemble from uncovered tokens. The same
    * shared halves as the batch operator ([[graft.ops.Dedup.spanWindowsAt]]
    * / [[graft.ops.Dedup.assembleUncovered]]), so in-order replay is
    * batch-equivalent (spec-pinned); out-of-order arrival keeps first
    * ARRIVAL, like [[scrubStream]]. Store rows are 16-byte digests only.
    */
  def scrubSpansStream(docs: DataFrame, idCol: String, textCol: String,
                       storeDir: String, outDir: String, checkpointDir: String,
                       w: Int, compactEvery: Int = 8): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val toks = Dedup.tokenArrays(batch, idCol, textCol).persist()
          try {
            val wins = Dedup.spanWindowsAt(toks, w).persist()
            try {
              // same no-store-shuffle membership probe as [[scrubStream]]:
              // broadcast the batch's window digests into a semi-join so
              // the span store is scanned, never shuffled
              val batchWkeys = wins.select("wkey").distinct()
              val standing = readStore(spark, storeDir, SpanStoreSchema)
                .join(broadcast(batchWkeys), Seq("wkey"), "left_semi")
                .distinct()
                .withColumn("__seen", lit(true))
              val rnW = Window.partitionBy(col("wkey"))
                .orderBy(col("doc_id"), col("pos"))
              val flagged = wins.withColumn("rn", row_number().over(rnW))
                .join(broadcast(standing), Seq("wkey"), "left")
                .withColumn("dup", col("rn") > 1 || col("__seen").isNotNull)
                .persist()
              try {
                val covered = flagged.filter(col("dup"))
                  .select(col("doc_id"),
                    explode(sequence(col("pos"), col("pos") + (w - 1)))
                      .as("tpos"))
                  .distinct()
                  .withColumn("__cov", lit(true))
                Dedup.assembleUncovered(toks, covered)
                  .write.mode("append").parquet(outDir)
                // only NEW first occurrences extend the store
                StandingStore.append(
                  flagged.filter(!col("dup")).select("wkey"), storeDir)
              } finally flagged.unpersist(blocking = false)
            } finally wins.unpersist(blocking = false)
          } finally toks.unpersist(blocking = false)
          if (StandingStore.due(batchId, compactEvery))
            compactStore(spark, storeDir, SpanStoreSchema)
        }
        ()
      }
      .start()

  /** The standing digest store — [[StandingStore.read]] with this
    * module's segment schema as the default (schema-enforced read,
    * compaction-swap heal, empty-dir tolerance; see [[StandingStore]]).
    */
  def readStore(spark: SparkSession, storeDir: String,
                schema: StructType = StoreSchema): DataFrame =
    StandingStore.read(spark, storeDir, schema)

  /** [[StandingStore.compact]] — rewrite the digest store as its distinct
    * set via the shared crash-safe snapshot-and-swap.
    */
  def compactStore(spark: SparkSession, storeDir: String,
                   schema: StructType): Unit =
    StandingStore.compact(spark, storeDir, schema)
}
