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
  * window over the batch plus a membership probe that never shuffles the
  * store: the batch's distinct digests broadcast into a left-semi join,
  * and only the (≤ batch-sized) matches come back to flag the batch. By
  * default (r19) the store lives in the [[BucketedDigestStore]] tiered
  * layout, so the standing side of that join is the kb-PRUNED base plus
  * the O(batch-sized) delta — per-batch standing IO tracks
  * `history × touchedFraction`, not the whole history. The two earlier
  * shapes this replaces were both measured on the StreamBench 10k→10M
  * ladder: `store.distinct()` + left-join shuffled the full history every
  * batch (3.3×, r16), and the flat broadcast-semi still SCANNED it
  * (3.71×, r18 — the "scan floor" this layout removes).
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

  /** PRODUCTION default for `digestBuckets` — the tiered store's base
    * layout modulus. At this width a ~1k-digest micro-batch hashes into
    * ~900 buckets, so the pruned base read touches ~22% of history
    * instead of 100%, and the fraction keeps FALLING as the corpus
    * outgrows the batch (the 100 TB regime: a 10k-key batch against a
    * 10B-digest base reads ~10k/4096 ≈ all buckets but each bucket scan
    * is 1/4096 of history — per-batch base IO is `store/nBuckets ×
    * touched`, bounded either way). Fixed per store at layout birth
    * (see [[BucketedDigestStore]]'s `_kb_buckets` marker).
    */
  val DefaultDigestBuckets = 4096

  /** Start the scrub stream: re-stitched batch docs (`doc_id`, `n_segs`,
    * `n_kept`, `clean_text`) append to `outDir`; digests of newly-kept
    * segments append to `storeDir`. Every `compactEvery` batches the
    * store is rewritten distinct so file count stays bounded and any
    * torn-replay duplicate rows are squeezed out.
    *
    * `digestBuckets > 0` (the DEFAULT — r19, promoted on StreamBench
    * ladder evidence) keeps the store in the [[BucketedDigestStore]]
    * tiered layout: flat one-file-per-batch delta appends, a
    * kb-partitioned compacted base, and membership probes that read the
    * base PRUNED to the batch's hash buckets — per-batch standing cost
    * tracks `store × touchedFraction + delta`, not the whole history
    * (the flat layout's scan floor, measured 3.71× across the 10k→10M
    * StreamBench ladder). An existing FLAT store keeps working unchanged
    * (its files read in full as the legacy zone) and is folded into the
    * tiered base by the first compaction — migration is automatic,
    * crash-safe, and one-way. `digestBuckets = 0` keeps the legacy flat
    * layout exactly (audit deployments that DuckDB-rederive the store).
    */
  def scrubStream(docs: DataFrame, idCol: String, textCol: String,
                  storeDir: String, outDir: String, checkpointDir: String,
                  segTokens: Int, compactEvery: Int = 8,
                  digestBuckets: Int = DefaultDigestBuckets): StreamingQuery =
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
            val standing =
              standingMatches(spark, storeDir, StoreSchema, "seg_key",
                batchKeys, digestBuckets)
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
              appendKept(flagged.filter(col("kept")).select("seg_key"),
                storeDir, digestBuckets)
            } finally flagged.unpersist(blocking = false)
          } finally segs.unpersist(blocking = false)
          if (StandingStore.due(batchId, compactEvery)) {
            if (digestBuckets > 0)
              BucketedDigestStore.compact(spark, storeDir, StoreSchema,
                "seg_key", digestBuckets)
            else compactStore(spark, storeDir, StoreSchema)
          }
        }
        ()
      }
      .start()

  /** The bucketed membership probe shared by both scrub streams: standing
    * rows matching the batch's digest keys, distinct. With buckets on,
    * the batch's touched `kb` values are driver-collected — a bounded
    * collect, ≤ `digestBuckets` ints by construction — and the base read
    * is pruned to exactly those partition dirs; the flat path is the
    * legacy full-scan semi-join, byte-identical semantics either way.
    */
  private def standingMatches(spark: SparkSession, storeDir: String,
                              schema: StructType, digestCol: String,
                              batchKeys: DataFrame,
                              digestBuckets: Int): DataFrame = {
    val standing0 =
      if (digestBuckets > 0) {
        val touched = batchKeys
          .select(BucketedDigestStore.kbExpr(digestCol, digestBuckets)
            .as("kb"))
          .distinct().collect().map(_.getInt(0)).toIndexedSeq
        BucketedDigestStore.read(spark, storeDir, schema, digestCol,
          touched, digestBuckets)
      } else readStore(spark, storeDir, schema)
    standing0
      .join(broadcast(batchKeys), Seq(digestCol), "left_semi")
      .distinct()
  }

  private def appendKept(kept: DataFrame, storeDir: String,
                         digestBuckets: Int): Unit =
    if (digestBuckets > 0) BucketedDigestStore.append(kept, storeDir)
    else StandingStore.append(kept, storeDir)

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
                       w: Int, compactEvery: Int = 8,
                       digestBuckets: Int = DefaultDigestBuckets): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val toks = Dedup.tokenArrays(batch, idCol, textCol).persist()
          try {
            val wins = Dedup.spanWindowsAt(toks, w).persist()
            try {
              // same membership probe as [[scrubStream]] — bucketed
              // tiered store by default, pruned base read, broadcast
              // semi-join, never a store shuffle
              val batchWkeys = wins.select("wkey").distinct()
              val standing =
                standingMatches(spark, storeDir, SpanStoreSchema, "wkey",
                  batchWkeys, digestBuckets)
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
                appendKept(flagged.filter(!col("dup")).select("wkey"),
                  storeDir, digestBuckets)
              } finally flagged.unpersist(blocking = false)
            } finally wins.unpersist(blocking = false)
          } finally toks.unpersist(blocking = false)
          if (StandingStore.due(batchId, compactEvery)) {
            if (digestBuckets > 0)
              BucketedDigestStore.compact(spark, storeDir, SpanStoreSchema,
                "wkey", digestBuckets)
            else compactStore(spark, storeDir, SpanStoreSchema)
          }
        }
        ()
      }
      .start()

  /** The standing digest store, FULL read — tiered-layout aware
    * ([[BucketedDigestStore.readAll]]: base ∪ delta ∪ legacy flat files;
    * a pure flat store goes through [[StandingStore.read]] verbatim, so
    * schema-enforced reads, compaction-swap heal and empty-dir tolerance
    * all carry over).
    */
  def readStore(spark: SparkSession, storeDir: String,
                schema: StructType = StoreSchema): DataFrame =
    BucketedDigestStore.readAll(spark, storeDir, schema)

  /** [[StandingStore.compact]] — rewrite the digest store as its distinct
    * set via the shared crash-safe snapshot-and-swap.
    */
  def compactStore(spark: SparkSession, storeDir: String,
                   schema: StructType): Unit =
    StandingStore.compact(spark, storeDir, schema)
}
