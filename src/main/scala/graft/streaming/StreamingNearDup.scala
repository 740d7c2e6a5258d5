package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.ops.Dedup

/** Streaming NEAR-dup suppression — the online MinHash-LSH half of the dedup
  * ladder ([[StreamingDedup]] handles exact repeats; [[graft.ops.Dedup]] is
  * the batch layer). Each micro-batch is signatured once and probed against
  * the standing banded-signature store with
  * [[graft.ops.Dedup.incrementalLshPairs]] — only the batch is ever
  * shingled, so per-batch cost is O(|batch| + collisions) while the store
  * grows by signature rows only (k/rowsPerBand short strings per doc, not
  * text).
  *
  * Keep-first semantics across time: a batch doc is a `dup_candidate` when
  * it collides with ANY standing doc (the store is history) or with a
  * lower-id doc of the same batch (the in-batch tiebreak). Only KEPT docs'
  * signatures append to the store, so the store stays canonical and every
  * later near-copy still matches the original.
  *
  * Recovery semantics: the store append is per-(pair, band) `distinct`-safe
  * — a replayed batch re-appending signatures cannot inflate
  * `bands_shared` (the probe collapses duplicate store rows). The flagged
  * OUTPUT dir is standard foreachBatch at-least-once; point it at an
  * idempotent sink (or key downstream reads by id) exactly as with any
  * foreachBatch pipeline.
  */
object StreamingNearDup {

  /** Start the suppression stream: flagged batch rows (plus `n_collisions`,
    * `dup_candidate`) append to `outDir`; kept docs' signatures append to
    * `storeDir`.
    *
    * `fast = true` (the DEFAULT — r19, promoted on two rounds of
    * StreamBench ladder evidence: 16-39% less per-batch wall at every
    * decade, r17/r18) runs [[graft.ops.Dedup.fastBandedSignature]] — the
    * PRODUCTION path (integer MinHash kernel, 8-byte xxhash64 band
    * buckets) instead of the md5-string AUDIT path. Everything downstream
    * is bucket-type-agnostic (the store schema follows the signature
    * frame; the probe join is the same (band, bucket) equi-join), so the
    * two paths differ ONLY in signature cost and store row width — which
    * is exactly what StreamBench's `neardup` vs `neardup_fast` ladders
    * measure. A store written by one path is not probe-compatible with
    * the other (string vs long buckets): restarting a legacy AUDIT-path
    * deployment under the new default fails LOUDLY (the schema-enforced
    * store read and the append-time schema gate both reject the
    * retyped bucket column) — pass `fast = false` explicitly to stay on
    * the audit path, or re-signature the corpus to migrate the store.
    * Audit path only where DuckDB re-derivation is required.
    *
    * `bandPartitionedStore = true` (the DEFAULT — r19, promoted on the
    * r18 `neardup_part` ladder: slope 2.75× → 1.66×, 1.58× less wall at
    * 10M standing rows) lays the store out `partitionBy(band)`. Band
    * values are statically known (`0 until k/rowsPerBand`), so the
    * standing read lists ONLY those partition dirs
    * ([[StandingStore.readPartitions]] — O(bands), not O(store files));
    * compaction preserves the layout. NOTE on honesty of the claim: every
    * batch carries ALL bands, so band partitioning prunes no DATA — what
    * it buys is a bounded listing, per-band file clustering, and the
    * layout a real deployment would shard maintenance by. A legacy FLAT
    * store MIGRATES automatically: the batch that first appends
    * partitioned detects root-level flat files and rewrites the store
    * `partitionBy(band)` through the crash-safe compaction swap first
    * (the comove r15 precedent), so existing deployments pick up the
    * layout on restart with no manual step.
    */
  def nearDupStream(docs: DataFrame, idCol: String, textCol: String,
                    storeDir: String, outDir: String, checkpointDir: String,
                    k: Int = 8, rowsPerBand: Int = 2, n: Int = 3,
                    compactEvery: Int = 8, fast: Boolean = true,
                    bandPartitionedStore: Boolean = true): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val spark = batch.sparkSession
          val sigs = (if (fast)
            Dedup.fastBandedSignature(batch, idCol, textCol, k, rowsPerBand, n)
          else
            Dedup.bandedSignature(batch, idCol, textCol, k, rowsPerBand, n))
            .persist()
          try {
            // Prune the standing store to the batch's (band, bucket) keys
            // BEFORE the pair join: a standing row whose bucket no batch
            // doc occupies cannot produce a pair, so the broadcast
            // left-semi is semantics-free. Measured effect at the 1000x
            // probe point (10M standing signatures): none on wall time —
            // the planner was already broadcasting the small probe side,
            // so the store was scan-bound before and after (the md5-string
            // audit-path bucket scan floor; the production path,
            // `fast = true`, measured 16-39% less per-batch wall at every
            // ladder decade — r17 `neardup_fast` in BENCH_streaming.json:
            // 2.38 vs 3.39 s/batch at 10M standing rows, ~1.0 vs 1.4 at
            // 10k). The semi-join is kept because it
            // PINS the exchange-free plan: without it, the moment the
            // store's size estimate crosses the broadcast threshold the
            // planner may flip to shuffling all standing rows on
            // (band, bucket) every micro-batch — the failure mode scrub
            // actually had.
            val probeKeys = sigs.select("band", "bucket").distinct()
            val standing0 =
              if (bandPartitionedStore)
                StandingStore.readPartitions(spark, storeDir, sigs.schema,
                  "band", 0 until (k / rowsPerBand))
              else readStore(spark, storeDir, sigs.schema)
            val standing = standing0
              .join(broadcast(probeKeys), Seq("band", "bucket"), "left_semi")
            val pairs = Dedup.incrementalLshPairs(sigs, standing)
            // each pair, seen from both ends: doc d vs its partner
            val oriented = pairs
              .select(col("doc_a").as("d"), col("doc_b").as("partner"))
              .unionByName(pairs
                .select(col("doc_b").as("d"), col("doc_a").as("partner")))
            val newIds = batch.select(col(idCol).as("__nid")).distinct()
            // a collision counts against d when the partner is historical
            // (not in this batch) or an earlier-id batch doc (keep-first)
            val flags = oriented
              .join(broadcast(newIds), col("partner") === col("__nid"), "left")
              .filter(col("__nid").isNull || col("partner") < col("d"))
              .groupBy(col("d")).agg(count(lit(1)).as("n_collisions"))
            val out = batch
              .join(flags, batch(idCol) === flags("d"), "left")
              .select(batch.columns.toIndexedSeq.map(col) :+
                coalesce(col("n_collisions"), lit(0L)).as("n_collisions") :+
                col("n_collisions").isNotNull.as("dup_candidate"): _*)
              .persist()
            try {
              out.write.mode("append").parquet(outDir)
              val keptIds = out.filter(!col("dup_candidate"))
                .select(col(idCol).as("doc_id"))
              if (bandPartitionedStore)
                migrateFlatStore(spark, storeDir, sigs.schema)
              StandingStore.append(
                sigs.join(keptIds, Seq("doc_id"), "left_semi"), storeDir,
                if (bandPartitionedStore) Seq("band") else Nil)
            } finally out.unpersist(blocking = false)
            if (StandingStore.due(batchId, compactEvery))
              StandingStore.compact(spark, storeDir, sigs.schema,
                if (bandPartitionedStore) Seq("band") else Nil)
          } finally sigs.unpersist(blocking = false)
        }
        ()
      }
      .start()

  /** The standing signature store — [[StandingStore.read]]: schema-ENFORCED
    * (an uncommitted `_temporary`-only dir after a first-write crash must
    * not wedge restart on schema inference), compaction-swap heal, empty
    * frame of `schema` before the first batch lands.
    */
  def readStore(spark: SparkSession, storeDir: String,
                schema: StructType): DataFrame =
    StandingStore.read(spark, storeDir, schema)

  /** Legacy FLAT signature store → `partitionBy(band)`, rewritten through
    * the crash-safe compaction swap BEFORE the first partitioned append
    * lands `band=` dirs next to flat files (which would make the store
    * unreadable). The comove r15 precedent: detect-and-rewrite once, a
    * cheap root listing per batch thereafter.
    */
  private def migrateFlatStore(spark: SparkSession, storeDir: String,
                               schema: StructType): Unit = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val flat = fs.exists(p) && fs.listStatus(p)
      .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (flat) StandingStore.compact(spark, storeDir, schema, Seq("band"))
  }
}
