package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingClusters

/** [[graft.streaming.StreamingClusters]] — incremental components: the
  * equivalence contract vs the batch resolver, replay idempotence, torn-
  * append healing, and the compaction growth bound.
  */
class StreamingClustersSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-sclust").toString

  private def resolved(root: String) =
    StreamingClusters.resolvedLabels(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  private def batchLabels(pairs: Seq[(Long, Long)]) =
    graft.ops.Dedup.dupClusters(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet

  test("three-batch incremental maintenance ≡ batch dupClusters on the full pair set") {
    val root = tmp()
    // batch 1: two separate components; batch 2: extend one, new third;
    // batch 3: a bridge pair MERGES components 1 and 3 (remap path) and a
    // smaller-id newcomer takes over a cluster minimum
    val b1 = Seq((10L, 20L), (30L, 40L))
    val b2 = Seq((20L, 25L), (50L, 60L))
    val b3 = Seq((25L, 50L), (5L, 40L))
    Seq(b1, b2, b3).zipWithIndex.foreach { case (b, i) =>
      StreamingClusters.processBatch(b.toDF("a", "b"), "a", "b", root, i.toLong)
    }
    val got = resolved(root)
    assert(got === batchLabels(b1 ++ b2 ++ b3),
      s"incremental resolution must equal the batch resolver: $got")
    // spot the two interesting facts: the merge resolved to the global
    // min (10), and the late small id 5 now canonically owns 30/40's web
    assert(got.contains((60L, 10L, false)), "bridged component takes min 10")
    assert(got.contains((30L, 5L, false)) && got.contains((5L, 5L, true)),
      "a late smaller id becomes the canonical representative")
  }

  test("replayed batch is a no-op: same labels, no duplicate remaps") {
    val root = tmp()
    StreamingClusters.processBatch(Seq((1L, 9L)).toDF("a", "b"), "a", "b", root, 0L)
    StreamingClusters.processBatch(Seq((9L, 2L)).toDF("a", "b"), "a", "b", root, 1L)
    val before = resolved(root)
    // crash-before-checkpoint: batch 1 replays verbatim
    StreamingClusters.processBatch(Seq((9L, 2L)).toDF("a", "b"), "a", "b", root, 1L)
    assert(resolved(root) === before, "replay must not change resolution")
    assert(before === batchLabels(Seq((1L, 9L), (9L, 2L))))
  }

  test("torn append (labels landed, remap lost) heals on replay") {
    val root = tmp()
    StreamingClusters.processBatch(Seq((10L, 20L)).toDF("a", "b"), "a", "b", root, 0L)
    // batch 1 wants to attach NEW node 5 to cluster 10 — which makes 5 the
    // new minimum: label (5,5) lands, the remap (10 -> 5) is LOST in a
    // crash. Simulate the torn state by appending only the label row.
    graft.streaming.StandingStore.append(
      Seq((5L, 5L, 1L)).toDF("id", "cluster", "batch_id"), root + "/labels")
    // replay of batch 1 must re-derive the merge from the pair endpoints
    StreamingClusters.processBatch(Seq((5L, 10L)).toDF("a", "b"), "a", "b", root, 1L)
    assert(resolved(root) === batchLabels(Seq((10L, 20L), (5L, 10L))),
      "the lost remap is re-derived, not silently dropped")
  }

  test("compact folds remap chains into labels and resets the remap store; resolution unchanged") {
    val root = tmp()
    // build a remap CHAIN: 30-cluster absorbed into 20, then into 10
    StreamingClusters.processBatch(Seq((30L, 40L)).toDF("a", "b"), "a", "b", root, 0L)
    StreamingClusters.processBatch(Seq((20L, 30L)).toDF("a", "b"), "a", "b", root, 1L)
    StreamingClusters.processBatch(Seq((10L, 20L)).toDF("a", "b"), "a", "b", root, 2L)
    val before = resolved(root)
    StreamingClusters.compact(spark, root)
    assert(resolved(root) === before, "compaction is meaning-preserving")
    assert(spark.read.schema(StreamingClusters.RemapSchema)
      .parquet(root + "/remap").count() === 0L, "remap store resets")
    // post-compact batches keep working against the folded labels
    StreamingClusters.processBatch(Seq((40L, 99L)).toDF("a", "b"), "a", "b", root, 3L)
    assert(resolved(root) === batchLabels(
      Seq((30L, 40L), (20L, 30L), (10L, 20L), (40L, 99L))))
  }

  test("composition: doc stream → incremental LSH pairs → incremental clusters ≡ batch pipeline") {
    // the full streaming curation story: documents arrive in batches, the
    // incremental LSH probe emits each batch's candidate pairs (vs batch
    // + standing signatures), and cluster maintenance folds them in — the
    // final resolution must equal running the BATCH pipeline (corpus-wide
    // LSH pairs → dupClusters) over everything seen
    val root = tmp()
    val docs = engine.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text")).limit(120).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val batches = docs.grouped(40).toSeq
    var standing: Option[org.apache.spark.sql.DataFrame] = None
    batches.zipWithIndex.foreach { case (b, i) =>
      val sigs = graft.ops.Dedup.bandedSignature(
        b.toSeq.toDF("doc_id", "text"), "doc_id", "text").persist()
      val st = standing.getOrElse(
        sigs.filter(lit(false))) // empty frame, same schema
      val pairs = graft.ops.Dedup.incrementalLshPairs(sigs, st)
        .select(col("doc_a"), col("doc_b")).distinct()
      StreamingClusters.processBatch(pairs, "doc_a", "doc_b", root, i.toLong)
      standing = Some(st.unionByName(sigs))
    }
    val batchPairs = graft.ops.Dedup.minhashLshPairs(
        docs.toSeq.toDF("doc_id", "text"), "doc_id", "text")
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(batchPairs.nonEmpty, "fixture must produce near-dup pairs")
    assert(resolved(root) === batchLabels(batchPairs),
      "streamed pair folding must reproduce the batch pipeline's clusters")
  }

  test("maxPairsPerBatch: an over-cap batch throws with the routed-path message, state untouched") {
    val root = tmp()
    StreamingClusters.processBatch(Seq((1L, 2L)).toDF("a", "b"), "a", "b", root, 0L)
    val before = resolved(root)
    // an AvailableNow-shaped backlog: 4 distinct pairs against a cap of 3
    val backlog = Seq((10L, 20L), (20L, 30L), (40L, 50L), (60L, 70L))
    val ex = intercept[IllegalStateException] {
      StreamingClusters.processBatch(backlog.toDF("a", "b"), "a", "b",
        root, 1L, maxPairsPerBatch = 3L)
    }
    assert(ex.getMessage.contains("dupClusters"),
      s"the error must name the routed batch path: ${ex.getMessage}")
    assert(resolved(root) === before,
      "the gate fires BEFORE any append — a rejected batch leaves no trace")
    // the same batch under a sufficient cap proceeds normally
    StreamingClusters.processBatch(backlog.toDF("a", "b"), "a", "b",
      root, 1L, maxPairsPerBatch = 4L)
    assert(resolved(root) === batchLabels(Seq((1L, 2L)) ++ backlog))
    // duplicates collapse before the gate: 4 distinct pairs sent twice
    // still pass a cap of 4 (the bound is on union-find load, not volume)
    StreamingClusters.processBatch((backlog ++ backlog).toDF("a", "b"),
      "a", "b", root, 2L, maxPairsPerBatch = 4L)
  }

  test("telemetry: remapRows tracks merge events since the last compact") {
    val root = tmp()
    def stats(pairs: Seq[(Long, Long)], id: Long) =
      StreamingClusters.processBatchWithStats(
        pairs.toDF("a", "b"), "a", "b", root, id)
    val s0 = stats(Seq((30L, 40L)), 0L) // two new ids, no merge
    assert(s0 === StreamingClusters.BatchStats(1L, 2L, 0L, 0L))
    val s1 = stats(Seq((20L, 30L)), 1L) // absorbs cluster 30 → merge event
    assert(s1.merges === 1L && s1.remapRows === 1L)
    val s2 = stats(Seq((10L, 20L)), 2L) // chains: 20 absorbed too
    assert(s2.merges === 1L && s2.remapRows === 2L,
      "remapRows accumulates merge events across batches")
    StreamingClusters.compact(spark, root)
    val s3 = stats(Seq((40L, 99L)), 3L) // post-compact: no merge, count reset
    assert(s3.remapRows === 0L,
      "compaction resets the remap growth the telemetry watches")
    // empty batch reports zeros without touching the stores
    assert(stats(Seq.empty, 4L) === StreamingClusters.BatchStats(0L, 0L, 0L, 0L))
  }

  test("streaming path end-to-end: memory-stream pairs through clusterStream") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = tmp()
    val ckpt = tmp()
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Long)]
    val q = StreamingClusters.clusterStream(
      mem.toDF().toDF("a", "b"), "a", "b", root, ckpt, compactEvery = 2)
    try {
      mem.addData((1L, 2L), (7L, 8L))
      q.processAllAvailable()
      mem.addData((2L, 7L)) // bridge
      q.processAllAvailable()
      assert(resolved(root) === batchLabels(Seq((1L, 2L), (7L, 8L), (2L, 7L))))
    } finally q.stop()
  }

  test("legacy FLAT label store migrates before the first partitioned append — no history loss") {
    val root = tmp()
    // a pre-round-15 store: root-level parquet files, NO id_bkt column
    Seq((10L, 10L, 0L), (20L, 10L, 0L), (30L, 30L, 0L))
      .toDF("id", "cluster", "batch_id")
      .write.mode("append").parquet(root + "/labels")
    // the batch touches ONE historical id and attaches a new one; without
    // the migrate-before-append, the partitioned append would shadow the
    // flat files and every later read would re-label history first-seen
    StreamingClusters.processBatch(
      Seq((20L, 40L)).toDF("a", "b"), "a", "b", root, 1L)
    val got = resolved(root)
    assert(got === Set((10L, 10L, true), (20L, 10L, false), (30L, 30L, true),
      (40L, 10L, false)),
      s"history must survive the layout migration: $got")
    // the store is now purely partitioned (no root-level data files left)
    val fs = new org.apache.hadoop.fs.Path(root + "/labels")
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.listStatus(new org.apache.hadoop.fs.Path(root + "/labels"))
      .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet")),
      "flat files must be gone after the one-shot migration")
    // a second batch probes the migrated (pruned) path and still resolves
    StreamingClusters.processBatch(
      Seq((40L, 50L)).toDF("a", "b"), "a", "b", root, 2L)
    assert(resolved(root).contains((50L, 10L, false)))
  }
}
