package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{BooleanType, LongType, StructField, StructType}

/** Incremental connected-component maintenance over a STREAM of near-dup
  * pairs — the streaming analog of [[graft.ops.Dedup.dupClusters]]: as
  * candidate pairs arrive batch by batch, every document keeps a resolved
  * `cluster` = minimum id reachable through ALL pairs seen so far, without
  * ever re-running components over the accumulated graph.
  *
  * Why not re-cluster per batch: the batch resolver costs O(edges seen) per
  * run; at stream scale that is quadratic in time. The incremental
  * invariant instead: the standing state is ALREADY a forest of resolved
  * clusters, so a new pair can only (a) connect two known clusters,
  * (b) attach new nodes, or (c) repeat known structure. All three are
  * decided by probing the pair ENDPOINTS' labels — O(batch), never
  * O(corpus).
  *
  * State = two [[StandingStore]]s under `root`:
  *
  *   - `root/labels` (id, cluster, batch_id): one row per document,
  *     appended the first time the id is seen, NEVER rewritten by later
  *     merges (append-only is what makes replay cheap to reason about);
  *   - `root/remap` (old_cluster, new_cluster, batch_id): one row per
  *     merge EVENT — "cluster old was absorbed into new (new < old)".
  *     Resolution at read time follows remap chains to their root.
  *
  * Per batch: probe the endpoints' labels (one keyed join), pull the
  * batch's (pair, resolved-cluster) rows to the driver, run a min-root
  * union-find there (driver state is BATCH-bounded — the same judgment as
  * the BPE merge loop: thousands of driver micro-ops beat thousands of
  * Spark jobs), append label rows for first-seen ids and remap rows for
  * every cluster whose root changed.
  *
  * Exactly-once by the [[StandingStore]] determinism discipline: a
  * replayed batch probes state that already reflects its own appends —
  * first-seen ids are no longer first-seen (no label re-append, or an
  * identical-row re-append collapsed by the reader's distinct) and its
  * merges are already merged (union-find finds nothing to do, no remap
  * rows). Both TORN orders heal: labels-without-remap makes the replay
  * re-derive the same merges from the pair endpoints; remap-without-labels
  * makes the replay re-attach the same new ids to the already-merged
  * cluster.
  *
  * Driver-state bounds, explicitly ENFORCED, not just contractual:
  *
  *   - the union-find holds one entry per batch endpoint, and
  *     `maxPairsPerBatch` makes that bound a hard gate — "batch-bounded"
  *     is meaningless under a `Trigger.AvailableNow` backfill, where the
  *     whole backlog arrives as ONE batch. Past the cap the batch THROWS
  *     (the `maxUidsPerCell`/converge-or-fail house discipline: never
  *     silently drop graph edges — a dropped pair is a missed merge and a
  *     silently wrong clustering forever after). The routed path for a
  *     big backlog: run [[graft.ops.Dedup.dupClusters]] over the backlog
  *     pairs once (it IS the batch-scale resolver), seed `root/labels`
  *     from its output, and let the stream take over from there.
  *   - read-time resolution collects the remap table — one row per merge
  *     event since the last [[compact]], which folds remaps into labels
  *     and resets it. [[BatchStats.remapRows]] is the telemetry for that
  *     growth: alert/compact when it nears the driver budget. Sizing
  *     rule: the collect costs ~50 bytes/row driver-side, so size
  *     `compactEvery` such that (expected merges per batch ×
  *     `compactEvery`) stays well under budget — e.g. ≤10M rows ≈ 0.5 GB;
  *     merges per batch is itself ≤ `maxPairsPerBatch`, so the worst case
  *     is already finite.
  *
  * Ids are LONGs (the engine's document/vessel id type) — the min-label
  * contract needs the ids' NATURAL order, so no stringly typing.
  */
object StreamingClusters {

  /** Default hard cap on distinct pairs per micro-batch: 2M endpoints in
    * the driver union-find ≈ low hundreds of MB — comfortable on any
    * driver that runs Spark at all, far past any steady-state micro-batch.
    */
  val DefaultMaxPairsPerBatch: Long = 1000000L

  /** Per-batch telemetry ([[graft.ops.Kmeans.TrainStats]] discipline):
    * `pairs` distinct pair rows processed, `newLabels` first-seen ids
    * appended, `merges` remap rows appended by this batch, `remapRows`
    * total remap rows live AFTER this batch (merge events since the last
    * [[compact]] — the read-time collect's size, the number to watch).
    * An empty batch reports all zeros without touching the stores.
    */
  final case class BatchStats(pairs: Long, newLabels: Long,
                              merges: Long, remapRows: Long)

  val LabelSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("cluster", LongType),
    StructField("batch_id", LongType),
    StructField("id_bkt", LongType)))

  /** Label-store partition width: `id_bkt = id div 2^20`. The round-14
    * StreamBench found the clusters probe's per-batch time DOUBLING from
    * 10× to 100× store — the probe join re-scanned (and distinct-shuffled)
    * the ENTIRE label store every micro-batch, the same O(history) disease
    * the comove presence store had before dt-pruning. Labels are now
    * id-range partitioned, and the probe reads ONLY the batch endpoints'
    * buckets ([[StandingStore.readPartitions]]): document ids arrive
    * roughly monotonically, so a steady-state batch touches O(1) buckets
    * of new ids plus however many historical buckets its pair partners
    * span — O(batch), never O(corpus). 2^20 ids/bucket keeps a 10⁹-doc
    * corpus at ~1000 partitions (healthy dirs, prunable listings).
    */
  val LabelRangeWidth: Long = 1L << 20

  /** Probe-pruning cutoff: past this many distinct endpoint buckets the
    * per-directory existence checks cost more than the scan they save —
    * fall back to the full store read (an adversarial batch spanning the
    * whole id space degrades to exactly the pre-round-15 behavior, never
    * worse).
    */
  val MaxProbePartitions: Int = 256

  private def withBkt(df: DataFrame): DataFrame =
    df.withColumn("id_bkt", call_function("div", col("id"), lit(LabelRangeWidth)))

  val RemapSchema: StructType = StructType(Seq(
    StructField("old_cluster", LongType),
    StructField("new_cluster", LongType),
    StructField("batch_id", LongType)))

  private def labelsDir(root: String) = root + "/labels"
  private def remapDir(root: String) = root + "/remap"

  /** One-shot migration of a pre-round-15 FLAT label store to the
    * id-range-partitioned layout — must run before the first partitioned
    * append (see the call site for the mixed-layout failure). The rewrite
    * reads the flat files through the declared schema (id_bkt null),
    * recomputes id_bkt from id, and swaps crash-safely.
    */
  private def migrateFlatLabels(spark: SparkSession, root: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(labelsDir(root))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // isFlat's known-partitioned cache makes this a Set lookup on every
    // batch after the first — the naive full root listing here was HALF of
    // the O(partitions)-per-batch term the 1000x StreamBench point caught
    val flat = fs.exists(p) && StandingStore.isFlat(fs, p, labelsDir(root))
    if (flat)
      StandingStore.rewrite(spark, labelsDir(root), LabelSchema,
        df => withBkt(df.select("id", "cluster", "batch_id").distinct()),
        Seq("id_bkt"))
  }

  /** Start the maintenance stream over a pair stream. */
  def clusterStream(pairs: DataFrame, aCol: String, bCol: String,
                    root: String, checkpointDir: String,
                    compactEvery: Int = 16,
                    maxPairsPerBatch: Long = DefaultMaxPairsPerBatch): StreamingQuery =
    pairs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, aCol, bCol, root, batchId, maxPairsPerBatch)
        if (StandingStore.due(batchId, compactEvery))
          compact(batch.sparkSession, root)
      }
      .start()

  /** One micro-batch of pairs into the standing state (exposed directly so
    * batch jobs and specs can drive the identical code path).
    */
  def processBatch(batch: DataFrame, aCol: String, bCol: String,
                   root: String, batchId: Long,
                   maxPairsPerBatch: Long = DefaultMaxPairsPerBatch): Unit = {
    processBatchWithStats(batch, aCol, bCol, root, batchId, maxPairsPerBatch)
    ()
  }

  /** [[processBatch]] plus [[BatchStats]] telemetry. */
  def processBatchWithStats(batch: DataFrame, aCol: String, bCol: String,
                            root: String, batchId: Long,
                            maxPairsPerBatch: Long = DefaultMaxPairsPerBatch): BatchStats = {
    // upper bound: past Int.MaxValue - 1 the LIMIT clamp would silently
    // disarm the gate (and a >2^31-pair union-find has no business on a
    // driver anyway) — "raise the cap knowingly" stops where the driver does
    require(maxPairsPerBatch > 0 && maxPairsPerBatch < Int.MaxValue,
      s"maxPairsPerBatch must be in [1, ${Int.MaxValue - 1}]")
    if (batch.isEmpty) return BatchStats(0L, 0L, 0L, 0L)
    val spark = batch.sparkSession
    val p = batch.select(col(aCol).cast("long").as("a"),
        col(bCol).cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull)
      .distinct()
      // persisted: the gate's count job and the probe join both consume the
      // distinct — unpersisted, every micro-batch would pay the batch scan
      // and the distinct exchange TWICE
      .persist()
    try {
      // the hard gate BEFORE the collect — count at most cap+1 (the LIMIT
      // caps the count job's result collection, the real bound is the cap)
      val nPairs = p.limit(maxPairsPerBatch.toInt + 1).count()
      if (nPairs > maxPairsPerBatch) throw new IllegalStateException(
        s"StreamingClusters batch $batchId carries >$maxPairsPerBatch distinct " +
          "pairs — past maxPairsPerBatch, so the driver union-find is no longer " +
          "batch-bounded (a Trigger.AvailableNow backfill arrives as ONE batch). " +
          "Route the backlog through graft.ops.Dedup.dupClusters and seed the " +
          "label store from its output, or raise the cap knowingly.")
      processGated(p, root, batchId, nPairs)
    } finally { p.unpersist(); () }
  }

  private def processGated(p: DataFrame, root: String, batchId: Long,
                           nPairs: Long): BatchStats = {
    val spark = p.sparkSession
    // the batch's endpoint buckets (p is persisted; this job is O(batch)):
    // the probe needs labels ONLY for these ids, so read only their
    // id-range partitions — O(batch) listing and scan, not O(corpus)
    val bkts = p.select(explode(array(col("a"), col("b"))).as("id"))
      .select(call_function("div", col("id"), lit(LabelRangeWidth)).as("b"))
      .distinct().collect().map(_.getLong(0)).toSeq
    val labelStore =
      if (bkts.size <= MaxProbePartitions)
        StandingStore.readPartitions(spark, labelsDir(root), LabelSchema,
          "id_bkt", bkts)
      else StandingStore.read(spark, labelsDir(root), LabelSchema)
    val labels = labelStore.select(col("id"), col("cluster")).distinct()
    // one keyed probe for BOTH endpoints' current labels; null = first-seen
    val probed = p
      .join(labels.select(col("id").as("a"), col("cluster").as("ca")), Seq("a"), "left")
      .join(labels.select(col("id").as("b"), col("cluster").as("cb")), Seq("b"), "left")
      .collect() // batch-bounded driver state, gated by maxPairsPerBatch above
    val remap = closedRemap(spark, root)
    def resolve(c: Long): Long = remap.getOrElse(c, c)

    // min-root union-find over the batch's resolved clusters + new ids
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x // path compression
      while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    def union(x: Long, y: Long): Unit = {
      val rx = find(x); val ry = find(y)
      if (rx != ry) {
        if (rx < ry) parent(ry) = rx else parent(rx) = ry
      }
    }
    val newIds = scala.collection.mutable.LinkedHashSet.empty[Long]
    val existingClusters = scala.collection.mutable.LinkedHashSet.empty[Long]
    probed.foreach { r =>
      val a = r.getLong(r.fieldIndex("a")); val b = r.getLong(r.fieldIndex("b"))
      val ka = if (r.isNullAt(r.fieldIndex("ca"))) { newIds += a; a }
        else { val c = resolve(r.getLong(r.fieldIndex("ca"))); existingClusters += c; c }
      val kb = if (r.isNullAt(r.fieldIndex("cb"))) { newIds += b; b }
        else { val c = resolve(r.getLong(r.fieldIndex("cb"))); existingClusters += c; c }
      union(ka, kb)
    }
    import spark.implicits._
    val newLabels = newIds.toSeq.map(id => (id, find(id), batchId))
    val merges = existingClusters.toSeq
      .map(c => (c, find(c), batchId)).filter { case (c, r, _) => r != c }
    if (newLabels.nonEmpty) {
      // migrate a legacy FLAT label store BEFORE the first partitioned
      // append: id_bkt= subdirs landing beside root-level parquet files
      // make a MIXED layout whose full reads silently drop the root files
      // (Spark partition discovery ignores data files outside partition
      // dirs) — every historical id would probe first-seen and be
      // re-labeled, corrupting clusters forever. Same shim as
      // StreamingCoMovement.migrateFlatStore; the rewrite recomputes
      // id_bkt from id and rides the crash-safe swap.
      migrateFlatLabels(spark, root)
      StandingStore.append(withBkt(newLabels.toDF("id", "cluster", "batch_id")),
        labelsDir(root), Seq("id_bkt"))
    }
    if (merges.nonEmpty)
      StandingStore.append(merges.toDF("old_cluster", "new_cluster", "batch_id"),
        remapDir(root))
    // remapRows: what the NEXT read-time closure will collect — the rows
    // this batch saw plus the merge events it appended (the keys are
    // disjoint: a merge's old_cluster was a live root, never a remap key)
    BatchStats(pairs = nPairs, newLabels = newLabels.size.toLong,
      merges = merges.size.toLong, remapRows = remap.size.toLong + merges.size)
  }

  /** Remap table closed to its transitive roots, as a driver map (bounded
    * by merge events since the last compact — see the scaladoc).
    */
  private def closedRemap(spark: SparkSession, root: String): Map[Long, Long] = {
    val raw = StandingStore.read(spark, remapDir(root), RemapSchema)
      .select("old_cluster", "new_cluster").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def root0(c: Long): Long = {
      var r = c
      var hops = 0
      while (raw.contains(r)) {
        r = raw(r); hops += 1
        require(hops <= raw.size, s"remap cycle at $c — store corrupted")
      }
      r
    }
    raw.keys.map(k => k -> root0(k)).toMap
  }

  /** Current resolved labels: (id, cluster, is_canonical) — the same
    * contract as the batch resolver, so the two are interchangeable (and
    * spec-pinned equal on identical pair sets). Distinct collapses any
    * replay re-appends; the remap closure rides in as a broadcast join.
    */
  def resolvedLabels(spark: SparkSession, root: String): DataFrame = {
    val labels = StandingStore.read(spark, labelsDir(root), LabelSchema)
      .select(col("id"), col("cluster")).distinct()
    import spark.implicits._
    val rm = closedRemap(spark, root).toSeq.toDF("old_cluster", "new_cluster")
    labels.join(broadcast(rm), labels("cluster") === rm("old_cluster"), "left")
      .select(col("id"),
        coalesce(col("new_cluster"), col("cluster")).as("cluster"))
      .select(col("id"), col("cluster"),
        (col("id") === col("cluster")).as("is_canonical"))
  }

  /** Fold the remap chains into the label store and reset the remap store —
    * the growth bound. Order is load-bearing for crash safety: labels fold
    * FIRST (a crash after leaves stale remap rows that no longer match any
    * label cluster — harmless no-ops at read), remap clears second. Both
    * legs ride [[StandingStore.rewrite]]'s all-renames swap.
    */
  def compact(spark: SparkSession, root: String): Unit = {
    val rm = closedRemap(spark, root)
    if (rm.nonEmpty) {
      import spark.implicits._
      val rmDf = rm.toSeq.toDF("__old", "__new")
      // id_bkt recomputed from id (not carried): this is also the one-shot
      // migration path for a legacy FLAT label store — one compact() and
      // the store is id-range partitioned
      StandingStore.rewrite(spark, labelsDir(root), LabelSchema, df =>
        withBkt(df.join(broadcast(rmDf), df("cluster") === rmDf("__old"), "left")
          .select(col("id"),
            coalesce(col("__new"), col("cluster")).as("cluster"),
            col("batch_id"))
          .distinct()), Seq("id_bkt"))
    }
    StandingStore.rewrite(spark, remapDir(root), RemapSchema,
      df => df.filter(lit(false)))
  }

  /** Cluster-size summary off the resolved labels (monitoring surface). */
  def clusterSizes(spark: SparkSession, root: String): DataFrame =
    resolvedLabels(spark, root)
      .groupBy("cluster").agg(count(lit(1)).as("size"))

  /** Declared-output shape parity with the batch resolver, for joins that
    * expect the boolean column typed.
    */
  val OutputSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("cluster", LongType),
    StructField("is_canonical", BooleanType)))
}
