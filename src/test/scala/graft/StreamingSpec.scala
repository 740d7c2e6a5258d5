package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.{SessionTracks, StreamingCounters, StreamingDedup, StreamingJoin, StreamingRollup, StreamingTimers, StreamingTrajectory, StreamingUpsert}
import graft.ops.Multimodal

/** Streaming + multimodal specs: watermarked rollup via MemoryStream,
  * stateful gap-based trip segmentation, and the batched decode plumbing.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s"2025-01-01 $s:00")

  test("watermarked streaming hourly rollup emits finalized windows only") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val rolled = StreamingRollup.hourly(
      mem.toDF.toDF("user_id", "ts", "value"), "user_id", "ts", "value",
      res = 3, watermark = "1 hour")
    val q = rolled.writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts("10:05"), 10.0), (1L, ts("10:35"), 20.0))
      q.processAllAvailable()
      // watermark still at 10:35-1h → the 10:00 window is not final yet
      assert(spark.table("hourly_out").isEmpty)

      mem.addData((2L, ts("13:00"), 100.0)) // watermark → 12:00, closes 10:00
      q.processAllAvailable()
      val out = spark.table("hourly_out").collect()
      assert(out.length === 1)
      val r = out.head
      assert(r.getAs[Long]("uid") === 1L)
      assert(r.getAs[Long]("message_count") === 2L)
      assert(r.getAs[Double]("avg_pos") === 15.0)
      assert(r.getAs[Long]("cell") === 0L) // floor(15/62.5)
      assert(r.getAs[Int]("hr") === 10)
    } finally q.stop()
  }

  test("checkpoint restart: agg state + file-source offsets survive stop/start, exactly-once") {
    // THE streaming production claim: kill a query mid-flight, restart from
    // the checkpoint, and (a) pre-restart aggregation state still counts,
    // (b) already-processed input is not re-read, (c) each finalized window
    // appears exactly once in the sink.
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-restart").toString
    val (inDir, outDir, cpDir) = (root + "/in", root + "/out", root + "/cp")
    new java.io.File(inDir).mkdirs()
    val schema = StructType(Seq(StructField("user_id", LongType),
      StructField("ts", TimestampType), StructField("value", DoubleType)))
    def rollup() = StreamingRollup.hourly(
      StreamingRollup.fileStream(spark, inDir, schema),
      "user_id", "ts", "value", res = 3, watermark = "2 hours")
    def start() = rollup().writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").start()

    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir + "/a.csv"),
      "1,2025-01-01 10:00:00,10.0\n1,2025-01-01 10:20:00,30.0\n2,2025-01-01 10:05:00,50.0\n")
    val q1 = start()
    try {
      q1.processAllAvailable()
      // watermark = 10:20 − 2h → the 10:00 window is still open: nothing out
      assert(!new java.io.File(outDir).exists() ||
        spark.read.schema(rollup().schema).parquet(outDir).isEmpty)
    } finally q1.stop() // simulated crash/redeploy

    // more hour-10 mass arrives AFTER the restart, plus a watermark pusher
    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir + "/b.csv"),
      "1,2025-01-01 10:40:00,50.0\n9,2025-01-01 14:00:00,1.0\n")
    val q2 = start()
    try {
      q2.processAllAvailable()
      val out = spark.read.parquet(outDir)
        .select("uid", "hr", "message_count", "avg_pos")
        .as[(Long, Int, Long, Double)].collect().sortBy(_._1)
      // uid 1 count=3 ⇒ file A's two rows (pre-restart state) combined with
      // file B's one; avg over all three ⇒ state content, not just counts.
      // One row per (uid, window) ⇒ no replay of file A, no double emission.
      assert(out.toSeq === Seq((1L, 10, 3L, 30.0), (2L, 10, 1L, 50.0)),
        s"restart broke exactly-once or lost state: ${out.toSeq}")
    } finally q2.stop()
  }

  test("streaming materialized rollup: per-batch additive merge equals full recompute") {
    import graft.streaming.StreamingMatView
    import org.apache.spark.sql.functions.{col, count, lit, max, sum}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val snapDir = java.nio.file.Files.createTempDirectory("graft-mv").toString + "/t"
    val cpDir = java.nio.file.Files.createTempDirectory("graft-mv-cp").toString
    val mem = MemoryStream[(Long, Long)]
    val q = StreamingMatView.maintain(
        mem.toDF.toDF("user_id", "cents"), snapDir, cpDir,
        Seq("user_id"), Seq("n", "s"), maxCols = Seq("mx")) { b =>
      b.groupBy("user_id").agg(count(lit(1)).as("n"),
        sum(col("cents")).as("s"), max(col("cents")).as("mx"))
    }
    try {
      mem.addData((1L, 10L), (1L, 20L), (2L, 5L))
      q.processAllAvailable()
      mem.addData((1L, 7L), (3L, 100L))
      q.processAllAvailable()
      val snap = spark.read.parquet(snapDir)
        .select("user_id", "n", "s", "mx")
        .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
      assert(snap === Seq((1L, 3L, 37L, 20L), (2L, 1L, 5L, 5L),
        (3L, 1L, 100L, 100L)),
        "two-batch maintained rollup must equal the full recompute")
      assert(StreamingMatView.appliedBatchId(spark, snapDir) >= 1L,
        "the applied-batch marker must swap in with the data")
    } finally q.stop()
  }

  test("stream-static enrichment: each batch broadcast-joins the dim, left rows kept") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val out = StreamingRollup.enrichWithDim(
      mem.toDF.toDF("user_id", "value"), dim, Seq("user_id"), Seq("tier"))
    val q = out.writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, 10.0), (3L, 30.0))
      q.processAllAvailable()
      mem.addData((2L, 20.0))
      q.processAllAvailable()
      val rows = spark.table("enrich_out")
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          Option(r.getString(2)))).sortBy(_._1)
      assert(rows.toSeq === Seq(
        (1L, 10.0, Some("gold")),
        (2L, 20.0, Some("silver")),
        (3L, 30.0, None)))  // unmatched fact row survives the left join
    } finally q.stop()
  }

  test("session_window rollup merges gap-close events, splits on the gap") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val sessions = StreamingRollup.sessionized(
      mem.toDF.toDF("user_id", "ts", "value"), "user_id", "ts", "value",
      gap = "10 minutes", watermark = "1 hour")
    val q = sessions.writeStream.format("memory").queryName("session_out")
      .outputMode("append").start()
    try {
      // 10:00 + 10:05 merge (within gap); 10:30 starts a second session
      mem.addData((1L, ts("10:00"), 10.0), (1L, ts("10:05"), 20.0),
        (1L, ts("10:30"), 30.0))
      q.processAllAvailable()
      mem.addData((2L, ts("13:00"), 0.0)) // advance watermark → close both
      q.processAllAvailable()
      val out = spark.table("session_out")
        .filter(col("uid") === 1L).orderBy("session_start").collect()
      assert(out.length === 2)
      assert(out(0).getAs[Long]("n_events") === 2L)
      assert(out(0).getAs[Double]("avg_pos") === 15.0)
      // session end = last event + gap (merged window extends per event)
      assert(out(0).getAs[Timestamp]("session_end") === ts("10:15"))
      assert(out(1).getAs[Long]("n_events") === 1L)
      assert(out(1).getAs[Timestamp]("session_end") === ts("10:40"))
    } finally q.stop()
  }

  test("batch session_window: an event exactly at last-event + gap still merges") {
    // pins the boundary semantics the session_agg oracle mirrors: break on
    // gap EXCEEDED (>), not reached — 10:19 sits exactly at 10:09 + 10 min
    // and merges; 10:29:01 exceeds the extended end and starts anew
    val df = Seq(
      (1L, ts("10:00")), (1L, ts("10:09")),
      (1L, ts("10:19")),
      (1L, Timestamp.valueOf("2025-01-01 10:29:01"))
    ).toDF("user_id", "ts")
    val out = df.groupBy(col("user_id"), session_window(col("ts"), "10 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy("w.start")
      .select(col("w.start").cast("string"), col("n")).as[(String, Long)].collect()
    assert(out.length === 2)
    assert(out.map(_._2).toSeq === Seq(3L, 1L))
  }

  test("streaming dedup drops repeated fingerprints within the watermark") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String)]
    val deduped = StreamingDedup.dedupStream(
      mem.toDF.toDF("doc_id", "ts", "text"), "text", "ts", watermark = "1 hour")
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    try {
      // fingerprint canonicalizes case + whitespace: doc 2 dups doc 1
      mem.addData(
        (1L, ts("10:00"), "Same  Text"),
        (2L, ts("10:05"), "same text"),
        (3L, ts("10:10"), "different"))
      q.processAllAvailable()
      mem.addData((4L, ts("10:20"), "same text")) // still within horizon → drop
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id").as[Long]
        .collect().sorted.toSeq
      assert(ids === Seq(1L, 3L)) // first arrival wins; 2 and 4 suppressed
      // lineage column present and canonical across the kept rows
      assert(spark.table("dedup_out").select("fp").distinct().count() === 2)
    } finally q.stop()
  }

  test("stateful trip segmentation splits on gaps, keeps open tail in state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SessionTracks.Point]
    val trips = SessionTracks.trips(mem.toDS(), gapMinutes = 60)
    val q = trips.writeStream.format("memory").queryName("trips_out")
      .outputMode("append").start()
    try {
      mem.addData(
        SessionTracks.Point(1L, ts("00:00"), 1.0),
        SessionTracks.Point(1L, ts("00:30"), 2.0),
        SessionTracks.Point(1L, ts("03:00"), 3.0), // gap > 60min → closes trip 1
        SessionTracks.Point(2L, ts("00:00"), 9.0))
      q.processAllAvailable()
      val out = spark.table("trips_out").as[SessionTracks.Trip].collect()
      assert(out.length === 1) // uid 1 first trip closed; tails stay open
      val t = out.head
      assert(t.uid === 1L && t.nPoints === 2)
      assert(t.positions === Seq(1.0, 2.0))

      // a further point continues uid 1's open trip, then a gap closes it
      mem.addData(SessionTracks.Point(1L, ts("03:20"), 4.0),
        SessionTracks.Point(1L, ts("08:00"), 5.0))
      q.processAllAvailable()
      val out2 = spark.table("trips_out").as[SessionTracks.Trip].collect()
      assert(out2.length === 2)
      val t2 = out2.maxBy(_.startTs.getTime)
      assert(t2.nPoints === 2 && t2.positions === Seq(3.0, 4.0))
    } finally q.stop()
  }

  test("never-silent vessel: open-trip state is force-flushed at maxOpenPoints") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[SessionTracks.Point]
    // 25 gap-free points, cap 10 → two forced 10-point trips; 5 stay in state
    val trips = SessionTracks.trips(mem.toDS(), gapMinutes = 60, maxOpenPoints = 10)
    val q = trips.writeStream.format("memory").queryName("trips_capped")
      .outputMode("append").start()
    try {
      mem.addData((0 until 25).map(i =>
        SessionTracks.Point(1L, ts(f"${i / 60}%02d:${i % 60}%02d"), i.toDouble)): _*)
      q.processAllAvailable()
      val out = spark.table("trips_capped").as[SessionTracks.Trip].collect()
        .sortBy(_.startTs.getTime)
      assert(out.length === 2)
      assert(out.forall(_.nPoints === 10))
      assert(out(0).positions === (0 until 10).map(_.toDouble))
      assert(out(1).positions === (10 until 20).map(_.toDouble))

      // the 5-point tail is still open state: a later gap-free point extends
      // it; a big gap then closes a 6-point trip — proving the tail survived
      mem.addData(SessionTracks.Point(1L, ts("00:25"), 25.0),
        SessionTracks.Point(1L, ts("09:00"), 99.0))
      q.processAllAvailable()
      val out2 = spark.table("trips_capped").as[SessionTracks.Trip].collect()
        .sortBy(_.startTs.getTime)
      assert(out2.length === 3)
      assert(out2.last.nPoints === 6)
      assert(out2.last.positions === Seq(20.0, 21.0, 22.0, 23.0, 24.0, 25.0))
    } finally q.stop()
  }

  test("stream-stream interval join pairs events within the lag bound only") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val pings = MemoryStream[(Long, Timestamp, Double)]
    val alerts = MemoryStream[(Long, Timestamp, String)]
    val joined = StreamingJoin.intervalJoin(
      pings.toDF.toDF("uid", "ping_ts", "pos"),
      alerts.toDF.toDF("uid", "alert_ts", "kind"),
      key = "uid", leftTs = "ping_ts", rightTs = "alert_ts",
      maxLag = "10 minutes", watermark = "1 hour")
    val q = joined.writeStream.format("memory").queryName("sj_out")
      .outputMode("append").start()
    try {
      pings.addData((1L, ts("10:00"), 5.0), (2L, ts("10:00"), 7.0))
      alerts.addData(
        (1L, ts("10:05"), "in_bound"),   // 5 min after ping 1 → match
        (1L, ts("10:30"), "too_late"),   // 30 min after → no match
        (2L, ts("09:55"), "before"),     // before the ping → no match
        (3L, ts("10:02"), "other_key"))  // key never pings → no match
      q.processAllAvailable()
      val out = spark.table("sj_out")
        .select("uid", "pos", "kind").as[(Long, Double, String)].collect()
      assert(out.toSeq === Seq((1L, 5.0, "in_bound")))

      // a second ping matches the previously-buffered alert (right-side
      // state within watermark + lag is retained and re-probed)
      pings.addData((1L, ts("10:25"), 6.0))
      q.processAllAvailable()
      val out2 = spark.table("sj_out")
        .select("uid", "pos", "kind").as[(Long, Double, String)].collect()
      assert(out2.toSet === Set((1L, 5.0, "in_bound"), (1L, 6.0, "too_late")))
    } finally q.stop()
  }

  test("streaming curation pipeline: dedup + quality filter compose to a parquet sink") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF.toDF("doc_id", "ts", "text")
    // online suppression → heuristic filter → append-mode file sink: the
    // full streaming half of the curation ladder in one query
    val curated = graft.ops.Curation
      .qualityFilter(StreamingDedup.dedupStream(docs, "text", "ts"),
        "doc_id", "text")
      .filter(col("keep"))
    val outDir = java.nio.file.Files.createTempDirectory("graft-scur-out").toString
    val cpDir = java.nio.file.Files.createTempDirectory("graft-scur-cp").toString
    val q = curated.writeStream.format("parquet")
      .option("path", outDir).option("checkpointLocation", cpDir)
      .outputMode("append").start()
    try {
      in.addData(
        (1L, ts("10:00"), "the cat and a dog is here today"), // survives
        (2L, ts("10:01"), "the cat and a dog is here today"), // exact dup → dropped
        (3L, ts("10:02"), "x"),                               // fails quality
        (4L, ts("10:03"), "the fish and a bird is also here")) // survives
      q.processAllAvailable()
      val got = spark.read.parquet(outDir).select("doc_id").as[Long]
        .collect().sorted
      assert(got.toSeq === Seq(1L, 4L))
    } finally q.stop()
  }

  test("streaming near-dup: store probe + in-batch keep-first across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF.toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-neardup").toString
    val (store, out, cp) = (root + "/store", root + "/out", root + "/cp")
    // audit path pinned explicitly (r19 flipped the production defaults):
    // this scenario's collision set is md5-MinHash-family-specific and the
    // store is read back as a flat dir
    val q = graft.streaming.StreamingNearDup.nearDupStream(
      docs, "doc_id", "text", store, out, cp, fast = false,
      bandPartitionedStore = false)
    try {
      in.addData((1L, "alpha beta gamma delta epsilon zeta eta"),
        (2L, "completely different words about ships in the harbor tonight"))
      q.processAllAvailable()
      val b1 = spark.read.parquet(out)
        .select("doc_id", "dup_candidate").as[(Long, Boolean)].collect().toMap
      assert(b1 === Map(1L -> false, 2L -> false), "first batch is all-new")

      in.addData(
        (3L, "alpha beta gamma delta epsilon zeta theta"), // near-dups doc 1
        (4L, "an entirely fresh subject with nothing shared anywhere here"),
        (5L, "one two three four five six seven eight"),   // 5 ≈ 6 in-batch
        (6L, "one two three four five six seven nine"))
      q.processAllAvailable()
      val all = spark.read.parquet(out)
        .select("doc_id", "dup_candidate").as[(Long, Boolean)].collect().toMap
      assert(all(3L), "batch doc colliding with the standing store is flagged")
      assert(!all(4L), "unique doc survives")
      assert(!all(5L) && all(6L), "in-batch pair keeps the lower id only")
      val stored = spark.read.parquet(store).select("doc_id")
        .distinct().as[Long].collect().toSet
      assert(stored === Set(1L, 2L, 4L, 5L),
        s"only kept docs' signatures enter the store, got $stored")
    } finally q.stop()
  }

  test("streaming near-dup PRODUCTION path (fast=true): same keep-first semantics, long-bucket store") {
    // the fast path swaps the md5-string audit signature for the integer
    // MinHash kernel + xxhash64 band buckets; the stream plumbing (store
    // probe, keep-first flags, store append) must behave identically —
    // only the bucket column type changes. Different hash family ⇒ the
    // exact collision sets can differ from the audit path, so the
    // scenario uses a verbatim-identical shingle set for the dup case
    // (same shingles ⇒ same signature under ANY MinHash family).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF.toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-neardup-f").toString
    val (store, out, cp) = (root + "/store", root + "/out", root + "/cp")
    val q = graft.streaming.StreamingNearDup.nearDupStream(
      docs, "doc_id", "text", store, out, cp, fast = true)
    try {
      in.addData((1L, "alpha beta gamma delta epsilon zeta eta"),
        (2L, "completely different words about ships in the harbor tonight"))
      q.processAllAvailable()
      in.addData(
        (3L, "alpha beta gamma delta epsilon zeta eta"), // verbatim doc 1
        (4L, "an entirely fresh subject with nothing shared anywhere here"))
      q.processAllAvailable()
      val all = spark.read.parquet(out)
        .select("doc_id", "dup_candidate").as[(Long, Boolean)].collect().toMap
      assert(!all(1L) && !all(2L), "first batch is all-new")
      assert(all(3L), "identical shingles collide against the standing store")
      assert(!all(4L), "unique doc survives")
      val st = spark.read.parquet(store)
      assert(st.schema("bucket").dataType ===
        org.apache.spark.sql.types.LongType,
        "production store carries 8-byte integer buckets")
      assert(st.select("doc_id").distinct().as[Long].collect().toSet ===
        Set(1L, 2L, 4L), "only kept docs' signatures enter the store")
    } finally q.stop()
  }

  test("streaming near-dup band-partitioned store: same flags as flat, partitioned layout, pruned read, compaction preserves layout") {
    // bandPartitionedStore=true must change ONLY the store layout: same
    // keep-first flags, same kept-signature ROWS (modulo file layout).
    // compactEvery=1 forces a compaction after every batch so the
    // partition-preserving rewrite is exercised, not just the append.
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    def run(partitioned: Boolean): (Map[Long, Boolean], Set[(Long, Int, Long)], String) = {
      val in = MemoryStream[(Long, String)]
      val root = java.nio.file.Files.createTempDirectory(
        s"graft-neardup-bp-$partitioned").toString
      val (store, out, cp) = (root + "/store", root + "/out", root + "/cp")
      val q = graft.streaming.StreamingNearDup.nearDupStream(
        in.toDF.toDF("doc_id", "text"), "doc_id", "text", store, out, cp,
        compactEvery = 1, fast = true, bandPartitionedStore = partitioned)
      try {
        in.addData((1L, "alpha beta gamma delta epsilon zeta eta"),
          (2L, "completely different words about ships in the harbor tonight"))
        q.processAllAvailable()
        in.addData(
          (3L, "alpha beta gamma delta epsilon zeta eta"), // verbatim doc 1
          (4L, "an entirely fresh subject with nothing shared anywhere here"))
        q.processAllAvailable()
        val flags = spark.read.parquet(out)
          .select("doc_id", "dup_candidate").as[(Long, Boolean)].collect().toMap
        val rows = spark.read.parquet(store)
          .select("doc_id", "band", "bucket").as[(Long, Int, Long)]
          .collect().toSet
        (flags, rows, store)
      } finally q.stop()
    }
    val (flatFlags, flatRows, _) = run(partitioned = false)
    val (partFlags, partRows, partStore) = run(partitioned = true)
    assert(partFlags === flatFlags, "layout must not change decisions")
    assert(partRows === flatRows, "layout must not change store content")
    // layout proof: hive-style band=N dirs survive append AND compaction
    val dirs = new java.io.File(partStore).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("band=")).sorted
    assert(dirs.nonEmpty && dirs.forall(_.matches("band=\\d+")),
      s"expected band=N partition dirs, got ${dirs.toSeq}")
    // pruned-read equivalence against the plain read
    val sigSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("band",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType)))
    val pruned = graft.streaming.StandingStore.readPartitions(
      spark, partStore, sigSchema, "band", 0 until 4)
      .select("doc_id", "band", "bucket").as[(Long, Int, Long)].collect().toSet
    assert(pruned === partRows, "pruned read must see the whole store")
  }

  test("streaming near-dup r19 defaults: a legacy FLAT fast-path store auto-migrates to band= dirs, history keeps suppressing") {
    // the r19 default flip (bandPartitionedStore = true) must not strand
    // existing flat deployments: the first batch's append detects root-level
    // flat files and rewrites the store partitionBy(band) through the
    // crash-safe swap (the comove r15 precedent) — history intact, later
    // pruned reads see it, and a pre-migration signature still flags a
    // post-migration near-copy
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val root = java.nio.file.Files.createTempDirectory("graft-nd-mig").toString
    val (store, out, cp) = (root + "/store", root + "/out", root + "/cp")
    // phase 1: legacy flat store written by a pre-r19 fast-path stream
    val q1 = graft.streaming.StreamingNearDup.nearDupStream(
      in.toDF.toDF("doc_id", "text"), "doc_id", "text", store, out, cp,
      fast = true, bandPartitionedStore = false)
    try {
      in.addData((1L, "alpha beta gamma delta epsilon zeta eta"))
      q1.processAllAvailable()
    } finally q1.stop()
    val rootDir = new java.io.File(store)
    assert(rootDir.listFiles.exists(f =>
      f.isFile && f.getName.endsWith(".parquet")), "precondition: flat files")
    // phase 2: restart on the r19 defaults (band-partitioned)
    val in2 = MemoryStream[(Long, String)]
    val q2 = graft.streaming.StreamingNearDup.nearDupStream(
      in2.toDF.toDF("doc_id", "text"), "doc_id", "text", store, out,
      root + "/cp2")
    try {
      in2.addData(
        (2L, "alpha beta gamma delta epsilon zeta eta"), // verbatim doc 1
        (3L, "an entirely fresh subject with nothing shared anywhere here"))
      q2.processAllAvailable()
    } finally q2.stop()
    val flags = spark.read.parquet(out)
      .select("doc_id", "dup_candidate").as[(Long, Boolean)].collect().toMap
    assert(!flags(1L) && flags(2L) && !flags(3L),
      s"pre-migration history must still suppress: $flags")
    assert(!rootDir.listFiles.exists(f =>
      f.isFile && f.getName.endsWith(".parquet")),
      "flat files must be rewritten into the partitioned layout")
    val bandDirs = rootDir.listFiles.filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("band=")).sorted
    assert(bandDirs.nonEmpty && bandDirs.forall(_.matches("band=\\d+")),
      s"expected band=N dirs post-migration, got ${bandDirs.toSeq}")
    // migrated history + new appends both present in the partitioned read
    val sigSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("band",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("bucket",
        org.apache.spark.sql.types.LongType)))
    val stored = graft.streaming.StandingStore.readPartitions(
      spark, store, sigSchema, "band", 0 until 4)
      .select("doc_id").distinct().as[Long].collect().toSet
    assert(stored === Set(1L, 3L),
      s"store must hold migrated doc 1 + newly kept doc 3, got $stored")
  }

  test("scrub store read survives an uncommitted _temporary-only store dir") {
    // a crash during the very first store write leaves storeDir existing
    // with no parquet footers; readStore must yield an empty frame with the
    // known schema (NOT fail schema inference), so the restart proceeds
    val root = java.nio.file.Files.createTempDirectory("graft-scrub-crash")
    val store = root.resolve("store")
    java.nio.file.Files.createDirectories(store.resolve("_temporary/0"))
    val df = graft.streaming.StreamingScrub.readStore(spark, store.toString)
    assert(df.schema.fieldNames.toSeq === Seq("seg_key"))
    assert(df.count() === 0L)
  }

  test("near-dup signature store read survives the same first-write crash (shared StandingStore)") {
    // regression: this readStore used to INFER the schema, so the
    // footer-less dir wedged every restart — the shared StandingStore read
    // must make all standing stores equally crash-tolerant
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-nd-crash")
    val store = root.resolve("store")
    java.nio.file.Files.createDirectories(store.resolve("_temporary/0"))
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("band", IntegerType), StructField("bucket", StringType)))
    val df = graft.streaming.StreamingNearDup.readStore(
      spark, store.toString, schema)
    assert(df.schema === schema)
    assert(df.count() === 0L)
  }

  test("streaming geofence emits enter/switch/exit transitions across micro-batches") {
    import graft.streaming.StreamingGeofence
    import graft.streaming.StreamingGeofence.{Ping, Transition}
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val zones = Seq(("a", 0.0, 1.0, 0.0, 1.0), ("b", 1.0, 2.0, 1.0, 2.0))
    val in = MemoryStream[Ping]
    val q = StreamingGeofence.transitions(in.toDS(), zones)
      .writeStream.format("memory").queryName("geo_out")
      .outputMode("append").start()
    try {
      // batch 1: outside → a (enter), stays in a (silent), a → b (switch)
      in.addData(
        Ping(1L, ts("10:00"), 5.0, 5.0),
        Ping(1L, ts("10:01"), 0.5, 0.5),
        Ping(1L, ts("10:02"), 0.6, 0.6),
        Ping(1L, ts("10:03"), 1.5, 1.5))
      q.processAllAvailable()
      // batch 2: still b (silent) — state crossed the batch boundary —
      // then out (exit); a straggler OLDER than state must not regress
      in.addData(
        Ping(1L, ts("10:04"), 1.6, 1.6),
        Ping(1L, ts("10:05"), 9.0, 9.0),
        Ping(1L, ts("10:01"), 0.5, 0.5))
      q.processAllAvailable()
      // batch 3: an at-least-once REDELIVERY of the state-setting ping at
      // its exact timestamp but a different zone — with (zone, ts) state
      // this is indistinguishable from a genuine same-ts reading, so the
      // monotone contract drops it: no spurious transition, no state
      // ping-pong on repeated redelivery
      in.addData(Ping(1L, ts("10:05"), 0.5, 0.5))
      q.processAllAvailable()
      in.addData(Ping(1L, ts("10:05"), 0.5, 0.5))
      q.processAllAvailable()
      val got = spark.table("geo_out").as[Transition]
        .collect().sortBy(_.ts.getTime)
        .map(t => (t.from_zone, t.to_zone, t.kind)).toSeq
      assert(got === Seq(("", "a", "enter"), ("a", "b", "switch"),
        ("b", "", "exit")),
        s"equal-ts redeliveries must be no-ops — replay idempotence: $got")
    } finally q.stop()
  }

  test("geofence fold is a pure function of the batch's row SET — same-ts ties ordered by position") {
    // two pings share one timestamp but sit in different zones; the update
    // fold must order them (ts, lat, lon) regardless of arrival order, so
    // a retried micro-batch delivering rows in any iterator order emits
    // the SAME transition sequence and final state
    import graft.streaming.StreamingGeofence
    import graft.streaming.StreamingGeofence.{Ping, ZoneState}
    val zones = Seq(("a", 0.0, 1.0, 0.0, 1.0), ("b", 1.0, 2.0, 1.0, 2.0))
    val p1 = Ping(1L, ts("10:00"), 0.5, 0.5)  // zone a
    val p2 = Ping(1L, ts("10:00"), 1.5, 1.5)  // zone b, same ts
    val p3 = Ping(1L, ts("10:01"), 0.6, 0.6)  // zone a
    def run(order: Seq[Ping]) = {
      val st = org.apache.spark.sql.streaming.TestGroupState.create[ZoneState](
        org.apache.spark.api.java.Optional.empty[ZoneState](),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout(),
        0L, org.apache.spark.api.java.Optional.empty[Long](),
        hasTimedOut = false)
      val out = StreamingGeofence.update(zones)(1L, order.iterator, st).toSeq
      (out.map(t => (t.from_zone, t.to_zone, t.kind)), st.getOption)
    }
    val (seqA, stateA) = run(Seq(p1, p2, p3))
    val (seqB, stateB) = run(Seq(p2, p1, p3))
    val (seqC, stateC) = run(Seq(p3, p2, p1))
    assert(seqA === seqB && seqB === seqC,
      s"retry-order independence: $seqA vs $seqB vs $seqC")
    assert(stateA === stateB && stateB === stateC, "final state identical")
    assert(seqA === Seq(("", "a", "enter"), ("a", "b", "switch"),
      ("b", "a", "switch")), s"fold follows the (ts, lat, lon) order: $seqA")
  }

  test("a legacy FLAT presence store migrates to dt-partitioned on first touch") {
    // a store written before the partitioned layout holds root-level
    // parquet files with dt as a data column; the first batch must rewrite
    // it partitioned BEFORE appending, or the mixed layout wedges reads —
    // and the migrated history must still pair with new arrivals
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = java.sql.Date.valueOf("2025-01-01")
    val root = java.nio.file.Files.createTempDirectory("graft-migrate").toString
    val store = root + "/store"
    Seq((1L, d, 1, "X")).toDF("uid", "dt", "hr", "cell")
      .write.parquet(store) // legacy flat layout
    val in = MemoryStream[(Long, java.sql.Date, Int, String)]
    val q = graft.streaming.StreamingCoMovement.pairHourStream(
      in.toDF.toDF("uid", "dt", "hr", "cell"),
      store, root + "/out", root + "/cp")
    try {
      in.addData((2L, d, 1, "X")); q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.read.parquet(root + "/out")
      .select("uid_a", "uid_b").as[(Long, Long)].collect().toSeq
    assert(pairs === Seq((1L, 2L)),
      "the migrated flat history must surface the cross-era pair")
    assert(new java.io.File(store).listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("dt=")),
      "the store is partitioned after migration")
    assert(!new java.io.File(store).listFiles()
      .exists(f => f.isFile && f.getName.endsWith(".parquet")),
      "no root-level legacy files remain to wedge the layout")
  }

  test("streaming scrub ≡ batch on RANDOM corpora with RANDOM batch splits (compacting)") {
    // the deterministic two-batch fixture pins the contract; this drives it
    // on corpora with no hand-placed structure — random repeated phrases,
    // random split points, compaction after every batch — and demands
    // bit-equality with the batch operator on every one
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    for (seed <- Seq(19L, 83L)) {
      val rnd = new scala.util.Random(seed)
      val phrases = Vector("a b c", "d e f", "g h i", "j k l")
      val docs = (1L to 9L).map { id =>
        id -> (1 to (1 + rnd.nextInt(3)))
          .map(_ => phrases(rnd.nextInt(phrases.size))).mkString(" ")
      }
      val cut1 = 1 + rnd.nextInt(7)
      val cut2 = cut1 + 1 + rnd.nextInt(9 - cut1)
      val batches = Seq(docs.take(cut1), docs.slice(cut1, cut2), docs.drop(cut2))
        .filter(_.nonEmpty)
      val in = MemoryStream[(Long, String)]
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-randscrub-$seed").toString
      val q = graft.streaming.StreamingScrub.scrubStream(
        in.toDF.toDF("doc_id", "text"), "doc_id", "text",
        root + "/store", root + "/out", root + "/cp",
        segTokens = 3, compactEvery = 1)
      try {
        batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      } finally q.stop()
      val streamed = spark.read.parquet(root + "/out")
        .orderBy("doc_id").select("doc_id", "n_segs", "n_kept", "clean_text")
        .as[(Long, Long, Long, String)].collect().toSeq
      val batch = graft.ops.Dedup
        .scrubSegments(docs.toDF("doc_id", "text"), "doc_id", "text", 3)
        .orderBy("doc_id").select("doc_id", "n_segs", "n_kept", "clean_text")
        .as[(Long, Long, Long, String)].collect().toSeq
      assert(streamed === batch,
        s"seed=$seed cuts=($cut1,$cut2): random corpus must replay batch-identically")
    }
  }

  test("store compaction squeezes replay duplicates and resets file count without changing keeps") {
    // a torn replay appends the same digest again; compaction must bound the
    // store at its DISTINCT digests (a triple-appended digest doesn't triple
    // the store) and reset the file count that append-per-batch accretes —
    // while the polluted store still suppresses the segment it names
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-compact").toString
    val (store, out, cp) = (root + "/store", root + "/out", root + "/cp")
    val dup = spark.range(1)
      .select(unhex(md5(lit("a b c"))).as("seg_key"))
    (1 to 3).foreach(_ => dup.write.mode("append").parquet(store))
    assert(spark.read.parquet(store).count() === 3L)
    def dataFiles(): Int = {
      val d = new java.io.File(store)
      d.listFiles.count(f => f.getName.endsWith(".parquet"))
    }
    assert(dataFiles() >= 3, "each append lands at least one file")
    val in = MemoryStream[(Long, String)]
    val q = graft.streaming.StreamingScrub.scrubStream(
      in.toDF.toDF("doc_id", "text"), "doc_id", "text", store, out, cp,
      segTokens = 3, compactEvery = 1)
    try {
      in.addData((1L, "a b c d e f"), (2L, "x y z"))
      q.processAllAvailable()
    } finally q.stop()
    // the seeded digest suppressed doc 1's first segment despite the dupes
    val cleaned = spark.read.parquet(out).orderBy("doc_id")
      .select("doc_id", "clean_text").as[(Long, String)].collect().toSeq
    assert(cleaned === Seq((1L, "d e f"), (2L, "x y z")))
    // post-compaction store: exactly the distinct digests (abc, def, xyz),
    // no duplicate rows, and the flat legacy pile-up is MIGRATED — the
    // r19 tiered layout folds root-level flat files into the bucketed
    // base on first compaction and removes them
    val st = graft.streaming.StreamingScrub.readStore(spark, store)
    assert(st.count() === 3L, "row count == distinct digests after compaction")
    assert(st.count() === st.distinct().count())
    assert(dataFiles() === 0,
      s"legacy flat files must be folded into the base, got ${dataFiles()}")
    def zoneFiles(zone: String): Int = {
      val d = new java.io.File(store, zone)
      if (!d.isDirectory) 0
      else {
        def walk(f: java.io.File): Int =
          if (f.isFile) { if (f.getName.endsWith(".parquet")) 1 else 0 }
          else if (f.isDirectory) f.listFiles.map(walk).sum
          else 0
        walk(d)
      }
    }
    assert(zoneFiles("delta") === 0,
      "compaction must drain the delta zone's merged files")
    val baseFiles = zoneFiles("base")
    assert(baseFiles >= 1 && baseFiles <= 3,
      s"base holds one file per non-empty digest bucket, got $baseFiles")
  }

  test("a compaction swap interrupted between delete and rename heals on the next read") {
    // crash window: the snapshot was fully written, the store deleted, the
    // rename never ran — readStore must promote the snapshot (it held the
    // complete distinct set at swap time; nothing appends concurrently)
    val root = java.nio.file.Files.createTempDirectory("graft-heal").toString
    val store = root + "/store"
    spark.range(2).select(unhex(md5(col("id").cast("string"))).as("seg_key"))
      .write.parquet(store + ".compact")
    val df = graft.streaming.StreamingScrub.readStore(spark, store)
    assert(df.count() === 2L, "the snapshot's digests survive the crash")
    assert(new java.io.File(store).isDirectory,
      "the snapshot is promoted in place so later appends extend it")
    assert(!new java.io.File(store + ".compact").exists,
      "no stale snapshot is left to shadow future swaps")
  }

  test("compact() itself heals an interrupted swap — recovery doesn't depend on read-first") {
    // same crash window, but the next touch is a COMPACT, not a read: it
    // must promote the stranded snapshot first, not no-op and leave the
    // history to be shadowed by the next append
    import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
    val root = java.nio.file.Files.createTempDirectory("graft-heal2").toString
    val store = root + "/store"
    val schema = StructType(Seq(StructField("seg_key", BinaryType)))
    spark.range(3).select(unhex(md5(col("id").cast("string"))).as("seg_key"))
      .write.parquet(store + ".compact")
    graft.streaming.StandingStore.compact(spark, store, schema)
    assert(spark.read.schema(schema).parquet(store).count() === 3L,
      "the stranded snapshot's full history survives a direct compact")
    assert(!new java.io.File(store + ".compact").exists)
  }

  test("all-renames swap: crash between the two renames — snapshot wins, .old dropped") {
    // window: store renamed to <store>.old, snapshot complete, second rename
    // never ran. heal must prefer the snapshot (complete at swap time) and
    // drop the .old side — NOT resurrect the pre-compact pile
    import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
    val root = java.nio.file.Files.createTempDirectory("graft-heal3").toString
    val store = root + "/store"
    val schema = StructType(Seq(StructField("seg_key", BinaryType)))
    // .old holds the pre-compact triple-appended pile (3 dupes of 1 digest)
    val dup = spark.range(1).select(unhex(md5(lit("k"))).as("seg_key"))
    (1 to 3).foreach(_ => dup.write.mode("append").parquet(store + ".old"))
    // the snapshot holds the distinct set
    dup.write.parquet(store + ".compact")
    val df = graft.streaming.StandingStore.read(spark, store, schema)
    assert(df.count() === 1L, "the distinct snapshot is promoted, not the pile")
    assert(new java.io.File(store).isDirectory)
    assert(!new java.io.File(store + ".old").exists, ".old is dropped")
    assert(!new java.io.File(store + ".compact").exists)
  }

  test("all-renames swap: crash after promotion but before the .old delete — store kept") {
    // window: snapshot already renamed into place, the orphan .old remains.
    // heal must keep the store authoritative and just drop .old
    import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
    val root = java.nio.file.Files.createTempDirectory("graft-heal4").toString
    val store = root + "/store"
    val schema = StructType(Seq(StructField("seg_key", BinaryType)))
    spark.range(2).select(unhex(md5(col("id").cast("string"))).as("seg_key"))
      .write.parquet(store)
    spark.range(5).select(unhex(md5(col("id").cast("string"))).as("seg_key"))
      .write.parquet(store + ".old")
    val df = graft.streaming.StandingStore.read(spark, store, schema)
    assert(df.count() === 2L, "the promoted store stays authoritative")
    assert(!new java.io.File(store + ".old").exists, ".old is dropped")
  }

  test("append() heals an interrupted swap first — replayed write-only batches can't shadow the snapshot") {
    // window: store renamed to <store>.old, snapshot complete, second rename
    // never ran — and the next touch is an APPEND (a replayed micro-batch
    // whose processor writes before it reads). Without heal-on-append the
    // append would recreate the store slot with only the batch's rows; the
    // NEXT heal, seeing both .old and a store, would drop .old and let a
    // later rewrite overwrite the stranded snapshot — full history lost.
    import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
    val root = java.nio.file.Files.createTempDirectory("graft-heal5").toString
    val store = root + "/store"
    val schema = StructType(Seq(StructField("seg_key", BinaryType)))
    // .old = the pre-swap pile; snapshot = the complete 4-digest history
    spark.range(1).select(unhex(md5(lit("k"))).as("seg_key"))
      .write.parquet(store + ".old")
    spark.range(4).select(unhex(md5(col("id").cast("string"))).as("seg_key"))
      .write.parquet(store + ".compact")
    // the replayed batch appends one NEW digest without reading first
    graft.streaming.StandingStore.append(
      spark.range(1).select(unhex(md5(lit("new"))).as("seg_key")), store)
    val df = graft.streaming.StandingStore.read(spark, store, schema)
    assert(df.count() === 5L,
      "snapshot history (4) + the replayed batch (1) — nothing shadowed")
    assert(!new java.io.File(store + ".old").exists, ".old is dropped")
    assert(!new java.io.File(store + ".compact").exists)
  }

  test("streaming scrub ≡ batch scrubSegments on an id-ordered two-batch replay") {
    // the equivalence contract: same segmentation, keep rule, and re-stitch
    // as Dedup.scrubSegments, so replaying the corpus in doc-id order across
    // micro-batches must reproduce the batch output EXACTLY — including a
    // cross-batch repeat (batch-2 doc repeating a batch-1 segment drops via
    // the standing digest store) and an in-batch repeat
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "a b c d e f"),        // batch 1: both segments novel
      (2L, "a b c x y z"),        // batch 1: in-batch repeat of doc 1's seg
      (3L, "d e f d e f"),        // batch 2: cross-batch repeats via store
      (4L, "p q r p q r p"))      // batch 2: in-batch + trailing short seg
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF.toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-scrub").toString
    val (store, out, cp) = (root + "/store", root + "/out", root + "/cp")
    val q = graft.streaming.StreamingScrub.scrubStream(
      docs, "doc_id", "text", store, out, cp, segTokens = 3)
    try {
      in.addData(rows(0), rows(1))
      q.processAllAvailable()
      in.addData(rows(2), rows(3))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(out)
      .orderBy("doc_id").select("doc_id", "n_segs", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    val batch = graft.ops.Dedup
      .scrubSegments(rows.toDF("doc_id", "text"), "doc_id", "text", 3)
      .orderBy("doc_id").select("doc_id", "n_segs", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(streamed === batch, "streaming scrub must reproduce batch output")
    assert(batch === Seq((1L, 2L, 2L, "a b c d e f"), (2L, 2L, 1L, "x y z"),
      (3L, 2L, 0L, ""), (4L, 3L, 2L, "p q r p")))
    // the store holds DIGESTS only (16-byte binary), never segment text —
    // schema INFERRED from the on-disk delta files (r19 tiered layout:
    // per-batch appends land flat under <store>/delta until compaction)
    val st = spark.read.parquet(store + "/delta")
    assert(st.schema.map(f => (f.name, f.dataType.typeName)) ===
      Seq(("seg_key", "binary")))
    val full = graft.streaming.StreamingScrub.readStore(spark, store)
    assert(full.distinct().count() === 5,
      "one digest per distinct kept segment: abc, def, xyz, pqr, p")
  }

  test("streaming span scrub ≡ batch scrubSpans on an id-ordered two-batch replay") {
    // the stride-1 rewrite twin: an offset-shifted repeat inside batch 1
    // and a verbatim full duplicate arriving in batch 2 (removed via the
    // standing digest store) must reproduce the batch operator exactly
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rows = Seq(
      (1L, "a b c d e"),
      (2L, "z a b c d"),     // batch 1: offset-shifted re-quote of doc 1
      (3L, "a b c d e"))     // batch 2: full duplicate, store-covered
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF.toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-spanscrub").toString
    // compactEvery = 1: every batch ends with a store rewrite, so this also
    // pins that compaction changes no keep decision (batch equivalence holds)
    val q = graft.streaming.StreamingScrub.scrubSpansStream(
      docs, "doc_id", "text", root + "/store", root + "/out", root + "/cp",
      w = 3, compactEvery = 1)
    try {
      in.addData(rows(0), rows(1))
      q.processAllAvailable()
      in.addData(rows(2))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(root + "/out")
      .orderBy("doc_id").select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    val batch = graft.ops.Dedup
      .scrubSpans(rows.toDF("doc_id", "text"), "doc_id", "text", 3)
      .orderBy("doc_id").select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(streamed === batch, "streaming span scrub must reproduce batch output")
    assert(batch === Seq((1L, 5L, 0L, "a b c d e"), (2L, 5L, 4L, "z"),
      (3L, 5L, 5L, "")))
    // store: digests of doc 1's three windows plus "z a b" — nothing from
    // batch 2 (everything it brought was already covered)
    assert(spark.read.parquet(root + "/store").distinct().count() === 4)
  }

  test("streaming co-movement ≡ batch pairHours across micro-batches (cross-batch discovery)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = java.sql.Date.valueOf("2025-01-01")
    val b1 = Seq((1L, d, 1, "X"), (2L, d, 1, "X"), (3L, d, 2, "Y"))
    val b2 = Seq((4L, d, 2, "Y"), (5L, d, 1, "X"))
    val in = MemoryStream[(Long, java.sql.Date, Int, String)]
    val hourly = in.toDF.toDF("uid", "dt", "hr", "cell")
    val root = java.nio.file.Files.createTempDirectory("graft-comv").toString
    // compactEvery = 1: every batch rewrites the presence store distinct —
    // cross-batch discovery surviving it pins compaction as meaning-free
    val q = graft.streaming.StreamingCoMovement.pairHourStream(
      hourly, root + "/store", root + "/out", root + "/cp", compactEvery = 1)
    try {
      in.addData(b1: _*); q.processAllAvailable()
      // pair (3,4): vessel 3 arrived in batch 1, vessel 4 only now — the
      // standing store must surface the cross-batch co-location
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getDate(2).toString, r.getInt(3), r.getString(4))
    val streamed = spark.read.parquet(root + "/out")
      .select("uid_a", "uid_b", "dt", "hr", "cell_a").collect().map(key).sorted.toSeq
    val batch = graft.ops.CoMovement.pairHours(
        (b1 ++ b2).toDF("uid", "dt", "hr", "cell"))
      .select("uid_a", "uid_b", "dt", "hr", "cell").collect().map(key).sorted.toSeq
    assert(streamed === batch, "stream must reproduce the batch pair-hour multiset")
    assert(batch.map(t => (t._1, t._2, t._4)) ===
      Seq((1L, 2L, 1), (1L, 5L, 1), (2L, 5L, 1), (3L, 4L, 2)))
  }

  test("streaming co-movement survives stop/start: no duplicate pair-hours") {
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-comv-rs").toString
    val (inDir, outDir, cpDir, storeDir) =
      (root + "/in", root + "/out", root + "/cp", root + "/store")
    new java.io.File(inDir).mkdirs()
    val schema = StructType(Seq(StructField("uid", LongType),
      StructField("dt", DateType), StructField("hr", IntegerType),
      StructField("cell", StringType)))
    def start() = graft.streaming.StreamingCoMovement.pairHourStream(
      spark.readStream.schema(schema).csv(inDir), storeDir, outDir, cpDir)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir + "/a.csv"),
      "1,2025-01-01,1,X\n2,2025-01-01,1,X\n")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // simulated crash
    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir + "/b.csv"),
      "3,2025-01-01,1,X\n")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(outDir).select("uid_a", "uid_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    // (1,2) from before the crash exactly once; (1,3) and (2,3) discovered
    // against the resumed store — never re-joined history against itself
    assert(got === Seq((1L, 2L), (1L, 3L), (2L, 3L)),
      s"restart re-emitted or dropped pair-hours: $got")
  }

  test("streaming ring co-movement finds the cross-batch boundary pair exact mode misses") {
    import graft.expressions.GeoCell
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = java.sql.Date.valueOf("2025-01-01")
    val c = GeoCell.cellId(10.0, 10.0, 2)
    val n = GeoCell.neighbors(c).head
    def run(ringK: Int): Seq[(Long, Long, String, String)] = {
      val in = MemoryStream[(Long, java.sql.Date, Int, String)]
      val root = java.nio.file.Files.createTempDirectory(s"graft-comv-r$ringK").toString
      val q = graft.streaming.StreamingCoMovement.pairHourStream(
        in.toDF.toDF("uid", "dt", "hr", "cell"),
        root + "/store", root + "/out", root + "/cp", ringK = ringK)
      try {
        in.addData((1L, d, 1, c)); q.processAllAvailable()
        // vessel 2 lands in the NEIGHBOR cell one batch later
        in.addData((2L, d, 1, n)); q.processAllAvailable()
      } finally q.stop()
      val out = new org.apache.hadoop.fs.Path(root + "/out")
      val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (!fs.exists(out)) Nil
      else spark.read.parquet(root + "/out")
        .select("uid_a", "uid_b", "cell_a", "cell_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getString(3)))
        .toSeq
    }
    // ring-1: the boundary pair surfaces via the standing store, with each
    // vessel's OWN cell attributed to its side of the pair
    assert(run(1) === Seq((1L, 2L, c, n)))
    // exact mode structurally misses it
    assert(run(0) === Nil)
  }

  test("streaming counts: exactly-once totals across batches, replay re-appends are no-ops") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-counts").toString
    val (store, cp) = (root + "/store", root + "/cp")
    val in = MemoryStream[String]
    val q = graft.streaming.StreamingCounts.countStream(
      in.toDF.toDF("k"), "k", store, cp, compactEvery = 0)
    try {
      in.addData("a", "b", "a"); q.processAllAvailable()
      in.addData("a", "c"); q.processAllAvailable()
      in.addData("b", "a"); q.processAllAvailable()
    } finally q.stop()
    def totals() = graft.streaming.StreamingCounts.readCounts(spark, store)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals() === Map("a" -> 4L, "b" -> 2L, "c" -> 1L))
    // at-least-once replay: the crashed batch re-appends BYTE-IDENTICAL
    // partial rows (deterministic per batch) — totals must not move
    val batch2 = spark.read.parquet(store)
      .filter(col("batch_id") === 2L)
    batch2.write.mode("append").parquet(store)
    assert(totals() === Map("a" -> 4L, "b" -> 2L, "c" -> 1L),
      "replayed partials must collapse in the distinct-read")
    // top-k: count DESC, key ASC
    assert(graft.streaming.StreamingCounts.topK(spark, store, 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 4L), ("b", 2L)))
  }

  test("streaming counts: committed-batch merge bounds the store without changing totals") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-counts2").toString
    val (store, cp) = (root + "/store", root + "/cp")
    val in = MemoryStream[String]
    val q = graft.streaming.StreamingCounts.countStream(
      in.toDF.toDF("k"), "k", store, cp, compactEvery = 0)
    try {
      in.addData("x", "y", "x"); q.processAllAvailable()
      in.addData("y", "z"); q.processAllAvailable()
      in.addData("x"); q.processAllAvailable()
    } finally q.stop()
    graft.streaming.StreamingCounts.mergeCommitted(spark, store)
    val rows = spark.read.parquet(store)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // batches 0 and 1 folded to base rows; batch 2 untouched (it is the
    // only one that could still replay)
    assert(rows === Set(("x", 2L, -1L), ("y", 2L, -1L), ("z", 1L, -1L),
      ("x", 1L, 2L)), s"merge must fold only committed batches: $rows")
    def totals() = graft.streaming.StreamingCounts.readCounts(spark, store)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(totals() === Map("x" -> 3L, "y" -> 2L, "z" -> 1L))
    // the newest batch replays AFTER the merge: still a no-op
    spark.createDataFrame(Seq(("x", 1L, 2L)))
      .toDF("key", "cnt", "batch_id").write.mode("append").parquet(store)
    assert(totals() === Map("x" -> 3L, "y" -> 2L, "z" -> 1L),
      "post-merge replay of the newest batch must still dedup")
    // merging again is idempotent
    graft.streaming.StreamingCounts.mergeCommitted(spark, store)
    assert(totals() === Map("x" -> 3L, "y" -> 2L, "z" -> 1L))
  }

  test("streaming ring co-movement ≡ brute-force hexDistance on RANDOM fleets and batch splits") {
    // the ring twin's equivalence contract at k=1: replaying a random
    // fleet's hourly rows across random micro-batch splits yields exactly
    // the set of unordered pairs within hex distance <= 1 per hour —
    // verified against an INDEPENDENT brute-force oracle (hexDistance over
    // all pairs), not the ringDeltas arithmetic the operator itself uses
    import graft.expressions.GeoCell
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val d = java.sql.Date.valueOf("2025-01-01")
    for (seed <- Seq(11, 47)) {
      val rnd = new scala.util.Random(seed)
      // small lat/lon patch at res 3 so neighbor/straddle cases occur often
      val rows = (1L to 10L).flatMap { uid =>
        (0 until 2).map { hr =>
          val lat = 10.0 + rnd.nextDouble() * 40.0
          val lon = 10.0 + rnd.nextDouble() * 40.0
          (uid, d, hr, GeoCell.cellId(lat, lon, 3))
        }
      }
      val expected = (for {
        Seq(a, b) <- rows.combinations(2)
        if a._3 == b._3 && a._1 != b._1
        if GeoCell.hexDistance(a._4, b._4) <= 1
        (lo, hi) = if (a._1 < b._1) (a, b) else (b, a)
      } yield (lo._1, hi._1, lo._3, lo._4, hi._4)).toSeq.sorted
      val cut1 = 1 + rnd.nextInt(rows.length - 2)
      val cut2 = cut1 + 1 + rnd.nextInt(rows.length - cut1 - 1)
      val in = MemoryStream[(Long, java.sql.Date, Int, String)]
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-ringeq-$seed").toString
      val q = graft.streaming.StreamingCoMovement.pairHourStream(
        in.toDF.toDF("uid", "dt", "hr", "cell"),
        root + "/store", root + "/out", root + "/cp",
        ringK = 1, compactEvery = 1)
      try {
        in.addData(rows.take(cut1): _*); q.processAllAvailable()
        in.addData(rows.slice(cut1, cut2): _*); q.processAllAvailable()
        in.addData(rows.drop(cut2): _*); q.processAllAvailable()
      } finally q.stop()
      val streamed = spark.read.parquet(root + "/out")
        .select("uid_a", "uid_b", "hr", "cell_a", "cell_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
          r.getString(3), r.getString(4))).sorted.toSeq
      assert(streamed === expected,
        s"seed=$seed cuts=($cut1,$cut2): ring stream must equal the " +
          s"brute-force distance-1 pair set")
    }
  }

  test("streaming scrub survives stop/start: checkpoint + store resume, no re-emission") {
    // the scrub's production claim: kill the stream between batches, restart
    // from the checkpoint, and (a) the standing digest store still suppresses
    // cross-restart repeats, (b) pre-restart input is not re-read or
    // re-emitted, (c) the combined output equals the batch operator
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-scrub-rs").toString
    val (inDir, outDir, cpDir, storeDir) =
      (root + "/in", root + "/out", root + "/cp", root + "/store")
    new java.io.File(inDir).mkdirs()
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def start() = graft.streaming.StreamingScrub.scrubStream(
      spark.readStream.schema(schema).csv(inDir),
      "doc_id", "text", storeDir, outDir, cpDir, segTokens = 3)
    val rows = Seq((1L, "a b c d e f"), (2L, "a b c x y z"),
      (3L, "d e f d e f"), (4L, "p q r p q r p"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir + "/a.csv"),
      "1,a b c d e f\n2,a b c x y z\n")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // simulated crash
    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir + "/b.csv"),
      "3,d e f d e f\n4,p q r p q r p\n")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val streamed = spark.read.parquet(outDir)
      .orderBy("doc_id").select("doc_id", "n_segs", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    // each doc exactly once (file a not replayed), content ≡ batch operator
    assert(streamed.map(_._1) === Seq(1L, 2L, 3L, 4L),
      s"restart re-emitted or dropped docs: $streamed")
    val batch = graft.ops.Dedup
      .scrubSegments(rows.toDF("doc_id", "text"), "doc_id", "text", 3)
      .orderBy("doc_id").select("doc_id", "n_segs", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(streamed === batch,
      "post-restart scrub must keep suppressing via the standing store")
  }

  test("streaming scrub keep-first is ARRIVAL order: history beats a later lower id") {
    // out-of-order replay pins the documented divergence from batch: the
    // standing store is history, so a batch-2 doc repeating a batch-1
    // segment loses it even though its id is LOWER (batch scrubSegments
    // would rank by id and decide the other way)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF.toDF("doc_id", "text")
    val root = java.nio.file.Files.createTempDirectory("graft-scrub-ooo").toString
    val q = graft.streaming.StreamingScrub.scrubStream(
      docs, "doc_id", "text", root + "/store", root + "/out", root + "/cp",
      segTokens = 3)
    try {
      in.addData((10L, "a b c"))
      q.processAllAvailable()
      in.addData((1L, "a b c"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(root + "/out")
      .orderBy("doc_id").select("doc_id", "n_kept", "clean_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(got === Seq((1L, 0L, ""), (10L, 1L, "a b c")),
      "the earlier ARRIVAL keeps the segment, regardless of id order")
  }

  test("streaming near-dup survives stop/start: signature store keeps suppressing") {
    // fourth stop/start proof: the banded-signature store written before the
    // crash must still flag a post-restart near-copy, and file A's docs must
    // not re-emit
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-nd-rs").toString
    val (inDir, outDir, cpDir, storeDir) =
      (root + "/in", root + "/out", root + "/cp", root + "/store")
    new java.io.File(inDir).mkdirs()
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    def start() = graft.streaming.StreamingNearDup.nearDupStream(
      spark.readStream.schema(schema).csv(inDir),
      "doc_id", "text", storeDir, outDir, cpDir)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir + "/a.csv"),
      "1,alpha beta gamma delta epsilon zeta eta\n")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // simulated crash
    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir + "/b.csv"),
      "2,alpha beta gamma delta epsilon zeta eta\n" + // verbatim doc 1: collides under ANY MinHash family (the stream now runs the r19 production defaults)
        "3,an entirely fresh subject with nothing shared anywhere here\n")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val out = spark.read.parquet(outDir)
      .select("doc_id", "dup_candidate").as[(Long, Boolean)].collect()
    assert(out.map(_._1).sorted.toSeq === Seq(1L, 2L, 3L),
      s"restart re-emitted or dropped docs: ${out.toSeq}")
    val flags = out.toMap
    assert(!flags(1L) && flags(2L) && !flags(3L),
      s"pre-crash store must still flag the post-restart near-copy: $flags")
  }

  test("streaming CDC upsert survives stop/start: snapshot intact, offsets resume") {
    // the third stop/start proof (rollup, scrub, upsert): restart between
    // micro-batches and the keyed snapshot must carry pre-restart state
    // forward, not re-apply file A and not lose keys
    import org.apache.spark.sql.types._
    val root = java.nio.file.Files.createTempDirectory("graft-upsert-rs").toString
    val (inDir, snapDir, cpDir) = (root + "/in", root + "/snap", root + "/cp")
    new java.io.File(inDir).mkdirs()
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("seq", LongType), StructField("op", StringType),
      StructField("v", DoubleType)))
    def start() = graft.streaming.StreamingUpsert.upsertStream(
      spark.readStream.schema(schema).csv(inDir),
      snapDir, cpDir, "k", "seq", "op", Seq("v"))
    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir + "/a.csv"),
      "1,1,U,10.0\n2,1,U,20.0\n")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop() // simulated crash
    // after restart: update key 1, delete key 2, insert key 3
    java.nio.file.Files.writeString(java.nio.file.Paths.get(inDir + "/b.csv"),
      "1,2,U,11.0\n2,2,D,0.0\n3,1,U,30.0\n")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val snapSchema = StructType(Seq(StructField("k", LongType),
      StructField("v", DoubleType)))
    val snap = graft.streaming.StreamingUpsert
      .readSnapshot(spark, snapDir, snapSchema)
      .orderBy("k").as[(Long, Double)].collect().toSeq
    assert(snap === Seq((1L, 11.0), (3L, 30.0)),
      s"restart lost pre-crash keys or replayed file A: $snap")
  }

  test("streaming CDC upsert maintains a keyed snapshot across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Double)]
    val changes = in.toDF.toDF("k", "seq", "op", "v")
    val snapDir = java.nio.file.Files.createTempDirectory("graft-ups-snap").toString + "/t"
    val cpDir = java.nio.file.Files.createTempDirectory("graft-ups-cp").toString
    val q = StreamingUpsert.upsertStream(changes, snapDir, cpDir,
      "k", "seq", "op", Seq("v", "seq"))
    try {
      // batch 1: three inserts
      in.addData((1L, 10L, "U", 1.0), (2L, 11L, "U", 2.0), (3L, 12L, "U", 3.0))
      q.processAllAvailable()
      assert(spark.read.parquet(snapDir).select("k", "v").as[(Long, Double)]
        .collect().sortBy(_._1).toSeq === Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)))

      // batch 2: update k=1 (two changes, latest seq wins), delete k=2,
      // insert k=4 — k=3 must survive untouched from the standing snapshot
      in.addData((1L, 20L, "U", 1.5), (1L, 21L, "U", 1.9),
        (2L, 22L, "D", 0.0), (4L, 23L, "U", 4.0))
      q.processAllAvailable()
      assert(spark.read.parquet(snapDir).select("k", "v").as[(Long, Double)]
        .collect().sortBy(_._1).toSeq === Seq((1L, 1.9), (3L, 3.0), (4L, 4.0)))
    } finally q.stop()
  }

  test("upsert readSnapshot refuses to bootstrap over an interrupted swap") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", StringType),
      StructField("v", DoubleType), StructField("seq", LongType)))
    val root = java.nio.file.Files.createTempDirectory("graft-ups-bak").toString
    val snapDir = root + "/t"
    // only the backup exists — the state a crash between renames leaves
    Seq((1L, 1.0)).toDF("k", "v").write.parquet(snapDir + ".bak")
    val e = intercept[IllegalStateException] {
      StreamingUpsert.readSnapshot(spark, snapDir, schema)
    }
    assert(e.getMessage.contains(".bak"))
    // with no live dir AND no backup it bootstraps empty with the STREAM's
    // schema (a string key stays a string — nothing fabricates a long)
    val boot = StreamingUpsert.readSnapshot(spark, root + "/fresh", schema)
    assert(boot.columns.toSeq === Seq("k", "v", "seq") && boot.count() === 0)
    assert(boot.schema("k").dataType === StringType)
  }

  test("streaming upsert works with a non-long (string) key from the first batch") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long, String, Double)]
    val changes = in.toDF.toDF("k", "seq", "op", "v")
    val snapDir = java.nio.file.Files.createTempDirectory("graft-ups-str").toString + "/t"
    val cpDir = java.nio.file.Files.createTempDirectory("graft-ups-strcp").toString
    val q = StreamingUpsert.upsertStream(changes, snapDir, cpDir,
      "k", "seq", "op", Seq("v", "seq"))
    try {
      in.addData(("a", 1L, "U", 1.0), ("b", 2L, "U", 2.0))
      q.processAllAvailable()
      assert(spark.read.parquet(snapDir).select("k", "v").as[(String, Double)]
        .collect().sortBy(_._1).toSeq === Seq(("a", 1.0), ("b", 2.0)))
    } finally q.stop()
  }

  test("multimodal batched decode: histogram computed from real bytes, batch shape bounded") {
    val media = Seq(
      Multimodal.MediaRow(1L, "img", Array.fill[Byte](256)(0)),
      Multimodal.MediaRow(2L, "img", (0 until 256).map(_.toByte).toArray))
      .toDS()
    val feats = Multimodal.extractFeatures(media, batchSize = 1)
      .collect().sortBy(_.media_id)
    assert(feats(0).histogram.head === 1.0f) // all bytes in bin 0
    assert(feats(0).histogram.tail.forall(_ === 0.0f))
    assert(feats(1).histogram.forall(_ === 1.0f / 16)) // uniform bytes
    assert(feats(0).n_bytes === 256 && feats(0).width === 256 % 640)
  }

  test("media features on documents match the driver-facing contract") {
    val docs = graft.engine.Tables.documents(spark, "/root/testdata/sf0.001")
    val f = Multimodal.mediaFeatures(docs).collect()
    assert(f.nonEmpty)
    assert(f.forall(r => r.getAs[Int]("n_bytes") > 0))
    assert(f.forall(r => r.getAs[Int]("width") === r.getAs[Int]("n_bytes") % 640))
  }

  test("frame sampling: every stride-th fixed-size frame, short tail clamped") {
    // 10 bytes, frames of 4 → frames 0,1,2 (lens 4,4,2); stride 2 keeps 0,2
    val media = Seq(Multimodal.MediaRow(1L, "vid",
      (1 to 10).map(_.toByte).toArray)).toDS()
    val frames = Multimodal.sampleFrames(media, frameBytes = 4, stride = 2)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(f => (f.frame_idx, f.n_bytes)).toSeq === Seq((0, 4), (2, 2)))
    val sha0 = java.security.MessageDigest.getInstance("SHA-256")
      .digest(Array[Byte](1, 2, 3, 4)).map("%02x".format(_)).mkString
    assert(frames(0).frame_sha === sha0)
  }

  test("resize stub: every factor-th byte kept, binary-in binary-out") {
    val media = Seq(Multimodal.MediaRow(1L, "img",
      (0 until 9).map(_.toByte).toArray)).toDS()
    val out = Multimodal.resizeStub(media, factor = 3).collect().head
    assert(out.bytes.toSeq === Seq[Byte](0, 3, 6))
    assert(out.media_id === 1L && out.kind === "img")
  }

  test("event-time timers close inactive sessions when the watermark passes") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, Timestamp, Double)]
    val withWm = mem.toDF.toDF("user_id", "ts", "value")
      .withWatermark("ts", "1 minute")
      .as[(Long, Timestamp, Double)]
    val q = StreamingTimers.closedSessions(withWm, gapMs = 10 * 60 * 1000)
      .writeStream.format("memory").queryName("timer_out")
      .outputMode("append").start()
    try {
      // user 1's session: two events ending 10:05; timer set for 10:15
      mem.addData((1L, ts("10:00"), 1.0), (1L, ts("10:05"), 2.0))
      q.processAllAvailable()
      assert(spark.table("timer_out").isEmpty, "watermark has not passed yet")
      // a later event from ANOTHER key pushes the watermark to 11:59 —
      // past 10:15, so user 1's timer fires (its key never speaks again)
      mem.addData((2L, ts("12:00"), 3.0))
      q.processAllAvailable()
      mem.addData((2L, ts("12:01"), 4.0)) // one more batch to drain timers
      q.processAllAvailable()
      val rows = spark.table("timer_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(rows.contains((1L, 2L, ts("10:00").getTime, ts("10:05").getTime)),
        s"user 1's session must close by timer, saw ${rows.toSeq}")
      // user 2 is still active — no closed session for it
      assert(!rows.exists(_._1 == 2L))
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("transformWithState running totals accumulate across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // transformWithState requires the RocksDB state store; scope the conf
    // to this query and restore after
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(Long, String, Double)]
    val q = StreamingCounters.runningTotals(mem.toDS())
      .writeStream.format("memory").queryName("twstate_out")
      .outputMode("update").start()
    try {
      mem.addData((1L, "click", 1.5), (1L, "view", 2.0), (2L, "click", 10.0))
      q.processAllAvailable()
      mem.addData((1L, "click", 0.25))
      q.processAllAvailable()
      val rows = spark.table("twstate_out")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      // batch 1: user 1 → (2 events, 3.5 in micros, 2 types); user 2 → 1 event
      assert(rows.contains((1L, 2L, 3500000L, 2L)))
      assert(rows.contains((2L, 1L, 10000000L, 1L)))
      // batch 2 re-emits user 1 with state carried over: 3 events, 3.75
      assert(rows.contains((1L, 3L, 3750000L, 2L)))
      // user 2 untouched in batch 2 → exactly one row for it
      assert(rows.count(_._1 == 2L) === 1)
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming implied speed matches the batch operator bit-for-bit in order") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val t0 = ts("10:00").getTime
    // two tracks, hops across the micro-batch boundary (state must carry)
    val batch1 = Seq(
      (1L, 1L, t0, 10.0, 20.0), (1L, 2L, t0 + 3600000L, 11.0, 20.0),
      (2L, 9L, t0, 0.0, 179.5))
    val batch2 = Seq(
      (1L, 3L, t0 + 5400000L, 31.0, 20.0),
      (2L, 10L, t0 + 3600000L, 0.0, -179.5))
    val mem = MemoryStream[StreamingTrajectory.Ping]
    val q = StreamingTrajectory.speedStream(mem.toDS(), teleportKmh = 1000.0)
      .writeStream.format("memory").queryName("speed_out")
      .outputMode("append").start()
    try {
      mem.addData(batch1: _*); q.processAllAvailable()
      mem.addData(batch2: _*); q.processAllAvailable()
      val streamed = spark.table("speed_out")
        .select("track_id", "ping_id", "ts_ms", "gap_ms", "dist_km",
          "speed_kmh", "is_teleport")
        .collect().map(_.toSeq).sortBy(r => (r(0).asInstanceOf[Long],
          r(1).asInstanceOf[Long]))
      val batchDf = (batch1 ++ batch2)
        .map { case (uid, eid, ms, lat, lon) =>
          (uid, eid, new Timestamp(ms), lat, lon) }
        .toDF("uid", "eid", "t", "lat", "lon")
      val expected = graft.ops.Trajectory
        .impliedSpeed(batchDf, "uid", "eid", "t", "lat", "lon", 1000.0)
        .select(col("uid"), col("eid"), col("ts_ms"), col("gap_ms"),
          col("dist_km"), col("speed_kmh"), col("is_teleport"))
        .collect().map(_.toSeq).sortBy(r => (r(0).asInstanceOf[Long],
          r(1).asInstanceOf[Long]))
      assert(streamed.toSeq === expected.toSeq,
        "in-order streaming output must equal the batch operator's")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("late ping flags is_late and never regresses trajectory state") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val t0 = ts("10:00").getTime
    val mem = MemoryStream[StreamingTrajectory.Ping]
    val q = StreamingTrajectory.speedStream(mem.toDS(), teleportKmh = 1000.0)
      .writeStream.format("memory").queryName("late_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, 1L, t0 + 3600000L, 10.0, 20.0))
      q.processAllAvailable()
      // older than the accepted ping: flagged, no kinematics
      mem.addData((1L, 2L, t0, 99.0, 99.0))
      q.processAllAvailable()
      // next in-order ping measures against ping 1, NOT the late one:
      // 1 degree of latitude over the hour from t0+1h to t0+2h
      mem.addData((1L, 3L, t0 + 7200000L, 11.0, 20.0))
      q.processAllAvailable()
      val rows = spark.table("late_out")
        .select("ping_id", "speed_kmh", "is_late")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getDouble(1)), r.getBoolean(2)))
        .sortBy(_._1)
      assert(rows(1) === ((2L, None, true)))
      assert(rows(2) === ((3L, Some(111.195), false)),
        s"post-late hop must chain from the accepted ping, saw ${rows.toSeq}")
    } finally {
      q.stop()
      prior match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("readPartitions: O(touched) listing — named partitions only, flat fallback, absent dirs tolerated") {
    import graft.streaming.StandingStore
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("uid", IntegerType), StructField("dt", StringType)))
    val store = java.nio.file.Files.createTempDirectory("ss-rp").toString + "/s"
    StandingStore.append(
      Seq((1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-03"))
        .toDF("uid", "dt"), store, Seq("dt"))
    // pruned read: only the named days, partition column preserved, and a
    // day the store has never seen must be tolerated (existence-checked,
    // not an AnalysisException)
    val got = StandingStore.readPartitions(spark, store, schema, "dt",
        Seq("2024-01-01", "2024-01-03", "2024-09-09"))
      .collect().map(r => (r.getInt(0), r.getString(1))).sorted
    assert(got.toSeq === Seq((1, "2024-01-01"), (3, "2024-01-03")))
    // no named partition exists -> empty frame of the declared schema
    assert(StandingStore.readPartitions(spark, store, schema, "dt",
      Seq("2030-01-01")).count() === 0)
    // absent store -> empty frame (first-batch probe)
    assert(StandingStore.readPartitions(spark, store + "-missing", schema,
      "dt", Seq("2024-01-01")).count() === 0)
    // legacy FLAT store (root-level files, dt as data column): the pruned
    // path must fall back to the full read — silently missing history
    // would corrupt keep-first decisions
    val flat = java.nio.file.Files.createTempDirectory("ss-rpf").toString + "/s"
    StandingStore.append(
      Seq((7, "2024-01-01"), (8, "2024-01-02")).toDF("uid", "dt"), flat)
    val fb = StandingStore.readPartitions(spark, flat, schema, "dt",
        Seq("2024-01-01"))
      .filter(col("dt").isInCollection(Seq("2024-01-01"))) // caller's row filter
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(fb.toSeq === Seq((7, "2024-01-01")))
  }

  test("readPartitions: Hive-escaped partition values round-trip (ADVICE r14)") {
    import graft.streaming.StandingStore
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("uid", IntegerType), StructField("k", StringType)))
    val store = java.nio.file.Files.createTempDirectory("ss-esc").toString + "/s"
    // values Spark percent-encodes in partition dir names: space, '=',
    // '%', ':', '/'. A raw s"$col=$v" existence check would miss every
    // one of these partitions SILENTLY — the exact failure mode the flat
    // fallback exists to prevent.
    val nasty = Seq("a b", "x=y", "p%q", "h:m", "a/b")
    StandingStore.append(
      nasty.zipWithIndex.map { case (v, i) => (i, v) }.toDF("uid", "k"),
      store, Seq("k"))
    nasty.foreach { v =>
      val got = StandingStore.readPartitions(spark, store, schema, "k", Seq(v))
        .collect().map(r => (r.getInt(0), r.getString(1)))
      assert(got.length === 1 && got.head._2 === v,
        s"partition value '$v' must round-trip through the pruned read")
    }
    // null partition value lands in Spark's default-partition dir; the
    // pruned read must address it the same way (reads back as null)
    val withNull = StandingStore.readPartitions(spark, store, schema, "k",
      Seq(null, "a b")).collect()
    assert(withNull.map(_.getString(1)).toSet === Set("a b"),
      "null value addresses the default partition (absent here) without error")
  }

  test("rewrite refuses to FLATTEN a store this JVM has seen partitioned (isFlat cache invariant, ADVICE r15)") {
    import graft.streaming.StandingStore
    import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
    val schema = StructType(Seq(
      StructField("uid", IntegerType), StructField("dt", StringType)))
    val store = java.nio.file.Files.createTempDirectory("ss-flat-guard")
      .toString + "/s"
    StandingStore.append(
      Seq((1, "2024-01-01"), (2, "2024-01-02")).toDF("uid", "dt"),
      store, Seq("dt"))
    // a pruned read populates the positive layout cache
    assert(StandingStore.readPartitions(spark, store, schema, "dt",
      Seq("2024-01-01")).count() === 1)
    // flattening now would make every later pruned read existence-check
    // nonexistent partition dirs and silently return EMPTY — the guard
    // must fail loudly instead
    val e = intercept[IllegalArgumentException] {
      StandingStore.compact(spark, store, schema) // no partitionCols
    }
    assert(e.getMessage.contains("FLATTEN"), e.getMessage)
    // the layout-preserving maintenance call is unaffected
    StandingStore.compact(spark, store, schema, Seq("dt"))
    assert(StandingStore.readPartitions(spark, store, schema, "dt",
      Seq("2024-01-01", "2024-01-02")).count() === 2,
      "partition-preserving compaction keeps the pruned path whole")
  }

  test("streaming KMV: standing sketches ≡ batch bottom-k over all data; overlap from the store alone; replay no-op") {
    import graft.streaming.StreamingKmv
    import graft.ops.Sketches
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val root = java.nio.file.Files.createTempDirectory("graft-skmv").toString
    val (store, cp) = (root + "/store", root + "/cp")
    val k = 8
    def t(d: Int) = java.sql.Timestamp.valueOf(f"2024-01-$d%02d 10:00:00")
    // two days, > k distinct users each (sketches FILL), cross-batch and
    // cross-day overlap so the fold and the pair math both do real work
    val batches: Seq[Seq[(Timestamp, Long)]] = Seq(
      (0L until 20L).map(u => (t(1), u)),
      (10L until 30L).map(u => (t(1), u)) ++
        (100L until 120L).map(u => (t(2), u)),
      (110L until 130L).map(u => (t(2), u)) ++ (0L until 5L).map(u => (t(2), u)))
    val in = MemoryStream[(Timestamp, Long)]
    val q = StreamingKmv.kmvStream(in.toDF.toDF("ts", "uid"), "ts", "uid",
      k, store, cp, compactEvery = 0)
    try batches.foreach { b => in.addData(b); q.processAllAvailable() }
    finally q.stop()

    // the batch truth over everything the stream has seen
    val all = batches.flatten.toDF("ts", "uid")
      .select(to_date(col("ts")).as("day"), col("uid"))
    def key(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toString).sorted.toSeq
    val expMins = key(Sketches.kmvMinhashes(all, Seq("day"), "uid", k)
      .select("day", "rank", "hv").collect())
    def gotMins() = key(StreamingKmv.readMinhashes(spark, store, k)
      .select("day", "rank", "hv").collect())
    assert(gotMins() === expMins,
      "standing sketch must equal the batch bottom-k over the full history")
    assert(gotMins().size === 2 * k, "both days must have filled sketches")

    // the set operation, from the store alone
    val expOv = key(Sketches.kmvOverlap(all, "day", "uid", k).collect())
    assert(key(StreamingKmv.overlap(spark, store, k).collect()) === expOv,
      "overlap state from standing sketches must equal the batch operator's")

    // at-least-once replay: the newest batch re-appends byte-identical
    // partial rows — every read must be unmoved
    val newest = spark.read.parquet(store).filter(col("batch_id") === 2L)
    newest.write.mode("append").parquet(store)
    assert(gotMins() === expMins, "replayed partials must collapse")

    // committed-batch fold: bounded base rows, reads unchanged, idempotent
    StreamingKmv.mergeCommitted(spark, store, k)
    assert(gotMins() === expMins, "merge must not change the sketch")
    val byBatch = spark.read.parquet(store).groupBy("batch_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byBatch.keySet === Set(-1L, 2L),
      s"batches 0-1 must fold to base rows, newest kept: $byBatch")
    assert(byBatch(-1L) <= 2L * k, "base rows are bounded by days × k")
    StreamingKmv.mergeCommitted(spark, store, k)
    assert(gotMins() === expMins, "merge is idempotent")
  }

  test("streaming KMV ≡ batch on RANDOM streams with RANDOM batch splits (compacting)") {
    // the deterministic fixture pins the contract; this drives it on
    // streams with no hand-placed structure — random day/uid mixes with
    // heavy duplication, random split points, compaction after every
    // batch — and demands bit-equality with the batch bottom-k AND the
    // batch overlap operator on every one
    import graft.streaming.StreamingKmv
    import graft.ops.Sketches
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val k = 8
    for (seed <- Seq(7L, 101L)) {
      val rnd = new scala.util.Random(seed)
      val events = (1 to 400).map { _ =>
        (java.sql.Timestamp.valueOf(
          f"2024-03-${1 + rnd.nextInt(4)}%02d 0${rnd.nextInt(10)}:00:00"),
          rnd.nextInt(60).toLong) // 60 uids over 4 days: dup-heavy
      }
      val cut1 = 1 + rnd.nextInt(200)
      val cut2 = cut1 + 1 + rnd.nextInt(399 - cut1)
      val batches = Seq(events.take(cut1), events.slice(cut1, cut2),
        events.drop(cut2)).filter(_.nonEmpty)
      val in = MemoryStream[(Timestamp, Long)]
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-randkmv-$seed").toString
      val q = StreamingKmv.kmvStream(in.toDF.toDF("ts", "uid"), "ts", "uid",
        k, root + "/store", root + "/cp", compactEvery = 1)
      try batches.foreach { b => in.addData(b); q.processAllAvailable() }
      finally q.stop()
      val all = events.toDF("ts", "uid")
        .select(to_date(col("ts")).as("day"), col("uid"))
      def key(rows: Array[org.apache.spark.sql.Row]) =
        rows.map(_.toString).sorted.toSeq
      assert(key(StreamingKmv.readMinhashes(spark, root + "/store", k)
          .select("day", "rank", "hv").collect()) ===
        key(Sketches.kmvMinhashes(all, Seq("day"), "uid", k)
          .select("day", "rank", "hv").collect()),
        s"seed=$seed cuts=($cut1,$cut2): standing sketch must equal batch bottom-k")
      assert(key(StreamingKmv.overlap(spark, root + "/store", k).collect()) ===
        key(Sketches.kmvOverlap(all, "day", "uid", k).collect()),
        s"seed=$seed: overlap from the store must equal the batch operator")
    }
  }
}
