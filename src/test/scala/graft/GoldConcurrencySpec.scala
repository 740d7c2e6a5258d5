package graft

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.{AtomicInteger, AtomicReference}

import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.functions._

/** Gold-stage machinery under REAL cross-session concurrency (the round-14
  * striping fix had only a single-session unit spec):
  *
  *   1. GoldCache first-build raced from TWO SparkSessions (shared
  *      SparkContext and JVM — the cache is JVM-scoped by design): the
  *      build thunk must evaluate exactly once, every caller must get the
  *      identical materialized rows.
  *   2. compactPartitionsCatalog raced against readers planning through
  *      `spark.table` from the OTHER session: every read during the
  *      maintenance pass must return the full, duplicate-free dataset —
  *      the atomic-metadata-flip claim. (The path-based dir-swap
  *      [[graft.ops.GoldPipeline.compactPartitions]] cannot make this
  *      promise to uncoordinated path readers — a raw FS has no atomic
  *      directory replace — which is exactly why the catalog variant
  *      exists.)
  *   3. sweepOrphans after the grace period: orphaned pre-compaction leaf
  *      dirs are deleted, reads stay green, a second sweep is a no-op.
  */
class GoldConcurrencySpec extends SparkSpec {

  test("GoldCache first-build races from two sessions: exactly one build, identical rows") {
    val other = spark.newSession()
    val builds = new AtomicInteger(0)
    val dirKey = s"/race-${System.nanoTime()}" // unique (name, srcDir) key
    val threads = 8
    val pool = Executors.newFixedThreadPool(threads)
    val start = new CountDownLatch(1)
    val results = (0 until threads).map { i =>
      val s = if (i % 2 == 0) spark else other
      pool.submit(new java.util.concurrent.Callable[Seq[String]] {
        override def call(): Seq[String] = {
          start.await()
          engine.GoldCache.table(s, "race_table", dirKey) {
            builds.incrementAndGet()
            // non-trivial build: forces real work inside the monitor
            s.range(0, 1000).select(col("id"),
              sha2(col("id").cast("string"), 256).as("h"))
          }.collect().map(_.toString).toSeq.sorted
        }
      })
    }
    start.countDown()
    val rows = results.map(_.get(120, TimeUnit.SECONDS))
    pool.shutdown()
    assert(builds.get() === 1,
      "the per-key monitor must serialize cross-session first-builds to exactly one evaluation")
    assert(rows.toSet.size === 1, "every caller must see the same materialized rows")
    assert(rows.head.size === 1000)
  }

  test("compactPartitionsCatalog vs spark.table readers in another session: no torn reads, then a clean sweep") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-cat-compact-")
      .toString
    val table = "gold_race_t"
    // 6 partitions x 12 small files each (> maxFiles=8): every partition
    // gets swapped, so every swap is a chance to catch a torn read
    val df = (0 until 600).map(i => (i, i % 6, s"v$i")).toDF("id", "dt", "s")
    df.repartition(12).write.mode("overwrite").partitionBy("dt").parquet(root)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    ops.GoldPipeline.registerExternalTable(spark, table, root)
    val expectedIds = (0 until 600).toSet

    val reader = spark.newSession()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val torn = new AtomicReference[String](null)
    val reads = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(3)
    val readers = (0 until 3).map { _ =>
      pool.submit(new Runnable {
        override def run(): Unit =
          while (!stop.get() && torn.get() == null) {
            Try {
              val ids = reader.table(table).select("id").as[Int].collect()
              if (ids.length != 600 || ids.toSet != expectedIds)
                torn.compareAndSet(null,
                  s"torn read: ${ids.length} rows (dupes or missing)")
              reads.incrementAndGet()
            } match {
              case Failure(e) =>
                torn.compareAndSet(null, s"read failed mid-swap: $e")
              case Success(_) => ()
            }
          }
      })
    }
    // let readers spin up, then compact every partition under them
    Thread.sleep(300)
    val compacted = ops.GoldPipeline.compactPartitionsCatalog(
      spark, table, targetBytes = 1L << 30, maxFiles = 8)
    assert(compacted.size === 6, s"all six partitions were oversized: $compacted")
    compacted.foreach { case (spec, before, after) =>
      assert(before === 12 && after === 1, s"$spec: $before -> $after")
    }
    // keep reading a beat on the post-swap state before stopping
    Thread.sleep(300)
    stop.set(true)
    readers.foreach(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()
    assert(torn.get() == null, String.valueOf(torn.get()))
    assert(reads.get() > 0, "the readers must actually have read during the pass")

    // the grace period is ENFORCED: the first graced sweep only plants
    // tombstones in the just-orphaned leaves — deletion waits until a
    // tombstone is older than the grace (this first-observation clock is
    // also the guard that protects a concurrent compaction's pre-ALTER
    // __cN sibling from a racing sweep)
    assert(ops.GoldPipeline.sweepOrphans(spark, table).isEmpty,
      "a sweep inside the grace period must delete nothing")
    // grace period over (collapsed to 0 for the test): the reader session
    // refreshes its relation cache, THEN the orphaned pre-compaction leaf
    // dirs are swept
    reader.catalog.refreshTable(table)
    val swept = ops.GoldPipeline.sweepOrphans(spark, table, graceMs = 0L)
    assert(swept.size === 6, s"six orphaned original leaves: $swept")
    assert(reader.table(table).count() === 600,
      "reads must stay green after the sweep")
    assert(ops.GoldPipeline.sweepOrphans(spark, table, graceMs = 0L).isEmpty,
      "a second sweep must be a no-op")
    spark.sql(s"DROP TABLE $table")
  }

  test("a scan PLANNED before compaction finishes correctly after compact + an in-grace sweep (the grace contract, demonstrated against a live reader)") {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-grace-")
      .toString
    val table = "gold_grace_t"
    val df = (0 until 600).map(i => (i, i % 6, s"v$i"))
      .toDF("id", "dt", "s")
    df.repartition(12).write.mode("overwrite").partitionBy("dt").parquet(root)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    ops.GoldPipeline.registerExternalTable(spark, table, root)

    // the live reader: a SECOND session plans a scan and starts consuming
    // it — toLocalIterator materializes the physical plan (including the
    // resolved pre-compact file listing) at the first element, then runs
    // one job per remaining partition against that SAME plan, so every
    // element after the first is read off the OLD locations
    val reader = spark.newSession()
    val it = reader.table(table).select("id").toLocalIterator()
    val first = it.next()

    // maintenance runs underneath the in-flight scan
    val compacted = ops.GoldPipeline.compactPartitionsCatalog(
      spark, table, targetBytes = 1L << 30, maxFiles = 8)
    assert(compacted.size === 6)
    // a sweep INSIDE the grace period runs too — and must delete nothing,
    // because the reader's remaining partitions still need the old files
    assert(ops.GoldPipeline.sweepOrphans(spark, table).isEmpty,
      "an in-grace sweep must not pull files out from under a live reader")

    // the pre-compact scan drains to completion, correct and complete
    val ids = (Iterator.single(first) ++ it.asScala).map(_.getInt(0)).toSeq
    assert(ids.length === 600 && ids.toSet === (0 until 600).toSet,
      "the scan planned before compaction must finish complete and duplicate-free")

    // reader lifetime over: the post-grace sweep (collapsed to 0) removes
    // the six orphaned old leaves, and fresh reads stay green
    val swept = ops.GoldPipeline.sweepOrphans(spark, table, graceMs = 0L)
    assert(swept.size === 6, s"six orphaned original leaves: $swept")
    reader.catalog.refreshTable(table)
    assert(reader.table(table).count() === 600)
    spark.sql(s"DROP TABLE $table")
  }

  /** The grace clock is TIME SINCE ORPHANED, not content age. A partition
    * whose files were written long ago (content mtime aged well past any
    * grace) is compacted and thereby orphaned NOW — a content-mtime gate
    * would delete it instantly, pulling files out from under any reader
    * that planned against the pre-compact locations. The tombstone scheme
    * must give it a full grace from first observation.
    */
  test("an orphan with AGED content survives graced sweeps until its tombstone ages out") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-aged-").toString
    val table = "gold_aged_t"
    val df = (0 until 100).map(i => (i, 0, s"v$i")).toDF("id", "dt", "s")
    df.repartition(12).write.mode("overwrite").partitionBy("dt").parquet(root)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    ops.GoldPipeline.registerExternalTable(spark, table, root)

    // age every file and dir under the leaf far past the default grace
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val leaf = new org.apache.hadoop.fs.Path(root, "dt=0")
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    (fs.listStatus(leaf).map(_.getPath) :+ leaf).foreach(p =>
      fs.setTimes(p, old, old))

    val compacted = ops.GoldPipeline.compactPartitionsCatalog(
      spark, table, targetBytes = 1L << 30, maxFiles = 8)
    assert(compacted.size === 1)
    // first graced sweep: the leaf is non-live with 48h-old content — under
    // the former content-mtime gate it would be deleted HERE; the tombstone
    // gate must only mark it
    assert(ops.GoldPipeline.sweepOrphans(spark, table).isEmpty,
      "a just-orphaned leaf must survive its first graced sweep regardless of content age")
    val marker = new org.apache.hadoop.fs.Path(leaf,
      ops.GoldPipeline.OrphanMarker)
    assert(fs.exists(marker), "the first graced sweep must plant a tombstone")
    // second graced sweep: tombstone is seconds old — still inside grace
    assert(ops.GoldPipeline.sweepOrphans(spark, table).isEmpty,
      "a fresh tombstone must keep the leaf alive through the grace period")
    // grace elapses (collapsed by aging the tombstone AND the dir mtime
    // the tombstone's creation bumped): now it deletes
    fs.setTimes(marker, old, old)
    fs.setTimes(leaf, old, old)
    val swept = ops.GoldPipeline.sweepOrphans(spark, table)
    assert(swept.size === 1 && swept.head.endsWith("dt=0"), swept.toString)
    assert(spark.table(table).count() === 100)
    spark.sql(s"DROP TABLE $table")
  }

  /** A tombstoned leaf that becomes LIVE again — a stalled compaction's
    * ALTER finally landing on a sibling a sweep had already observed as
    * non-live — must have its tombstone removed, never its data.
    */
  test("a tombstoned leaf that becomes a registered location is un-marked, not deleted") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-relive-").toString
    val table = "gold_relive_t"
    val df = (0 until 100).map(i => (i, 0, s"v$i")).toDF("id", "dt", "s")
    df.repartition(2).write.mode("overwrite").partitionBy("dt").parquet(root)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    ops.GoldPipeline.registerExternalTable(spark, table, root)

    // model a concurrent compaction mid-stall: its fresh __c1 sibling is
    // fully written but the ALTER has not landed yet
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val sibling = new org.apache.hadoop.fs.Path(root, "dt=0__c1")
    spark.table(table).where(col("dt") === 0).drop("dt")
      .coalesce(1).write.parquet(sibling.toString)
    // a sweep observes the pre-ALTER sibling: tombstoned, not deleted
    assert(ops.GoldPipeline.sweepOrphans(spark, table).isEmpty)
    val marker = new org.apache.hadoop.fs.Path(sibling,
      ops.GoldPipeline.OrphanMarker)
    assert(fs.exists(marker), "the non-live sibling must be tombstoned")
    // even an AGED tombstone must not take the leaf down once the stalled
    // ALTER lands and the sibling becomes the partition's live location
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    fs.setTimes(marker, old, old)
    spark.sql(s"ALTER TABLE $table PARTITION (dt='0') " +
      s"SET LOCATION '${sibling.toString}'")
    assert(ops.GoldPipeline.sweepOrphans(spark, table)
      .forall(!_.endsWith("dt=0__c1")), "a live location must never be swept")
    assert(fs.exists(sibling), "the now-live sibling must survive")
    assert(!fs.exists(marker),
      "the stale tombstone must be removed from a leaf that became live")
    spark.catalog.refreshTable(table)
    assert(spark.table(table).count() === 100)
    spark.sql(s"DROP TABLE $table")
  }

  /** A leaf that became live while still carrying a tombstone (marked as a
    * pre-ALTER sibling, then ALTERed in, with no sweep running in between
    * to clean it) must NOT inherit that stale clock when a LATER compaction
    * re-orphans it — otherwise its in-flight readers get zero grace. The
    * flip itself owns the hygiene: markers are cleared from the location
    * becoming live AND from the leaf being orphaned.
    */
  test("a stale tombstone cannot short-circuit the grace of a later re-orphaning (flip-time marker hygiene)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-stale-").toString
    val table = "gold_stale_t"
    val df = (0 until 100).map(i => (i, 0, s"v$i")).toDF("id", "dt", "s")
    df.repartition(2).write.mode("overwrite").partitionBy("dt").parquet(root)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    ops.GoldPipeline.registerExternalTable(spark, table, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // a fully-written pre-ALTER sibling with MANY files (so the later
    // compaction will pick it up), observed and tombstoned by a sweep
    val sibling = new org.apache.hadoop.fs.Path(root, "dt=0__c1")
    spark.table(table).where(col("dt") === 0).drop("dt")
      .repartition(12).write.parquet(sibling.toString)
    assert(ops.GoldPipeline.sweepOrphans(spark, table).isEmpty)
    val marker = new org.apache.hadoop.fs.Path(sibling,
      ops.GoldPipeline.OrphanMarker)
    assert(fs.exists(marker))
    // age the tombstone far past any grace, then the stalled ALTER lands —
    // NO sweep runs while the leaf is live, so the stale marker persists
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    fs.setTimes(marker, old, old)
    spark.sql(s"ALTER TABLE $table PARTITION (dt='0') " +
      s"SET LOCATION '${sibling.toString}'")

    // a later maintenance pass re-orphans the leaf (12 files > maxFiles=8:
    // it compacts to a fresh __c2 and flips away from it)
    val compacted = ops.GoldPipeline.compactPartitionsCatalog(
      spark, table, targetBytes = 1L << 30, maxFiles = 8)
    assert(compacted.size === 1)
    assert(!fs.exists(marker),
      "the flip must clear the stale tombstone from the leaf it orphans")
    // the just-re-orphaned leaf gets a FULL grace: the next sweep may only
    // re-tombstone it (fresh clock), never delete it
    assert(ops.GoldPipeline.sweepOrphans(spark, table)
      .forall(!_.endsWith("dt=0__c1")),
      "a re-orphaned leaf must get a fresh first-observation clock")
    assert(fs.exists(sibling),
      "the re-orphaned leaf must survive the sweep inside its new grace")
    spark.catalog.refreshTable(table)
    assert(spark.table(table).count() === 100)
    spark.sql(s"DROP TABLE $table")
  }

  /** The content gate must see COMMITTER-DEPTH writes: files land under
    * `_temporary/<attempt>/...` without bumping the leaf's (or its direct
    * children's) mtimes, so a top-level-only age check would delete a
    * sibling mid-write.
    */
  test("an orphan with a fresh file deep under _temporary survives the sweep (recursive content age)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-deep-").toString
    val table = "gold_deep_t"
    val df = (0 until 100).map(i => (i, 0, s"v$i")).toDF("id", "dt", "s")
    df.repartition(2).write.mode("overwrite").partitionBy("dt").parquet(root)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    ops.GoldPipeline.registerExternalTable(spark, table, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

    // a non-live sibling modeling a SLOW in-progress rewrite: aged
    // top-level content + an aged tombstone, but one FRESH file at
    // committer depth
    val sib = new org.apache.hadoop.fs.Path(root, "dt=0__c3")
    val topFile = new org.apache.hadoop.fs.Path(sib, "part-00000.parquet")
    fs.mkdirs(sib); fs.create(topFile, true).close()
    val deep = new org.apache.hadoop.fs.Path(sib,
      "_temporary/0/_temporary/attempt_0/part-00001.parquet")
    fs.mkdirs(deep.getParent); fs.create(deep, true).close()
    val marker = new org.apache.hadoop.fs.Path(sib,
      ops.GoldPipeline.OrphanMarker)
    fs.create(marker, true).close()
    val old = System.currentTimeMillis() - 48L * 3600 * 1000
    // age EVERYTHING except the single deep file — the dir chain included,
    // so the deep FILE's freshness is the only thing that can keep the
    // leaf alive (a depth-capped or dirs-only recursion must fail here)
    (Seq(sib, topFile, marker) ++
      Seq("_temporary", "_temporary/0", "_temporary/0/_temporary",
        "_temporary/0/_temporary/attempt_0")
        .map(d => new org.apache.hadoop.fs.Path(sib, d)))
      .foreach(p => fs.setTimes(p, old, old))
    // deep file stays FRESH: the sweep must keep the whole leaf
    assert(ops.GoldPipeline.sweepOrphans(spark, table)
      .forall(!_.endsWith("dt=0__c3")),
      "a mid-write sibling must survive on its deep fresh content")
    assert(fs.exists(sib))
    // once the deep content ages too (write abandoned), it sweeps
    fs.setTimes(deep, old, old)
    Seq("_temporary/0/_temporary/attempt_0", "_temporary/0/_temporary",
      "_temporary/0", "_temporary").foreach(d =>
      fs.setTimes(new org.apache.hadoop.fs.Path(sib, d), old, old))
    val swept = ops.GoldPipeline.sweepOrphans(spark, table)
    assert(swept.exists(_.endsWith("dt=0__c3")),
      s"an abandoned aged sibling must sweep once fully aged: $swept")
    spark.sql(s"DROP TABLE $table")
  }

  /** The rewrite->flip window fails LOUDLY if the fresh sibling vanished:
    * the ALTER must never register a location that no longer exists. The
    * boundary hook models the extreme case (a sweep deleting the sibling
    * mid-stall); the partition must stay readable on its old location.
    */
  test("compactPartitionsCatalog aborts loudly if the fresh sibling vanishes before the flip") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-vanish-").toString
    val table = "gold_vanish_t"
    val df = (0 until 100).map(i => (i, 0, s"v$i")).toDF("id", "dt", "s")
    df.repartition(12).write.mode("overwrite").partitionBy("dt").parquet(root)
    spark.sql(s"DROP TABLE IF EXISTS $table")
    ops.GoldPipeline.registerExternalTable(spark, table, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val saved = ops.GoldPipeline.maintenanceBoundaryHook
    try {
      ops.GoldPipeline.maintenanceBoundaryHook = {
        case "after_rewrite" =>
          fs.delete(new org.apache.hadoop.fs.Path(root, "dt=0__c1"), true)
        case _ => ()
      }
      val e = intercept[IllegalStateException] {
        ops.GoldPipeline.compactPartitionsCatalog(
          spark, table, targetBytes = 1L << 30, maxFiles = 8)
      }
      assert(e.getMessage.contains("vanished before the catalog flip"))
    } finally ops.GoldPipeline.maintenanceBoundaryHook = saved
    // the partition was never flipped: reads stay green on the old leaf
    assert(spark.table(table).count() === 100)
    spark.sql(s"DROP TABLE $table")
  }

  // ---- maintenance vs maintenance (round-17 directive #2) -------------
  // Two maintainers racing — sweepOrphans concurrent with an in-flight
  // compactPartitionsCatalog — was argued safe via the tombstone grace +
  // the loud pre-flip guard, never interleaved. These tests run a FULL
  // sweep pass at every boundary the maintenanceBoundaryHook exposes
  // (before_rewrite / after_rewrite / after_flip) and pin the protocol's
  // claims at each interleaving point: a graced sweep deletes nothing and
  // leaves no stray tombstone on the flipped-to sibling; an aged-out sweep
  // that takes the unflipped sibling makes the flip abort LOUDLY with the
  // partition intact; a zero-grace sweep right after the flip is exactly
  // the deferred-deletion path and reads stay green throughout.

  private def mkCompactTable(name: String, rows: Int): (String, org.apache.hadoop.fs.FileSystem) = {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory(s"graft-mvm-$name-")
      .toString
    val df = (0 until rows).map(i => (i, 0, s"v$i")).toDF("id", "dt", "s")
    df.repartition(12).write.mode("overwrite").partitionBy("dt").parquet(root)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    ops.GoldPipeline.registerExternalTable(spark, name, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    (root, fs)
  }

  /** Recursively backdate every path under `p` (inclusive) so both the
    * tombstone clock and newestMs see fully aged content.
    */
  private def ageTree(fs: org.apache.hadoop.fs.FileSystem,
                      p: org.apache.hadoop.fs.Path, ms: Long): Unit = {
    fs.listStatus(p).foreach { s =>
      if (s.isDirectory) ageTree(fs, s.getPath, ms)
      else fs.setTimes(s.getPath, ms, ms)
    }
    fs.setTimes(p, ms, ms)
  }

  test("maintenance vs maintenance: graced sweep at every compaction boundary — nothing deleted, no stray tombstones, old leaf gets full grace") {
    val table = "gold_mvm_graced_t"
    val (root, fs) = mkCompactTable(table, 200)
    val sweeps = scala.collection.mutable.Map.empty[String, Seq[String]]
    val saved = ops.GoldPipeline.maintenanceBoundaryHook
    try {
      ops.GoldPipeline.maintenanceBoundaryHook = b =>
        sweeps(b) = ops.GoldPipeline.sweepOrphans(spark, table) // default 15-min grace
      ops.GoldPipeline.compactPartitionsCatalog(
        spark, table, targetBytes = 1L << 30, maxFiles = 8)
    } finally ops.GoldPipeline.maintenanceBoundaryHook = saved
    assert(sweeps.keySet === Set("before_rewrite", "after_rewrite", "after_flip"),
      s"all three boundaries must have interleaved a sweep: ${sweeps.keySet}")
    assert(sweeps.values.forall(_.isEmpty),
      s"a graced sweep racing the compaction must delete NOTHING: $sweeps")
    val sib = new org.apache.hadoop.fs.Path(root, "dt=0__c1")
    val oldLeaf = new org.apache.hadoop.fs.Path(root, "dt=0")
    assert(fs.exists(sib) && fs.exists(oldLeaf),
      "both leaves survive the interleaved maintenance pass")
    // the after_rewrite sweep observed the not-yet-live sibling and planted
    // a tombstone there; the post-flip marker hygiene must have cleared it
    // (a live leaf wearing a tombstone is the zero-grace hazard)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(sib,
      ops.GoldPipeline.OrphanMarker)),
      "the flipped-to sibling must not keep the racing sweep's tombstone")
    // the after_flip sweep observed the just-orphaned old leaf: first
    // observation plants a tombstone, deletes nothing — full grace from HERE
    assert(fs.exists(new org.apache.hadoop.fs.Path(oldLeaf,
      ops.GoldPipeline.OrphanMarker)),
      "the old leaf must carry the after-flip sweep's first-observation tombstone")
    assert(spark.table(table).count() === 200, "reads stay green throughout")
    // a fresh graced sweep still deletes nothing (tombstone young) ...
    assert(ops.GoldPipeline.sweepOrphans(spark, table).isEmpty)
    // ... and once tombstone + content age out, the old leaf sweeps clean
    ageTree(fs, oldLeaf, System.currentTimeMillis() - 48L * 3600 * 1000)
    val swept = ops.GoldPipeline.sweepOrphans(spark, table)
    assert(swept.exists(_.endsWith("dt=0")), s"aged orphan must sweep: $swept")
    assert(spark.table(table).count() === 200)
    spark.sql(s"DROP TABLE $table")
  }

  test("maintenance vs maintenance: an aged-out sweep taking the unflipped sibling makes the flip abort loudly, partition intact") {
    val table = "gold_mvm_aged_t"
    val (root, fs) = mkCompactTable(table, 150)
    val sib = new org.apache.hadoop.fs.Path(root, "dt=0__c1")
    val saved = ops.GoldPipeline.maintenanceBoundaryHook
    try {
      ops.GoldPipeline.maintenanceBoundaryHook = {
        case "after_rewrite" =>
          // the extreme stall, via the REAL sweep protocol (not a hand rm):
          // sweep 1 first-observes the non-live sibling and tombstones it;
          // the whole tree then ages past the grace (the compaction stalled
          // for > graceMs); sweep 2 legitimately deletes the sibling
          val first = ops.GoldPipeline.sweepOrphans(spark, table)
          assert(first.isEmpty, "first observation only plants the tombstone")
          ageTree(fs, sib, System.currentTimeMillis() - 48L * 3600 * 1000)
          val second = ops.GoldPipeline.sweepOrphans(spark, table)
          assert(second.exists(_.endsWith("dt=0__c1")),
            s"the fully aged sibling sweeps: $second")
        case _ => ()
      }
      val e = intercept[IllegalStateException] {
        ops.GoldPipeline.compactPartitionsCatalog(
          spark, table, targetBytes = 1L << 30, maxFiles = 8)
      }
      assert(e.getMessage.contains("vanished before the catalog flip"))
    } finally ops.GoldPipeline.maintenanceBoundaryHook = saved
    // never flipped: the partition still reads green on its old location
    assert(spark.table(table).count() === 150)
    spark.sql(s"DROP TABLE $table")
  }

  test("maintenance vs maintenance: a zero-grace sweep right after the flip deletes the old leaf mid-compaction, reads stay green") {
    val table = "gold_mvm_zg_t"
    val (root, fs) = mkCompactTable(table, 120)
    val oldLeaf = new org.apache.hadoop.fs.Path(root, "dt=0")
    val saved = ops.GoldPipeline.maintenanceBoundaryHook
    try {
      ops.GoldPipeline.maintenanceBoundaryHook = {
        case "after_flip" =>
          // grace 0 = the operator's externally-verified-no-readers path:
          // the just-orphaned leaf goes immediately, INSIDE the compaction
          val swept = ops.GoldPipeline.sweepOrphans(spark, table, graceMs = 0L)
          assert(swept.exists(_.endsWith("dt=0")),
            s"zero-grace sweep must take the orphaned old leaf: $swept")
        case _ => ()
      }
      val res = ops.GoldPipeline.compactPartitionsCatalog(
        spark, table, targetBytes = 1L << 30, maxFiles = 8)
      assert(res.nonEmpty, "the compaction itself completes normally")
    } finally ops.GoldPipeline.maintenanceBoundaryHook = saved
    assert(!fs.exists(oldLeaf), "old leaf gone")
    assert(fs.exists(new org.apache.hadoop.fs.Path(root, "dt=0__c1")))
    assert(spark.table(table).count() === 120,
      "reads resolve the flipped location after the mid-compaction sweep")
    spark.sql(s"DROP TABLE $table")
  }
}
