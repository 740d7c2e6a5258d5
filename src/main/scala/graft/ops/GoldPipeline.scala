package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Silver→gold materialization: the Spark re-expression of
  * `pipelines/refresh_gold_tables.py` (the reference's analytics core).
  *
  * The reference's day-at-a-time CTAS loop + temp-table-promote + MSCK exists
  * to keep each Athena query on one silver partition and to fake atomic
  * replace (`refresh_gold_tables.py:648-669,154-181`). In Spark the whole
  * lifecycle collapses to two jobs with dynamic partition overwrite:
  * partition pruning bounds each refresh to the requested day range, and the
  * overwrite is atomic per partition — no temp tables, no repair step.
  *
  * Layout mirrors the reference's gold contract:
  *   - uid_hourly:  partitioned dt=/hour=, intended bucketing 64 by uid
  *     (`sql/gold/create_uid_hourly_h3.sql:19-21`)
  *   - pairs_daily: partitioned year=/month=/day=, bucketing 32 by (uid_a,
  *     uid_b) (`sql/gold/create_pairs_daily.sql:9-11`)
  * Bucketing on path-based tables is expressed as a `repartition` on the
  * bucket keys (Spark's `bucketBy` requires a catalog table, SURVEY.md §7.5);
  * the shuffle both co-locates writers and bounds file counts.
  */
object GoldPipeline {

  /** Refresh the hourly gold table for a day range (inclusive), mode
    * append/replace per the reference's `--mode` flag. `hourly` must carry
    * (uid, hour_ts, dt, hr, message_count, avg_pos, cell).
    */
  def refreshUidHourly(hourly: DataFrame, outRoot: String,
                       fromDay: String, untilDay: String,
                       replace: Boolean = true, buckets: Int = 64,
                       enforceContract: Boolean = true): Unit = {
    val bounded = hourly
      .filter(col("dt").between(lit(fromDay).cast("date"), lit(untilDay).cast("date")))
    // contract gate BEFORE any file lands: an incompatible refresh schema
    // would poison the partitioned table silently until a reader hit it
    if (enforceContract)
      SchemaEvolution.checkCompatible(hourly.sparkSession, outRoot, bounded.schema)
    bounded
      .repartition(buckets, col("uid")) // bucket-role shuffle; bounds files/partition
      .write.mode(if (replace) "overwrite" else "append")
      // per-write scope — doesn't leak into the caller's session conf
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("dt", "hr")
      .option("compression", "snappy")
      .parquet(outRoot)
  }

  /** Refresh pairs_daily for a day range from an (already day-filtered or
    * full) hourly frame. The day filter is applied BEFORE the self-join —
    * the pruning the reference gets from per-day CTAS (`README.md:137`).
    */
  def refreshPairsDaily(hourly: DataFrame, outRoot: String,
                        fromDay: String, untilDay: String,
                        replace: Boolean = true, buckets: Int = 32,
                        enforceContract: Boolean = true): Unit = {
    val bounded = hourly.filter(
      col("dt").between(lit(fromDay).cast("date"), lit(untilDay).cast("date")))
    val pairs = CoMovement.pairsDaily(bounded)
      .withColumn("year", year(col("day_date")))
      .withColumn("month", month(col("day_date")))
      .withColumn("day", dayofmonth(col("day_date")))
    // contract gate BEFORE any file lands (see refreshUidHourly)
    if (enforceContract)
      SchemaEvolution.checkCompatible(hourly.sparkSession, outRoot, pairs.schema)
    pairs
      .repartition(buckets, col("uid_a"), col("uid_b"))
      .write.mode(if (replace) "overwrite" else "append")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("year", "month", "day")
      .option("compression", "snappy")
      .parquet(outRoot)
  }

  /** Hash-bucketed catalog table (K4): the real CTAS `bucketed_by` analog
    * (`sql/gold/create_uid_hourly_h3.sql:14-22`). Spark's `bucketBy` requires
    * a catalog table (`saveAsTable`); joins/aggregations keyed on the bucket
    * columns then skip their shuffle entirely — the reference's reason for
    * bucketing gold by mmsi / (uid_a, uid_b). Partition columns are optional.
    */
  def saveAsBucketedTable(df: DataFrame, table: String, buckets: Int,
                          bucketCols: Seq[String], sortCols: Seq[String] = Nil,
                          partitionCols: Seq[String] = Nil): Unit = {
    var w = df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .option("compression", "snappy")
    if (sortCols.nonEmpty) w = w.sortBy(sortCols.head, sortCols.tail: _*)
    if (partitionCols.nonEmpty) w = w.partitionBy(partitionCols: _*)
    w.saveAsTable(table)
  }

  /** Register a path-backed gold table in the catalog and discover its
    * partitions (K5): the reference's `CREATE EXTERNAL TABLE` + `MSCK REPAIR
    * TABLE` step (`refresh_gold_tables.py:298-358,671-678`). Idempotent.
    */
  def registerExternalTable(spark: SparkSession, table: String,
                            location: String): Unit = {
    spark.sql(s"CREATE TABLE IF NOT EXISTS $table USING PARQUET LOCATION '$location'")
    // partition discovery — only meaningful (and legal) for partitioned layouts
    try spark.catalog.recoverPartitions(table)
    catch { case _: org.apache.spark.sql.AnalysisException => () }
  }

  /** Full-range pairs_total rebuild (small output; the reference rebuilds it
    * wholesale each run, `sql/gold/create_pairs_total.sql`).
    */
  def refreshPairsTotal(pairsDailyRoot: String, outRoot: String,
                        threshold: Double, spark: SparkSession): Unit =
    CoMovement.pairsTotal(spark.read.parquet(pairsDailyRoot), threshold)
      .coalesce(1) // per-pair lifetime summary is tiny relative to inputs
      .write.mode("overwrite").option("compression", "snappy").parquet(outRoot)

  /** Small-file compaction (the OPTIMIZE / bin-packing maintenance pass):
    * rewrite a parquet directory into ceil(totalBytes / targetBytes) files.
    * Streaming sinks and per-day incremental refreshes accrete small files;
    * at 100 TB unmanaged file counts dominate scan planning time and NN/
    * metadata pressure, so compaction is a first-class lifecycle op, not
    * housekeeping. Uses `coalesce` (no shuffle — packs existing partitions).
    *
    * Swap protocol: the rewrite lands in a DOT-PREFIXED sibling
    * (`.{name}__compacting`) — hidden from Hadoop file listings and Spark
    * partition discovery, so when `dir` is a partition leaf inside a table
    * root, a concurrent reader of the root can never pick the temp dir up
    * as a bogus extra partition (or double-count the leaf) mid-swap. A
    * The swap itself is ALL-RENAMES: rename `dir` to a dot-prefixed
    * `.{name}__old`, rename the temp into place, delete the old dir. A
    * recursive delete of a live dir can be interrupted half-way, leaving a
    * PARTIAL dir that a heal keyed on "target fully absent" would wrongly
    * treat as authoritative; a rename is atomic per directory entry, so
    * every crash window here is binary and healable: before the first
    * rename `dir` is intact (stale temp truncated next pass); between the
    * renames the completed temp is promoted; after the second rename the
    * orphan `__old` is dropped. Heals run on the next
    * [[compact]]/[[compactPartitions]] over the same path, before
    * anything else.
    */
  def compact(spark: SparkSession, dir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = compactTmpPath(path)
    healInterrupted(fs, path)
    val totalBytes = fs.listStatus(path)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    spark.read.parquet(dir).coalesce(nFiles)
      .write.mode("overwrite").option("compression", "snappy")
      .parquet(tmp.toString)
    val old = compactOldPath(path)
    // Hadoop rename reports failure by RETURNING false — require() both,
    // or a silent failure would let the next step run on the wrong state
    require(fs.rename(path, old), s"compact swap: rename failed: $path -> $old")
    require(fs.rename(tmp, path), s"compact swap: rename failed: $tmp -> $path")
    fs.delete(old, true)
    nFiles
  }

  /** Dot-prefixed swap sibling: invisible to readers (Hadoop input listing
    * and Spark partition discovery skip `.`/`_` names).
    */
  private def compactTmpPath(dir: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(
      dir.getParent, "." + dir.getName + "__compacting")

  private def compactOldPath(dir: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(
      dir.getParent, "." + dir.getName + "__old")

  /** Heal an interrupted all-renames swap. `.{name}__old` existing means a
    * swap was in flight — the temp held the complete rewrite at that
    * moment, so prefer it: promote it if the target slot is empty, then
    * drop the old dir (a crash mid-THIS-delete just re-enters heal; only
    * the renames are load-bearing). The trailing legacy arm heals a
    * pre-round-11 delete-then-rename crash (target fully gone, temp
    * stranded) left by an older build.
    */
  private def healInterrupted(fs: org.apache.hadoop.fs.FileSystem,
                              dir: org.apache.hadoop.fs.Path): Unit = {
    val tmp = compactTmpPath(dir)
    val old = compactOldPath(dir)
    if (fs.exists(old)) {
      if (!fs.exists(dir) && fs.exists(tmp))
        require(fs.rename(tmp, dir), s"heal: rename failed: $tmp -> $dir")
      else if (!fs.exists(dir)) // defensive: temp lost — keep the original
        require(fs.rename(old, dir), s"heal: rename failed: $old -> $dir")
      fs.delete(old, true)
      ()
    } else if (!fs.exists(dir) && fs.exists(tmp)) {
      require(fs.rename(tmp, dir), s"heal: rename failed: $tmp -> $dir")
      ()
    }
  }

  /** Selective per-partition small-file compaction for a PARTITIONED gold
    * table: walk the partition tree, rewrite only the leaf partitions whose
    * parquet file count exceeds `maxFiles` (via [[compact]]'s swap — a
    * reader never sees a half-compacted leaf), leave healthy partitions
    * byte-untouched. Incremental refreshes concentrate small files in the
    * recent partitions, so table-wide rewrites burn a full table scan to
    * fix a handful of days — selective maintenance touches only the
    * offenders, which is the only shape that survives a 100 TB table with
    * years of history. Returns (partitionPath, filesBefore, filesAfter)
    * for the audit log.
    */
  def compactPartitions(spark: SparkSession, root: String, targetBytes: Long,
                        maxFiles: Int = 8): Seq[(String, Int, Int)] = {
    require(maxFiles >= 1, "maxFiles must be at least 1")
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      // ONE listing per directory (this pass exists to relieve metadata
      // pressure — it must not double it). Skip hidden/system names
      // (_SUCCESS, _temporary, .X__compacting) like readers do, so a swap
      // temp is never a "leaf"; an interrupted swap shows up as an orphan
      // temp whose TARGET leaf is gone — heal it, then re-list only that
      // healed directory level.
      val listed = fs.listStatus(p).toSeq
      val healed = listed.filter(s => s.isDirectory &&
          s.getPath.getName.startsWith(".") &&
          (s.getPath.getName.endsWith("__compacting") ||
            s.getPath.getName.endsWith("__old")))
        .map { s =>
          val target = new org.apache.hadoop.fs.Path(p,
            s.getPath.getName.stripPrefix(".")
              .stripSuffix("__compacting").stripSuffix("__old"))
          healInterrupted(fs, target)
          target
        }
      val entries = (if (healed.isEmpty) listed
        else fs.listStatus(p).toSeq)
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
      val dirs = entries.filter(_.isDirectory)
      if (dirs.isEmpty) Seq(p) else dirs.flatMap(d => leaves(d.getPath))
    }
    leaves(rootPath).flatMap { leaf =>
      val before = fs.listStatus(leaf)
        .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      if (before > maxFiles) {
        val after = compact(spark, leaf.toString, targetBytes)
        Some((leaf.toString, before, after))
      } else None
    }
  }

  /** Z-order-clustered parquet write: range-partition on the Morton key of
    * (xCol, yCol) and sort within each partition, so every output file owns
    * a compact 2-D tile — parquet min/max row-group stats then prune scans
    * filtered on EITHER column, not just a leading sort column. `nFiles`
    * controls the file-count/tile-size trade (the same knob as bucket
    * count). See SCALING.md "Layout for data skipping".
    */
  def writeZOrdered(df: DataFrame, outRoot: String, xCol: String, yCol: String,
                    nFiles: Int): Unit = {
    require(nFiles > 0, "nFiles must be positive")
    val zkey = graft.functions.z_order(col(xCol), col(yCol))
    df.withColumn("__z", zkey)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").option("compression", "snappy").parquet(outRoot)
  }

  /** TORN-READ-FREE per-partition compaction for a CATALOG-registered gold
    * table ([[registerExternalTable]] / K5): rewrite each oversized
    * partition to a fresh sibling location and flip the partition's
    * registered LOCATION in the catalog — one atomic metadata update per
    * partition, which is the only genuinely atomic "replace a directory's
    * contents" primitive a raw filesystem/object store offers.
    * [[compactPartitions]]' all-renames dir swap is crash-SAFE but not
    * reader-ATOMIC: a path-based reader listing the table root between the
    * two renames sees the leaf missing, and one that planned file paths
    * before the swap hits FileNotFound after the old dir is deleted. The
    * catalog swap has neither window: readers planning through
    * `spark.table` resolve the partition's CURRENT location; readers
    * mid-scan keep the OLD files, which stay on disk until a later
    * [[sweepOrphans]] pass (deferred deletion — the grace period must
    * exceed reader planning-to-finish lifetime, including any session's
    * relation-cache staleness, before a sweep runs).
    *
    * Fresh locations are `<leaf>__c<k>` siblings (monotonic k), so repeated
    * maintenance never reuses a live name. Returns
    * (partitionSpec, filesBefore, filesAfter). Partition VALUES must be
    * escape-free strings/numbers/dates (the same contract the standing
    * store documents); the spec SQL quotes but does not escape.
    */
  /** Crash/interleave-rehearsal seam for [[compactPartitionsCatalog]]:
    * invoked at the three windows whose torn-read-free claims a crash or a
    * racing maintainer actually exercises — `"before_rewrite"` (partition
    * selected, no sibling yet), `"after_rewrite"` (fresh `__c<k>` written,
    * catalog NOT yet flipped) and `"after_flip"` (catalog flipped, old
    * leaf not yet swept). The maintenance-vs-maintenance spec
    * (GoldConcurrencySpec) runs a full [[sweepOrphans]] pass at each
    * boundary to prove the tombstone protocol holds at every interleaving
    * point the seam exposes.
    * [[graft.CompactCrashRehearsal]] installs `Runtime.halt` here from a
    * throwaway JVM; production never touches it (no-op default, zero cost
    * beyond a call). The call sits OUTSIDE any try/finally on purpose: a
    * halt must model a hard crash, not an exception a cleanup path could
    * soften.
    */
  private[graft] var maintenanceBoundaryHook: String => Unit = _ => ()

  def compactPartitionsCatalog(spark: SparkSession, table: String,
                               targetBytes: Long,
                               maxFiles: Int = 8): Seq[(String, Int, Int)] = {
    require(maxFiles >= 1, "maxFiles must be at least 1")
    require(targetBytes > 0, "targetBytes must be positive")
    val cat = spark.sharedState.externalCatalog
    val db = spark.catalog.currentDatabase
    val partCols = cat.getTable(db, table).partitionColumnNames
    cat.listPartitions(db, table).flatMap { p =>
      val loc = new org.apache.hadoop.fs.Path(p.storage.locationUri.get)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // ONE listing serves both the file count and the byte total — this
      // pass exists to relieve metadata pressure, not to double-bill it
      val parquet = fs.listStatus(loc)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      val before = parquet.length
      if (before <= maxFiles) None
      else {
        val totalBytes = parquet.map(_.getLen).sum
        val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
        // next __c sibling: strip a previous __c<k> suffix (keeps names
        // flat across repeated maintenance), then take max+1 over every
        // sibling that has ever existed — never reuse a live name
        val n0 = loc.getName
        val i = n0.lastIndexOf("__c")
        val base =
          if (i > 0 && n0.length > i + 3 && n0.drop(i + 3).forall(_.isDigit))
            n0.take(i)
          else n0
        val taken = fs.listStatus(loc.getParent).map(_.getPath.getName)
          .filter(n => n.startsWith(base + "__c") &&
            n.length > base.length + 3 &&
            n.drop(base.length + 3).forall(_.isDigit))
          .map(_.drop(base.length + 3).toLong)
        val next = new org.apache.hadoop.fs.Path(loc.getParent,
          s"${base}__c${if (taken.isEmpty) 1L else taken.max + 1L}")
        maintenanceBoundaryHook("before_rewrite")
        spark.read.parquet(loc.toString).coalesce(nFiles)
          .write.mode("overwrite").option("compression", "snappy")
          .parquet(next.toString)
        maintenanceBoundaryHook("after_rewrite")
        val specSql = partCols.map(c => s"$c='${p.spec(c)}'").mkString(", ")
        // Loud-failure guard on the rewrite->flip window: if anything (a
        // sweep whose tombstone aged out during an extreme stall, an
        // operator rm) removed the fresh sibling, fail HERE with the
        // partition still on its old, intact location — never register a
        // location that no longer exists. Shrinks the dangling-pointer
        // hazard from the whole stall to the exists-check->ALTER instant.
        if (!fs.exists(next))
          throw new IllegalStateException(
            s"compaction sibling $next vanished before the catalog flip " +
              s"(concurrent sweepOrphans with too-short grace?); partition " +
              s"($specSql) left on its current location")
        // Tombstone hygiene, ORDERED around the flip so neither leaf is
        // ever exposed in a deletable state:
        //   - the OLD leaf's stale marker (it may itself have been a
        //     marked pre-ALTER sibling once) is cleared BEFORE the ALTER,
        //     while the leaf is still live and no sweep may delete it —
        //     clearing it after would leave the just-orphaned leaf
        //     wearing an aged marker through the ALTER->delete window,
        //     where a crash or a racing sweep takes it with ZERO grace;
        //   - the NEW location's marker (planted by a sweep that observed
        //     it as a non-live sibling) is cleared AFTER the ALTER, when
        //     fresh sweeps see it live and will not re-plant — clearing
        //     it before invites a stale-snapshot sweep to re-plant inside
        //     the delete->ALTER window. A stale marker that still lands
        //     post-cleanup is harmless: every fresh sweep's live-leaf
        //     pass removes it, and the next flip's pre-ALTER cleanup
        //     (above) is the backstop that restores full grace anyway.
        val oldMarker = new org.apache.hadoop.fs.Path(loc, OrphanMarker)
        // The delete RESULT matters: a failed delete silently leaves an
        // aged tombstone on the about-to-be-orphaned leaf, recreating the
        // zero-grace deletion hazard this pre-ALTER hygiene exists to
        // prevent. Abort the flip loudly (partition still on its old,
        // intact location) rather than flip into that state — mirroring
        // the vanished-sibling guard above. `delete` returning false with
        // the marker still present is the failure; false because a racing
        // sweep's live-leaf pass already removed it is fine.
        if (fs.exists(oldMarker) && !fs.delete(oldMarker, false) &&
          fs.exists(oldMarker))
          throw new IllegalStateException(
            s"could not clear stale orphan marker $oldMarker before the " +
              s"catalog flip; aborting compaction of ($specSql) — flipping " +
              s"would leave the old leaf wearing an aged tombstone with " +
              s"zero sweep grace")
        // the atomic flip: one metastore update, no filesystem window
        spark.sql(s"ALTER TABLE $table PARTITION ($specSql) " +
          s"SET LOCATION '${next.toString}'")
        val nextMarker = new org.apache.hadoop.fs.Path(next, OrphanMarker)
        if (fs.exists(nextMarker)) fs.delete(nextMarker, false)
        maintenanceBoundaryHook("after_flip")
        val after = fs.listStatus(next)
          .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        Some((specSql, before, after))
      }
    }
  }

  /** Default [[sweepOrphans]] grace: 15 minutes. Must exceed the longest
    * reader planning-to-finish lifetime (including relation-cache
    * staleness in other sessions) for the deployment; tests pass 0.
    */
  val DefaultSweepGraceMs: Long = 15L * 60 * 1000

  /** Tombstone a sweep plants inside a leaf on FIRST observing it orphaned;
    * deletion waits until the tombstone itself is older than the grace.
    * Underscore-prefixed, so Spark/parquet readers never see it.
    */
  private[graft] val OrphanMarker = "_ORPHANED"

  /** Deferred-deletion half of [[compactPartitionsCatalog]]: delete leaf
    * directories under the table's partition tree that are no longer ANY
    * partition's registered location. The grace period is ENFORCED via
    * first-observation tombstones, and it measures TIME SINCE ORPHANED —
    * not content age, which is the wrong clock (a partition whose files
    * were written days ago gets ZERO protection from a content-mtime gate
    * the moment a compaction flips it):
    *
    *   - on first observing a non-live leaf, a sweep plants an
    *     [[OrphanMarker]] tombstone inside it and deletes NOTHING;
    *   - a later sweep deletes the leaf only when BOTH the tombstone and
    *     the newest content are older than `graceMs` (the content gate
    *     keeps a leaf that is still being written — e.g. a concurrent
    *     compaction's in-progress `__c<k>` sibling — alive regardless of
    *     when it was first observed);
    *   - a tombstoned leaf that becomes LIVE again (a stalled compaction's
    *     ALTER finally landing) has its tombstone removed, never its data.
    *
    * This covers the two hazards the gate exists for: an in-flight reader
    * (or a stale relation cache) gets at least `graceMs` from the moment a
    * sweep first SEES the orphan — observation is never earlier than the
    * orphaning itself, so the wait is conservative (the two-session
    * LiveReader spec pins the in-flight-scan case); and a concurrent
    * compaction's pre-ALTER sibling survives unless it stays non-live
    * across two sweep passes spanning a full grace period — and even that
    * extreme stall fails LOUDLY, not silently, because
    * [[compactPartitionsCatalog]] re-checks the sibling exists immediately
    * before the flip and aborts with the partition still on its old
    * location.
    *
    * `graceMs <= 0` is the explicit no-grace fast path (tests, and
    * operators who have externally verified no reader is in flight):
    * non-live leaves are deleted immediately, no tombstones involved.
    * Returns the deleted paths (tombstone-only passes return empty).
    */
  def sweepOrphans(spark: SparkSession, table: String,
                   graceMs: Long = DefaultSweepGraceMs): Seq[String] = {
    val cat = spark.sharedState.externalCatalog
    val db = spark.catalog.currentDatabase
    val live = cat.listPartitions(db, table)
      .flatMap(_.storage.locationUri).map(u =>
        new org.apache.hadoop.fs.Path(u).toUri.getPath).toSet
    val root = new org.apache.hadoop.fs.Path(
      cat.getTable(db, table).storage.locationUri.get)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(p: org.apache.hadoop.fs.Path): Seq[org.apache.hadoop.fs.Path] = {
      val entries = fs.listStatus(p).toSeq
        .filterNot(s => s.getPath.getName.startsWith("_") ||
          s.getPath.getName.startsWith("."))
      val dirs = entries.filter(_.isDirectory)
      if (dirs.isEmpty) Seq(p) else dirs.flatMap(d => leaves(d.getPath))
    }
    val cutoff = System.currentTimeMillis() - graceMs
    // RECURSIVE newest mtime: committer writes land deep under
    // _temporary/<attempt>/..., which never bumps the leaf dir's or its
    // direct children's mtimes — a top-level-only check would age out a
    // sibling MID-WRITE and delete it under the writer. Orphan candidates
    // are single partition leaves, so the walk is small. An entry that
    // VANISHES mid-walk (a committer task/job rename or delete racing the
    // listing) is proof the tree is being actively mutated — that IS
    // fresh content, so report "now" rather than aborting the whole
    // sweep pass on a FileNotFoundException.
    def newestMs(p: org.apache.hadoop.fs.Path): Long =
      try {
        val kids = fs.listStatus(p)
        (fs.getFileStatus(p).getModificationTime +: kids.toSeq.map(s =>
          if (s.isDirectory) math.max(s.getModificationTime, newestMs(s.getPath))
          else s.getModificationTime)).max
      } catch {
        case _: java.io.FileNotFoundException => System.currentTimeMillis()
      }
    if (!fs.exists(root)) Seq.empty
    else {
      val (liveLeaves, orphans) = leaves(root).filter(_ != root)
        .partition(l => live.contains(l.toUri.getPath))
      liveLeaves.foreach { l =>
        val m = new org.apache.hadoop.fs.Path(l, OrphanMarker)
        if (fs.exists(m)) fs.delete(m, false)
      }
      orphans.flatMap { orphan =>
        if (graceMs <= 0L) { fs.delete(orphan, true); Some(orphan.toString) }
        else {
          val m = new org.apache.hadoop.fs.Path(orphan, OrphanMarker)
          // The marker mtime read gets the same FNFE treatment as
          // newestMs: a concurrent flip's pre-ALTER marker hygiene can
          // remove the tombstone between the exists check and this stat.
          // A vanished marker means a maintainer is actively working the
          // leaf — treat it as not-yet-aged and skip the leaf this pass
          // (the next sweep re-observes from scratch) instead of aborting
          // the whole sweep on the exception.
          val markerMs =
            try {
              if (!fs.exists(m)) { fs.create(m, true).close(); None }
              else Some(fs.getFileStatus(m).getModificationTime)
            } catch {
              case _: java.io.FileNotFoundException => None
            }
          if (markerMs.exists(_ <= cutoff) && newestMs(orphan) <= cutoff) {
            fs.delete(orphan, true); Some(orphan.toString)
          } else None
        }
      }
    }
  }
}
