package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Immutable dataset snapshots with an atomic latest pointer — the
  * reproducibility primitive a training-data pipeline needs: a training
  * run records the VERSION it consumed, and that version re-reads
  * byte-identically forever, while curation keeps publishing newer ones.
  * The reference's gold lifecycle overwrites in place
  * (`refresh_gold_tables.py` replace mode), which is right for dashboards
  * and wrong for reproducing a model: yesterday's corpus is gone the
  * moment today's lands.
  *
  * Layout: `root/v=N/` per published version (immutable once it exists),
  * plus a one-line `root/_latest` pointer file. Publication protocol:
  * write the full data to a HIDDEN staging dir (`.staging-v=N` — readers,
  * `versions`, and `prune` never see dot-names), rename it to `v=N` (a
  * version dir therefore only ever appears COMPLETE), then swap the
  * pointer via write-temp + atomic rename. Consequences:
  *   - a crash mid-write leaves only hidden staging debris — no partial
  *     ever becomes a version, consumes a version number, or distorts
  *     retention; the next publish overwrites the staging dir;
  *   - a crash between the version rename and the pointer swap loses only
  *     the pointer move — the publish is invisible and re-running it
  *     publishes the NEXT number (the completed orphan is still a valid,
  *     readable version);
  *   - concurrent readers during a publish keep reading the old version —
  *     there is no in-place mutation anywhere. Single WRITER assumed
  *     (publishes are a pipeline step, not a concurrent API).
  *
  * Scale: versioning is METADATA plus the published write itself — no
  * copy, no manifest rewrite proportional to history. Retention
  * ([[prune]]) deletes whole version dirs oldest-first, never the one the
  * pointer names.
  */
object Snapshots {

  private val Pointer = "_latest"

  /** Publish `df` as the next version and move the pointer to it.
    * Returns the published version number.
    *
    * `enforceContract` (default on) diffs `df` against the POINTER's
    * version before anything is written: consumers pin `readLatest` into
    * jobs, so a publish that drops or retypes a column breaks every one
    * of them at read time — the gate surfaces it at publish time instead
    * ([[SchemaEvolution.ContractViolation]]). Additive/widening evolution
    * still publishes. Opt out for an intentional contract break (readers
    * must migrate).
    */
  def publish(df: DataFrame, root: String,
              enforceContract: Boolean = true): Long = {
    val spark = df.sparkSession
    if (enforceContract)
      latestVersion(spark, root).foreach { v =>
        SchemaEvolution.checkCompatible(spark, s"$root/v=$v", df.schema)
      }
    val fs = fsOf(spark, root)
    val next = versions(spark, root).lastOption.getOrElse(0L) + 1L
    val staging = new Path(root, s".staging-v=$next")
    df.write.mode("overwrite").parquet(staging.toString)
    // Hadoop rename reports failure by RETURNING false (dest exists, parent
    // listing raced, ...). An unchecked failure here would still advance
    // the pointer to a version dir that doesn't exist — breaking the
    // invariant that the pointer always names a committed, readable
    // version. Fail the publish BEFORE the pointer moves.
    val dst = new Path(root, s"v=$next")
    require(fs.rename(staging, dst),
      s"publish: staging rename failed: $staging -> $dst")
    writePointer(spark, root, next)
    next
  }

  /** Read the version the pointer names (the newest COMMITTED publish). */
  def readLatest(spark: SparkSession, root: String): DataFrame =
    readVersion(spark, root, latestVersion(spark, root)
      .getOrElse(throw new IllegalStateException(
        s"no committed snapshot under $root")))

  /** Read one pinned, immutable version. */
  def readVersion(spark: SparkSession, root: String, v: Long): DataFrame =
    spark.read.parquet(s"$root/v=$v")

  /** Committed latest version per the pointer; None before any publish.
    * The swap is delete-then-rename (local FS rename refuses an existing
    * destination), so a reader landing exactly in that gap — or after a
    * crash inside it — falls back to the `.tmp` side, which is always
    * fully written and closed before the swap begins. Opens race the
    * swap's delete/rename, so a vanished file between the exists check
    * and the open is the SAME gap, not an error — each side retries as
    * absent, and one more pass over the pair covers the tmp→pointer
    * rename landing mid-lookup.
    */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val fs = fsOf(spark, root)
    def readAt(p: Path): Option[Long] =
      try {
        val in = fs.open(p)
        try {
          val r = new java.io.BufferedReader(
            new java.io.InputStreamReader(in, StandardCharsets.UTF_8))
          Option(r.readLine()).map(_.trim.toLong)
        } finally in.close()
      } catch { case _: java.io.FileNotFoundException => None }
    def attempt(): Option[Long] =
      readAt(new Path(root, Pointer))
        .orElse(readAt(new Path(root, s"$Pointer.tmp")))
    attempt().orElse(attempt())
  }

  /** Version numbers present on disk, ascending. Every listed version is
    * COMPLETE — data lands in a hidden staging dir and only renames to
    * `v=N` after the write commits, so a crashed publish contributes
    * nothing here.
    */
  def versions(spark: SparkSession, root: String): Seq[Long] = {
    val fs = fsOf(spark, root)
    val p = new Path(root)
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .map(_.getPath.getName.stripPrefix("v=").toLong)
      .sorted
  }

  /** Delete versions oldest-first down to `keep`, never touching the
    * pointer's target (a pinned training run re-reads its version until
    * retention explicitly outlives it — callers own that policy).
    */
  def prune(spark: SparkSession, root: String, keep: Int): Seq[Long] = {
    require(keep >= 1, "keep must retain at least one version")
    val fs = fsOf(spark, root)
    val all = versions(spark, root)
    val protect = all.takeRight(keep).toSet ++ latestVersion(spark, root)
    val toDrop = all.filterNot(protect)
    toDrop.foreach(v => fs.delete(new Path(s"$root/v=$v"), true))
    toDrop
  }

  private def writePointer(spark: SparkSession, root: String, v: Long): Unit = {
    val fs = fsOf(spark, root)
    val tmp = new Path(root, s"$Pointer.tmp")
    val out = fs.create(tmp, true)
    try out.write(v.toString.getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dst = new Path(root, Pointer)
    if (fs.exists(dst)) fs.delete(dst, false)
    // checked for the same reason as the version rename in [[publish]]: a
    // silent false would leave the pointer stale (or absent with only the
    // .tmp side readable) while the caller believes the swap landed
    require(fs.rename(tmp, dst), s"pointer swap: rename failed: $tmp -> $dst")
    ()
  }

  private def fsOf(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
}
