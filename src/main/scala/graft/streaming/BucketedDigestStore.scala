package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Digest-range-partitioned standing store for the scrub membership
  * probes — the r19 answer to the steepest remaining StreamBench ladder
  * (scrub 3.71× last/first at 10M digests, adjudicated "scan floor" in
  * r17 while near-dup's r18 band partitioning showed the same floor class
  * yields to layout).
  *
  * Why not just `partitionBy(kb)` like the near-dup/comove stores: a
  * digest store's partition key is a HASH — every micro-batch's keys are
  * uniformly spread, so a directly-partitioned append writes one near-empty
  * file per touched bucket per batch (~|batch keys| tiny files every
  * batch), and at useful bucket counts the accreted file count destroys
  * both the probe scan and the listing long before pruning pays. The
  * layout that survives is the LSM discipline:
  *
  *   - **delta zone** (`<store>/delta/`): per-batch appends land FLAT,
  *     one small file per batch ([[append]] coalesces — the kept-digest
  *     set is ≤ batch segments, already broadcast-bounded by the stream's
  *     boundedness contract). Probes read the delta in full; it holds at
  *     most `compactEvery` batches of digests, so this term is O(batch),
  *     not O(history).
  *   - **base zone** (`<store>/base/`): the compacted history, laid out
  *     `partitionBy(kb)` where `kb = pmod(xxhash64(digest), nBuckets)`,
  *     one file per bucket (compaction repartitions by kb and sorts
  *     within), digests distinct. Probes read the base PRUNED to the
  *     buckets the batch's keys actually hash into
  *     ([[StandingStore.readPartitions]] — O(touched) existence checks,
  *     no root listing), so the per-batch base scan is
  *     `store × touchedFraction`, and `touchedFraction → |batch| / nBuckets`
  *     as the corpus outgrows the batch — the regime a 100 TB deployment
  *     lives in. At ladder shapes (~1k keys, 4096 buckets) this reads
  *     ~22% of the base instead of 100%.
  *   - **legacy zone**: a pre-existing FLAT store's root-level parquet
  *     files keep being read in full until the first [[compact]] folds
  *     them into the base and removes them — migration is automatic and
  *     crash-safe (the comove r15 flat-store precedent, but lazier: no
  *     stop-the-world rewrite before the first append).
  *
  * Compaction merges all three zones `distinct` into a fresh base via
  * [[StandingStore.rewrite]]'s all-renames snapshot swap (same binary
  * crash windows, same heal), then deletes the merged delta/legacy files.
  * A crash between swap and delete leaves digests present in both base
  * and delta — harmless, the stores mean SETS and every probe distincts.
  *
  * `nBuckets` is a LAYOUT constant per store: the probe recomputes
  * `kb = hash mod nBuckets` per batch, so a changed value would prune
  * against dirs laid out under the old modulus and silently MISS standing
  * digests (missed duplicates, wrong output). A `_kb_buckets` marker at
  * the store root pins the value at layout birth; reads and compactions
  * fail loudly on mismatch.
  */
object BucketedDigestStore {

  private val Marker = "_kb_buckets"

  /** The bucket expression — the store's on-disk layout function. xxhash64
    * (seed 42) is bit-stable across Spark releases and executors; the
    * digest column is binary, hashed whole.
    */
  def kbExpr(digestCol: String, nBuckets: Int) =
    pmod(xxhash64(col(digestCol)), lit(nBuckets.toLong)).cast(IntegerType)

  private def baseDir(storeDir: String) = s"$storeDir/base"
  private def deltaDir(storeDir: String) = s"$storeDir/delta"

  /** Append a batch's new digests: one flat file into the delta zone. The
    * frame is ≤ the batch's distinct digests (broadcast-bounded upstream),
    * so the coalesce costs nothing and caps file accretion at one file per
    * micro-batch regardless of bucket count.
    */
  def append(df: DataFrame, storeDir: String): Unit =
    StandingStore.append(df.coalesce(1), deltaDir(storeDir))

  /** Standing read for a membership probe: pruned base ∪ full delta ∪
    * legacy flat files. `touchedKb` is the distinct `kb` values of the
    * BATCH's keys (driver-collected by the caller — bounded by nBuckets);
    * base partitions outside it cannot hold a matching digest, by
    * construction of `kb`.
    */
  def read(spark: SparkSession, storeDir: String, schema: StructType,
           digestCol: String, touchedKb: Seq[Int],
           nBuckets: Int): DataFrame = {
    checkMarker(spark, storeDir, nBuckets, writeIfAbsent = false)
    val p = new Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!isTiered(fs, storeDir))
      // pure flat (or absent) store: the shared flat read, verbatim —
      // including its heal of a flat-era interrupted compaction swap,
      // which a file listing here would silently lose
      return StandingStore.read(spark, storeDir, schema)
    val withKb = StructType(schema.fields :+
      StructField("kb", IntegerType, nullable = true))
    val base = StandingStore.readPartitions(spark, baseDir(storeDir),
      withKb, "kb", touchedKb).drop("kb")
    val delta = StandingStore.read(spark, deltaDir(storeDir), schema)
    base.unionByName(delta).unionByName(legacyRead(spark, storeDir, schema))
  }

  /** Full (unpruned) standing read across all three zones — maintenance
    * and audit reads; probes use [[read]].
    */
  def readAll(spark: SparkSession, storeDir: String,
              schema: StructType): DataFrame = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!isTiered(fs, storeDir))
      return StandingStore.read(spark, storeDir, schema)
    val withKb = StructType(schema.fields :+
      StructField("kb", IntegerType, nullable = true))
    val base = StandingStore.read(spark, baseDir(storeDir), withKb)
      .drop("kb")
    val delta = StandingStore.read(spark, deltaDir(storeDir), schema)
    base.unionByName(delta).unionByName(legacyRead(spark, storeDir, schema))
  }

  private[streaming] def isTiered(fs: org.apache.hadoop.fs.FileSystem,
                                  storeDir: String): Boolean =
    fs.exists(new Path(baseDir(storeDir))) ||
      fs.exists(new Path(deltaDir(storeDir)))

  /** Fold delta + legacy into a freshly bucketed, sorted, distinct base
    * via the shared crash-safe snapshot swap, then drop the merged files.
    * Runs inside foreachBatch (sequential), so nothing appends
    * concurrently; every crash window leaves either the complete old
    * state or a superset (duplicates across zones), never a loss.
    */
  def compact(spark: SparkSession, storeDir: String, schema: StructType,
              digestCol: String, nBuckets: Int): Unit = {
    checkMarker(spark, storeDir, nBuckets, writeIfAbsent = true)
    val bp = new Path(baseDir(storeDir))
    val fs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a FLAT-era interrupted swap may have left the whole store stranded
    // in <store>.compact — promote it before listing the legacy zone, or
    // the merge would silently miss that history
    StandingStore.heal(fs, new Path(storeDir))
    // capture the merge inputs BEFORE the rewrite: files appended by a
    // hypothetical later batch must not be deleted unmerged (foreachBatch
    // is sequential today; the capture makes the discipline explicit)
    val deltaFiles = listParquet(fs, new Path(deltaDir(storeDir)))
    val legacyFiles = listParquet(fs, new Path(storeDir))
    if (!fs.exists(bp)) {
      // seed an empty base so the rewrite's swap machinery (and its heal)
      // covers the first compaction too: an empty partitioned write is
      // just a dir with _SUCCESS, read back as zero rows of the schema
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          StructType(schema.fields))
        .withColumn("kb", lit(null).cast(IntegerType))
        .write.mode("overwrite").parquet(bp.toString)
    }
    val withKb = StructType(schema.fields :+
      StructField("kb", IntegerType, nullable = true))
    val delta =
      if (deltaFiles.isEmpty) None
      else Some(spark.read.schema(schema).parquet(deltaFiles: _*))
    val legacy =
      if (legacyFiles.isEmpty) None
      else Some(spark.read.schema(schema).parquet(legacyFiles: _*))
    StandingStore.rewrite(spark, baseDir(storeDir), withKb, { base =>
      val cols = schema.fieldNames.toIndexedSeq.map(col)
      val all = (Seq(base.select(cols: _*)) ++ delta ++ legacy)
        .reduce(_ unionByName _)
      // distinct, re-bucketed, one file per bucket (kb-keyed repartition
      // puts each bucket wholly in one task), digest-sorted within files
      all.distinct()
        .withColumn("kb", kbExpr(digestCol, nBuckets))
        .repartition(col("kb"))
        .sortWithinPartitions(col("kb"), col(digestCol))
    }, Seq("kb"))
    // merged inputs are now redundant copies of base rows — delete AFTER
    // the swap committed; a crash mid-delete only leaves harmless dups
    deltaFiles.foreach(f => fs.delete(new Path(f), false))
    legacyFiles.foreach(f => fs.delete(new Path(f), false))
  }

  /** Root-level flat parquet files — a legacy pre-bucketed store's rows,
    * read in full until compaction folds them into the base.
    */
  private def legacyRead(spark: SparkSession, storeDir: String,
                         schema: StructType): DataFrame = {
    val p = new Path(storeDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = listParquet(fs, p)
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(files: _*)
  }

  private def listParquet(fs: org.apache.hadoop.fs.FileSystem,
                          p: Path): Seq[String] =
    if (!fs.exists(p)) Nil
    else fs.listStatus(p).toIndexedSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString)

  /** Pin `nBuckets` at layout birth and fail loudly on mismatch ever
    * after — a silently changed modulus would prune against the wrong
    * dirs and MISS standing digests. Verified once per (JVM, store).
    */
  private def checkMarker(spark: SparkSession, storeDir: String,
                          nBuckets: Int, writeIfAbsent: Boolean): Unit = {
    // the cache holds the store's RECORDED modulus, so even a cache hit
    // re-validates — two streams in one JVM disagreeing on nBuckets for
    // the same store must fail as loudly as a cross-restart mismatch
    val cached = recorded.get(storeDir)
    val known: Option[Int] =
      if (cached != null) Some(cached.intValue)
      else {
        val mp = new Path(storeDir, Marker)
        val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(mp)) {
          val in = fs.open(mp)
          val v =
            try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim.toInt
            finally in.close()
          recorded.put(storeDir, v)
          Some(v)
        } else if (writeIfAbsent) {
          val out = fs.create(mp, true)
          try out.write(s"$nBuckets\n".getBytes("UTF-8")) finally out.close()
          recorded.put(storeDir, nBuckets)
          Some(nBuckets)
        } else None
      }
    known.foreach { rec =>
      require(rec == nBuckets,
        s"digest store $storeDir was laid out with nBuckets=$rec " +
          s"but this stream was configured with $nBuckets — a changed " +
          s"modulus silently misses standing digests. Recompact the " +
          s"store under the new value (or restore the old setting).")
    }
  }

  private val recorded =
    new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}
