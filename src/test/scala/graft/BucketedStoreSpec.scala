package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}

import graft.streaming.BucketedDigestStore

/** Unit pins for the r19 tiered digest store ([[BucketedDigestStore]]):
  * pruned-read completeness, automatic flat-store migration, the
  * layout-modulus marker's loud mismatch, crash-window heal of the base
  * swap, and merge idempotence across zones.
  */
class BucketedStoreSpec extends SparkSpec {

  private val schema = StructType(Seq(StructField("seg_key", BinaryType)))
  private def digests(seed: String, n: Int) = {
    import spark.implicits._
    (0 until n).map(i => s"$seed-$i").toDF("s")
      .select(unhex(md5(col("s"))).as("seg_key"))
  }
  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString + "/store"
  private def fs =
    new org.apache.hadoop.fs.Path("/").getFileSystem(
      spark.sparkContext.hadoopConfiguration)

  test("pruned read finds every standing digest its batch keys hash to") {
    val store = tmp("bds-pruned")
    val nB = 16
    BucketedDigestStore.append(digests("a", 500), store)
    BucketedDigestStore.compact(spark, store, schema, "seg_key", nB)
    // probe with a subset of the standing digests: every one must be
    // found through the PRUNED base read (no delta, no legacy)
    val probe = digests("a", 500).limit(120)
    val touched = probe
      .select(BucketedDigestStore.kbExpr("seg_key", nB).as("kb"))
      .distinct().collect().map(_.getInt(0)).toIndexedSeq
    val standing = BucketedDigestStore.read(spark, store, schema, "seg_key",
      touched, nB)
    val found = standing.join(probe, Seq("seg_key"), "left_semi")
      .distinct().count()
    assert(found === 120L, "pruning must never lose a standing digest")
    // and the pruned read really is a subset of the base when buckets
    // are missing from `touched`
    val partial = BucketedDigestStore.read(spark, store, schema, "seg_key",
      touched.take(3), nB).count()
    assert(partial < 500L, "a partial bucket list must prune the base scan")
  }

  test("first compaction folds legacy flat files into the base and removes them") {
    val store = tmp("bds-migrate")
    // legacy flat store: three appends, one duplicated digest set
    (1 to 3).foreach(_ => digests("leg", 40).write.mode("append").parquet(store))
    BucketedDigestStore.append(digests("new", 10), store)
    BucketedDigestStore.compact(spark, store, schema, "seg_key", 8)
    val root = new java.io.File(store)
    assert(!root.listFiles.exists(f =>
      f.isFile && f.getName.endsWith(".parquet")),
      "legacy flat files must be deleted after the merge")
    val all = BucketedDigestStore.readAll(spark, store, schema)
    assert(all.count() === 50L, "base = distinct(legacy ∪ delta)")
    assert(all.distinct().count() === 50L)
  }

  test("a changed bucket modulus fails loudly, never silently mis-prunes") {
    val store = tmp("bds-marker")
    BucketedDigestStore.append(digests("m", 20), store)
    BucketedDigestStore.compact(spark, store, schema, "seg_key", 8)
    val e = intercept[IllegalArgumentException] {
      BucketedDigestStore.read(spark, store, schema, "seg_key", Seq(0), 16)
    }
    assert(e.getMessage.contains("nBuckets=8"))
  }

  test("base swap interrupted after snapshot write heals; merged rows survive") {
    val store = tmp("bds-heal")
    BucketedDigestStore.append(digests("h", 30), store)
    BucketedDigestStore.compact(spark, store, schema, "seg_key", 8)
    // simulate the crash window: base fully renamed away (old present),
    // snapshot present — the shared StandingStore heal discipline
    val base = new org.apache.hadoop.fs.Path(store + "/base")
    val old = new org.apache.hadoop.fs.Path(store + "/base.old")
    val snap = new org.apache.hadoop.fs.Path(store + "/base.compact")
    assert(fs.rename(base, snap)) // stand in for a completed snapshot
    fs.mkdirs(old)
    val all = BucketedDigestStore.readAll(spark, store, schema)
    assert(all.count() === 30L, "heal must promote the snapshot")
    assert(!fs.exists(old) && !fs.exists(snap))
  }

  test("a replayed compaction (duplicates across zones) stays a set") {
    val store = tmp("bds-replay")
    BucketedDigestStore.append(digests("r", 25), store)
    BucketedDigestStore.compact(spark, store, schema, "seg_key", 8)
    // torn replay: the same digests appended again post-compaction
    BucketedDigestStore.append(digests("r", 25), store)
    val touched = (0 until 8).toIndexedSeq
    val standing = BucketedDigestStore.read(spark, store, schema, "seg_key",
      touched, 8)
    assert(standing.count() === 50L, "raw zones hold the duplicate rows")
    assert(standing.distinct().count() === 25L,
      "probes distinct — replay cannot change a membership verdict")
    BucketedDigestStore.compact(spark, store, schema, "seg_key", 8)
    assert(BucketedDigestStore.readAll(spark, store, schema).count() === 25L,
      "re-compaction squeezes the replay duplicates back out")
  }
}
