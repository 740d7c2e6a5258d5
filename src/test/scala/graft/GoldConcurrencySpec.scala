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

    // the grace period is ENFORCED: at the default grace the just-orphaned
    // leaves are younger than the cutoff and must survive the sweep (this
    // is also the guard that protects a concurrent compaction's pre-ALTER
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
}
