package graft

import java.io.FileOutputStream
import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDate
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.ops.{CoMovement, GoldPipeline, SilverIngest}
import graft.sources.{ArchiveIndex, ArchiveSource, BronzeLanding}

/** Gold materialization spec: day-ranged refresh with dynamic partition
  * overwrite, append mode for incremental days, layout contract.
  */
class GoldPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(day: Int, hour: Int): Timestamp =
    Timestamp.valueOf(f"2025-01-$day%02d $hour%02d:00:00")

  // two vessels co-located on days 1 and 2 (2 cells each day)
  private lazy val events = (for {
    day <- 1 to 2; uid <- Seq(1L, 2L); h <- 0 to 3
  } yield (uid, ts(day, h), (h % 2) * 62.5 + 1.0)).toDF("user_id", "ts", "value")

  private lazy val hourly =
    CoMovement.hourlyRollup(events, "user_id", "ts", "value", 3)

  test("uid_hourly refresh writes dt/hr partitions, day-bounded") {
    val out = Files.createTempDirectory("gold_uid").toString
    GoldPipeline.refreshUidHourly(hourly, out, "2025-01-01", "2025-01-01", buckets = 2)
    val got = spark.read.parquet(out)
    assert(got.select("dt").distinct().count() === 1) // only day 1 in range
    assert(got.count() === 8) // 2 uids × 4 hours
    assert(got.columns.contains("hr"))
  }

  test("pairs_daily refresh: append adds new days without touching old ones") {
    val out = Files.createTempDirectory("gold_pairs").toString
    GoldPipeline.refreshPairsDaily(hourly, out, "2025-01-01", "2025-01-01", buckets = 2)
    val d1 = spark.read.parquet(out)
    assert(d1.select("day").distinct().as[Int].collect().toSeq === Seq(1))

    GoldPipeline.refreshPairsDaily(hourly, out, "2025-01-02", "2025-01-02",
      replace = false, buckets = 2)
    val d12 = spark.read.parquet(out)
    assert(d12.select("day").distinct().as[Int].collect().sorted.toSeq === Seq(1, 2))
    // pair (1,2) present each day with full overlap
    assert(d12.filter(col("uid_a") === 1 && col("uid_b") === 2).count() === 2)
    assert(d12.select(min(col("gto"))).as[Double].head() === 1.0)
  }

  test("bronze→silver→gold: discover, land skip-if-exists, build co-movement (K1)") {
    // a NOAA-shaped source dir with one daily zip
    val srcDir = Files.createTempDirectory("noaa_src").toString
    val zout = new ZipOutputStream(new FileOutputStream(s"$srcDir/AIS_2025_01_01.zip"))
    zout.putNextEntry(new ZipEntry("day1.csv"))
    val rows = for { uid <- Seq(111, 222); h <- 0 to 3 }
      yield f"$uid,2025-01-01 0$h%d:10:00,${(h % 2) * 62.5 + 1.0}%.1f,-122.4,5.0"
    zout.write(("MMSI,BaseDateTime,LAT,LON,SOG" +: rows).mkString("\n").getBytes("UTF-8"))
    zout.closeEntry(); zout.close()

    // discover + land; second landing must move no bytes
    val bronze = Files.createTempDirectory("bronze").toString
    val idx = new ArchiveIndex.LocalDirIndex(srcDir, "AIS_%Y_%m_%d.zip")
    val landed = BronzeLanding.landRange(spark, idx, bronze,
      LocalDate.of(2025, 1, 1), LocalDate.of(2025, 1, 2))
    assert(landed.map(_.copied) === Seq(true))
    assert(landed.head.target.endsWith("AIS_2025_01_01.zip"))
    val again = BronzeLanding.landRange(spark, idx, bronze,
      LocalDate.of(2025, 1, 1), LocalDate.of(2025, 1, 2))
    assert(again.map(_.copied) === Seq(false))

    // bronze → silver → hourly → gold + pairs, one walk
    val silver = SilverIngest.clean(ArchiveSource.csv(spark, bronze), numBuckets = 8)
    val hourlyE2e = CoMovement.hourlyRollup(
      silver.withColumn("lat", col("LAT").cast("double")),
      "mmsi", "event_ts", "lat", 3)
    val out = Files.createTempDirectory("gold_e2e").toString
    GoldPipeline.refreshUidHourly(hourlyE2e, out, "2025-01-01", "2025-01-01", buckets = 2)
    assert(spark.read.parquet(out).count() === 8) // 2 vessels × 4 hours
    val pairs = CoMovement.pairsDaily(hourlyE2e).collect()
    assert(pairs.length === 1) // the co-located pair, both cells shared
    assert(pairs.head.getAs[Double]("gto") === 1.0)
  }

  test("compaction: many small files rewritten to the bin-packed count, data intact") {
    import spark.implicits._
    val dir = Files.createTempDirectory("gp_compact").toString + "/t"
    val df = (1L to 2000L).map(i => (i, s"row$i")).toDF("id", "payload")
    df.repartition(16).write.parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(parquetFiles === 16)
    val n = GoldPipeline.compact(spark, dir, targetBytes = 1L << 30)
    assert(n === 1 && parquetFiles === 1)
    val back = spark.read.parquet(dir).as[(Long, String)].collect().sortBy(_._1)
    assert(back.length === 2000 && back.head === ((1L, "row1")))
    // a tiny target splits into multiple bins
    df.repartition(16).write.mode("overwrite").parquet(dir)
    assert(GoldPipeline.compact(spark, dir, targetBytes = 8 * 1024L) > 1)
  }

  test("partitioned compaction touches only the offending partitions") {
    import spark.implicits._
    val root = Files.createTempDirectory("gp_pcompact").toString + "/t"
    // dt=a accretes 6 small appends (the fresh partition an incremental
    // refresh hammers); dt=b is healthy with 2 files
    val mk = (dt: String, lo: Long, hi: Long) =>
      (lo to hi).map(i => (i, dt)).toDF("id", "dt")
    (1 to 6).foreach(k => mk("a", k * 10L, k * 10L + 5)
      .coalesce(1).write.mode("append").partitionBy("dt").parquet(root))
    (1 to 2).foreach(k => mk("b", k * 100L, k * 100L + 5)
      .coalesce(1).write.mode("append").partitionBy("dt").parquet(root))
    def files(part: String) = new java.io.File(s"$root/dt=$part").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.getName).toSet
    val bBefore = files("b")
    assert(files("a").size === 6 && bBefore.size === 2)
    val report = GoldPipeline.compactPartitions(spark, root,
      targetBytes = 1L << 30, maxFiles = 3)
    assert(report.map(r => (r._1.endsWith("dt=a"), r._2, r._3)) ===
      Seq((true, 6, 1)), s"only dt=a qualifies: $report")
    assert(files("a").size === 1, "offender rewritten to the packed count")
    assert(files("b") === bBefore, "healthy partition byte-untouched")
    val back = spark.read.parquet(root)
    assert(back.count() === 6 * 6 + 2 * 6)
    assert(back.filter(col("dt") === "a").count() === 36,
      "partition values survive the leaf rewrite")
  }

  test("partition compaction temp dirs are invisible to readers and heal after a crash") {
    import spark.implicits._
    val root = Files.createTempDirectory("gp_heal").toString + "/t"
    Seq((1L, "a"), (2L, "a")).toDF("id", "dt")
      .write.partitionBy("dt").parquet(root)
    Seq((3L, "b")).toDF("id", "dt")
      .write.mode("append").partitionBy("dt").parquet(root)
    // crash-before-delete: a completed rewrite sits in the DOT-prefixed
    // temp while the real partition still exists — a reader of the root
    // must see neither a bogus partition nor doubled rows
    spark.read.parquet(s"$root/dt=a")
      .write.parquet(s"$root/.dt=a__compacting")
    val dts = spark.read.parquet(root).select("dt").distinct()
      .as[String].collect().sorted.toSeq
    assert(dts === Seq("a", "b"), s"hidden temp must not become a partition: $dts")
    assert(spark.read.parquet(root).count() === 3L, "no double counting")
    // crash-between-delete-and-rename: partition gone, snapshot complete —
    // the next maintenance pass promotes it before walking
    val fs = new java.io.File(s"$root/dt=a")
    def deleteRec(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(deleteRec)); f.delete(); ()
    }
    deleteRec(fs)
    assert(!fs.exists)
    GoldPipeline.compactPartitions(spark, root, targetBytes = 1L << 30)
    assert(spark.read.parquet(root).filter(col("dt") === "a").count() === 2L,
      "the crashed partition's data is healed from the snapshot")
    assert(!new java.io.File(s"$root/.dt=a__compacting").exists)
  }

  test("all-renames swap: mid-swap crash states heal with the rewrite preferred") {
    import spark.implicits._
    // window 1: leaf renamed to .dt=a__old, the completed rewrite still in
    // the __compacting temp, second rename never ran — the next maintenance
    // pass must promote the temp (complete at swap time), not resurrect the
    // pre-compact pile from __old
    val root = Files.createTempDirectory("gp_heal_old").toString + "/t"
    Seq((9L, "b")).toDF("id", "dt").write.partitionBy("dt").parquet(root)
    (1 to 3).foreach(_ => Seq((1L, 0)).toDF("id", "pad").drop("pad")
      .write.mode("append").parquet(s"$root/.dt=a__old"))
    Seq(1L).toDF("id").write.parquet(s"$root/.dt=a__compacting")
    // both dot-dirs are invisible to a reader of the root
    assert(spark.read.parquet(root).select("dt").distinct()
      .as[String].collect().toSeq === Seq("b"))
    GoldPipeline.compactPartitions(spark, root, targetBytes = 1L << 30)
    assert(spark.read.parquet(s"$root/dt=a").count() === 1L,
      "the completed rewrite is promoted, not the 3-row pre-compact pile")
    assert(!new java.io.File(s"$root/.dt=a__old").exists, "__old dropped")
    assert(!new java.io.File(s"$root/.dt=a__compacting").exists)
    // window 2: rewrite already promoted, only the orphan __old remains —
    // the leaf stays authoritative and the orphan is dropped
    Seq(7L, 8L).toDF("id").write.parquet(s"$root/.dt=c__old")
    Seq(5L).toDF("id").write.parquet(s"$root/dt=c")
    GoldPipeline.compactPartitions(spark, root, targetBytes = 1L << 30)
    assert(spark.read.parquet(s"$root/dt=c").as[Long].collect().toSeq === Seq(5L),
      "the promoted leaf stays authoritative")
    assert(!new java.io.File(s"$root/.dt=c__old").exists)
  }

  test("z-ordered write: every file owns a compact 2-D tile in BOTH dims") {
    import spark.implicits._
    // full 64x64 grid → 16 range partitions on the Morton key = 16x16 tiles
    val grid = (for { x <- 0 until 64; y <- 0 until 64 }
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val dir = Files.createTempDirectory("gp_zorder").toString + "/t"
    GoldPipeline.writeZOrdered(grid, dir, "x", "y", nFiles = 16)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.toString)
    assert(files.length === 16)
    val ranges = files.map { f =>
      val r = spark.read.parquet(f)
        .agg(max("x") - min("x"), max("y") - min("y"))
        .as[(Long, Long)].head()
      r
    }
    // perfect Morton tiling of a 64x64 grid into 16 files = 16x16 tiles;
    // a single-column sort would leave the other dim's range at 63
    assert(ranges.forall { case (rx, ry) => rx <= 15 && ry <= 15 },
      s"expected 16x16 tiles, got ranges ${ranges.toSeq}")
    // nothing lost in the layout rewrite
    assert(spark.read.parquet(dir).count() === 64L * 64)
  }

  test("pairs_total rebuild aggregates across the materialized days") {
    val pairsOut = Files.createTempDirectory("gold_pairs2").toString
    GoldPipeline.refreshPairsDaily(hourly, pairsOut, "2025-01-01", "2025-01-02", buckets = 2)
    val totalOut = Files.createTempDirectory("gold_total").toString
    GoldPipeline.refreshPairsTotal(pairsOut, totalOut, 0.4, spark)
    val t = spark.read.parquet(totalOut).collect()
    assert(t.length === 1)
    assert(t.head.getAs[Long]("total_days_observed") === 2L)
  }
}
