package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{CoMovement, QualityChecks, SilverIngest}

/** End-to-end ingestion spec on a messy AIS-shaped CSV (FIXTURES.md §2):
  * every timestamp-normalizer branch, dirty coordinates, null keys —
  * through clean → partitioned+bucketed silver write → read-back.
  */
class SilverIngestSpec extends SparkSpec {
  import spark.implicits._

  private lazy val csvDir = {
    val dir = Files.createTempDirectory("ais_fixture")
    val rows = Seq(
      "MMSI,BaseDateTime,LAT,LON,SOG",
      "366123456,2025-01-01 00:03:07,37.7,-122.4,5.1",   // plain
      "366123456,2025-01-01T00:17:07,37.8,-122.5,5.2",   // ISO T
      "366123456,2025-01-01T01:03:07Z,37.9,-122.6,5.3",  // zulu
      "367000001,2025-01-01T02:03:07+00:00,10.0,10.0,1.0", // offset
      "367000001,2025-01-02 03:03:07,11.0,11.0,1.1",     // second day
      "badrow,notatime,91.0,-200.0,x",                    // unparsable ts → dropped
      ",2025-01-01 05:00:00,1.0,1.0,1.0")                 // null mmsi → dropped
    Files.write(dir.resolve("ais_2025_01_01.csv"),
      rows.mkString("\n").getBytes("UTF-8"))
    dir.toString
  }

  test("resolveColumn is case-insensitive with fallback order") {
    assert(SilverIngest.resolveColumn(
      Seq("base_date_time", "MMSI"), SilverIngest.TsCandidates) === Some("base_date_time"))
    assert(SilverIngest.resolveColumn(
      Seq("TS", "other"), SilverIngest.TsCandidates) === Some("TS"))
    assert(SilverIngest.resolveColumn(Seq("nope"), SilverIngest.TsCandidates) === None)
  }

  test("csv → clean → silver write → read-back preserves good rows, drops dirty") {
    val out = Files.createTempDirectory("silver_out").toString
    val silver = SilverIngest.ingestCsv(spark, csvDir, out, numBuckets = 96,
      sourceUrl = "https://example.test/ais.zip")
    assert(silver.count() === 5) // 7 data rows - 2 dropped

    // partition layout: hive year=/month=/day=/bucket_id= directories
    val cols = silver.columns.toSet
    assert(Set("year", "month", "day", "bucket_id").subsetOf(cols))
    val days = silver.select("day").distinct().as[Int].collect().sorted
    assert(days.toSeq === Seq(1, 2))

    // stable bucket matches the reference hash for this MMSI (precomputed)
    val b = silver.filter(col("mmsi") === "366123456")
      .select("bucket_id").distinct().as[Long].collect()
    assert(b.toSeq === Seq(30L)) // int(sha256('366123456')[:16],16) % 96

    // lineage columns present and populated
    assert(silver.filter(col("source_file").contains("ais_2025_01_01")).count() === 5)
    assert(silver.filter(col("source_url").startsWith("https://example.test")).count() === 5)

    // timestamps normalized to the same UTC instants regardless of format
    val hours = silver.filter(col("mmsi") === "366123456")
      .select(hour(col("event_ts"))).as[Int].collect().sorted
    assert(hours.toSeq === Seq(0, 0, 1))
  }

  test("dynamic partition overwrite replaces only touched partitions") {
    val out = Files.createTempDirectory("silver_ovw").toString
    val d1 = Seq(("1", "2025-01-01 00:00:00"), ("1", "2025-01-02 00:00:00"))
      .toDF("mmsi", "ts")
    SilverIngest.writeSilver(SilverIngest.clean(d1, 4), out)
    // overwrite day 2 only, with two rows
    val d2 = Seq(("1", "2025-01-02 06:00:00"), ("1", "2025-01-02 07:00:00"))
      .toDF("mmsi", "ts")
    SilverIngest.writeSilver(SilverIngest.clean(d2, 4), out, overwrite = true)
    val got = spark.read.parquet(out)
    assert(got.count() === 3) // day1 row intact, day2 replaced with 2 rows
    assert(got.filter(col("day") === 2).count() === 2)
  }

  test("reconciliation delta is zero between silver and its hourly rollup") {
    val out = Files.createTempDirectory("silver_rec").toString
    val silver = SilverIngest.ingestCsv(spark, csvDir, out, numBuckets = 96)
      .withColumn("lat", col("LAT").cast("double"))
    val filtered = silver.filter(col("lat").between(-90, 90))
    val hourly = CoMovement.hourlyRollup(
      filtered.withColumn("pos", col("lat") + 90.0), // shift into [0,500) domain
      "mmsi", "event_ts", "pos", res = 3)
    val checks = QualityChecks.reconcile(filtered, hourly)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(checks("delta_messages") === 0L)
    assert(checks("sum_message_count") === checks("silver_filtered_count"))
  }

  test("zscore outliers: hand-computed z per group, zero-variance group emits null") {
    import spark.implicits._
    val df = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), // mean 2, pop-std sqrt(2/3)
      (4L, "b", 7.0), (5L, "b", 7.0)                  // zero variance
    ).toDF("event_id", "grp", "value")
    val got = QualityChecks.zscoreOutliers(df, "event_id", "grp", "value",
        threshold = 1.0)
      .orderBy("event_id").collect()
      .map(r => (if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getBoolean(3))))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val std = math.sqrt(2.0 / 3.0)
    assert(got(0)._1 === Some(r6(-1 / std)) && got(0)._2 === Some(true))
    assert(got(1)._1 === Some(0.0) && got(1)._2 === Some(false))
    assert(got(2)._1 === Some(r6(1 / std)) && got(2)._2 === Some(true))
    assert(got(3) === ((None, None)) && got(4) === ((None, None)))
  }
}
