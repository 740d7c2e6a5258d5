package graft

import org.apache.spark.sql.functions._

import graft.ops.{GoldPipeline, Tracks}

/** K4 bucketed-table spec: the point of bucketing is shuffle elimination —
  * assert it on the physical plan, not just on row counts.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed saveAsTable: co-bucketed self-join plans no shuffle") {
    val df = (1L to 1000L).map(i => (i % 97, i, i * 2.0))
      .toDF("mmsi", "seq", "v")
    GoldPipeline.saveAsBucketedTable(df, "bkt_test", buckets = 8,
      bucketCols = Seq("mmsi"), sortCols = Seq("mmsi"))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so only bucketing can remove the exchange
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val t = spark.table("bkt_test")
      val joined = t.as("a").join(t.as("b"), "mmsi")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle, plan was:\n$plan")
      assert(joined.count() > 0)
      // sanity: the same join on unbucketed data DOES shuffle
      val u = df
      val uplan = u.as("a").join(u.as("b"), "mmsi")
        .queryExecution.executedPlan.toString
      assert(uplan.contains("Exchange"))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS bkt_test")
    }
  }

  test("partitioned fact + filtered dim join triggers dynamic partition pruning") {
    // the DPP story behind the gold layout: a fact table partitioned by dt
    // joined to a dim filtered AT RUNTIME only scans the surviving partitions
    // — Catalyst injects the pruning subquery, nothing hand-scheduled
    val root = java.nio.file.Files.createTempDirectory("graft-dpp-").toString
    (1 to 1000).map(i => (i % 10, i.toLong)).toDF("dt", "v")
      .write.mode("overwrite").partitionBy("dt").parquet(s"$root/fact")
    (0 until 10).map(i => (i, if (i == 3) "keep" else "drop")).toDF("dt", "tag")
      .write.mode("overwrite").parquet(s"$root/dim")
    val prevStats = spark.conf.get(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats")
    try {
      // tiny fixture tables defeat the stats-based benefit estimate; the
      // fallback ratio path is what a real large fact table hits anyway
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
      val joined = spark.read.parquet(s"$root/fact")
        .join(spark.read.parquet(s"$root/dim").filter(col("tag") === "keep"), "dt")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"partition filter must be runtime-injected, plan was:\n${plan.take(2000)}")
      assert(joined.count() === 100)
    } finally
      spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", prevStats)
  }

  test("synthetic-id repair fills only missing ids, uniquely (P11)") {
    val df = Seq((Some("t1"), 1), (None, 2), (None, 3)).toDF("track_id", "x")
    val got = Tracks.repairTrackId(df, "track_id").collect()
    val ids = got.map(_.getString(0))
    assert(ids.contains("t1"))
    assert(ids.distinct.length === 3)
    assert(ids.count(_.startsWith("track_")) === 2)
  }
}
