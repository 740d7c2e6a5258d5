package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.{Skew, Tracks}

/** Specs for the salted skew join and the batch trip splitter. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals plain join on a skewed key distribution") {
    // 90% of the large side on one hot key
    val large = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val small = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).map((_, 1.0)).toDF("key", "w")
    val plain = large.join(small, Seq("key")).orderBy("key", "v")
      .collect().toSeq
    val salted = Skew.saltedJoin(large, small, Seq("key"), salt = 8)
      .orderBy("key", "v").collect().toSeq
    assert(salted === plain)
    assert(salted.length === 1000)
  }

  test("AQE splits a skewed sort-merge join at runtime (the first skew defense)") {
    // salting is the manual fallback; the FIRST line of defense at scale is
    // AQE's OptimizeSkewedJoin — prove it fires on a hot key under
    // test-sized thresholds
    val conf = Map(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) => spark.conf.set(k, v) }
      val large = ((1 to 20000).map(i => ("hot", s"payload-$i-${"x" * 20}")) ++
        (1 to 500).map(i => (s"k${i % 50}", s"p$i"))).toDF("key", "v")
      val small = (Seq("hot") ++ (0 until 50).map(i => s"k$i")).map((_, 1)).toDF("key", "w")
      val joined = large.join(small, Seq("key"))
      // execute THIS plan (count() builds its own QueryExecution and the
      // adaptive plan under inspection would stay isFinalPlan=false)
      assert(joined.collect().length === 20000 + 500)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE must mark the hot partition as skew-split, plan was:\n${finalPlan.take(1500)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted left join preserves unmatched rows") {
    val large = Seq(("a", 1), ("b", 2)).toDF("key", "v")
    val small = Seq(("a", 9.0)).toDF("key", "w")
    val got = Skew.saltedJoin(large, small, Seq("key"), salt = 4, "left")
      .orderBy("key").collect()
    assert(got.length === 2)
    assert(got(1).isNullAt(2)) // b unmatched, w null
  }

  test("batch trip segmentation matches the streaming splitter's semantics") {
    def ts(s: String) = Timestamp.valueOf(s"2025-01-01 $s:00")
    val events = Seq(
      (1L, ts("00:00"), 101L), (1L, ts("00:30"), 102L), // trip 0
      (1L, ts("03:00"), 103L), (1L, ts("03:20"), 104L), // trip 1 (gap > 1h)
      (2L, ts("00:00"), 201L))                          // trip 0 for uid 2
      .toDF("user_id", "ts", "event_id")
    val got = Tracks.tripSegments(events, gapMs = 3600000L).collect()
    assert(got.length === 3)
    val t1 = got.filter(_.getAs[Long]("user_id") == 1L)
    assert(t1.map(_.getAs[Long]("trip_seq")).toSeq === Seq(0L, 1L))
    assert(t1.map(_.getAs[Long]("n_points")).toSeq === Seq(2L, 2L))
  }

  test("odFlows: trip endpoints land in the right cells, flows aggregate") {
    def ts(s: String) = Timestamp.valueOf(s"2025-01-01 $s:00")
    // res 3 → cell width 62.5: values 10→cell 0, 100→cell 1, 200→cell 3
    val events = Seq(
      // uid 1 trip 0: 10 → 100  (cells 0 → 1); mid-point must not matter
      (1L, ts("00:00"), 101L, 10.0), (1L, ts("00:30"), 102L, 450.0),
      (1L, ts("01:00"), 103L, 100.0),
      // uid 1 trip 1 after >1h gap: 200 → 200 (cell 3 → 3, single point)
      (1L, ts("04:00"), 104L, 200.0),
      // uid 2: 10 → 100 as well — same OD pair, second vessel
      (2L, ts("00:00"), 201L, 10.0), (2L, ts("00:10"), 202L, 100.0))
      .toDF("user_id", "ts", "event_id", "value")
    val got = Tracks.odFlows(events, gapMs = 3600000L, res = 3)
      .orderBy("origin_cell", "dest_cell").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq((0L, 1L, 2L, 2L), (3L, 3L, 1L, 1L)))
  }

  test("skewReport: hand-computed distribution for a hot key") {
    // keys: a×6, b×2, c×1, null×1 → counts (6,2,1,1); p50 of (1,1,2,6)=1.5
    val df = (Seq.fill(6)("a") ++ Seq.fill(2)("b") ++ Seq("c", null))
      .toDF("k")
    val r = Skew.skewReport(df, Seq("k"), "k").collect()(0)
    assert(r.getAs[String]("key_set") === "k")
    assert(r.getAs[Long]("n_rows") === 10L)
    assert(r.getAs[Long]("n_keys") === 4L)        // null groups as a key
    assert(r.getAs[Long]("max_key_rows") === 6L)
    assert(r.getAs[Double]("p50_key_rows") === 1.5)
    assert(r.getAs[Long]("top_share_ppm") === 600000L)
    assert(r.getAs[Double]("skew_ratio") === 4.0)
  }
}
