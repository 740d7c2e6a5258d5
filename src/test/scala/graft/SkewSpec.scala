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
}
