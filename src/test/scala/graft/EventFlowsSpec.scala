package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.EventFlows

class EventFlowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val hour = 3600000L

  test("funnel: strictly-after chaining, drop-off levels, window gate") {
    val w = 4 * hour
    val rows = Seq(
      // u1 completes inside the window: view 00, click 01, purchase 02
      (1L, ts("2024-01-01 00:00:00"), "view"),
      (1L, ts("2024-01-01 01:00:00"), "click"),
      (1L, ts("2024-01-01 02:00:00"), "purchase"),
      // u2's only click is BEFORE its first view: chain stops at step 1
      (2L, ts("2024-01-01 00:00:00"), "click"),
      (2L, ts("2024-01-01 01:00:00"), "view"),
      // u3 reaches click, never purchases
      (3L, ts("2024-01-01 00:00:00"), "view"),
      (3L, ts("2024-01-01 01:00:00"), "click"),
      // u4 completes but outside the 4h window (purchase at +6h)
      (4L, ts("2024-01-01 00:00:00"), "view"),
      (4L, ts("2024-01-01 01:00:00"), "click"),
      (4L, ts("2024-01-01 06:00:00"), "purchase"),
      // u5 never views: not in the funnel population
      (5L, ts("2024-01-01 00:00:00"), "purchase")
    ).toDF("user_id", "ts", "event_type")
    val got = EventFlows.funnel(rows, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"), w)
      .orderBy("user_id").collect()
    assert(got.map(_.getLong(0)).toSeq === Seq(1L, 2L, 3L, 4L),
      "population = actors who did step 1")
    val byUser = got.map(r => r.getLong(0) ->
      ((r.getAs[Long]("step_reached"), r.getAs[Boolean]("completed")))).toMap
    assert(byUser(1L) === ((3L, true)))
    assert(byUser(2L) === ((1L, false)), "pre-view click must not chain")
    assert(byUser(3L) === ((2L, false)))
    assert(byUser(4L) === ((3L, false)), "out-of-window completion is reached, not completed")
  }

  test("funnel: boundary completion at exactly the window edge counts") {
    val rows = Seq(
      (1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, ts("2024-01-01 01:00:00"), "b")
    ).toDF("user_id", "ts", "event_type")
    val got = EventFlows.funnel(rows, "user_id", "ts", "event_type",
      Seq("a", "b"), windowMs = hour).collect()
    assert(got.head.getAs[Boolean]("completed"), "<= is the window contract")
  }

  test("retentionMatrix: weekly offsets anchored at each actor's own cohort") {
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00")), // cohort Jan 1
      (1L, ts("2024-01-03 10:00:00")), // offset 0 (same week)
      (1L, ts("2024-01-09 10:00:00")), // offset 1
      (2L, ts("2024-01-08 10:00:00")), // cohort Jan 8
      (2L, ts("2024-01-22 10:00:00"))  // offset 2
    ).toDF("user_id", "ts")
    val got = EventFlows.retentionMatrix(rows, "user_id", "ts", periodDays = 7)
      .orderBy("cohort_ms", "period_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val jan1 = ts("2024-01-01 00:00:00").getTime
    val jan8 = ts("2024-01-08 00:00:00").getTime
    assert(got.toSeq === Seq((jan1, 0L, 1L), (jan1, 1L, 1L),
      (jan8, 0L, 1L), (jan8, 2L, 1L)))
  }

  test("transitions: adjacent pairs in time order, per actor, both directions") {
    val rows = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), "a"),
      (1L, 2L, ts("2024-01-01 01:00:00"), "b"),
      (1L, 3L, ts("2024-01-01 02:00:00"), "a"),
      (2L, 4L, ts("2024-01-01 00:00:00"), "a"),
      (2L, 5L, ts("2024-01-01 01:00:00"), "b")
    ).toDF("user_id", "event_id", "ts", "event_type")
    val got = EventFlows.transitions(rows, "user_id", "event_id", "ts",
        "event_type")
      .orderBy("from_type", "to_type")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === Seq(("a", "b", 2L), ("b", "a", 1L)),
      "no cross-actor pair may leak (u2's b has no successor)")
  }

  test("growthAccounting: DAU, new users, and cumulative line up") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 11:00:00")),
      (1L, ts("2024-01-02 10:00:00")),                       // returning only
      (3L, ts("2024-01-03 09:00:00")), (1L, ts("2024-01-03 10:00:00")),
      (1L, ts("2024-01-03 12:00:00")))                       // same-day repeat
      .toDF("user_id", "ts")
    val got = EventFlows.growthAccounting(rows, "user_id", "ts")
      .orderBy("day")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L, 2L, 2L),
      ("2024-01-02", 1L, 0L, 2L),
      ("2024-01-03", 2L, 1L, 3L)))
  }
}
