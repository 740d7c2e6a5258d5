package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.AsOf

/** As-of join spec: backward-match semantics (latest at-or-before), <=
  * inclusivity at exact timestamp ties, per-key isolation, and null
  * enrichment when no prior right row exists.
  */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s"2024-01-01 $s:00")

  test("asof: latest at-or-before wins, nulls before first right row, keys isolated") {
    val left = Seq(
      (1L, 100L, ts("09:00")), // before any quote → null
      (2L, 100L, ts("10:30")), // between quotes → 10:00 quote
      (3L, 100L, ts("11:30")), // after both → 11:00 quote
      (4L, 200L, ts("10:30"))  // other key: sees only its own quote
    ).toDF("event_id", "uid", "ts")
    val right = Seq(
      (100L, ts("10:00"), 1.0),
      (100L, ts("11:00"), 2.0),
      (200L, ts("10:00"), 9.0)
    ).toDF("uid", "ts", "q")

    val got = AsOf.asofJoin(left, right, "uid", "ts", Seq("q"))
      .orderBy("event_id")
      .select(col("event_id"), col("r_q"))
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    assert(got.toSeq === Seq(
      (1L, None), (2L, Some(1.0)), (3L, Some(2.0)), (4L, Some(9.0))))
  }

  test("asof: right row at exactly the left ts is matched (<= semantics)") {
    val left = Seq((1L, 5L, ts("10:00"))).toDF("event_id", "uid", "ts")
    val right = Seq((5L, ts("10:00"), 7.0)).toDF("uid", "ts", "q")
    val got = AsOf.asofJoin(left, right, "uid", "ts", Seq("q"))
      .select("r_q").as[Double].collect()
    assert(got.toSeq === Seq(7.0))
  }

  test("asof: agrees with a brute-force per-key reference on randomized data") {
    val rnd = new scala.util.Random(42)
    val base = 1700000000000L
    val lefts = (1 to 300).map(i =>
      (i.toLong, (rnd.nextInt(8) + 1).toLong,
        new Timestamp(base + rnd.nextInt(100000) * 1000L)))
    val rightsRaw = (1 to 400).map(_ =>
      ((rnd.nextInt(8) + 1).toLong,
        new Timestamp(base + rnd.nextInt(100000) * 1000L), rnd.nextDouble()))
    // unique per (key, ts) — the operator's documented precondition
    val rights = rightsRaw.groupBy(r => (r._1, r._2)).values.map(_.head).toSeq

    val got = AsOf.asofJoin(
        lefts.toDF("event_id", "uid", "ts"),
        rights.toDF("uid", "ts", "q"), "uid", "ts", Seq("q"))
      .select(col("event_id"), col("r_q"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap

    val byKey = rights.groupBy(_._1)
    lefts.foreach { case (id, uid, lts) =>
      val want = byKey.getOrElse(uid, Seq.empty)
        .filter(!_._2.after(lts))
        .sortBy(_._2.getTime)
        .lastOption.map(_._3)
      assert(got(id) === want, s"event $id (uid $uid, ts $lts)")
    }
  }

  test("asof: matched right timestamp is carried through as r_ts") {
    val left = Seq((1L, 5L, ts("12:00"))).toDF("event_id", "uid", "ts")
    val right = Seq((5L, ts("10:00"), 1.0), (5L, ts("11:00"), 2.0))
      .toDF("uid", "ts", "q")
    val got = AsOf.asofJoin(left, right, "uid", "ts", Seq("q"))
      .select("r_ts").as[Timestamp].collect()
    assert(got.toSeq === Seq(ts("11:00")))
  }
}
