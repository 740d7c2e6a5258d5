package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Trajectory

class TrajectorySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("geofenceHits: half-open containment — boundary point lands in exactly one zone") {
    val zones = Seq(("a", 0.0, 1.0, 0.0, 1.0), ("b", 1.0, 2.0, 1.0, 2.0))
    val pos = Seq(
      (1L, 0.5, 0.5),   // inside a
      (2L, 1.0, 1.0),   // ON the a/b corner: [min,max) puts it in b only
      (3L, 1.5, 0.5),   // lat in b's band, lon in a's — no zone, dropped
      (4L, 2.0, 2.0))   // on b's open upper bound — outside, dropped
      .toDF("uid", "lat", "lon")
    val got = graft.ops.Tracks.geofenceHits(pos, "lat", "lon", zones)
      .select("uid", "zone").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "a", 2L -> "b"),
      s"half-open bounds: boundary in exactly one zone, misses drop: $got")
  }

  test("impliedSpeed: hand-computed distance, speed, and teleport flag") {
    // one degree of pure latitude in one hour = 111.195 km/h exactly
    val pts = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 10.0, 20.0),
      (1L, 2L, ts("2024-01-01 01:00:00"), 11.0, 20.0),   // 111.195 km/h
      (1L, 3L, ts("2024-01-01 01:30:00"), 31.0, 20.0),   // 20 deg in 30 min
      (2L, 9L, ts("2024-01-01 00:00:00"), 0.0, 0.0)      // lone ping
    ).toDF("uid", "eid", "t", "lat", "lon")
    val got = Trajectory.impliedSpeed(pts, "uid", "eid", "t", "lat", "lon",
        teleportKmh = 1000.0)
      .orderBy("uid", "eid").collect()

    assert(got.length === 4)
    val first = got(0)
    assert(first.isNullAt(first.fieldIndex("speed_kmh")), "first ping: null speed")
    assert(first.isNullAt(first.fieldIndex("is_teleport")), "first ping: null flag")
    // expected values are the operator's own closing op — one multiply of
    // the exact integer micro-degree distance/speed by KmPerMicroDeg —
    // written identically here so the comparison is bit-exact by identity
    val K = Trajectory.KmPerMicroDeg
    val hop = got(1)
    assert(hop.getAs[Double]("dist_km") === 1000000L.toDouble * K) // 111.195
    assert(hop.getAs[Double]("speed_kmh") === 1000000L.toDouble * K)
    assert(!hop.getAs[Boolean]("is_teleport"))
    val jump = got(2)
    assert(jump.getAs[Double]("dist_km") === 20000000L.toDouble * K) // 2223.9
    // 20 deg per 30 min = 40e6 micro-deg/hour ≈ 4447.8 km/h
    assert(jump.getAs[Double]("speed_kmh") === 40000000L.toDouble * K)
    assert(jump.getAs[Boolean]("is_teleport"), "~4447.8 km/h must flag")
    val lone = got(3)
    assert(lone.isNullAt(lone.fieldIndex("speed_kmh")), "lone ping: null speed")
  }

  test("impliedSpeed: longitude wraps the short way across the antimeridian") {
    val pts = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 0.0, 179.5),
      (1L, 2L, ts("2024-01-01 01:00:00"), 0.0, -179.5)
    ).toDF("uid", "eid", "t", "lat", "lon")
    val got = Trajectory.impliedSpeed(pts, "uid", "eid", "t", "lat", "lon", 1000.0)
      .orderBy("eid").collect()
    // 1 degree across the seam, NOT 359
    assert(got(1).getAs[Double]("dist_km") ===
      1000000L.toDouble * Trajectory.KmPerMicroDeg)
  }

  test("impliedSpeed: zero elapsed time yields null speed, never Infinity") {
    val pts = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00"), 0.0, 0.0),
      (1L, 2L, ts("2024-01-01 00:00:00"), 5.0, 0.0)
    ).toDF("uid", "eid", "t", "lat", "lon")
    val got = Trajectory.impliedSpeed(pts, "uid", "eid", "t", "lat", "lon", 1000.0)
      .orderBy("eid").collect()
    val r = got(1)
    assert(r.getAs[Long]("gap_ms") === 0L)
    assert(r.isNullAt(r.fieldIndex("speed_kmh")))
    assert(r.isNullAt(r.fieldIndex("is_teleport")))
  }

  test("dwellEpisodes: revisited cell opens a new episode; short runs drop") {
    // track: A A B A A A  -> episodes A(2), A(3); B run of 1 drops at min=2
    val base = ts("2024-01-01 00:00:00").getTime
    val pts = (1 to 6).map { i =>
      val cell = if (i == 3) "B" else "A"
      (7L, i.toLong, new Timestamp(base + i * 60000L), cell)
    }.toDF("uid", "eid", "t", "cell")
    val got = Trajectory.dwellEpisodes(pts, "uid", "eid", "t", "cell", minPings = 2)
      .orderBy("start_ms").collect()
    assert(got.map(r => (r.getAs[String]("cell"), r.getAs[Long]("n_pings"))).toSeq
      === Seq(("A", 2L), ("A", 3L)))
    // episodes must not overlap: first ends before second starts
    assert(got(0).getAs[Long]("end_ms") < got(1).getAs[Long]("start_ms"))
  }

  test("interpolateHourly: exact linear fill between observed hours") {
    // uid 1: hour 0 avg=2.0, hour 3 avg=8.0 -> hours 1,2 interpolate 4.0, 6.0
    val pts = Seq(
      (1L, ts("2024-01-01 00:10:00"), 1.0),
      (1L, ts("2024-01-01 00:50:00"), 3.0),
      (1L, ts("2024-01-01 03:30:00"), 8.0)
    ).toDF("uid", "t", "v")
    val got = Trajectory.interpolateHourly(pts, "uid", "t", "v")
      .orderBy("hour_ms").collect()
    assert(got.length === 4)
    assert(got.map(_.getAs[Double]("value_interp")).toSeq
      === Seq(2.0, 4.0, 6.0, 8.0))
    assert(got.map(_.getAs[Boolean]("is_observed")).toSeq
      === Seq(true, false, false, true))
  }

  test("interpolateHourly: single observed hour emits just that row") {
    val pts = Seq((1L, ts("2024-01-01 05:00:00"), 4.5))
      .toDF("uid", "t", "v")
    val got = Trajectory.interpolateHourly(pts, "uid", "t", "v").collect()
    assert(got.length === 1)
    assert(got(0).getAs[Double]("value_interp") === 4.5)
    assert(got(0).getAs[Boolean]("is_observed"))
  }

  test("resample: linear interpolation on the grid, exact hits take the observation") {
    // points at t=0ms (v=10) and t=100ms (v=20), interval 40ms → ticks
    // 0, 40, 80: exact hit at 0, then 10 + 10·40/100 = 14 and 18
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val pts = Seq((1L, t(0), 10.0), (1L, t(100), 20.0),
      // vessel 2: grid tick coincides with the LAST point (nt-null path)
      (2L, t(0), 5.0), (2L, t(80), 30.0))
      .toDF("user_id", "ts", "value")
    val got = graft.ops.Tracks.resample(pts, intervalMs = 40L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got === Map(
      (1L, 0L) -> 10.0, (1L, 40L) -> 14.0, (1L, 80L) -> 18.0,
      (2L, 0L) -> 5.0, (2L, 40L) -> 17.5, (2L, 80L) -> 30.0),
      s"grid interpolation must be exact: $got")
    // a vessel whose whole span is shorter than one tick gets no grid rows
    val tiny = Seq((9L, t(41), 1.0), (9L, t(75), 2.0)).toDF("user_id", "ts", "value")
    assert(graft.ops.Tracks.resample(tiny, 40L).count() === 0L,
      "span [41,75] contains no multiple of 40")
  }

  test("resample maxTicksPerKey: one poisoned epoch-0 timestamp can't explode a key's grid") {
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val base = 1700000000000L // a sane 2023 epoch
    val pts = Seq(
      // vessel 1: healthy — 3 points over 200 ms
      (1L, t(base), 1.0), (1L, t(base + 100), 2.0), (1L, t(base + 200), 3.0),
      // vessel 2: one bad-but-castable epoch-0 row stretches its span to
      // ~54 years — unguarded, a 100 ms interval would demand ~1.7e13 ticks
      (2L, t(0), 9.0), (2L, t(base), 10.0), (2L, t(base + 100), 11.0))
      .toDF("user_id", "ts", "value")
    val got = graft.ops.Tracks.resample(pts, intervalMs = 100L,
        maxTicksPerKey = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(got.map(_._1._1).toSet === Set(1L),
      "the poisoned key is excluded entirely; healthy keys are untouched")
    assert(got.length === 3, s"vessel 1 keeps its full 3-tick grid: ${got.length}")
    // guard off (the declared default) preserves the old semantics — the
    // healthy vessel's grid is identical
    val off = graft.ops.Tracks.resample(
        pts.filter(col("user_id") === 1L), intervalMs = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(off.toMap === got.toMap)
  }

  test("resample maxTicksPerKey: a key whose grid EXACTLY fills the cap survives, aligned or not") {
    def t(ms: Long) = new java.sql.Timestamp(ms)
    val base = 1700000000000L // multiple of 10 → start == lo
    // span 15 ms @ interval 10: grid is {base, base+10} — exactly 2 ticks,
    // but double division said 15/10 + 1 = 2.5 > 2 and dropped the key
    val pts = Seq((1L, t(base), 1.0), (1L, t(base + 15), 4.0))
      .toDF("user_id", "ts", "value")
    val at2 = graft.ops.Tracks.resample(pts, intervalMs = 10L,
      maxTicksPerKey = 2L).count()
    assert(at2 === 2L, s"a 2-tick grid must survive a cap of 2: got $at2 rows")
    // one tick below the true grid size still excludes
    assert(graft.ops.Tracks.resample(pts, intervalMs = 10L,
      maxTicksPerKey = 1L).count() === 0L)
    // aligned span at the boundary: 10 ms span = 2 ticks, cap 2 keeps it
    val aligned = Seq((1L, t(base), 1.0), (1L, t(base + 10), 2.0))
      .toDF("user_id", "ts", "value")
    assert(graft.ops.Tracks.resample(aligned, intervalMs = 10L,
      maxTicksPerKey = 2L).count() === 2L)
  }

  test("trajectory plans: one exchange on the track key, no extra shuffles") {
    val pts = Seq((1L, 1L, ts("2024-01-01 00:00:00"), 1.0, 2.0))
      .toDF("uid", "eid", "t", "lat", "lon")
    val plan = Trajectory.impliedSpeed(pts, "uid", "eid", "t", "lat", "lon", 1000.0)
      .queryExecution.executedPlan.toString
    assert(plan.split("Exchange").length - 1 <= 1,
      s"impliedSpeed must shuffle once on the track key:\n$plan")
  }
}
