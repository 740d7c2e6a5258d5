package graft

import org.apache.spark.sql.functions._

import graft.ops.{Stats, TimeSeries}

class StatsSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clips at the group quantiles and flags only moved rows") {
    // group g: units 1..100 → p05 = 5.95, p95 = 95.05 (linear interpolation)
    val df = (1 to 100).map(i => (i.toLong, "g", i.toDouble / 100)).toDF("id", "grp", "v")
    val out = Stats.winsorize(df, "id", "grp", "v", 0.05, 0.95)
      .select("id", "clipped", "was_clipped").as[(Long, Double, Boolean)]
      .collect().sortBy(_._1)
    assert(out.count(_._3) === 10) // 5 below + 5 above move
    assert(out.filter(_._1 <= 5).forall(_._2 == 0.0595))
    assert(out.filter(_._1 >= 96).forall(_._2 == 0.950500))
    // interior values pass through unclipped
    assert(out.filter(r => r._1 > 6 && r._1 < 95).forall(!_._3))
    assert(out.find(_._1 == 50).get._2 === 0.5)
  }

  test("winsorize groups clip independently") {
    val df = ((1 to 10).map(i => (i.toLong, "a", i.toDouble)) ++
      (11 to 20).map(i => (i.toLong, "b", i.toDouble * 100))).toDF("id", "grp", "v")
    val out = Stats.winsorize(df, "id", "grp", "v", 0.0, 0.5)
      .filter(col("grp") === "a")
    // group a's median is 5.5 — no cross-contamination from b's huge values
    assert(out.filter(col("clipped") > 5.5).count() === 0)
  }

  test("equi-depth histogram: equal counts, contiguous non-overlapping ranges") {
    val df = (1 to 200).map(i => ("g", i.toDouble, i.toLong)).toDF("grp", "v", "id")
    val out = Stats.equiDepthHistogram(df, "grp", "v", "id", 10)
      .orderBy("bucket")
      .select("bucket", "n_rows", "lo", "hi").as[(Long, Long, Double, Double)]
      .collect()
    assert(out.length === 10)
    assert(out.forall(_._2 == 20L)) // 200 rows / 10 buckets
    assert(out.sliding(2).forall { case Array(a, b) => a._4 < b._3; case _ => true })
    assert(out.head._3 === 1.0 && out.last._4 === 200.0)
  }

  test("rolling range stats: trailing window, inclusive bound, peers, keys isolated") {
    def t(s: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val df = Seq(
      (1L, 1L, t(0), 1.0),
      (2L, 1L, t(30), 3.0),
      (3L, 1L, t(90), 5.0),   // frame [30, 90]: includes id 2 (60 s back, inclusive)
      (4L, 1L, t(151), 7.0),  // frame [91, 151]: id 3 at 90 just outside
      (5L, 1L, t(151), 9.0),  // peer of id 4 — range frame sees both
      (6L, 2L, t(30), 100.0)  // other key: never mixes
    ).toDF("id", "k", "ts", "v")
    val out = graft.ops.TimeSeries
      .rollingRangeStats(df, "id", "k", "ts", "v", windowSec = 60)
      .select("id", "n_win", "avg_win").as[(Long, Long, Double)]
      .collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 1L, 1.0), (2L, 2L, 2.0), (3L, 2L, 4.0),
      (4L, 2L, 8.0), (5L, 2L, 8.0), (6L, 1L, 100.0)))
  }

  test("rolling range stats: null values counted out of the mean, not the row set") {
    def t(s: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val df = Seq((1L, 1L, t(0), Some(2.0)), (2L, 1L, t(10), None))
      .toDF("id", "k", "ts", "v")
    val out = graft.ops.TimeSeries
      .rollingRangeStats(df, "id", "k", "ts", "v", windowSec = 60)
      .select("id", "n_win", "avg_win").as[(Long, Long, Option[Double])]
      .collect().sortBy(_._1).toSeq
    // row 2 emits (its frame holds one non-null value), nulls never shrink rows
    assert(out === Seq((1L, 1L, Some(2.0)), (2L, 1L, Some(2.0))))
  }

  test("rolling range stats agree with a brute-force frame on randomized data") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 300).map { i =>
      (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(500), rnd.nextInt(2000) / 100.0)
    }
    def t(s: Int) = java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(s))
    val df = rows.map { case (id, k, s, v) => (id, k, t(s), v) }.toDF("id", "k", "ts", "v")
    val got = graft.ops.TimeSeries
      .rollingRangeStats(df, "id", "k", "ts", "v", windowSec = 60)
      .select("id", "n_win", "avg_win").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (id, k, s, _) =>
      val frame = rows.filter(r => r._2 == k && r._3 <= s && r._3 >= s - 60)
      val units = frame.map(r => math.round(r._4 * 10000))
      val want = BigDecimal(units.sum.toDouble / (units.length * 10000))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(id)._1 === units.length.toLong, s"n_win for id=$id")
      assert(math.abs(got(id)._2 - want) < 1e-9, s"avg_win for id=$id")
    }
  }

  test("gap fill: dense hourly grid per key over the key's own span") {
    val df = Seq(
      (1L, "2024-01-01 00:10:00"), (1L, "2024-01-01 00:50:00"), // 2 in hour 0
      (1L, "2024-01-01 03:05:00"),                              // gap: hours 1,2
      (2L, "2024-01-05 10:00:00"))                              // separate span
      .toDF("k", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val out = TimeSeries.hourlyCountsDense(df, "k", "ts")
      .select(col("k"), col("hour_ts").cast("string"), col("n_events"))
      .as[(Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(out.filter(_._1 == 1L).map(_._3).toSeq === Seq(2L, 0L, 0L, 1L))
    // key 2's grid is its own single hour — NOT stretched to key 1's span
    assert(out.filter(_._1 == 2L).map(_._3).toSeq === Seq(1L))
    assert(out.filter(_._1 == 1L).map(_._2).toSeq ===
      (0 to 3).map(h => f"2024-01-01 0$h%d:00:00"))
  }

  test("robustOutliers: MAD baseline shrugs off the outlier; MAD=0 group nulls") {
    // group a: 1,2,3,4,100 -> median 3.0, MAD 1.0; only 100 crosses |z|>3.5.
    // (mean/std would put the mean at 22 and sigma ~39 — the outlier hides
    // in its own wake; the median/MAD baseline is why this operator exists.)
    // group b: 5,5,5,9 -> MAD 0 -> null scores, null flags
    val rows = Seq(
      (1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0), (4L, "a", 4.0),
      (5L, "a", 100.0),
      (6L, "b", 5.0), (7L, "b", 5.0), (8L, "b", 5.0), (9L, "b", 9.0)
    ).toDF("event_id", "event_type", "value")
    val got = graft.ops.Stats.robustOutliers(rows, "event_id", "event_type",
        "value", zThresh = 3.5)
      .orderBy("event_id").collect()
    def z(i: Int) = if (got(i).isNullAt(3)) None else Some(got(i).getDouble(3))
    def flag(i: Int) = if (got(i).isNullAt(4)) None else Some(got(i).getBoolean(4))
    // hand math in u=100ths: med=300, mad2=200 -> rz = (u-300)/(1.4826*100)
    def expect(u: Long) = {
      val raw = (u.toDouble - 300.0) / (1.4826 * (200.0 / 2.0))
      new java.math.BigDecimal(raw)
        .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    }
    assert(z(0) === Some(expect(100)) && flag(0) === Some(false))
    assert(z(2) === Some(0.0) && flag(2) === Some(false))
    assert(z(4) === Some(expect(10000)) && flag(4) === Some(true),
      "the 100.0 reading must flag against the robust baseline")
    (5 to 8).foreach { i =>
      assert(z(i) === None && flag(i) === None, s"MAD=0 group row $i must be null")
    }
  }

  test("exactCorr: perfect / inverse / uncorrelated / degenerate, hand-checked") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      // y = 2x -> corr exactly 1
      ("up", 1.0, 2.0), ("up", 2.0, 4.0), ("up", 3.0, 6.0),
      // y = -x -> corr exactly -1
      ("down", 1.0, -1.0), ("down", 2.0, -2.0), ("down", 3.0, -3.0),
      // symmetric V shape -> corr exactly 0
      ("flat", -1.0, 1.0), ("flat", 0.0, 0.0), ("flat", 1.0, 1.0),
      // zero variance in x -> null
      ("deg", 5.0, 1.0), ("deg", 5.0, 2.0)
    ).toDF("g", "x", "y")
    val out = Stats.exactCorr(df, "g", col("x"), col("y"),
        xUnit = 1000000L, yUnit = 1000000L)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out("up") === Some(1.0))
    assert(out("down") === Some(-1.0))
    assert(out("flat") === Some(0.0))
    assert(out("deg") === None, "zero x-variance must be null, not NaN")
  }

  test("trendFit: hand-fit lines, fractional slope, degenerate group null") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      ("a", 0.0, 1.0), ("a", 1.0, 3.0), ("a", 2.0, 5.0),   // y = 2x + 1
      ("f", 0.0, 0.0), ("f", 1.0, 1.0), ("f", 2.0, 1.0),   // slope 1/2
      ("d", 4.0, 1.0), ("d", 4.0, 9.0)                      // no x variance
    ).toDF("g", "x", "y")
    val out = Stats.trendFit(df, "g", col("x"), col("y"), xUnit = 1L, yUnit = 1L)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some((r.getDouble(2), r.getDouble(3))))).toMap
    assert(out("a") === Some((2.0, 1.0)))
    assert(out("f") === Some((0.5, 0.166667)))
    assert(out("d") === None)
  }

  test("exactCorr: identical result under any partitioning (exact moments)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1 to 500).map(i =>
      ("g", i.toDouble, math.sin(i.toDouble) * 100 + i * 0.3)).toDF("g", "x", "y")
    val a = Stats.exactCorr(df, "g", col("x"), col("y")).collect()
    val b = Stats.exactCorr(df.repartition(13), "g", col("x"), col("y")).collect()
    assert(a.toSeq === b.toSeq, "decimal moment sums cannot vary with partitioning")
  }

  test("decayedSum: hand-computed half-life weighting, order-independent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // ref 2024-01-08, half-life 7d: ages 0 and 7 → weights 1 and 0.5
    val df = Seq(
      (1L, "2024-01-08 10:00:00", 100.0),  // age 0 → 100
      (1L, "2024-01-01 23:00:00", 100.0),  // age 7 → 50
      (2L, "2024-01-08 00:00:00", 8.0))    // age 0 → 8
      .toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    def run(d: org.apache.spark.sql.DataFrame) =
      Stats.decayedSum(d, "user_id", col("value"), col("ts"),
          "2024-01-08", 7.0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .sortBy(_._1).toSeq
    assert(run(df) === Seq((1L, 2L, 150.0), (2L, 1L, 8.0)))
    assert(run(df.repartition(7)) === run(df))
  }
}
