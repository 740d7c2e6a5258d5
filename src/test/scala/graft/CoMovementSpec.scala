package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.CoMovement

/** Golden-fixture spec for the co-movement pipeline: the hand-computed
  * scenario from FIXTURES.md §2 (mirroring README.md:164-168's motivating
  * example): a sparse transmitter fully contained in a dense track scores
  * overlap 1.0; single-shared-cell pairs are dropped by the gT>1 gate;
  * symmetric/self pairs never appear.
  */
class CoMovementSpec extends SparkSpec {
  import spark.implicits._

  private val Res = 3 // width 62.5 over [0,500)

  private def ts(hour: Int, min: Int = 0): Timestamp =
    Timestamp.valueOf(f"2025-01-01 $hour%02d:$min%02d:00")

  // B (uid 2): 24 hours, cells cycling 0..7  → win=24, geo=8
  // A (uid 1): hours 0..5 co-located with B  → win=6,  geo=6, subset of B
  // C (uid 3): hour 0 only, co-located cell 0 → every pair with C has gT=1
  private lazy val events = {
    val b = (0 until 24).map(h => (2L, ts(h), (h % 8) * 62.5 + 1.0))
    val a = (0 until 6).map(h => (1L, ts(h), (h % 8) * 62.5 + 1.0))
    val c = Seq((3L, ts(0), 1.0))
    (a ++ b ++ c).toDF("user_id", "ts", "value")
  }

  private lazy val hourly =
    CoMovement.hourlyRollup(events, "user_id", "ts", "value", Res)
  private lazy val pairs = CoMovement.pairsDaily(hourly).collect()

  test("hourly rollup: one row per (uid, hour), correct counts") {
    val h = hourly.collect()
    assert(h.length === 6 + 24 + 1)
    val byUid = h.groupBy(_.getAs[Long]("uid")).view.mapValues(_.length).toMap
    assert(byUid === Map(1L -> 6, 2L -> 24, 3L -> 1))
  }

  test("subset track scores overlap 1.0 on both axes (the GTO motivating case)") {
    assert(pairs.length === 1) // only (1,2); pairs with C die on gT>1
    val p = pairs.head
    assert(p.getAs[Long]("uid_a") === 1L && p.getAs[Long]("uid_b") === 2L)
    assert(p.getAs[Long]("hT") === 6L && p.getAs[Long]("gT") === 6L)
    assert(p.getAs[Long]("hA") === 6L && p.getAs[Long]("hB") === 24L)
    assert(p.getAs[Long]("gA") === 6L && p.getAs[Long]("gB") === 8L)
    assert(p.getAs[Double]("temporal_o") === 1.0)
    assert(p.getAs[Double]("spatial_o") === 1.0)
    assert(p.getAs[Double]("gto") === 1.0)
  }

  test("pair table never contains uid_a >= uid_b") {
    // also check on the real testdata at smoke scale
    val real = CoMovement.pairsDaily(
      CoMovement.hourlyRollup(
        graft.engine.Tables.events(spark, "/root/testdata/sf0.001"),
        "user_id", "ts", "value", SparkEntry.Res))
    assert(real.filter(col("uid_a") >= col("uid_b")).count() === 0L)
  }

  test("pairs_total lifetime summary aggregates correctly on the fixture") {
    val total = CoMovement.pairsTotal(
      CoMovement.pairsDaily(hourly), threshold = 0.4).collect()
    assert(total.length === 1)
    val t = total.head
    assert(t.getAs[Long]("total_days_observed") === 1L)
    assert(t.getAs[Long]("days_above_threshold") === 1L)
    assert(t.getAs[Double]("max_gto") === 1.0)
    assert(t.getAs[Double]("median_gto") === 1.0)
  }

  test("dense-cell guard bounds the self-join fanout on a 200-vessel anchorage") {
    // the J1 quadratic risk: ONE space-time bucket holding a fleet emits
    // C(n,2) pair rows. Fixture: a 200-vessel anchorage occupying two dense
    // buckets (so its pairs survive the gT>1 gate) next to one honest
    // 2-vessel co-movement pair.
    val d = java.sql.Date.valueOf("2025-01-01")
    val dense = (1L to 200L).flatMap(u => Seq((u, d, 1, 100L), (u, d, 2, 200L)))
    val sparse = Seq((1001L, d, 3, 300L), (1002L, d, 3, 300L),
      (1001L, d, 4, 301L), (1002L, d, 4, 301L))
    val hourlyFx = (dense ++ sparse).toDF("uid", "dt", "hr", "cell")

    // unguarded: the anchorage dominates — 19 900 quadratic pairs + 1 honest
    val unguarded = CoMovement.pairsDaily(hourlyFx)
    assert(unguarded.count() === 19900L + 1L)
    spark.catalog.clearCache()

    // guarded at 50: both 200-vessel buckets are excluded entirely; the
    // honest pair survives with its full, internally-consistent stats
    val guarded = CoMovement.pairsDaily(hourlyFx, maxUidsPerCell = 50).collect()
    assert(guarded.length === 1, s"got ${guarded.length} rows")
    val p = guarded.head
    assert(p.getAs[Long]("uid_a") === 1001L && p.getAs[Long]("uid_b") === 1002L)
    // the denominators must NOT count excluded buckets (hA consistent w/ hT)
    assert(p.getAs[Long]("hA") === 2L && p.getAs[Long]("hB") === 2L)
    assert(p.getAs[Long]("hT") === 2L && p.getAs[Long]("gT") === 2L)
    assert(p.getAs[Double]("gto") === 1.0)
    spark.catalog.clearCache()

    // the cap is inclusive: a bucket holding exactly cap vessels is kept
    val boundary = CoMovement.pairsDaily(hourlyFx, maxUidsPerCell = 200)
    assert(boundary.count() === 19900L + 1L)
    spark.catalog.clearCache()
  }

  test("ring-1 co-location finds the MOVING boundary pair; parked-adjacent noise is gated") {
    import graft.expressions.GeoCell
    val d = java.sql.Date.valueOf("2025-01-01")
    val c = GeoCell.cellId(10.0, 10.0, 2)
    val n = GeoCell.neighbors(c).head
    // a hex-distance-2 cell from c that is ALSO outside n's 1-ring, so a
    // vessel there pairs with nobody at ring-1
    val far = (GeoCell.kRing(c, 2).toSet -- GeoCell.kRing(c, 1)
      -- GeoCell.kRing(n, 1)).toSeq.sorted.head
    // an isolated spot ≥4 cells from everything: the parked pair there can
    // never cross-match the moving vessels, even at ring-2
    val p = GeoCell.kRing(c, 6).filter(x =>
      Seq(c, n, far).forall(y => GeoCell.hexDistance(x, y) >= 4)).sorted.head
    val pn = GeoCell.neighbors(p).head
    val hourly = Seq(
      // the boundary pair MOVES together: two hours straddling the c|n
      // boundary, then both relocate to far — configurations (c,n) and
      // (far,far), so the g_ring>1 co-movement gate passes
      (1L, d, 1, c), (2L, d, 1, n),
      (1L, d, 2, c), (2L, d, 2, n),
      (1L, d, 3, far), (2L, d, 3, far),
      // vessel 4 rides exactly with 1 the whole day (c, c, far)
      (4L, d, 1, c), (4L, d, 2, c), (4L, d, 3, far),
      // vessel 3 sits at far early (distance 2 from c and n: invisible at
      // ring-1), joining the flotilla's cell only at hour 3
      (3L, d, 1, far), (3L, d, 2, far), (3L, d, 3, far),
      // the stationary-noise class BOTH gates exist to drop: 5 and 6
      // parked in adjacent cells all day, configuration never changes
      (5L, d, 1, p), (6L, d, 1, pn),
      (5L, d, 2, p), (6L, d, 2, pn))
      .toDF("uid", "dt", "hr", "cell")
    val ring = CoMovement.pairsDailyRing(hourly)
      .orderBy("uid_a", "uid_b").collect()
    assert(ring.map(r => (r.getAs[Long]("uid_a"), r.getAs[Long]("uid_b"),
        r.getAs[Long]("h_ring"), r.getAs[Long]("g_ring"),
        r.getAs[Long]("h_exact"), r.getAs[Long]("ring_only"))).toSeq === Seq(
      (1L, 2L, 3L, 2L, 1L, 2L),   // found mostly via adjacency
      (1L, 3L, 1L, 1L, 1L, 0L),   // hour-3 only → gated
      (1L, 4L, 3L, 2L, 3L, 0L),   // exact co-movement still counts
      (2L, 3L, 1L, 1L, 1L, 0L),
      (2L, 4L, 3L, 2L, 1L, 2L),
      (3L, 4L, 1L, 1L, 1L, 0L))
      .filter(t => t._4 > 1),
      "only pairs whose cell configuration CHANGES survive the gate")
    val kept = ring.map(r => (r.getAs[Long]("uid_a"), r.getAs[Long]("uid_b"))).toSeq
    assert(kept === Seq((1L, 2L), (1L, 4L), (2L, 4L)))
    assert(!kept.contains((5L, 6L)),
      "the parked-adjacent pair is the noise class the gate drops")
    // the exact-cell pipeline misses the boundary pairs entirely
    assert(CoMovement.pairsDaily(hourly)
      .select("uid_a", "uid_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSeq === Seq((1L, 4L)))
    spark.catalog.clearCache()

    // widening to ring-2 picks up the hex-distance-2 vessel 3 (it moves to
    // the flotilla cell at hour 3, so its configuration changes too)
    val ring2 = CoMovement.pairsDailyRing(hourly, k = 2)
      .orderBy("uid_a", "uid_b").collect()
      .map(r => (r.getAs[Long]("uid_a"), r.getAs[Long]("uid_b"),
        r.getAs[Long]("h_ring"), r.getAs[Long]("h_exact"))).toSeq
    val expected2 = Seq(
      (1L, 2L, 3L, 1L), (1L, 3L, 3L, 1L), (1L, 4L, 3L, 3L)) ++
      // (2,3) appears iff n and far happen to sit within hex distance 2
      (if (GeoCell.hexDistance(n, far) <= 2) Seq((2L, 3L, 3L, 1L)) else Nil) ++
      Seq((2L, 4L, 3L, 1L), (3L, 4L, 3L, 1L))
    assert(ring2 === expected2.sorted)
    spark.catalog.clearCache()
  }

  test("ring-k pairing matches brute-force hexDistance on random fleets (k = 1 and 2)") {
    // the packed-long delta expansion must agree with GeoCell.hexDistance
    // on arbitrary positions — this pins ringDeltas' axial arithmetic
    // against the independent cube-coordinate distance, including the
    // g_ring configuration gate, on data with no hand-placed structure
    import graft.expressions.GeoCell
    val d = java.sql.Date.valueOf("2025-03-01")
    val rnd = new scala.util.Random(271L)
    for (k <- Seq(1, 2)) {
      val rows = for {
        uid <- 1L to 10L
        hr <- 1 to 3
      } yield (uid, d, hr,
        GeoCell.cellId(10.0 + rnd.nextDouble() * 0.8,
          10.0 + rnd.nextDouble() * 0.8, 2))
      // brute force: matched hours per pair via hexDistance ≤ k, then the
      // distinct-configuration gate
      val byHour = rows.groupBy(_._3)
      val cand = (for {
        (_, hs) <- byHour.toSeq
        a <- hs; b <- hs
        if a._1 < b._1 && GeoCell.hexDistance(a._4, b._4) <= k
      } yield ((a._1, b._1), (a._4, b._4))).groupBy(_._1)
      val expected = cand.view.mapValues { ms =>
        (ms.size.toLong, ms.map(_._2).distinct.size.toLong,
          ms.count(m => m._2._1 == m._2._2).toLong)
      }.filter(_._2._2 > 1).toMap
      val got = CoMovement.pairsDailyRing(
          rows.toDF("uid", "dt", "hr", "cell"), k)
        .collect().map(r => (r.getAs[Long]("uid_a"), r.getAs[Long]("uid_b")) ->
          ((r.getAs[Long]("h_ring"), r.getAs[Long]("g_ring"),
            r.getAs[Long]("h_exact")))).toMap
      assert(got === expected, s"k=$k random-fleet mismatch")
      spark.catalog.clearCache()
    }
  }

  test("out-of-range and null positions are filtered before rollup") {
    val dirty = Seq(
      (1L, ts(0), 600.0),           // out of [0,500]
      (1L, ts(0), -1.0),
      (2L, ts(1), 10.0)).toDF("user_id", "ts", "value")
      .union(Seq((3L, Option.empty[Timestamp], Option(5.0)))
        .toDF("user_id", "ts", "value"))
    val h = CoMovement.hourlyRollup(dirty, "user_id", "ts", "value", Res).collect()
    assert(h.length === 1)
    assert(h.head.getAs[Long]("uid") === 2L)
  }
}
