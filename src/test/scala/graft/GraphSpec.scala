package graft

import graft.engine.CacheScope
import graft.ops.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRankMicro: exact integer ranks on a path graph a-b-c") {
    // N=3, init r=333333, base=150000/3=50000.
    // iter1 contribs: a←b: 333333 div 2 = 166666; b←a+c: 333333+333333;
    //   r(a)=r(c)=50000+(17*166666) div 20 = 50000+141666 = 191666
    //   r(b)=50000+(17*666666) div 20 = 50000+566666 = 616666
    val edges = Seq(("a", "b"), ("b", "c")).toDF("x", "y")
    val scope = new CacheScope
    val one = Graph.pageRankMicro(edges, "x", "y", iterations = 1, scope)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(one("a") === ((1L, 191666L)))
    assert(one("b") === ((2L, 616666L)))
    assert(one("c") === ((1L, 191666L)))
    scope.release()
  }

  test("pageRankMicro: symmetric nodes tie exactly; hubs outrank leaves") {
    // star: center s with 4 leaves — leaves must all carry the identical
    // integer rank (bit-stable determinism), center far above
    val edges = Seq(("s", "l1"), ("s", "l2"), ("s", "l3"), ("s", "l4"))
      .toDF("x", "y")
    val scope = new CacheScope
    val got = Graph.pageRankMicro(edges, "x", "y", iterations = 3, scope)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val leafRanks = Seq("l1", "l2", "l3", "l4").map(got)
    assert(leafRanks.distinct.size === 1, "symmetric leaves must tie exactly")
    assert(got("s") > leafRanks.head * 2, "the hub must dominate")
    scope.release()
  }

  test("seedDistance: hop levels on a path, capped at maxHops, unreached absent") {
    // 1-2-3-4-5 seeded at 1: hops 0,1,2,3 and node 5 (4 hops out) absent
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("x", "y")
    val scope = new CacheScope
    val seeds = Seq(1L).toDF("id")
    val got = Graph.seedDistance(edges, "x", "y", seeds, "id", maxHops = 3, scope)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3),
      s"path distances from node 1, node 5 beyond the cap: $got")
    scope.release()
  }

  test("seedDistance: multi-source takes the nearest seed; edges are undirected") {
    // 1-2-3-4-5 seeded at BOTH ends: middle node 3 is 2 hops from either,
    // 2 and 4 are 1 hop from their near end — and reachability flows
    // against the stored edge direction (5←4 discovered from seed 5)
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("x", "y")
    val scope = new CacheScope
    val seeds = Seq(1L, 5L).toDF("id")
    val got = Graph.seedDistance(edges, "x", "y", seeds, "id", maxHops = 3, scope)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 5L -> 0, 2L -> 1, 4L -> 1, 3L -> 2))
    scope.release()
  }

  test("seedDistance: a cycle settles each node once at its minimal hop") {
    // square 1-2-3-4-1 seeded at 1: nodes 2 and 4 at hop 1, node 3 reached
    // from both sides at hop 2 — exactly one row, no duplicate settlement
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("x", "y")
    val scope = new CacheScope
    val seeds = Seq(1L).toDF("id")
    val rows = Graph.seedDistance(edges, "x", "y", seeds, "id", maxHops = 3, scope)
      .collect().map(r => r.getLong(0) -> r.getInt(1))
    assert(rows.length === rows.map(_._1).distinct.length,
      "a node must settle exactly once")
    assert(rows.toMap === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 1))
    scope.release()
  }

  test("triangleCounts: K4 — every node in three triangles, four total") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("x", "y")
    val scope = new CacheScope
    val got = Graph.triangleCounts(edges, "x", "y", scope)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 3, 2L -> 3, 3L -> 3, 4L -> 3))
    assert(got.values.sum === 12L, "4 triangles x 3 corners")
    scope.release()
  }

  test("triangleCounts: paths and stars are triangle-free; shared-edge pair counts once each") {
    val scope = new CacheScope
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    assert(Graph.triangleCounts(path, "x", "y", scope).count() === 0L)
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)).toDF("x", "y")
    assert(Graph.triangleCounts(star, "x", "y", scope).count() === 0L)
    // {1,2,3} and {2,3,4} share edge 2-3: nodes 2,3 sit in two triangles,
    // 1 and 4 in one — and the shared edge does not double-close anything
    val two = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L)).toDF("x", "y")
    val got = Graph.triangleCounts(two, "x", "y", scope)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1, 2L -> 2, 3L -> 2, 4L -> 1))
    scope.release()
  }

  test("triangleCounts: duplicate and reversed input edges do not inflate counts") {
    // the symmetrize+distinct build must collapse (a,b), (b,a), and repeats
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L))
      .toDF("x", "y")
    val scope = new CacheScope
    val got = Graph.triangleCounts(edges, "x", "y", scope)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1, 2L -> 1, 3L -> 1))
    scope.release()
  }

  test("commonNeighborPairs: shadow pair found, adjacent pairs excluded, jaccard exact") {
    // 1 and 4 never touch but share neighbors {2,3}: common=2,
    // deg(1)=deg(4)=2 → jaccard = 2/(2+2-2) = 1.0. Pair (2,3) IS an edge
    // → excluded despite sharing neighbors {1,4}.
    val edges = Seq((1L, 2L), (1L, 3L), (4L, 2L), (4L, 3L), (2L, 3L))
      .toDF("x", "y")
    val scope = new CacheScope
    val got = Graph.commonNeighborPairs(edges, "x", "y", minCommon = 2,
        maxNeighbors = 100, scope = scope)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.toSeq === Seq((1L, 4L, 2L, 1.0, false)),
      s"only the non-adjacent shadow pair qualifies, exact (unclipped): ${got.toSeq}")
    scope.release()
  }

  test("commonNeighborPairs: minCommon gates and the neighbor cap clips a hub deterministically") {
    // star hub 9 with leaves 1..4: every leaf pair shares exactly {9} —
    // common=1, below minCommon=2 → empty
    val scope = new CacheScope
    val star = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)).toDF("x", "y")
    assert(Graph.commonNeighborPairs(star, "x", "y", minCommon = 2,
      maxNeighbors = 100, scope = scope).count() === 0L)
    // with minCommon=1 and cap=2 the hub keeps neighbors {1,2} (first by
    // id): only pair (1,2) survives — the clip is by id, not arrival
    val capped = Graph.commonNeighborPairs(star, "x", "y", minCommon = 1,
        maxNeighbors = 2, scope = scope)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
    assert(capped.toSeq === Seq((1L, 2L, 1L, true)),
      s"cap must keep the id-first neighbors AND flag the survivors as " +
        s"possibly-undercounted (their common neighbor 9 was clipped): ${capped.toSeq}")
    scope.release()
  }

  test("clipped flag keys on clipped COMMON NEIGHBORS, not the endpoints' own degree") {
    // hub 9 (deg 4 > cap 3) is clipped; 5 (deg 1) and 6 (deg 1) share only
    // UNclipped neighbor 7 — their count is exact and must NOT be flagged,
    // even though a clipped node exists elsewhere in the graph; while
    // (1,2) — common neighbor 9 clipped — must be flagged
    val scope = new CacheScope
    val g = Seq((9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L),
      (7L, 5L), (7L, 6L)).toDF("x", "y")
    val got = Graph.commonNeighborPairs(g, "x", "y", minCommon = 1,
        maxNeighbors = 3, scope = scope)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getBoolean(4))).toMap
    assert(got((5L, 6L)) === false,
      "a pair whose every common neighbor kept its full list is exact")
    assert(got.filterKeys(k => k._1 <= 4 && k._2 <= 4).values.forall(identity),
      s"pairs through the clipped hub are flagged lower-bound: $got")
    scope.release()
  }

  test("weightedPageRankMicro: exact integers, rank flows by edge weight") {
    // a-b (w=3), b-c (w=1): wout a=3, b=4, c=1; N=3, r0=333333 each.
    // iter1: m(b) = (333333*3) div 3 + (333333*1) div 1 = 666666
    //        m(a) = (333333*3) div 4 = 249999;  m(c) = (333333*1) div 4 = 83333
    //        base = 150000 div 3 = 50000
    //        r(a) = 50000 + (17*249999) div 20 = 262499
    //        r(b) = 50000 + (17*666666) div 20 = 616666
    //        r(c) = 50000 + (17*83333)  div 20 = 120833
    val edges = Seq(("a", "b", 3L), ("b", "c", 1L)).toDF("x", "y", "w")
    val scope = new CacheScope
    val got = Graph.weightedPageRankMicro(edges, "x", "y", "w",
        iterations = 1, scope)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map("a" -> ((3L, 262499L)), "b" -> ((4L, 616666L)),
      "c" -> ((1L, 120833L))), s"hand-computed iteration-1 integers: $got")
    // uniform weights must reproduce the unweighted operator exactly
    val uni = Seq(("a", "b", 1L), ("b", "c", 1L)).toDF("x", "y", "w")
    val w1 = Graph.weightedPageRankMicro(uni, "x", "y", "w", 2, scope)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    val p1 = Graph.pageRankMicro(uni.select("x", "y"), "x", "y", 2, scope)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(w1 === p1, "uniform weights degenerate to topology-only PageRank")
    scope.release()
  }

  test("kCore: chains and stars peel away, cycles and cliques survive with in-core degrees") {
    val scope = new CacheScope
    // a 4-cycle with a pendant tail and a star: the 2-core is exactly the
    // cycle (everyone keeps 2 partners); tail and star peel in cascades
    val g = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), // cycle
      (4L, 5L), (5L, 6L),                               // tail off the cycle
      (9L, 10L), (9L, 11L), (9L, 12L)).toDF("x", "y")   // star
    val core = Graph.kCore(g, "x", "y", k = 2, scope = scope)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 2L),
      s"only the cycle survives, each member at in-core degree 2: $core")
    // K4 at k=3: the whole clique stays at degree 3
    val k4 = (for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)).toDF("x", "y")
    val c4 = Graph.kCore(k4, "x", "y", k = 3, scope = scope)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(c4 === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // a pure path has no 2-core at all
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    assert(Graph.kCore(path, "x", "y", k = 2, scope = scope).count() === 0L,
      "peeling a path must cascade to empty")
    scope.release()
  }

  test("kCore converge-or-fail: a deep chain peels to fixpoint; an exhausted cap throws") {
    val scope = new CacheScope
    // a triangle welded to a 40-node chain: the chain peels ONE node per
    // round from its free end (~40 rounds — far past the old 8-round cap,
    // which would have silently reported chain remnants as "the 2-core")
    val deep = (Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 100L)) ++
      (0 until 39).map(i => (100L + i, 101L + i))).toDF("x", "y")
    val core = Graph.kCore(deep, "x", "y", k = 2, scope = scope)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      s"the drained peel must strip the whole chain: $core")
    // the same graph under a too-small safety cap must THROW, never
    // return the partially-peeled superset
    val e = intercept[IllegalArgumentException] {
      Graph.kCore(deep, "x", "y", k = 2, maxRounds = 5, scope = scope).count()
    }
    assert(e.getMessage.contains("fixpoint"), e.getMessage)
    scope.release()
  }

  test("seedDistanceAll: early-stops when the frontier drains; matches bounded BFS") {
    // path 1-2-3-4 seeded at 1: eccentricity 3. hopCap=1000 must cost a
    // handful of driver rounds, not a thousand — count jobs to observe the
    // early exit directly
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("x", "y")
    val seeds = Seq(1L).toDF("id")
    val scope = new CacheScope
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val all = Graph.seedDistanceAll(edges, "x", "y", seeds, "id",
          hopCap = 1000, scope = scope)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(all === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3),
        "the whole ball gets exact nearest-seed hops")
      assert(jobs.get < 60,
        s"early exit must bound driver rounds by the true eccentricity, " +
          s"not hopCap: ${jobs.get} jobs for hopCap=1000")
      // row-identical to the bounded call once maxHops covers the ball
      val bounded = Graph.seedDistance(edges, "x", "y", seeds, "id",
          maxHops = 5, scope = scope)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(bounded === all, "bounded and drained BFS agree on a covered ball")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      scope.release()
    }
  }

  test("personalizedPageRankMicro: exact integers on a-b-c seeded at b") {
    // |S|=1: init r(b)=1000000, others 0; base(b)=150000, others 0.
    // iter1: a and c each receive 1000000 div 2 = 500000 →
    //   r(a)=r(c) = 0 + (17*500000) div 20 = 425000; r(b) = 150000 + 0.
    val edges = Seq(("a", "b"), ("b", "c")).toDF("x", "y")
    val scope = new CacheScope
    val seeds = Seq("b").toDF("id")
    val got = Graph.personalizedPageRankMicro(edges, "x", "y", seeds, "id",
        iterations = 1, scope)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(got === Map("a" -> 425000L, "b" -> 150000L, "c" -> 425000L))
    scope.release()
  }

  test("personalizedPageRankMicro: a seed absent from the graph neither appears nor dilutes the mass") {
    // seeds {b, zz}: zz has no edges — |S| must count only b, so the
    // result is bit-identical to seeding {b} alone (no silent deflation)
    val edges = Seq(("a", "b"), ("b", "c")).toDF("x", "y")
    val scope = new CacheScope
    val both = Graph.personalizedPageRankMicro(edges, "x", "y",
        Seq("b", "zz").toDF("id"), "id", iterations = 1, scope)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(both === Map("a" -> 425000L, "b" -> 150000L, "c" -> 425000L),
      s"present seeds must receive the FULL teleport mass: $both")
    assert(!both.contains("zz"), "an edgeless seed has nothing to rank")
    scope.release()
  }

  test("personalizedPageRankMicro: rank never reaches a disconnected component") {
    // two components; seed lives in {1,2} — {8,9} must stay at exactly 0
    // through every iteration (no uniform teleport mass leaks across)
    val edges = Seq((1L, 2L), (8L, 9L)).toDF("x", "y")
    val scope = new CacheScope
    val seeds = Seq(1L).toDF("id")
    val got = Graph.personalizedPageRankMicro(edges, "x", "y", seeds, "id",
        iterations = 3, scope)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got(8L) === 0L && got(9L) === 0L,
      s"disconnected nodes must hold zero rank: $got")
    assert(got(1L) > 0L && got(2L) > 0L)
    scope.release()
  }

  // deterministic Erdős–Rényi-ish fixture: every unordered pair of 1..n
  // becomes an edge with probability p under a fixed seed
  private def randomGraph(seed: Long, n: Int, p: Double): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    for {
      i <- 1 to n; j <- (i + 1) to n
      if rnd.nextDouble() < p
    } yield (i.toLong, j.toLong)
  }

  private def adjacency(edges: Seq[(Long, Long)]): Map[Long, Set[Long]] =
    edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupMap(_._1)(_._2).view.mapValues(_.toSet).toMap

  test("triangleCounts matches the brute-force count on random graphs") {
    val scope = new CacheScope
    for (seed <- Seq(11L, 23L, 47L)) {
      val edges = randomGraph(seed, 12, 0.4)
      val adj = adjacency(edges)
      val expected = adj.keys.toSeq.map { v =>
        val nb = adj(v).toSeq
        v -> (for {
          i <- nb.indices; j <- (i + 1) until nb.size
          if adj(nb(i)).contains(nb(j))
        } yield 1).size.toLong
      }.filter(_._2 > 0).toMap
      val got = Graph.triangleCounts(edges.toDF("x", "y"), "x", "y", scope)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expected, s"random graph seed=$seed, edges=$edges")
    }
    scope.release()
  }

  test("seedDistance matches a reference BFS on random graphs and seeds") {
    val scope = new CacheScope
    for (seed <- Seq(5L, 31L, 77L)) {
      val edges = randomGraph(seed, 14, 0.25)
      val adj = adjacency(edges)
      val nodes = adj.keys.toSeq.sorted
      val rnd = new scala.util.Random(seed * 7)
      val seeds = rnd.shuffle(nodes).take(2)
      // reference: frontier BFS to 3 hops over the adjacency map
      var dist = seeds.map(_ -> 0).toMap
      var frontier = seeds.toSet
      for (h <- 1 to 3) {
        val next = frontier.flatMap(adj).diff(dist.keySet)
        dist = dist ++ next.map(_ -> h)
        frontier = next
      }
      val got = Graph.seedDistance(edges.toDF("x", "y"), "x", "y",
          seeds.toDF("id"), "id", maxHops = 3, scope)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === dist, s"seed=$seed, seeds=$seeds")
    }
    scope.release()
  }

  test("commonNeighborPairs matches brute force on random graphs (uncapped)") {
    val scope = new CacheScope
    for (seed <- Seq(3L, 59L)) {
      val edges = randomGraph(seed, 12, 0.35)
      val adj = adjacency(edges)
      val nodes = adj.keys.toSeq.sorted
      val expected = (for {
        i <- nodes.indices; j <- (i + 1) until nodes.size
        a = nodes(i); b = nodes(j)
        if !adj(a).contains(b)
        common = (adj(a) & adj(b)).size.toLong
        if common >= 2
      } yield (a, b) -> ((common,
        BigDecimal(common.toDouble / (adj(a).size + adj(b).size - common))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
      val got = Graph.commonNeighborPairs(edges.toDF("x", "y"), "x", "y",
          minCommon = 2, maxNeighbors = 1000, scope = scope)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), BigDecimal(r.getDouble(3))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble))).toMap
      assert(got === expected, s"seed=$seed")
    }
    scope.release()
  }

  test("personalized rank support equals the BFS ball of the iteration radius") {
    // cross-operator invariant: after k iterations, ppr rank is positive on
    // exactly the nodes within k hops of the seed (teleport mass only
    // enters at seeds; each iteration propagates one hop; with n=14 the
    // integer truncation cannot starve a reachable node to zero)
    val scope = new CacheScope
    for (seed <- Seq(13L, 41L)) {
      val edges = randomGraph(seed, 14, 0.15)
      val nodes = adjacency(edges).keys.toSeq.sorted
      val s0 = nodes.head
      val ball = Graph.seedDistance(edges.toDF("x", "y"), "x", "y",
          Seq(s0).toDF("id"), "id", maxHops = 3, scope)
        .collect().map(_.getLong(0)).toSet
      val positive = Graph.personalizedPageRankMicro(edges.toDF("x", "y"),
          "x", "y", Seq(s0).toDF("id"), "id", iterations = 3, scope)
        .collect().filter(_.getLong(2) > 0L).map(_.getLong(0)).toSet
      assert(positive === ball,
        s"seed=$seed: rank support must be the 3-hop ball of $s0")
    }
    scope.release()
  }

  test("pageRankMicro: total rank mass stays near one million") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
      .toDF("x", "y")
    val scope = new CacheScope
    val ranks = Graph.pageRankMicro(edges, "x", "y", iterations = 5, scope)
      .collect().map(_.getLong(2))
    val total = ranks.sum
    // truncating division bleeds at most a few micro-units per node per step
    assert(total > 999000L && total <= 1000000L, s"mass was $total")
    scope.release()
  }
}
