package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.bridge

import graft.engine.CacheScope

/** Iterative graph analytics over the vessel-pair co-movement graph the
  * reference builds (`sql/gold/create_pairs_daily.sql:13-32` — pair edges
  * with daily weights; the README frames them as an association network).
  * The reference stops at per-pair scores; ranking WITHIN the network
  * (which vessels are hubs of co-movement?) is the natural next question,
  * and the same operator shape serves any entity graph a training-data
  * pipeline produces (document-link graphs, near-dup clusters).
  *
  * Determinism contract (the hard part of cross-engine iterative math):
  * ranks live in integer MICRO-units and every update uses only integer
  * `+`, `*`, and truncating division — `r/deg` and `0.85·x = (17·x) div 20`
  * — so any engine (and the DuckDB oracle's unrolled CTE chain) reproduces
  * the exact bigint at every iteration. No floats anywhere until a caller
  * divides at the edge.
  *
  * Scale shape: one `distinct` on the symmetrized edge list, a degree
  * aggregate, then per iteration ONE join (ranks onto edge sources,
  * partitioned by key) and ONE groupBy (contribution sums) —  the classic
  * Pregel/GraphX message-passing plan with no driver-side per-node state.
  * `localCheckpoint` after each iteration truncates the lineage chain
  * (an unrolled 10-iteration plan would otherwise re-execute from scratch
  * per action and overwhelm the optimizer). Edges persist once via the
  * caller's [[CacheScope]] — every iteration reads them.
  */
object Graph {

  /** PageRank with damping 0.85 over an UNDIRECTED edge list, in integer
    * micro-units: init `1e6 div N`; each iteration
    * `r' = (150000 div N) + (17 · Σ_nbr (r_nbr div deg_nbr)) div 20`.
    * Every node in `edges` has degree ≥ 1 by construction (symmetrized
    * list), so there is no dangling mass. Output: (id, deg, rank_micro).
    */
  def pageRankMicro(edges: DataFrame, aCol: String, bCol: String,
                    iterations: Int = 3,
                    scope: CacheScope = CacheScope.global): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    // hash-partition the edge list by src ONCE — `distinct` leaves it keyed
    // by (src, dst), which no later stage can reuse; keyed by src, every
    // iteration's rank→edge join is exchange-free on the (big) edge side.
    // At corpus scale this is the difference between shuffling the full
    // edge list per iteration and shuffling only the (tiny) rank vector.
    val und = symmetrize(edges, aCol, bCol, scope)
    // deg groups the already-src-partitioned edges (no exchange) and is
    // persisted keyed by id — the per-iteration contrib→deg join aligns on
    // both sides (groupBy dst emits HashPartitioning(dst→id)), so it is
    // exchange-free too: each iteration moves ONLY the message shuffle.
    // N rides the plan as a broadcast single-row aggregate (1e6 div N and
    // the teleport base become columns of the persisted deg frame) — no
    // eager count at query-construction time; an empty edge list yields an
    // empty result instead of an error. The 1-row broadcast join preserves
    // the streamed side's partitioning, so the alignment above survives it
    // (ShuffleBudgetSpec's pair_pagerank ceiling is the canary).
    val deg0 = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
    val nDf = deg0.agg(count(lit(1)).as("__n"))
    val deg = scope.persisted(deg0.crossJoin(broadcast(nDf))
      .select(col("id"), col("deg"),
        expr("1000000L div __n").as("__r0"),
        expr("150000L div __n").as("__base")))
    rankLoop(und, deg, iterations)
      .select(col("id"), col("deg"), col("r").as("rank_micro"))
  }

  /** Weight-proportional PageRank: like [[pageRankMicro]] but each
    * neighbor receives rank in proportion to its EDGE WEIGHT —
    * `c = (r · w_edge) div W_out(src)` — so a vessel ranks by the
    * STRENGTH of its co-movement ties (shared hours, co-occurrence
    * counts), not just their number. The topology-only variant treats a
    * 1-hour coincidence and a 3-month convoy as the same edge; weighting
    * is what makes the rank read as sustained-association centrality.
    *
    * Weights must be non-negative integers (counts — shared hours here);
    * the determinism contract is unchanged: integer micro-units, per-edge
    * truncating division, bit-identical to the oracle's unrolled chain.
    * Same per-iteration plan shape (ONE keyed join + ONE map-side-combined
    * groupBy over the src-partitioned weighted edge frame); the weighted
    * symmetrize sums duplicate directed weights so an input listing both
    * orientations still conserves mass. Output: (id, w_total, rank_micro)
    * where w_total is the node's total incident weight.
    */
  def weightedPageRankMicro(edges: DataFrame, aCol: String, bCol: String,
                            wCol: String, iterations: Int = 3,
                            scope: CacheScope = CacheScope.global): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val und = scope.persisted(
      edges.select(col(aCol).as("src"), col(bCol).as("dst"),
          col(wCol).cast("long").as("w"))
        .union(edges.select(col(bCol).as("src"), col(aCol).as("dst"),
          col(wCol).cast("long").as("w")))
        // same one-exchange discipline as [[symmetrize]] (r19, guide §2.4):
        // partition by src, then the (src, dst) weight-sum aggregate runs
        // exchange-free on the already-satisfying distribution and keeps
        // the src partitioning the iteration joins align on — the former
        // aggregate-then-repartition shape paid a second full shuffle of
        // the weighted edge list for the same rows
        .repartition(col("src"))
        .groupBy("src", "dst").agg(sum("w").as("w")))
    val wout = und.groupBy("src").agg(sum("w").as("wout"))
      .select(col("src").as("id"), col("wout"))
    val nDf = wout.agg(count(lit(1)).as("__n"))
    val deg = scope.persisted(wout.crossJoin(broadcast(nDf))
      .select(col("id"), col("wout"),
        expr("1000000L div __n").as("__r0"),
        expr("150000L div __n").as("__base")))
    var ranks = deg.select(col("id"), col("wout"), col("__r0").as("r"))
    for (it <- 1 to iterations) {
      val contrib = und
        .join(ranks.select(col("id").as("src"), col("r"),
          col("wout")), "src")
        .select(col("dst"), expr("(r * w) div wout").as("c"))
        .groupBy("dst").agg(sum(col("c")).as("m"))
        .select(col("dst").as("id"), col("m"))
      ranks = deg.join(contrib, Seq("id"), "left")
        .select(col("id"), col("wout"),
          (col("__base") + expr("(17 * coalesce(m, 0L)) div 20")).as("r"))
      if (it % 4 == 0 && it < iterations) ranks = ranks.localCheckpoint()
    }
    ranks.select(col("id"), col("wout").as("w_total"), col("r").as("rank_micro"))
  }

  /** Personalized PageRank: the damping-complement mass teleports to the
    * SEED set only (init `1e6 div |S|` on seeds, 0 elsewhere; per-node
    * base `150000 div |S|` for seeds, 0 elsewhere), so rank concentrates
    * in the seeds' neighborhood — graph-local relevance. The curation
    * read: propagate trust/quality from a hand-curated seed set through
    * the association graph, scoring every node by proximity-weighted
    * connectivity rather than global importance. Same integer-micro-unit
    * determinism contract and per-iteration plan shape as
    * [[pageRankMicro]] (one keyed join + one map-side-combined groupBy).
    * Seeds absent from the edge list are IGNORED — they have no edges to
    * propagate through — and `|S|` counts only the present ones, so the
    * full teleport mass always lands on seeds that exist.
    */
  def personalizedPageRankMicro(edges: DataFrame, aCol: String, bCol: String,
                                seeds: DataFrame, seedCol: String,
                                iterations: Int = 3,
                                scope: CacheScope = CacheScope.global): DataFrame =
    pprCore(symmetrize(edges, aCol, bCol, scope),
      seeds.select(col(seedCol).as("id")).distinct(), iterations, scope)

  /** [[personalizedPageRankMicro]] seeded at the `k` highest-degree nodes
    * (deg DESC, id ASC — deterministic), sharing one persisted edge frame
    * between hub selection and the rank loop.
    */
  def personalizedPageRankFromHubs(edges: DataFrame, aCol: String,
                                   bCol: String, k: Int, iterations: Int = 3,
                                   scope: CacheScope = CacheScope.global): DataFrame = {
    val und = symmetrize(edges, aCol, bCol, scope)
    val hubs = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("src").asc).limit(k)
      .select(col("src").as("id"))
    pprCore(und, hubs, iterations, scope)
  }

  private def pprCore(und: DataFrame, seeds: DataFrame, iterations: Int,
                      scope: CacheScope): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val deg0 = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
    // |S| counts only seeds PRESENT in the graph: a curated seed absent
    // from the edge list has no edges to propagate through, and counting
    // it would silently deflate every present seed's share of the teleport
    // mass (init 1e6 div |S| must inject the full mass over the seeds that
    // actually exist)
    val sd = seeds.join(deg0.select("id"), Seq("id"), "left_semi")
      .withColumn("__seed", lit(true))
    val nDf = sd.agg(count(lit(1)).as("__n"))
    // seed flag + |S| ride the persisted deg frame exactly like N does in
    // the global variant — no eager count at construction time
    val deg = scope.persisted(deg0
      .join(sd, Seq("id"), "left").crossJoin(broadcast(nDf))
      .select(col("id"), col("deg"),
        when(col("__seed"), expr("1000000L div __n")).otherwise(0L).as("__r0"),
        when(col("__seed"), expr("150000L div __n")).otherwise(0L).as("__base")))
    rankLoop(und, deg, iterations)
      .select(col("id"), col("deg"), col("r").as("ppr_micro"))
  }

  /** The shared Pregel-style update loop: `deg` carries per-node init
    * (`__r0`) and teleport base (`__base`); each iteration is ONE keyed
    * join (ranks onto edge sources) and ONE map-side-combined groupBy.
    * Lineage is LINEAR in iterations (ranks feeds each next plan exactly
    * once — deg, not ranks, supplies the id/deg side of the update join),
    * so per-iteration checkpoints aren't needed for plan size; checkpoint
    * every 4th iteration to bound optimizer input, each one an eager
    * barrier that preserves outputPartitioning (LogicalRDD keeps the
    * physical partitioning), so the build-time alignment survives it.
    */
  private def rankLoop(und: DataFrame, deg: DataFrame,
                       iterations: Int): DataFrame = {
    var ranks = deg.select(col("id"), col("deg"), col("__r0").as("r"))
    for (it <- 1 to iterations) {
      val contrib = und
        .join(ranks.select(col("id").as("src"), expr("r div deg").as("c")), "src")
        .groupBy("dst").agg(sum(col("c")).as("m"))
        .select(col("dst").as("id"), col("m"))
      ranks = deg.join(contrib, Seq("id"), "left")
        .select(col("id"), col("deg"),
          (col("__base") + expr("(17 * coalesce(m, 0L)) div 20")).as("r"))
      if (it % 4 == 0 && it < iterations) ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** Multi-source BFS hop distance over an UNDIRECTED edge list: every node
    * reachable from `seeds` within `maxHops` gets the hop count of its
    * NEAREST seed (0 for seeds themselves); unreached nodes are absent.
    * The curation read: "how many association hops from a known-bad set" —
    * the trust-propagation primitive web-corpus pipelines run over link and
    * near-dup graphs (spam neighborhoods, contamination balls), here over
    * the vessel-pair network.
    *
    * Scale shape — DELTA expansion, not re-relaxation: the frontier at hop
    * h is only the nodes FIRST discovered at h (anti-join against the
    * settled set), so each hop moves one frontier→edges join (edges stay
    * hash-partitioned by src, the big side never re-shuffles), one
    * `distinct` on the candidates, and one keyed anti-join — per-hop cost
    * is O(ball boundary), not O(ball). Distances never need a min-combine
    * because a node enters exactly once, at its first (= minimal) hop.
    * Bounded unrolled iterations keep the plan deterministic and
    * oracle-mirrorable; a production caller with unbounded radius would
    * early-stop on an empty persisted frontier (one cheap action per hop)
    * — same plan, driver-side loop guard.
    */
  def seedDistance(edges: DataFrame, aCol: String, bCol: String,
                   seeds: DataFrame, seedCol: String, maxHops: Int = 3,
                   scope: CacheScope = CacheScope.global): DataFrame =
    bfs(symmetrize(edges, aCol, bCol, scope),
      seeds.select(col(seedCol).as("id")).distinct(), maxHops, scope)

  /** [[seedDistance]] seeded at the `k` highest-degree nodes (deg DESC,
    * id ASC tiebreak — deterministic): "how far is everything from the
    * hubs". Seeds derive from the SAME persisted src-partitioned edge
    * frame the BFS walks — the degree aggregate groups an already-keyed
    * frame (no exchange, the pageRank deg shape), so hub selection adds a
    * k-row TakeOrdered and nothing else.
    */
  def seedDistanceFromHubs(edges: DataFrame, aCol: String, bCol: String,
                           k: Int, maxHops: Int = 3,
                           scope: CacheScope = CacheScope.global): DataFrame = {
    val und = symmetrize(edges, aCol, bCol, scope)
    val hubs = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .orderBy(col("deg").desc, col("src").asc).limit(k)
      .select(col("src").as("id"))
    bfs(und, hubs, maxHops, scope)
  }

  /** UNBOUNDED-radius [[seedDistance]]: expand until the frontier drains —
    * the whole reachable ball gets its exact nearest-seed hop count. The
    * loop guard is driver-side: each hop's delta is persisted anyway (it
    * feeds both the settled union and the next expansion), so asking it
    * `count() == 0` is one cheap action against cached partitions, and the
    * loop stops at the ball's true eccentricity instead of a guessed
    * radius — on a 100 TB graph the difference between paying for the
    * diameter you HAVE and the worst case you feared. `hopCap` is a safety
    * rail for pathological graphs (a path graph's diameter = |V|−1 would
    * otherwise run unbounded driver rounds), generous enough that real
    * small-world association graphs (diameter ≲ 20) never hit it.
    * Exact-result contract vs [[seedDistance]]: identical rows whenever
    * the ball's eccentricity ≤ the bounded call's maxHops.
    */
  def seedDistanceAll(edges: DataFrame, aCol: String, bCol: String,
                      seeds: DataFrame, seedCol: String, hopCap: Int = 64,
                      scope: CacheScope = CacheScope.global): DataFrame = {
    require(hopCap >= 0, "hopCap must be non-negative")
    val und = symmetrize(edges, aCol, bCol, scope)
    var settled = scope.persisted(
      seeds.select(col(seedCol).as("id")).distinct()
        .withColumn("hops", lit(0)))
    var frontier = settled.select("id")
    var h = 1
    var drained = false
    while (h <= hopCap && !drained) {
      val next = scope.persisted(
        und.join(frontier.select(col("id").as("src")), "src")
          .select(col("dst").as("id")).distinct()
          .join(settled.select("id"), Seq("id"), "left_anti")
          .withColumn("hops", lit(h)))
      if (next.isEmpty) drained = true // early stop: the ball is complete
      else {
        settled = settled.union(next)
        frontier = next.select("id")
        h += 1
      }
    }
    settled
  }

  /** Per-node triangle participation over an UNDIRECTED edge list:
    * (id, triangles) for every node in ≥ 1 triangle. Triangles are the
    * local-clustering signal — in an association graph they separate
    * genuinely cohesive groups (convoys, coordinated spam farms) from
    * hub-and-spoke coincidence, which pairwise scores alone cannot.
    *
    * Degree-ordered orientation (Suri & Vassilvitskii, "Counting triangles
    * and the curse of the last reducer", WWW 2011): orient each edge
    * low→high by (deg, id), enumerate wedges only among OUT-neighbors, and
    * close each wedge against the oriented edge list — every triangle
    * materializes exactly once, at its lowest-ranked vertex. The
    * orientation caps out-degree at O(√m) for ANY degree distribution, so
    * wedge volume is O(m^1.5) worst-case instead of Σ deg² — on a
    * power-law co-movement graph the difference between the hub node
    * generating deg²≈10¹² wedges and √m-bounded work. All joins are
    * keyed equi-joins; counts are exact integers.
    */
  def triangleCounts(edges: DataFrame, aCol: String, bCol: String,
                     scope: CacheScope = CacheScope.global): DataFrame = {
    val und = symmetrize(edges, aCol, bCol, scope)
    // (deg, id) rank: deg groups the src-keyed frame exchange-free
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
    // orient low→high: each undirected edge survives exactly once,
    // carrying the head's rank so wedges can order without a re-join
    val ore = scope.persisted(
      und.join(deg.select(col("id").as("src"), col("deg").as("sd")), "src")
        .join(deg.select(col("id").as("dst"), col("deg").as("vd")), "dst")
        .filter(col("sd") < col("vd") ||
          (col("sd") === col("vd") && col("src") < col("dst")))
        .select(col("src").as("u"), col("dst").as("v"), col("vd"))
        .repartition(col("u")))
    // each out-neighbor PAIR of u once, rank-ordered v < w — half the
    // naive self-join's output, and the half the close join can match
    val wedges = ore.select(col("u"), col("v"), col("vd"))
      .join(ore.select(col("u"), col("v").as("w"), col("vd").as("wd")), "u")
      .filter(col("vd") < col("wd") ||
        (col("vd") === col("wd") && col("v") < col("w")))
    val tri = wedges.join(ore.select(col("u").as("v"), col("v").as("w")),
      Seq("v", "w"))
    tri.select(explode(array(col("u"), col("v"), col("w"))).as("id"))
      .groupBy("id").agg(count(lit(1)).as("triangles"))
  }

  /** Second-order association: non-adjacent node pairs sharing at least
    * `minCommon` neighbors, with common-neighbor count and Jaccard
    * (|N(a)∩N(b)| / |N(a)∪N(b)|). The "shadow relationship" read: two
    * vessels that never co-move but share many partners — link prediction
    * over the association graph, the same primitive that surfaces
    * coordinated accounts sharing audiences without direct contact.
    *
    * Scale contract: unlike the triangle close, common-neighbor output is
    * INHERENTLY Θ(Σ deg²) — no orientation trick shrinks it, because the
    * wedge itself is the answer. The honest mitigation is an explicit,
    * deterministic per-node neighbor cap (`maxNeighbors`, first-by-id —
    * the [[graft.ops.Dedup]] `maxDocsPerShingle` skew discipline applied
    * to vertices): a hub contributes at most C(cap, 2) wedges, and `deg`
    * in the Jaccard denominator stays the TRUE degree. Each output row
    * carries a `clipped` boolean: false GUARANTEES `common` is exact for
    * that pair; true means it may be a lower bound (some common neighbor's
    * list may have been clipped — see the flag derivation at the end of
    * the method). Choose cap > max expected degree to make every row
    * exact and unflagged (the declared query does at every test SF — the
    * oracle mirrors the cap and flag arithmetic row for row).
    * Output: (v, w, common, jaccard, clipped).
    */
  def commonNeighborPairs(edges: DataFrame, aCol: String, bCol: String,
                          minCommon: Long = 2, maxNeighbors: Int = 1000,
                          scope: CacheScope = CacheScope.global): DataFrame = {
    val und = symmetrize(edges, aCol, bCol, scope)
    val deg = und.groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))
    // deterministic clip: first maxNeighbors by id — a keyed window over
    // the already-src-partitioned frame, never a global sort
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src")).orderBy(col("dst"))
    val nbc = und.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= maxNeighbors).select("src", "dst")
    val wedges = nbc.select(col("src"), col("dst").as("v"))
      .join(nbc.select(col("src"), col("dst").as("w")), "src")
      .filter(col("v") < col("w"))
    val cmn = wedges.groupBy("v", "w").agg(count(lit(1)).as("common"))
      .filter(col("common") >= minCommon)
    // keep only NON-adjacent pairs: the edge (v,w) — stored both ways in
    // und, so one direction suffices — must be absent
    val non = cmn.join(
      und.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"),
      "left_anti")
    // clip visibility: `common` for (v, w) undercounts exactly when some
    // TRUE common neighbor s had its list clipped (the wedge through s is
    // enumerated from s's capped list; v's and w's own lists never enter).
    // Every common neighbor of the pair is a neighbor of v, so the sound
    // per-row flag is "v or w has >= 1 neighbor whose degree exceeds the
    // cap": when false, no common neighbor can have been clipped and the
    // count is EXACT; when true it is a lower bound. (Flagging on the
    // endpoints' own degree — the obvious guess — would be wrong in both
    // directions.) Clipped nodes are the rare hubs, so the flag costs one
    // broadcast semi-probe of the edge frame + a small distinct.
    val clippedNodes = deg.filter(col("deg") > maxNeighbors)
      .select(col("id").as("dst"))
    val flagged = und.join(broadcast(clippedNodes), Seq("dst"), "left_semi")
      .select(col("src").as("id")).distinct()
    non.join(deg.select(col("id").as("v"), col("deg").as("da")), "v")
      .join(deg.select(col("id").as("w"), col("deg").as("db")), "w")
      .join(flagged.select(col("id").as("v"), lit(true).as("__cv")), Seq("v"), "left")
      .join(flagged.select(col("id").as("w"), lit(true).as("__cw")), Seq("w"), "left")
      .select(col("v"), col("w"), col("common"),
        round(col("common").cast("double") /
          (col("da") + col("db") - col("common")), 6).as("jaccard"),
        (coalesce(col("__cv"), lit(false)) ||
          coalesce(col("__cw"), lit(false))).as("clipped"))
  }

  /** k-core decomposition by iterative peeling: repeatedly remove every
    * node whose degree in the SURVIVING subgraph is < k until no node
    * falls, then report each survivor with its degree inside the final
    * core. The density primitive pairwise scores and triangles both miss:
    * a k-core is a subgraph where EVERY member keeps ≥ k in-core partners,
    * the classic signature of coordinated clusters (convoy fleets, spam
    * farms, botnet rings) as opposed to chains and stars, which peel away.
    *
    * Determinism: the k-core is unique (peeling is confluent — removal
    * order cannot change the fixpoint), counts are exact integers, and the
    * contract is CONVERGE-OR-FAIL: the loop drains to the fixpoint (a
    * round that removes nobody) and `maxRounds` is a safety cap, not a
    * result parameter — exhausting it THROWS rather than silently
    * reporting the partially-peeled superset as "the k-core" (a long
    * chain welded to a core needs ~len/2 rounds; at graph scale that
    * depth is reachable, and a caller acting on a non-core would have no
    * signal). Peeling strictly shrinks, so rounds ≤ nodes; the default
    * cap covers any real association graph, and a caller that genuinely
    * expects deeper peels raises it explicitly.
    *
    * Scale shape: per round, restrict the src-partitioned edge frame to
    * surviving endpoints (two keyed joins — the src side aligned with the
    * build partitioning, the dst side a shrinking semi-join), one
    * map-side-combined degree groupBy, one filter; the per-round frontier
    * cost tracks the SURVIVING edge count, which only shrinks. The
    * surviving-set count per round is one cheap action on a persisted
    * frame (the [[seedDistanceAll]] driver-guard discipline). Peeling
    * depth on real association graphs is small (each round must remove ≥1
    * node or stop, and hub-poor fringes fall in the first rounds).
    * Output: (id, deg_core) for final-core members.
    */
  def kCore(edges: DataFrame, aCol: String, bCol: String, k: Long,
            maxRounds: Int = 64,
            scope: CacheScope = CacheScope.global): DataFrame = {
    require(k >= 1, "k must be positive")
    require(maxRounds >= 1, "need at least one peeling round")
    val und = symmetrize(edges, aCol, bCol, scope)
    // per-round bridge.truncated, not persist and not localCheckpoint:
    // inducedDegrees references the alive frame TWICE (both join sides),
    // so without lineage truncation the logical plan DOUBLES every round
    // (a 40-round peel = a 2^40-node plan tree, driver OOM) — and
    // Dataset.localCheckpoint truncates the TREE but rewrites CONSTRAINTS
    // from the original plan, which double per checkpoint generation for
    // the same two-reference reason (minutes per round in the stats
    // visitor by round ~30, measured). The constraint-free truncation
    // caps both and doubles as the per-round materializing action.
    var alive = bridge.truncated(
      und.select(col("src").as("id")).distinct())
    var nAlive = alive.count()
    var round = 0
    var converged = nAlive == 0L
    while (round < maxRounds && !converged) {
      val next = bridge.truncated(inducedDegrees(und, alive)
        .filter(col("deg") >= k).select("id"))
      val nNext = next.count()
      // peeling only removes — equal count ⟺ equal set, no anti-join needed
      if (nNext == nAlive) converged = true
      else { alive = next; nAlive = nNext; round += 1 }
    }
    // converge-or-fail: a partially-peeled survivor set is NOT a k-core,
    // and returning it silently would hand callers a density signal that
    // isn't one. Throwing is the contract (see the scaladoc).
    require(converged, s"kCore: peel did not reach its fixpoint within " +
      s"maxRounds=$maxRounds ($nAlive nodes still alive after $round " +
      "rounds); raise maxRounds — peeling depth is bounded by node count")
    inducedDegrees(und, alive)
      .select(col("id"), col("deg").as("deg_core"))
  }

  /** Degrees within the subgraph induced by `alive`: edges with BOTH
    * endpoints surviving, grouped by source. A node isolated by its
    * neighbors' removal simply doesn't appear (degree 0 — outside any
    * k≥1 core).
    */
  private def inducedDegrees(und: DataFrame, alive: DataFrame): DataFrame =
    und.join(alive.select(col("id").as("src")), "src")
      .join(alive.select(col("id").as("dst")), "dst")
      .groupBy("src").agg(count(lit(1)).as("deg"))
      .select(col("src").as("id"), col("deg"))

  /** Symmetrized, deduplicated edge list hash-partitioned by `src` once —
    * every hop's frontier→edges join reuses it exchange-free on the big
    * side (the same build [[pageRankMicro]] uses).
    */
  private def symmetrize(edges: DataFrame, aCol: String, bCol: String,
                         scope: CacheScope): DataFrame =
    scope.persisted(
      edges.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
        // ONE exchange, not two (r19, guide §2.4): hash by src first, then
        // dedup — HashPartitioning(src) satisfies the (src, dst) aggregate's
        // ClusteredDistribution (src ⊆ keys: equal (src, dst) rows are
        // already co-located), so the dropDuplicates runs exchange-free and
        // its output KEEPS the src partitioning every iteration's
        // frontier→edges join aligns on. The former distinct-then-
        // repartition shape shuffled the edge list twice for the same
        // result; callers now feed the maintained distinct edge gold, so
        // the shuffled rows are exactly 2|E| either way.
        .repartition(col("src"))
        .dropDuplicates("src", "dst"))

  private def bfs(und: DataFrame, seeds: DataFrame, maxHops: Int,
                  scope: CacheScope): DataFrame = {
    require(maxHops >= 0, "maxHops must be non-negative")
    // each hop's delta persists ONCE (it feeds both the settled union and
    // the next expansion); settled stays a lazy union of persisted deltas,
    // so no hop re-executes an earlier hop's discovery
    var settled = scope.persisted(seeds.withColumn("hops", lit(0)))
    var frontier = settled.select("id")
    for (h <- 1 to maxHops) {
      val next = scope.persisted(
        und.join(frontier.select(col("id").as("src")), "src")
          .select(col("dst").as("id")).distinct()
          .join(settled.select("id"), Seq("id"), "left_anti")
          .withColumn("hops", lit(h)))
      settled = settled.union(next)
      frontier = next.select("id")
    }
    settled
  }
}
