package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{GoldCache, Tables}
import graft.ops.{AsOf, Bpe, CoMovement, Curation, CurationPipeline, DataQuality, Decontam, Dedup, EventFlows, Fuzzy, Graph, Indexing, Ivf, Kmeans, Merge, Multimodal, Pq, QualityChecks, RangeJoin, Retrieval, Selection, Similarity, SilverIngest, Sketches, Skew, Stats, TextOps, TimeSeries, Tracks, Trajectory}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each entry in [[queries]] is an operator from SURVEY.md §2 re-expressed
  * Spark-first; [[oracleSql]] carries the DuckDB twin run by the driver on the
  * same parquet. Determinism rules (SURVEY.md §7.5): exact percentiles, no
  * current_timestamp, floats rounded at the output projection, integer casts
  * where engines' type promotion differs (DuckDB SUM→HUGEINT, FLOOR→DOUBLE),
  * timestamps exported as epoch millis (parquet ns vs µs precision), and a
  * total ORDER BY on every result.
  */
object SparkEntry {

  /** Grid resolution for the events-as-AIS role mapping (FIXTURES.md §3):
    * res=3 → cell width 62.5 over the value domain [0,500) — dense enough
    * that co-movement pairs exist at every SF (3 pairs at sf0.001).
    */
  val Res = 3

  /** GeoCell resolution for the ring-1 neighbor co-location query: at the
    * basin-scale coordinate mapping (lat = value/100, lon = value/50) res 2
    * quantizes the operating area into lattice cells of granularity
    * comparable to the exact pipeline's pos_cell grid — coarse enough that
    * neighbor relationships actually occur at every shipped SF.
    */
  val RingRes = 2
  private val WidthSql = "62.5"
  /** `2^Res` — the hourly lattice's cell count factor for the integer-form
    * oracle (`(mean_micro * 2^res) // 500000000`, see
    * [[graft.functions.pos_cell_micro]]).
    */
  private val ResCellsSql: String = (1L << Res).toString

  /** Query-term bag for the declared BM25 query (all present in the corpus). */
  private val Bm25Terms = Seq("join", "hash", "spark")

  /** Rolling-fingerprint parameters: 8-byte k-grams, keep hashes ≡ 0 mod 16
    * (~1/16 density — a few dozen fingerprints per testdata doc).
    */
  private val FpK = 8
  private val FpModP = 16

  /** Fingerprint-overlap pairing: ≥3 shared selected substrings, with the
    * stop-hash guard at the same df cap the n-gram query uses.
    */
  private val FpMinShared = 3
  private val FpMaxDocs = 50

  /** Content-defined chunking divisor: cut where the rolling hash ≡ 0 mod
    * 64 → expected ~64-char chunks (a handful per testdata doc).
    */
  private val CdcDiv = 64

  /** Decontamination eval cohort: docs with id below this bound play the
    * benchmark suite — a FIXED-SIZE set, so the broadcast n-gram relation is
    * O(1) in corpus size (the same rule the verdict applied to `embed_topk`).
    */
  private val EvalCohortMax = 25
  private val Bm25K1 = 1.2
  private val Bm25B = 0.75

  /** Per-domain cap / chunking / vocab parameters for the declared curation
    * queries (cap below the smallest per-source count so both keep outcomes
    * appear at every scale; chunks sized against the 10–99-token testdata).
    */
  /** Fixed logistic-model coefficients for the classifier-filter stand-in
    * (ln_toks, punct_ratio, stop_ratio, mean_token_len) — plan-time
    * constants, the way broadcast trained coefficients would arrive.
    */
  private val ClfWeights = Seq(0.8, -20.0, 5.0, -0.4)
  private val ClfBias = -1.0
  private val ClfMinScore = 0.5

  /** quality_prune: per-source fraction kept (on rounded percent_rank). */
  private val QPruneKeep = 0.6

  /** lsh_calibration audit-slice bound (exact-Jaccard join is quadratic in
    * the slice, so it stays fixed-size whatever the corpus).
    */
  private val LshAuditMax = 60

  /** Fixture convention for every incremental declared query (incr_dedup,
    * incr_lsh, incr_spans): docs with id below this bound play the STANDING
    * corpus, the rest the arriving batch. In production this demarcation is
    * an orchestrator-supplied watermark LITERAL (an ingest date / high-water
    * id, exactly the reference's day-at-a-time refresh cursor,
    * `refresh_gold_tables.py` day loop) — deliberately NOT derived from the
    * data in-query: a literal pushes to the parquet scan as a min/max
    * row-group filter, while a derived scalar-subquery threshold would force
    * a full scan plus join on every ingest tick. Mirrored verbatim in the
    * oracle twins; at sf0.01 (500 docs) it lands an 80/20 standing/batch
    * split, and both sides stay non-empty at every shipped SF.
    */
  private val IncrSplitId = 400

  /** value_decayed: reference date + half-life (days) for recency decay. */
  private val DecayRef = "2024-01-31"
  private val DecayHalfLife = 7.0

  /** Mixture-sampling declared-query parameters: normalized per-lang weights
    * and a token budget below every scale's corpus size, so every stratum
    * gets a real (< 1) keep rate.
    */
  private val MixWeights = Seq(
    "en" -> 0.5, "de" -> 0.2, "fr" -> 0.15, "es" -> 0.1, "zh" -> 0.05)
  private val MixBudget = 10000L

  private val DomainCapN = 15
  private val ChunkTokens = 32
  private val ChunkOverlap = 8
  /** Word-window width for the duplicate-passage scrub (smaller than
    * ChunkTokens: scrub granularity is the passage, not the RAG chunk). */
  private val ScrubTokens = 8
  private val VocabN = 2
  private val VocabTopK = 100
  val GtoThreshold = 0.4

  /** CDC cutoff for the declared merge query: events before it form the
    * snapshot, events at/after it form the changelog (the data spans
    * January 2024 at every SF, so both sides are non-empty everywhere).
    */
  private val CdcCutoff = "2024-01-22 00:00:00"

  /** Incremental-rollup cutoff — deliberately MID-day so the cutoff day's
    * (user, day) keys exist on BOTH sides and the additive merge is
    * genuinely exercised (a midnight cutoff would make the two sides
    * key-disjoint and the merge a mere union).
    */
  private val IncrCutoff = "2024-01-22 12:00:00"

  /** DSIR declared queries: hashed-ngram bucket count and selection size. */
  private val DsirBuckets = 512
  private val DsirK = 40

  /** Priority-sampling declared query: top-k per language stratum. */
  private val PriSampleK = 20

  /** Nucleus (top-p) per-domain token budget for the declared query. */
  private val ToppP = 0.8

  /** Bitset-distinct sketch parameters: 4096 bits ≈ 10× the sf0.1 distinct
    * user count at load ≤ 0.75, 2 hash positions per value.
    */
  private val BloomM = 4096
  private val BloomK = 2

  /** Sliding-distinct trailing window: 7 days (the weekly-actives window). */
  private val SlideDays = 7

  /** HLL precision: 2^10 = 1024 registers (~3.2% standard error) — register
    * tables stay small (days × ≤1024 rows) while the accuracy spec has
    * headroom.
    */
  private val HllP = 10
  private val HllM = 1 << HllP
  private val CmsDepth = 4
  private val CmsWidth = 256

  /** KMV (bottom-k / theta) sketch size: 64 minima — small enough that the
    * per-day user segments FILL the sketch at the sf0.01 oracle scale
    * (~125-140 distinct users/day), so the theta-estimator path (not just
    * the exact small-set path) is what the cross-engine gate proves;
    * ~12.5% distinct-count standard error, Jaccard resolution 1/64.
    */
  private val KmvK = 64

  /** value_hist sketch domain: 10 bins over [0, 500) + under/overflow. */
  private val HistLo = 0.0
  private val HistHi = 500.0
  private val HistBins = 10

  /** Gap-fill cohort bound: user ids are dense from 0 at every SF, so `< 10`
    * keeps a fixed-size cohort and the dense grid stays O(10 × span-hours).
    */
  private val GapFillMaxUid = 10

  /** Winsorization clip quantiles for the declared query. */
  private val WinsorLo = 0.05
  private val WinsorHi = 0.95

  /** rolling_stats trailing RANGE window (seconds). */
  private val RollWindowSec = 3600L

  /** track_speed teleport ceiling (km/h) — far above any vessel, so only
    * synthetic-position jumps (the GPS-glitch stand-in) trip it.
    */
  private val TeleportKmh = 1000.0

  /** dwell_episodes minimum run length. */
  private val DwellMinPings = 2

  /** tfidf_topk terms kept per document. */
  private val TfidfK = 5

  /** value_outliers_robust modified-z threshold (Iglewicz–Hoaglin's 3.5). */
  private val RobustZThresh = 3.5

  /** search_topk result size (same query terms as bm25_score). */
  private val SearchK = 10

  /** rrf_fusion pool size per leg (each leg contributes its top 20). */
  private val RrfPoolK = 20

  /** rrf_fusion smoothing constant (Cormack et al.'s standard 60). */
  private val RrfC = 60

  /** rrf_fusion semantic-leg query vector id. */
  private val RrfQueryVec = 7

  /** pmi_bigrams minimum bigram count (drops the hapax-pair PMI tail). */
  private val PmiMinCount = 5

  /** pmi_bigrams result size. */
  private val PmiTopK = 200

  /** kcenter_select coreset size (oracle unrolls one CTE stage per round). */
  private val KCenterK = 5

  /** curriculum_order difficulty buckets (quartiles) and shuffle seed. */
  private val CurriculumBuckets = 4
  private val CurriculumSeed = 1L

  /** hybrid_dedup confirmation threshold. Lower than EmbedDupThreshold
    * because the synthetic embeddings are independent of the text (dup-text
    * pairs land cos ∈ [−0.17, 0.28] at sf0.01) — 0.1 keeps both verdicts
    * populated; a real corpus runs the same dial at ~0.8.
    */
  private val HybridCosThreshold = 0.1

  /** funnel_steps definition: the browse→act→buy path over the event-type
    * vocabulary, end-to-end window one week.
    */
  private val FunnelSteps = Seq("view", "click", "purchase")
  private val FunnelWindowMs = 7L * 24 * 3600 * 1000

  /** retention_matrix cohort/offset period (weekly). */
  private val RetentionPeriodDays = 7

  /** boilerplate_score df threshold: a gram is group furniture when it
    * appears in more than this fraction of the source's docs. Low here so
    * the near-dup mass in the synthetic corpus produces signal (df ≥ 2 at
    * sf0.01's 25 docs/source); production template-stripping runs ≥ 0.3.
    */
  private val BoilerDfFrac = 0.05

  /** fuzzy_pairs edit-distance cap; blocking key = name minus its last two
    * characters (sorted-neighborhood-style prefix block, ~100 names/block on
    * the TPC-H name format at every SF).
    */
  private val FuzzyMaxDist = 1

  /** Sorted-neighborhood window: each row pairs with its next 3 in the name
    * sort order.
    */
  private val SnmWindow = 4

  /** semdedup duplicate threshold — same dial as `dedup_embed`. */
  private val SemDedupThreshold = 0.3

  /** PQ layout for the declared query: 64 dims → 8 subspaces × 8 dims,
    * 4 centroids per subspace (codebook = slices of the first 4 vectors).
    */
  private val PqM = 8
  private val PqKsub = 4

  /** geofence_hits zones — config-scale bounding boxes tiling the synthetic
    * position domain (lat = value/100 ∈ [0,4.9), lon = value/50): harbor /
    * channel / offshore bands, half-open on both axes.
    */
  private val GeofenceZones = Seq(
    ("harbor", 0.0, 1.0, 0.0, 2.0),
    ("channel", 1.0, 3.0, 2.0, 6.0),
    ("offshore", 3.0, 5.0, 6.0, 10.0))

  private def hourly(spark: SparkSession, dir: String): DataFrame =
    CoMovement.hourlyRollup(Tables.events(spark, dir), "user_id", "ts", "value", Res)

  /** Materialized gold stages (the reference's refresh-once/query-many
    * lifecycle, `refresh_gold_tables.py:648-669`): the hourly rollup feeds
    * 8 declared queries and the pairs self-join feeds 6 — each builds once
    * per JVM and every consumer reads parquet. See [[GoldCache]].
    */
  private def hourlyGold(spark: SparkSession, dir: String): DataFrame =
    GoldCache.table(spark, "uid_hourly", dir)(hourly(spark, dir))

  private def pairsGold(spark: SparkSession, dir: String): DataFrame =
    GoldCache.table(spark, "pairs_daily", dir)(
      CoMovement.pairsDaily(hourlyGold(spark, dir)))

  /** MinHash LSH candidate pairs feed two declared queries (the pair report
    * and cluster resolution) — same refresh-once lifecycle as the AIS gold
    * stages: the shingle→signature→band join runs once per JVM.
    */
  private def minhashPairsGold(spark: SparkSession, dir: String): DataFrame =
    GoldCache.table(spark, "minhash_pairs", dir)(
      Dedup.minhashLshPairs(Tables.documents(spark, dir), "doc_id", "text",
        k = 8, rowsPerBand = 2, n = 3))

  /** Resolved near-dup clusters are likewise a maintained artifact (the
    * label propagation reruns only when the pair table refreshes): the
    * cluster report and the leakage-safe split both read it.
    */
  private def clustersGold(spark: SparkSession, dir: String): DataFrame = {
    // resolve the pair stage BEFORE entering the clusters build: a nested
    // GoldCache computeIfAbsent (build lambda calling another gold table)
    // would be a recursive update on the same ConcurrentHashMap
    val pairs = minhashPairsGold(spark, dir)
    GoldCache.table(spark, "dup_clusters", dir)(
      Dedup.dupClusters(pairs, "doc_a", "doc_b"))
  }

  /** Hex-lattice hourly rollup feeding the ring co-location query — the same
    * refresh-once gold lifecycle as [[hourlyGold]]: one row per vessel-hour
    * with the basin-scale GeoCell address, derived once from raw events and
    * re-read per query. Coordinates derive from `value` at basin scale (a
    * ~5°×10° operating area) so [[RingRes]]'s lattice granularity is
    * comparable to the exact pipeline's grid.
    */
  private def ringHourlyBuild(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      // value notNull is load-bearing for the integer mean: micro_units
      // skips a null but count(*) would still count the row, silently
      // diluting the mean vs avg()'s non-null denominator (review r15)
      .filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").isNotNull)
      .select(col("user_id").as("uid"), col("ts"),
        (col("value") / 100.0).as("lat"), (col("value") / 50.0).as("lon"))
      .groupBy(col("uid"), date_trunc("hour", col("ts")).as("hour_ts"))
      // quantize-before-discontinuity (see uid_hourly_h3): raw avg differs
      // from the oracle's in the last ulp, and a lattice tie point turns
      // that into a different cell — the sf1e oracle found 2 of 7.7 M ring
      // pairs flipped by exactly this. Round-15 form: exact integer
      // micro-degree means (round(avg, 6)'s decimal-vs-binary HALF_UP seam
      // removed, ADVICE r14), one shared division back to degrees.
      .agg(sum(graft.functions.micro_units(col("lat"))).as("lat_sum"),
        sum(graft.functions.micro_units(col("lon"))).as("lon_sum"),
        count(lit(1)).as("n"))
      .select(col("uid"), to_date(col("hour_ts")).as("dt"),
        hour(col("hour_ts")).as("hr"),
        graft.functions.geo_cell(
          graft.functions.micro_mean(col("lat_sum"), col("n"))
            .cast("double") / lit(1000000.0),
          graft.functions.micro_mean(col("lon_sum"), col("n"))
            .cast("double") / lit(1000000.0), RingRes)
          .as("cell"))

  private def ringHourlyGold(spark: SparkSession, dir: String): DataFrame =
    GoldCache.table(spark, "ring_hourly", dir)(ringHourlyBuild(spark, dir))

  /** Ring-1 pair table — gold, like [[pairsGold]]: the neighbor join
    * refreshes once per corpus and every consumer reads the materialized
    * result (the reference's refresh-once/query-many lifecycle applies to
    * the ring variant exactly as to the exact one).
    */
  private def ringPairsGold(spark: SparkSession, dir: String): DataFrame = {
    val hourly = ringHourlyGold(spark, dir)
    GoldCache.table(spark, "pairs_ring", dir)(CoMovement.pairsDailyRing(hourly))
  }

  /** Per-pair max-GTO summary — a maintained gold artifact like the pair
    * table it derives from: the rank curve re-reads it per invocation
    * instead of re-aggregating the full pair history, and the curve's
    * denominator is an aggregate of THIS small table, not a count of the
    * pair scan.
    */
  private def pairMaxGold(spark: SparkSession, dir: String): DataFrame = {
    // resolve the pair stage before entering the build (same nested-
    // computeIfAbsent rule as clustersGold)
    val pairs = pairsGold(spark, dir)
    GoldCache.table(spark, "pair_max_gto", dir)(
      pairs.groupBy("uid_a", "uid_b").agg(max(col("gto")).as("max_gto")))
  }

  /** PQ corpus codes are an index artifact (encode once offline, search
    * many) — the ADC search query reads the materialized codes, never
    * re-encodes the corpus per search.
    */
  private def pqCodesGold(spark: SparkSession, dir: String): DataFrame =
    GoldCache.table(spark, "pq_codes", dir) {
      val emb = Tables.embeddings(spark, dir)
      Pq.encode(emb, "vec_id", "embedding",
        Pq.codebookFromFirst(emb, "vec_id", "embedding", PqM, PqKsub))
    }

  /** Exact n-gram candidate pairs — SQL-catalog view + retry-walk plan
    * source ONLY since r20: the r19 conversion that had dedup_ngram /
    * containment_pairs read this table moved their declared shingle work
    * into the untimed warm-up (r19 verdict #2 — precompute, not
    * optimization), so both queries compute inline again and this build
    * is never force-built by [[warmGold]]. It remains lazily available to
    * SQL-catalog users as the maintained candidate-pair artifact.
    */
  private def ngramPairsGold(spark: SparkSession, dir: String): DataFrame =
    GoldCache.table(spark, "ngram_pairs", dir)(
      Dedup.ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text",
        n = 3, threshold = 0.0, maxDocsPerShingle = 50))

  /** Distinct undirected edge set of the pair network — SQL-catalog view
    * + retry-walk plan source ONLY since r20 (same accounting revert as
    * [[ngramPairsGold]]): the graph queries derive their edge list from
    * [[pairsGold]] inline again, so each timed number includes the
    * distinct the query declares.
    */
  private def pairEdgesGold(spark: SparkSession, dir: String): DataFrame = {
    // resolve the pair stage before entering the build (the nested-
    // computeIfAbsent rule, see clustersGold)
    val pairs = pairsGold(spark, dir)
    GoldCache.table(spark, "pair_edges", dir)(
      pairs.select("uid_a", "uid_b").distinct())
  }

  /** BPE merge table — SQL-catalog view ONLY since r20 (accounting
    * revert, see [[ngramPairsGold]]): bpe_encode / bpe_roundtrip train
    * inline again (production `trainLocal`, property-tested equal to the
    * distributed trainer in BpeSpec).
    */
  private def bpeMergesGold(spark: SparkSession, dir: String): DataFrame =
    GoldCache.table(spark, "bpe_merges", dir)(
      Bpe.trainLocal(Tables.documents(spark, dir), "text", BpeMergeSteps))

  /** Trained k-means centroids — SQL-catalog view ONLY since r20
    * (accounting revert, see [[ngramPairsGold]]): kmeans_centroids /
    * kmeans_assign run the trainer inline again so their timed numbers
    * include the declared training loop.
    */
  private def kmeansCentroidsGold(spark: SparkSession, dir: String): DataFrame =
    GoldCache.table(spark, "kmeans_centroids", dir)(
      Kmeans.train(Tables.embeddings(spark, dir), "vec_id", "embedding",
        IvfCentroids, KmeansIters))

  /** SimHash-64 signature table — SQL-catalog view + retry-walk plan
    * source ONLY since r20 (accounting revert, see [[ngramPairsGold]]):
    * dedup_simhash / simhash_pairs run the signature pass inline again.
    */
  private def simhashSigsGold(spark: SparkSession, dir: String): DataFrame =
    GoldCache.table(spark, "simhash_sigs", dir)(
      Dedup.simhash(Tables.documents(spark, dir), "doc_id", "text"))

  /** DSIR per-doc importance weights — SQL-catalog view + retry-walk
    * plan source ONLY since r20 (accounting revert, see
    * [[ngramPairsGold]]): dsir_weights / dsir_select score inline again.
    */
  private def dsirWeightsGold(spark: SparkSession, dir: String): DataFrame =
    GoldCache.table(spark, "dsir_weights", dir)(
      Selection.dsirWeights(Tables.documents(spark, dir), "doc_id", "text",
        col("lang") === "en", DsirBuckets))

  /** The gold-stage BUILD frames, UN-materialized — for the plan gates.
    * The declared queries read the GoldCache parquet, so their plans carry
    * none of the build's expressions; a retry DURING a gold refresh is the
    * highest-stakes replay at 100 TB (the longest jobs, feeding every
    * consumer), so the retry-determinism walk must see these trees too.
    * `dup_clusters` is deliberately absent: cluster resolution is a
    * driver-side converge-or-fail LOOP (actions at construction time), not
    * one plan — its retry story is the loop's own converge contract plus
    * the determinism of `minhash_pairs`, which IS walked.
    */
  private[graft] def goldBuilds(spark: SparkSession, dir: String): Map[String, DataFrame] = Map(
    "uid_hourly" -> hourly(spark, dir),
    "pairs_daily" -> CoMovement.pairsDaily(hourlyGold(spark, dir)),
    "minhash_pairs" -> Dedup.minhashLshPairs(Tables.documents(spark, dir),
      "doc_id", "text", k = 8, rowsPerBand = 2, n = 3),
    "ring_hourly" -> ringHourlyBuild(spark, dir),
    "pairs_ring" -> CoMovement.pairsDailyRing(ringHourlyGold(spark, dir)),
    "pair_max_gto" -> pairsGold(spark, dir).groupBy("uid_a", "uid_b")
      .agg(max(col("gto")).as("max_gto")),
    "pq_codes" -> {
      val emb = Tables.embeddings(spark, dir)
      Pq.encode(emb, "vec_id", "embedding",
        Pq.codebookFromFirst(emb, "vec_id", "embedding", PqM, PqKsub))
    },
    // r19 gold stages (see their defs above). kmeans_centroids and
    // bpe_merges are deliberately absent: both are driver-side iterative
    // trainers (actions at construction time, like dup_clusters) — their
    // retry story is each loop's own determinism, unit-pinned in
    // KmeansSpec/BpeSpec.
    "ngram_pairs" -> Dedup.ngramJaccardPairs(Tables.documents(spark, dir),
      "doc_id", "text", n = 3, threshold = 0.0, maxDocsPerShingle = 50),
    "pair_edges" -> pairsGold(spark, dir).select("uid_a", "uid_b").distinct(),
    "simhash_sigs" -> Dedup.simhash(Tables.documents(spark, dir),
      "doc_id", "text"),
    "dsir_weights" -> Selection.dsirWeights(Tables.documents(spark, dir),
      "doc_id", "text", col("lang") === "en", DsirBuckets))

  /** Force-build the shared gold stages (bench warm-up hook). The AIS chain
    * (hourly → pairs) and the minhash pair stage are independent — they build
    * CONCURRENTLY, the way independent gold refreshes should share a cluster:
    * Spark's scheduler interleaves their jobs, so warm-up wall time is the
    * longer chain, not the sum.
    */
  def warmGold(spark: SparkSession, dir: String): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val builds = Seq(
      // pairMaxGold resolves the shared pairs stage first (computeIfAbsent
      // serializes it), then materializes the small max-GTO summary
      Future { pairMaxGold(spark, dir).count() },
      // clusters depend on the pair table; computeIfAbsent serializes the
      // shared stage, then the label propagation runs in this future
      Future { clustersGold(spark, dir).count() },
      // resolves ring_hourly first, then the ring join (both materialize)
      Future { ringPairsGold(spark, dir).count() },
      Future { pqCodesGold(spark, dir).count() })
    // r20 accounting rule (r19 verdict #3): the six r19 gold conversions
    // are reverted — every declared query computes its declared work inside
    // its own timed region again. The r19 gold defs below remain ONLY as
    // lazily-built SQL-catalog views and retry-walk plan sources; they are
    // deliberately NOT force-built here, so gold_build_sec charges nothing
    // a declared query no longer reads.
    Await.result(Future.sequence(builds), Duration.Inf); ()
  }

  /** Bootstrap the SQL catalog: every base table and maintained gold stage
    * becomes a named session view, so a SQL-first user of the reference
    * (its workflow is DDL + ad-hoc SELECTs over gold tables,
    * `refresh_gold_tables.py` + the `sql/gold/` DDL) can point `spark.sql`
    * at the same names and compose freely. Gold stages materialize through
    * [[GoldCache]] on registration — the refresh-once/query-many lifecycle;
    * re-registering after new data lands refreshes the views.
    */
  def registerViews(spark: SparkSession, dir: String): Unit = {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      Tables.load(spark, dir, t).createOrReplaceTempView(t)
    }
    Tables.events(spark, dir).createOrReplaceTempView("events")
    Tables.documents(spark, dir).createOrReplaceTempView("documents")
    Tables.embeddings(spark, dir).createOrReplaceTempView("embeddings")
    hourlyGold(spark, dir).createOrReplaceTempView("uid_hourly")
    pairsGold(spark, dir).createOrReplaceTempView("pairs_daily")
    ringPairsGold(spark, dir).createOrReplaceTempView("pairs_ring")
    minhashPairsGold(spark, dir).createOrReplaceTempView("minhash_pairs")
    clustersGold(spark, dir).createOrReplaceTempView("dup_clusters")
    pairMaxGold(spark, dir).createOrReplaceTempView("pair_max_gto")
    pqCodesGold(spark, dir).createOrReplaceTempView("pq_codes")
    ngramPairsGold(spark, dir).createOrReplaceTempView("ngram_pairs")
    pairEdgesGold(spark, dir).createOrReplaceTempView("pair_edges")
    bpeMergesGold(spark, dir).createOrReplaceTempView("bpe_merges")
    kmeansCentroidsGold(spark, dir).createOrReplaceTempView("kmeans_centroids")
    simhashSigsGold(spark, dir).createOrReplaceTempView("simhash_sigs")
    dsirWeightsGold(spark, dir).createOrReplaceTempView("dsir_weights")
  }

  /** Flagship: the reference's semantic heart (daily co-movement pairs) on
    * sf0.001; driver smoke-checks rows>0 (3 rows at res=3).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("pairs_daily")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map[String, (SparkSession, String) => DataFrame](
    // A1 + U1: hourly rollup with grid cell (create_uid_hourly_h3.sql:56-72)
    "uid_hourly" -> ((s, d) => hourlyGold(s, d)
      .select(col("uid").as("user_id"), unix_millis(col("hour_ts")).as("hour_ms"),
        // avg_pos is already the exact-integer micro mean / 1e6 (round-15
        // form) — 6-dp exact by construction, no edge round needed
        col("message_count"), col("avg_pos").as("avg_value"), col("cell"))
      .orderBy("user_id", "hour_ms")),

    // U1 2-D: the reference's uid_hourly_h3 gold shape — hex cell address from
    // post-AVG coordinates (create_uid_hourly_h3.sql:61 applies the H3 UDF to
    // AVG(lat), AVG(lon)). events has one position axis, so a deterministic
    // synthetic (lat, lon) pair is derived from `value`; the ternary GeoCell
    // expression (incl. its codegen path) is what's under oracle test here.
    "uid_hourly_h3" -> ((s, d) => {
      val ev = Tables.events(s, d)
      // value notNull is load-bearing for the integer mean (see
      // ringHourlyBuild): count(*) is the denominator, so a null value row
      // must not reach the group
      ev.filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("value").isNotNull)
        .select(col("user_id"), col("ts"),
          (col("value") % 180.0 - 90.0).as("lat"),
          ((col("value") * 2.0) % 360.0 - 180.0).as("lon"))
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour_ts"))
        // cell from EXACT-INTEGER micro-degree means, not the raw avg:
        // avg(double) is summation-order dependent (Spark partial agg vs
        // DuckDB sequential differ in the last ulp) and the lattice's
        // floor(v + 0.5) is discontinuous — the sf1e stretch oracle caught
        // exactly this as cells one step apart at tie points. Round 14
        // quantized with round(avg, 6), which still leaned on Spark's
        // decimal-string HALF_UP agreeing with DuckDB's binary round —
        // structurally false at 7th-decimal shortest-repr midpoints
        // (ADVICE r14). Round-15 form: per-row micro-degree BIGINTs, the
        // mean in integer arithmetic, one shared division back to degrees
        // — both engines feed the lattice bit-identical doubles.
        .agg(sum(graft.functions.micro_units(col("lat"))).as("lat_sum"),
          sum(graft.functions.micro_units(col("lon"))).as("lon_sum"),
          count(lit(1)).as("message_count"))
        .withColumn("qlat",
          graft.functions.micro_mean(col("lat_sum"), col("message_count"))
            .cast("double") / lit(1000000.0))
        .withColumn("qlon",
          graft.functions.micro_mean(col("lon_sum"), col("message_count"))
            .cast("double") / lit(1000000.0))
        .select(col("user_id"), unix_millis(col("hour_ts")).as("hour_ms"),
          col("qlat").as("avg_lat"), col("qlon").as("avg_lon"),
          graft.functions.geo_cell(col("qlat"), col("qlon"), 7).as("h3_index"),
          col("message_count"))
        .orderBy("user_id", "hour_ms")
    }),

    // J1 at ring-1 — the capability the reference regrets lacking
    // (README.md:130: res-7 hexes miss boundary-straddling pairs; GTO
    // notebook cell 9): vessel-hours co-locate when their GeoCell hex cells
    // are equal OR edge-adjacent. Coordinates derive from `value` at basin
    // scale (a ~5°×10° operating area) so the lattice granularity is
    // comparable to the exact pipeline's; [[CoMovement.pairsDailyRing]]
    // expands one side to its 7 ring addresses by pure long arithmetic and
    // the join stays an equi-join.
    "pairs_daily_ring" -> ((s, d) =>
      ringPairsGold(s, d).orderBy("uid_a", "uid_b", "day_date")),

    // lifetime rollup of the ring pair table (the pairs_total shape over the
    // neighbor-tolerant join): how many observed days a pair owes purely to
    // boundary straddling
    "pairs_total_ring" -> ((s, d) =>
      ringPairsGold(s, d).groupBy("uid_a", "uid_b").agg(
          count(lit(1)).as("days_observed"),
          sum(col("h_ring")).as("h_ring_total"),
          sum(col("h_exact")).as("h_exact_total"),
          sum(when(col("h_ring") > col("h_exact"), 1L).otherwise(0L))
            .as("boundary_days"))
        .orderBy("uid_a", "uid_b")),

    // J1+J2+A2-A4+P6: the flagship pairs pipeline (create_pairs_daily.sql)
    "pairs_daily" -> ((s, d) => pairsGold(s, d)
      .select(col("uid_a"), col("uid_b"), col("day_date"),
        col("hA"), col("hB"), col("gA"), col("gB"), col("hT"), col("gT"),
        round(col("temporal_o"), 6).as("temporal_o"),
        round(col("spatial_o"), 6).as("spatial_o"),
        round(col("gto"), 6).as("gto"))
      .orderBy("uid_a", "uid_b", "day_date")),

    // A5: pair lifetime summary with exact median (create_pairs_total.sql:11-21)
    "pairs_total" -> ((s, d) => CoMovement.pairsTotal(pairsGold(s, d), GtoThreshold)
      .select(col("uid_a"), col("uid_b"), col("total_days_observed"),
        col("days_above_threshold"),
        round(col("max_gto"), 6).as("max_gto"), round(col("min_gto"), 6).as("min_gto"),
        round(col("avg_gto"), 6).as("avg_gto"), round(col("median_gto"), 6).as("median_gto"))
      .orderBy("uid_a", "uid_b")),

    // J3+P2+P4+O1: cohort export (export_tracks_to_explore.py:31-69)
    "track_export" -> ((s, d) => Tracks.trackExport(Tables.events(s, d),
      Seq(1L, 2L, 3L, 5L, 8L, 13L, 21L, 34L, 55L, 89L),
      "2024-01-05 00:00:00", "2024-01-25 00:00:00")),

    // A11+O5: trajectory path assembly (track_explorer.py:53-84)
    "track_paths" -> ((s, d) => Tracks.trackPaths(Tables.events(s, d), minPoints = 2)),

    // A8+O3: top-k tracks by sample count (track_explorer.py:221,234)
    "top_tracks" -> ((s, d) => Tracks.topTracks(Tables.events(s, d), 10)),

    // §2.5: row_number dedup view (docs/data_contracts.md:113)
    "window_dedup" -> ((s, d) => Tracks.windowDedup(Tables.events(s, d))),

    // approximate distinct users per day via the deterministic bitset
    // sketch (sha256 positions + linear counting — same kernel as
    // bloom_distinct, so the DuckDB oracle rebuilds the estimate
    // bit-for-bit; Spark's HLL would differ across engines and lose the
    // hash check). Merge is bitwise-OR ⇒ partitioning-independent.
    // robust per-user anomaly flags: daily event volumes vs the user's own
    // median ± 3 MADs (the Hampel identifier — breakdown-resistant where a
    // z-score lets one burst day inflate its own threshold). Exact
    // medians, aligned keyed shuffles (DataQuality.madOutliers).
    "mad_outliers" -> ((s, d) =>
      DataQuality.madOutliers(
          Tables.events(s, d)
            .filter(col("user_id").isNotNull && col("ts").isNotNull)
            .groupBy(col("user_id"), to_date(col("ts")).as("day"))
            .agg(count(lit(1)).as("cnt")),
          "user_id", "cnt", k = 3.0)
        .orderBy("user_id", "day")),

    "approx_users_daily" -> ((s, d) => {
      val sk = Sketches.bitsetDistinct(BloomM, BloomK)
      Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("day_date"))
        .agg(count(lit(1)).as("n_events"),
          sk(col("user_id").cast("string")).as("sk"))
        .select(col("day_date"), col("n_events"),
          col("sk.n_set").as("n_set"), col("sk.est_distinct").as("approx_users"))
        .orderBy("day_date")
    }),

    // batch twin of the streaming gap-based trip splitter (SessionTracks):
    // session-window semantics via lag + cumulative sum, 30-day gap
    "trip_segments" -> ((s, d) =>
      Tracks.tripSegments(Tables.events(s, d), gapMs = 30L * 86400 * 1000)),

    // F15: deterministic display color per track id (first 6 hex chars of
    // SHA-256 — track_explorer.py:251-257), oracle-checked end to end
    "track_colors" -> ((s, d) =>
      Tables.events(s, d).filter(col("user_id").isNotNull)
        .select(col("user_id")).distinct()
        .select(col("user_id"),
          graft.functions.track_color(col("user_id")).as("color"))
        .orderBy("user_id")),

    // origin→destination flow matrix: 6-hour-gap trips reduced to their
    // endpoint cells, rolled up to port-to-port traffic counts
    "od_flows" -> ((s, d) =>
      Tracks.odFlows(Tables.events(s, d), gapMs = 6L * 3600 * 1000, res = Res)
        .orderBy("origin_cell", "dest_cell")),

    // semi-structured props: from_json with an EXPLICIT schema (inference
    // would cost a full pre-scan at 100 TB), pushed filter, exact integer agg
    "props_parse" -> ((s, d) => {
      val propsSchema = new org.apache.spark.sql.types.StructType()
        .add("k", org.apache.spark.sql.types.IntegerType)
      Tables.events(s, d)
        .select(col("event_type"),
          from_json(col("props"), propsSchema).getField("k").as("k"))
        .filter(col("k").isNotNull && col("k") >= 50)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("k")).cast("long").as("sum_k"))
        .orderBy("event_type")
    }),

    // §2.7 set ops: INTERSECT (retained) / EXCEPT (churned) audiences over
    // the first vs second half of the event window — both compile to
    // aggregate-style semi/anti joins on the distinct user sets, never a
    // row-level comparison of the fact table
    "user_churn" -> ((s, d) => {
      val ev = Tables.events(s, d).filter(col("ts").isNotNull)
      val half1 = ev.filter(dayofmonth(col("ts")) <= 15).select("user_id").distinct()
      val half2 = ev.filter(dayofmonth(col("ts")) > 15).select("user_id").distinct()
      half1.intersect(half2).withColumn("status", lit("retained"))
        .unionAll(half1.except(half2).withColumn("status", lit("churned")))
        .orderBy("status", "user_id")
    }),

    // per-group z-score outlier flags: exact integer sums → broadcast stats
    // → narrow map (no fact-table shuffle); threshold 1.7 sits inside the
    // uniform value distribution so both flag outcomes appear
    "value_outliers" -> ((s, d) =>
      QualityChecks.zscoreOutliers(
          Tables.events(s, d).filter(col("value").isNotNull),
          "event_id", "event_type", "value", threshold = 1.7)
        .orderBy("event_id")),

    // seasonal anomaly: z-score against the (type, dow, hour) baseline —
    // the "is this value odd FOR a Tuesday 3pm" monitor global z can't ask;
    // same broadcast-stats shape keyed on the composite seasonal key
    "seasonal_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("ts").isNotNull && col("value").isNotNull)
        .withColumn("skey", concat_ws("|", col("event_type"),
          (dayofweek(col("ts")) - 1).cast("string"),
          hour(col("ts")).cast("string")))
      QualityChecks.zscoreOutliers(ev, "event_id", "skey", "value",
          threshold = 2.5)
        .orderBy("event_id")
    }),

    // earliest-chaining funnel over view→click→purchase: per-actor step
    // times, drop-off level, end-to-end window completion
    "funnel_steps" -> ((s, d) =>
      EventFlows.funnel(Tables.events(s, d), "user_id", "ts", "event_type",
          FunnelSteps, FunnelWindowMs)
        .orderBy("user_id")),

    // weekly retention triangle: distinct actors per (first-seen cohort,
    // period offset) — actor-day distinct first, so event volume collapses
    // before any join
    "retention_matrix" -> ((s, d) =>
      EventFlows.retentionMatrix(Tables.events(s, d), "user_id", "ts",
          RetentionPeriodDays)
        .orderBy("cohort_ms", "period_offset")),

    // first-order transition (Sankey/Markov) matrix: actor-adjacent
    // event-type pairs in event-time order
    "event_transitions" -> ((s, d) =>
      EventFlows.transitions(Tables.events(s, d), "user_id", "event_id", "ts",
          "event_type")
        .orderBy("from_type", "to_type")),

    // recency-weighted engagement: Σ value·2^(−age/7d) per user — per-term
    // micro-unit quantization makes the sum exact integer addition
    "value_decayed" -> ((s, d) =>
      Stats.decayedSum(
          Tables.events(s, d).filter(col("user_id").isNotNull &&
            col("ts").isNotNull && col("value").isNotNull),
          "user_id", col("value"), col("ts"), DecayRef, DecayHalfLife)
        .orderBy("user_id")),

    // growth accounting: DAU, first-ever-day new users, cumulative users —
    // the actor-keyed aggregates collapse volume before the day-grain window
    "user_growth" -> ((s, d) =>
      EventFlows.growthAccounting(Tables.events(s, d), "user_id", "ts")
        .select(col("day"), col("dau"), col("new_users"), col("cum_users"))
        .orderBy("day")),

    // key-distribution audit of the two natural events keys: the pre-shuffle
    // report that flags event_type as a salting candidate (5 keys, huge
    // rows-per-key) while user_id is safely spread
    "skew_report" -> ((s, d) => {
      val ev = Tables.events(s, d)
      Skew.skewReport(ev, Seq("user_id"), "user_id")
        .unionAll(Skew.skewReport(ev, Seq("event_type"), "event_type"))
        .orderBy("key_set")
    }),

    // per-day value-distribution drift vs the corpus reference (PSI, the
    // population-stability monitoring dial); one conditional-count pivot
    // per slice, fixed-order smoothed log chain — never an unordered float sum
    "drift_psi" -> ((s, d) =>
      DataQuality.psiDrift(
          Tables.events(s, d).filter(col("ts").isNotNull),
          unix_millis(date_trunc("day", col("ts"))), "value",
          HistLo, HistHi, HistBins)
        .withColumnRenamed("slice", "day_ms")
        .orderBy("day_ms")),

    // per-type daily-volume trend line (exact decimal moments): the drift
    // monitor for ingest volume; slope in events/day, reproducible anywhere
    "volume_trend" -> ((s, d) => {
      val daily = Tables.events(s, d).filter(col("ts").isNotNull)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("n_day"))
        .select(col("event_type"),
          datediff(col("day"), lit("1970-01-01").cast("date")).cast("double")
            .as("x"),
          col("n_day").cast("double").as("y"))
      Stats.trendFit(daily, "event_type", col("x"), col("y"),
        xUnit = 1L, yUnit = 1L).orderBy("event_type")
    }),

    // per-type Pearson corr(hour-of-day, value) with EXACT decimal second
    // moments — one aggregate pass, floats only in the final projection
    // (built-in corr is a partitioning-dependent float fold; this is the
    // reproducible twin)
    "value_corr" -> ((s, d) =>
      Stats.exactCorr(
          Tables.events(s, d)
            .filter(col("ts").isNotNull && col("value").isNotNull),
          "event_type", hour(col("ts")), col("value"))
        .orderBy("event_type")),

    // robust (median/MAD) twin of value_outliers: the modified z-score whose
    // baseline one wild value cannot drag; exact integer-unit percentiles,
    // broadcast stats, no fact shuffle
    "value_outliers_robust" -> ((s, d) =>
      Stats.robustOutliers(
          Tables.events(s, d).filter(col("value").isNotNull),
          "event_id", "event_type", "value", zThresh = RobustZThresh)
        .orderBy("event_id")),

    // multi-granularity OLAP rollup: (day, type) / day / grand total in ONE
    // pass — Spark's rollup compiles to a single Expand + hash agg, the
    // shape that replaces N separate scans at warehouse scale
    "events_rollup" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("ts").isNotNull)
        .rollup(to_date(col("ts")).as("day_date"), col("event_type"))
        // exact integer sum (value in 1e-4 units) — double-sum association
        // order differs across engines at 100k-row granularity (q1 pattern)
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n_events"),
          round(sum(round(col("value") * 10000).cast("long")) / 10000.0, 4)
            .as("sum_value"))
        .select(col("day_date"), col("event_type"), col("gid"),
          col("n_events"), col("sum_value"))
        .orderBy(col("gid"), col("day_date"), col("event_type"))),

    // pivoted per-day event-type counts: groupBy.pivot with an EXPLICIT
    // value list — at scale the list keeps the plan one-pass (no distinct
    // pre-scan) and the output schema static
    "events_pivot" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("ts").isNotNull)
        .groupBy(to_date(col("ts")).as("day_date"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("day_date")),

    // A1-analog pricing rollup on lineitem: wide hash agg. Money columns are
    // 2-decimal by construction, so sums run in integer cents/basis-points —
    // exact and engine-independent at any SF (double→decimal casts round
    // differently across engines and drift by ulps on large sums; integer
    // sums cannot). Headroom: cents × bp ≈ 1e9/row → overflows i64 around
    // sf≈10^4; switch to decimal(38,_) accumulators beyond that.
    "q1_agg" -> ((s, d) => {
      val qc = round(col("l_quantity") * 100).cast("long")        // qty cents
      val cents = round(col("l_extendedprice") * 100).cast("long")
      val dbp = round(col("l_discount") * 100).cast("long")       // basis pts
      Tables.lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum(qc) / lit(100.0), 2).as("sum_qty"),
          round(sum(cents) / lit(100.0), 2).as("sum_base_price"),
          round(sum(cents * (lit(100L) - dbp)) / lit(10000.0), 4).as("sum_disc_price"),
          round(avg(col("l_quantity")), 6).as("avg_qty"),
          round(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // part-dimension rollup + exact integer-cent sums — the star-schema
    // fact×dim aggregate over the one table the other relational queries
    // don't touch. No broadcast hint: part is SF-proportional (grows with
    // the corpus), so AQE picks broadcast-vs-shuffle from runtime sizes —
    // a forced hint would pin a build side that stops fitting at scale
    "brand_volume" -> ((s, d) => {
      val qc = round(col("l_quantity") * 100).cast("long")
      val cents = round(col("l_extendedprice") * 100).cast("long")
      Tables.lineitem(s, d)
        .join(Tables.part(s, d).select("p_partkey", "p_brand"),
          col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_items"),
          round(sum(qc) / lit(100.0), 2).as("sum_qty"),
          round(sum(cents) / lit(100.0), 2).as("revenue"))
        .orderBy("p_brand")
    }),

    // TPC-H Q3 shape: dim-filtered 3-way join → revenue top-k. No broadcast
    // hints: the date-filtered orders side is O(corpus) (≈half the table — a
    // forced broadcast OOMs at scale), so AQE picks the strategy from runtime
    // sizes; the segment-filtered customer side auto-broadcasts when small
    "q3_topk" -> ((s, d) => {
      val cut = lit("1998-07-01").cast("timestamp")
      val rev = round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))
      Tables.lineitem(s, d).filter(col("l_shipdate") > cut)
        .join(Tables.orders(s, d).filter(col("o_orderdate") < cut),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d)
          .filter(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(round(sum(rev) / lit(10000.0), 4).as("revenue"))
        .select(col("l_orderkey"), col("revenue"),
          // o_orderdate is TIMESTAMP_NTZ; UTC session makes the cast an
          // identity on the wall time, matching DuckDB's epoch_ms
          unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"),
          col("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 shape: 6-table star join through nation/region. Only the
    // nation⋈region side is hinted — those are FIXED-cardinality dims
    // (25/5 rows at any SF). The year-filtered orders (~1/7 of the table),
    // customer, and supplier sides all grow linearly with the corpus, so
    // they carry NO broadcast hints: AQE picks broadcast-vs-shuffle from
    // runtime sizes, exactly as q3_topk does — a forced hint on an
    // SF-proportional side is a driver/executor OOM at 100×. Equi-join
    // discipline per create_pairs_daily.sql:47-52.
    "q5_region" -> ((s, d) => {
      val rev = round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long"))
      val nations = broadcast(Tables.nation(s, d)
        .join(Tables.region(s, d).filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey")))
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d)
          .filter(col("o_orderdate").between(
            lit("1996-01-01").cast("timestamp"), lit("1996-12-31").cast("timestamp"))),
          col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .join(Tables.supplier(s, d),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(nations, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(rev) / lit(10000.0), 4).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // anti-join: customers with no order since the cutoff — per-segment count
    // + exact average balance (integer-cents avg, engine-independent)
    "cust_inactive" -> ((s, d) => {
      val cut = lit("2000-01-01").cast("timestamp")
      val recent = Tables.orders(s, d).filter(col("o_orderdate") >= cut)
        .select(col("o_custkey").as("c_custkey"))
      Tables.customer(s, d)
        .join(recent, Seq("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          // total (not avg): cents/100 has exactly 2 decimals, so this is
          // exact in both engines; an avg's /n division lands on half-cent
          // values whose rounding direction differs across engines
          round(sum(round(col("c_acctbal") * 100).cast("long")) / lit(100.0), 2)
            .as("total_acctbal"))
        .orderBy("c_mktsegment")
    }),
  ) ++ aisExtraQueries ++ textQueries ++ embedQueries

  /** Remaining reference-surface operators: the silver cleaning projection
    * (F1/F14/P1/P5/P8/P9 — lineage columns excluded from the declared output
    * because they are nondeterministic), DQ reconciliation (A10), quantile
    * profiling (A7), and the days-seen histogram (A9).
    */
  private def aisExtraQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F1+F14+P1/P5/P9: messy-string cleaning with the tiered normalizer and
    // the reference's SHA-256 bucket assignment (96 buckets, ais_pipeline.py:151)
    "silver_clean" -> ((s, d) => {
      val messy = Tables.events(s, d).select(
        col("event_id"),
        when(col("event_id") % 37 === 0, lit(null))
          .otherwise(col("user_id").cast("string")).as("MMSI"),
        when(col("event_id") % 3 === 0, date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"))
          .when(col("event_id") % 3 === 1, date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"))
          .otherwise(concat(date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss"), lit("Z")))
          .as("BaseDateTime"),
        col("value"))
      SilverIngest.clean(messy, numBuckets = 96)
        .select(col("event_id"), col("mmsi"),
          unix_millis(col("event_ts")).as("ts_ms"),
          col("year"), col("month"), col("day"), col("bucket_id"))
        .orderBy("event_id")
    }),

    // A10: gold↔silver reconciliation checks as a tall frame
    "reconciliation" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val filtered = ev.filter(col("user_id").isNotNull && col("ts").isNotNull &&
        col("value").between(0.0, 500.0))
      QualityChecks.reconcile(filtered, hourlyGold(s, d)).orderBy("check")
    }),

    // rule-based expectation audit (the Deequ shape): every rule checked in
    // ONE aggregate pass over the fact table — R conditional sums + exemplar
    // mins, map-side combined — then unpivoted, never one scan per rule
    "dq_audit" -> ((s, d) =>
      DataQuality.audit(Tables.events(s, d), "event_id", Seq(
          "user_id_not_null" -> col("user_id").isNotNull,
          "ts_not_null" -> col("ts").isNotNull,
          "value_in_range" -> col("value").between(0.0, 500.0),
          "value_under_100" -> (col("value") < 100.0),
          "no_error_events" -> (col("event_type") =!= "error")))
        .orderBy("rule")),

    // A7: quantile profiling of the GTO score distribution (exact percentiles)
    "pair_quantiles" -> ((s, d) => pairsGold(s, d)
      .agg(
        round(expr("percentile(gto, 0.5)"), 6).as("p50"),
        round(expr("percentile(gto, 0.75)"), 6).as("p75"),
        round(expr("percentile(gto, 0.9)"), 6).as("p90"),
        round(expr("percentile(gto, 0.95)"), 6).as("p95"),
        round(expr("percentile(gto, 0.99)"), 6).as("p99"))),

    // A9: days-seen histogram over pair lifetimes
    "days_seen_hist" -> ((s, d) => pairsGold(s, d)
      .groupBy("uid_a", "uid_b")
      .agg(countDistinct(col("day_date")).as("days_seen"))
      .groupBy("days_seen").agg(count(lit(1)).as("n_pairs"))
      .orderBy("days_seen")),

    // A6: the notebooks' extended pairs_total mirror — GTJ (Jaccard) metric
    // variant alongside GTO, avg/median of hT and gT, 0.75 threshold
    // (pairs_daily_analysis_GTO.ipynb cell 8 / _GTJ.ipynb cell 8)
    "pairs_total_ext" -> ((s, d) => pairsGold(s, d)
      .withColumn("gtj", lit(0.5) *
        (col("hT").cast("double") / (col("hA") + col("hB") - col("hT")) +
         col("gT").cast("double") / (col("gA") + col("gB") - col("gT"))))
      .groupBy("uid_a", "uid_b")
      .agg(
        countDistinct(col("day_date")).as("days_seen"),
        sum(when(col("gto") >= 0.75, 1L).otherwise(0L)).as("days_gto_075"),
        round(avg(col("gto")), 6).as("avg_gto"),
        round(avg(col("gtj")), 6).as("avg_gtj"),
        round(avg(col("hT")), 6).as("avg_ht"),
        round(expr("percentile(hT, 0.5)"), 6).as("median_ht"),
        round(avg(col("gT")), 6).as("avg_gt"),
        round(expr("percentile(gT, 0.5)"), 6).as("median_gt"))
      .orderBy("uid_a", "uid_b")),

    // iterative graph analytics on the pair network: 3 Pregel-style rounds
    // of integer-arithmetic PageRank — which vessels are co-movement hubs.
    // Bit-stable across engines because every update is bigint +,*,div.
    "pair_pagerank" -> ((s, d) =>
      Graph.pageRankMicro(
          pairsGold(s, d).select("uid_a", "uid_b").distinct(),
          "uid_a", "uid_b", iterations = 3)
        .select(col("id").as("user_id"), col("deg"), col("rank_micro"))
        .orderBy("user_id")),

    // multi-source BFS on the pair network: hop distance from the two
    // top-degree hubs (deg DESC, id ASC tiebreak — deterministic) within 3
    // hops. The curation primitive "how far from a known-bad seed set" run
    // over association graphs; delta-frontier expansion, O(ball boundary)
    // per hop (Graph.seedDistance).
    "seed_distance" -> ((s, d) =>
      Graph.seedDistanceFromHubs(
          pairsGold(s, d).select("uid_a", "uid_b").distinct(),
          "uid_a", "uid_b", k = 2, maxHops = 3)
        .select(col("id").as("user_id"), col("hops"))
        .orderBy("user_id")),

    // who is associating NOW: half-life-decayed pair scores — a 3-month-
    // old tie fades, last week's counts full; pure-integer decay
    // (truncating div by a power of two), reference day rides a broadcast
    // 1-row aggregate (CoMovement.pairsDecayed)
    "decayed_pairs" -> ((s, d) =>
      CoMovement.pairsDecayed(pairsGold(s, d), halfLifeDays = 7)
        .withColumn("last_day_ms", unix_millis(col("last_day").cast("timestamp")))
        .drop("last_day")
        .orderBy("uid_a", "uid_b")),

    // association communities: connected components of the pair network
    // with component sizes — which vessels form one co-movement web at
    // all. Reuses the dedup cluster resolver (min-label propagation to
    // the unique fixpoint, per-round localCheckpoint); the oracle is
    // DuckDB's recursive reachability closure — a convergence-free twin
    // (Dedup.dupClusters).
    "pair_components" -> ((s, d) => {
      val labels = Dedup.dupClusters(
        pairsGold(s, d).select("uid_a", "uid_b").distinct(),
        "uid_a", "uid_b", maxRounds = 30)
      labels
        .join(labels.groupBy("cluster").agg(count(lit(1)).as("comp_size")),
          Seq("cluster"))
        .select(col("id").as("user_id"), col("cluster"), col("comp_size"),
          col("is_canonical"))
        .orderBy("user_id")
    }),

    // sustained-association centrality: PageRank with rank flowing in
    // proportion to total shared hours per pair — a 3-month convoy tie
    // outweighs a 1-hour coincidence. Same integer micro-unit contract
    // and per-iteration plan as pair_pagerank (Graph.weightedPageRankMicro).
    "weighted_pagerank" -> ((s, d) =>
      Graph.weightedPageRankMicro(
          pairsGold(s, d).groupBy("uid_a", "uid_b")
            .agg(sum(col("hT")).as("w")),
          "uid_a", "uid_b", "w", iterations = 3)
        .select(col("id").as("user_id"), col("w_total"), col("rank_micro"))
        .orderBy("user_id")),

    // coordinated-cluster density: the 2-core of the pair network —
    // iterative peeling removes chains and stars, keeping only subgraphs
    // where every member retains >= 2 in-core partners; unique fixpoint,
    // early-stopped driver loop, per-round cost tracks surviving edges
    // (Graph.kCore).
    "k_core" -> ((s, d) =>
      Graph.kCore(
          pairsGold(s, d).select("uid_a", "uid_b").distinct(),
          "uid_a", "uid_b", k = 2)
        .select(col("id").as("user_id"), col("deg_core"))
        .orderBy("user_id")),

    // local clustering structure: per-vessel triangle participation —
    // cohesive convoys close triangles, hub-and-spoke coincidence doesn't.
    // Degree-ordered orientation bounds wedge fanout at O(sqrt m) per node
    // (Graph.triangleCounts).
    "triangle_counts" -> ((s, d) =>
      Graph.triangleCounts(
          pairsGold(s, d).select("uid_a", "uid_b").distinct(),
          "uid_a", "uid_b")
        .select(col("id").as("user_id"), col("triangles"))
        .orderBy("user_id")),

    // link prediction / second-order association: vessels that never
    // co-moved but share >= 2 co-movement partners, with neighborhood
    // Jaccard. Per-node neighbor cap (1000 >> any test-SF degree, so
    // counts are exact) keeps the wedge volume bounded on hubs
    // (Graph.commonNeighborPairs).
    "shadow_pairs" -> ((s, d) =>
      Graph.commonNeighborPairs(
          pairsGold(s, d).select("uid_a", "uid_b").distinct(),
          "uid_a", "uid_b", minCommon = 2, maxNeighbors = 1000)
        .select(col("v").as("uid_a"), col("w").as("uid_b"),
          col("common"), col("jaccard"), col("clipped"))
        .orderBy("uid_a", "uid_b")),

    // graph-local relevance: personalized PageRank teleporting to the
    // top-2 hubs — trust propagation from a curated seed set, rank
    // concentrating in the seeds' neighborhood. Integer micro-units,
    // bit-identical to the oracle's unrolled chain.
    "seed_pagerank" -> ((s, d) =>
      Graph.personalizedPageRankFromHubs(
          pairsGold(s, d).select("uid_a", "uid_b").distinct(),
          "uid_a", "uid_b", k = 2, iterations = 3)
        .select(col("id").as("user_id"), col("deg"), col("ppr_micro"))
        .orderBy("user_id")),

    // release-safety: k-anonymity audit over (event_type, day) quasi-ids —
    // combos mapping to fewer than 5 distinct users re-identify them;
    // summarized per event type (DataQuality.kAnonymityAudit).
    "k_anon_audit" -> ((s, d) =>
      DataQuality.kAnonymityAudit(
          Tables.events(s, d)
            .filter(col("user_id").isNotNull && col("ts").isNotNull)
            .withColumn("dt", to_date(col("ts"))),
          "user_id", Seq("event_type", "dt"), k = 5)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_combos"),
          sum(when(col("risky"), 1L).otherwise(0L)).as("risky_combos"),
          min(col("group_size")).as("min_group"))
        .orderBy("event_type")),

    // release-safety, the companion audit: l-diversity over the customer
    // quasi-ids (nation, segment) with the account-balance band as the
    // sensitive attribute — a combo can be k-anonymous and still leak if
    // every member shares one band (DataQuality.lDiversityAudit; dedup
    // first, expand over the distinct set only)
    "l_diversity" -> ((s, d) =>
      DataQuality.lDiversityAudit(
          Tables.customer(s, d)
            .withColumn("bal_band",
              floor(col("c_acctbal") / 2000.0).cast("long")),
          "c_custkey", Seq("c_nationkey", "c_mktsegment"), "bal_band", l = 3)
        .select(col("c_nationkey"), col("c_mktsegment"),
          col("group_size"), col("l_distinct"), col("risky"))
        .orderBy("c_nationkey", "c_mktsegment")),

    // port-area containment: daily traffic per rectangular geofence —
    // zones are config (constant in SF, the nation-table class), so the
    // containment join broadcasts them and the fact side never shuffles
    // before the rollup (Tracks.geofenceHits; half-open bounds).
    // fixed-interval trajectory resampling: every vessel's irregular
    // series onto a 6-hour grid with linear interpolation — one keyed
    // window pass, no as-of self-join (Tracks.resample)
    "track_resample" -> ((s, d) =>
      Tracks.resample(Tables.events(s, d), intervalMs = 21600000L)
        .orderBy("user_id", "tick_ms")),

    "geofence_hits" -> ((s, d) => {
      val pos = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .select(col("user_id"), to_date(col("ts")).as("dt"),
          (col("value") / 100.0).as("lat"), (col("value") / 50.0).as("lon"))
      Tracks.geofenceHits(pos, "lat", "lon", GeofenceZones)
        .groupBy("zone", "dt")
        .agg(count(lit(1)).as("hits"),
          countDistinct(col("user_id")).as("vessels"))
        .orderBy("zone", "dt")
    }),

    // §2.5: percent-rank curve over pair max GTO (the notebook's procedural
    // sort+index). The rank rides [[Indexing.globalIndex]]'s range-partition
    // protocol, NOT a single-partition global window: the (max_gto, uid_a,
    // uid_b) key is total (ids unique per row), so percent_rank degenerates
    // to global_idx/(n-1) — bit-identical to the window form, but every
    // stage stays distributed even when fleet density makes the pair summary
    // grow quadratically (the same move quality_ensemble made in round 8).
    "gto_rank_curve" -> ((s, d) => {
      val mx = pairMaxGold(s, d)
      // denominator n-1 rides the SAME action as a broadcast single-row
      // aggregate over the small materialized summary (the blessed
      // crossJoin(broadcast(1-row)) shape) instead of an eager mx.count()
      // at query-CONSTRUCTION time — building the declared query must
      // trigger no job, so each bench rep / Verify pass pays exactly one
      val denom = mx.agg(
        greatest(count(lit(1)) - lit(1L), lit(1L)).cast("double").as("__denom"))
      Indexing.globalIndex(
          mx.withColumn("__k",
            struct(col("max_gto").as("v"), col("uid_a").as("a"),
              col("uid_b").as("b"))),
          "__k")
        .crossJoin(broadcast(denom))
        .select(col("uid_a"), col("uid_b"),
          round(col("max_gto"), 6).as("max_gto"),
          round(col("global_idx") / col("__denom"), 6).as("pr"))
        .orderBy("uid_a", "uid_b")
    }),
  )

  /** Training-data pipeline: text analysis + dedup ladder over `documents`. */
  private def textQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // token counting (whitespace + BPE-ish regex)
    "token_count" -> ((s, d) =>
      TextOps.tokenCounts(Tables.documents(s, d), "doc_id", "text").orderBy("doc_id")),

    // Unicode hygiene pass: control/zero-width strip + whitespace collapse,
    // the cleanup every corpus gets before tokenization or dedup hashing
    "text_normalize" -> ((s, d) => {
      val norm = TextOps.normalizeText(col("text"))
      Tables.documents(s, d)
        .select(col("doc_id"), norm.as("text_norm"),
          (norm =!= col("text")).as("changed"),
          (length(col("text")) - length(norm)).as("len_delta"))
        .orderBy("doc_id")
    }),

    // language-ID (stopword-marker heuristic, deterministic argmax)
    "lang_id" -> ((s, d) =>
      TextOps.languageId(Tables.documents(s, d), "doc_id", "text").orderBy("doc_id")),

    // PII detection proven end-to-end (Curation.redactPii — the same
    // operator pii_redact audits on the raw corpus): the synthetic corpus
    // carries no PII, so this query SEEDS each doc with deterministic
    // doc_id-derived email/SSN/phone/card/IP spans and checks counts AND
    // the full redacted text against DuckDB's RE2 on byte-identical input
    // (the patterns live in the Java-regex ∩ RE2 common subset precisely
    // so this oracle exists)
    "pii_scrub" -> ((s, d) => {
      val seeded = Tables.documents(s, d).select(col("doc_id"),
        concat_ws(" ", col("text"),
          concat(lit("user"), col("doc_id").cast("string"), lit("@example.com")),
          when(col("doc_id") % 3 === 0,
            concat(lit("ssn "), (col("doc_id") % 900 + 100).cast("string"),
              lit("-"), (col("doc_id") % 90 + 10).cast("string"),
              lit("-"), (col("doc_id") % 9000 + 1000).cast("string"))),
          when(col("doc_id") % 4 === 0,
            concat(lit("call +14155550"),
              lpad((col("doc_id") % 100).cast("string"), 2, "0"))),
          when(col("doc_id") % 5 === 0,
            concat(lit("ip 10.0."), (col("doc_id") % 256).cast("string"), lit(".7"))),
          when(col("doc_id") % 7 === 0,
            concat(lit("card 4111111111111"),
              lpad((col("doc_id") % 1000).cast("string"), 3, "0")))).as("text"))
      Curation.redactPii(seeded, "doc_id", "text")
        .select(col("doc_id"), col("n_emails"), col("n_ips"), col("n_ids"),
          col("n_cards"), col("n_phones"), col("redacted").as("clean_text"))
        .orderBy("doc_id")
    }),

    // per-doc top-k TF-IDF terms: doc-term counts -> df from the same frame
    // -> broadcast corpus size -> WindowGroupLimit top-k per doc
    "tfidf_topk" -> ((s, d) =>
      TextOps.tfidfTopK(Tables.documents(s, d), "doc_id", "text", TfidfK)
        .orderBy("doc_id", "rk")),

    // quality scoring (length/punct/stopword/case ratios + composite)
    "text_quality" -> ((s, d) =>
      TextOps.qualityScores(Tables.documents(s, d), "doc_id", "text").orderBy("doc_id")),

    // BM25 relevance for a fixed query-term bag (corpus stats broadcast)
    "bm25_score" -> ((s, d) =>
      TextOps.bm25(Tables.documents(s, d), "doc_id", "text", Bm25Terms)
        .orderBy("doc_id")),

    // the query-side retrieval plan: posting selection → keyed tf aggregate
    // → TakeOrdered top-k on the raw score (doc id breaks ties); only
    // term-matching docs are results
    "search_topk" -> ((s, d) =>
      TextOps.searchTopK(Tables.documents(s, d), "doc_id", "text", Bm25Terms,
        SearchK, Bm25K1, Bm25B)),

    // per-doc Shannon char entropy (gibberish screen): one keyed count
    // shuffle; the entropy sum is exact integer micro-unit addition
    "char_entropy" -> ((s, d) =>
      TextOps.charEntropy(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // length-curriculum read order: exact-percentile buckets easy->hard,
    // md5-keyed deterministic shuffle within buckets, contiguous global
    // positions via the two-pass range-partition stamping
    "curriculum_order" -> ((s, d) =>
      Curation.curriculumOrder(Tables.documents(s, d), "doc_id", "text",
        CurriculumBuckets, CurriculumSeed).orderBy("doc_id")),

    // PMI collocations over adjacent token pairs: one bigram shuffle,
    // marginals derived from the bigram counts (not a second corpus pass),
    // ranking on micro-unit-rounded PMI (ln ulp-safety, the lm convention)
    "pmi_bigrams" -> ((s, d) =>
      TextOps.pmiBigrams(Tables.documents(s, d), "doc_id", "text",
        PmiMinCount, PmiTopK)),

    // mod-p rolling-hash fingerprints (Rabin–Karp k-grams, content-anchored)
    "doc_fingerprint" -> ((s, d) =>
      TextOps.rollingFingerprints(Tables.documents(s, d), "doc_id", "text",
          k = FpK, p = FpModP)
        .orderBy("doc_id", "pos")),

    // substring-level near-dup pairs: docs sharing >= FpMinShared selected
    // rolling-hash fingerprints (content-defined chunk overlap; keyed join
    // on the hash with the stop-hash guard, never all-pairs)
    "fp_overlap" -> ((s, d) =>
      TextOps.fingerprintOverlapPairs(Tables.documents(s, d), "doc_id", "text",
          k = FpK, p = FpModP, minShared = FpMinShared, maxDocsPerHash = FpMaxDocs)
        .orderBy("doc_a", "doc_b")),

    // winnowing fingerprint selection (Schleimer et al. SIGMOD'03 / MOSS):
    // window-minimum selection with the guarantee the mod-p sieve lacks —
    // every match of length >= w+k-1 shares a selected fingerprint
    // (TextOps.winnowedFingerprints)
    "fp_winnow" -> ((s, d) =>
      TextOps.winnowedFingerprints(Tables.documents(s, d), "doc_id", "text",
          k = FpK, w = 8)
        .orderBy("doc_id", "h")),

    // deterministic stratified sample: sha256 bucket under per-lang rate
    "doc_sample" -> ((s, d) =>
      Curation.stratifiedHashSample(Tables.documents(s, d), "doc_id", "lang",
          Map("en" -> 10, "de" -> 50), defaultRate = 25)
        .select("doc_id", "lang").orderBy("doc_id")),

    // concat-and-chunk token packing, shard-local (512-token chunks)
    "token_packing" -> ((s, d) =>
      Curation.concatChunkPacking(
          Tables.documents(s, d).withColumn("n_tokens",
            size(TextOps.tokens(col("text")))),
          shardCol = "source", orderCol = "doc_id",
          tokensCol = col("n_tokens"), chunkTokens = 512)
        .select("doc_id", "source", "n_tokens", "tok_start", "tok_end",
          "first_chunk", "last_chunk")
        .orderBy("doc_id")),

    // PII scrub audit on the raw corpus: per-type counts + sequentially
    // redacted text (md5 digest); counts measured on the previously
    // redacted text so types never double-count (Curation.redactPii)
    "pii_redact" -> ((s, d) =>
      Curation.redactPii(Tables.documents(s, d), "doc_id", "text")
        .select(col("doc_id"), col("n_urls"), col("n_emails"), col("n_ips"),
          col("n_ids"), col("n_cards"), col("n_phones"),
          md5(col("redacted")).as("redacted_md5"))
        .orderBy("doc_id")),

    // C4-style quality filter: keep flag + drop-reason bitmask per doc
    "quality_filter" -> ((s, d) =>
      Curation.qualityFilter(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // Gopher rule battery (Rae et al. §A1.1): the other canonical heuristic
    // set — per-signal columns + failure bitmask, one narrow scan
    "gopher_rules" -> ((s, d) =>
      Curation.gopherRules(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // model-based quality filter: fixed-weight logistic over text features
    // (the fastText-classifier stage as a deterministic narrow map)
    "quality_clf" -> ((s, d) =>
      Curation.classifierScore(Tables.documents(s, d), "doc_id", "text",
          ClfWeights, ClfBias, ClfMinScore)
        .orderBy("doc_id")),

    // ensemble quality ranking: three incommensurable signals (logistic
    // score, char entropy, repetition fraction) blended as the mean of
    // their corpus percent-ranks — rank space is the only shared scale.
    // ONE fused scan (Curation.qualitySignals): the former three-operator
    // join was 3 corpus scans + 2 doc_id shuffles for a pure row map
    "quality_ensemble" -> ((s, d) => {
      val signals = Curation.qualitySignals(Tables.documents(s, d),
        "doc_id", "text", ClfWeights, ClfBias)
      Curation.qualityEnsemble(signals, "doc_id",
          Seq("score" -> true, "entropy" -> true, "top_tok_frac" -> false))
        .select("doc_id", "score", "entropy", "top_tok_frac",
          "pr_score", "pr_entropy", "pr_top_tok_frac", "q_blend")
        .orderBy("doc_id")
    }),

    // stratified quality pruning: per-source percentile cut on the
    // classifier score — every domain keeps its own best slice instead of
    // the global cut emptying low-scoring sources
    "quality_prune" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val scored = Curation.classifierScore(docs, "doc_id", "text",
          ClfWeights, ClfBias, ClfMinScore)
        .select(col("doc_id"), col("score"))
        .join(docs.select("doc_id", "source"), Seq("doc_id"))
      Curation.qualityPrune(scored, "doc_id", "source", "score", QPruneKeep)
        .select("doc_id", "source", "score", "q_pr", "keep")
        .orderBy("doc_id")
    }),

    // Gopher-style repetition filters: top-token + duplicate-2-gram fractions
    "repetition" -> ((s, d) =>
      TextOps.repetitionSignals(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),

    // deterministic train/val/test assignment: stable-hash buckets routed
    // through cumulative weights (90/5/5) — rows never migrate across runs
    "corpus_split" -> ((s, d) =>
      Curation.splitAssign(Tables.documents(s, d), "doc_id",
          Seq("train" -> 90, "val" -> 5, "test" -> 5))
        .select("doc_id", "split").orderBy("doc_id")),

    // DSIR importance weights: every doc scored by hashed-ngram likelihood
    // under the target slice (lang='en') vs the raw corpus — the
    // data-selection signal that upweights target-like text corpus-wide
    "dsir_weights" -> ((s, d) =>
      Selection.dsirWeights(Tables.documents(s, d), "doc_id", "text",
          col("lang") === "en", DsirBuckets)
        .orderBy("doc_id")),

    // deterministic DSIR selection: top-k most target-like docs
    "dsir_select" -> ((s, d) =>
      Selection.dsirSelect(Tables.documents(s, d), "doc_id", "text",
          col("lang") === "en", DsirBuckets, DsirK)
        .orderBy("doc_id")),

    // mixture sampling (data mixing): per-lang keep rate from normalized
    // weights × token budget over exact stratum token sums; tiny aggregate
    // broadcast back, per-row stable-hash membership — corpus never shuffles
    "mixture_sample" -> ((s, d) =>
      Curation.mixtureSample(Tables.documents(s, d), "doc_id", "lang",
          size(TextOps.tokens(col("text"))), MixWeights.toMap, MixBudget)
        .orderBy("doc_id")),

    // per-domain cap: deterministic hash-order rank within each source,
    // keep-first-N — RefinedWeb-style domain down-weighting, auditable
    "domain_cap" -> ((s, d) =>
      Curation.domainCap(Tables.documents(s, d), "doc_id", "source", DomainCapN)
        .orderBy("doc_id")),

    // sliding-window chunking with overlap (RAG / fixed-context prep)
    "doc_chunks" -> ((s, d) =>
      Curation.chunkDocs(Tables.documents(s, d), "doc_id", "text",
          ChunkTokens, ChunkOverlap)
        .orderBy("doc_id", "chunk_idx")),

    // corpus 2-gram vocabulary: top-K by occurrence count (BPE prep)
    "vocab_topk" -> ((s, d) =>
      TextOps.ngramVocab(Tables.documents(s, d), "text", VocabN, VocabTopK)),

    // benchmark decontamination: per-train-doc 3-gram overlap against a
    // fixed-size eval cohort (doc_id < 25); the eval n-gram set is broadcast
    // so the training corpus is scanned once with no corpus-side shuffle
    // before the per-doc aggregate
    "decontam" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Decontam.evalOverlap(docs.filter(col("doc_id") >= EvalCohortMax),
          docs.filter(col("doc_id") < EvalCohortMax), "doc_id", "text",
          n = 3, minHits = 1)
        .orderBy("doc_id")
    }),

    // exact dedup: canonical md5 fingerprint + keep-first flag
    "dedup_exact" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text").orderBy("doc_id")),

    // incremental dedup: the new batch probes the standing corpus's
    // fingerprint-only index — daily ingest dedup at O(batch + index keys),
    // the standing text is never rescanned
    "incr_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val standing = Dedup.exact(docs.filter(col("doc_id") < IncrSplitId),
          "doc_id", "text")
        .select("fp")
      Dedup.incrementalExact(docs.filter(col("doc_id") >= IncrSplitId),
          "doc_id", "text", standing)
        .orderBy("doc_id")
    }),

    // n-gram Jaccard near-dup pairs (3-token shingles, keyed join)
    "dedup_ngram" -> ((s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, threshold = 0.5, maxDocsPerShingle = 50)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("nb"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("doc_a", "doc_b")),

    // asymmetric containment: the quote detector — a short doc embedded
    // wholesale in a long one scores jaccard ~ 0 but containment 1.0;
    // either direction clearing 0.8 keeps the pair (Dedup.containmentPairs,
    // same guarded shingle machinery and cost as dedup_ngram).
    "containment_pairs" -> ((s, d) =>
      Dedup.containmentPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, threshold = 0.8, maxDocsPerShingle = 50)
        .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("nb"),
          round(col("cont_a_in_b"), 6).as("cont_a_in_b"),
          round(col("cont_b_in_a"), 6).as("cont_b_in_a"))
        .orderBy("doc_a", "doc_b")),

    // MinHash + LSH candidate pairs (k=8 string-ordered minhashes, bands of 2)
    "dedup_minhash" -> ((s, d) =>
      minhashPairsGold(s, d).orderBy("doc_a", "doc_b")),

    // MinHash estimator calibration on a bounded audit slice: exact n-gram
    // Jaccard next to the k-slot estimate per overlapping pair — the
    // parameter-tuning loop that sizes k/bands BEFORE the corpus-wide run
    // (the quadratic exact join is bounded to the slice by construction)
    "lsh_calibration" -> ((s, d) =>
      Dedup.lshCalibration(
          Tables.documents(s, d).filter(col("doc_id") < LshAuditMax),
          "doc_id", "text", k = 8)
        .orderBy("doc_a", "doc_b")),

    // leakage-safe split: near-dup clusters adopt one split key, so a test
    // doc can never have a near-copy sitting in train
    "leakfree_split" -> ((s, d) =>
      Curation.leakageSafeSplitClusters(Tables.documents(s, d).select("doc_id"),
          "doc_id", clustersGold(s, d),
          Seq("train" -> 80, "val" -> 10, "test" -> 10))
        .select(col("doc_id"), col("cluster"), col("split"))
        .orderBy("doc_id")),

    // corpus-level resemblance: two dataset halves fingerprinted by k
    // global shingle minima, Jaccard estimated from matching slots — the
    // snapshot-diff signal with no pairwise doc work at all
    "corpus_sim" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.corpusJaccardEstimate(
        Dedup.corpusSignature(docs.filter(col("doc_id") < 250), "doc_id", "text"),
        Dedup.corpusSignature(docs.filter(col("doc_id") >= 250), "doc_id", "text"))
    }),

    // incremental LSH: the batch probes the standing banded store; only the
    // batch is hashed in production — the standing side here is derived
    // in-query because the fixture has no persisted store
    "incr_lsh" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Dedup.incrementalLshPairs(
          Dedup.bandedSignature(docs.filter(col("doc_id") >= IncrSplitId),
            "doc_id", "text"),
          Dedup.bandedSignature(docs.filter(col("doc_id") < IncrSplitId),
            "doc_id", "text"))
        .orderBy("doc_a", "doc_b")
    }),

    // retrieve-then-verify fusion: the materialized minhash candidates
    // re-ranked by exact embedding cosine (vec i is doc i's embedding) —
    // lexical LSH proposes, the semantic signal confirms
    "hybrid_dedup" -> ((s, d) =>
      Dedup.cosineVerifyPairs(minhashPairsGold(s, d), Tables.embeddings(s, d),
          "doc_a", "doc_b", "vec_id", "embedding", HybridCosThreshold)
        .orderBy("doc_a", "doc_b")),

    // SimHash-64 signatures (two unsigned 32-bit halves)
    "dedup_simhash" -> ((s, d) =>
      Dedup.simhash(Tables.documents(s, d), "doc_id", "text").orderBy("doc_id")),

    // SimHash hamming-≤3 near-dup pairs: 4×16-bit pigeonhole bands, exact
    // bit_count(xor) only on band-collision candidates
    "simhash_pairs" -> ((s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text", maxHamming = 3)
        .orderBy("doc_a", "doc_b")),

    // near-dup cluster resolution: connected components over the minhash
    // pair graph; is_canonical = keep-one-per-cluster decision
    "dup_clusters" -> ((s, d) =>
      clustersGold(s, d).orderBy("id")),

    // canonical selection by QUALITY: production dedup keeps the best doc
    // per cluster (longest text, ties to the smaller id — the FineWeb-style
    // retention rule), not the min id. Two window passes over the same
    // cluster partitioning = one shuffle; clusters are small by construction
    "cluster_keep" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d).select(col("doc_id").as("id"), col("n_chars"))
      val w = Window.partitionBy("cluster")
      clustersGold(s, d).join(docs, "id")
        .withColumn("__bn", max(col("n_chars")).over(w))
        .withColumn("kept_id",
          min(when(col("n_chars") === col("__bn"), col("id"))).over(w))
        .select(col("id"), col("cluster"), col("n_chars"), col("kept_id"),
          (col("id") === col("kept_id")).as("keep"))
        .orderBy("id")
    }),

    // multimodal frame sampling: payload as fixed-size frame records, every
    // stride-th kept; batched kernel does real byte work (slice + sha256)
    "frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(
          Multimodal.mediaFromDocuments(Tables.documents(s, d)),
          frameBytes = 16, stride = 2)
        .toDF()
        .orderBy("media_id", "frame_idx")),

    // REAL image-header parsing (no decode library, no stub): synthesize
    // valid PNG / GIF / JPEG container headers from doc_id (three format
    // branches: big-endian IHDR, little-endian logical screen, SOF marker
    // walk behind a JFIF APP0), parse them back through the codegen'd
    // ImageDims expression; the oracle derives the same dimensions
    // arithmetically, so any parser or byte-layout bug breaks equality
    // (Multimodal.imageDims; JDK-ImageIO ground truth in ExpressionsSpec)
    "image_dims" -> ((s, d) => {
      val id = col("doc_id")
      def be32h(c: Column) = lpad(hex(c), 8, "0")
      def be16h(c: Column) = lpad(hex(c), 4, "0")
      def le16h(c: Column) = concat(lpad(hex(c % 256), 2, "0"),
        lpad(hex((c / 256).cast("long")), 2, "0"))
      val hexStr = when(id % 3 === 0,
          concat(lit("89504E470D0A1A0A0000000D49484452"),
            be32h(id % 900 + 100), be32h(id % 500 + 50)))
        .when(id % 3 === 1,
          concat(lit("474946383961"),
            le16h(id % 300 + 1), le16h(id % 200 + 1)))
        .otherwise(
          concat(lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
            be16h(id % 500 + 8), be16h(id % 1000 + 16),
            lit("03011100021101031101FFD9")))
      Multimodal.imageDims(
          Tables.documents(s, d).select(id, unhex(hexStr).as("img")),
          "doc_id", "img")
        .orderBy("doc_id")
    }),

    // the audio sibling of image_dims: synthesize PCM-WAV RIFF containers
    // from doc_id (fmt + data chunk walk, all little-endian), parse them
    // back through the codegen'd WavMeta expression; oracle derives the
    // stream parameters arithmetically (Multimodal.wavMeta; JDK
    // javax.sound ground truth in ExpressionsSpec)
    "wav_meta" -> ((s, d) => {
      val id = col("doc_id")
      def le16h(c: Column) = concat(lpad(hex(c % 256), 2, "0"),
        lpad(hex((c / 256).cast("long") % 256), 2, "0"))
      def le32h(c: Column) = concat(le16h(c % 65536),
        le16h((c / 65536).cast("long")))
      val ch = id % 2 + 1
      val rate = id % 5 * 4000 + 8000
      val frames = id % 100 + 1
      val blockAlign = ch * 2 // 16-bit PCM
      val dataSize = frames * blockAlign
      val hexStr = concat(lit("52494646"), le32h(dataSize + 36), // RIFF size
        lit("57415645666D742010000000"), // WAVE, "fmt ", chunk len 16
        lit("0100"), le16h(ch),          // PCM tag, channels
        le32h(rate), le32h(rate * blockAlign), le16h(blockAlign),
        lit("1000"),                     // bits = 16
        lit("64617461"), le32h(dataSize))
      Multimodal.wavMeta(
          Tables.documents(s, d).select(id, unhex(hexStr).as("wav")),
          "doc_id", "wav")
        .orderBy("doc_id")
    }),

    // the video member of the intake-gate trio: synthesize minimal-but-
    // spec-shaped ISO-BMFF containers from doc_id (16-byte ftyp; moov
    // holding a full-size v0 mvhd and a trak/tkhd with the 16.16
    // fixed-point extent after the 36-byte matrix), parse them back
    // through the codegen'd Mp4Meta box walk; the oracle derives brand /
    // extent / timescale / duration arithmetically, so any box-layout or
    // parser bug breaks equality (Multimodal.mp4Meta; hostile-size and
    // v1-layout cases in ExpressionsSpec)
    "video_meta" -> ((s, d) => {
      val id = col("doc_id")
      def be32h(c: Column) = lpad(hex(c), 8, "0")
      def be16h(c: Column) = lpad(hex(c), 4, "0")
      def z(nBytes: Int) = lit("00" * nBytes)
      val ts = id % 5 * 1000 + 1000
      val dur = id % 90000 + 1
      val w = id % 1280 + 16
      val h = id % 720 + 16
      val brandHex = when(id % 3 === 0, lit("69736F6D"))     // isom
        .when(id % 3 === 1, lit("6D703432"))                 // mp42
        .otherwise(lit("61766331"))                          // avc1
      val ftyp = concat(lit("0000001066747970"), brandHex, lit("00000000"))
      val mvhd = concat(lit("0000006C6D766864"), lit("00000000"), z(8),
        be32h(ts), be32h(dur), z(80))
      val tkhd = concat(lit("0000005C746B6864"), lit("00000007"), z(8),
        lit("00000001"), z(4), be32h(dur), z(52),
        be16h(w), lit("0000"), be16h(h), lit("0000"))
      val moov = concat(lit("000000D86D6F6F76"), mvhd,
        concat(lit("000000647472616B"), tkhd))
      Multimodal.mp4Meta(
          Tables.documents(s, d).select(id,
            unhex(concat(ftyp, moov)).as("vid")),
          "doc_id", "vid")
        .orderBy("doc_id")
    }),

    // multimodal plumbing: binary payloads through the batched decode stub;
    // metadata contract (sizes, stub dims, payload sha) is oracle-checked
    "media_features" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Multimodal.mediaFeatures(docs)
        .join(docs.select(col("doc_id").as("media_id"),
          substring(sha2(encode(col("text"), "UTF-8"), 256), 1, 16).as("sha16")),
          "media_id")
        .orderBy("media_id")
    }),
  )

  /** Similarity search over the `embeddings` table (64-dim float vectors).
    *
    * The per-band plane count is DERIVED from the corpus size
    * ([[Similarity.planesFor]]: 2^planes ≈ n / occupancy, so within-bucket
    * join fanout stays ~constant as the corpus grows) and capped at
    * [[LshMaxPlanes]] — the static oracle SQL pre-generates one gated sign
    * chain per plane up to the cap and re-derives the same count from
    * `count(*)` with integer-exact comparisons, so both engines always
    * agree. Sign rows are laid out at a fixed [[LshMaxPlanes]] stride per
    * band, so a corpus-driven count change never shifts which hyperplanes a
    * band uses.
    */
  val LshMaxPlanes = 16
  /** Target expected bucket occupancy for the derived plane count. */
  val LshOccupancy = 8
  /** Corpus-derived per-band plane count for the declared embed queries. */
  def lshPlanesDerived(n: Long): Int =
    math.min(LshMaxPlanes, Similarity.planesFor(n, LshOccupancy))
  val ProjDims = 8
  val LshBands = 2
  val EmbedDims = 64
  val EmbedDupThreshold = 0.3
  val IvfCentroids = 8
  /** Lloyd iterations for the k-means trainer (unrolled in the oracle). */
  val KmeansIters = 2
  /** Greedy BPE merges learned by the declared query (unrolled in the oracle). */
  val BpeMergeSteps = 4
  /** Fixed-size doc cohort the bpe_encode query tokenizes (training still
    * reads the full corpus; encode is a zero-shuffle map, so the cohort only
    * bounds the verify dump).
    */
  val BpeEncodeDocs = 20

  /** IVF search declared query: fixed-size query cohort, 2-of-8 lists probed. */
  private val IvfQueryMax = 20
  private val IvfNProbe = 2

  private def embedQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // brute-force exact cosine top-k (the ANN correctness baseline)
    "embed_topk" -> ((s, d) => {
      // cohort × corpus: FIXED-size query set (first 50 ids) against the full
      // table — the broadcast side is O(1) in corpus size; the corpus streams
      val emb = Tables.embeddings(s, d)
      Similarity.cosineTopK(emb, emb.filter(col("vec_id") < 50),
          "vec_id", "embedding", k = 5)
        .select(col("q"), col("n").as("n_id"), round(col("sim"), 6).as("sim"),
          col("rn").cast("long").as("rn"))
        .orderBy("q", "rn")
    }),

    // hard-negative mining: nearest DIFFERENT-label corpus vectors per
    // cohort query — contrastive-training negatives; positives cannot leak
    // (label inequality is the join condition, not a post-filter)
    "hard_negatives" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 30),
          "vec_id", "embedding", "label", k = 5)
        .select(col("q"), col("q_label"), col("n_id"), col("n_label"),
          round(col("sim"), 6).as("sim"), col("rn").cast("long").as("rn"))
        .orderBy("q", "rn")
    }),

    // random-hyperplane LSH buckets (the scale path's candidate generator);
    // plane count derived from the corpus row count so expected occupancy
    // holds as n grows (the count() is a metadata-only parquet job)
    "embed_lsh" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
      Similarity.lshBuckets(emb, "vec_id", "embedding",
          lshPlanesDerived(emb.count()), EmbedDims)
        .withColumn("bucket_size", count(lit(1)).over(Window.partitionBy(col("bucket"))))
        .orderBy("vec_id")
    }),

    // Johnson–Lindenstrauss sign-matrix projection 64→8 dims: the cheapening
    // pass ahead of ANN/clustering at corpus scale — narrow codegen'd map,
    // deterministic md5-parity signs, strict-order VecDot chains. The array
    // is flattened to one scalar column per component so the driver's
    // row-hash comparison sees hashable scalars, not nested arrays.
    "embed_project" -> ((s, d) =>
      Similarity.randomProject(Tables.embeddings(s, d), "vec_id", "embedding",
          ProjDims, EmbedDims)
        .select(col("vec_id") +:
          (0 until ProjDims).map(j => col("proj")(j).as(s"p$j")): _*)
        .orderBy("vec_id")),

    // IVF coarse-quantizer assignment with a FIXED codebook (the first
    // IvfCentroids embedding vectors): deterministic argmin, oracle-checked;
    // k-means training stays recall-tested only (not bit-stable)
    "ivf_assign" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < IvfCentroids).orderBy("vec_id")
        .select(Similarity.vecd(col("embedding")).as("v"))
        .collect().map(_.getSeq[Double](0).toArray) // tiny codebook → driver ok
      Ivf.assignToCentroids(emb, "vec_id", "embedding", cents)
        .orderBy("vec_id")
    }),

    // §training-pipeline: Lloyd's k-means — the IVF coarse-quantizer TRAINER
    // (ivf_* above take fixed codebooks). Integer-micro arithmetic end to
    // end, so an iterative float algorithm still hash-matches a cross-engine
    // oracle; per iteration ONE map-side-combined shuffle (argmin folds k
    // candidates in the scan, component sums fold to k·d rows)
    "kmeans_centroids" -> ((s, d) =>
      Kmeans.train(Tables.embeddings(s, d), "vec_id", "embedding",
          IvfCentroids, KmeansIters)
        .orderBy("list_id", "pos")),

    // final hard assignment under the trained centroids (the IVF build input)
    "kmeans_assign" -> ((s, d) =>
      Kmeans.assign(Tables.embeddings(s, d), "vec_id", "embedding",
          IvfCentroids, KmeansIters)
        .orderBy("vec_id")),

    // §training-pipeline: BPE tokenizer training, step 0 — frequency-
    // weighted adjacent-symbol-pair counts over the distinct-word vocab
    // (ONE corpus shuffle; everything else is vocab-sized)
    "bpe_pairs" -> ((s, d) =>
      Bpe.pairCounts(
          Bpe.wordVocab(Tables.documents(s, d), "text")
            .select(Bpe.initialSymbols(col("word")).as("syms"), col("freq")))
        .orderBy("lhs", "rhs")),

    // the learned merge table after BpeMergeSteps greedy merges — the
    // distributed iteration (each step oracle-checked); trainLocal is the
    // production path and is property-tested equal in BpeSpec
    "bpe_merges" -> ((s, d) =>
      Bpe.train(Tables.documents(s, d), "text", BpeMergeSteps)
        .orderBy("step")),

    // tokenizer APPLICATION: train on the full corpus (production
    // trainLocal path), then encode a fixed-size doc cohort to token ids —
    // the encode itself is a zero-shuffle codegen'd map + broadcast id
    // join, so the corpus-scale path is exactly this plan minus the cohort
    // filter; ids are base-vocab-sorted then merge-rank (GPT-2 scheme)
    "bpe_encode" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainLocal(docs, "text", BpeMergeSteps)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.encodeTokens(docs.filter(col("doc_id") < BpeEncodeDocs),
          "doc_id", "text", merges)
        .join(broadcast(Bpe.vocabIds(docs, "text", merges)),
          col("token") === col("sym"))
        .select(col("doc_id"), col("wi"), col("tj"), col("token"),
          col("id").as("token_id"))
        .orderBy("doc_id", "wi", "tj")
    }),

    // tokenizer ROUND-TRIP: encode the cohort with the corpus-trained
    // merges, then decode back (Bpe.decodeTokens — word reassembly in tj
    // order, sentinel strip, wi-order rejoin). The oracle is the
    // normalized source text itself, so equality proves encode∘decode
    // lossless corpus-wide — the detokenization contract a serving stack
    // depends on, and a guard no per-merge unit test gives
    "bpe_roundtrip" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = Bpe.trainLocal(docs, "text", BpeMergeSteps)
        .orderBy("step").collect()
        .map(r => (r.getString(1), r.getString(2))).toSeq
      Bpe.decodeTokens(
          Bpe.encodeTokens(docs.filter(col("doc_id") < BpeEncodeDocs),
            "doc_id", "text", merges),
          "doc_id")
        .orderBy("doc_id")
    }),

    // HTML → text extraction: wrap each document in a deterministic
    // markup shell (head/title, a script block whose code must VANISH,
    // entities incl. the double-encoded &amp;lt; that must single-decode,
    // a style block that CLOSES WITH </script> inside — the cross-match
    // trap the per-tag block passes exist for, its css must vanish too —
    // numeric character references across all four fates (decimal, hex,
    // non-printable kept literal, surrogate kept literal) plus both
    // double-encoded numeric forms (&#38;amp; and &amp;#65; — only a
    // single left-to-right decode gets both right), and a comment) and
    // extract — the C4/CCNet first step before any text-quality signal;
    // narrow codegen'd maps, no UDF (TextOps.htmlExtract / htmlExtractDocs)
    "html_extract" -> ((s, d) => {
      val id = col("doc_id")
      val html = concat(
        lit("<html><head><title>T"), id, lit("</title>"),
        lit("<script type=\"text/javascript\">var x = "), id,
        lit("; x = x + 1;</script></head><body><p>"), col("text"),
        lit("</p><p>A &amp; B &lt;ok&gt; &amp;lt;keep&amp;gt;</p>" +
          "<style>p{x:1}</script>leak</style>" +
          "<style>q{c:\"<script>\"}</style><p>kept2</p>" +
          "<p>&#65;&#x42; &#8212;&#169; &#7; &#xD800; &#38;amp; &amp;#65;</p>" +
          "<!-- hidden --></body></html>"))
      TextOps.htmlExtractDocs(
          Tables.documents(s, d).select(id, html.as("text")),
          "doc_id", "text")
        .orderBy("doc_id")
    }),

    // multimodal intake ROUTER: one opaque binary column carrying a mixed
    // corpus (synthesized per doc: PNG / PCM-WAV / MP4 / junk by
    // doc_id % 4), routed by the three header gates in a single narrow
    // pass — the first stage a mixed-media 100 TB intake runs, where
    // nothing downstream (decoders, samplers, dimension filters) should
    // ever see a payload of the wrong modality. Unparseable payloads land
    // in quarantine, the drop-unparsable discipline at corpus width
    "media_router" -> ((s, d) => {
      val id = col("doc_id")
      def be32h(c: Column) = lpad(hex(c), 8, "0")
      def be16h(c: Column) = lpad(hex(c), 4, "0")
      def le16h(c: Column) = concat(lpad(hex(c % 256), 2, "0"),
        lpad(hex((c / 256).cast("long") % 256), 2, "0"))
      def le32h(c: Column) = concat(le16h(c % 65536),
        le16h((c / 65536).cast("long")))
      def z(nBytes: Int) = lit("00" * nBytes)
      val png = concat(lit("89504E470D0A1A0A0000000D49484452"),
        be32h(id % 900 + 100), be32h(id % 500 + 50))
      val ch = id % 2 + 1
      val blockAlign = ch * 2
      val dataSize = (id % 100 + 1) * blockAlign
      val wav = concat(lit("52494646"), le32h(dataSize + 36),
        lit("57415645666D742010000000"), lit("0100"), le16h(ch),
        le32h(id % 5 * 4000 + 8000), le32h((id % 5 * 4000 + 8000) * blockAlign),
        le16h(blockAlign), lit("1000"), lit("64617461"), le32h(dataSize))
      val mp4 = concat(lit("0000001066747970"), lit("69736F6D"), z(4),
        concat(lit("000000D86D6F6F76"),
          concat(lit("0000006C6D766864"), lit("00000000"), z(8),
            be32h(id % 5 * 1000 + 1000), be32h(id % 90000 + 1), z(80)),
          concat(lit("000000647472616B"),
            concat(lit("0000005C746B6864"), lit("00000007"), z(8),
              lit("00000001"), z(4), be32h(id % 90000 + 1), z(52),
              be16h(id % 1280 + 16), lit("0000"),
              be16h(id % 720 + 16), lit("0000")))))
      val junk = lit("6E6F7420766964656F206F7220696D616765") // "not video or image"
      val payload = unhex(when(id % 4 === 0, png).when(id % 4 === 1, wav)
        .when(id % 4 === 2, mp4).otherwise(junk))
      Tables.documents(s, d).select(id, payload.as("p"))
        .select(id,
          when(graft.functions.image_dims(col("p")).isNotNull, "image")
            .when(graft.functions.wav_meta(col("p")).isNotNull, "audio")
            .when(graft.functions.mp4_meta(col("p")).isNotNull, "video")
            .otherwise("quarantine").as("modality"))
        .groupBy("modality").agg(count(lit(1)).as("n_docs"))
        .orderBy("modality")
    }),

    // end-to-end IVF ANN search with the same fixed codebook: a fixed-size
    // query cohort probes its IvfNProbe nearest lists and runs exact cosine
    // inside them only — the full accuracy/throughput dial under oracle
    "ivf_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < IvfCentroids).orderBy("vec_id")
        .select(Similarity.vecd(col("embedding")).as("v"))
        .collect().map(_.getSeq[Double](0).toArray)
      val index = Ivf.buildFixed(emb, "vec_id", "embedding", cents)
      Ivf.search(index, emb.filter(col("vec_id") < IvfQueryMax),
          "vec_id", "embedding", k = 5, nProbe = IvfNProbe)
        .select(col("q"), col("n_id"), round(col("sim"), 6).as("sim"),
          col("rn").cast("long").as("rn"))
        .orderBy("q", "rn")
    }),

    // reciprocal-rank fusion of the lexical (BM25 top-k) and semantic
    // (cosine top-k) rankings — the hybrid-retrieval join; fusion runs over
    // the two k-row leg outputs, O(1) in corpus size
    "rrf_fusion" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val lex = Retrieval.rankByScore(
        TextOps.searchTopK(Tables.documents(s, d), "doc_id", "text",
          Bm25Terms, RrfPoolK, Bm25K1, Bm25B),
        "doc_id", "bm25", "lex_rank")
      val sem = Similarity.cosineTopK(emb,
          emb.filter(col("vec_id") === RrfQueryVec), "vec_id", "embedding",
          k = RrfPoolK)
        .select(col("n").as("doc_id"), col("rn").cast("long").as("sem_rank"))
      Retrieval.rrfFuse(Seq(lex -> "lex_rank", sem -> "sem_rank"), "doc_id",
        SearchK, RrfC)
    }),

    // the ANN-vs-exact evaluation gate: per-query recall@k and reciprocal
    // rank of the true nearest neighbor for the IVF index — the regression
    // check every index rebuild runs before serving
    "rank_eval" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < IvfCentroids).orderBy("vec_id")
        .select(Similarity.vecd(col("embedding")).as("v"))
        .collect().map(_.getSeq[Double](0).toArray)
      val queries = emb.filter(col("vec_id") < IvfQueryMax)
      val ann = Ivf.search(Ivf.buildFixed(emb, "vec_id", "embedding", cents),
        queries, "vec_id", "embedding", k = 5, nProbe = IvfNProbe)
      val exact = Similarity.cosineTopK(emb, queries, "vec_id", "embedding",
        k = 5).select(col("q"), col("n").as("n_id"), col("rn"))
      Retrieval.rankEval(ann, exact, "q", "n_id", "rn", k = 5).orderBy("q")
    }),

    // greedy k-center coreset selection: one scan per round, min-distance
    // as a fixed-order least chain over broadcast center literals, only the
    // argmax row ever collected — the diversity sampler for training data
    "kcenter_select" -> ((s, d) =>
      Selection.kCenter(Tables.embeddings(s, d), "vec_id", "embedding",
        KCenterK).orderBy("sel_rank")),

    // embedding-cosine near-dup pairs, banded-LSH candidates (the scale path:
    // per-band bucket count derives from the corpus size, bands preserve
    // recall; fixed sign stride keeps band layouts stable as the count moves)
    "dedup_embed" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.cosineNearDupPairsBanded(emb, "vec_id",
          "embedding", LshBands, lshPlanesDerived(emb.count()), EmbedDims,
          EmbedDupThreshold, signStride = LshMaxPlanes)
        .select(col("id_a"), col("id_b"), col("bands_shared"),
          round(col("sim"), 6).as("sim"))
        .orderBy("id_a", "id_b")
    }),

    // per-label embedding centroids: elementwise mean as dims independent
    // avgs in one map-side-combinable groupBy (k-means codebook refresh);
    // the declared query flattens the centroid vector to scalar columns so
    // the result is plain-typed (array cells are not hash/sort-comparable
    // across engines)
    "embed_centroids" -> ((s, d) =>
      Similarity.centroids(Tables.embeddings(s, d), "label", "embedding",
          EmbedDims)
        .select(col("label") +: col("n") +:
          (1 to EmbedDims).map(i =>
            element_at(col("centroid"), i).as(f"c$i%02d")): _*)
        .orderBy("label")),

    // backward as-of join: each purchase picks the user's latest
    // at-or-before click via the union + running-last window (one shuffle,
    // no range explode); the click side is pre-deduped per (user, ts) by
    // max event_id so the match is deterministic on every engine
    "asof_enrich" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts")
        .agg(max_by(col("value"), col("event_id")).as("click_value"))
      AsOf.asofJoin(purchases, clicks, "user_id", "ts", Seq("click_value"))
        .select(col("event_id"), col("user_id"),
          unix_millis(col("ts")).as("ts_ms"), round(col("value"), 6).as("value"),
          unix_millis(col("r_ts")).as("click_ms"),
          round(col("r_click_value"), 6).as("click_value"))
        .orderBy("event_id")
    }),

    // CDC merge: snapshot = per-user latest state before the cutoff;
    // changelog = later events netted to latest-per-user, 'error' deletes.
    // One small-side netting shuffle + one keyed full-outer merge — the
    // incremental alternative to the reference's full gold replace
    "cdc_apply" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cutoff = lit(CdcCutoff).cast("timestamp")
      val snapshot = Merge.latestByKey(
          ev.filter(col("ts") < cutoff), "user_id", "event_id")
        .select(col("user_id"), col("value"), col("event_id"))
      val changes = ev.filter(col("ts") >= cutoff)
        .withColumn("op",
          when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
        .select(col("user_id"), col("event_id"), col("op"), col("value"))
      Merge.applyChangelog(snapshot, changes, "user_id", "event_id", "op",
          Seq("value", "event_id"))
        .select(col("user_id"), round(col("value"), 6).as("value"),
          col("event_id").as("last_event_id"), col("changed"))
        .orderBy("user_id")
    }),

    // incremental aggregate maintenance: the standing per-(user, day) rollup
    // (events before the cutoff) absorbs the new slice's partial aggregates
    // via one keyed additive merge — the oracle recomputes from scratch, so
    // a hash match PROVES merge(agg(old), agg(new)) ≡ agg(all). The mid-day
    // cutoff makes the boundary day's keys collide on purpose.
    "incr_rollup" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull &&
          col("value").isNotNull)
        .withColumn("cents", round(col("value") * 100).cast("long"))
      val cutoff = lit(IncrCutoff).cast("timestamp")
      def rollup(df: DataFrame): DataFrame =
        df.groupBy(col("user_id"), to_date(col("ts")).as("day"))
          .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"),
            min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
      Merge.mergeAdditive(
          rollup(ev.filter(col("ts") < cutoff)),
          rollup(ev.filter(col("ts") >= cutoff)),
          Seq("user_id", "day"), Seq("n_events", "sum_cents"),
          minCols = Seq("min_cents"), maxCols = Seq("max_cents"))
        .withColumn("avg_cents",
          round(col("sum_cents").cast("double") / col("n_events"), 6))
        .orderBy("user_id", "day")
    }),

    // SCD2 history: each purchase opens a validity interval on the user's
    // value dimension; version + half-open [from, to) + current flag
    "scd2_history" -> ((s, d) =>
      Merge.scd2(Tables.events(s, d).filter(col("event_type") === "purchase"),
          "user_id", "ts", "event_id", Seq("value"))
        .select(col("user_id"), col("version"), round(col("value"), 6).as("value"),
          unix_millis(col("valid_from")).as("from_ms"),
          unix_millis(col("valid_to")).as("to_ms"), col("is_current"))
        .orderBy("user_id", "version")),

    // interval containment as an equi-join: value bands × events through the
    // fixed-width bin explode — no nested-loop join at any scale
    "range_join_bin" -> ((s, d) => {
      import s.implicits._
      val bands = Seq(
        ("micro", 0.0, 1.0), ("tiny", 1.0, 5.0), ("small", 5.0, 20.0),
        ("mid", 20.0, 60.0), ("large", 60.0, 150.0), ("huge", 150.0, 500.0))
        .toDF("band", "lo", "hi")
      RangeJoin.binnedRangeJoin(Tables.events(s, d), col("value"), bands,
          "lo", "hi", binWidth = 25.0)
        .groupBy("band", "lo", "hi")
        .agg(count(lit(1)).as("n_events"),
          sum(round(col("value") * 100).cast("long")).as("sum_cents"))
        .orderBy("lo")
    }),

    // deterministic weighted sampling (priority sampling): heavier docs more
    // likely, top-k per language, pure +,/ arithmetic — bit-stable ranks
    "weighted_sample" -> ((s, d) =>
      Curation.prioritySample(Tables.documents(s, d), "doc_id", "lang",
          col("n_chars"), PriSampleK)
        .orderBy("lang", "rk")),

    // nucleus-style per-domain token budget: keep docs in stable-hash order
    // until 80% of each source's tokens is covered (token-share cap)
    "topp_cap" -> ((s, d) =>
      Curation.topPByTokens(Tables.documents(s, d), "doc_id", "source",
          size(TextOps.tokens(col("text"))), ToppP)
        .orderBy("doc_id")),

    // sliding-window distinct by sketch MERGE: per-day bitset buffers OR
    // into each trailing window — events are never rescanned per window
    "sliding_distinct" -> ((s, d) =>
      Sketches.slidingDistinct(Tables.events(s, d), "ts", "user_id",
          SlideDays, BloomM, BloomK)
        .orderBy("day")),

    // Bloom-pruned semi-join (the 100 TB star-schema shape): the fact side
    // is filtered by the dim subset's DETERMINISTIC Bloom filter BEFORE the
    // join, so at scale the shuffle carries only maybe-matching rows; the
    // left-semi join removes the false positives, so the result is exactly
    // orders ⋉ cohort — the oracle is the plain semi-join
    "bloom_semi" -> ((s, d) =>
      Sketches.bloomSemiJoin(Tables.orders(s, d), "o_custkey",
          Tables.customer(s, d).filter(col("c_nationkey") === 1), "c_custkey",
          BloomM, BloomK)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
        .orderBy("o_orderkey")),

    // the Bloom filter's own audit, oracle-recomputed bit for bit: pass /
    // true-match / false-positive counts over the fact side, and the
    // invariant the filter exists for — ZERO false negatives — as an
    // exact-integer row the DuckDB twin derives from the same sha256
    // positions
    "bloom_prune" -> ((s, d) => {
      val small = Tables.customer(s, d).filter(col("c_nationkey") === 1)
      val bits = Sketches.bloomBits(small, "c_custkey", BloomM, BloomK)
      Tables.orders(s, d).filter(col("o_custkey").isNotNull)
        .select(col("o_custkey"),
          Sketches.bloomMightContain(col("o_custkey"), bits, BloomM, BloomK)
            .as("hit"))
        .join(broadcast(small.select(col("c_custkey").as("o_custkey"))
          .distinct().withColumn("__m", lit(true))), Seq("o_custkey"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_pass"),
          sum(when(col("__m").isNotNull, 1L).otherwise(0L)).as("n_match"),
          sum(when(col("hit") && col("__m").isNull, 1L).otherwise(0L))
            .as("n_false_pos"),
          sum(when(!col("hit") && col("__m").isNotNull, 1L).otherwise(0L))
            .as("n_false_neg"))
    }),

    // HyperLogLog register table from pure built-ins (Flajolet et al.,
    // AofA 2007): per-day distinct-user registers — bucket = sha256 word 1
    // mod 2^p, rho = leading-zero rank of sha256 word 2 in a 62-bit window,
    // register = max(rho). Max-mergeable (store a day's registers, re-merge
    // across days without rescanning) and cross-engine EXACT, unlike
    // approx_count_distinct's engine-private HLL++ binary
    "hll_registers" -> ((s, d) =>
      Sketches.hllRegisters(
        Tables.events(s, d).filter(col("ts").isNotNull)
          .select(to_date(col("ts")).as("day_date"), col("user_id")),
        Seq("day_date"), "user_id", HllP)
        .orderBy("day_date", "bucket")),

    // per-day HLL estimator state in EXACT integers (register count, empty
    // registers, the 2^63-scaled harmonic denominator) — no engine-computed
    // float crosses the oracle boundary (the lm_score discipline applied to
    // a sketch); the double estimate is engine-side (Sketches.hllEstimate,
    // accuracy pinned vs exact distinct in SketchesSpec)
    "hll_distinct" -> ((s, d) =>
      Sketches.hllDistinct(
        Tables.events(s, d).filter(col("ts").isNotNull)
          .select(to_date(col("ts")).as("day_date"), col("user_id")),
        Seq("day_date"), "user_id", HllP)
        .select(col("day_date"), col("n_buckets"), col("v_zero"),
          col("denom_scaled").cast("string").as("denom_scaled"))
        .orderBy("day_date")),

    // trailing-7-day distinct users by HLL REGISTER MERGE: one register
    // table per day (events read once), windows max-merge register rows —
    // never rescan — then roll up to the same exact-integer state as
    // hll_distinct (the warehouse COUNT DISTINCT over overlapping windows)
    "hll_sliding" -> ((s, d) =>
      Sketches.hllSliding(Tables.events(s, d), "ts", "user_id",
          SlideDays, HllP)
        .select(col("day").as("day_date"), col("n_buckets"), col("v_zero"),
          col("denom_scaled").cast("string").as("denom_scaled"))
        .orderBy("day_date")),

    // deterministic bitset distinct sketch (typed Aggregator UDAF): per-type
    // distinct users — set-bit count + linear-counting estimate vs exact
    "bloom_distinct" -> ((s, d) => {
      val sk = Sketches.bitsetDistinct(BloomM, BloomK)
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(count_distinct(col("user_id")).as("n_exact"),
          sk(col("user_id").cast("string")).as("sk"))
        .select(col("event_type"), col("n_exact"),
          col("sk.n_set").as("n_set"), col("sk.est_distinct").as("est_distinct"))
        .orderBy("event_type")
    }),

    // KMV (bottom-k / theta) minhash table: per-day k smallest distinct
    // 62-bit sha256 hashes of user_id, via the BOUNDED typed Aggregator
    // (≤ 8k bytes of state per group, idempotent sorted-merge) — the
    // oracle re-derives every row with a window rank over all distinct
    // hashes, so the hash match PROVES bounded-aggregate ≡ naive bottom-k
    "kmv_minhash" -> ((s, d) =>
      Sketches.kmvMinhashes(
        Tables.events(s, d).filter(col("ts").isNotNull)
          .select(to_date(col("ts")).as("day_date"), col("user_id")),
        Seq("day_date"), "user_id", KmvK)
        .orderBy("day_date", "rank")),

    // KMV estimator state in EXACT integers (sketch size + the 2^62-scaled
    // kth minimum = theta): the distinct-count float stays engine-side
    // (Sketches.kmvEstimate, accuracy pinned in SketchesSpec); n_exact
    // rides as the audit column, the bloom_distinct convention
    "kmv_distinct" -> ((s, d) => {
      val sk = Sketches.kmvSketch(KmvK)
      Tables.events(s, d)
        .filter(col("ts").isNotNull && col("user_id").isNotNull)
        .select(to_date(col("ts")).as("day_date"), col("user_id"),
          Sketches.kmvHash(col("user_id")).as("__hv"))
        // ONE aggregation carries both the sketch and the exact audit
        // count — no join back, no second scan
        .groupBy("day_date")
        .agg(sk(col("__hv")).as("__mins"),
          count_distinct(col("user_id")).as("n_exact"))
        .select(col("day_date"),
          size(col("__mins")).cast("long").as("n_kept"),
          element_at(col("__mins"), -1).as("kth_scaled"),
          col("n_exact"))
        .orderBy("day_date")
    }),

    // the set operation HLL cannot do: pairwise day-over-day audience
    // overlap from the SKETCHES ALONE — union-k of each sketch pair is a
    // valid union sketch, membership in both estimates Jaccard (Beyer et
    // al., SIGMOD 2007). Events are read once for the sketch build; every
    // pair is computed on broadcast k-long arrays (days² pairs of ≤ k
    // longs — retention/overlap matrices over 100 TB without a rescan)
    "kmv_overlap" -> ((s, d) =>
      Sketches.kmvOverlap(
        Tables.events(s, d).filter(col("ts").isNotNull)
          .select(to_date(col("ts")).as("day_date"), col("user_id")),
        "day_date", "user_id", KmvK)
        .orderBy("seg_a", "seg_b")),

    // count-min sketch (typed Aggregator UDAF): one 4×256 counter matrix
    // over the whole stream, then every user's frequency estimated from the
    // min of its 4 cells — CMS never undercounts, and because the matrix
    // merges by element-wise addition it is bit-identical under any
    // partitioning and recomputable cell-for-cell by the DuckDB oracle
    "cms_freq" -> ((s, d) => {
      val sk = Sketches.countMin(CmsDepth, CmsWidth)
      val ev = Tables.events(s, d).filter(col("user_id").isNotNull)
        .select(col("user_id").cast("string").as("u"))
      val matrix = ev.agg(sk(col("u")).as("cms"))
      val cells = (0 until CmsDepth).map { j =>
        element_at(col("cms"),
          (lit(j * CmsWidth) +
            graft.functions.stable_bucket(
              concat(col("u"), lit("#"), lit(j.toString)), CmsWidth)
              .cast("int") + 1).cast("int"))
      }
      ev.groupBy("u").agg(count(lit(1)).as("exact_cnt"))
        .crossJoin(broadcast(matrix))
        .select(col("u").cast("long").as("user_id"), col("exact_cnt"),
          least(cells: _*).as("cms_est"))
        .withColumn("never_undercounts", col("cms_est") >= col("exact_cnt"))
        .orderBy("user_id")
    }),

    // mergeable equi-width histogram sketch (typed Aggregator UDAF): one
    // algebraic pass, no sort — the monitoring profile at fact-table scale
    "value_hist" -> ((s, d) => {
      val sk = Sketches.histogramSketch(HistLo, HistHi, HistBins)
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(sk(col("value")).as("h"))
        .select(col("event_type"), posexplode(col("h")).as(Seq("slot", "cnt")))
        .orderBy("event_type", "slot")
    }),

    // time-series densification: dense per-user hourly grid over each user's
    // own observed span, zero-filled where the user was silent
    "gap_fill" -> ((s, d) =>
      TimeSeries.hourlyCountsDense(
          Tables.events(s, d).filter(col("user_id") < GapFillMaxUid),
          "user_id", "ts")
        .select(col("user_id"), unix_millis(col("hour_ts")).as("hour_ms"),
          col("n_events"))
        .orderBy("user_id", "hour_ms")),

    // quantile clipping: per-type exact p05/p95 bounds over integer cents,
    // broadcast back, narrow clip map — the fact table never shuffles
    "winsorize" -> ((s, d) =>
      Stats.winsorize(Tables.events(s, d), "event_id", "event_type", "value",
          WinsorLo, WinsorHi)
        .orderBy("event_id")),

    // equi-depth histogram: per-type value deciles (ntile + range/count per
    // bucket); null values excluded in BOTH engines (null-order differs)
    "value_deciles" -> ((s, d) =>
      Stats.equiDepthHistogram(
          Tables.events(s, d).filter(col("value").isNotNull),
          "event_type", "value", "event_id", n = 10)
        .orderBy("event_type", "bucket")),

    // sub-document dedup: corpus-wide first-occurrence on fixed-size chunk
    // digests, per-doc duplicate-mass report (C4/Dolma paragraph dedup at
    // chunk granularity)
    "chunk_dedup" -> ((s, d) =>
      Dedup.chunkDedup(Tables.documents(s, d), "doc_id", "text", ChunkTokens)
        .orderBy("doc_id")),

    // duplicate-passage scrub: the REWRITE step of sub-document dedup —
    // emits the cleaned corpus (first occurrence of every word-window kept,
    // later repeats cut, docs re-stitched in order)
    "scrub_dupes" -> ((s, d) =>
      Dedup.scrubSegments(Tables.documents(s, d), "doc_id", "text", ScrubTokens)
        .orderBy("doc_id")),

    // ExactSubstr-style duplicate-span profile: stride-1 windows at the
    // scrub's own granularity — catches offset-shifted repeats the fixed
    // segments miss, and calibrates whether the scrub rewrite is needed
    "dup_spans" -> ((s, d) =>
      Dedup.dupSpanCoverage(Tables.documents(s, d), "doc_id", "text",
          ScrubTokens)
        .orderBy("doc_id")),

    // ExactSubstr rewrite: duplicated stride-1 spans removed at EVERY later
    // occurrence (any offset), first occurrence kept verbatim — the
    // offset-robust companion to scrub_dupes' fixed segments
    "scrub_spans" -> ((s, d) =>
      Dedup.scrubSpans(Tables.documents(s, d), "doc_id", "text", ScrubTokens)
        .orderBy("doc_id")),

    // incremental span profile: the arriving batch is segmented once and
    // probed against the standing corpus's distinct window digests — the
    // standing text is never rescanned (the continuous-crawl shape); the
    // standing/batch demarcation is the [[IncrSplitId]] fixture watermark
    "incr_spans" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val standing = Dedup
        .spanWindows(docs.filter(col("doc_id") < IncrSplitId), "doc_id", "text",
          ScrubTokens)
        .select("wkey").distinct()
      Dedup.incrementalSpanCoverage(docs.filter(col("doc_id") >= IncrSplitId),
          "doc_id", "text", ScrubTokens, standing)
        .orderBy("doc_id")
    }),

    // content-defined chunking dedup: boundaries anchor to the rolling hash,
    // not offsets, so shifted/quoted passages dedup where fixed-size chunks
    // all change
    "content_chunks" -> ((s, d) =>
      Dedup.contentChunkDedup(Tables.documents(s, d), "doc_id", "text",
          FpK, CdcDiv)
        .orderBy("doc_id")),

    // release receipt: per-source row count, exact token total, and an
    // order-independent XOR checksum — identical under any partitioning
    "shard_manifest" -> ((s, d) =>
      Curation.shardManifest(Tables.documents(s, d), "source", "doc_id", "text")
        .orderBy("source")),

    // Z-order clustering key (codegen BitInterleave): the (cell, hour)
    // multi-dimensional sort key a data-skipping layout writes files by
    "zorder_key" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("value").isNotNull && col("ts").isNotNull)
        .select(col("event_id"),
          graft.functions.pos_cell(col("value"), Res).as("cell"),
          hour(col("ts")).cast("long").as("hr"))
        .withColumn("zkey", graft.functions.z_order(col("cell"), col("hr")))
        .orderBy("event_id")),

    // built-in session_window in BATCH mode: gap-merged per-user sessions —
    // the declarative sibling of trip_segments' lag+cumsum (and of the
    // streaming StreamingRollup.sessionized), under the oracle
    "session_agg" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("user_id").isNotNull && col("ts").isNotNull)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), unix_millis(col("w.start")).as("start_ms"),
          unix_millis(col("w.end")).as("end_ms"), col("n_events"))
        .orderBy("user_id", "start_ms")),

    // event-time trailing-window rolling stats (RANGE frame, not ROWS):
    // per-user count/mean over the preceding hour; exact integer-unit sums
    "rolling_stats" -> ((s, d) =>
      TimeSeries.rollingRangeStats(Tables.events(s, d), "event_id", "user_id",
          "ts", "value", RollWindowSec)
        .orderBy("event_id")),

    // kinematic QA: implied speed between consecutive pings on the synthetic
    // position axis, teleport flag above the physical ceiling — micro-degree
    // integer distance math, one window shuffle on the track key
    "track_speed" -> ((s, d) =>
      Trajectory.impliedSpeed(
          Tables.events(s, d)
            .select(col("user_id"), col("event_id"), col("ts"),
              (col("value") % 180.0 - 90.0).as("lat"),
              ((col("value") * 2.0) % 360.0 - 180.0).as("lon")),
          "user_id", "event_id", "ts", "lat", "lon", TeleportKmh)
        .orderBy("user_id", "event_id")),

    // gaps-and-islands: maximal same-cell runs per track (anchorage/port-visit
    // shape); a revisited cell opens a NEW episode
    "dwell_episodes" -> ((s, d) =>
      Trajectory.dwellEpisodes(
          Tables.events(s, d)
            .filter(col("value").isNotNull)
            .select(col("user_id"), col("event_id"), col("ts"),
              concat_ws(":",
                floor((col("value") % 180.0) / 30.0).cast("long"),
                floor(((col("value") * 2.0) % 360.0) / 60.0).cast("long"))
                .as("cell")),
          "user_id", "event_id", "ts", "cell", DwellMinPings)
        .orderBy("user_id", "start_ms", "cell")),

    // linear gap interpolation on the dense per-user hourly grid (the
    // resampling sibling of gap_fill's zero-fill); exact (sum, count) integer
    // pairs feed one identical closing float chain in both engines
    "gap_interp" -> ((s, d) =>
      Trajectory.interpolateHourly(
          Tables.events(s, d).filter(col("user_id") < GapFillMaxUid),
          "user_id", "ts", "value")
        .orderBy("user_id", "hour_ms")),

    // the end-to-end curation funnel under the oracle: normalize → exact
    // dedup → near-dup cluster canonicality → quality → decontamination,
    // every doc annotated with the FIRST stage that dropped it; survivor
    // text PII-redacted (compared by md5). Same eval split as decontam.
    "curation_funnel" -> ((s, d) => {
      val all = Tables.documents(s, d)
      // the dedup service owns pair generation: reuse the gold pair table
      // restricted to the curated slice (per-doc signatures make the
      // restriction exactly equal to pairs computed on the subset; this
      // corpus normalizes to itself, as the oracle twin also assumes)
      val pairs = minhashPairsGold(s, d)
        .filter(col("doc_a") >= EvalCohortMax && col("doc_b") >= EvalCohortMax)
      CurationPipeline.curate(
          all.filter(col("doc_id") >= EvalCohortMax), "doc_id", "text",
          Some(all.filter(col("doc_id") < EvalCohortMax).select("text")),
          candidatePairs = Some(pairs))
        .select(col("doc_id"), col("drop_stage"), col("kept"),
          md5(col("clean_text")).as("clean_md5"))
        .orderBy("doc_id")
    }),

    // per-source template/boilerplate commonality: fraction of each doc's
    // distinct 3-grams shared by > dfFrac of its source's docs — the
    // cross-doc furniture signal quality_clf/repetition can't see
    "boilerplate_score" -> ((s, d) =>
      TextOps.boilerplateScore(Tables.documents(s, d), "doc_id", "text",
          "source", n = 3, dfFrac = BoilerDfFrac)
        .orderBy("doc_id")),

    // full CUBE over (event_type, hour-of-day) with grouping_id: all four
    // granularities in ONE Expand+agg pass (completes the rollup/pivot family)
    "cube_agg" -> ((s, d) =>
      Tables.events(s, d).filter(col("ts").isNotNull)
        .cube(col("event_type"), hour(col("ts")).as("hod"))
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("n_events"),
          round(sum(round(col("value") * 10000).cast("long")) / 10000.0, 4)
            .as("sum_value"))
        .select(col("event_type"), col("hod"), col("gid"), col("n_events"),
          col("sum_value"))
        .orderBy("gid", "event_type", "hod")),

    // distributed contiguous row numbering: range partition + per-partition
    // offsets — the scale path where a global row_number window single-tasks
    "global_index" -> ((s, d) =>
      Indexing.globalIndex(Tables.events(s, d).select("event_id"), "event_id")
        .orderBy("event_id")),

    // deterministic epoch shuffle: contiguous ids in stable-hash order — the
    // reproducible corpus permutation a training run reads per epoch
    "shuffle_index" -> ((s, d) =>
      Indexing.shuffleIndex(Tables.events(s, d).select("event_id"), "event_id",
          seed = 1L)
        .orderBy("event_id")),

    // blocked edit-distance similarity join (entity resolution): prefix
    // block -> length prune -> exact levenshtein verify, never all-pairs
    "fuzzy_pairs" -> ((s, d) =>
      Fuzzy.editDistancePairs(Tables.customer(s, d), "c_custkey", "c_name",
          expr("substring(c_name, 1, length(c_name) - 2)"), FuzzyMaxDist)
        .orderBy("id_a", "id_b")),

    // sorted-neighborhood ER pass: candidates from a sliding window over the
    // name sort order — the blocking-free complement of fuzzy_pairs
    "snm_pairs" -> ((s, d) =>
      Fuzzy.sortedNeighborhoodPairs(Tables.customer(s, d), "c_custkey",
          "c_name", col("c_name"), SnmWindow, FuzzyMaxDist)
        .orderBy("id_a", "id_b")),

    // semantic decontamination: max cosine of every corpus vector to the
    // (broadcast) eval cohort — the paraphrase-catching twin of `decontam`
    "semantic_decontam" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      Similarity.semanticContamination(
          emb.filter(col("vec_id") >= IvfQueryMax),
          emb.filter(col("vec_id") < IvfQueryMax),
          "vec_id", "embedding", SemDedupThreshold)
        .select(col("vec_id"), round(col("max_eval_sim"), 6).as("max_eval_sim"),
          col("contaminated"))
        .orderBy("vec_id")
    }),

    // SemDeDup: fixed-codebook cell routing + within-cell cosine, keep-first
    "semdedup" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cents = emb.filter(col("vec_id") < IvfCentroids).orderBy("vec_id")
        .select(Similarity.vecd(col("embedding")).as("v"))
        .collect().map(_.getSeq[Double](0).toArray)
      Similarity.semDedup(emb, "vec_id", "embedding", cents, SemDedupThreshold)
        .orderBy("vec_id")
    }),

    // product-quantization codes with a fixed codebook: one narrow argmin
    // pass, m codes per vector (the compression layer under billion-vector ANN)
    "pq_encode" -> ((s, d) => pqCodesGold(s, d).orderBy("vec_id")),

    // int8 scalar quantization: per-vector [min,max] span, floor-to-cell
    // codes, midpoint reconstruction error — one narrow zero-shuffle map
    "embed_sq8" -> ((s, d) =>
      Pq.scalarQuantize8(Tables.embeddings(s, d), "vec_id", "embedding")
        .orderBy("vec_id")),

    // PQ ADC search: query cohort keeps real vectors + broadcast LUTs; the
    // corpus streams as CODES ONLY from the materialized index (encode once,
    // search many — the gold lifecycle applied to the PQ index)
    "pq_topk" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
      val cb = Pq.codebookFromFirst(emb, "vec_id", "embedding", PqM, PqKsub)
      Pq.adcTopK(pqCodesGold(s, d), emb.filter(col("vec_id") < IvfQueryMax),
          "vec_id", "embedding", cb, k = 5)
        .select(col("q"), col("n_id"), round(col("adc"), 6).as("adc"),
          col("rn").cast("long").as("rn"))
        .orderBy("q", "rn")
    }),

    // self-trained word-bigram LM fluency score (the KenLM-perplexity role):
    // per-doc mean transition log-prob, integer micro-nat sums
    "lm_score" -> ((s, d) =>
      TextOps.bigramLmScore(Tables.documents(s, d), "doc_id", "text")
        .orderBy("doc_id")),
  )

  // ------------------------------------------------------------- oracle SQL

  /** Shared DuckDB CTE: hourly rollup + pairs pipeline (unrounded scores; the
    * per-query SELECT rounds at the edge, so downstream aggregates see
    * bit-identical doubles in both engines).
    */
  private val HourlyCte =
    s"""WITH hourly0 AS (
       |  SELECT user_id AS uid,
       |         date_trunc('hour', ts) AS hour_ts,
       |         CAST(date_trunc('hour', ts) AS DATE) AS dt,
       |         CAST(extract(hour FROM date_trunc('hour', ts)) AS INTEGER) AS hr,
       |         CAST(count(*) AS BIGINT) AS message_count,
       |         -- round-15 integer form (graft.functions.micro_units): each
       |         -- position quantized per row to micro-units, mean kept in
       |         -- BIGINT — no double avg, no round(,6) decimal-vs-binary seam
       |         CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sum_micro
       |  FROM events
       |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value BETWEEN 0 AND 500
       |  GROUP BY user_id, date_trunc('hour', ts)),
       |hourly AS (
       |  SELECT uid, hour_ts, dt, hr, message_count,
       |         ((2 * sum_micro + message_count) // (2 * message_count))
       |           / 1000000.0 AS avg_pos,
       |         CAST(((2 * sum_micro + message_count) // (2 * message_count))
       |           * $ResCellsSql // 500000000 AS BIGINT) AS cell
       |  FROM hourly0)""".stripMargin

  /** Shared oracle CTE for the DSIR queries: tokenize → unigrams+bigrams →
    * sha256 bucket (the StableHashBucket mapping, corpus_split-style) →
    * smoothed per-bucket target/raw log ratio in integer micro-nats →
    * per-doc exact sums. Both dsir oracles append their own SELECT.
    */
  private val DsirCte =
    s"""WITH t AS (SELECT doc_id, lang = 'en' AS tgt,
       |    string_split(text, ' ') AS ts FROM documents),
       |g AS (SELECT doc_id, tgt,
       |    unnest(list_concat(ts,
       |      list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1])))
       |      AS gram
       |  FROM t),
       |f AS (SELECT doc_id, tgt,
       |    CAST(('0x' || substr(sha256(gram), 1, 16))::UBIGINT % $DsirBuckets
       |      AS BIGINT) AS b
       |  FROM g),
       |st AS (SELECT b, sum(CASE WHEN tgt THEN 1 ELSE 0 END) AS ct,
       |    count(*) AS cr FROM f GROUP BY 1),
       |tot AS (SELECT CAST(sum(ct) AS DOUBLE) AS t_tot,
       |    CAST(sum(cr) AS DOUBLE) AS r_tot FROM st),
       |lam AS (SELECT b, CAST(round(ln(
       |      ((ct + 1.0) * (r_tot + $DsirBuckets.0)) /
       |      ((cr + 1.0) * (t_tot + $DsirBuckets.0))) * 1000000) AS BIGINT)
       |    AS lu
       |  FROM st, tot),
       |dw AS (SELECT f.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
       |    CAST(sum(lam.lu) AS BIGINT) AS lw_u
       |  FROM f JOIN lam USING (b) GROUP BY 1)""".stripMargin

  /** Shared DuckDB CTE for the ring co-location twins: lattice math at the
    * basin mapping (scale 2^2 = 4), ring-1 adjacency as a 7-value IN on the
    * packed axial delta (dq*2^28 + dr), day rollup in `g`.
    */
  private val RingPairsCte =
    """WITH base AS (
      |  SELECT user_id AS uid, date_trunc('hour', ts) AS hour_ts,
      |         value / 100.0 AS lat, value / 50.0 AS lon
      |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
      |    AND value IS NOT NULL),
      |h AS (
      |  SELECT uid, hour_ts,
      |         CAST(sum(CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS lat_sum,
      |         CAST(sum(CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS lon_sum,
      |         CAST(count(*) AS BIGINT) AS n
      |  FROM base GROUP BY 1, 2),
      |c0 AS (SELECT uid, hour_ts,
      |         ((CASE WHEN lat_sum < 0 THEN -1 ELSE 1 END)
      |           * ((2 * abs(lat_sum) + n) // (2 * n))) / 1000000.0 AS qlat,
      |         ((CASE WHEN lon_sum < 0 THEN -1 ELSE 1 END)
      |           * ((2 * abs(lon_sum) + n) // (2 * n))) / 1000000.0 AS qlon
      |       FROM h),
      |c1 AS (SELECT uid, hour_ts, qlon * 4.0 / 2.0 - qlat * 4.0 / 3.0 AS qf,
      |               qlat * 4.0 * 2.0 / 3.0 AS rf FROM c0),
      |c2 AS (SELECT *, -qf - rf AS sf FROM c1),
      |c3 AS (SELECT *, floor(qf + 0.5) AS q0, floor(rf + 0.5) AS r0,
      |               floor(sf + 0.5) AS s0 FROM c2),
      |c4 AS (SELECT uid, hour_ts,
      |  CASE WHEN abs(q0-qf) > abs(r0-rf) AND abs(q0-qf) > abs(s0-sf)
      |       THEN -r0-s0 ELSE q0 END AS q,
      |  CASE WHEN NOT (abs(q0-qf) > abs(r0-rf) AND abs(q0-qf) > abs(s0-sf))
      |            AND abs(r0-rf) > abs(s0-sf)
      |       THEN -q0-s0 ELSE r0 END AS r
      |  FROM c3),
      |cells AS (SELECT uid, CAST(hour_ts AS DATE) AS dt,
      |                 extract(hour FROM hour_ts) AS hr,
      |                 CAST(q AS BIGINT) AS q, CAST(r AS BIGINT) AS r FROM c4),
      |p AS (
      |  SELECT a.uid AS uid_a, b.uid AS uid_b, a.dt,
      |         (a.q = b.q AND a.r = b.r) AS is_exact,
      |         CAST(a.q * 268435456 + a.r AS VARCHAR) || ':' ||
      |           CAST(b.q * 268435456 + b.r AS VARCHAR) AS cfg
      |  FROM cells a JOIN cells b
      |    ON a.dt = b.dt AND a.hr = b.hr AND a.uid < b.uid
      |   AND ((a.q - b.q) * 268435456 + (a.r - b.r)) IN
      |       (0, 268435456, 268435455, -1, -268435456, -268435455, 1)),
      |g AS (
      |  SELECT uid_a, uid_b, dt AS day_date,
      |         CAST(count(*) AS BIGINT) AS h_ring,
      |         CAST(count(DISTINCT cfg) AS BIGINT) AS g_ring,
      |         CAST(sum(CASE WHEN is_exact THEN 1 ELSE 0 END) AS BIGINT) AS h_exact
      |  FROM p GROUP BY 1, 2, 3 HAVING count(DISTINCT cfg) > 1)""".stripMargin

  private val PairsCte =
    s"""$HourlyCte,
       |pair_hours AS (
       |  SELECT a.uid AS uid_a, b.uid AS uid_b, a.dt, a.hr, a.cell
       |  FROM hourly a JOIN hourly b
       |    ON a.dt = b.dt AND a.hr = b.hr AND a.cell = b.cell AND a.uid < b.uid),
       |pair_agg AS (
       |  SELECT uid_a, uid_b, dt,
       |         CAST(count(DISTINCT hr) AS BIGINT) AS hT,
       |         CAST(count(DISTINCT cell) AS BIGINT) AS gT
       |  FROM pair_hours GROUP BY 1, 2, 3
       |  HAVING count(DISTINCT cell) > 1),
       |ship_day AS (
       |  SELECT uid, dt, CAST(count(*) AS BIGINT) AS win_cnt,
       |         CAST(count(DISTINCT cell) AS BIGINT) AS geo_cnt
       |  FROM hourly GROUP BY 1, 2),
       |pairs AS (
       |  SELECT p.uid_a, p.uid_b, p.dt AS day_date,
       |         a.win_cnt AS hA, b.win_cnt AS hB, a.geo_cnt AS gA, b.geo_cnt AS gB,
       |         p.hT, p.gT,
       |         CAST(p.hT AS DOUBLE) / nullif(CAST(least(a.win_cnt, b.win_cnt) AS DOUBLE), 0) AS temporal_o,
       |         CAST(p.gT AS DOUBLE) / nullif(CAST(least(a.geo_cnt, b.geo_cnt) AS DOUBLE), 0) AS spatial_o
       |  FROM pair_agg p
       |  JOIN ship_day a ON a.uid = p.uid_a AND a.dt = p.dt
       |  JOIN ship_day b ON b.uid = p.uid_b AND b.dt = p.dt),
       |pairs_g AS (SELECT *, 0.5 * (temporal_o + spatial_o) AS gto FROM pairs)""".stripMargin

  def oracleSql: Map[String, String] = Map(
    "uid_hourly" ->
      s"""$HourlyCte
         |SELECT uid AS user_id, epoch_ms(hour_ts) AS hour_ms, message_count,
         |       avg_pos AS avg_value, cell
         |FROM hourly ORDER BY user_id, hour_ms""".stripMargin,

    // mirrors GeoCell.cellId exactly: same rational-constant lattice map,
    // same floor(v+0.5) cube rounding, same 60-bit packing; DuckDB's to_hex
    // is uppercase, hence lower()
    "uid_hourly_h3" ->
      """WITH base AS (
        |  SELECT user_id, date_trunc('hour', ts) AS hour_ts,
        |         (value % 180.0) - 90.0 AS lat,
        |         ((value * 2.0) % 360.0) - 180.0 AS lon
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL),
        |h AS (
        |  SELECT user_id, hour_ts,
        |         CAST(sum(CAST(floor(lat * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS lat_sum,
        |         CAST(sum(CAST(floor(lon * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS lon_sum,
        |         CAST(count(*) AS BIGINT) AS message_count
        |  FROM base GROUP BY 1, 2),
        |c0 AS (SELECT *,
        |         ((CASE WHEN lat_sum < 0 THEN -1 ELSE 1 END)
        |           * ((2 * abs(lat_sum) + message_count) // (2 * message_count)))
        |           / 1000000.0 AS qlat,
        |         ((CASE WHEN lon_sum < 0 THEN -1 ELSE 1 END)
        |           * ((2 * abs(lon_sum) + message_count) // (2 * message_count)))
        |           / 1000000.0 AS qlon
        |       FROM h),
        |c1 AS (SELECT *, qlon * 128.0 / 2.0 - qlat * 128.0 / 3.0 AS qf,
        |               qlat * 128.0 * 2.0 / 3.0 AS rf FROM c0),
        |c2 AS (SELECT *, -qf - rf AS sf FROM c1),
        |c3 AS (SELECT *, floor(qf + 0.5) AS q0, floor(rf + 0.5) AS r0,
        |               floor(sf + 0.5) AS s0 FROM c2),
        |c4 AS (SELECT *,
        |  CASE WHEN abs(q0-qf) > abs(r0-rf) AND abs(q0-qf) > abs(s0-sf)
        |       THEN -r0-s0 ELSE q0 END AS q,
        |  CASE WHEN NOT (abs(q0-qf) > abs(r0-rf) AND abs(q0-qf) > abs(s0-sf))
        |            AND abs(r0-rf) > abs(s0-sf)
        |       THEN -q0-s0 ELSE r0 END AS r
        |  FROM c3)
        |SELECT user_id, epoch_ms(hour_ts) AS hour_ms,
        |  qlat AS avg_lat, qlon AS avg_lon,
        |  lower(lpad(to_hex((CAST(7 AS BIGINT) << 56)
        |    | ((CAST(q AS BIGINT) + 134217728) << 28)
        |    | (CAST(r AS BIGINT) + 134217728)), 15, '0')) AS h3_index,
        |  message_count
        |FROM c4 ORDER BY user_id, hour_ms""".stripMargin,

    // same lattice math as the uid_hourly_h3 twin (scale 2^2 = 4 for the
    // basin mapping), then ring-1 adjacency as a 7-value IN on the packed
    // axial delta (dq·2^28 + dr) — mirroring CoMovement.ringDeltas exactly
    "pairs_daily_ring" ->
      s"""$RingPairsCte
        |SELECT uid_a, uid_b, day_date, h_ring, g_ring, h_exact,
        |       h_ring - h_exact AS ring_only
        |FROM g ORDER BY uid_a, uid_b, day_date""".stripMargin,

    "pairs_total_ring" ->
      s"""$RingPairsCte
        |SELECT uid_a, uid_b,
        |       CAST(count(*) AS BIGINT) AS days_observed,
        |       CAST(sum(h_ring) AS BIGINT) AS h_ring_total,
        |       CAST(sum(h_exact) AS BIGINT) AS h_exact_total,
        |       CAST(sum(CASE WHEN h_ring > h_exact THEN 1 ELSE 0 END) AS BIGINT)
        |         AS boundary_days
        |FROM g GROUP BY 1, 2 ORDER BY uid_a, uid_b""".stripMargin,

    "pairs_daily" ->
      s"""$PairsCte
         |SELECT uid_a, uid_b, day_date, hA, hB, gA, gB, hT, gT,
         |       round(temporal_o, 6) AS temporal_o,
         |       round(spatial_o, 6) AS spatial_o,
         |       round(gto, 6) AS gto
         |FROM pairs_g ORDER BY uid_a, uid_b, day_date""".stripMargin,

    "pairs_total" ->
      s"""$PairsCte
         |SELECT uid_a, uid_b,
         |       CAST(count(DISTINCT day_date) AS BIGINT) AS total_days_observed,
         |       CAST(sum(CASE WHEN gto >= $GtoThreshold THEN 1 ELSE 0 END) AS BIGINT) AS days_above_threshold,
         |       round(max(gto), 6) AS max_gto,
         |       round(min(gto), 6) AS min_gto,
         |       round(avg(gto), 6) AS avg_gto,
         |       round(quantile_cont(gto, 0.5), 6) AS median_gto
         |FROM pairs_g GROUP BY 1, 2 ORDER BY uid_a, uid_b""".stripMargin,

    "track_export" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
        |FROM events
        |WHERE user_id IN (1, 2, 3, 5, 8, 13, 21, 34, 55, 89)
        |  AND ts >= TIMESTAMP '2024-01-05 00:00:00'
        |  AND ts <  TIMESTAMP '2024-01-25 00:00:00'
        |  AND value BETWEEN 0 AND 500
        |ORDER BY ts_ms, user_id, event_id""".stripMargin,

    "track_paths" ->
      """WITH pts AS (
        |  SELECT user_id, epoch_ms(ts) AS ts_ms, event_id,
        |         CAST(floor(value * 1000000.0) AS BIGINT) AS pos_u
        |  FROM events)
        |SELECT user_id, CAST(count(*) AS INTEGER) AS n_points,
        |       string_agg(ts_ms || ',' || event_id || ',' || pos_u,
        |                  '|' ORDER BY ts_ms, event_id, pos_u) AS path
        |FROM pts GROUP BY user_id HAVING count(*) > 2 ORDER BY user_id""".stripMargin,

    "top_tracks" ->
      """SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
        |FROM events GROUP BY 1 ORDER BY n_events DESC, user_id LIMIT 10""".stripMargin,

    "trip_segments" ->
      """WITH pts AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id FROM events),
        |f AS (SELECT user_id, ts_ms, event_id,
        |  CASE WHEN ts_ms - lag(ts_ms) OVER w > 2592000000 THEN 1 ELSE 0 END AS new_trip
        |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |t AS (SELECT user_id, ts_ms,
        |  CAST(sum(new_trip) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS trip_seq
        |  FROM f)
        |SELECT user_id, trip_seq, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms,
        |  CAST(count(*) AS BIGINT) AS n_points
        |FROM t GROUP BY 1, 2 ORDER BY user_id, trip_seq""".stripMargin,

    "track_colors" ->
      """SELECT user_id,
        |       '#' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 6) AS color
        |FROM (SELECT DISTINCT user_id FROM events WHERE user_id IS NOT NULL)
        |ORDER BY user_id""".stripMargin,

    // same trip construction as the trip_segments twin (6 h gap), endpoints
    // via arg_min/arg_max on ts_ms — deterministic because (user_id, ts) is
    // unique in the data (TestdataCanarySpec pins it)
    "od_flows" ->
      """WITH pts AS (SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, value FROM events),
        |f AS (SELECT user_id, ts_ms, event_id, value,
        |  CASE WHEN ts_ms - lag(ts_ms) OVER w > 21600000 THEN 1 ELSE 0 END AS new_trip
        |  FROM pts WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)),
        |t AS (SELECT user_id, value, ts_ms,
        |  CAST(sum(new_trip) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS trip_seq
        |  FROM f),
        |trips AS (SELECT user_id, trip_seq,
        |  arg_min(value, ts_ms) AS o_val, arg_max(value, ts_ms) AS d_val
        |  FROM t GROUP BY 1, 2)
        |SELECT CAST(floor(o_val / 62.5) AS BIGINT) AS origin_cell,
        |       CAST(floor(d_val / 62.5) AS BIGINT) AS dest_cell,
        |       CAST(count(*) AS BIGINT) AS trips,
        |       CAST(count(DISTINCT user_id) AS BIGINT) AS vessels
        |FROM trips GROUP BY 1, 2 ORDER BY origin_cell, dest_cell""".stripMargin,

    "props_parse" ->
      """WITH p AS (SELECT event_type,
        |    CAST(json_extract_string(props, '$.k') AS INTEGER) AS k FROM events)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM p WHERE k IS NOT NULL AND k >= 50
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "user_churn" ->
      """WITH h1 AS (SELECT DISTINCT user_id FROM events
        |  WHERE ts IS NOT NULL AND extract(day FROM ts) <= 15),
        |h2 AS (SELECT DISTINCT user_id FROM events
        |  WHERE ts IS NOT NULL AND extract(day FROM ts) > 15)
        |SELECT user_id, 'retained' AS status FROM (SELECT user_id FROM h1
        |  INTERSECT SELECT user_id FROM h2)
        |UNION ALL
        |SELECT user_id, 'churned' AS status FROM (SELECT user_id FROM h1
        |  EXCEPT SELECT user_id FROM h2)
        |ORDER BY status, user_id""".stripMargin,

    // identical op tree: exact integer sums cast to double, same
    // mean/variance expression order, round-then-abs for the flag
    "value_outliers" ->
      """WITH e AS (SELECT event_id, event_type,
        |    CAST(round(value * 10000) AS BIGINT) AS u
        |  FROM events WHERE value IS NOT NULL),
        |st AS (SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(u) AS DOUBLE) AS s1, CAST(sum(u * u) AS DOUBLE) AS s2
        |  FROM e GROUP BY 1),
        |m AS (SELECT event_type, s1 / n AS mean_u,
        |    s2 / n - (s1 / n) * (s1 / n) AS var_u FROM st),
        |z AS (SELECT e.event_id, e.event_type,
        |    round(CASE WHEN var_u > 0 THEN (u - mean_u) / sqrt(var_u) END, 6) AS z
        |  FROM e JOIN m USING (event_type))
        |SELECT event_id, event_type, z,
        |  abs(z) > CAST('1.7' AS DOUBLE) AS is_outlier
        |FROM z ORDER BY event_id""".stripMargin,

    // same composite (type|dow|hour) key — DuckDB dayofweek is Sunday=0,
    // matching Spark's dayofweek − 1 — and the same exact-unit moments
    "seasonal_outliers" ->
      """WITH e AS (SELECT event_id,
        |    event_type || '|' || CAST(dayofweek(ts) AS VARCHAR) || '|'
        |      || CAST(hour(ts) AS VARCHAR) AS skey,
        |    CAST(round(value * 10000) AS BIGINT) AS u
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |st AS (SELECT skey, CAST(count(*) AS DOUBLE) AS n,
        |    CAST(sum(u) AS DOUBLE) AS s1, CAST(sum(u * u) AS DOUBLE) AS s2
        |  FROM e GROUP BY 1),
        |m AS (SELECT skey, s1 / n AS mean_u,
        |    s2 / n - (s1 / n) * (s1 / n) AS var_u FROM st),
        |z AS (SELECT e.event_id, e.skey,
        |    round(CASE WHEN var_u > 0 THEN (u - mean_u) / sqrt(var_u) END, 6) AS z
        |  FROM e JOIN m USING (skey))
        |SELECT event_id, skey, z,
        |  abs(z) > CAST('2.5' AS DOUBLE) AS is_outlier
        |FROM z ORDER BY event_id""".stripMargin,

    // same strictly-after min-chaining per step; millisecond comparisons on
    // both sides (epoch_ms/unix_millis truncate identically)
    "funnel_steps" ->
      s"""WITH base AS (SELECT user_id AS k, epoch_ms(ts) AS ms, event_type AS t
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
         |    AND event_type IS NOT NULL),
         |s1 AS (SELECT k, CAST(min(ms) AS BIGINT) AS t_1 FROM base
         |  WHERE t = '${FunnelSteps(0)}' GROUP BY 1),
         |s2 AS (SELECT b.k, CAST(min(b.ms) AS BIGINT) AS t_2
         |  FROM base b JOIN s1 ON b.k = s1.k
         |  WHERE b.t = '${FunnelSteps(1)}' AND b.ms > s1.t_1 GROUP BY 1),
         |s3 AS (SELECT b.k, CAST(min(b.ms) AS BIGINT) AS t_3
         |  FROM base b JOIN s2 ON b.k = s2.k
         |  WHERE b.t = '${FunnelSteps(2)}' AND b.ms > s2.t_2 GROUP BY 1)
         |SELECT s1.k AS user_id, t_1, t_2, t_3,
         |  CAST(1 + CASE WHEN t_2 IS NULL THEN 0 ELSE 1 END
         |         + CASE WHEN t_3 IS NULL THEN 0 ELSE 1 END AS BIGINT)
         |    AS step_reached,
         |  CASE WHEN t_3 IS NULL THEN FALSE
         |       ELSE t_3 - t_1 <= $FunnelWindowMs END AS completed
         |FROM s1 LEFT JOIN s2 ON s1.k = s2.k LEFT JOIN s3 ON s1.k = s3.k
         |ORDER BY user_id""".stripMargin,

    "retention_matrix" ->
      s"""WITH ad AS (SELECT DISTINCT user_id AS k, date_trunc('day', ts) AS d
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |c AS (SELECT k, min(d) AS d0 FROM ad GROUP BY 1)
         |SELECT epoch_ms(d0) AS cohort_ms,
         |  CAST(date_diff('day', d0, d) // $RetentionPeriodDays AS BIGINT)
         |    AS period_offset,
         |  CAST(count(DISTINCT ad.k) AS BIGINT) AS n_active
         |FROM ad JOIN c ON ad.k = c.k
         |GROUP BY 1, 2 ORDER BY cohort_ms, period_offset""".stripMargin,

    "event_transitions" ->
      """WITH e AS (SELECT event_type AS from_type,
        |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS to_type
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND event_type IS NOT NULL)
        |SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n_transitions
        |FROM e WHERE to_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY from_type, to_type""".stripMargin,

    // identical per-term double chain, rounded to micro-units BEFORE the
    // sum; age clamped at 0 (full weight for post-refDate events — the
    // unclamped exponent overflowed BIGINT on the 10x span corpus)
    "value_decayed" ->
      s"""SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
         |  round(CAST(sum(CAST(round(value * pow(2.0,
         |      -CAST(greatest(datediff('day', CAST(ts AS DATE),
         |        DATE '$DecayRef'), 0)
         |        AS DOUBLE) / $DecayHalfLife) * 1000000.0) AS BIGINT))
         |    AS DOUBLE) / 1000000.0, 6) AS decayed_value
         |FROM events
         |WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL
         |GROUP BY 1 ORDER BY user_id""".stripMargin,

    "user_growth" ->
      """WITH b AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |dau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
        |  FROM b GROUP BY 1),
        |nu AS (SELECT day, CAST(count(*) AS BIGINT) AS new_users
        |  FROM (SELECT user_id, min(day) AS day FROM b GROUP BY 1) GROUP BY 1)
        |SELECT dau.day, dau.dau, coalesce(nu.new_users, 0) AS new_users,
        |  CAST(sum(coalesce(nu.new_users, 0)) OVER (ORDER BY dau.day) AS BIGINT)
        |    AS cum_users
        |FROM dau LEFT JOIN nu USING (day) ORDER BY day""".stripMargin,

    "skew_report" ->
      """WITH cu AS (SELECT count(*) AS n FROM events GROUP BY user_id),
        |ce AS (SELECT count(*) AS n FROM events GROUP BY event_type),
        |r AS (
        |  SELECT 'user_id' AS key_set, CAST(sum(n) AS BIGINT) AS n_rows,
        |    CAST(count(*) AS BIGINT) AS n_keys,
        |    CAST(max(n) AS BIGINT) AS max_key_rows,
        |    round(avg(n), 6) AS avg_key_rows,
        |    round(quantile_cont(n, 0.5), 6) AS p50_key_rows,
        |    round(quantile_cont(n, 0.99), 6) AS p99_key_rows
        |  FROM cu
        |  UNION ALL
        |  SELECT 'event_type', CAST(sum(n) AS BIGINT), CAST(count(*) AS BIGINT),
        |    CAST(max(n) AS BIGINT), round(avg(n), 6),
        |    round(quantile_cont(n, 0.5), 6), round(quantile_cont(n, 0.99), 6)
        |  FROM ce)
        |SELECT key_set, n_rows, n_keys, max_key_rows, avg_key_rows,
        |  p50_key_rows, p99_key_rows,
        |  CAST(round(max_key_rows * 1000000.0 / n_rows) AS BIGINT)
        |    AS top_share_ppm,
        |  round(max_key_rows / p50_key_rows, 6) AS skew_ratio
        |FROM r ORDER BY key_set""".stripMargin,

    // identical bin pivot (conditional counts to fixed columns) and the same
    // bin-order smoothed (p−q)·ln(p/q) chain; ln ulp absorbed by round(,6)
    "drift_psi" -> {
      val bins = 0 until HistBins
      def cnts(prefix: String) = bins.map(i =>
        s"CAST(count(CASE WHEN b = $i THEN 1 END) AS BIGINT) AS $prefix$i")
        .mkString(",\n    ")
      val nSum = bins.map(i => s"c_$i").mkString(" + ")
      val rnSum = bins.map(i => s"r_$i").mkString(" + ")
      val bDenom = s"CAST('${HistBins.toDouble}' AS DOUBLE)"
      val chain = bins.map { i =>
        val p = s"((c_$i + 1.0) / (n + $bDenom))"
        val q = s"((r_$i + 1.0) / (rn + $bDenom))"
        s"($p - $q) * ln($p / $q)"
      }.mkString("\n  + ")
      s"""WITH e AS (SELECT epoch_ms(date_trunc('day', ts)) AS day_ms,
         |    least(${HistBins - 1}, greatest(0,
         |      CAST(floor((value - $HistLo) / ${(HistHi - HistLo) / HistBins})
         |           AS BIGINT))) AS b
         |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
         |p AS (SELECT day_ms,
         |    ${cnts("c_")}
         |  FROM e GROUP BY 1),
         |p2 AS (SELECT *, $nSum AS n FROM p),
         |r AS (SELECT
         |    ${cnts("r_")}
         |  FROM e),
         |r2 AS (SELECT *, $rnSum AS rn FROM r)
         |SELECT day_ms, CAST(n AS BIGINT) AS n_rows,
         |  round($chain, 6) AS psi
         |FROM p2, r2 ORDER BY day_ms""".stripMargin
    },

    // identical doubled-unit MAD: |2u − 2·median| is an exact BIGINT, so both
    // percentile passes interpolate exact integer inputs; identical closing
    // float chain (u − med) / (1.4826 · (mad2 / 2))
    // same exact moments; unit factors are 1 so the float steps reduce to
    // num/denx and (sy − slope·sx)/n over identically-agreed operands
    "volume_trend" ->
      """WITH dl AS (SELECT event_type, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS y
        |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
        |e AS (SELECT event_type,
        |    CAST(day - DATE '1970-01-01' AS BIGINT) AS x, y FROM dl),
        |a AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x * x) AS HUGEINT) AS sxx,
        |    CAST(sum(x * y) AS HUGEINT) AS sxy
        |  FROM e GROUP BY 1),
        |c AS (SELECT event_type, n, n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS denx, sx, sy FROM a)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CASE WHEN denx > 0
        |    THEN round(CAST(num AS DOUBLE) / CAST(denx AS DOUBLE), 6)
        |  END AS slope,
        |  CASE WHEN denx > 0
        |    THEN round((CAST(sy AS DOUBLE)
        |      - CAST(num AS DOUBLE) / CAST(denx AS DOUBLE) * CAST(sx AS DOUBLE))
        |      / CAST(n AS DOUBLE), 6)
        |  END AS intercept
        |FROM c ORDER BY event_type""".stripMargin,

    // same exact integer moments (DuckDB sums BIGINT into HUGEINT); floats
    // appear only in the num / (sqrt · sqrt) projection over agreed operands
    "value_corr" ->
      """WITH e AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS x,
        |    CAST(round(value * 1000000) AS BIGINT) AS y
        |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL),
        |a AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
        |    CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
        |    CAST(sum(x * x) AS HUGEINT) AS sxx,
        |    CAST(sum(y * y) AS HUGEINT) AS syy,
        |    CAST(sum(x * y) AS HUGEINT) AS sxy
        |  FROM e GROUP BY 1),
        |c AS (SELECT event_type, n, n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS denx, n * syy - sy * sy AS deny FROM a)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CASE WHEN denx > 0 AND deny > 0
        |    THEN round(CAST(num AS DOUBLE)
        |      / (sqrt(CAST(denx AS DOUBLE)) * sqrt(CAST(deny AS DOUBLE))), 6)
        |  END AS corr
        |FROM c ORDER BY event_type""".stripMargin,

    "value_outliers_robust" ->
      s"""WITH e AS (SELECT event_id, event_type,
         |    CAST(round(value * 100) AS BIGINT) AS u
         |  FROM events WHERE value IS NOT NULL),
         |med AS (SELECT event_type, quantile_cont(u, 0.5) AS med
         |  FROM e GROUP BY 1),
         |dev AS (SELECT e.event_type,
         |    quantile_cont(abs(2 * u - CAST(2.0 * med AS BIGINT)), 0.5) AS mad2
         |  FROM e JOIN med USING (event_type) GROUP BY 1),
         |z AS (SELECT e.event_id, e.event_type,
         |    round(CAST(u AS DOUBLE) / 100, 6) AS value_r,
         |    CASE WHEN mad2 > 0 THEN (CAST(u AS DOUBLE) - med)
         |         / (1.4826 * (mad2 / 2.0)) END AS rz
         |  FROM e JOIN med USING (event_type) JOIN dev USING (event_type))
         |SELECT event_id, event_type, value_r, round(rz, 6) AS robust_z,
         |  abs(rz) > CAST('$RobustZThresh' AS DOUBLE) AS is_outlier
         |FROM z ORDER BY event_id""".stripMargin,

    // ROLLUP grouping-set parity: gid = GROUPING(day)*2 + GROUPING(type)
    // matches Spark's grouping_id bit order (first col = MSB); value summed
    // in exact 1e-4 integer units (the q1 pattern)
    "events_rollup" ->
      """WITH e AS (SELECT CAST(ts AS DATE) AS day_date, event_type,
        |    CAST(round(value * 10000) AS BIGINT) AS v4 FROM events
        |  WHERE ts IS NOT NULL)
        |SELECT day_date, event_type,
        |  CAST(GROUPING(day_date) * 2 + GROUPING(event_type) AS INTEGER) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(CAST(sum(v4) AS DOUBLE) / 10000.0, 4) AS sum_value
        |FROM e GROUP BY ROLLUP (day_date, event_type)
        |ORDER BY gid, day_date, event_type""".stripMargin,

    "events_pivot" ->
      """SELECT CAST(ts AS DATE) AS day_date,
        |  CAST(count(*) FILTER (event_type = 'click') AS BIGINT) AS click,
        |  CAST(count(*) FILTER (event_type = 'error') AS BIGINT) AS error,
        |  CAST(count(*) FILTER (event_type = 'purchase') AS BIGINT) AS purchase,
        |  CAST(count(*) FILTER (event_type = 'signup') AS BIGINT) AS signup,
        |  CAST(count(*) FILTER (event_type = 'view') AS BIGINT) AS view
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1 ORDER BY day_date""".stripMargin,

    "window_dedup" ->
      """WITH r AS (
        |  SELECT user_id, epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_id, value,
        |         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, hour_ms, event_id, value FROM r WHERE rn = 1
        |ORDER BY user_id, hour_ms""".stripMargin,

    "q1_agg" ->
      """WITH c AS (SELECT l_returnflag, l_linestatus, l_quantity, l_discount,
        |  CAST(round(l_quantity * 100) AS BIGINT) AS qc,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |  CAST(round(l_discount * 100) AS BIGINT) AS dbp
        |FROM lineitem)
        |SELECT l_returnflag, l_linestatus,
        |       round(CAST(sum(qc) AS DOUBLE) / 100.0, 2) AS sum_qty,
        |       round(CAST(sum(cents) AS DOUBLE) / 100.0, 2) AS sum_base_price,
        |       round(CAST(sum(cents * (100 - dbp)) AS DOUBLE) / 10000.0, 4) AS sum_disc_price,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM c GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "brand_volume" ->
      """SELECT p.p_brand,
        |  CAST(count(*) AS BIGINT) AS n_items,
        |  round(CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS sum_qty,
        |  round(CAST(sum(CAST(round(l.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0, 2) AS revenue
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY 1 ORDER BY p_brand""".stripMargin,

    "q3_topk" ->
      """SELECT l_orderkey,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
        |    / 10000.0, 4) AS revenue,
        |  epoch_ms(o_orderdate) AS order_ms, o_orderpriority
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-07-01'
        |  AND l_shipdate > TIMESTAMP '1998-07-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_region" ->
      """SELECT n_name,
        |  round(CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE)
        |    / 10000.0, 4) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31'
        |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "cust_inactive" ->
      """SELECT c_mktsegment,
        |  CAST(count(*) AS BIGINT) AS n_customers,
        |  round(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
        |    / 100.0, 2) AS total_acctbal
        |FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |  WHERE o.o_custkey = c.c_custkey
        |    AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
  ) ++ aisExtraOracle ++ textOracle ++ embedOracle

  private def aisExtraOracle: Map[String, String] = Map(
    "silver_clean" ->
      """WITH messy AS (SELECT event_id,
        |  CASE WHEN event_id % 37 = 0 THEN NULL
        |       ELSE CAST(user_id AS VARCHAR) END AS mmsi_raw,
        |  CASE WHEN event_id % 3 = 0 THEN strftime(ts, '%Y-%m-%d %H:%M:%S')
        |       WHEN event_id % 3 = 1 THEN strftime(ts, '%Y-%m-%dT%H:%M:%S')
        |       ELSE strftime(ts, '%Y-%m-%dT%H:%M:%S') || 'Z' END AS s
        |FROM events),
        |c AS (SELECT event_id, mmsi_raw AS mmsi,
        |  coalesce(try_strptime(s, '%Y-%m-%d %H:%M:%S'),
        |           try_strptime(s, '%Y-%m-%dT%H:%M:%S'),
        |           try_strptime(s, '%Y-%m-%dT%H:%M:%SZ')) AS event_ts
        |FROM messy WHERE mmsi_raw IS NOT NULL)
        |SELECT event_id, mmsi, epoch_ms(event_ts) AS ts_ms,
        |  CAST(year(event_ts) AS INTEGER) AS year,
        |  CAST(month(event_ts) AS INTEGER) AS month,
        |  CAST(day(event_ts) AS INTEGER) AS day,
        |  CAST(('0x' || substr(sha256(mmsi), 1, 16))::UBIGINT % 96 AS BIGINT) AS bucket_id
        |FROM c WHERE event_ts IS NOT NULL ORDER BY event_id""".stripMargin,

    "reconciliation" ->
      s"""$HourlyCte,
         |g AS (SELECT CAST(count(*) AS BIGINT) AS grc,
         |       CAST(coalesce(sum(message_count), 0) AS BIGINT) AS smc FROM hourly),
         |sv AS (SELECT CAST(count(*) AS BIGINT) AS sfc FROM events
         |       WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value BETWEEN 0 AND 500)
         |SELECT 'delta_messages' AS "check", smc - sfc AS value FROM g, sv
         |UNION ALL SELECT 'gold_row_count', grc FROM g, sv
         |UNION ALL SELECT 'silver_filtered_count', sfc FROM g, sv
         |UNION ALL SELECT 'sum_message_count', smc FROM g, sv
         |ORDER BY "check"""".stripMargin,

    // mirrors DataQuality.audit: one aggregate scan computing every rule's
    // violation sum + exemplar min, then per-rule rows; NULL predicate = fail
    "dq_audit" ->
      """WITH t AS (SELECT
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(sum(CASE WHEN coalesce(user_id IS NOT NULL, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v0,
        |  CAST(min(CASE WHEN NOT coalesce(user_id IS NOT NULL, FALSE) THEN event_id END) AS BIGINT) AS k0,
        |  CAST(sum(CASE WHEN coalesce(ts IS NOT NULL, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v1,
        |  CAST(min(CASE WHEN NOT coalesce(ts IS NOT NULL, FALSE) THEN event_id END) AS BIGINT) AS k1,
        |  CAST(sum(CASE WHEN coalesce(value BETWEEN 0 AND 500, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v2,
        |  CAST(min(CASE WHEN NOT coalesce(value BETWEEN 0 AND 500, FALSE) THEN event_id END) AS BIGINT) AS k2,
        |  CAST(sum(CASE WHEN coalesce(value < 100, FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v3,
        |  CAST(min(CASE WHEN NOT coalesce(value < 100, FALSE) THEN event_id END) AS BIGINT) AS k3,
        |  CAST(sum(CASE WHEN coalesce(event_type <> 'error', FALSE) THEN 0 ELSE 1 END) AS BIGINT) AS v4,
        |  CAST(min(CASE WHEN NOT coalesce(event_type <> 'error', FALSE) THEN event_id END) AS BIGINT) AS k4
        |FROM events)
        |SELECT * FROM (
        |  SELECT 'user_id_not_null' AS rule, n_rows, v0 AS n_violations,
        |    round(CAST(v0 AS DOUBLE) / n_rows, 6) AS violation_rate, k0 AS first_bad_id FROM t
        |  UNION ALL SELECT 'ts_not_null', n_rows, v1,
        |    round(CAST(v1 AS DOUBLE) / n_rows, 6), k1 FROM t
        |  UNION ALL SELECT 'value_in_range', n_rows, v2,
        |    round(CAST(v2 AS DOUBLE) / n_rows, 6), k2 FROM t
        |  UNION ALL SELECT 'value_under_100', n_rows, v3,
        |    round(CAST(v3 AS DOUBLE) / n_rows, 6), k3 FROM t
        |  UNION ALL SELECT 'no_error_events', n_rows, v4,
        |    round(CAST(v4 AS DOUBLE) / n_rows, 6), k4 FROM t)
        |ORDER BY rule""".stripMargin,

    "pair_quantiles" ->
      s"""$PairsCte
         |SELECT round(quantile_cont(gto, 0.5), 6) AS p50,
         |       round(quantile_cont(gto, 0.75), 6) AS p75,
         |       round(quantile_cont(gto, 0.9), 6) AS p90,
         |       round(quantile_cont(gto, 0.95), 6) AS p95,
         |       round(quantile_cont(gto, 0.99), 6) AS p99
         |FROM pairs_g""".stripMargin,

    "days_seen_hist" ->
      s"""$PairsCte,
         |ds AS (SELECT uid_a, uid_b, CAST(count(DISTINCT day_date) AS BIGINT) AS days_seen
         |       FROM pairs_g GROUP BY 1, 2)
         |SELECT days_seen, CAST(count(*) AS BIGINT) AS n_pairs
         |FROM ds GROUP BY 1 ORDER BY days_seen""".stripMargin,

    "pairs_total_ext" ->
      s"""$PairsCte,
         |pg AS (SELECT *, CAST(0.5 AS DOUBLE) *
         |    (CAST(hT AS DOUBLE) / (hA + hB - hT) +
         |     CAST(gT AS DOUBLE) / (gA + gB - gT)) AS gtj FROM pairs_g)
         |SELECT uid_a, uid_b,
         |  CAST(count(DISTINCT day_date) AS BIGINT) AS days_seen,
         |  CAST(sum(CASE WHEN gto >= 0.75 THEN 1 ELSE 0 END) AS BIGINT) AS days_gto_075,
         |  round(avg(gto), 6) AS avg_gto,
         |  round(avg(gtj), 6) AS avg_gtj,
         |  round(avg(hT), 6) AS avg_ht,
         |  round(quantile_cont(hT, 0.5), 6) AS median_ht,
         |  round(avg(gT), 6) AS avg_gt,
         |  round(quantile_cont(gT, 0.5), 6) AS median_gt
         |FROM pg GROUP BY 1, 2 ORDER BY uid_a, uid_b""".stripMargin,

    // mirrors Graph.pageRankMicro exactly: 3 unrolled iterations, all-bigint
    // arithmetic (`//` in DuckDB ≡ `div` in Spark on non-negative bigints),
    // so the rank at every step is the identical integer in both engines
    "pair_pagerank" ->
      s"""$PairsCte,
         |pe AS (SELECT DISTINCT uid_a, uid_b FROM pairs_g),
         |ed AS (SELECT uid_a AS src, uid_b AS dst FROM pe
         |       UNION SELECT uid_b, uid_a FROM pe),
         |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
         |        FROM ed GROUP BY 1),
         |np AS (SELECT CAST(count(*) AS BIGINT) AS n FROM deg),
         |r0 AS (SELECT id, deg, 1000000 // (SELECT n FROM np) AS r FROM deg),
         |s1 AS (SELECT e.dst AS id, CAST(sum(p.r // p.deg) AS BIGINT) AS m
         |       FROM ed e JOIN r0 p ON p.id = e.src GROUP BY 1),
         |r1 AS (SELECT d.id, d.deg, 150000 // (SELECT n FROM np)
         |         + CAST((17 * coalesce(s1.m, 0)) // 20 AS BIGINT) AS r
         |       FROM deg d LEFT JOIN s1 ON s1.id = d.id),
         |s2 AS (SELECT e.dst AS id, CAST(sum(p.r // p.deg) AS BIGINT) AS m
         |       FROM ed e JOIN r1 p ON p.id = e.src GROUP BY 1),
         |r2 AS (SELECT d.id, d.deg, 150000 // (SELECT n FROM np)
         |         + CAST((17 * coalesce(s2.m, 0)) // 20 AS BIGINT) AS r
         |       FROM deg d LEFT JOIN s2 ON s2.id = d.id),
         |s3 AS (SELECT e.dst AS id, CAST(sum(p.r // p.deg) AS BIGINT) AS m
         |       FROM ed e JOIN r2 p ON p.id = e.src GROUP BY 1),
         |r3 AS (SELECT d.id, d.deg, 150000 // (SELECT n FROM np)
         |         + CAST((17 * coalesce(s3.m, 0)) // 20 AS BIGINT) AS r
         |       FROM deg d LEFT JOIN s3 ON s3.id = d.id)
         |SELECT id AS user_id, deg, CAST(r AS BIGINT) AS rank_micro
         |FROM r3 ORDER BY user_id""".stripMargin,

    // mirrors Graph.seedDistance: seeds = top-2 hubs by (deg DESC, id ASC),
    // then three unrolled delta-frontier hops — each level is the nodes NOT
    // yet settled that touch the previous frontier, so a node appears once,
    // at its minimal hop (identical to the Spark anti-join chain)
    "seed_distance" ->
      s"""$PairsCte,
         |pe AS (SELECT DISTINCT uid_a, uid_b FROM pairs_g),
         |ed AS (SELECT uid_a AS src, uid_b AS dst FROM pe
         |       UNION SELECT uid_b, uid_a FROM pe),
         |deg AS (SELECT src AS id, count(*) AS deg FROM ed GROUP BY 1),
         |sd AS (SELECT id FROM deg ORDER BY deg DESC, id LIMIT 2),
         |v0 AS (SELECT id, 0 AS hops FROM sd),
         |n1 AS (SELECT DISTINCT e.dst AS id FROM ed e JOIN sd f ON f.id = e.src
         |       WHERE e.dst NOT IN (SELECT id FROM v0)),
         |v1 AS (SELECT * FROM v0 UNION ALL SELECT id, 1 FROM n1),
         |n2 AS (SELECT DISTINCT e.dst AS id FROM ed e JOIN n1 f ON f.id = e.src
         |       WHERE e.dst NOT IN (SELECT id FROM v1)),
         |v2 AS (SELECT * FROM v1 UNION ALL SELECT id, 2 FROM n2),
         |n3 AS (SELECT DISTINCT e.dst AS id FROM ed e JOIN n2 f ON f.id = e.src
         |       WHERE e.dst NOT IN (SELECT id FROM v2)),
         |v3 AS (SELECT * FROM v2 UNION ALL SELECT id, 3 FROM n3)
         |SELECT id AS user_id, hops FROM v3 ORDER BY user_id""".stripMargin,

    // mirrors Graph.triangleCounts: orient each edge low->high by (deg, id),
    // wedge among rank-ordered out-neighbor pairs, close against the
    // oriented edge — each triangle materializes once, at its lowest vertex
    "triangle_counts" ->
      s"""$PairsCte,
         |pe AS (SELECT DISTINCT uid_a, uid_b FROM pairs_g),
         |ed AS (SELECT uid_a AS src, uid_b AS dst FROM pe
         |       UNION SELECT uid_b, uid_a FROM pe),
         |deg AS (SELECT src AS id, count(*) AS deg FROM ed GROUP BY 1),
         |ore AS (SELECT e.src AS u, e.dst AS v, db.deg AS vd
         |        FROM ed e
         |        JOIN deg da ON da.id = e.src
         |        JOIN deg db ON db.id = e.dst
         |        WHERE da.deg < db.deg
         |           OR (da.deg = db.deg AND e.src < e.dst)),
         |wed AS (SELECT a.u, a.v, b.v AS w
         |        FROM ore a JOIN ore b ON a.u = b.u
         |        WHERE a.vd < b.vd OR (a.vd = b.vd AND a.v < b.v)),
         |tri AS (SELECT t.u, t.v, t.w
         |        FROM wed t JOIN ore c ON c.u = t.v AND c.v = t.w),
         |ids AS (SELECT u AS id FROM tri
         |        UNION ALL SELECT v FROM tri
         |        UNION ALL SELECT w FROM tri)
         |SELECT id AS user_id, count(*) AS triangles
         |FROM ids GROUP BY 1 ORDER BY user_id""".stripMargin,

    // mirrors TextOps.winnowedFingerprints: same rolling-hash chain as
    // fp_overlap, then the window-minimum comprehension; the selected SET
    // is tie-rule-independent (equal minima share the value), which is
    // what makes this list-comprehension twin exact
    "fp_winnow" ->
      s"""WITH hl AS (SELECT doc_id,
         |    [list_reduce(
         |        list_prepend(0::HUGEINT,
         |          [ascii(substr(text, i, 1))::HUGEINT for i in range(j, j + $FpK)]),
         |        (acc, b) -> (acc * 257 + b) % 2147483647)
         |     for j in range(1, len(text) - $FpK + 2)] AS hs
         |  FROM documents),
         |sel AS (SELECT doc_id,
         |    CASE WHEN len(hs) >= 8 THEN
         |      list_distinct([list_min(hs[j:j+7]) for j in range(1, len(hs) - 6)])
         |    WHEN len(hs) > 0 THEN [list_min(hs)]
         |    ELSE [] END AS sf
         |  FROM hl)
         |SELECT doc_id, CAST(unnest(sf) AS BIGINT) AS h
         |FROM sel ORDER BY doc_id, h""".stripMargin,

    // mirrors Graph.commonNeighborPairs: capped id-first neighbor lists,
    // wedges among id-ordered pairs, adjacency anti-join, true-degree
    // Jaccard — cap arithmetic identical (row_number over dst order)
    "shadow_pairs" ->
      s"""$PairsCte,
         |pe AS (SELECT DISTINCT uid_a, uid_b FROM pairs_g),
         |ed AS (SELECT uid_a AS src, uid_b AS dst FROM pe
         |       UNION SELECT uid_b, uid_a FROM pe),
         |deg AS (SELECT src AS id, count(*) AS deg FROM ed GROUP BY 1),
         |nbc AS (SELECT src, dst FROM (
         |          SELECT src, dst,
         |            row_number() OVER (PARTITION BY src ORDER BY dst) AS rn
         |          FROM ed) WHERE rn <= 1000),
         |wed AS (SELECT a.dst AS v, b.dst AS w
         |        FROM nbc a JOIN nbc b ON a.src = b.src
         |        WHERE a.dst < b.dst),
         |cmn AS (SELECT v, w, count(*) AS common FROM wed
         |        GROUP BY 1, 2 HAVING count(*) >= 2),
         |non AS (SELECT c.v, c.w, c.common FROM cmn c
         |        LEFT JOIN ed e ON e.src = c.v AND e.dst = c.w
         |        WHERE e.src IS NULL),
         |cl AS (SELECT id FROM deg WHERE deg > 1000),
         |fl AS (SELECT DISTINCT e.src AS id FROM ed e
         |       JOIN cl ON cl.id = e.dst)
         |SELECT n.v AS uid_a, n.w AS uid_b, n.common,
         |  round(n.common * 1.0 / (da.deg + db.deg - n.common), 6) AS jaccard,
         |  (fv.id IS NOT NULL OR fw.id IS NOT NULL) AS clipped
         |FROM non n
         |JOIN deg da ON da.id = n.v
         |JOIN deg db ON db.id = n.w
         |LEFT JOIN fl fv ON fv.id = n.v
         |LEFT JOIN fl fw ON fw.id = n.w
         |ORDER BY uid_a, uid_b""".stripMargin,

    // mirrors CoMovement.pairsDecayed: corpus-max reference day, integer
    // floor-div ages, power-of-two truncating decay — non-negative
    // operands so DuckDB's floor // equals the engine's truncating div
    "decayed_pairs" ->
      s"""$PairsCte,
         |rf AS (SELECT max(day_date) AS ref FROM pairs_g)
         |SELECT uid_a, uid_b,
         |  CAST(sum(hT // (1::BIGINT << least(
         |    CAST(date_diff('day', day_date, (SELECT ref FROM rf)) AS BIGINT) // 7,
         |    62))) AS BIGINT) AS decayed_hours,
         |  CAST(sum(hT) AS BIGINT) AS total_hours,
         |  epoch_ms(CAST(max(day_date) AS TIMESTAMP)) AS last_day_ms
         |FROM pairs_g GROUP BY 1, 2
         |ORDER BY uid_a, uid_b""".stripMargin,

    // mirrors pair_components via DuckDB's recursive reachability closure:
    // reach(id, r) holds every (node, reachable node) pair, min(r) is the
    // same canonical min-label the engine's propagation converges to —
    // no unrolled rounds to keep in sync
    "pair_components" ->
      s"""${PairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pe AS (SELECT DISTINCT uid_a, uid_b FROM pairs_g),
         |sym AS (SELECT uid_a AS id, uid_b AS nbr FROM pe
         |        UNION SELECT uid_b, uid_a FROM pe),
         |reach(id, r) AS (
         |  SELECT DISTINCT id, id FROM sym
         |  UNION
         |  SELECT s.id, reach.r FROM sym s JOIN reach ON s.nbr = reach.id),
         |lab AS (SELECT id, min(r) AS cluster FROM reach GROUP BY 1),
         |cs AS (SELECT cluster, CAST(count(*) AS BIGINT) AS comp_size
         |       FROM lab GROUP BY 1)
         |SELECT l.id AS user_id, l.cluster, cs.comp_size,
         |  (l.id = l.cluster) AS is_canonical
         |FROM lab l JOIN cs USING (cluster)
         |ORDER BY user_id""".stripMargin,

    // mirrors Graph.weightedPageRankMicro: summed-hT edge weights, three
    // unrolled all-bigint iterations with per-edge truncating division
    // (r*w)//wout — bit-identical at every step; non-negative operands so
    // DuckDB's floor // equals the engine's truncating div
    "weighted_pagerank" -> {
      def iter(i: Int): String =
        s"""ws$i AS (SELECT e.dst AS id,
           |  CAST(sum((p.r * e.w) // p.wout) AS BIGINT) AS m
           |  FROM wed e JOIN wr${i - 1} p ON p.id = e.src GROUP BY 1),
           |wr$i AS (SELECT w.id, w.wout, 150000 // (SELECT n FROM wnp)
           |  + CAST((17 * coalesce(ws$i.m, 0)) // 20 AS BIGINT) AS r
           |  FROM wo w LEFT JOIN ws$i ON ws$i.id = w.id)""".stripMargin
      s"""$PairsCte,
         |pw AS (SELECT uid_a, uid_b, CAST(sum(hT) AS BIGINT) AS w
         |       FROM pairs_g GROUP BY 1, 2),
         |wed AS (SELECT src, dst, CAST(sum(w) AS BIGINT) AS w FROM (
         |       SELECT uid_a AS src, uid_b AS dst, w FROM pw
         |       UNION ALL SELECT uid_b, uid_a, w FROM pw) GROUP BY 1, 2),
         |wo AS (SELECT src AS id, CAST(sum(w) AS BIGINT) AS wout
         |       FROM wed GROUP BY 1),
         |wnp AS (SELECT CAST(count(*) AS BIGINT) AS n FROM wo),
         |wr0 AS (SELECT id, wout, 1000000 // (SELECT n FROM wnp) AS r FROM wo),
         |${iter(1)},
         |${iter(2)},
         |${iter(3)}
         |SELECT id AS user_id, wout AS w_total, CAST(r AS BIGINT) AS rank_micro
         |FROM wr3 ORDER BY user_id""".stripMargin
    },

    // mirrors Graph.kCore via a CONVERGENCE-FREE recursive peel — no
    // unrolled round count to keep in sync with the engine's drained loop
    // (the pair_components precedent, adapted to a SHRINKING fixpoint,
    // which a recursive CTE can't express directly because UNION dedup
    // would empty the working table after one generation): each recursive
    // iteration's working table is one whole alive-set GENERATION tagged
    // with its size n, plus a NULL-id sentinel row carrying n even when
    // the survivor set is empty. Survivors are emitted only while the
    // count still FALLS, so the recursion halts exactly at the fixpoint
    // (peeling strictly shrinks: count equality ⟺ set equality) and the
    // k-core is the generation with the minimal sentinel n — including
    // the empty-core case, where the last sentinel is 0 and no id rows
    // carry it.
    "k_core" ->
      s"""${PairsCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |pe AS (SELECT DISTINCT uid_a, uid_b FROM pairs_g),
         |ed AS MATERIALIZED (SELECT uid_a AS src, uid_b AS dst FROM pe
         |       UNION SELECT uid_b, uid_a FROM pe),
         |alive(id, n) AS (
         |  SELECT src, (SELECT count(DISTINCT src) FROM ed) FROM ed
         |  UNION
         |  SELECT NULL, (SELECT count(DISTINCT src) FROM ed)
         |  UNION ALL
         |  (WITH w AS (SELECT * FROM alive),
         |   s AS (SELECT e.src AS id FROM ed e
         |         JOIN w a ON e.src = a.id
         |         JOIN w b ON e.dst = b.id
         |         GROUP BY 1 HAVING count(*) >= 2),
         |   c AS (SELECT count(*) AS m FROM s)
         |   SELECT s.id, c.m FROM s, c WHERE c.m < (SELECT min(n) FROM w)
         |   UNION ALL
         |   SELECT NULL, c.m FROM c
         |   WHERE c.m < (SELECT min(w.n) FROM w))),
         |core AS (SELECT id FROM alive
         |  WHERE n = (SELECT min(n) FROM alive WHERE id IS NULL)
         |    AND id IS NOT NULL),
         |kdf AS (SELECT e.src AS id, count(*) AS c FROM ed e
         |  JOIN core s ON e.src = s.id JOIN core t ON e.dst = t.id GROUP BY 1)
         |SELECT id AS user_id, CAST(c AS BIGINT) AS deg_core
         |FROM kdf ORDER BY user_id""".stripMargin,

    // mirrors Graph.personalizedPageRankFromHubs: top-2 hub seeds, init
    // 1e6//|S| on seeds else 0, teleport base 150000//|S| on seeds else 0,
    // three unrolled all-bigint iterations — bit-identical at every step
    "seed_pagerank" ->
      s"""$PairsCte,
         |pe AS (SELECT DISTINCT uid_a, uid_b FROM pairs_g),
         |ed AS (SELECT uid_a AS src, uid_b AS dst FROM pe
         |       UNION SELECT uid_b, uid_a FROM pe),
         |deg AS (SELECT src AS id, CAST(count(*) AS BIGINT) AS deg
         |        FROM ed GROUP BY 1),
         |sd AS (SELECT id FROM deg ORDER BY deg DESC, id LIMIT 2),
         |ns AS (SELECT CAST(count(*) AS BIGINT) AS n FROM sd),
         |r0 AS (SELECT d.id, d.deg,
         |         CASE WHEN s.id IS NOT NULL
         |              THEN 1000000 // (SELECT n FROM ns) ELSE 0 END AS r,
         |         CASE WHEN s.id IS NOT NULL
         |              THEN 150000 // (SELECT n FROM ns) ELSE 0 END AS b
         |       FROM deg d LEFT JOIN sd s ON s.id = d.id),
         |s1 AS (SELECT e.dst AS id, CAST(sum(p.r // p.deg) AS BIGINT) AS m
         |       FROM ed e JOIN r0 p ON p.id = e.src GROUP BY 1),
         |r1 AS (SELECT d.id, d.deg, d.b,
         |         d.b + CAST((17 * coalesce(s1.m, 0)) // 20 AS BIGINT) AS r
         |       FROM r0 d LEFT JOIN s1 ON s1.id = d.id),
         |s2 AS (SELECT e.dst AS id, CAST(sum(p.r // p.deg) AS BIGINT) AS m
         |       FROM ed e JOIN r1 p ON p.id = e.src GROUP BY 1),
         |r2 AS (SELECT d.id, d.deg, d.b,
         |         d.b + CAST((17 * coalesce(s2.m, 0)) // 20 AS BIGINT) AS r
         |       FROM r1 d LEFT JOIN s2 ON s2.id = d.id),
         |s3 AS (SELECT e.dst AS id, CAST(sum(p.r // p.deg) AS BIGINT) AS m
         |       FROM ed e JOIN r2 p ON p.id = e.src GROUP BY 1),
         |r3 AS (SELECT d.id, d.deg, d.b,
         |         d.b + CAST((17 * coalesce(s3.m, 0)) // 20 AS BIGINT) AS r
         |       FROM r2 d LEFT JOIN s3 ON s3.id = d.id)
         |SELECT id AS user_id, deg, CAST(r AS BIGINT) AS ppr_micro
         |FROM r3 ORDER BY user_id""".stripMargin,

    // mirrors DataQuality.kAnonymityAudit + the per-type summary
    "k_anon_audit" ->
      """WITH g AS (
        |  SELECT event_type, CAST(ts AS DATE) AS dt,
        |         CAST(count(DISTINCT user_id) AS BIGINT) AS group_size
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_combos,
        |  CAST(sum(CASE WHEN group_size < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS risky_combos,
        |  min(group_size) AS min_group
        |FROM g GROUP BY 1 ORDER BY event_type""".stripMargin,

    // mirrors DataQuality.lDiversityAudit: distinct-first, then the two
    // count-distincts per combo; risky repeats the expression (SQL can't
    // read its own alias), floor band math identical IEEE doubles
    "l_diversity" ->
      """WITH dd AS (
        |  SELECT DISTINCT c_nationkey, c_mktsegment, c_custkey,
        |         CAST(FLOOR(c_acctbal / 2000.0) AS BIGINT) AS bal_band
        |  FROM customer)
        |SELECT c_nationkey, c_mktsegment,
        |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS group_size,
        |  CAST(count(DISTINCT bal_band) AS BIGINT) AS l_distinct,
        |  count(DISTINCT bal_band) < 3 AS risky
        |FROM dd GROUP BY 1, 2
        |ORDER BY c_nationkey, c_mktsegment""".stripMargin,

    // mirrors Tracks.geofenceHits: same literal zones, half-open bounds
    // mirrors Tracks.resample: same union-of-points-and-ticks window, same
    // (t, kind, value) ordering — kind so coincident ticks take the
    // observation, value so duplicate same-millisecond observations fold
    // deterministically — same interpolation shape and operation order
    // (ulp-identical), 6dp round
    "track_resample" ->
      """WITH p AS (SELECT user_id, epoch_ms(ts) AS t, value FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |b AS (SELECT user_id, min(t) AS lo, max(t) AS hi FROM p GROUP BY 1),
        |g AS (SELECT user_id, unnest(range(
        |    CAST(ceil(CAST(lo AS DOUBLE) / 21600000) AS BIGINT) * 21600000,
        |    hi + 1, 21600000)) AS tick
        |  FROM b),
        |u AS (SELECT user_id, t, value, NULL AS tick, 0 AS kind FROM p
        |      UNION ALL
        |      SELECT user_id, tick, NULL, tick, 1 FROM g),
        |w AS (SELECT user_id, tick, kind,
        |    last_value(CASE WHEN kind = 0 THEN t END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY t, kind, value NULLS LAST
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
        |    last_value(CASE WHEN kind = 0 THEN value END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY t, kind, value NULLS LAST
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
        |    first_value(CASE WHEN kind = 0 THEN t END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY t, kind, value NULLS LAST
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt,
        |    first_value(CASE WHEN kind = 0 THEN value END IGNORE NULLS) OVER
        |      (PARTITION BY user_id ORDER BY t, kind, value NULLS LAST
        |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv
        |  FROM u)
        |SELECT user_id, CAST(tick AS BIGINT) AS tick_ms,
        |  round(CASE WHEN nt IS NULL OR nt = pt THEN pv
        |    ELSE pv + (nv - pv) * (tick - pt) / (nt - pt) END, 6) AS value_i
        |FROM w WHERE kind = 1 ORDER BY user_id, tick_ms""".stripMargin,

    "geofence_hits" ->
      """WITH pos AS (
        |  SELECT user_id, CAST(ts AS DATE) AS dt,
        |         value / 100.0 AS lat, value / 50.0 AS lon
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |zones(zone, lat_min, lat_max, lon_min, lon_max) AS (VALUES
        |  ('harbor', 0.0, 1.0, 0.0, 2.0),
        |  ('channel', 1.0, 3.0, 2.0, 6.0),
        |  ('offshore', 3.0, 5.0, 6.0, 10.0)),
        |hit AS (
        |  SELECT z.zone, p.dt, p.user_id
        |  FROM pos p JOIN zones z
        |    ON p.lat >= z.lat_min AND p.lat < z.lat_max
        |   AND p.lon >= z.lon_min AND p.lon < z.lon_max)
        |SELECT zone, dt, count(*) AS hits,
        |       count(DISTINCT user_id) AS vessels
        |FROM hit GROUP BY 1, 2 ORDER BY zone, dt""".stripMargin,

    "gto_rank_curve" ->
      s"""$PairsCte,
         |mx AS (SELECT uid_a, uid_b, max(gto) AS max_gto
         |       FROM pairs_g GROUP BY 1, 2)
         |SELECT uid_a, uid_b, round(max_gto, 6) AS max_gto,
         |  round(percent_rank() OVER (ORDER BY max_gto, uid_a, uid_b), 6) AS pr
         |FROM mx ORDER BY uid_a, uid_b""".stripMargin,
  )

  // ------------------------------------------------- text / dedup oracle SQL

  private def markerList(lang: String): String =
    TextOps.LangMarkers.find(_._1 == lang).get._2.map(m => s"'$m'").mkString(", ")

  private def piiCountNames: Seq[String] =
    Curation.PiiPatterns.map { case (n, _, _) => s"n_$n" }

  /** The DuckDB twin of Curation.redactPii's sequential fold, generated
    * from the same PiiPatterns inventory: stage i counts pattern i on
    * `prefix{i-1}` (the text redacted by stages 1..i-1) and emits
    * `prefix{i}` with pattern i replaced ('g' — DuckDB's regexp_replace is
    * first-match-only by default where Spark's replaces all).
    */
  private def piiStagesSql(prefix: String): String =
    Curation.PiiPatterns.zipWithIndex.map { case ((name, re, tag), i) =>
      val carried = piiCountNames.take(i)
      val carry = if (carried.isEmpty) "" else carried.mkString("", ", ", ",")
      s"""pt${i + 1} AS (SELECT doc_id, $carry
         |  CAST(len(regexp_extract_all($prefix$i, '$re')) AS INTEGER) AS n_$name,
         |  regexp_replace($prefix$i, '$re', '$tag', 'g') AS $prefix${i + 1}
         |  FROM pt$i)""".stripMargin
    }.mkString(",\n")

  /** Distinct 3-token shingles per doc (list comprehension; empty for <3 toks
    * exactly like the Spark-side `when(size >= 3, ...)` guard).
    */
  private val ShingleCte =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |sh AS (SELECT doc_id,
      |  unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
      |                        for i in range(1, len(ts)-1)])) AS shingle
      |FROM toks)""".stripMargin

  /** Shared minhash-band → pair → symmetric-closure → reachability prefix of
    * the cluster oracles (dup_clusters, cluster_keep): ends with the
    * recursive `reach(id, r)` CTE; consumers append their final SELECT.
    */
  private def dupClustersCteSql: String =
    s"""${ShingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
       |mh AS (SELECT doc_id, i,
       |    min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
       |  FROM sh, range(8) r(i) GROUP BY 1, 2),
       |sig AS (SELECT doc_id, CAST(i // 2 AS INTEGER) AS band,
       |    string_agg(h, '|' ORDER BY i) AS bucket
       |  FROM mh GROUP BY 1, 2),
       |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sig a JOIN sig b
       |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sym AS (SELECT doc_a AS id, doc_b AS nbr FROM p
       |        UNION SELECT doc_b, doc_a FROM p),
       |reach(id, r) AS (
       |  SELECT DISTINCT id, id FROM sym
       |  UNION
       |  SELECT s.id, reach.r FROM sym s JOIN reach ON s.nbr = reach.id)""".stripMargin

  private def textOracle: Map[String, String] = Map(
    // constants are interpolated from the SAME Scala doubles the query uses,
    // passed through CAST('…' AS DOUBLE) so DuckDB parses the exact double
    // rather than a DECIMAL (ln() ulp noise is absorbed by round(,6))
    "bm25_score" -> {
      val terms = Bm25Terms.zipWithIndex
      val k1p1 = s"CAST('${Bm25K1 + 1.0}' AS DOUBLE)"
      val k1 = s"CAST('$Bm25K1' AS DOUBLE)"
      val oneMinusB = s"CAST('${1.0 - Bm25B}' AS DOUBLE)"
      val bLit = s"CAST('$Bm25B' AS DOUBLE)"
      val tfCols = terms.map { case (t, i) =>
        s"CAST(len(list_filter(ts, x -> x = '$t')) AS DOUBLE) AS tf_$i" }.mkString(",\n  ")
      val dfAggs = terms.map { case (_, i) =>
        s"sum(CASE WHEN tf_$i > 0 THEN 1.0 ELSE 0.0 END) AS df_$i" }.mkString(", ")
      val scoreSum = terms.map { case (_, i) =>
        s"""ln((n_docs - df_$i + 0.5) / (df_$i + 0.5) + 1.0) * (tf_$i * $k1p1)
           | / (tf_$i + $k1 * ($oneMinusB + $bLit * (dl / avgdl)))""".stripMargin
      }.mkString(" + ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |d AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl,
         |  $tfCols
         |FROM t),
         |s AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
         |  $dfAggs FROM d)
         |SELECT doc_id, round($scoreSum, 6) AS bm25
         |FROM d, s ORDER BY doc_id""".stripMargin
    },

    // same tf/df/dl/score chain as bm25_score; ranking on the RAW score
    // (identical doubles both engines), rounding only in the projection
    "search_topk" -> {
      val terms = Bm25Terms.zipWithIndex
      val k1p1 = s"CAST('${Bm25K1 + 1.0}' AS DOUBLE)"
      val k1 = s"CAST('$Bm25K1' AS DOUBLE)"
      val oneMinusB = s"CAST('${1.0 - Bm25B}' AS DOUBLE)"
      val bLit = s"CAST('$Bm25B' AS DOUBLE)"
      val tfCols = terms.map { case (t, i) =>
        s"CAST(len(list_filter(ts, x -> x = '$t')) AS DOUBLE) AS tf_$i" }.mkString(",\n  ")
      val dfAggs = terms.map { case (_, i) =>
        s"sum(CASE WHEN tf_$i > 0 THEN 1.0 ELSE 0.0 END) AS df_$i" }.mkString(", ")
      val scoreSum = terms.map { case (_, i) =>
        s"""ln((n_docs - df_$i + 0.5) / (df_$i + 0.5) + 1.0) * (tf_$i * $k1p1)
           | / (tf_$i + $k1 * ($oneMinusB + $bLit * (dl / avgdl)))""".stripMargin
      }.mkString(" + ")
      val anyMatch = terms.map { case (_, i) => s"tf_$i > 0" }.mkString(" OR ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |d AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl,
         |  $tfCols
         |FROM t),
         |s AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
         |  $dfAggs FROM d),
         |v AS (SELECT doc_id, $scoreSum AS s_raw
         |  FROM d, s WHERE $anyMatch)
         |SELECT doc_id, round(s_raw, 6) AS bm25
         |FROM v ORDER BY s_raw DESC, doc_id LIMIT $SearchK""".stripMargin
    },

    "doc_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |        % 100 AS BIGINT)
        |  < CASE WHEN lang = 'en' THEN 10 WHEN lang = 'de' THEN 50 ELSE 25 END
        |ORDER BY doc_id""".stripMargin,

    "corpus_split" ->
      """SELECT doc_id,
        |  CASE WHEN b < 90 THEN 'train' WHEN b < 95 THEN 'val' ELSE 'test' END
        |    AS split
        |FROM (SELECT doc_id,
        |    CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
        |      % 100 AS BIGINT) AS b
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin,

    "dsir_weights" ->
      s"""$DsirCte
         |SELECT doc_id, n_feats,
         |  round(CAST(lw_u AS DOUBLE) / 1000000.0, 6) AS logw
         |FROM dw ORDER BY doc_id""".stripMargin,

    "dsir_select" ->
      s"""$DsirCte
         |SELECT doc_id, n_feats,
         |  round(CAST(lw_u AS DOUBLE) / 1000000.0, 6) AS logw
         |FROM (SELECT * FROM dw ORDER BY lw_u DESC, doc_id LIMIT $DsirK)
         |ORDER BY doc_id""".stripMargin,

    // same op tree: exact integer token sums, (w × B) / toks, round(…, 4),
    // threshold on the ROUNDED rate × granularity vs the sha256 bucket
    "mixture_sample" -> {
      val wCase = MixWeights
        .map { case (l, v) => s"WHEN '$l' THEN CAST('$v' AS DOUBLE)" }
        .mkString(" ")
      s"""WITH t AS (SELECT lang, sum(len(string_split(text, ' '))) AS toks
         |  FROM documents GROUP BY 1),
         |r AS (SELECT lang, round(least(CAST('1.0' AS DOUBLE),
         |    (CASE lang $wCase ELSE CAST('0.0' AS DOUBLE) END)
         |      * $MixBudget / toks), 4) AS rate
         |  FROM t)
         |SELECT d.doc_id, d.lang, r.rate,
         |  CAST(('0x' || substr(sha256(CAST(d.doc_id AS VARCHAR)), 1, 16))::UBIGINT
         |      % 10000 AS BIGINT)
         |    < round(r.rate * 10000) AS keep
         |FROM documents d JOIN r USING (lang) ORDER BY doc_id""".stripMargin
    },

    "domain_cap" ->
      s"""SELECT doc_id, source, cap_rank, cap_rank <= $DomainCapN AS keep
         |FROM (SELECT doc_id, source,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT)
         |      AS cap_rank
         |  FROM documents)
         |ORDER BY doc_id""".stripMargin,

    "doc_chunks" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |c AS (SELECT doc_id, ts, len(ts) AS n,
         |    unnest(range(1, greatest(len(ts), 1) + 1,
         |                 ${ChunkTokens - ChunkOverlap})) AS chunk_start
         |  FROM t)
         |SELECT doc_id,
         |  CAST((chunk_start - 1) // ${ChunkTokens - ChunkOverlap} AS BIGINT)
         |    AS chunk_idx,
         |  CAST(chunk_start AS BIGINT) AS chunk_start,
         |  CAST(least($ChunkTokens, n - chunk_start + 1) AS BIGINT) AS chunk_len,
         |  md5(array_to_string(ts[chunk_start : chunk_start + ${ChunkTokens - 1}],
         |      ' ')) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,

    "vocab_topk" ->
      s"""WITH t AS (SELECT string_split(text, ' ') AS ts FROM documents),
         |g AS (SELECT unnest([array_to_string(ts[i : i + ${VocabN - 1}], ' ')
         |    for i in range(1, len(ts) - ${VocabN - 2})]) AS gram
         |  FROM t WHERE len(ts) >= $VocabN)
         |SELECT gram, CAST(count(*) AS BIGINT) AS freq
         |FROM g GROUP BY gram
         |ORDER BY freq DESC, gram LIMIT $VocabTopK""".stripMargin,

    "token_packing" ->
      """WITH d AS (SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |w AS (SELECT *, CAST(sum(n_tokens) OVER
        |    (PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
        |    AS BIGINT) AS tok_end
        |  FROM d)
        |SELECT doc_id, source, n_tokens,
        |  tok_end - n_tokens AS tok_start, tok_end,
        |  CAST(floor((tok_end - n_tokens) / 512) AS BIGINT) AS first_chunk,
        |  CASE WHEN n_tokens > 0
        |       THEN CAST(floor((tok_end - 1) / 512) AS BIGINT) END AS last_chunk
        |FROM w ORDER BY doc_id""".stripMargin,

    "quality_clf" -> {
      val Seq(w1, w2, w3, w4) = ClfWeights
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
         |f AS (SELECT doc_id,
         |  ln(CAST(len(ts) AS DOUBLE) + 1.0) AS f1,
         |  CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
         |    / length(text) AS f2,
         |  CAST(len(list_filter(ts, x -> x IN ('the', 'a', 'of', 'and', 'is')))
         |    AS DOUBLE) / CAST(len(ts) AS DOUBLE) AS f3,
         |  (length(text) - CAST(len(ts) AS DOUBLE) + 1.0)
         |    / CAST(len(ts) AS DOUBLE) AS f4
         |FROM t),
         |s AS (SELECT doc_id, round(1.0 / (1.0 + exp(-(
         |    f1 * CAST('$w1' AS DOUBLE) + f2 * CAST('$w2' AS DOUBLE)
         |    + f3 * CAST('$w3' AS DOUBLE) + f4 * CAST('$w4' AS DOUBLE)
         |    + CAST('$ClfBias' AS DOUBLE)))), 6) AS score
         |FROM f)
         |SELECT doc_id, score, score >= CAST('$ClfMinScore' AS DOUBLE) AS keep
         |FROM s ORDER BY doc_id""".stripMargin
    },

    // clf-score + entropy + repetition CTEs composed, then the same
    // rounded-rank blend: mean of three percent_ranks over identical doubles
    "quality_ensemble" -> {
      val Seq(w1, w2, w3, w4) = ClfWeights
      s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ts
         |  FROM documents),
         |f AS (SELECT doc_id,
         |  ln(CAST(len(ts) AS DOUBLE) + 1.0) AS f1,
         |  CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
         |    / length(text) AS f2,
         |  CAST(len(list_filter(ts, x -> x IN ('the', 'a', 'of', 'and', 'is')))
         |    AS DOUBLE) / CAST(len(ts) AS DOUBLE) AS f3,
         |  (length(text) - CAST(len(ts) AS DOUBLE) + 1.0)
         |    / CAST(len(ts) AS DOUBLE) AS f4
         |FROM t),
         |sc AS (SELECT doc_id, round(1.0 / (1.0 + exp(-(
         |    f1 * CAST('$w1' AS DOUBLE) + f2 * CAST('$w2' AS DOUBLE)
         |    + f3 * CAST('$w3' AS DOUBLE) + f4 * CAST('$w4' AS DOUBLE)
         |    + CAST('$ClfBias' AS DOUBLE)))), 6) AS score
         |FROM f),
         |ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch
         |  FROM documents),
         |pc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
         |  FROM ch WHERE ch <> '' GROUP BY 1, 2),
         |te AS (SELECT doc_id, c,
         |    CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000.0)
         |         AS BIGINT) AS t_u
         |  FROM pc),
         |ea AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
         |    CAST(sum(t_u) AS BIGINT) AS t_sum
         |  FROM te GROUP BY 1),
         |en AS (SELECT doc_id,
         |    round(ln(CAST(n_chars AS DOUBLE))
         |          - CAST(t_sum AS DOUBLE) / 1000000.0 / n_chars, 6) AS entropy
         |  FROM ea),
         |rp AS (SELECT doc_id,
         |    round(CAST(list_max(list_transform(list_distinct(ts),
         |        x -> len(list_filter(ts, y -> y = x)))) AS DOUBLE) / len(ts), 6)
         |      AS top_tok_frac
         |  FROM t),
         |j AS (SELECT sc.doc_id, sc.score, en.entropy, rp.top_tok_frac
         |  FROM sc JOIN en ON en.doc_id = sc.doc_id
         |  JOIN rp ON rp.doc_id = sc.doc_id),
         |p AS (SELECT *,
         |    round(percent_rank() OVER (ORDER BY score, doc_id), 6)
         |      AS pr_score,
         |    round(percent_rank() OVER (ORDER BY entropy, doc_id), 6)
         |      AS pr_entropy,
         |    round(percent_rank() OVER (ORDER BY top_tok_frac DESC, doc_id), 6)
         |      AS pr_top_tok_frac
         |  FROM j)
         |SELECT doc_id, score, entropy, top_tok_frac,
         |  pr_score, pr_entropy, pr_top_tok_frac,
         |  round((pr_score + pr_entropy + pr_top_tok_frac) / 3.0, 6) AS q_blend
         |FROM p ORDER BY doc_id""".stripMargin
    },

    // same feature/score CTE as quality_clf, then a per-source percentile
    // cut on the ROUNDED percent_rank (rank orders on the rounded score +
    // id — both engines rank identical doubles)
    "quality_prune" -> {
      val Seq(w1, w2, w3, w4) = ClfWeights
      s"""WITH t AS (SELECT doc_id, source, text,
         |    string_split(text, ' ') AS ts FROM documents),
         |f AS (SELECT doc_id, source,
         |  ln(CAST(len(ts) AS DOUBLE) + 1.0) AS f1,
         |  CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
         |    / length(text) AS f2,
         |  CAST(len(list_filter(ts, x -> x IN ('the', 'a', 'of', 'and', 'is')))
         |    AS DOUBLE) / CAST(len(ts) AS DOUBLE) AS f3,
         |  (length(text) - CAST(len(ts) AS DOUBLE) + 1.0)
         |    / CAST(len(ts) AS DOUBLE) AS f4
         |FROM t),
         |s AS (SELECT doc_id, source, round(1.0 / (1.0 + exp(-(
         |    f1 * CAST('$w1' AS DOUBLE) + f2 * CAST('$w2' AS DOUBLE)
         |    + f3 * CAST('$w3' AS DOUBLE) + f4 * CAST('$w4' AS DOUBLE)
         |    + CAST('$ClfBias' AS DOUBLE)))), 6) AS score
         |FROM f),
         |p AS (SELECT doc_id, source, score,
         |    round(percent_rank() OVER (PARTITION BY source
         |      ORDER BY score DESC, doc_id), 6) AS q_pr
         |  FROM s)
         |SELECT doc_id, source, score, q_pr,
         |  q_pr <= CAST('$QPruneKeep' AS DOUBLE) AS keep
         |FROM p ORDER BY doc_id""".stripMargin
    },

    "quality_filter" ->
      """WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ts FROM documents),
        |m AS (SELECT doc_id,
        |  CAST(len(ts) AS DOUBLE) AS n_toks,
        |  CAST(len(regexp_extract_all(text, '[^\w\s]')) AS DOUBLE)
        |    / length(text) AS punct_ratio,
        |  CAST(len(list_filter(ts, x -> x IN ('the', 'a', 'of', 'and', 'is')))
        |    AS DOUBLE) / CAST(len(ts) AS DOUBLE) AS stop_ratio
        |FROM t),
        |r AS (SELECT doc_id,
        |  (CASE WHEN n_toks < 5 THEN 1 ELSE 0 END
        |   + CASE WHEN n_toks > 1000 THEN 2 ELSE 0 END
        |   + CASE WHEN punct_ratio > CAST('0.1' AS DOUBLE) THEN 4 ELSE 0 END
        |   + CASE WHEN stop_ratio < CAST('0.005' AS DOUBLE) THEN 8 ELSE 0 END)
        |  AS drop_reasons FROM m)
        |SELECT doc_id, CAST(drop_reasons AS INTEGER) AS drop_reasons,
        |  drop_reasons = 0 AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    // word rules over normalized tokens, line rules over RAW text (chr(10)
    // split); flag comparisons on UNROUNDED doubles in both engines
    "gopher_rules" ->
      """WITH pre AS (SELECT doc_id, text,
        |    list_filter(string_split(
        |      trim(regexp_replace(regexp_replace(regexp_replace(text,
        |        '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |        '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
        |        '[ \t\n\r\f]+', ' ', 'g')), ' '), w -> len(w) > 0) AS toks,
        |    string_split(text, chr(10)) AS lines
        |  FROM documents),
        |m AS (SELECT doc_id, len(toks) AS n_words,
        |    CASE WHEN len(toks) > 0 THEN
        |      CAST(list_sum(list_transform(toks, w -> len(w))) AS DOUBLE)
        |        / len(toks) END AS mean_len,
        |    CASE WHEN len(toks) > 0 THEN
        |      CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS DOUBLE)
        |        / len(toks) END AS symbol_r,
        |    CAST(len(list_filter(lines, l -> regexp_matches(l, '^[-*•‣▪]')))
        |      AS DOUBLE) / len(lines) AS bullet_f,
        |    CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)$')))
        |      AS DOUBLE) / len(lines) AS ellipsis_f,
        |    CASE WHEN len(toks) > 0 THEN
        |      CAST(len(list_filter(toks, w -> regexp_matches(w, '[A-Za-z]')))
        |        AS DOUBLE) / len(toks) END AS alpha_f,
        |    CAST(len(list_filter(toks, w -> list_contains(
        |      ['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with'], w)))
        |      AS BIGINT) AS stop_hits
        |  FROM pre),
        |f AS (SELECT *,
        |    (CASE WHEN n_words < 50 OR n_words > 100000 THEN 1 ELSE 0 END
        |     + CASE WHEN mean_len < 3.0 OR mean_len > 10.0 THEN 2 ELSE 0 END
        |     + CASE WHEN symbol_r > CAST('0.1' AS DOUBLE) THEN 4 ELSE 0 END
        |     + CASE WHEN bullet_f > CAST('0.9' AS DOUBLE) THEN 8 ELSE 0 END
        |     + CASE WHEN ellipsis_f > CAST('0.3' AS DOUBLE) THEN 16 ELSE 0 END
        |     + CASE WHEN alpha_f < CAST('0.8' AS DOUBLE) THEN 32 ELSE 0 END
        |     + CASE WHEN stop_hits < 2 THEN 64 ELSE 0 END) AS flags
        |  FROM m)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  round(mean_len, 6) AS mean_word_len, round(symbol_r, 6) AS symbol_ratio,
        |  round(bullet_f, 6) AS bullet_frac, round(ellipsis_f, 6) AS ellipsis_frac,
        |  round(alpha_f, 6) AS alpha_frac, stop_hits,
        |  CAST(flags AS INTEGER) AS flags, flags = 0 AS keep
        |FROM f ORDER BY doc_id""".stripMargin,

    "token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
        |  CAST(len(regexp_extract_all(text, '\w+|[^\w\s]')) AS INTEGER) AS bpe_tokens,
        |  CAST(length(text) AS INTEGER) AS n_chars
        |FROM documents ORDER BY doc_id""".stripMargin,

    // same three regex passes with explicitly-spelled character classes so
    // RE2 and Java regex agree (\s differs between them); 'g' = global
    "text_normalize" ->
      """WITH n AS (
        |  SELECT doc_id, text,
        |    trim(regexp_replace(regexp_replace(regexp_replace(text,
        |      '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', '', 'g'),
        |      '[\x{200B}\x{200C}\x{200D}\x{FEFF}]', '', 'g'),
        |      '[ \t\n\r\f]+', ' ', 'g')) AS text_norm
        |  FROM documents)
        |SELECT doc_id, text_norm, text_norm <> text AS changed,
        |  CAST(length(text) - length(text_norm) AS INTEGER) AS len_delta
        |FROM n ORDER BY doc_id""".stripMargin,

    // generated from the SAME PiiPatterns the engine applies (RE2 ∩ Java
    // regex subset); DuckDB regexp_replace needs the explicit 'g' flag
    // mirrors Curation.redactPii's sequential fold: stage i counts on the
    // text redacted by stages 1..i-1, then replaces — generated from the
    // SAME PiiPatterns inventory so Spark and the oracle cannot drift
    "pii_redact" -> {
      val stages = piiStagesSql("t")
      s"""WITH pt0 AS (SELECT doc_id, text AS t0 FROM documents),
         |$stages
         |SELECT doc_id, ${piiCountNames.mkString(", ")},
         |  md5(t${Curation.PiiPatterns.length}) AS redacted_md5
         |FROM pt${Curation.PiiPatterns.length} ORDER BY doc_id""".stripMargin
    },

    // mirrors the seeded pii_scrub query: same doc_id-derived PII spans,
    // same generated stage chain, full redacted text compared
    "pii_scrub" -> {
      val stages = piiStagesSql("t")
      s"""WITH pt0 AS (SELECT doc_id, concat_ws(' ', text,
         |    concat('user', CAST(doc_id AS VARCHAR), '@example.com'),
         |    CASE WHEN doc_id % 3 = 0 THEN concat('ssn ',
         |      CAST(doc_id % 900 + 100 AS VARCHAR), '-',
         |      CAST(doc_id % 90 + 10 AS VARCHAR), '-',
         |      CAST(doc_id % 9000 + 1000 AS VARCHAR)) END,
         |    CASE WHEN doc_id % 4 = 0 THEN concat('call +14155550',
         |      lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')) END,
         |    CASE WHEN doc_id % 5 = 0 THEN concat('ip 10.0.',
         |      CAST(doc_id % 256 AS VARCHAR), '.7') END,
         |    CASE WHEN doc_id % 7 = 0 THEN concat('card 4111111111111',
         |      lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')) END) AS t0
         |  FROM documents),
         |$stages
         |SELECT doc_id, n_emails, n_ips, n_ids, n_cards, n_phones,
         |  t${Curation.PiiPatterns.length} AS clean_text
         |FROM pt${Curation.PiiPatterns.length} ORDER BY doc_id""".stripMargin
    },

    "repetition" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |r AS (SELECT doc_id, CAST(len(ts) AS INTEGER) AS n_toks,
        |  round(CAST(list_max(list_transform(list_distinct(ts),
        |      t -> len(list_filter(ts, x -> x = t)))) AS DOUBLE) / len(ts), 6)
        |    AS top_tok_frac,
        |  round(CASE WHEN len(ts) >= 2 THEN
        |      1.0 - CAST(len(list_distinct([ts[i] || ' ' || ts[i+1]
        |                   for i in range(1, len(ts))])) AS DOUBLE) / (len(ts) - 1)
        |    ELSE 0.0 END, 6) AS dup_2gram_frac
        |  FROM toks)
        |SELECT doc_id, n_toks, top_tok_frac, dup_2gram_frac,
        |  (top_tok_frac > CAST('0.2' AS DOUBLE)
        |    OR dup_2gram_frac > CAST('0.2' AS DOUBLE)) AS repetitive
        |FROM r ORDER BY doc_id""".stripMargin,

    "decontam" ->
      s"""$ShingleCte,
         |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < $EvalCohortMax),
         |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= $EvalCohortMax),
         |agg AS (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_sh,
         |    CAST(count(e.shingle) AS BIGINT) AS hits
         |  FROM tr t LEFT JOIN ev e ON t.shingle = e.shingle GROUP BY 1)
         |SELECT d.doc_id, coalesce(n_sh, 0) AS n_sh, coalesce(hits, 0) AS hits,
         |  round(CASE WHEN coalesce(n_sh, 0) > 0
         |    THEN CAST(hits AS DOUBLE) / n_sh ELSE 0.0 END, 6) AS overlap_frac,
         |  coalesce(hits, 0) >= 1 AS contaminated
         |FROM (SELECT doc_id FROM documents WHERE doc_id >= $EvalCohortMax) d
         |LEFT JOIN agg ON agg.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // direct per-position polynomial (HUGEINT) — must agree with the engine's
    // O(n) rolling form mod 2^31-1; ASCII corpus ⇒ ascii() = UTF-8 byte
    "doc_fingerprint" ->
      s"""WITH g AS (SELECT doc_id, unnest(
         |    [{'pos': j, 'h': list_reduce(
         |        list_prepend(0::HUGEINT,
         |          [ascii(substr(text, i, 1))::HUGEINT for i in range(j, j + $FpK)]),
         |        (acc, b) -> (acc * 257 + b) % 2147483647)}
         |     for j in range(1, len(text) - $FpK + 2)]) AS u
         |  FROM documents)
         |SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, CAST(u.h AS BIGINT) AS h
         |FROM g WHERE u.h % $FpModP = 0 ORDER BY doc_id, pos""".stripMargin,

    // same rolling polynomial, used as CHUNK CUTS: positions whose hash ≡ 0
    // mod CdcDiv partition the text; chunk md5s keep first occurrence
    "content_chunks" ->
      s"""WITH h AS (SELECT doc_id, text,
         |    [list_reduce(list_prepend(0::HUGEINT,
         |        [ascii(substr(text, i, 1))::HUGEINT for i in range(j, j + $FpK)]),
         |      (acc, b) -> (acc * 257 + b) % 2147483647)
         |     for j in range(1, len(text) - $FpK + 2)] AS hs
         |  FROM documents),
         |c AS (SELECT doc_id, text,
         |    list_prepend(1,
         |      [j for j in range(2, len(hs) + 1) if hs[j] % $CdcDiv = 0]) AS cuts
         |  FROM h),
         |ch AS (SELECT doc_id, u.pos, u.chunk FROM (
         |    SELECT doc_id, unnest([{'pos': cuts[i],
         |        'chunk': substr(text, cuts[i],
         |          coalesce(cuts[i + 1], len(text) + 1) - cuts[i])}
         |      for i in range(1, len(cuts) + 1)]) AS u
         |    FROM c) q),
         |r AS (SELECT doc_id, len(chunk) AS clen,
         |    row_number() OVER (PARTITION BY md5(chunk)
         |      ORDER BY doc_id, pos) AS rn
         |  FROM ch)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(clen) AS BIGINT) AS n_chars,
         |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_chunks,
         |  CAST(sum(CASE WHEN rn > 1 THEN clen ELSE 0 END) AS BIGINT)
         |    AS dup_chars,
         |  CASE WHEN sum(clen) > 0 THEN
         |    round(CAST(sum(CASE WHEN rn > 1 THEN clen ELSE 0 END) AS DOUBLE)
         |      / sum(clen), 6) END AS dup_char_frac
         |FROM r GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // same rolling-hash selection, paired: distinct (doc, h), df-capped, then
    // the keyed self-join the engine runs
    "fp_overlap" ->
      s"""WITH g AS (SELECT doc_id, unnest(
         |    [list_reduce(
         |        list_prepend(0::HUGEINT,
         |          [ascii(substr(text, i, 1))::HUGEINT for i in range(j, j + $FpK)]),
         |        (acc, b) -> (acc * 257 + b) % 2147483647)
         |     for j in range(1, len(text) - $FpK + 2)]) AS h
         |  FROM documents),
         |fp AS (SELECT DISTINCT doc_id, CAST(h AS BIGINT) AS h FROM g
         |       WHERE h % $FpModP = 0),
         |d AS (SELECT h, count(*) AS dc FROM fp GROUP BY 1),
         |ok AS (SELECT fp.doc_id, fp.h FROM fp JOIN d USING (h)
         |       WHERE d.dc <= $FpMaxDocs)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS shared
         |FROM ok a JOIN ok b ON a.h = b.h AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= $FpMinShared
         |ORDER BY doc_a, doc_b""".stripMargin,

    "lang_id" -> {
      val scores = TextOps.LangMarkers.map { case (l, _) =>
        s"CAST(len(list_filter(ts, t -> t IN (${markerList(l)}))) AS INTEGER) AS score_$l"
      }.mkString(",\n  ")
      val scoreCols = TextOps.LangMarkers.map { case (l, _) => s"score_$l" }
      val best = scoreCols.mkString("greatest(", ", ", ")")
      val pred = TextOps.LangMarkers.map { case (l, _) =>
        s"WHEN score_$l = $best THEN '$l'"
      }.mkString("CASE ", " ", "END")
      s"""WITH s AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |sc AS (SELECT doc_id,
         |  $scores
         |FROM s)
         |SELECT doc_id, ${scoreCols.mkString(", ")}, $pred AS pred_lang
         |FROM sc ORDER BY doc_id""".stripMargin
    },

    // score = tf · ln((N+1)/(df+1)); ln() ulp noise absorbed by round(,6),
    // rank ties broken on the term string in both engines
    "tfidf_topk" ->
      s"""WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |  FROM documents),
         |tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
         |  FROM toks GROUP BY 1, 2),
         |dfc AS (SELECT term, CAST(count(*) AS BIGINT) AS df_cnt FROM tf GROUP BY 1),
         |n AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs FROM documents),
         |sc AS (SELECT tf.doc_id, tf.term, tf.tf, dfc.df_cnt,
         |    tf.tf * ln((n.n_docs + 1.0) / (dfc.df_cnt + 1.0)) AS score
         |  FROM tf JOIN dfc USING (term), n),
         |r AS (SELECT *, row_number() OVER
         |    (PARTITION BY doc_id ORDER BY score DESC, term) AS rk FROM sc)
         |SELECT doc_id, term, tf, df_cnt, round(score, 6) AS score,
         |  CAST(rk AS BIGINT) AS rk
         |FROM r WHERE rk <= $TfidfK ORDER BY doc_id, rk""".stripMargin,

    "text_quality" ->
      s"""WITH m AS (SELECT doc_id,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         |  CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE) AS punct,
         |  CAST(len(regexp_extract_all(text, '[A-Z]')) AS DOUBLE) AS upper_c,
         |  CAST(len(list_filter(string_split(text, ' '),
         |       t -> t IN (${markerList("en")}))) AS DOUBLE) AS stop_c
         |FROM documents)
         |SELECT doc_id, n_tokens,
         |  round(punct / n_chars, 6) AS punct_ratio,
         |  round(stop_c / n_tokens, 6) AS stopword_ratio,
         |  round(upper_c / n_chars, 6) AS upper_ratio,
         |  round(CAST(0.4 AS DOUBLE) * (CASE WHEN n_chars BETWEEN 100 AND 400 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.5 AS DOUBLE) END)
         |      + CAST(0.3 AS DOUBLE) * (CASE WHEN stop_c / n_tokens BETWEEN 0.01 AND 0.5 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END)
         |      + CAST(0.3 AS DOUBLE) * (CASE WHEN punct / n_chars <= 0.1 THEN CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END), 6)
         |    AS quality_score
         |FROM m ORDER BY doc_id""".stripMargin,

    "dedup_exact" ->
      """WITH f AS (SELECT doc_id,
        |  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp FROM documents),
        |r AS (SELECT doc_id, fp,
        |  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM f)
        |SELECT doc_id, fp, rn > 1 AS is_dup FROM r ORDER BY doc_id""".stripMargin,

    "incr_dedup" ->
      """WITH f AS (SELECT doc_id,
        |  md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp FROM documents),
        |standing AS (SELECT DISTINCT fp FROM f WHERE doc_id < 400),
        |batch AS (SELECT doc_id, fp,
        |  row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        |  FROM f WHERE doc_id >= 400)
        |SELECT b.doc_id, b.fp,
        |  (b.rn > 1 OR s.fp IS NOT NULL) AS is_dup,
        |  (s.fp IS NOT NULL) AS dup_of_standing
        |FROM batch b LEFT JOIN standing s ON b.fp = s.fp
        |ORDER BY doc_id""".stripMargin,

    "dedup_ngram" ->
      s"""$ShingleCte,
         |hot AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) > 50),
         |shg AS (SELECT doc_id, shingle FROM sh
         |  WHERE shingle NOT IN (SELECT shingle FROM hot)),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shg GROUP BY 1),
         |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS inter
         |  FROM shg a JOIN shg b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter, sa.n AS na, sb.n AS nb,
         |  round(CAST(inter AS DOUBLE) / (sa.n + sb.n - inter), 6) AS jaccard
         |FROM shared
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE CAST(inter AS DOUBLE) / (sa.n + sb.n - inter) >= 0.5
         |ORDER BY doc_a, doc_b""".stripMargin,

    // same guarded shingle chain as dedup_ngram; asymmetric denominators
    "containment_pairs" ->
      s"""$ShingleCte,
         |hot AS (SELECT shingle FROM sh GROUP BY 1 HAVING count(*) > 50),
         |shg AS (SELECT doc_id, shingle FROM sh
         |  WHERE shingle NOT IN (SELECT shingle FROM hot)),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM shg GROUP BY 1),
         |shared AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS inter
         |  FROM shg a JOIN shg b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, inter, sa.n AS na, sb.n AS nb,
         |  round(CAST(inter AS DOUBLE) / sa.n, 6) AS cont_a_in_b,
         |  round(CAST(inter AS DOUBLE) / sb.n, 6) AS cont_b_in_a
         |FROM shared
         |JOIN sizes sa ON sa.doc_id = doc_a
         |JOIN sizes sb ON sb.doc_id = doc_b
         |WHERE greatest(CAST(inter AS DOUBLE) / sa.n,
         |               CAST(inter AS DOUBLE) / sb.n) >= 0.8
         |ORDER BY doc_a, doc_b""".stripMargin,

    // minhash candidates (same CTE chain as dedup_minhash) re-ranked by the
    // same strict-order cosine as dedup_embed — the retrieve-then-verify
    // fusion, value-for-value
    "hybrid_dedup" ->
      s"""$ShingleCte,
         |mh AS (SELECT doc_id, i,
         |    min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
         |  FROM sh, range(8) r(i) GROUP BY 1, 2),
         |sig AS (SELECT doc_id, CAST(i // 2 AS INTEGER) AS band,
         |    string_agg(h, '|' ORDER BY i) AS bucket
         |  FROM mh GROUP BY 1, 2),
         |cand AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS bands_shared
         |  FROM sig a JOIN sig b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nrm AS (SELECT vec_id, v, sqrt(${dotChain("v", "v")}) AS nr FROM e),
         |j AS (SELECT c.doc_a, c.doc_b, c.bands_shared,
         |    (${dotChain("a.v", "b.v")}) / nullif(a.nr * b.nr, 0) AS cos
         |  FROM cand c
         |  JOIN nrm a ON a.vec_id = c.doc_a
         |  JOIN nrm b ON b.vec_id = c.doc_b)
         |SELECT doc_a, doc_b, bands_shared, round(cos, 6) AS cos,
         |  cos >= $HybridCosThreshold AS is_dup
         |FROM j ORDER BY doc_a, doc_b""".stripMargin,

    // slice-bounded ShingleCte twin + exact/estimated Jaccard per pair
    "lsh_calibration" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
         |  FROM documents WHERE doc_id < $LshAuditMax),
         |sh AS (SELECT doc_id,
         |  unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
         |                        for i in range(1, len(ts)-1)])) AS shingle
         |FROM toks),
         |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_sh
         |  FROM sh GROUP BY 1),
         |pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS shared
         |  FROM sh a JOIN sh b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |mh AS (SELECT doc_id, i,
         |    min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
         |  FROM sh, range(8) r(i) GROUP BY 1, 2),
         |mm AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |    CAST(count(*) AS BIGINT) AS slots_matched
         |  FROM mh a JOIN mh b
         |    ON a.i = b.i AND a.h = b.h AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT pr.doc_a, pr.doc_b, pr.shared,
         |  sa.n_sh AS n_a, sb.n_sh AS n_b,
         |  round(CAST(pr.shared AS DOUBLE) / (sa.n_sh + sb.n_sh - pr.shared), 6)
         |    AS jaccard,
         |  coalesce(mm.slots_matched, 0) AS slots_matched,
         |  round(CAST(coalesce(mm.slots_matched, 0) AS DOUBLE) / 8.0, 6)
         |    AS jaccard_est
         |FROM pr
         |JOIN sz sa ON sa.doc_id = pr.doc_a
         |JOIN sz sb ON sb.doc_id = pr.doc_b
         |LEFT JOIN mm ON mm.doc_a = pr.doc_a AND mm.doc_b = pr.doc_b
         |ORDER BY pr.doc_a, pr.doc_b""".stripMargin,

    "dedup_minhash" ->
      s"""$ShingleCte,
         |mh AS (SELECT doc_id, i,
         |    min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
         |  FROM sh, range(8) r(i) GROUP BY 1, 2),
         |sig AS (SELECT doc_id, CAST(i // 2 AS INTEGER) AS band,
         |    string_agg(h, '|' ORDER BY i) AS bucket
         |  FROM mh GROUP BY 1, 2)
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(count(*) AS BIGINT) AS bands_shared
         |FROM sig a JOIN sig b
         |  ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin,

    // same recursive min-label clusters; the split key is the cluster label
    // (or the doc's own id), bucketed by the same sha256 rule as splitAssign
    "leakfree_split" ->
      s"""${ShingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |mh AS (SELECT doc_id, i,
         |    min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
         |  FROM sh, range(8) r(i) GROUP BY 1, 2),
         |sig AS (SELECT doc_id, CAST(i // 2 AS INTEGER) AS band,
         |    string_agg(h, '|' ORDER BY i) AS bucket
         |  FROM mh GROUP BY 1, 2),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sig a JOIN sig b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sym AS (SELECT doc_a AS id, doc_b AS nbr FROM p
         |        UNION SELECT doc_b, doc_a FROM p),
         |reach(id, r) AS (
         |  SELECT DISTINCT id, id FROM sym
         |  UNION
         |  SELECT s.id, reach.r FROM sym s JOIN reach ON s.nbr = reach.id),
         |cl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
         |k AS (SELECT d.doc_id, cl.cluster,
         |    coalesce(cl.cluster, d.doc_id) AS skey
         |  FROM documents d LEFT JOIN cl ON cl.id = d.doc_id)
         |SELECT doc_id, cluster,
         |  CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END
         |    AS split
         |FROM (SELECT doc_id, cluster,
         |    CAST(('0x' || substr(sha256(CAST(skey AS VARCHAR)), 1, 16))::UBIGINT
         |      % 100 AS BIGINT) AS b
         |  FROM k)
         |ORDER BY doc_id""".stripMargin,

    // same k global minima per hash slot over each half's shingles
    "corpus_sim" ->
      s"""$ShingleCte,
         |a AS (SELECT i, min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS ha
         |  FROM sh, range(16) r(i) WHERE doc_id < 250 GROUP BY 1),
         |b AS (SELECT i, min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS hb
         |  FROM sh, range(16) r(i) WHERE doc_id >= 250 GROUP BY 1),
         |j AS (SELECT a.i, ha, hb FROM a JOIN b USING (i))
         |SELECT CAST(count(*) AS BIGINT) AS k,
         |  CAST(sum(CASE WHEN ha = hb THEN 1 ELSE 0 END) AS BIGINT) AS matches,
         |  round(sum(CASE WHEN ha = hb THEN 1 ELSE 0 END)
         |        / CAST(count(*) AS DOUBLE), 6) AS jaccard_est
         |FROM j""".stripMargin,

    // same signatures; pairs restricted to those touching the batch side,
    // normalized with least/greatest, per-(pair, band) DISTINCT collapsing
    // the both-new double match exactly like the engine
    "incr_lsh" ->
      s"""$ShingleCte,
         |mh AS (SELECT doc_id, i,
         |    min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
         |  FROM sh, range(8) r(i) GROUP BY 1, 2),
         |sig AS (SELECT doc_id, CAST(i // 2 AS INTEGER) AS band,
         |    string_agg(h, '|' ORDER BY i) AS bucket
         |  FROM mh GROUP BY 1, 2),
         |p AS (SELECT DISTINCT least(a.doc_id, b.doc_id) AS doc_a,
         |    greatest(a.doc_id, b.doc_id) AS doc_b, a.band
         |  FROM sig a JOIN sig b
         |    ON a.band = b.band AND a.bucket = b.bucket
         |      AND a.doc_id <> b.doc_id
         |  WHERE a.doc_id >= 400)
         |SELECT doc_a, doc_b, CAST(count(*) AS BIGINT) AS bands_shared
         |FROM p GROUP BY 1, 2 ORDER BY doc_a, doc_b""".stripMargin,

    // same signature bits; band keys via integer div/mod, hamming via
    // bit_count(xor) exactly like the engine
    "simhash_pairs" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |bits AS (SELECT doc_id, j,
        |    ((strpos('0123456789abcdef',
        |              substr(md5(tok), CAST(j // 4 AS INTEGER) + 1, 1)) - 1)
        |     // CAST(pow(2, j % 4) AS INTEGER)) % 2 AS bit
        |  FROM tk, range(64) r(j)),
        |acc AS (SELECT doc_id, j, sum(2 * bit - 1) AS s FROM bits GROUP BY 1, 2),
        |sb AS (SELECT doc_id, j, CASE WHEN s > 0 THEN 1 ELSE 0 END AS b FROM acc),
        |sig AS (SELECT doc_id,
        |  CAST(sum(CASE WHEN j < 32 THEN b * pow(2, j) ELSE 0 END) AS BIGINT) AS lo,
        |  CAST(sum(CASE WHEN j >= 32 THEN b * pow(2, j - 32) ELSE 0 END) AS BIGINT) AS hi
        |FROM sb GROUP BY 1),
        |banded AS (
        |  SELECT doc_id, lo, hi, b.band,
        |    CASE b.band WHEN 0 THEN lo % 65536 WHEN 1 THEN (lo // 65536) % 65536
        |                WHEN 2 THEN hi % 65536 ELSE (hi // 65536) % 65536 END AS key
        |  FROM sig, range(4) b(band)),
        |p AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |    CAST(bit_count(xor(a.lo, b.lo)) + bit_count(xor(a.hi, b.hi)) AS BIGINT)
        |      AS hamming
        |  FROM banded a JOIN banded b
        |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id)
        |SELECT doc_a, doc_b, hamming FROM p
        |WHERE hamming <= 3 ORDER BY doc_a, doc_b""".stripMargin,

    // same pair graph, closed transitively: min reachable doc id per node
    // the stage oracles composed: exact-dup keep-first + recursive-CTE
    // cluster canonicality + quality bitmask + eval-shingle decontamination,
    // with the SAME first-match precedence; redacted text compared by md5
    // (text normalization is identity on this corpus — single-spaced ASCII)
    "curation_funnel" -> {
      val redactedChain = Curation.PiiPatterns.foldLeft("text") {
        case (acc, (_, re, tag)) => s"regexp_replace($acc, '$re', '$tag', 'g')"
      }
      s"""${ShingleCte.replaceFirst("WITH ", "WITH RECURSIVE ")},
         |f AS (SELECT doc_id,
         |    md5(lower(regexp_replace(text, '\\s+', ' ', 'g'))) AS fp
         |  FROM documents WHERE doc_id >= $EvalCohortMax),
         |ex AS (SELECT doc_id,
         |    row_number() OVER (PARTITION BY fp ORDER BY doc_id) > 1 AS f_exact
         |  FROM f),
         |mh AS (SELECT doc_id, i,
         |    min(md5(CAST(i AS VARCHAR) || ':' || shingle)) AS h
         |  FROM sh, range(8) r(i)
         |  WHERE doc_id >= $EvalCohortMax GROUP BY 1, 2),
         |sig AS (SELECT doc_id, CAST(i // 2 AS INTEGER) AS band,
         |    string_agg(h, '|' ORDER BY i) AS bucket
         |  FROM mh GROUP BY 1, 2),
         |p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sig a JOIN sig b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |sym AS (SELECT doc_a AS id, doc_b AS nbr FROM p
         |        UNION SELECT doc_b, doc_a FROM p),
         |reach(id, r) AS (
         |  SELECT DISTINCT id, id FROM sym
         |  UNION
         |  SELECT s.id, reach.r FROM sym s JOIN reach ON s.nbr = reach.id),
         |cl AS (SELECT id, id = min(r) AS canon FROM reach GROUP BY id),
         |qt AS (SELECT doc_id, text, string_split(text, ' ') AS qts
         |  FROM documents WHERE doc_id >= $EvalCohortMax),
         |qm AS (SELECT doc_id,
         |    CAST(len(qts) AS DOUBLE) AS n_toks,
         |    CAST(len(regexp_extract_all(text, '[^\\w\\s]')) AS DOUBLE)
         |      / length(text) AS punct_ratio,
         |    CAST(len(list_filter(qts, x -> x IN ('the', 'a', 'of', 'and', 'is')))
         |      AS DOUBLE) / CAST(len(qts) AS DOUBLE) AS stop_ratio
         |  FROM qt),
         |q AS (SELECT doc_id,
         |    (CASE WHEN n_toks < 5 THEN 1 ELSE 0 END
         |     + CASE WHEN n_toks > 1000 THEN 2 ELSE 0 END
         |     + CASE WHEN punct_ratio > CAST('0.1' AS DOUBLE) THEN 4 ELSE 0 END
         |     + CASE WHEN stop_ratio < CAST('0.005' AS DOUBLE) THEN 8 ELSE 0 END)
         |      <> 0 AS f_quality
         |  FROM qm),
         |ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id < $EvalCohortMax),
         |tr AS (SELECT doc_id, shingle FROM sh WHERE doc_id >= $EvalCohortMax),
         |ct AS (SELECT t.doc_id, CAST(count(e.shingle) AS BIGINT) AS hits
         |  FROM tr t LEFT JOIN ev e ON t.shingle = e.shingle GROUP BY 1),
         |stage AS (SELECT b.doc_id,
         |    CASE WHEN ex.f_exact THEN 'exact_dup'
         |         WHEN NOT coalesce(cl.canon, TRUE) THEN 'near_dup'
         |         WHEN q.f_quality THEN 'quality'
         |         WHEN coalesce(ct.hits, 0) >= 1 THEN 'contaminated'
         |    END AS drop_stage,
         |    md5($redactedChain) AS clean_md5
         |  FROM documents b
         |  JOIN ex ON ex.doc_id = b.doc_id
         |  LEFT JOIN cl ON cl.id = b.doc_id
         |  JOIN q ON q.doc_id = b.doc_id
         |  LEFT JOIN ct ON ct.doc_id = b.doc_id
         |  WHERE b.doc_id >= $EvalCohortMax)
         |SELECT doc_id, drop_stage, drop_stage IS NULL AS kept, clean_md5
         |FROM stage ORDER BY doc_id""".stripMargin
    },

    "dup_clusters" ->
      s"""$dupClustersCteSql
         |SELECT id, min(r) AS cluster, id = min(r) AS is_canonical
         |FROM reach GROUP BY id ORDER BY id""".stripMargin,

    // same cluster CTE; the keep rule is quality-based (longest doc wins,
    // ties to the smaller id) instead of min-id — two plain window passes
    "cluster_keep" ->
      s"""$dupClustersCteSql,
         |cl AS (SELECT id, min(r) AS cluster FROM reach GROUP BY id),
         |j AS (SELECT cl.id, cl.cluster, d.n_chars
         |  FROM cl JOIN documents d ON d.doc_id = cl.id),
         |j2 AS (SELECT *, max(n_chars) OVER (PARTITION BY cluster) AS bn FROM j),
         |j3 AS (SELECT *, min(CASE WHEN n_chars = bn THEN id END)
         |    OVER (PARTITION BY cluster) AS kept_id FROM j2)
         |SELECT id, cluster, CAST(n_chars AS BIGINT) AS n_chars, kept_id,
         |  id = kept_id AS keep
         |FROM j3 ORDER BY id""".stripMargin,

    "dedup_simhash" ->
      """WITH tk AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |bits AS (SELECT doc_id, j,
        |    ((strpos('0123456789abcdef',
        |              substr(md5(tok), CAST(j // 4 AS INTEGER) + 1, 1)) - 1)
        |     // CAST(pow(2, j % 4) AS INTEGER)) % 2 AS bit
        |  FROM tk, range(64) r(j)),
        |acc AS (SELECT doc_id, j, sum(2 * bit - 1) AS s FROM bits GROUP BY 1, 2),
        |sb AS (SELECT doc_id, j, CASE WHEN s > 0 THEN 1 ELSE 0 END AS b FROM acc)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN j < 32 THEN b * pow(2, j) ELSE 0 END) AS BIGINT) AS simhash_lo,
        |  CAST(sum(CASE WHEN j >= 32 THEN b * pow(2, j - 32) ELSE 0 END) AS BIGINT) AS simhash_hi
        |FROM sb GROUP BY 1 ORDER BY doc_id""".stripMargin,

    // frames recomputed in string space (the testdata payload is UTF-8 text,
    // so byte slices == char slices); sha256 hex is lowercase in both engines
    "frame_sample" ->
      """WITH f AS (SELECT doc_id, text, unnest(range(0,
        |    CAST(ceil(length(text) / 16.0) AS BIGINT))) AS j FROM documents)
        |SELECT doc_id AS media_id, CAST(j AS INTEGER) AS frame_idx,
        |  CAST(least(16, length(text) - j * 16) AS INTEGER) AS n_bytes,
        |  sha256(substr(text, CAST(j * 16 + 1 AS INTEGER), 16)) AS frame_sha
        |FROM f WHERE j % 2 = 0 ORDER BY media_id, frame_idx""".stripMargin,

    // mirrors wav_meta: the stream parameters the Spark side must RECOVER
    // from the synthesized RIFF bytes, derived arithmetically
    "wav_meta" ->
      """SELECT doc_id,
        |  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
        |  CAST(doc_id % 5 * 4000 + 8000 AS BIGINT) AS sample_rate,
        |  CAST(16 AS BIGINT) AS bits,
        |  CAST(doc_id % 100 + 1 AS BIGINT) AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,

    // mirrors bpe_roundtrip: the decoded text must equal the NORMALIZED
    // source text (same hygiene regex chain as the encode oracle) — BPE
    // merges only regroup characters within words, so encode∘decode is
    // identity on the normalized corpus; docs normalizing to empty never
    // produce tokens and are excluded on both sides
    "bpe_roundtrip" ->
      s"""SELECT doc_id, trim(regexp_replace(regexp_replace(regexp_replace(
         |    text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
         |    '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g'),
         |    '[ \\t\\n\\r\\f]+', ' ', 'g')) AS text_rt
         |FROM documents
         |WHERE doc_id < $BpeEncodeDocs
         |  AND trim(regexp_replace(regexp_replace(regexp_replace(
         |    text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
         |    '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g'),
         |    '[ \\t\\n\\r\\f]+', ' ', 'g')) <> ''
         |ORDER BY doc_id""".stripMargin,

    // mirrors html_extract: the extraction of the synthesized shell is
    // derivable directly — title text + body text + the decoded entity
    // sentence (script code, css — including the style block that closes
    // with </script> inside — and comment gone, &amp;lt; single-decoded
    // to a literal &lt;) + the numeric-reference sentence (decimal 65→A,
    // hex 42→B, 8212→em dash, 169→©, control 7 and surrogate D800 kept
    // literal, &#38;amp;→literal &amp; and &amp;#65;→literal &#65; —
    // one decode per source reference), whitespace-collapsed over the
    // whole concatenation so an empty or padded document can't produce a
    // double separator
    "html_extract" ->
      """SELECT doc_id,
        |  trim(regexp_replace(
        |    'T' || CAST(doc_id AS VARCHAR) || ' ' || text ||
        |    ' A & B <ok> &lt;keep&gt; kept2 AB —© &#7; &#xD800; &amp; &#65;',
        |    '[ \t\n\r\f]+', ' ', 'g')) AS text_clean,
        |  CAST(25 AS BIGINT) AS n_tags,
        |  TRUE AS had_html
        |FROM documents ORDER BY doc_id""".stripMargin,

    // mirrors media_router: the modality each synthesized payload must
    // route to is pure doc_id arithmetic; the parser side has to agree
    // through real byte synthesis + three-gate routing
    "media_router" ->
      """SELECT CASE CAST(doc_id % 4 AS INTEGER)
        |    WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
        |    WHEN 2 THEN 'video' ELSE 'quarantine' END AS modality,
        |  CAST(count(*) AS BIGINT) AS n_docs
        |FROM documents GROUP BY 1 ORDER BY modality""".stripMargin,

    // mirrors video_meta: the brand / extent / timescale / duration the
    // Spark side must RECOVER from the synthesized ISO-BMFF bytes,
    // derived arithmetically — equality proves the box walk byte-for-byte
    "video_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'isom'
        |    WHEN 1 THEN 'mp42' ELSE 'avc1' END AS brand,
        |  CAST(doc_id % 1280 + 16 AS BIGINT) AS width,
        |  CAST(doc_id % 720 + 16 AS BIGINT) AS height,
        |  CAST(doc_id % 5 * 1000 + 1000 AS BIGINT) AS timescale,
        |  CAST(doc_id % 90000 + 1 AS BIGINT) AS duration
        |FROM documents ORDER BY doc_id""".stripMargin,

    // mirrors image_dims: the dimensions the Spark side must RECOVER from
    // the synthesized container bytes, derived arithmetically — equality
    // proves the synthesize→parse loop byte-for-byte
    "image_dims" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'png'
        |    WHEN 1 THEN 'gif' ELSE 'jpeg' END AS format,
        |  CAST(CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN doc_id % 900 + 100
        |    WHEN 1 THEN doc_id % 300 + 1
        |    ELSE doc_id % 1000 + 16 END AS BIGINT) AS width,
        |  CAST(CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN doc_id % 500 + 50
        |    WHEN 1 THEN doc_id % 200 + 1
        |    ELSE doc_id % 500 + 8 END AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,

    "media_features" ->
      """SELECT doc_id AS media_id, 'text' AS kind,
        |  CAST(octet_length(CAST(text AS BLOB)) AS INTEGER) AS n_bytes,
        |  CAST(octet_length(CAST(text AS BLOB)) % 640 AS INTEGER) AS width,
        |  CAST((octet_length(CAST(text AS BLOB)) * 7) % 480 AS INTEGER) AS height,
        |  substr(sha256(text), 1, 16) AS sha16
        |FROM documents ORDER BY media_id""".stripMargin,
  )

  // ------------------------------------------------- similarity oracle SQL

  /** Left-associative explicit dot-product chain — bit-matches the strict
    * in-order fold of [[graft.expressions.VecDot]].
    */
  private def dotChain(a: String, b: String): String =
    (1 to EmbedDims).map(i => s"$a[$i]*$b[$i]").mkString(" + ")

  /** Unrolled Lloyd CTE chain (the [[graft.ops.Kmeans]] twin — pagerank-
    * style iteration unrolling): c0 = lowest-id seeds; per iteration an
    * integer-exact micro-space argmin (ties → lower list_id) and a
    * floor(sum/cnt) centroid update that keeps an emptied cluster's
    * previous row via the LEFT JOIN coalesce.
    */
  private def kmeansCtes: String = {
    val sums = (1 to EmbedDims).map(j => s"sum(x[$j]) AS s$j").mkString(", ")
    val packed = (1 to EmbedDims).map(j => s"floor(s$j/cnt)")
      .mkString("list_value(", ", ", ")")
    val init =
      s"""e AS (SELECT vec_id,
         |    list_transform(CAST(embedding AS DOUBLE[]), q -> round(q*1000000.0)) AS x
         |  FROM embeddings),
         |c0 AS (SELECT CAST(vec_id AS INTEGER) AS list_id, x AS cv
         |  FROM e WHERE vec_id < $IvfCentroids)""".stripMargin
    val iters = (1 to KmeansIters).map { i =>
      s"""a$i AS (SELECT e.vec_id, e.x, c.list_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY (${dotChain("c.cv", "c.cv")}) - 2*(${dotChain("e.x", "c.cv")}), c.list_id) AS pr
         |  FROM e, c${i - 1} c),
         |u$i AS (SELECT list_id, count(*) AS cnt, $sums FROM a$i WHERE pr = 1 GROUP BY 1),
         |c$i AS (SELECT p.list_id, coalesce(u.ucv, p.cv) AS cv
         |  FROM c${i - 1} p LEFT JOIN
         |    (SELECT list_id, $packed AS ucv FROM u$i) u USING (list_id))""".stripMargin
    }
    (init +: iters).mkString(",\n")
  }

  /** Unrolled BPE training CTE chain (the [[graft.ops.Bpe]] twin): the
    * normalized word vocab, codepoint symbols + `</w>`, then per step a
    * pair count, a (cnt DESC, lhs, rhs) winner, and the leftmost
    * non-overlapping merge as a `list_reduce` fold over single-element
    * lists (acc and element must share a type, hence the wrapping; the
    * CASE mirrors [[graft.expressions.BpeMerge]] exactly).
    */
  private def bpeCtes(steps: Int): String = {
    val init =
      s"""w AS (SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (
         |    SELECT unnest(string_split(
         |      trim(regexp_replace(regexp_replace(regexp_replace(text,
         |        '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
         |        '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g'),
         |        '[ \\t\\n\\r\\f]+', ' ', 'g')), ' ')) AS word
         |    FROM documents)
         |  WHERE len(word) > 0 GROUP BY 1),
         |s0 AS (SELECT list_append(regexp_extract_all(word, '.'), '</w>') AS syms,
         |    freq FROM w)""".stripMargin
    val steps_ = (0 until steps).map { i =>
      s"""q$i AS (SELECT syms[j] AS lhs, syms[j + 1] AS rhs,
         |    CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT syms, freq,
         |      unnest(generate_series(1, len(syms) - 1)) AS j FROM s$i)
         |  GROUP BY 1, 2),
         |t$i AS (SELECT lhs, rhs, cnt FROM q$i
         |  ORDER BY cnt DESC, lhs, rhs LIMIT 1),
         |s${i + 1} AS (SELECT list_reduce(list_transform(s.syms, x -> [x]),
         |    (acc, e) -> CASE WHEN acc[-1] = t.lhs AND e[1] = t.rhs
         |      THEN list_append(array_pop_back(acc), acc[-1] || e[1])
         |      ELSE list_concat(acc, e) END) AS syms, s.freq
         |  FROM s$i s CROSS JOIN t$i t)""".stripMargin
    }
    (init +: steps_).mkString(",\n")
  }

  /** `0 ± v[1] ± v[2] …` hyperplane projection with the same md5-parity signs
    * the Spark side bakes in via [[Similarity.planeSigns]].
    */
  private def signChain(signs: Array[Double], v: String): String =
    "0" + signs.zipWithIndex.map { case (s, i) =>
      (if (s > 0) " + " else " - ") + s"$v[${i + 1}]"
    }.mkString

  /** Derived per-band plane count in static SQL, integer-exact mirror of
    * [[lshPlanesDerived]]: bitLength(ceil(n/occupancy) − 1) clamped to
    * [1, LshMaxPlanes], expressed as pure integer comparisons (P ≥ p iff
    * m > 2^(p−1)) so DuckDB and the JVM can never disagree by a float ULP.
    * Emitted as a one-row CTE `pl(np)` the bucket expressions cross-join.
    */
  private def planesCteSql: String = {
    val m = s"((count(*) + ${LshOccupancy - 1}) // $LshOccupancy)"
    val whens = (LshMaxPlanes to 2 by -1)
      .map(p => s"WHEN $m > ${1L << (p - 1)} THEN $p").mkString(" ")
    s"pl AS (SELECT (CASE $whens ELSE 1 END) AS np FROM embeddings)"
  }

  /** Per-band bucket expression: one sign chain per plane up to the
    * [[LshMaxPlanes]] cap, each gated on the derived count `pl.np` — planes
    * at index ≥ np contribute 0, so the static SQL computes exactly the
    * buckets the Spark side builds for any corpus size. Band `b` reads sign
    * rows [b·LshMaxPlanes, b·LshMaxPlanes + np), matching the fixed
    * `signStride = LshMaxPlanes` layout.
    */
  private def bucketSql(v: String, band: Int = 0): String = {
    val signs = Similarity.planeSigns(
      (LshBands - 1) * LshMaxPlanes + LshMaxPlanes, EmbedDims)
    (0 until LshMaxPlanes).map { p =>
      s"(CASE WHEN $p < pl.np AND ${signChain(signs(band * LshMaxPlanes + p), v)} > 0 THEN CAST(${1L << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    }.mkString(" + ")
  }

  private val NormCte =
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |nrm AS (SELECT vec_id, v, sqrt(${dotChain("v", "v")}) AS nr FROM e)""".stripMargin

  private def embedOracle: Map[String, String] = Map(
    "embed_topk" ->
      s"""$NormCte,
         |p AS (SELECT a.vec_id AS q, b.vec_id AS n_id,
         |    (${dotChain("a.v", "b.v")}) / nullif(a.nr * b.nr, 0) AS sim
         |  FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id
         |  WHERE a.vec_id < 50),
         |r AS (SELECT *, row_number() OVER
         |    (PARTITION BY q ORDER BY sim DESC, n_id) AS rn FROM p)
         |SELECT q, n_id, round(sim, 6) AS sim, rn FROM r WHERE rn <= 5
         |ORDER BY q, rn""".stripMargin,

    "hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label,
         |    CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nrm AS (SELECT vec_id, label, v,
         |    sqrt(${dotChain("v", "v")}) AS nr FROM e),
         |p AS (SELECT a.vec_id AS q, a.label AS q_label,
         |    b.vec_id AS n_id, b.label AS n_label,
         |    (${dotChain("a.v", "b.v")}) / nullif(a.nr * b.nr, 0) AS sim
         |  FROM nrm a JOIN nrm b ON a.label <> b.label
         |  WHERE a.vec_id < 30),
         |r AS (SELECT *, row_number() OVER
         |    (PARTITION BY q ORDER BY sim DESC, n_id) AS rn FROM p)
         |SELECT q, q_label, n_id, n_label, round(sim, 6) AS sim, rn
         |FROM r WHERE rn <= 5 ORDER BY q, rn""".stripMargin,

    // the search_topk lexical leg and the single-query cosine leg, each
    // ranked 1-based, full-outer fused with the fixed-order two-term RRF
    // chain; ranking on the RAW fused double (exact IEEE divisions of small
    // integers — identical cross-engine), rounding only in the projection
    "rrf_fusion" -> {
      val terms = Bm25Terms.zipWithIndex
      val k1p1 = s"CAST('${Bm25K1 + 1.0}' AS DOUBLE)"
      val k1 = s"CAST('$Bm25K1' AS DOUBLE)"
      val oneMinusB = s"CAST('${1.0 - Bm25B}' AS DOUBLE)"
      val bLit = s"CAST('$Bm25B' AS DOUBLE)"
      val tfCols = terms.map { case (t, i) =>
        s"CAST(len(list_filter(ts, x -> x = '$t')) AS DOUBLE) AS tf_$i" }.mkString(",\n  ")
      val dfAggs = terms.map { case (_, i) =>
        s"sum(CASE WHEN tf_$i > 0 THEN 1.0 ELSE 0.0 END) AS df_$i" }.mkString(", ")
      val scoreSum = terms.map { case (_, i) =>
        s"""ln((n_docs - df_$i + 0.5) / (df_$i + 0.5) + 1.0) * (tf_$i * $k1p1)
           | / (tf_$i + $k1 * ($oneMinusB + $bLit * (dl / avgdl)))""".stripMargin
      }.mkString(" + ")
      val anyMatch = terms.map { case (_, i) => s"tf_$i > 0" }.mkString(" OR ")
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |d AS (SELECT doc_id, CAST(len(ts) AS DOUBLE) AS dl,
         |  $tfCols
         |FROM t),
         |s AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl,
         |  $dfAggs FROM d),
         |v AS (SELECT doc_id, $scoreSum AS s_raw
         |  FROM d, s WHERE $anyMatch),
         |lx AS (SELECT doc_id, round(s_raw, 6) AS bm25 FROM v
         |  ORDER BY s_raw DESC, doc_id LIMIT $RrfPoolK),
         |lr AS (SELECT doc_id, CAST(row_number() OVER
         |    (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS lex_rank FROM lx),
         |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nrm AS (SELECT vec_id, v, sqrt(${dotChain("v", "v")}) AS nr FROM e),
         |p AS (SELECT b.vec_id AS doc_id,
         |    (${dotChain("a.v", "b.v")}) / nullif(a.nr * b.nr, 0) AS sim
         |  FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id
         |  WHERE a.vec_id = $RrfQueryVec),
         |sr AS (SELECT doc_id, sem_rank FROM (
         |    SELECT doc_id, CAST(row_number() OVER
         |      (ORDER BY sim DESC, doc_id) AS BIGINT) AS sem_rank FROM p)
         |  WHERE sem_rank <= $RrfPoolK),
         |f AS (SELECT coalesce(lr.doc_id, sr.doc_id) AS doc_id,
         |    lr.lex_rank, sr.sem_rank
         |  FROM lr FULL OUTER JOIN sr ON lr.doc_id = sr.doc_id),
         |g AS (SELECT doc_id, lex_rank, sem_rank,
         |    coalesce(CAST(1 AS DOUBLE) / (CAST($RrfC AS DOUBLE) + lex_rank),
         |             CAST(0 AS DOUBLE))
         |    + coalesce(CAST(1 AS DOUBLE) / (CAST($RrfC AS DOUBLE) + sem_rank),
         |               CAST(0 AS DOUBLE)) AS rrf_raw
         |  FROM f)
         |SELECT doc_id, lex_rank, sem_rank, round(rrf_raw, 6) AS rrf
         |FROM g ORDER BY rrf_raw DESC, doc_id LIMIT $SearchK""".stripMargin
    },

    // the ivf_topk ANN result joined to the exact cosine top-5 on
    // (query, neighbor): recall@5 + reciprocal rank of the true top-1 —
    // exact rationals of small integers, trivially engine-portable
    "rank_eval" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nrm AS (SELECT vec_id, v, sqrt(${dotChain("v", "v")}) AS nr FROM e),
         |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
         |    v AS cv, (${dotChain("v", "v")}) AS c2
         |  FROM e WHERE vec_id < $IvfCentroids),
         |a AS (SELECT e.vec_id, c.list_id, row_number() OVER
         |    (PARTITION BY e.vec_id
         |     ORDER BY c.c2 - CAST('2.0' AS DOUBLE) * (${dotChain("e.v", "c.cv")}),
         |       c.list_id) AS pr
         |  FROM e, c),
         |asg AS (SELECT vec_id, list_id FROM a WHERE pr = 1),
         |probe AS (SELECT vec_id AS q, list_id FROM a
         |  WHERE pr <= $IvfNProbe AND vec_id < $IvfQueryMax),
         |cand AS (SELECT p.q, s.vec_id AS n_id,
         |    (${dotChain("qa.v", "nb.v")}) / nullif(qa.nr * nb.nr, 0) AS sim
         |  FROM probe p
         |  JOIN asg s ON s.list_id = p.list_id AND s.vec_id <> p.q
         |  JOIN nrm qa ON qa.vec_id = p.q
         |  JOIN nrm nb ON nb.vec_id = s.vec_id),
         |ann AS (SELECT q, n_id, rn FROM (SELECT *, row_number() OVER
         |    (PARTITION BY q ORDER BY sim DESC, n_id) AS rn FROM cand)
         |  WHERE rn <= 5),
         |xp AS (SELECT a.vec_id AS q, b.vec_id AS n_id,
         |    (${dotChain("a.v", "b.v")}) / nullif(a.nr * b.nr, 0) AS sim
         |  FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id
         |  WHERE a.vec_id < $IvfQueryMax),
         |xr AS (SELECT q, n_id, rn FROM (SELECT *, row_number() OVER
         |    (PARTITION BY q ORDER BY sim DESC, n_id) AS rn FROM xp)
         |  WHERE rn <= 5),
         |hits AS (SELECT x.q, CAST(count(*) AS BIGINT) AS h
         |  FROM xr x JOIN ann ON ann.q = x.q AND ann.n_id = x.n_id
         |  GROUP BY x.q),
         |top1 AS (SELECT q, n_id FROM xr WHERE rn = 1),
         |rrq AS (SELECT t.q,
         |    coalesce(CAST(1 AS DOUBLE) / ann.rn, CAST(0 AS DOUBLE)) AS rrv
         |  FROM top1 t LEFT JOIN ann ON ann.q = t.q AND ann.n_id = t.n_id),
         |qs AS (SELECT DISTINCT q FROM xr)
         |SELECT qs.q,
         |  round(coalesce(h, 0) / CAST(5 AS DOUBLE), 6) AS recall,
         |  round(coalesce(rrv, CAST(0 AS DOUBLE)), 6) AS rr
         |FROM qs LEFT JOIN hits ON hits.q = qs.q LEFT JOIN rrq ON rrq.q = qs.q
         |ORDER BY qs.q""".stripMargin,

    // the greedy traversal unrolled: one (m_i, s_i) CTE pair per round —
    // m_i folds the new center into the running min with the SAME least
    // nesting the engine's chain produces, s_i is the argmax row (id
    // tie-break); distances micro-rounded only in the final projection
    "kcenter_select" -> {
      val rounds = (2 until KCenterK).map { i =>
        s""",
           |m$i AS (SELECT m.vec_id, m.v, m.p2,
           |    least(m.md, m.p2 + s.p2
           |      - CAST('2.0' AS DOUBLE) * (${dotChain("m.v", "s.v")})) AS md
           |  FROM m${i - 1} m, s${i - 1} s),
           |s$i AS (SELECT vec_id, v, p2, md FROM m$i
           |  ORDER BY md DESC, vec_id LIMIT 1)""".stripMargin
      }.mkString
      val sel = (1 until KCenterK).map { i =>
        s"""UNION ALL SELECT CAST($i AS INTEGER), vec_id,
           |  CAST(round(md * 1000000) AS BIGINT) FROM s$i""".stripMargin
      }.mkString("\n")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |n0 AS (SELECT vec_id, v, (${dotChain("v", "v")}) AS p2 FROM e),
         |c0 AS (SELECT vec_id, v, p2 FROM n0 ORDER BY vec_id LIMIT 1),
         |m1 AS (SELECT p.vec_id, p.v, p.p2,
         |    p.p2 + c.p2 - CAST('2.0' AS DOUBLE) * (${dotChain("p.v", "c.v")}) AS md
         |  FROM n0 p, c0 c),
         |s1 AS (SELECT vec_id, v, p2, md FROM m1
         |  ORDER BY md DESC, vec_id LIMIT 1)$rounds
         |SELECT CAST(0 AS INTEGER) AS sel_rank, vec_id,
         |  CAST(NULL AS BIGINT) AS dist_u FROM c0
         |$sel
         |ORDER BY sel_rank""".stripMargin
    },

    // full IVF search mirror: every vector's pr=1 list is its assignment,
    // a query's pr<=nProbe lists are its probes; exact cosine only inside
    // probed lists, top-5 by (sim desc, n_id) — identical op tree throughout
    "ivf_topk" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nrm AS (SELECT vec_id, v, sqrt(${dotChain("v", "v")}) AS nr FROM e),
         |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
         |    v AS cv, (${dotChain("v", "v")}) AS c2
         |  FROM e WHERE vec_id < $IvfCentroids),
         |a AS (SELECT e.vec_id, c.list_id, row_number() OVER
         |    (PARTITION BY e.vec_id
         |     ORDER BY c.c2 - CAST('2.0' AS DOUBLE) * (${dotChain("e.v", "c.cv")}),
         |       c.list_id) AS pr
         |  FROM e, c),
         |asg AS (SELECT vec_id, list_id FROM a WHERE pr = 1),
         |probe AS (SELECT vec_id AS q, list_id FROM a
         |  WHERE pr <= $IvfNProbe AND vec_id < $IvfQueryMax),
         |cand AS (SELECT p.q, s.vec_id AS n_id,
         |    (${dotChain("qa.v", "nb.v")}) / nullif(qa.nr * nb.nr, 0) AS sim
         |  FROM probe p
         |  JOIN asg s ON s.list_id = p.list_id AND s.vec_id <> p.q
         |  JOIN nrm qa ON qa.vec_id = p.q
         |  JOIN nrm nb ON nb.vec_id = s.vec_id),
         |r AS (SELECT *, row_number() OVER
         |    (PARTITION BY q ORDER BY sim DESC, n_id) AS rn FROM cand)
         |SELECT q, n_id, round(sim, 6) AS sim, rn FROM r WHERE rn <= 5
         |ORDER BY q, rn""".stripMargin,

    // same |c|² − 2 v·c ranking the engine computes, over the same fixed
    // codebook rows; 2.0 forced to DOUBLE (DuckDB decimal-literal trap)
    "ivf_assign" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
         |    v AS cv, (${dotChain("v", "v")}) AS c2
         |  FROM e WHERE vec_id < $IvfCentroids),
         |d AS (SELECT e.vec_id, c.list_id,
         |    c.c2 - CAST('2.0' AS DOUBLE) * (${dotChain("e.v", "c.cv")}) AS dd
         |  FROM e, c),
         |r AS (SELECT vec_id, list_id, row_number() OVER
         |    (PARTITION BY vec_id ORDER BY dd, list_id) AS pr FROM d)
         |SELECT vec_id, CAST(list_id AS INTEGER) AS list_id
         |FROM r WHERE pr = 1 ORDER BY vec_id""".stripMargin,

    "bpe_pairs" ->
      s"""WITH ${bpeCtes(0)}
         |SELECT syms[j] AS lhs, syms[j + 1] AS rhs,
         |  CAST(sum(freq) AS BIGINT) AS cnt
         |FROM (SELECT syms, freq,
         |    unnest(generate_series(1, len(syms) - 1)) AS j FROM s0)
         |GROUP BY 1, 2 ORDER BY lhs, rhs""".stripMargin,

    "bpe_merges" -> {
      val rows = (0 until BpeMergeSteps).map(i =>
        s"SELECT $i AS step, lhs, rhs, cnt FROM t$i")
      s"""WITH ${bpeCtes(BpeMergeSteps)}
         |${rows.mkString("\nUNION ALL ")}
         |ORDER BY step""".stripMargin
    },

    // replay the learned merges over the cohort's words (one fold CTE per
    // rank — the exact semantics BpeApply reproduces table-size-free), then
    // assign ids: base symbols binary-sorted, then merge outputs by rank,
    // first spelling wins
    "bpe_encode" -> {
      val folds = (0 until BpeMergeSteps).map { i =>
        s"""e${i + 1} AS (SELECT e.doc_id, e.wi, list_reduce(
           |    list_transform(e.syms, x -> [x]),
           |    (acc, el) -> CASE WHEN acc[-1] = t.lhs AND el[1] = t.rhs
           |      THEN list_append(array_pop_back(acc), acc[-1] || el[1])
           |      ELSE list_concat(acc, el) END) AS syms
           |  FROM e$i e CROSS JOIN t$i t)""".stripMargin
      }
      val mergeRows = (0 until BpeMergeSteps).map(i =>
        s"SELECT $i AS step, lhs || rhs AS sym FROM t$i")
      s"""WITH ${bpeCtes(BpeMergeSteps)},
         |docw AS (SELECT doc_id, wi, ws[wi + 1] AS word FROM (
         |    SELECT doc_id, ws, unnest(generate_series(0, len(ws) - 1)) AS wi
         |    FROM (SELECT doc_id, string_split(
         |        trim(regexp_replace(regexp_replace(regexp_replace(text,
         |          '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]', '', 'g'),
         |          '[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]', '', 'g'),
         |          '[ \\t\\n\\r\\f]+', ' ', 'g')), ' ') AS ws
         |      FROM documents WHERE doc_id < $BpeEncodeDocs))
         |  WHERE len(ws[wi + 1]) > 0),
         |e0 AS (SELECT doc_id, wi,
         |    list_append(regexp_extract_all(word, '.'), '</w>') AS syms
         |  FROM docw),
         |${folds.mkString(",\n")},
         |base AS (SELECT DISTINCT sym FROM
         |  (SELECT unnest(syms) AS sym FROM s0)),
         |bids AS (SELECT sym,
         |    CAST(row_number() OVER (ORDER BY sym) - 1 AS BIGINT) AS id
         |  FROM base),
         |mnew AS (SELECT sym, min(step) AS st FROM
         |    (${mergeRows.mkString(" UNION ALL ")})
         |  WHERE sym NOT IN (SELECT sym FROM base) GROUP BY 1),
         |mids AS (SELECT sym, (SELECT count(*) FROM base)
         |    + CAST(row_number() OVER (ORDER BY st) - 1 AS BIGINT) AS id
         |  FROM mnew),
         |vids AS (SELECT sym, id FROM bids UNION ALL SELECT sym, id FROM mids),
         |tok AS (SELECT doc_id, CAST(wi AS INTEGER) AS wi,
         |    CAST(tj AS INTEGER) AS tj, syms[tj + 1] AS token FROM (
         |    SELECT doc_id, wi, syms,
         |      unnest(generate_series(0, len(syms) - 1)) AS tj
         |    FROM e$BpeMergeSteps))
         |SELECT t.doc_id, t.wi, t.tj, t.token, v.id AS token_id
         |FROM tok t JOIN vids v ON t.token = v.sym
         |ORDER BY doc_id, wi, tj""".stripMargin
    },

    "kmeans_centroids" ->
      s"""WITH $kmeansCtes
         |SELECT list_id, CAST(t.i AS INTEGER) AS pos,
         |  CAST(cv[t.i + 1] AS BIGINT) AS c_micro
         |FROM c$KmeansIters, range($EmbedDims) t(i)
         |ORDER BY list_id, pos""".stripMargin,

    "kmeans_assign" ->
      s"""WITH $kmeansCtes,
         |af AS (SELECT e.vec_id, c.list_id,
         |    row_number() OVER (PARTITION BY e.vec_id
         |      ORDER BY (${dotChain("c.cv", "c.cv")}) - 2*(${dotChain("e.x", "c.cv")}), c.list_id) AS pr
         |  FROM e, c$KmeansIters c)
         |SELECT vec_id, CAST(list_id AS INTEGER) AS list_id
         |FROM af WHERE pr = 1 ORDER BY vec_id""".stripMargin,

    "embed_lsh" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |$planesCteSql,
         |b AS (SELECT vec_id, ${bucketSql("v")} AS bucket FROM e CROSS JOIN pl)
         |SELECT vec_id, bucket,
         |  CAST(count(*) OVER (PARTITION BY bucket) AS BIGINT) AS bucket_size
         |FROM b ORDER BY vec_id""".stripMargin,

    // same md5-parity sign rows as the engine's planeSigns; each component
    // is the signChain fold divided by the identical √dOut double literal
    "embed_project" -> {
      val signs = Similarity.planeSigns(ProjDims, EmbedDims)
      val scale = math.sqrt(ProjDims.toDouble)
      val comps = (0 until ProjDims)
        .map(j => s"round((${signChain(signs(j), "v")}) / $scale, 6) AS p$j")
        .mkString(",\n         ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
         |SELECT vec_id, $comps
         |FROM e ORDER BY vec_id""".stripMargin
    },

    "dedup_embed" -> {
      val bandSelects = (0 until LshBands).map(bnd =>
        s"SELECT vec_id, $bnd AS band, ${bucketSql("v", bnd)} AS bucket FROM e CROSS JOIN pl")
        .mkString("\n  UNION ALL\n  ")
      s"""$NormCte,
         |$planesCteSql,
         |bk AS (
         |  $bandSelects),
         |cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    CAST(count(*) AS BIGINT) AS bands_shared
         |  FROM bk a JOIN bk b
         |    ON a.band = b.band AND a.bucket = b.bucket AND a.vec_id < b.vec_id
         |  GROUP BY 1, 2),
         |j AS (SELECT c.id_a, c.id_b, c.bands_shared,
         |    (${dotChain("a.v", "b.v")}) / nullif(a.nr * b.nr, 0) AS sim
         |  FROM cand c
         |  JOIN nrm a ON a.vec_id = c.id_a
         |  JOIN nrm b ON b.vec_id = c.id_b)
         |SELECT id_a, id_b, bands_shared, round(sim, 6) AS sim
         |FROM j WHERE sim >= $EmbedDupThreshold ORDER BY id_a, id_b""".stripMargin
    },

    "embed_centroids" -> {
      val comps = (1 to EmbedDims)
        .map(i => f"round(avg(CAST(embedding[$i] AS DOUBLE)), 6) AS c$i%02d")
        .mkString(",\n  ")
      s"""SELECT label, CAST(count(*) AS BIGINT) AS n,
         |  $comps
         |FROM embeddings GROUP BY label ORDER BY label""".stripMargin
    },

    // DuckDB's native ASOF JOIN verifies the union+window engine shape; the
    // click side is deduped per (user, ts) by max event_id on both engines
    "asof_enrich" ->
      """WITH p AS (SELECT event_id, user_id, ts, value FROM events
        |           WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts, arg_max(value, event_id) AS click_value
        |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
        |SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
        |  round(p.value, 6) AS value,
        |  epoch_ms(c.ts) AS click_ms, round(c.click_value, 6) AS click_value
        |FROM p ASOF LEFT JOIN c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts
        |ORDER BY event_id""".stripMargin,

    "cdc_apply" ->
      s"""WITH snap AS (
         |  SELECT user_id, value, event_id FROM events
         |  WHERE ts < TIMESTAMP '$CdcCutoff'
         |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1),
         |net AS (
         |  SELECT user_id, event_id, value,
         |    CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op
         |  FROM events WHERE ts >= TIMESTAMP '$CdcCutoff'
         |  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) = 1)
         |SELECT coalesce(n.user_id, s.user_id) AS user_id,
         |  round(CASE WHEN n.user_id IS NOT NULL THEN n.value ELSE s.value END, 6) AS value,
         |  CAST(CASE WHEN n.user_id IS NOT NULL THEN n.event_id ELSE s.event_id END AS BIGINT)
         |    AS last_event_id,
         |  n.user_id IS NOT NULL AS changed
         |FROM snap s FULL OUTER JOIN net n ON s.user_id = n.user_id
         |WHERE n.op IS NULL OR n.op <> 'D'
         |ORDER BY user_id""".stripMargin,

    // full recompute — the merge path must hash-match this exactly
    "incr_rollup" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |    AND value IS NOT NULL)
        |SELECT user_id, day, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents,
        |  CAST(min(cents) AS BIGINT) AS min_cents,
        |  CAST(max(cents) AS BIGINT) AS max_cents,
        |  round(CAST(sum(cents) AS DOUBLE) / count(*), 6) AS avg_cents
        |FROM e GROUP BY 1, 2 ORDER BY user_id, day""".stripMargin,

    "scd2_history" ->
      """SELECT user_id,
        |  CAST(row_number() OVER w AS BIGINT) AS version,
        |  round(value, 6) AS value,
        |  epoch_ms(ts) AS from_ms,
        |  epoch_ms(lead(ts, 1) OVER w) AS to_ms,
        |  lead(ts, 1) OVER w IS NULL AS is_current
        |FROM events WHERE event_type = 'purchase'
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, version""".stripMargin,

    "range_join_bin" ->
      """WITH bands(band, lo, hi) AS (VALUES
        |  ('micro', CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)),
        |  ('tiny',  CAST(1 AS DOUBLE), CAST(5 AS DOUBLE)),
        |  ('small', CAST(5 AS DOUBLE), CAST(20 AS DOUBLE)),
        |  ('mid',   CAST(20 AS DOUBLE), CAST(60 AS DOUBLE)),
        |  ('large', CAST(60 AS DOUBLE), CAST(150 AS DOUBLE)),
        |  ('huge',  CAST(150 AS DOUBLE), CAST(500 AS DOUBLE)))
        |SELECT band, lo, hi, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
        |FROM events e JOIN bands b ON e.value >= b.lo AND e.value < b.hi
        |GROUP BY band, lo, hi
        |ORDER BY lo""".stripMargin,

    // same op tree as Curation.prioritySample: u = (CAST(bucket AS DOUBLE)
    // + 0.5) / 2^20, priority = CAST(w AS DOUBLE) / u — only +,/ so the
    // double is bit-identical and the rank order cannot diverge
    "weighted_sample" ->
      s"""SELECT doc_id, lang, rk, priority FROM (
         |  SELECT doc_id, lang,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY pri DESC, doc_id)
         |      AS BIGINT) AS rk,
         |    round(pri, 4) AS priority
         |  FROM (SELECT doc_id, lang,
         |      CAST(n_chars AS DOUBLE) /
         |        ((CAST(CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR)), 1, 16))::UBIGINT
         |            % ${1 << 20} AS BIGINT) AS DOUBLE)
         |          + CAST('0.5' AS DOUBLE)) / ${1 << 20}) AS pri
         |    FROM documents))
         |WHERE rk <= $PriSampleK
         |ORDER BY lang, rk""".stripMargin,

    "topp_cap" ->
      s"""WITH d AS (SELECT doc_id, source,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |w AS (SELECT doc_id, source, n_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source
         |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
         |    CAST(sum(n_tokens) OVER (PARTITION BY source
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         |      AS BIGINT) AS total_tokens
         |  FROM d)
         |SELECT doc_id, source, n_tokens, cum_tokens, total_tokens,
         |  CAST(cum_tokens - n_tokens AS DOUBLE)
         |    < CAST('$ToppP' AS DOUBLE) * CAST(total_tokens AS DOUBLE) AS keep
         |FROM w ORDER BY doc_id""".stripMargin,

    // mirror of BitsetDistinct.finish: positions are the engine's stable
    // sha256 bucket of "value#j", estimate is -m * ln(1 - n_set/m) rounded
    // recompute the window bitset from raw positions per trailing window —
    // merge(build(day…)) must equal build(window) exactly (OR idempotence)
    "sliding_distinct" ->
      s"""WITH e AS (SELECT DISTINCT CAST(ts AS DATE) AS day,
         |    CAST(user_id AS VARCHAR) AS v
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |days AS (SELECT DISTINCT day FROM e),
         |pos AS (SELECT DISTINCT day,
         |    CAST(('0x' || substr(sha256(v || '#' || CAST(j AS VARCHAR)),
         |        1, 16))::UBIGINT % $BloomM AS BIGINT) AS p
         |  FROM e, (SELECT unnest([${(0 until BloomK).mkString(", ")}]) AS j) js),
         |w AS (SELECT d.day, CAST(count(DISTINCT p.p) AS BIGINT) AS n_set
         |  FROM days d JOIN pos p ON p.day BETWEEN d.day - ${SlideDays - 1}
         |    AND d.day
         |  GROUP BY 1),
         |ex AS (SELECT d.day, CAST(count(DISTINCT e2.v) AS BIGINT) AS n_exact
         |  FROM days d JOIN e e2 ON e2.day BETWEEN d.day - ${SlideDays - 1}
         |    AND d.day
         |  GROUP BY 1)
         |SELECT w.day, ex.n_exact, w.n_set,
         |  round(-$BloomM * ln(1 - CAST(w.n_set AS DOUBLE) / $BloomM), 4)
         |    AS est_distinct
         |FROM w JOIN ex USING (day) ORDER BY day""".stripMargin,

    "bloom_semi" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_nationkey = 1)
        |ORDER BY o_orderkey""".stripMargin,

    // the same k sha256 positions as BitsetBuild / bloomMightContain;
    // "hit" = every position of the fact key present in the dim subset's
    // position set (set membership ≡ bit test)
    "bloom_prune" -> {
      val hit = (0 until BloomK).map(j =>
        s"""(CAST(('0x' || substr(sha256(CAST(o_custkey AS VARCHAR) || '#$j'),
           |      1, 16))::UBIGINT % $BloomM AS BIGINT)
           |  IN (SELECT p FROM pos))""".stripMargin).mkString("\n  AND ")
      s"""WITH sm AS (SELECT DISTINCT c_custkey FROM customer
         |  WHERE c_nationkey = 1),
         |pos AS (SELECT DISTINCT
         |    CAST(('0x' || substr(sha256(CAST(c_custkey AS VARCHAR) || '#'
         |        || CAST(j AS VARCHAR)), 1, 16))::UBIGINT % $BloomM AS BIGINT) AS p
         |  FROM sm, (SELECT unnest([${(0 until BloomK).mkString(", ")}]) AS j) js),
         |f AS (SELECT o_custkey,
         |    ($hit) AS hit,
         |    o_custkey IN (SELECT c_custkey FROM sm) AS mt
         |  FROM orders WHERE o_custkey IS NOT NULL)
         |SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         |  CAST(sum(CASE WHEN mt THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
         |  CAST(sum(CASE WHEN hit AND NOT mt THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_false_pos,
         |  CAST(sum(CASE WHEN NOT hit AND mt THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_false_neg
         |FROM f""".stripMargin
    },

    // per-day registers max-merged into each trailing window (observed
    // days only), then the same exact-integer state rollup as hll_distinct
    "hll_sliding" ->
      s"""WITH b AS (
         |  SELECT CAST(ts AS DATE) AS day,
         |    CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
         |      % ${HllM}::UBIGINT AS BIGINT) AS bucket,
         |    ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 17, 16))::UBIGINT
         |      % 4611686018427387904::UBIGINT AS w62
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |reg AS (SELECT day, bucket,
         |    max(CASE WHEN w62 = 0 THEN 63
         |             ELSE 63 - length(bin(w62)) END) AS r
         |  FROM b GROUP BY 1, 2),
         |days AS (SELECT DISTINCT day FROM reg),
         |win AS (SELECT d.day, r.bucket, max(r.r) AS r
         |  FROM days d JOIN reg r ON r.day BETWEEN d.day - ${SlideDays - 1}
         |    AND d.day
         |  GROUP BY 1, 2)
         |SELECT day AS day_date,
         |  CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST($HllM - count(*) AS BIGINT) AS v_zero,
         |  CAST(sum(CAST(1 AS HUGEINT) << (63 - r))
         |    + ($HllM - count(*)) * (CAST(1 AS HUGEINT) << 63) AS VARCHAR)
         |    AS denom_scaled
         |FROM win GROUP BY 1 ORDER BY day_date""".stripMargin,

    // word-for-word HLL register rebuild: same sha256 words, same 62-bit
    // rho window (rho = 63 - bitlen, w=0 -> 63), same max
    "hll_registers" ->
      s"""WITH b AS (
         |  SELECT CAST(ts AS DATE) AS day_date,
         |    CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
         |      % ${HllM}::UBIGINT AS BIGINT) AS bucket,
         |    ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 17, 16))::UBIGINT
         |      % 4611686018427387904::UBIGINT AS w62
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL)
         |SELECT day_date, bucket,
         |  CAST(max(CASE WHEN w62 = 0 THEN 63
         |                ELSE 63 - length(bin(w62)) END) AS INTEGER) AS r
         |FROM b GROUP BY 1, 2 ORDER BY day_date, bucket""".stripMargin,

    // exact-integer HLL state: HUGEINT shifts keep the 2^63-scaled
    // denominator exact (2^(63-r) per register + 2^63 per empty register)
    "hll_distinct" ->
      s"""WITH b AS (
         |  SELECT CAST(ts AS DATE) AS day_date,
         |    CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
         |      % ${HllM}::UBIGINT AS BIGINT) AS bucket,
         |    ('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 17, 16))::UBIGINT
         |      % 4611686018427387904::UBIGINT AS w62
         |  FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL),
         |reg AS (SELECT day_date, bucket,
         |    max(CASE WHEN w62 = 0 THEN 63
         |             ELSE 63 - length(bin(w62)) END) AS r
         |  FROM b GROUP BY 1, 2)
         |SELECT day_date,
         |  CAST(count(*) AS BIGINT) AS n_buckets,
         |  CAST($HllM - count(*) AS BIGINT) AS v_zero,
         |  CAST(sum(CAST(1 AS HUGEINT) << (63 - r))
         |    + ($HllM - count(*)) * (CAST(1 AS HUGEINT) << 63) AS VARCHAR)
         |    AS denom_scaled
         |FROM reg GROUP BY 1 ORDER BY day_date""".stripMargin,

    // naive bottom-k rebuild of the bounded KMV aggregator: window rank
    // over ALL distinct 62-bit hashes — the hash match proves the k-long
    // sketch state ≡ the k smallest of the full distinct set
    "kmv_minhash" ->
      s"""WITH h AS (
         |  SELECT DISTINCT CAST(ts AS DATE) AS day_date,
         |    CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
         |      % 4611686018427387904::UBIGINT AS BIGINT) AS hv
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |r AS (SELECT day_date, hv,
         |    row_number() OVER (PARTITION BY day_date ORDER BY hv) AS rk
         |  FROM h)
         |SELECT day_date, CAST(rk AS INTEGER) AS rank, hv
         |FROM r WHERE rk <= $KmvK ORDER BY day_date, rank""".stripMargin,

    // exact-integer KMV estimator state: sketch size + the kth minimum
    // (the 2^62-scaled theta); exact distinct rides as the audit column
    "kmv_distinct" ->
      s"""WITH h AS (
         |  SELECT DISTINCT CAST(ts AS DATE) AS day_date,
         |    CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
         |      % 4611686018427387904::UBIGINT AS BIGINT) AS hv
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |r AS (SELECT day_date, hv,
         |    row_number() OVER (PARTITION BY day_date ORDER BY hv) AS rk
         |  FROM h),
         |st AS (SELECT day_date, CAST(count(*) AS BIGINT) AS n_kept,
         |    max(hv) AS kth_scaled
         |  FROM r WHERE rk <= $KmvK GROUP BY 1),
         |ex AS (SELECT CAST(ts AS DATE) AS day_date,
         |    CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1)
         |SELECT st.day_date, n_kept, kth_scaled, n_exact
         |FROM st JOIN ex USING (day_date) ORDER BY day_date""".stripMargin,

    // the KMV set operation, re-derived: per-pair union minima are the k
    // smallest over both segments' bottom-k lists; membership flags mark
    // presence in each sketch, and n_inter counts union minima in BOTH
    "kmv_overlap" ->
      s"""WITH h AS (
         |  SELECT DISTINCT CAST(ts AS DATE) AS day_date,
         |    CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR)), 1, 16))::UBIGINT
         |      % 4611686018427387904::UBIGINT AS BIGINT) AS hv
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |r AS (SELECT day_date, hv,
         |    row_number() OVER (PARTITION BY day_date ORDER BY hv) AS rk
         |  FROM h),
         |m AS (SELECT day_date, hv FROM r WHERE rk <= $KmvK),
         |s AS (SELECT DISTINCT day_date FROM m),
         |p AS (SELECT a.day_date AS seg_a, b.day_date AS seg_b
         |  FROM s a JOIN s b ON a.day_date < b.day_date),
         |u AS (SELECT p.seg_a, p.seg_b, m.hv,
         |    max(CASE WHEN m.day_date = p.seg_a THEN 1 ELSE 0 END) AS in_a,
         |    max(CASE WHEN m.day_date = p.seg_b THEN 1 ELSE 0 END) AS in_b
         |  FROM p JOIN m ON m.day_date IN (p.seg_a, p.seg_b)
         |  GROUP BY 1, 2, 3),
         |rk AS (SELECT *, row_number()
         |    OVER (PARTITION BY seg_a, seg_b ORDER BY hv) AS rnk FROM u)
         |SELECT seg_a, seg_b,
         |  CAST(count(*) AS BIGINT) AS k_union,
         |  max(hv) AS kth_union,
         |  CAST(sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_inter
         |FROM rk WHERE rnk <= $KmvK GROUP BY 1, 2
         |ORDER BY seg_a, seg_b""".stripMargin,

    // same sha256-position + linear-counting rebuild as bloom_distinct,
    // keyed by day instead of event_type
    "approx_users_daily" ->
      s"""WITH pos AS (
         |  SELECT CAST(ts AS DATE) AS day_date,
         |    CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR) || '#'
         |        || CAST(j AS VARCHAR)), 1, 16))::UBIGINT % $BloomM AS BIGINT) AS p
         |  FROM events, (SELECT unnest([${(0 until BloomK).mkString(", ")}]) AS j) js
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |s AS (SELECT day_date, CAST(count(DISTINCT p) AS BIGINT) AS n_set
         |  FROM pos GROUP BY 1),
         |e AS (SELECT CAST(ts AS DATE) AS day_date,
         |    CAST(count(*) AS BIGINT) AS n_events
         |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL GROUP BY 1)
         |SELECT day_date, n_events, n_set,
         |  round(-$BloomM * ln(1 - CAST(n_set AS DOUBLE) / $BloomM), 4)
         |    AS approx_users
         |FROM e JOIN s USING (day_date)
         |ORDER BY day_date""".stripMargin,

    // mirrors DataQuality.madOutliers over per-user daily volumes: exact
    // medians (DuckDB median interpolates even counts like Spark's
    // percentile), deviations in halves so the strict > is binary-exact
    "mad_outliers" ->
      """WITH dc AS (SELECT user_id, CAST(ts AS DATE) AS day,
        |    CAST(count(*) AS BIGINT) AS cnt
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
        |  GROUP BY 1, 2),
        |md AS (SELECT user_id, median(cnt) AS med FROM dc GROUP BY 1),
        |dv AS (SELECT dc.user_id, dc.day, dc.cnt, md.med,
        |    abs(dc.cnt - md.med) AS dev
        |  FROM dc JOIN md USING (user_id)),
        |ma AS (SELECT user_id, median(dev) AS mad FROM dv GROUP BY 1)
        |SELECT d.user_id, d.day, d.cnt, round(d.med, 6) AS med,
        |  round(m.mad, 6) AS mad, (d.dev > 3 * m.mad) AS is_outlier
        |FROM dv d JOIN ma m USING (user_id)
        |ORDER BY user_id, day""".stripMargin,

    "bloom_distinct" ->
      s"""WITH pos AS (
         |  SELECT event_type,
         |    CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR) || '#'
         |        || CAST(j AS VARCHAR)), 1, 16))::UBIGINT % $BloomM AS BIGINT) AS p
         |  FROM events, (SELECT unnest([${(0 until BloomK).mkString(", ")}]) AS j) js
         |  WHERE user_id IS NOT NULL),
         |s AS (SELECT event_type, CAST(count(DISTINCT p) AS BIGINT) AS n_set
         |  FROM pos GROUP BY 1),
         |e AS (SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
         |  FROM events GROUP BY 1)
         |SELECT event_type, n_exact, n_set,
         |  round(-$BloomM * ln(1 - CAST(n_set AS DOUBLE) / $BloomM), 4)
         |    AS est_distinct
         |FROM e JOIN s USING (event_type)
         |ORDER BY event_type""".stripMargin,

    // rebuilds the CMS counter matrix cell-for-cell from the same rows,
    // then reads each probe's estimate as the min over its depth cells
    "cms_freq" ->
      s"""WITH js AS (SELECT unnest([${(0 until CmsDepth).mkString(", ")}]) AS j),
         |h AS (
         |  SELECT j,
         |    CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR) || '#'
         |        || CAST(j AS VARCHAR)), 1, 16))::UBIGINT % $CmsWidth AS BIGINT) AS p
         |  FROM events, js WHERE user_id IS NOT NULL),
         |cells AS (SELECT j, p, CAST(count(*) AS BIGINT) AS c
         |          FROM h GROUP BY 1, 2),
         |ex AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
         |       FROM events WHERE user_id IS NOT NULL GROUP BY 1),
         |pe AS (
         |  SELECT user_id, j,
         |    CAST(('0x' || substr(sha256(CAST(user_id AS VARCHAR) || '#'
         |        || CAST(j AS VARCHAR)), 1, 16))::UBIGINT % $CmsWidth AS BIGINT) AS p
         |  FROM ex, js),
         |est AS (SELECT user_id, CAST(min(c.c) AS BIGINT) AS cms_est
         |        FROM pe JOIN cells c USING (j, p) GROUP BY 1)
         |SELECT user_id, exact_cnt, cms_est, cms_est >= exact_cnt AS never_undercounts
         |FROM ex JOIN est USING (user_id)
         |ORDER BY user_id""".stripMargin,

    "gap_fill" ->
      s"""WITH obs AS (SELECT user_id, date_trunc('hour', ts) AS h,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM events
         |  WHERE user_id < $GapFillMaxUid AND user_id IS NOT NULL
         |    AND ts IS NOT NULL
         |  GROUP BY 1, 2),
         |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY 1),
         |grid AS (SELECT user_id,
         |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
         |  FROM span)
         |SELECT g.user_id, epoch_ms(g.h) AS hour_ms,
         |  CAST(coalesce(o.n, 0) AS BIGINT) AS n_events
         |FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.h = o.h
         |ORDER BY g.user_id, hour_ms""".stripMargin,

    // same op tree as Stats.winsorize: integer-cent units → exact-input
    // quantile interpolation → double clip → round at the edge
    "winsorize" ->
      s"""WITH u AS (SELECT event_id, event_type,
         |    CAST(round(value * 100) AS BIGINT) AS uu
         |  FROM events),
         |b AS (SELECT event_type,
         |    quantile_cont(uu, CAST('$WinsorLo' AS DOUBLE)) AS lo,
         |    quantile_cont(uu, CAST('$WinsorHi' AS DOUBLE)) AS hi
         |  FROM u GROUP BY 1)
         |SELECT u.event_id, u.event_type,
         |  round(least(greatest(CAST(uu AS DOUBLE), lo), hi) / 100, 6) AS clipped,
         |  CAST(uu AS DOUBLE) < lo OR CAST(uu AS DOUBLE) > hi AS was_clipped
         |FROM u JOIN b USING (event_type)
         |ORDER BY event_id""".stripMargin,

    "value_deciles" ->
      """SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  round(min(value), 6) AS lo, round(max(value), 6) AS hi
        |FROM (SELECT event_type, value, event_id, ntile(10) OVER
        |    (PARTITION BY event_type ORDER BY value, event_id) AS bucket
        |  FROM events WHERE value IS NOT NULL)
        |GROUP BY 1, 2
        |ORDER BY event_type, bucket""".stripMargin,

    // zero-overlap twin of the doc_chunks CTE, then corpus-wide
    // first-occurrence rank on the chunk digest
    "chunk_dedup" ->
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
         |c AS (SELECT doc_id, ts,
         |    unnest(range(1, greatest(len(ts), 1) + 1, $ChunkTokens)) AS chunk_start
         |  FROM t),
         |ch AS (SELECT doc_id,
         |    CAST((chunk_start - 1) // $ChunkTokens AS BIGINT) AS chunk_idx,
         |    md5(array_to_string(ts[chunk_start : chunk_start + ${ChunkTokens - 1}],
         |        ' ')) AS chunk_md5
         |  FROM c),
         |r AS (SELECT doc_id,
         |    row_number() OVER (PARTITION BY chunk_md5
         |      ORDER BY doc_id, chunk_idx) AS rn
         |  FROM ch)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
         |  round(CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS dup_frac
         |FROM r GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // same first-occurrence rule, re-stitched with an ordered string_agg
    // (empty when every segment of a doc was scrubbed). Mirrors the Spark
    // side's md5(seg) window key — semantically identical to partitioning
    // by the raw text (equal segs share a digest; collisions ~n²/2¹²⁸)
    "scrub_dupes" ->
      s"""WITH t AS (SELECT doc_id,
         |    string_split(coalesce(text, ''), ' ') AS ts FROM documents),
         |c AS (SELECT doc_id, ts,
         |    unnest(range(1, greatest(len(ts), 1) + 1, $ScrubTokens)) AS s
         |  FROM t),
         |seg AS (SELECT doc_id,
         |    CAST((s - 1) // $ScrubTokens AS BIGINT) AS seg_idx,
         |    array_to_string(ts[s : s + ${ScrubTokens - 1}], ' ') AS seg
         |  FROM c),
         |r AS (SELECT doc_id, seg_idx, seg,
         |    row_number() OVER (PARTITION BY md5(seg)
         |      ORDER BY doc_id, seg_idx) AS rn
         |  FROM seg)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segs,
         |  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
         |  coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
         |    ORDER BY seg_idx), '') AS clean_text
         |FROM r GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin,

    // stride-1 window digests; a window with corpus-wide occurrence ≥2 is
    // duplicated (md5 key mirrors the Spark side; counts are digest-exact)
    "dup_spans" ->
      s"""WITH t AS (SELECT doc_id,
         |    string_split(coalesce(text, ''), ' ') AS ts FROM documents),
         |c AS (SELECT doc_id, ts,
         |    unnest(range(1, greatest(len(ts) - ${ScrubTokens - 1}, 1) + 1)) AS s
         |  FROM t),
         |win AS (SELECT doc_id,
         |    md5(array_to_string(ts[s : s + ${ScrubTokens - 1}], ' ')) AS wkey
         |  FROM c),
         |o AS (SELECT doc_id, count(*) OVER (PARTITION BY wkey) AS occ
         |  FROM win)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_windows,
         |  round(CAST(sum(CASE WHEN occ >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         |    / count(*), 6) AS dup_frac
         |FROM o GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // same window keys; later occurrences (rn > 1) cover their w token
    // positions; docs re-assemble from uncovered tokens (DuckDB zips the
    // token and ordinal unnests; string_agg skips covered/null tokens)
    "scrub_spans" ->
      s"""WITH t AS (SELECT doc_id,
         |    string_split(coalesce(text, ''), ' ') AS ts FROM documents),
         |win AS (SELECT doc_id, s AS pos,
         |    md5(array_to_string(ts[s : s + ${ScrubTokens - 1}], ' ')) AS wkey
         |  FROM (SELECT doc_id, ts,
         |      unnest(range(1, greatest(len(ts) - ${ScrubTokens - 1}, 1) + 1)) AS s
         |    FROM t)),
         |r AS (SELECT doc_id, pos,
         |    row_number() OVER (PARTITION BY wkey ORDER BY doc_id, pos) AS rn
         |  FROM win),
         |cov AS (SELECT DISTINCT doc_id,
         |    unnest(range(pos, pos + $ScrubTokens)) AS tpos
         |  FROM r WHERE rn > 1),
         |tok AS (SELECT doc_id, unnest(ts) AS tok,
         |    unnest(range(1, len(ts) + 1)) AS tpos FROM t)
         |SELECT k.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN c.tpos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_removed,
         |  coalesce(string_agg(CASE WHEN c.tpos IS NULL THEN k.tok END, ' '
         |    ORDER BY k.tpos), '') AS clean_text
         |FROM tok k LEFT JOIN cov c
         |  ON k.doc_id = c.doc_id AND k.tpos = c.tpos
         |GROUP BY k.doc_id ORDER BY k.doc_id""".stripMargin,

    // same window digests; standing = distinct digests of docs < 400, batch
    // occ counted over batch windows only, standing hit via left join
    "incr_spans" ->
      s"""WITH t AS (SELECT doc_id,
         |    string_split(coalesce(text, ''), ' ') AS ts FROM documents),
         |c AS (SELECT doc_id, ts,
         |    unnest(range(1, greatest(len(ts) - ${ScrubTokens - 1}, 1) + 1)) AS s
         |  FROM t),
         |win AS (SELECT doc_id,
         |    md5(array_to_string(ts[s : s + ${ScrubTokens - 1}], ' ')) AS wkey
         |  FROM c),
         |standing AS (SELECT DISTINCT wkey FROM win WHERE doc_id < 400),
         |o AS (SELECT b.doc_id,
         |    count(*) OVER (PARTITION BY b.wkey) AS occ,
         |    (s.wkey IS NOT NULL) AS seen
         |  FROM (SELECT * FROM win WHERE doc_id >= 400) b
         |  LEFT JOIN standing s ON b.wkey = s.wkey)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_windows,
         |  CAST(sum(CASE WHEN occ >= 2 OR seen THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_dup_windows,
         |  CAST(sum(CASE WHEN seen THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_standing_hits,
         |  round(CAST(sum(CASE WHEN occ >= 2 OR seen THEN 1 ELSE 0 END)
         |      AS DOUBLE) / count(*), 6) AS dup_frac
         |FROM o GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "shard_manifest" ->
      s"""SELECT source, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
         |  bit_xor(CAST(('0x' || substr(sha256(CAST(doc_id AS VARCHAR) || '|'
         |      || md5(text)), 1, 16))::UBIGINT % ${Int.MaxValue} AS BIGINT))
         |    AS xor_sig
         |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    // bit-for-bit Morton mirror: bit i of cell -> bit 2i, bit i of hr ->
    // bit 2i+1 (8 bits cover cell 0..7 and hr 0..23 with headroom)
    "zorder_key" -> {
      val terms = (0 until 8).flatMap(i => Seq(
        s"(((cell >> $i) & 1) << ${2 * i})",
        s"(((hr >> $i) & 1) << ${2 * i + 1})")).mkString(" + ")
      s"""WITH b AS (SELECT event_id,
         |    CAST(floor(value / $WidthSql) AS BIGINT) AS cell,
         |    CAST(extract(hour FROM ts) AS BIGINT) AS hr
         |  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL)
         |SELECT event_id, cell, hr, CAST($terms AS BIGINT) AS zkey
         |FROM b ORDER BY event_id""".stripMargin
    },

    // session semantics mirror: an event exactly at last-event + gap still
    // MERGES (verified empirically, StreamingSpec boundary case) — a new
    // session starts only when the gap is EXCEEDED (>)
    "session_agg" ->
      """WITH e AS (SELECT user_id, ts, epoch_us(ts) AS us FROM events
        |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (SELECT user_id, ts, us,
        |    CASE WHEN lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us)),
        |s AS (SELECT user_id, ts, us,
        |    sum(brk) OVER (PARTITION BY user_id ORDER BY us
        |      ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM m)
        |SELECT user_id, epoch_ms(min(ts)) AS start_ms,
        |  epoch_ms(max(ts)) + 1800000 AS end_ms,
        |  CAST(count(*) AS BIGINT) AS n_events
        |FROM s GROUP BY user_id, sid
        |ORDER BY user_id, start_ms""".stripMargin,

    // identical RANGE frame over epoch-microsecond ordering; the rolling sum
    // runs in exact 1e-4 units so only the closing division is floating
    "rolling_stats" ->
      s"""WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS us,
         |    epoch_ms(ts) AS ts_ms,
         |    CAST(round(value * 10000) AS BIGINT) AS v4 FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL),
         |w AS (SELECT event_id, user_id, ts_ms,
         |    CAST(count(v4) OVER win AS BIGINT) AS n_win,
         |    CAST(sum(v4) OVER win AS BIGINT) AS sum_u
         |  FROM e WINDOW win AS (PARTITION BY user_id ORDER BY us
         |    RANGE BETWEEN ${RollWindowSec * 1000000L} PRECEDING AND CURRENT ROW))
         |SELECT event_id, user_id, ts_ms, n_win,
         |  round(CAST(sum_u AS DOUBLE) / (n_win * 10000), 6) AS avg_win
         |FROM w ORDER BY event_id""".stripMargin,

    // identical micro-degree EXACT-INTEGER kinematics: exact BIGINT squared
    // distance, floor-corrected integer sqrt, exact integer micro-deg/hour
    // speed (remainder subtracted before the division so it is exact), one
    // closing multiply by the shared 0.000111195 literal per output — no
    // round(), no multi-step float chain (the old sqrt→×→/→×→/→round(,6)
    // straddled a 6dp midpoint on the density-preserving 10x corpus)
    "track_speed" ->
      s"""WITH p AS (SELECT user_id, event_id, ts, epoch_ms(ts) AS ts_ms,
         |    CAST(round((value % 180.0 - 90.0) * 1000000) AS BIGINT) AS latu,
         |    CAST(round(((value * 2.0) % 360.0 - 180.0) * 1000000) AS BIGINT) AS lonu
         |  FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
         |l AS (SELECT user_id, event_id, ts_ms, latu, lonu,
         |    lag(latu) OVER w AS platu, lag(lonu) OVER w AS plonu,
         |    lag(ts_ms) OVER w AS pts
         |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |d AS (SELECT user_id, event_id, ts_ms, pts,
         |    latu - platu AS dlat,
         |    CASE WHEN abs(lonu - plonu) > 180000000
         |         THEN 360000000 - abs(lonu - plonu)
         |         ELSE abs(lonu - plonu) END AS dlon
         |  FROM l),
         |d2t AS (SELECT user_id, event_id, ts_ms, pts,
         |    dlat * dlat + dlon * dlon AS d2
         |  FROM d),
         |g AS (SELECT user_id, event_id, ts_ms, pts, d2,
         |    CAST(floor(sqrt(CAST(d2 AS DOUBLE))) AS BIGINT) AS s0
         |  FROM d2t),
         |g1 AS (SELECT user_id, event_id, ts_ms, pts, d2,
         |    s0 - (CASE WHEN s0 * s0 > d2 THEN 1 ELSE 0 END) AS s1
         |  FROM g),
         |u AS (SELECT user_id, event_id, ts_ms,
         |    CAST(ts_ms - pts AS BIGINT) AS gap_ms,
         |    s1 + (CASE WHEN (s1 + 1) * (s1 + 1) <= d2 THEN 1 ELSE 0 END)
         |      AS dist_u
         |  FROM g1),
         |v AS (SELECT user_id, event_id, ts_ms, gap_ms, dist_u,
         |    CASE WHEN gap_ms > 0 THEN CAST(
         |      (dist_u * 3600000 - ((dist_u * 3600000) % gap_ms))
         |        / gap_ms AS BIGINT) END AS speed_mu
         |  FROM u)
         |SELECT user_id, event_id, ts_ms, gap_ms,
         |  CAST(dist_u AS DOUBLE) * 0.000111195 AS dist_km,
         |  CAST(speed_mu AS DOUBLE) * 0.000111195 AS speed_kmh,
         |  CASE WHEN speed_mu IS NULL THEN NULL
         |       ELSE CAST(speed_mu AS DOUBLE) * 0.000111195 > $TeleportKmh
         |       END AS is_teleport
         |FROM v ORDER BY user_id, event_id""".stripMargin,

    // same total order, same island id (global row_number minus per-cell
    // row_number), same >= $DwellMinPings gate
    "dwell_episodes" ->
      s"""WITH p AS (SELECT user_id, event_id, ts, epoch_ms(ts) AS ts_ms,
         |    CAST(floor((value % 180.0) / 30.0) AS BIGINT) || ':' ||
         |      CAST(floor(((value * 2.0) % 360.0) / 60.0) AS BIGINT) AS cell
         |  FROM events
         |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value IS NOT NULL),
         |i AS (SELECT user_id, cell, ts_ms,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |      - row_number() OVER (PARTITION BY user_id, cell
         |                           ORDER BY ts, event_id) AS isl
         |  FROM p)
         |SELECT user_id, cell, CAST(min(ts_ms) AS BIGINT) AS start_ms,
         |  CAST(max(ts_ms) AS BIGINT) AS end_ms,
         |  CAST(count(*) AS BIGINT) AS n_pings
         |FROM i GROUP BY user_id, cell, isl
         |HAVING count(*) >= $DwellMinPings
         |ORDER BY user_id, start_ms, cell""".stripMargin,

    // dense grid from each user's own span; prev/next observed neighbors via
    // IGNORE NULLS running first/last; the interpolated value is the exact
    // integer rational of Trajectory.interpolateHourly, half-up-rounded to
    // micro-units with pure BIGINT math — a float chain here hits exact .5
    // ties at the rounding scale and the engines split on them
    "gap_interp" ->
      s"""WITH obs AS (SELECT user_id, date_trunc('hour', ts) AS h,
         |    CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS BIGINT) AS su,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM events
         |  WHERE user_id < $GapFillMaxUid AND user_id IS NOT NULL
         |    AND ts IS NOT NULL AND value IS NOT NULL
         |  GROUP BY 1, 2),
         |span AS (SELECT user_id, min(h) AS h0, max(h) AS h1 FROM obs GROUP BY 1),
         |grid AS (SELECT user_id,
         |    unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM span),
         |g AS (SELECT gr.user_id, gr.h, epoch_ms(gr.h) // 3600000 AS ehr,
         |    o.su, o.n
         |  FROM grid gr LEFT JOIN obs o ON gr.user_id = o.user_id AND gr.h = o.h),
         |nb AS (SELECT user_id, h, su, n, ehr,
         |    last_value(su IGNORE NULLS) OVER wp AS sup,
         |    last_value(n IGNORE NULLS) OVER wp AS np,
         |    last_value(CASE WHEN su IS NOT NULL THEN ehr END IGNORE NULLS)
         |      OVER wp AS hp,
         |    first_value(su IGNORE NULLS) OVER wn AS sun,
         |    first_value(n IGNORE NULLS) OVER wn AS nn,
         |    first_value(CASE WHEN su IS NOT NULL THEN ehr END IGNORE NULLS)
         |      OVER wn AS hn
         |  FROM g WINDOW
         |    wp AS (PARTITION BY user_id ORDER BY ehr
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wn AS (PARTITION BY user_id ORDER BY ehr
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
         |r AS (SELECT user_id, h, su, ehr,
         |    CASE WHEN su IS NOT NULL THEN su
         |         ELSE sup * nn * (hn - ehr) + sun * np * (ehr - hp) END AS num,
         |    CASE WHEN su IS NOT NULL THEN n
         |         ELSE np * nn * (hn - hp) END AS den
         |  FROM nb)
         |SELECT user_id, epoch_ms(h) AS hour_ms,
         |  CAST((2 * num + den) // (2 * den) AS BIGINT) AS value_micro,
         |  CAST((2 * num + den) // (2 * den) AS DOUBLE) / 1000000.0
         |    AS value_interp,
         |  su IS NOT NULL AS is_observed
         |FROM r ORDER BY user_id, hour_ms""".stripMargin,

    // same distinct-shingle rows with the source carried; identical
    // df > dfFrac·n_docs gate and per-doc rollup; zero-gram docs kept with
    // null fraction on both sides
    "boilerplate_score" ->
      s"""WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS ts
         |  FROM documents),
         |sh AS (SELECT doc_id, source,
         |    unnest(list_distinct([ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2]
         |                          for i in range(1, len(ts)-1)])) AS gram
         |  FROM toks),
         |gd AS (SELECT source, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY 1),
         |dfq AS (SELECT source, gram, CAST(count(*) AS BIGINT) AS df
         |  FROM sh GROUP BY 1, 2),
         |bp AS (SELECT source, gram FROM dfq JOIN gd USING (source)
         |  WHERE CAST(df AS DOUBLE) > $BoilerDfFrac * n_docs),
         |per AS (SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
         |    CAST(count(b.gram) AS BIGINT) AS n_bp
         |  FROM sh s LEFT JOIN bp b ON s.source = b.source AND s.gram = b.gram
         |  GROUP BY 1)
         |SELECT d.doc_id,
         |  coalesce(per.n_grams, 0) AS n_grams,
         |  coalesce(per.n_bp, 0) AS n_bp,
         |  round(CAST(per.n_bp AS DOUBLE) / per.n_grams, 6) AS bp_frac
         |FROM documents d LEFT JOIN per USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,

    "cube_agg" ->
      """WITH e AS (SELECT event_type,
        |    CAST(date_part('hour', ts) AS INTEGER) AS hod,
        |    CAST(round(value * 10000) AS BIGINT) AS v4 FROM events
        |  WHERE ts IS NOT NULL)
        |SELECT event_type, hod,
        |  CAST(GROUPING(event_type) * 2 + GROUPING(hod) AS INTEGER) AS gid,
        |  CAST(count(*) AS BIGINT) AS n_events,
        |  round(CAST(sum(v4) AS DOUBLE) / 10000.0, 4) AS sum_value
        |FROM e GROUP BY CUBE (event_type, hod)
        |ORDER BY gid, event_type, hod""".stripMargin,

    // the range-partition + offset protocol is bit-identical to a global
    // row_number when the key is unique
    "global_index" ->
      """SELECT event_id,
        |  CAST(row_number() OVER (ORDER BY event_id) - 1 AS BIGINT) AS global_idx
        |FROM events ORDER BY event_id""".stripMargin,

    "shuffle_index" ->
      """WITH k AS (SELECT event_id,
        |    md5('1#' || CAST(event_id AS VARCHAR)) || '|'
        |      || CAST(event_id AS VARCHAR) AS shuf
        |  FROM events)
        |SELECT event_id,
        |  CAST(row_number() OVER (ORDER BY shuf) - 1 AS BIGINT) AS global_idx
        |FROM k ORDER BY event_id""".stripMargin,

    "fuzzy_pairs" ->
      """WITH c AS (SELECT c_custkey AS id, c_name AS s,
        |    substring(c_name, 1, length(c_name) - 2) AS blk FROM customer)
        |SELECT a.id AS id_a, b.id AS id_b,
        |  CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
        |FROM c a JOIN c b ON a.blk = b.blk AND a.id < b.id
        |WHERE abs(length(a.s) - length(b.s)) <= 1
        |  AND levenshtein(a.s, b.s) <= 1
        |ORDER BY id_a, id_b""".stripMargin,

    // window positions over the name sort order (id tiebreak), each row vs
    // its next SnmWindow-1 successors
    "snm_pairs" ->
      s"""WITH c AS (SELECT c_custkey AS id, c_name AS s FROM customer),
         |p AS (SELECT id, s, row_number() OVER (ORDER BY s, id) AS pos FROM c)
         |SELECT least(a.id, b.id) AS id_a, greatest(a.id, b.id) AS id_b,
         |  CAST(levenshtein(a.s, b.s) AS INTEGER) AS dist
         |FROM p a JOIN p b
         |  ON b.pos > a.pos AND b.pos <= a.pos + ${SnmWindow - 1}
         |WHERE abs(length(a.s) - length(b.s)) <= $FuzzyMaxDist
         |  AND levenshtein(a.s, b.s) <= $FuzzyMaxDist
         |ORDER BY id_a, id_b""".stripMargin,

    // contaminated compares the UNROUNDED max, exactly like the engine
    "semantic_decontam" ->
      s"""$NormCte,
         |p AS (SELECT c.vec_id AS vid,
         |    max((${dotChain("c.v", "e.v")}) / nullif(c.nr * e.nr, 0)) AS ms
         |  FROM (SELECT * FROM nrm WHERE vec_id >= $IvfQueryMax) c,
         |       (SELECT * FROM nrm WHERE vec_id < $IvfQueryMax) e
         |  GROUP BY 1)
         |SELECT vid AS vec_id, round(ms, 6) AS max_eval_sim,
         |  ms >= CAST('$SemDedupThreshold' AS DOUBLE) AS contaminated
         |FROM p ORDER BY vec_id""".stripMargin,

    // same fixed-codebook routing CTE as ivf_assign, then within-cell
    // pairwise cosine and keep-first dup marking
    "semdedup" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |nrm AS (SELECT vec_id, v, sqrt(${dotChain("v", "v")}) AS nr FROM e),
         |c AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS list_id,
         |    v AS cv, (${dotChain("v", "v")}) AS c2
         |  FROM e WHERE vec_id < $IvfCentroids),
         |a AS (SELECT e.vec_id, c.list_id, row_number() OVER
         |    (PARTITION BY e.vec_id
         |     ORDER BY c.c2 - CAST('2.0' AS DOUBLE) * (${dotChain("e.v", "c.cv")}),
         |       c.list_id) AS pr
         |  FROM e, c),
         |asg AS (SELECT vec_id, list_id AS cell FROM a WHERE pr = 1),
         |pair AS (SELECT y.vec_id AS vid,
         |    (${dotChain("xa.v", "yb.v")}) / nullif(xa.nr * yb.nr, 0) AS sim
         |  FROM asg x JOIN asg y ON x.cell = y.cell AND x.vec_id < y.vec_id
         |  JOIN nrm xa ON xa.vec_id = x.vec_id
         |  JOIN nrm yb ON yb.vec_id = y.vec_id),
         |dup AS (SELECT DISTINCT vid FROM pair WHERE sim >= CAST('$SemDedupThreshold' AS DOUBLE))
         |SELECT s.vec_id, CAST(s.cell AS INTEGER) AS cell,
         |  (d.vid IS NOT NULL) AS is_dup
         |FROM asg s LEFT JOIN dup d ON d.vid = s.vec_id
         |ORDER BY vec_id""".stripMargin,

    // per-vector span quantization replayed elementwise; the error fold is
    // the same left-to-right chain as the engine's aggregate()
    "embed_sq8" ->
      """WITH l AS (SELECT vec_id, [x::DOUBLE for x in embedding] AS v
        |  FROM embeddings),
        |b AS (SELECT vec_id, v, list_min(v) AS mn, list_max(v) AS mx FROM l)
        |SELECT vec_id,
        |  CAST(len(v) AS INTEGER) AS n_dims,
        |  CAST(list_sum([CASE WHEN mx - mn = 0 THEN 0
        |      ELSE least(255, floor((x - mn) / (mx - mn) * 256))::INT END
        |    for x in v]) AS BIGINT) AS code_sum,
        |  CAST(list_min([CASE WHEN mx - mn = 0 THEN 0
        |      ELSE least(255, floor((x - mn) / (mx - mn) * 256))::INT END
        |    for x in v]) AS INTEGER) AS code_min,
        |  CAST(list_max([CASE WHEN mx - mn = 0 THEN 0
        |      ELSE least(255, floor((x - mn) / (mx - mn) * 256))::INT END
        |    for x in v]) AS INTEGER) AS code_max,
        |  round(mn, 6) AS lo, round(mx, 6) AS hi,
        |  round(list_reduce(list_prepend(0.0::DOUBLE,
        |      [CASE WHEN mx - mn = 0 THEN 0.0
        |         ELSE abs(x - (mn + (least(255,
        |             floor((x - mn) / (mx - mn) * 256)) + 0.5)
        |           * (mx - mn) / 256)) END
        |       for x in v]),
        |    (a, c) -> a + c) / len(v), 6) AS mean_abs_err
        |FROM b ORDER BY vec_id""".stripMargin,

    // per-subspace |c|² − 2·v·c argmin, subspaces unrolled (indices must be
    // literals), codes pivoted back to one row per vector
    "pq_encode" -> {
      val dsub = EmbedDims / PqM
      val subSelects = (0 until PqM).map { s =>
        val sq = (1 to dsub).map(i =>
          s"c.v[${s * dsub + i}]*c.v[${s * dsub + i}]").mkString(" + ")
        val cross = (1 to dsub).map(i =>
          s"e.v[${s * dsub + i}]*c.v[${s * dsub + i}]").mkString(" + ")
        s"""SELECT e.vec_id, $s AS s, c.j,
           |    ($sq) - CAST('2.0' AS DOUBLE) * ($cross) AS dd
           |  FROM e, c""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      val codeCols = (0 until PqM).map(s =>
        s"CAST(max(CASE WHEN s = $s THEN j END) AS INTEGER) AS code$s").mkString(",\n  ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT vec_id AS j, v FROM e WHERE vec_id < $PqKsub),
         |d AS (
         |  $subSelects),
         |r AS (SELECT vec_id, s, j, row_number() OVER
         |    (PARTITION BY vec_id, s ORDER BY dd, j) AS pr FROM d)
         |SELECT vec_id,
         |  $codeCols
         |FROM r WHERE pr = 1 GROUP BY vec_id ORDER BY vec_id""".stripMargin
    },

    // corpus codes from the pq_encode CTE (long form), query-side full
    // sub-distances (q·q − 2 q·c + |c|², the engine's exact LUT chain), pair
    // distance = ordered per-subspace list folded left-to-right — the same
    // strict summation order as the engine's fixed lookup+add chain
    "pq_topk" -> {
      val dsub = EmbedDims / PqM
      def sq(v: String, s: Int) = (1 to dsub).map(i =>
        s"$v[${s * dsub + i}]*$v[${s * dsub + i}]").mkString(" + ")
      def cross(a: String, b: String, s: Int) = (1 to dsub).map(i =>
        s"$a[${s * dsub + i}]*$b[${s * dsub + i}]").mkString(" + ")
      val dSelects = (0 until PqM).map { s =>
        s"""SELECT e.vec_id, $s AS s, c.j,
           |    (${sq("c.v", s)}) - CAST('2.0' AS DOUBLE) * (${cross("e.v", "c.v", s)}) AS dd
           |  FROM e, c""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      val qdSelects = (0 until PqM).map { s =>
        s"""SELECT e.vec_id AS q, $s AS s, c.j,
           |    (${sq("e.v", s)}) - CAST('2.0' AS DOUBLE) * (${cross("e.v", "c.v", s)}) + (${sq("c.v", s)}) AS dd
           |  FROM e, c WHERE e.vec_id < $IvfQueryMax""".stripMargin
      }.mkString("\n  UNION ALL\n  ")
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT vec_id AS j, v FROM e WHERE vec_id < $PqKsub),
         |d AS (
         |  $dSelects),
         |r AS (SELECT vec_id, s, j, row_number() OVER
         |    (PARTITION BY vec_id, s ORDER BY dd, j) AS pr FROM d),
         |codes AS (SELECT vec_id AS n_id, s, j FROM r WHERE pr = 1),
         |qd AS (
         |  $qdSelects),
         |terms AS (SELECT qd.q, codes.n_id, qd.s, qd.dd
         |  FROM codes JOIN qd ON qd.s = codes.s AND qd.j = codes.j
         |  WHERE qd.q <> codes.n_id),
         |adc AS (SELECT q, n_id,
         |    list_reduce(list(dd ORDER BY s), (x, y) -> x + y) AS adc
         |  FROM terms GROUP BY q, n_id),
         |rr AS (SELECT *, row_number() OVER
         |    (PARTITION BY q ORDER BY adc, n_id) AS rn FROM adc)
         |SELECT q, n_id, round(adc, 6) AS adc, CAST(rn AS BIGINT) AS rn
         |FROM rr WHERE rn <= 5 ORDER BY q, rn""".stripMargin
    },

    // same fixed bin edges; empty slots come from a generated (type, slot)
    // grid so the flattened sketch rows match exactly
    "value_hist" -> {
      val w = (HistHi - HistLo) / HistBins
      s"""WITH v AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
         |s AS (SELECT event_type,
         |    CASE WHEN value < $HistLo THEN 0
         |         WHEN value >= $HistHi THEN ${HistBins + 1}
         |         ELSE 1 + least(${HistBins - 1},
         |           CAST(floor((value - $HistLo) / $w) AS INTEGER)) END AS slot
         |  FROM v),
         |types AS (SELECT DISTINCT event_type FROM events),
         |grid AS (SELECT event_type, CAST(r.range AS INTEGER) AS slot
         |  FROM types, range(${HistBins + 2}) r),
         |c AS (SELECT event_type, slot, CAST(count(*) AS BIGINT) AS cnt
         |  FROM s GROUP BY 1, 2)
         |SELECT g.event_type, g.slot, coalesce(c.cnt, 0) AS cnt
         |FROM grid g LEFT JOIN c USING (event_type, slot)
         |ORDER BY event_type, slot""".stripMargin
    },

    // micro-nat quantization BEFORE the per-doc sum keeps the aggregate
    // integer-exact in both engines; ln() ulp noise is sub-quantum
    "lm_score" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |bgf AS (SELECT doc_id, b['w1'] AS w1, b['w2'] AS w2 FROM (
        |  SELECT doc_id, unnest([{'w1': ts[i], 'w2': ts[i+1]}
        |                         for i in range(1, len(ts))]) AS b
        |  FROM toks)),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bgf GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM bgf GROUP BY 1),
        |model AS (SELECT c2.w1, c2.w2,
        |    CAST(round(ln(CAST(c2.c2 AS DOUBLE) / c1.c1) * 1000000) AS BIGINT) AS lp_u
        |  FROM c2 JOIN c1 USING (w1)),
        |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |    CAST(sum(lp_u) AS BIGINT) AS lp_sum
        |  FROM bgf JOIN model USING (w1, w2) GROUP BY 1)
        |SELECT doc_id, n_bigrams,
        |  CAST((CASE WHEN lp_sum < 0 THEN -1 ELSE 1 END)
        |       * ((2 * abs(lp_sum) + n_bigrams) // (2 * n_bigrams))
        |       AS DOUBLE) / 1000000.0 AS avg_logp
        |FROM sc ORDER BY doc_id""".stripMargin,

    // same per-char counts; each c·ln c term quantizes to BIGINT before the
    // per-doc sum (order-independent integer addition, ln ulp absorbed)
    "char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents),
        |pc AS (SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
        |  FROM ch WHERE ch <> '' GROUP BY 1, 2),
        |t AS (SELECT doc_id, c,
        |    CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)) * 1000000.0)
        |         AS BIGINT) AS t_u
        |  FROM pc),
        |a AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_chars,
        |    CAST(sum(t_u) AS BIGINT) AS t_sum
        |  FROM t GROUP BY 1)
        |SELECT doc_id, n_chars,
        |  round(ln(CAST(n_chars AS DOUBLE))
        |        - CAST(t_sum AS DOUBLE) / 1000000.0 / n_chars, 6) AS entropy
        |FROM a ORDER BY doc_id""".stripMargin,

    // same exact-percentile bounds, bucket comparison chain, and composite
    // bucket|md5|id sort key; the rank mirrors the range-partition stamping
    "curriculum_order" -> {
      val bs = (1 until CurriculumBuckets).map(i =>
        s"quantile_cont(n_toks, ${i.toDouble / CurriculumBuckets}) AS b$i")
        .mkString(", ")
      val cases = (1 until CurriculumBuckets).map(i =>
        s"CASE WHEN n_toks > b$i THEN 1 ELSE 0 END").mkString(" + ")
      s"""WITH t AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
         |  FROM documents),
         |b AS (SELECT $bs FROM t),
         |k AS (SELECT doc_id, n_toks, CAST(1 + $cases AS INTEGER) AS bucket
         |  FROM t, b),
         |s AS (SELECT doc_id, n_toks, bucket,
         |    lpad(CAST(bucket AS VARCHAR), 2, '0') || '|' ||
         |    md5('$CurriculumSeed#' || CAST(doc_id AS VARCHAR)) || '|' ||
         |    CAST(doc_id AS VARCHAR) AS srt
         |  FROM k)
         |SELECT doc_id, n_toks, bucket,
         |  CAST(row_number() OVER (ORDER BY srt) - 1 AS BIGINT) AS global_idx
         |FROM s ORDER BY doc_id""".stripMargin
    },

    // same exact-integer counts and single-division-single-ln shape as the
    // engine; ranking and output on micro-unit-rounded PMI (ln ulp safety)
    "pmi_bigrams" ->
      s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |bgf AS (SELECT b['w1'] AS w1, b['w2'] AS w2 FROM (
        |  SELECT unnest([{'w1': ts[i], 'w2': ts[i+1]}
        |                 for i in range(1, len(ts))]) AS b
        |  FROM toks)),
        |c2 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM bgf GROUP BY 1, 2),
        |l AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
        |r AS (SELECT w2, CAST(sum(c12) AS BIGINT) AS cr FROM c2 GROUP BY 1),
        |n AS (SELECT CAST(sum(c12) AS BIGINT) AS n_bi FROM c2),
        |v AS (SELECT c2.w1, c2.w2, c12,
        |    CAST(round(ln(CAST(c12 AS DOUBLE) * n_bi / CAST(c1 * cr AS DOUBLE))
        |               * 1000000) AS BIGINT) AS pmi_u
        |  FROM c2 JOIN l USING (w1) JOIN r USING (w2), n
        |  WHERE c12 >= $PmiMinCount)
        |SELECT w1, w2, c12, pmi_u FROM v
        |ORDER BY pmi_u DESC, w1, w2 LIMIT $PmiTopK""".stripMargin,
  )
}
