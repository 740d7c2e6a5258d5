package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Per-query shuffle budgets: every declared query's physical plan is pinned
  * to a maximum number of ShuffleExchange operators. At 100 TB each exchange
  * is the dominant cost; a refactor that silently adds one (a lost
  * co-partitioning, a distinct that used to ride an existing repartition, a
  * window whose partitioning stopped matching the groupBy's) ships a
  * cluster-bill regression that row-level correctness tests cannot see.
  * This spec makes it a CI failure instead.
  *
  * Budgets are measured at sf0.001 with AQE off (AQE hides the exchanges
  * inside AdaptiveSparkPlan; the pre-adaptive plan is the stable artifact).
  * They are CEILINGS, not exact counts — a query that loses a shuffle keeps
  * passing; record mode prints the new map for ratcheting DOWN.
  *
  * Regenerate after intentional plan changes:
  *   GRAFT_RECORD_SHUFFLES=1 sbt "Test/testOnly graft.ShuffleBudgetSpec"
  * and paste the printed map.
  */
class ShuffleBudgetSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  private def countShuffles(p: SparkPlan): Int =
    p.collect { case e: ShuffleExchangeLike => e }.length

  /** Ceilings recorded at sf0.001 (see scaladoc for the regen recipe). */
  private val Budget: Map[String, Int] = Map(
    "approx_users_daily" -> 2,
    "asof_enrich" -> 3,
    "bloom_distinct" -> 3,
    "bm25_score" -> 2,
    "boilerplate_score" -> 5,
    "bpe_encode" -> 1,
    "bpe_merges" -> 1,
    "bpe_pairs" -> 3,
    "brand_volume" -> 2,
    "cdc_apply" -> 3,
    "char_entropy" -> 1,
    "chunk_dedup" -> 3,
    "content_chunks" -> 3,
    "cluster_keep" -> 2,
    "cms_freq" -> 3,
    "corpus_sim" -> 4,
    "corpus_split" -> 1,
    "cube_agg" -> 2,
    "curation_funnel" -> 5,
    // globalIndex's range shuffle is now VISIBLE in the SQL plan (the old
    // RDD zipWithIndex hop hid it from this counter) plus its two
    // bookkeeping aggregates, which move <= numPartitions rows each
    "curriculum_order" -> 3,
    "cust_inactive" -> 2,
    "days_seen_hist" -> 4,
    "decontam" -> 4,
    // pair-day aggregate + the broadcast 1-row reference day's aggregate
    // + final ORDER BY
    "decayed_pairs" -> 3,
    "dedup_embed" -> 2,
    "dedup_exact" -> 2,
    "dedup_minhash" -> 1,
    "dedup_ngram" -> 2, // ratcheted from 3 (round-9 re-record)
    // same guarded shingle machinery as dedup_ngram (asymmetric denominator
    // changes no stage)
    "containment_pairs" -> 2,
    "dedup_simhash" -> 3,
    "doc_chunks" -> 1,
    "doc_fingerprint" -> 1,
    "doc_sample" -> 1,
    "domain_cap" -> 2,
    "dq_audit" -> 1,
    "drift_psi" -> 2,
    "gopher_rules" -> 1,
    "dsir_select" -> 4,
    "dsir_weights" -> 5,
    "dup_clusters" -> 1,
    // digest-keyed occurrence window + doc rollup + final ORDER BY
    "dup_spans" -> 3,
    "dwell_episodes" -> 2,
    "embed_centroids" -> 2,
    "embed_lsh" -> 2,
    "embed_project" -> 1,
    "embed_sq8" -> 1,
    "embed_topk" -> 2,
    "event_transitions" -> 3,
    "events_pivot" -> 3,
    "events_rollup" -> 2,
    // narrow per-row comprehension + explode: ORDER BY only
    "fp_winnow" -> 1,
    "fp_overlap" -> 4,
    "frame_sample" -> 1,
    "funnel_steps" -> 4,
    "fuzzy_pairs" -> 1,
    "gap_fill" -> 3,
    "gap_interp" -> 3,
    // visible range shuffle + the <=N-row partition-stats aggregate
    // (previously hidden behind the RDD hop; same data movement)
    "global_index" -> 2,
    // final ORDER BY + single-row denominator + globalIndex's now-visible
    // range shuffle and <=N-row stats aggregate (no RDD hop since r10)
    "gto_rank_curve" -> 4,
    // final ORDER BY only — the ring join refreshes once as a gold stage
    // (ringPairsGold) and the declared query reads the materialized table,
    // the same lifecycle as pairs_daily
    "pairs_daily_ring" -> 1,
    // pair-keyed rollup of the gold ring table + final ORDER BY
    "pairs_total_ring" -> 2,
    "hard_negatives" -> 2,
    // fact-side scan + broadcast semi join; ORDER BY is the one exchange
    "bloom_semi" -> 2,
    // broadcast flag join + single-row agg
    "bloom_prune" -> 2,
    // one (day, bucket) register agg + final ORDER BY
    "hll_registers" -> 2,
    // register agg + per-day state rollup + final ORDER BY
    "hll_distinct" -> 3,
    // daily registers + window merge + observed-days join + state + ORDER BY
    "hll_sliding" -> 7,
    "hybrid_dedup" -> 1,
    "incr_dedup" -> 3,
    // batch window pass + store distinct + digest join + final ORDER BY
    "incr_spans" -> 4,
    "incr_lsh" -> 7,
    "incr_rollup" -> 3,
    "ivf_assign" -> 2,
    "ivf_topk" -> 6,
    "kcenter_select" -> 1,
    "kmeans_assign" -> 2,
    "kmeans_centroids" -> 1,
    // sketch agg + final ORDER BY; _distinct adds the count_distinct
    // two-phase (sketch and exact audit count share ONE aggregation);
    // _overlap's pair join is broadcast — no exchange beyond the build
    "kmv_distinct" -> 3,
    "kmv_minhash" -> 2,
    // sketch agg + final ORDER BY + the r18 in-plan maxSegments guard's
    // 1-row global count (partial agg rides the sketch build via
    // ReuseExchange; only the <=numPartitions-row final-agg exchange is
    // new — the S^2/2 pair join itself stays broadcast, exchange-free)
    "kmv_overlap" -> 3,
    "lang_id" -> 1,
    "leakfree_split" -> 1,
    "lm_score" -> 5,
    "lsh_calibration" -> 5,
    "media_features" -> 1,
    "mixture_sample" -> 2,
    // pagerank's budget counts the UNROLLED 3-iteration plan since periodic
    // checkpointing landed (the old "1" measured a checkpoint-truncated tail,
    // not the real work): per iteration one message groupBy plus the
    // rank-vector re-shuffle onto the edge partitioning, edge list itself
    // exchange-free after the one build-time repartition
    // the label loop runs at construction (per-round localCheckpoint);
    // the returned plan is size join + ORDER BY
    "pair_components" -> 2,
    "pair_pagerank" -> 4,
    // weighted twin: + the pair-weight aggregate feeding the edge build
    "weighted_pagerank" -> 5,
    // delta-frontier BFS: the per-hop expansion joins/distincts land on
    // persisted deltas, so the declared plan's only live exchange is the
    // final settled-union sort — the frontier work is cache-truncated,
    // same accounting as the other CacheScope-backed queries
    "seed_distance" -> 1,
    // oriented-wedge triangle close + corner-count groupBy; the orientation
    // build itself is cache-truncated behind the persisted ore frame
    "triangle_counts" -> 2,
    // wedge groupBy + final ORDER BY; capped neighbor window and adjacency
    // anti-join ride the persisted src-partitioned edge frame
    "shadow_pairs" -> 2,
    // same unrolled 3-iteration accounting as pair_pagerank — the seeded
    // teleport changes only the init/base columns, not the plan
    "seed_pagerank" -> 4,
    // broadcast containment join (zones are config-scale), then the
    // distinct-vessel rollup's two-phase aggregate + final ORDER BY
    "geofence_hits" -> 3,
    // two-phase count-distinct per combo, per-type summary, final ORDER BY
    "k_anon_audit" -> 4,
    // (quasi, id, sensitive) dedup exchange, ONE expand-backed aggregate
    // exchange for both count-distincts over the deduped set, ORDER BY
    "l_diversity" -> 3,
    // narrow synthesize→parse projections: ORDER BY only
    "image_dims" -> 1,
    "wav_meta" -> 1,
    "video_meta" -> 1,
    // narrow synth + three-gate routing, one two-phase aggregate, ORDER BY
    "media_router" -> 2,
    // narrow synthesize→extract regex map: ORDER BY only
    "html_extract" -> 1,
    // word-assembly aggregate + document-assembly aggregate + ORDER BY
    // (the zero-shuffle encode feeds the first aggregate directly)
    "bpe_roundtrip" -> 3,
    // the peeling loop runs at construction (per-round frames live behind
    // persisted boundaries); the returned plan is the final induced-degree
    // pass + ORDER BY
    "k_core" -> 1,
    // day-count aggregate, median aggregate, MAD aggregate (the two keyed
    // joins ride the aggregates' partitioning), final ORDER BY
    "mad_outliers" -> 4,
    // per-vessel trip window + OD rollup + final ORDER BY
    "od_flows" -> 3,
    // span aggregate (grid), one keyed union window, final ORDER BY
    "track_resample" -> 3,
    "pair_quantiles" -> 1,
    "pairs_daily" -> 1,
    "pairs_total" -> 3,
    "pairs_total_ext" -> 3,
    "pii_redact" -> 1,
    // seeded variant of the same narrow scrub projection: ORDER BY only
    "pii_scrub" -> 1,
    "pmi_bigrams" -> 3,
    "pq_encode" -> 1,
    "pq_topk" -> 2,
    "props_parse" -> 2,
    "q1_agg" -> 2,
    "q3_topk" -> 1,
    "q5_region" -> 2,
    "quality_clf" -> 1,
    // 3 rank legs x (range shuffle + <=N-row stats + 1-row offsets fold) +
    // 3 id-keyed joins back: the legs' range shuffles are now visible in
    // the SQL plan (no RDD hop since r10) and the bookkeeping exchanges
    // move <= numPartitions rows each; real data crosses the wire 3x
    // (once per signal order), same as before
    "quality_ensemble" -> 8,
    "quality_filter" -> 1,
    "quality_prune" -> 2,
    "range_join_bin" -> 2,
    "rank_eval" -> 14,
    "reconciliation" -> 5,
    "repetition" -> 1,
    "retention_matrix" -> 5,
    "rolling_stats" -> 2,
    "rrf_fusion" -> 5,
    "scd2_history" -> 2,
    // segment-text window + doc re-stitch groupBy + output sort
    "scrub_dupes" -> 3,
    // digest window + cover distinct + (doc,pos) join + doc rollup; the
    // token persist hides its own read behind the cache
    "scrub_spans" -> 4,
    "search_topk" -> 2,
    "seasonal_outliers" -> 2,
    "semantic_decontam" -> 2,
    "semdedup" -> 5,
    "session_agg" -> 2,
    "shard_manifest" -> 2,
    // visible range shuffle + bookkeeping (see global_index)
    "shuffle_index" -> 3,
    "silver_clean" -> 1,
    "simhash_pairs" -> 1,
    // two lanes by contract: sketch (day-agg + window-merge agg) and exact
    // comparison (distinct + explode + day-agg), then two day-keyed joins
    "sliding_distinct" -> 7,
    "snm_pairs" -> 1, // ratcheted from 3 (r10 re-record after the globalIndex re-platform)
    "skew_report" -> 4,
    "text_normalize" -> 1,
    "text_quality" -> 1,
    "tfidf_topk" -> 6,
    "token_count" -> 1,
    "token_packing" -> 2,
    "top_tracks" -> 1,
    "topp_cap" -> 2,
    // id distinct + final ORDER BY
    "track_colors" -> 2,
    "track_export" -> 1,
    "track_paths" -> 2,
    "track_speed" -> 2,
    "trip_segments" -> 2,
    "uid_hourly" -> 1,
    "uid_hourly_h3" -> 2,
    "user_churn" -> 4,
    "user_growth" -> 5,
    "value_corr" -> 2,
    "value_decayed" -> 2,
    "value_deciles" -> 2,
    "value_hist" -> 2,
    "value_outliers" -> 2,
    "value_outliers_robust" -> 3,
    "vocab_topk" -> 1,
    "volume_trend" -> 3,
    "weighted_sample" -> 2,
    "window_dedup" -> 2,
    "winsorize" -> 2,
    "zorder_key" -> 1
  )

  test("no declared query exceeds its recorded shuffle budget") {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val counts = SparkEntry.queries.toSeq.sortBy(_._1).map {
        case (name, fn) =>
          val n = countShuffles(fn(spark, Sf).queryExecution.executedPlan)
          spark.catalog.clearCache() // operators may persist shared frames
          name -> n
      }
      if (sys.env.contains("GRAFT_RECORD_SHUFFLES")) {
        val lines = counts.map { case (n, c) => s"""    "$n" -> $c,""" }
        info("recorded shuffle counts:\n" + lines.mkString("\n"))
      } else {
        val over = counts.collect {
          case (name, n) if Budget.get(name).exists(n > _) =>
            s"$name: $n > ${Budget(name)}"
        }
        val missing = counts.collect {
          case (name, _) if !Budget.contains(name) => name
        }
        assert(over.isEmpty, s"shuffle-budget regressions: ${over.mkString(", ")}")
        assert(missing.isEmpty,
          s"queries missing a shuffle budget (run record mode and paste): " +
            missing.mkString(", "))
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }
}
