package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution

/** Physical-plan contracts for the declared queries: the shapes that matter
  * at 100 TB (pushdown, pruning, broadcast, map-side top-k) are asserted so a
  * refactor that silently reintroduces a full scan or a sort-merge join of a
  * dimension table fails CI, not a cluster bill.
  */
class PlanSpec extends SparkSpec {

  private val Sf = "/root/testdata/sf0.001"

  private def planOf(df: DataFrame): String = {
    val qe: QueryExecution = df.queryExecution
    qe.executedPlan.toString
  }

  test("q3_topk: dimension sides broadcast; the fact side never sort-merges") {
    val plan = planOf(SparkEntry.queries("q3_topk")(spark, Sf))
    assert(plan.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!plan.contains("SortMergeJoin"), "no fact-side sort-merge for dim joins")
  }

  test("relational suite: no FORCED broadcast of an SF-proportional relation") {
    // The q3→q5 recurrence: a broadcast() hint on a side that grows with the
    // corpus (lineitem/orders/customer/supplier/part) is removed in one query
    // and quietly survives in its neighbor — at 100× it is a driver OOM. The
    // gate: every ResolvedHint subtree in the ANALYZED plan (hints are forced
    // regardless of runtime size; AQE-chosen broadcasts adapt and are fine)
    // may only cover the fixed-cardinality dims nation (n_*) / region (r_*),
    // whose row counts are constant at ANY scale factor.
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    for (q <- Seq("q1_agg", "q3_topk", "q5_region", "brand_volume",
        "cust_inactive")) {
      val hints = SparkEntry.queries(q)(spark, Sf)
        .queryExecution.analyzed.collect { case h: ResolvedHint => h }
      hints.foreach { h =>
        val bad = h.child.output.map(_.name)
          .filterNot(n => n.startsWith("n_") || n.startsWith("r_"))
        assert(bad.isEmpty,
          s"$q: forced-broadcast subtree carries SF-proportional columns " +
            s"${bad.mkString(", ")} — drop the hint and let AQE decide")
      }
    }
  }

  test("q3_topk: segment filter is pushed to the customer scan") {
    val plan = planOf(SparkEntry.queries("q3_topk")(spark, Sf))
    assert(plan.contains("PushedFilters") &&
      plan.matches("(?s).*PushedFilters: \\[[^\\]]*EqualTo\\(c_mktsegment,BUILDING\\).*"),
      "c_mktsegment = BUILDING must reach the parquet scan")
  }

  test("token_count: scan is pruned to (doc_id, text) — no full-row read") {
    val plan = planOf(SparkEntry.queries("token_count")(spark, Sf))
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(plan).toList
    assert(readSchemas.nonEmpty)
    readSchemas.foreach { rs =>
      assert(!rs.contains("lang") && !rs.contains("source"),
        s"documents scan reads more than it projects: $rs")
    }
  }

  test("embed_topk: map-side top-k (WindowGroupLimit) + broadcast cohort") {
    val plan = planOf(SparkEntry.queries("embed_topk")(spark, Sf))
    assert(plan.contains("WindowGroupLimit"),
      "rn <= k must compile to a map-side group limit, not a full window sort")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "the fixed-size cohort must broadcast")
  }

  test("track_export: cohort membership is a broadcast semi-join") {
    val plan = planOf(SparkEntry.queries("track_export")(spark, Sf))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      "membership filter must be a broadcast left-semi join")
  }

  test("cust_inactive: NOT EXISTS plans as a broadcast anti-join") {
    val plan = planOf(SparkEntry.queries("cust_inactive")(spark, Sf))
    assert(plan.contains("LeftAnti"), "anti-join expected")
    assert(!plan.contains("SortMergeJoin"), "anti side should broadcast at dim size")
  }

  test("asof_enrich: union+window shape — no join operator anywhere") {
    val plan = planOf(SparkEntry.queries("asof_enrich")(spark, Sf))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("HashJoin") &&
      !plan.contains("CartesianProduct") && !plan.contains("NestedLoopJoin"),
      "the as-of join must compile to union + running-last window, not a join:\n" +
        plan.take(600))
    assert(plan.contains("Window"), "running-last window expected")
  }

  test("embed_centroids: one aggregation, no per-component explode") {
    val plan = planOf(SparkEntry.queries("embed_centroids")(spark, Sf))
    assert(!plan.contains("Generate"),
      "centroid means must be dims independent aggregates, not a posexplode")
    assert(plan.contains("HashAggregate"), "hash aggregate expected")
  }

  test("dedup_simhash: single token explode — the 64x bit fanout stays gone") {
    val plan = planOf(SparkEntry.queries("dedup_simhash")(spark, Sf))
    assert("Generate".r.findAllIn(plan).length <= 1,
      "simhash must explode tokens once; per-bit rows are vote aggregates")
  }

  test("vocab_topk: top-k is TakeOrdered (per-partition heaps), no global sort") {
    val plan = planOf(SparkEntry.queries("vocab_topk")(spark, Sf))
    assert(plan.contains("TakeOrderedAndProject"),
      "ORDER BY + LIMIT must compile to TakeOrderedAndProject")
  }

  test("domain_cap: documents scan never reads the text column") {
    val plan = planOf(SparkEntry.queries("domain_cap")(spark, Sf))
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(plan).toList
    assert(readSchemas.nonEmpty)
    readSchemas.foreach(rs =>
      assert(!rs.contains("text"), s"cap rank needs only (doc_id, source): $rs"))
  }

  test("fp_overlap: candidate generation is keyed — no product join") {
    val plan = planOf(SparkEntry.queries("fp_overlap")(spark, Sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "pairs must come from the hash equi-join, never all-pairs")
  }

  test("span queries: documents scan pruned to (doc_id, text)") {
    for (q <- Seq("dup_spans", "scrub_spans", "incr_spans")) {
      val plan = planOf(SparkEntry.queries(q)(spark, Sf))
      val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(plan).toList
      assert(readSchemas.nonEmpty)
      readSchemas.foreach(rs =>
        assert(!rs.contains("lang") && !rs.contains("source"),
          s"$q reads more than (doc_id, text): $rs"))
      spark.catalog.clearCache()
    }
  }

  test("dup_spans: occurrence count is ONE digest-keyed window pass — no join-back") {
    // the stride-1 window frame is O(corpus tokens): counting occurrences
    // via groupBy + join would scan and shuffle it twice; the partitioned
    // window does it in one pass, and the partition key keeps it off the
    // single-partition WindowExec path
    val plan = planOf(SparkEntry.queries("dup_spans")(spark, Sf))
    assert(!plan.contains("Join"), "no join-back of occurrence counts")
    assert(plan.contains("Window"), "digest-keyed count window expected")
  }

  test("events_rollup: grouping sets are one Expand + one agg, not a per-set union") {
    val plan = planOf(SparkEntry.queries("events_rollup")(spark, Sf))
    assert(plan.contains("Expand"), "rollup compiles to Expand")
    assert(!plan.contains("Union"), "one pass over events, not a scan per granularity")
  }

  test("cube_agg: all four granularities from one Expand pass") {
    val plan = planOf(SparkEntry.queries("cube_agg")(spark, Sf))
    assert(plan.contains("Expand"), "cube compiles to Expand")
    assert(!plan.contains("Union"), "one pass over events, not a scan per granularity")
  }

  test("rolling_stats: range frame, single window pass, no self-join") {
    val plan = planOf(SparkEntry.queries("rolling_stats")(spark, Sf))
    assert(plan.contains("RangeFrame"), "range frame in the window spec")
    // both rolling aggregates share ONE Window operator (one sort, one pass)
    assert("(?m)^\\s*\\+?-?\\s*Window ".r.findAllIn(plan).size === 1)
    assert(!plan.contains("Join"), "rolling stats never self-joins the series")
  }

  test("fuzzy_pairs: blocked equi-join, never a nested-loop all-pairs") {
    val plan = planOf(SparkEntry.queries("fuzzy_pairs")(spark, Sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "candidates come from the block equi-join")
  }

  test("tfidf_topk: per-doc top-k is a map-side group limit") {
    val plan = planOf(SparkEntry.queries("tfidf_topk")(spark, Sf))
    assert(plan.contains("WindowGroupLimit"),
      "rk <= k must compile to per-task heaps, not a full window sort")
  }

  test("semdedup: cell routing broadcasts the codebook, pairs stay keyed") {
    val plan = planOf(SparkEntry.queries("semdedup")(spark, Sf))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "the centroid relation must broadcast")
    assert(!plan.contains("CartesianProduct"),
      "within-cell pairs come from the cell equi-join")
  }

  test("semantic_decontam: the eval cohort broadcasts; the corpus never shuffles for it") {
    val plan = planOf(SparkEntry.queries("semantic_decontam")(spark, Sf))
    assert(plan.contains("BroadcastExchange"), "eval side must broadcast")
    // the only exchange on the corpus path is the max-per-id aggregate
    assert(!plan.contains("SortMergeJoin"), "corpus must not sort-merge against the cohort")
  }

  test("pq_topk: search reads materialized codes — no corpus re-encode") {
    val plan = planOf(SparkEntry.queries("pq_topk")(spark, Sf))
    assert(plan.contains("WindowGroupLimit"),
      "rn <= k must compile to per-task heaps")
    // the corpus side scans the materialized gold parquet of codes (the
    // query side still slices its own vectors for the LUTs — that is the
    // broadcast cohort, not the corpus)
    assert(plan.contains("graft-gold"),
      "search must read the materialized code index, not re-encode the corpus")
  }

  test("pairs pipeline: all four hourly consumers read the persisted stage") {
    // (the DECLARED pairs_daily reads the GoldCache parquet — the self-join
    // runs once inside the gold build, which is itself the point; this pins
    // the operator's own plan when called on a live hourly frame)
    val hourly = graft.ops.CoMovement.hourlyRollup(
      graft.engine.Tables.events(spark, Sf), "user_id", "ts", "value", 3)
    val pairs = graft.ops.CoMovement.pairsDaily(hourly)
    val plan = planOf(pairs)
    val cacheScans = "InMemoryTableScan|TableCacheQueryStage".r
      .findAllIn(plan).length
    assert(cacheScans >= 3,
      s"self-join sides + stat legs must read the persisted hourly stage " +
        s"(saw $cacheScans cache scans)\n${plan.take(800)}")
    spark.catalog.clearCache()
  }

  test("range_join_bin: interval containment is an equi-join, never a nested loop") {
    val plan = planOf(SparkEntry.queries("range_join_bin")(spark, Sf))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      "binned range join must not fall back to a theta join")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"),
      "bin-keyed equi-join expected")
  }

  test("weighted_sample: rank limit compiles to a map-side WindowGroupLimit") {
    val plan = planOf(SparkEntry.queries("weighted_sample")(spark, Sf))
    assert(plan.contains("WindowGroupLimit"),
      "rk <= k must prune per-partition before the stratum shuffle")
  }

  test("topp_cap: running and total sums share one Window pass / one sort") {
    val plan = planOf(SparkEntry.queries("topp_cap")(spark, Sf))
    val windows = "(?m)^\\s*[+:*-]*\\s*Window ".r.findAllIn(plan).length
    val sorts = "(?m)Sort ".r.findAllIn(plan).length
    assert(windows <= 2, s"expected the two frames to share partitioning, saw $windows Window ops")
    assert(sorts <= 3, s"too many sorts for a single-shuffle window query: $sorts")
  }

  test("scd2_history: row_number and lead evaluate in a single Window operator") {
    val plan = planOf(SparkEntry.queries("scd2_history")(spark, Sf))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges <= 1, s"SCD2 must shuffle once on the key, saw $exchanges")
  }

  test("winsorize: clip bounds broadcast; the fact side never sort-merges") {
    val plan = planOf(SparkEntry.queries("winsorize")(spark, Sf))
    assert(plan.contains("BroadcastHashJoin"), "stats-aside bounds must broadcast")
    assert(!plan.contains("SortMergeJoin"), "fact table must not shuffle for the clip")
  }

  test("gap_fill: span and fill share the series key — no cartesian grid") {
    val plan = planOf(SparkEntry.queries("gap_fill")(spark, Sf))
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "grid must come from per-key spans, not a global cross join")
  }

  test("bloom_distinct: sketch aggregate partial-aggregates map-side") {
    val plan = planOf(SparkEntry.queries("bloom_distinct")(spark, Sf))
    // two-phase agg: partial before the exchange, final after — the sketch
    // buffer ORs map-side like any algebraic aggregate
    assert(plan.contains("partial"), "expected a map-side partial aggregate")
  }

  test("runtime bloom filter: a selective dim filter injects might_contain on the fact") {
    // the Spark-native semi-join reduction: a shuffle join whose build side
    // is selectively filtered gets a runtime bloom filter pushed into the
    // probe side's scan stage — at 100 TB this is what spares the fact
    // shuffle from carrying rows the dim filter would discard anyway.
    // Thresholds are tuned for the toy scale; the rewrite itself is what's
    // under test.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") // force a shuffle join
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$Sf/lineitem.parquet")
      val dim = spark.read.parquet(s"$Sf/orders.parquet")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val joined = fact.join(dim, fact("l_orderkey") === dim("o_orderkey"))
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain"),
        "expected an injected runtime bloom filter on the fact side")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("parquet aggregate pushdown: MIN/MAX/COUNT answered from footer stats") {
    // with the v2 parquet source, unfiltered MIN/MAX/COUNT compile to
    // PushedAggregation on the scan — at 100 TB the query reads row-group
    // footers instead of the data pages. The v1 path (the default) silently
    // scans; this pins the config recipe that keeps stats queries O(files).
    val confs = Seq(
      "spark.sql.sources.useV1SourceList" -> "",
      "spark.sql.parquet.aggregatePushdown" -> "true")
    val prior = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions.{count, lit, max, min}
      // lineitem, not events: the v2 reader rejects NANOS timestamps, so
      // footer-stat queries run against the date-typed tables
      val plan = planOf(spark.read.parquet(s"$Sf/lineitem.parquet")
        .agg(min("l_extendedprice"), max("l_extendedprice"), count(lit(1))))
      assert(plan.contains(
        "PushedAggregation: [MIN(l_extendedprice), MAX(l_extendedprice), COUNT(*)]"),
        s"expected footer-stat aggregation pushdown:\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("kmv_overlap: pair join runs on BROADCAST sketches — no shuffle beyond the build, no product") {
    // days² pairs are computed on ≤ k-long arrays; the only exchanges the
    // plan may carry are the sketch build's aggregation and the final
    // ORDER BY. A SortMergeJoin here would mean the pair condition
    // regressed to shuffling sketch rows; a CartesianProduct would mean
    // the broadcast hint was lost.
    val plan = planOf(SparkEntry.queries("kmv_overlap")(spark, Sf))
    assert(plan.contains("BroadcastNestedLoopJoin"),
      s"the non-equi pair join must broadcast the sketch table:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("SortMergeJoin"),
      s"sketch pairing must never shuffle or go unkeyed-product:\n$plan")
  }

  test("kmv_overlap: the in-plan segment guard reuses the sketch build's shuffle — one events scan per action") {
    // The r18 guard redesign (Sketches.kmvOverlapOnSketches) keeps the
    // maxSegments check inside the plan as a broadcast 1-row filter whose
    // count aggregate is canonically identical to the sketch build, so
    // ReuseExchange serves it from the build's own shuffle. This pins that
    // reuse ON THE EXECUTED ADAPTIVE PLAN (what production runs): if a
    // refactor perturbs canonical equality (an alias, a column order, a
    // projection pushed below the aggregate), the guard re-plans as a
    // SECOND full scan of the base data — invisible to row-level tests
    // and to the AQE-off budget pin's exchange count only as +1, but a
    // doubled base-table read at 100 TB.
    val df = SparkEntry.queries("kmv_overlap")(spark, Sf)
    df.collect() // finalize the adaptive plan
    // AdaptiveSparkPlan's toString appends an "== Initial Plan ==" section
    // (pre-reuse); the executed final plan is everything before it
    val fin = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val scans = "FileScan".r.findAllIn(fin).length
    assert(scans == 1,
      s"expected exactly one base-table scan (guard count served by " +
        s"ReuseExchange), found $scans:\n$fin")
    assert(fin.contains("ReusedExchange"),
      s"the guard count and pair sides must reuse the build's shuffle:\n$fin")
  }

  test("funnel_steps: co-partitioned min-chain — keyed joins only, no product") {
    val plan = planOf(SparkEntry.queries("funnel_steps")(spark, Sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"funnel must stay keyed:\n$plan")
  }

  test("boilerplate_score: gram rows materialize once (persisted), joins stay keyed") {
    val df = SparkEntry.queries("boilerplate_score")(spark, Sf)
    val plan = planOf(df)
    assert(plan.contains("InMemoryTableScan"),
      "the exploded gram frame must come from the shared cache, not re-explode")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
    spark.catalog.clearCache()
  }

  test("value_outliers_robust: stats broadcast; the fact side never sort-merges") {
    val plan = planOf(SparkEntry.queries("value_outliers_robust")(spark, Sf))
    assert(plan.contains("BroadcastHashJoin"), "median/MAD stats must broadcast")
    assert(!plan.contains("SortMergeJoin"),
      "the event scan must not shuffle for the stats join")
  }

  test("gap_interp: grid and fill stay keyed on the series key") {
    val plan = planOf(SparkEntry.queries("gap_interp")(spark, Sf))
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"densify+interpolate must never go all-pairs:\n$plan")
  }

  test("pmi_bigrams: the corpus explodes once — marginals read the cached counts") {
    val plan = planOf(SparkEntry.queries("pmi_bigrams")(spark, Sf))
    // all four consumers (filtered output + three marginals) must read the
    // persisted count frame — execution explodes the corpus once; the plan
    // STRING still embeds the cached child per consumer, so assert on
    // InMemoryTableScan fanout, not on scan-string counts
    assert("InMemoryTableScan".r.findAllIn(plan).length >= 4,
      "filtered output and every marginal must read the cached bigram counts")
    spark.catalog.clearCache()
  }

  test("char_entropy: scan pruned to (doc_id, text); per-row kernel, no join") {
    val plan = planOf(SparkEntry.queries("char_entropy")(spark, Sf))
    val readSchemas = "ReadSchema: [^\n]*".r.findAllIn(plan).toList
    assert(readSchemas.nonEmpty)
    readSchemas.foreach(rs => assert(!rs.contains("lang") && !rs.contains("source"),
      s"entropy needs only (doc_id, text): $rs"))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"))
  }

  test("EVERY declared query: unpartitioned windows only over documented bounded frames") {
    // the round-8 verdict tracked single-partition WindowExecs by hand; this
    // pins them structurally, like the broadcast gate. An unpartitioned
    // window funnels its whole input through ONE task — legitimate ONLY
    // when the frame is bounded by construction (top-k legs, calendar days),
    // never corpus-proportional. Whitelist additions require the same
    // scaladoc'd bound the existing entries carry. AQE off: the pre-adaptive
    // plan is the stable artifact (same protocol as ShuffleBudgetSpec).
    import org.apache.spark.sql.execution.window.WindowExec
    val Bounded = Set(
      "rrf_fusion",   // rankByScore legs: k rows each, driver-bounded
      "user_growth",  // day-grain cumulative sum: O(calendar days)
      "kmv_overlap")  // r19 guard: the window IS the maxSegments bound —
                      // ≤ 4096 sketch rows pass it or the filter raises
                      // before the pair stage streams (Sketches.scala)
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
        case (name, fn) =>
          val plan = fn(spark, Sf).queryExecution.executedPlan
          spark.catalog.clearCache()
          if (plan.collect {
              case w: WindowExec if w.partitionSpec.isEmpty => w
            }.nonEmpty) Some(name)
          else None
      }.toSet
      assert((offenders -- Bounded).isEmpty,
        s"NEW unpartitioned window (document the bound or re-platform onto " +
          s"Indexing.globalIndex): ${(offenders -- Bounded).mkString(", ")}")
      assert((Bounded -- offenders).isEmpty,
        s"stale whitelist entries (window is gone — ratchet): " +
          s"${(Bounded -- offenders).mkString(", ")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prior)
  }

  test("EVERY declared query: retry-deterministic expressions only") {
    // Oracle hash-match proves RUN-to-run determinism, but a task RETRY
    // mid-query replays a different path: a nondeterministic expression
    // (rand, uuid, monotonically_increasing_id outside a protocol that
    // re-derives identical values, first/collect_* over unordered input)
    // can produce a result that differs ONLY when a task fails — invisible
    // to every green-path gate, visible as a corrupted result at 100 TB
    // where task retries are routine. This walks every declared query's
    // ANALYZED plan — the optimized plan hides every `persist()`ed subtree
    // behind InMemoryRelation (cache substitution), which is exactly where
    // the iterative operators' expressions live; the analyzed tree is the
    // full logical surface. CurrentTimestamp/CurrentDate are exempted
    // explicitly: the optimizer's ComputeCurrentTime folds them to ONE
    // literal per query execution, so a task retry replays the same value
    // by construction. It flags:
    //   - any nondeterministic expression node (attributed at the leafmost
    //     nondeterministic node, so "Rand" not its whole parent chain);
    //   - order-sensitive aggregates (first/last/collect_list/collect_set)
    //     not wrapped in sort_array/array_sort — the wrapper makes the
    //     result order-independent, which is the repo's oracle discipline;
    //   - order-sensitive WINDOW functions accepted only when the window
    //     carries an orderSpec (the total-order discipline every declared
    //     query already proves through the DuckDB hash match).
    // Whitelist additions require the same scaladoc'd rationale the
    // unpartitioned-window gate demands, and the ratchet fails on stale
    // entries.
    import org.apache.spark.sql.catalyst.expressions.{ArraySort, CurrentDate, CurrentTimestamp, Expression, Now, SortArray, WindowExpression}
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, CollectSet, First, Last}

    // query -> allowed offender labels, each with the reason retry cannot
    // change the result:
    val Allowed: Map[String, Set[String]] = {
      // globalIndex protocol (Indexing.scala:57): monotonically_increasing_id
      // is stamped AFTER repartitionByRange(parts, key) + sortWithinPartitions
      // with a pinned partition count and unique keys — a retried task
      // re-sorts the same range partition and regenerates the SAME
      // (partition << 33 | position) values, so the id is a pure function
      // of the data. The offset-table fold then subtracts the per-partition
      // minima, so even the partition prefix is derived, not physical.
      // (several more queries — fuzzy_pairs, weighted_sample, curation_score,
      // corpus_shuffle — run the same protocol but behind a GoldCache
      // materialization, so their declared plans read parquet and carry no
      // expression to whitelist; the ratchet keeps this list exact)
      val globalIndexQueries = Set(
        "gto_rank_curve", "curriculum_order",
        "shuffle_index", "global_index", "snm_pairs", "quality_ensemble")
      globalIndexQueries.map(_ -> Set("MonotonicallyIncreasingID")).toMap ++ Map(
        // silver lineage: input_file_name() is flagged nondeterministic by
        // Catalyst (it reads task state), but its VALUE is a pure function
        // of which file split a row came from — a retried task re-reads
        // the same split, so replay cannot change any row. The oracle
        // hash-match covers it because the declared projection canonises
        // the path.
        "silver_clean" -> Set("InputFileName"))
        // (kmeans_assign left the list in round 15: the FD-first idiom was
        // re-platformed to min_by over a unique (dd, list_id) ordering key
        // — hard determinism needs no whitelist rationale.)
    }

    def offendersOf(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      def walk(e: Expression, sorted: Boolean): Unit = e match {
        case s @ (_: SortArray | _: ArraySort) =>
          s.children.foreach(walk(_, sorted = true))
        case w: WindowExpression =>
          val ordered = w.windowSpec.orderSpec.nonEmpty
          w.children.foreach(walk(_, sorted || ordered))
        case ae: AggregateExpression =>
          ae.aggregateFunction match {
            case f @ (_: First | _: Last | _: CollectList | _: CollectSet)
                if !sorted =>
              out += s"${f.prettyName}-unordered"
            case _ =>
          }
          ae.aggregateFunction.children.foreach(walk(_, sorted))
          ae.filter.foreach(walk(_, sorted))
        case _: CurrentTimestamp | _: CurrentDate | _: Now =>
          () // folded to one literal per execution by ComputeCurrentTime
        case _ =>
          if (!e.deterministic && e.children.forall(_.deterministic))
            out += e.getClass.getSimpleName
          e.children.foreach(walk(_, sorted))
      }
      plan.foreach(node => node.expressions.foreach(walk(_, sorted = false)))
      out.toSet
    }

    val found = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val plan = fn(spark, Sf).queryExecution.analyzed
      spark.catalog.clearCache()
      name -> offendersOf(plan)
    }.toMap

    val violations = found.flatMap { case (q, offs) =>
      val extra = offs -- Allowed.getOrElse(q, Set.empty)
      if (extra.nonEmpty) Some(s"$q: ${extra.mkString(", ")}") else None
    }
    assert(violations.isEmpty,
      "retry-nondeterministic expressions outside the documented protocol " +
        s"(re-platform or whitelist WITH a rationale):\n${violations.mkString("\n")}")
    val stale = Allowed.flatMap { case (q, allowed) =>
      val gone = allowed -- found.getOrElse(q, Set.empty)
      if (gone.nonEmpty) Some(s"$q: ${gone.mkString(", ")}") else None
    }
    assert(stale.isEmpty,
      s"stale whitelist entries (offender is gone — ratchet): ${stale.mkString("; ")}")

    // ---- the gold BUILDS, un-materialized ------------------------------
    // The declared queries read GoldCache parquet, so the walk above never
    // sees the build trees — and a retry DURING a gold refresh is the
    // highest-stakes replay at 100 TB (the longest jobs, feeding every
    // consumer). Same offender logic, separate whitelist (currently empty:
    // every gold build is clean after the round-14 quantize fix).
    val goldFound = SparkEntry.goldBuilds(spark, Sf).toSeq.sortBy(_._1)
      .map { case (name, df) =>
        val offs = offendersOf(df.queryExecution.analyzed)
        spark.catalog.clearCache()
        name -> offs
      }.toMap
    val goldViolations = goldFound.filter(_._2.nonEmpty)
      .map { case (g, offs) => s"$g: ${offs.mkString(", ")}" }
    assert(goldViolations.isEmpty,
      "retry-nondeterministic expressions in a gold BUILD plan:\n" +
        goldViolations.mkString("\n"))
  }

  test("EVERY declared query plans without a CartesianProduct") {
    // the one blanket scale rule: no unkeyed big-big product anywhere.
    // (BroadcastNestedLoopJoin is allowed — it only appears here as the
    // deliberate crossJoin(broadcast(single-row stats)) pattern; a big-big
    // product would surface as CartesianProduct instead.)
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = planOf(fn(spark, Sf))
        spark.catalog.clearCache() // operators may persist shared frames
        if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries with an unkeyed product: ${offenders.mkString(", ")}")
  }
}
