package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.pos_cell

/** Track/cohort serving queries: the Spark re-expression of
  * `apps/export_tracks_to_explore.py` (parameterized cohort export) and
  * `apps/track_explorer.py` (path assembly, top-k selection).
  */
object Tracks {

  /** Cohort export (J3 + P2/P4 + O1): semi-join on a small id cohort, half-open
    * time window, position range filter, global sort
    * (`export_tracks_to_explore.py:31-69`). The cohort is tiny (a `VALUES`
    * list in the reference) → broadcast left-semi join; at 100 TB the big side
    * never shuffles for this join.
    */
  def trackExport(events: DataFrame, cohort: Seq[Long],
                  tsFrom: String, tsUntil: String): DataFrame = {
    val cohortDf = events.sparkSession.createDataFrame(
      cohort.map(java.lang.Long.valueOf).map(Tuple1(_))).toDF("user_id")
    events
      .join(broadcast(cohortDf), Seq("user_id"), "left_semi")
      .filter(col("ts") >= lit(tsFrom).cast("timestamp") &&
        col("ts") < lit(tsUntil).cast("timestamp") &&
        col("value").between(0.0, 500.0))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"), col("value"))
      .orderBy(col("ts_ms"), col("user_id"), col("event_id"))
  }

  /** Trajectory path assembly (A11, `track_explorer.py:53-84`): per-track
    * ordered point list. Encoded as a canonical string (`ts_ms,event_id,pos_u`
    * joined by `|`) so the DuckDB oracle (`string_agg ... ORDER BY`) hashes
    * identically — raw float formatting differs across engines, so positions
    * are scaled to integer micro-units first.
    */
  def trackPaths(events: DataFrame, minPoints: Int): DataFrame = {
    val pts = events.select(
      col("user_id"),
      unix_millis(col("ts")).as("ts_ms"),
      col("event_id"),
      floor(col("value") * lit(1000000.0)).as("pos_u"))
    pts
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("ts_ms"), col("event_id"), col("pos_u"))))
        .as("pts"))
      .filter(size(col("pts")) > minPoints)
      .select(col("user_id"), size(col("pts")).as("n_points"),
        array_join(transform(col("pts"), p =>
          concat_ws(",", p("ts_ms"), p("event_id"), p("pos_u"))), "|").as("path"))
      .orderBy("user_id")
  }

  /** Top-k tracks by sample count (O3, `track_explorer.py:221,234`); ties broken
    * by id for determinism.
    */
  def topTracks(events: DataFrame, k: Int): DataFrame =
    events.groupBy("user_id").agg(count(lit(1)).as("n_events"))
      .orderBy(col("n_events").desc, col("user_id"))
      .limit(k)

  /** Batch trip segmentation: the lag-and-cumsum twin of
    * [[graft.streaming.SessionTracks]] — a new trip starts where the gap to
    * the previous point exceeds `gapMs`. One window pass keyed by track id;
    * same keying as the silver bucketing, so a bucketed source feeds it
    * shuffle-free.
    */
  def tripSegments(events: DataFrame, gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    events
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"), col("event_id"))
      .withColumn("new_trip",
        when(col("ts_ms") - lag(col("ts_ms"), 1).over(w) > gapMs, 1).otherwise(0))
      .withColumn("trip_seq", sum(col("new_trip"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "trip_seq")
      .agg(min(col("ts_ms")).as("start_ms"), max(col("ts_ms")).as("end_ms"),
        count(lit(1)).as("n_points"))
      .orderBy("user_id", "trip_seq")
  }

  /** Origin→destination flow matrix: [[tripSegments]]' gap-based trips
    * reduced to their first/last position cell and aggregated into
    * (origin_cell, dest_cell) → (trips, vessels) — the port-to-port traffic
    * summary a fleet analyst reads off the trip table (the reference's
    * explorer renders individual trips, `track_explorer.py:65-84`; this is
    * their corpus-level rollup).
    *
    * Scale: the trip windows ride the same per-vessel partitioning as
    * [[tripSegments]] (a vessel's history fits a partition by the same
    * argument), endpoints come from `min_by`/`max_by` inside the one trip
    * aggregate — no sort of the full event set, no self-join — and the OD
    * matrix itself is bounded by cells², not events. Endpoint determinism
    * relies on (user_id, ts) being unique per vessel
    * (`TestdataCanarySpec` pins it on the shipped data; real AIS feeds
    * dedupe on exactly that key upstream — `window_dedup`).
    */
  def odFlows(events: DataFrame, gapMs: Long, res: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
    events
      .select(col("user_id"), unix_millis(col("ts")).as("ts_ms"),
        col("event_id"), col("value"))
      .withColumn("new_trip",
        when(col("ts_ms") - lag(col("ts_ms"), 1).over(w) > gapMs, 1).otherwise(0))
      .withColumn("trip_seq", sum(col("new_trip"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "trip_seq")
      .agg(expr("min_by(value, ts_ms)").as("o_val"),
        expr("max_by(value, ts_ms)").as("d_val"))
      .select(col("user_id"),
        pos_cell(col("o_val"), res).as("origin_cell"),
        pos_cell(col("d_val"), res).as("dest_cell"))
      .groupBy("origin_cell", "dest_cell")
      .agg(count(lit(1)).as("trips"),
        countDistinct(col("user_id")).as("vessels"))
  }

  /** Fixed-interval trajectory resampling with linear interpolation: put
    * every vessel's irregular position series onto a regular `intervalMs`
    * grid — the normalization step anything downstream that compares
    * tracks point-for-point needs (the explorer plots raw points,
    * `track_explorer.py:53-84`; co-movement quantizes to hours; a model
    * consuming tracks wants a fixed step). Grid ticks span
    * [ceil(first/ival)·ival, last] per vessel, each tick linearly
    * interpolated between its neighboring observations (exact-hit ticks
    * take the observation's value).
    *
    * Division of labor vs [[graft.ops.Trajectory.interpolateHourly]]: that
    * operator AGGREGATES to hour buckets first (per-hour means in integer
    * micro-units, densified hour grid) — the gold-rollup gap-filler; this
    * one interpolates between RAW observations at any caller-chosen
    * interval, preserving sub-hour structure — the track-normalization
    * primitive. Different grain, different consumers; neither subsumes
    * the other.
    *
    * Scale shape: ONE keyed shuffle. Points and generated ticks union into
    * a single per-vessel ordered window; the previous/next observation at
    * every tick comes from running `last`/`first` with ignoreNulls over
    * the two unbounded frames — same partitioning, same ordering, one
    * sort. No as-of self-join, no per-tick probe: cost is
    * O(points + ticks) per vessel regardless of gap structure. Tick count
    * is span/interval, bounded by the caller's interval choice, and the
    * grid generation is a per-vessel `sequence` off the min/max aggregate
    * — no driver loop.
    *
    * Determinism: ticks are exact epoch-ms longs; interpolation is the
    * fixed-shape `pv + (nv-pv)·(tick-pt)/(nt-pt)` with identical operation
    * order in the DuckDB twin, rounded to 6dp.
    */
  /** @param maxTicksPerKey tick-explosion guard (0 = off, the declared
    *   default — the oracle-matched semantics). The per-key grid is
    *   `span/interval` ticks, and span is MIN-to-MAX over whatever
    *   timestamps survived upstream cleaning: ONE bad-but-castable
    *   timestamp (epoch 0, a year-9999 typo) stretches a vessel's span to
    *   decades and its grid to millions of rows — a single poisoned input
    *   row costing more than the rest of the corpus combined, the
    *   `sequence`-explode sibling of the J1 dense-cell quadratic. With the
    *   cap on, any key whose grid would exceed it is excluded from the
    *   output ENTIRELY (its observations generate no ticks): a span that
    *   absurd is corrupt evidence, and interpolating across it would
    *   fabricate decades of synthetic positions — the same drop-don't-
    *   sample judgment as [[graft.ops.CoMovement]]'s `maxUidsPerCell`.
    *   The guard rides the existing span aggregate: no extra shuffle.
    */
  def resample(events: DataFrame, intervalMs: Long,
               maxTicksPerKey: Long = 0L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(intervalMs > 0, "interval must be positive")
    val p = events
      .filter(col("user_id").isNotNull && col("ts").isNotNull)
      .select(col("user_id"), unix_millis(col("ts")).as("t"), col("value"))
    val spans = p.groupBy("user_id")
      .agg(min(col("t")).as("lo"), max(col("t")).as("hi"))
      .select(col("user_id"),
        (ceil(col("lo").cast("double") / intervalMs).cast("long") * intervalMs)
          .as("start"), col("hi"))
      .filter(col("start") <= col("hi")) // a span shorter than one tick has no grid
    // integer `div`, not `/`: Spark's `/` is double division, so a key
    // whose span is not interval-aligned compared a FRACTIONAL tick count
    // against the cap (span 15 @ interval 10 gave 2.5 > 2 and dropped a
    // 2-tick key). `div` floors, matching the actual `sequence` grid size.
    val guarded =
      if (maxTicksPerKey <= 0L) spans
      else spans.filter(
        expr(s"(hi - start) div ${intervalMs}") + 1L <= maxTicksPerKey)
    val grid = guarded.select(col("user_id"),
      explode(sequence(col("start"), col("hi"), lit(intervalMs))).as("tick"))
    // union points (kind 0) and ticks (kind 1): at a coincident timestamp
    // the point sorts FIRST, so the tick's running `last` sees it and the
    // interpolation degenerates to the exact observation
    val u = p.select(col("user_id"), col("t"),
        col("value"), lit(null).cast("long").as("tick"), lit(0).as("kind"))
      .unionByName(grid.select(col("user_id"), col("tick").as("t"),
        lit(null).cast("double").as("value"), col("tick"), lit(1).as("kind")))
    // `value` as the final key breaks ties between two OBSERVATIONS at the
    // same millisecond — without it pv/nv (and the interpolated output)
    // would depend on arbitrary intra-tie order: nondeterministic across
    // task retries and free to diverge from the oracle. nulls_last matches
    // DuckDB's ASC default (Spark's default is nulls-first).
    val ord = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("kind"), col("value").asc_nulls_last)
    val prev = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val next = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obsT = when(col("kind") === 0, col("t"))
    val obsV = when(col("kind") === 0, col("value"))
    u.withColumn("pt", last(obsT, ignoreNulls = true).over(prev))
      .withColumn("pv", last(obsV, ignoreNulls = true).over(prev))
      .withColumn("nt", first(obsT, ignoreNulls = true).over(next))
      .withColumn("nv", first(obsV, ignoreNulls = true).over(next))
      .filter(col("kind") === 1)
      .select(col("user_id"), col("tick").as("tick_ms"),
        round(
          // nt null = the tick coincides with the vessel's LAST point (the
          // grid never extends past it), which sorted before the tick row
          when(col("nt").isNull || col("nt") === col("pt"), col("pv"))
            .otherwise(col("pv") + (col("nv") - col("pv")) *
              (col("tick") - col("pt")) / (col("nt") - col("pt"))),
          6).as("value_i"))
  }

  /** Synthetic-id repair (P11, `apps/track_explorer.py:180-185`): rows with
    * a missing track id get a unique `track_<n>` id. `monotonically_
    * increasing_id` is partition-prefixed — unique and stable within a job
    * without any coordination, exactly the property needed at scale (the
    * reference's pandas row-index trick does not survive distribution).
    */
  def repairTrackId(df: DataFrame, idCol: String): DataFrame =
    df.withColumn(idCol, coalesce(col(idCol).cast("string"),
      concat(lit("track_"), monotonically_increasing_id())))

  /** CSV export sink (K7, `export_tracks_to_explore.py:93-102,147-151`):
    * header CSV at a templated path. `coalesce(1)` mirrors the reference's
    * single-file contract — exports are cohort-sized by construction (the
    * semi-join in [[trackExport]] bounds them); never use on full tables.
    */
  def exportCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)

  /** Templated export filename (`tracks_{start}_{stop}.csv` shape). */
  def exportFileName(prefix: String, from: String, until: String): String = {
    def clean(s: String) = s.replaceAll("[^0-9A-Za-z]", "")
    s"${prefix}_${clean(from)}_${clean(until)}.csv"
  }

  /** Latest-row-per-key dedup via window (the data-contract-recommended
    * consumer pattern, `docs/data_contracts.md:113`): keep the newest event per
    * (user_id, hour), full deterministic tie-break.
    */
  /** Tag each position with the rectangular geofence(s) containing it —
    * half-open [min, max) on both axes so a boundary point lands in exactly
    * one of two ADJACENT zones. Overlap semantics: one output row per
    * containing zone (all memberships) — under deliberately overlapping
    * zones a position tags multiply, which is what a rollup over zones
    * wants; the streaming twin [[graft.streaming.StreamingGeofence]]
    * instead resolves overlap to the first-declared zone (a transition
    * stream needs ONE current zone), so batch/stream equivalence holds on
    * DISJOINT zone configs, divergence under overlap is by design, and
    * both docs say so. Zones are CONFIG, not data: constant cardinality in
    * the scale factor (the nation-table class), so the broadcast
    * nested-loop containment join is the right plan — the fact side streams
    * once, never shuffles, and each row tests a handful of bounding boxes.
    * A deployment with thousands of zones would pre-bucket both sides by
    * `GeoCell` and equi-join on the cell before the exact containment test;
    * at config scale that indirection costs more than it saves. Positions
    * outside every zone drop (inner join) — the port-area filter semantics.
    */
  def geofenceHits(pos: DataFrame, latCol: String, lonCol: String,
                   zones: Seq[(String, Double, Double, Double, Double)]): DataFrame = {
    val spark = pos.sparkSession
    import spark.implicits._
    val zdf = zones.toDF("zone", "lat_min", "lat_max", "lon_min", "lon_max")
    pos.join(broadcast(zdf),
      col(latCol) >= col("lat_min") && col(latCol) < col("lat_max") &&
        col(lonCol) >= col("lon_min") && col(lonCol) < col("lon_max"))
      .drop("lat_min", "lat_max", "lon_min", "lon_max")
  }

  def windowDedup(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // order on epoch micros, not raw ts: the parquet stores ns, Spark reads µs,
    // so the oracle must rank at the same (µs) precision
    val w = Window.partitionBy(col("user_id"), date_trunc("hour", col("ts")))
      .orderBy(unix_micros(col("ts")).desc, col("event_id").desc)
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), unix_millis(date_trunc("hour", col("ts"))).as("hour_ms"),
        col("event_id"), col("value"))
      .orderBy(col("user_id"), col("hour_ms"))
  }
}
