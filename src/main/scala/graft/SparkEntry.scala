package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables
import graft.ops.{CoMovement, Tracks}

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
  private val WidthSql = "62.5"
  val GtoThreshold = 0.4

  private def hourly(spark: SparkSession, dir: String): DataFrame =
    CoMovement.hourlyRollup(Tables.events(spark, dir), "user_id", "ts", "value", Res)

  /** Flagship: the reference's semantic heart (daily co-movement pairs) on
    * sf0.001; driver smoke-checks rows>0 (3 rows at res=3).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("pairs_daily")(spark, "/root/testdata/sf0.001")

  // ---------------------------------------------------------------- queries

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A1 + U1: hourly rollup with grid cell (create_uid_hourly_h3.sql:56-72)
    "uid_hourly" -> ((s, d) => hourly(s, d)
      .select(col("uid").as("user_id"), unix_millis(col("hour_ts")).as("hour_ms"),
        col("message_count"), round(col("avg_pos"), 6).as("avg_value"), col("cell"))
      .orderBy("user_id", "hour_ms")),

    // J1+J2+A2-A4+P6: the flagship pairs pipeline (create_pairs_daily.sql)
    "pairs_daily" -> ((s, d) => CoMovement.pairsDaily(hourly(s, d))
      .select(col("uid_a"), col("uid_b"), col("day_date"),
        col("hA"), col("hB"), col("gA"), col("gB"), col("hT"), col("gT"),
        round(col("temporal_o"), 6).as("temporal_o"),
        round(col("spatial_o"), 6).as("spatial_o"),
        round(col("gto"), 6).as("gto"))
      .orderBy("uid_a", "uid_b", "day_date")),

    // A5: pair lifetime summary with exact median (create_pairs_total.sql:11-21)
    "pairs_total" -> ((s, d) => CoMovement.pairsTotal(
        CoMovement.pairsDaily(hourly(s, d)), GtoThreshold)
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

    // A1-analog pricing rollup on lineitem: wide hash agg with decimal-exact
    // sums (engines' double summation order differs; decimals are exact)
    "q1_agg" -> ((s, d) => Tables.lineitem(s, d)
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("sum_qty"),
        sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("sum_base_price"),
        sum(col("l_extendedprice").cast("decimal(18,4)") *
          (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)")))
          .cast("double").as("sum_disc_price"),
        round(avg(col("l_quantity")), 6).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")),
  )

  // ------------------------------------------------------------- oracle SQL

  /** Shared DuckDB CTE: hourly rollup + pairs pipeline (unrounded scores; the
    * per-query SELECT rounds at the edge, so downstream aggregates see
    * bit-identical doubles in both engines).
    */
  private val HourlyCte =
    s"""WITH hourly AS (
       |  SELECT user_id AS uid,
       |         date_trunc('hour', ts) AS hour_ts,
       |         CAST(date_trunc('hour', ts) AS DATE) AS dt,
       |         CAST(extract(hour FROM date_trunc('hour', ts)) AS INTEGER) AS hr,
       |         CAST(count(*) AS BIGINT) AS message_count,
       |         avg(value) AS avg_pos,
       |         CAST(floor(avg(value) / $WidthSql) AS BIGINT) AS cell
       |  FROM events
       |  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND value BETWEEN 0 AND 500
       |  GROUP BY user_id, date_trunc('hour', ts))""".stripMargin

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
         |       round(avg_pos, 6) AS avg_value, cell
         |FROM hourly ORDER BY user_id, hour_ms""".stripMargin,

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

    "window_dedup" ->
      """WITH r AS (
        |  SELECT user_id, epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_id, value,
        |         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |                            ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, hour_ms, event_id, value FROM r WHERE rn = 1
        |ORDER BY user_id, hour_ms""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |                (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |       round(avg(l_quantity), 6) AS avg_qty,
        |       round(avg(l_discount), 6) AS avg_disc,
        |       CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,
  )
}
