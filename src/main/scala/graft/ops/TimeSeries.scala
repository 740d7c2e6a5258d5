package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series densification: turn a sparse keyed series (rows only where
  * something happened) into a dense regular grid (one row per key per step,
  * zeros/nulls where nothing happened). Downstream consumers — trend models,
  * monitors, gap detectors, the reference's hourly-rollup visualizations
  * (`apps/track_explorer.py` time charts) — almost always want the dense
  * form; materializing it in the engine beats per-consumer client-side
  * filling.
  *
  * Scale: the grid is generated per key from that key's own [min, max] span
  * (never the global span — a key active for a day must not explode to the
  * corpus's full year), so grid size is Σ per-key spans. The span aggregate
  * and the fill join both key on the series key — two co-partitioned
  * shuffles, and the explode is bounded fanout between them.
  */
object TimeSeries {

  /** Densify an already-aggregated hourly series: `obs` has one row per
    * (key, hour) with observation columns; the result has one row per key
    * per hour of the key's own observed span, with each fill column
    * defaulted where the grid point has no observation.
    *
    * `fills`: (column name, default value) — e.g. `("n", lit(0L))`.
    */
  def densifyHours(obs: DataFrame, keyCol: String, hourCol: String,
                   fills: Seq[(String, Column)]): DataFrame = {
    val span = obs.groupBy(col(keyCol))
      .agg(min(col(hourCol)).as("__h0"), max(col(hourCol)).as("__h1"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("__h0"), col("__h1"), expr("interval 1 hour")))
        .as(hourCol))
    grid.join(obs, Seq(keyCol, hourCol), "left")
      .select(col(keyCol) +: col(hourCol) +:
        fills.map { case (c, d) => coalesce(col(c), d).as(c) }: _*)
  }

  /** Events → dense per-key hourly counts: the groupBy + densify composition
    * as one call (count zero where the key was silent).
    */
  def hourlyCountsDense(events: DataFrame, keyCol: String,
                        tsCol: String): DataFrame = {
    val obs = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour_ts"))
      .agg(count(lit(1)).as("n_events"))
    densifyHours(obs, keyCol, "hour_ts", Seq("n_events" -> lit(0L)))
  }

  /** Event-time rolling aggregates over a RANGE frame: for every row, the
    * count and mean of `valueCol` across the key's rows in the trailing
    * `windowSec` seconds (inclusive of peers at the same instant — a range
    * frame, not a row frame, so simultaneous events always see each other
    * regardless of physical order). The standard trailing-window feature
    * (activity in the last hour, rolling spend) computed engine-side.
    *
    * Determinism: the rolling sum runs over `unitScale`-scaled integer units
    * (exact — double-sum association order differs across engines), and the
    * single closing division is reproducible anywhere.
    *
    * Scale: one shuffle on the series key; each partition sorts its keys'
    * rows once and evaluates every frame with a sliding two-pointer pass —
    * cost O(rows), not O(rows × frame width). Keys are independent, so skew
    * follows the hottest key, same as any per-entity window.
    */
  def rollingRangeStats(events: DataFrame, idCol: String, keyCol: String,
                        tsCol: String, valueCol: String, windowSec: Long,
                        unitScale: Int = 10000): DataFrame = {
    require(windowSec > 0, "windowSec must be positive")
    val us = unix_micros(col(tsCol))
    val units = round(col(valueCol) * unitScale).cast("long")
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__us"))
      .rangeBetween(-windowSec * 1000000L, Window.currentRow)
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(idCol), col(keyCol), us.as("__us"),
        unix_millis(col(tsCol)).as("ts_ms"), units.as("__u"))
      .withColumn("n_win", count(col("__u")).over(w))
      .withColumn("sum_u", sum(col("__u")).over(w))
      .select(col(idCol), col(keyCol), col("ts_ms"), col("n_win"),
        round(col("sum_u").cast("double") / (col("n_win") * unitScale), 6)
          .as("avg_win"))
  }
}
