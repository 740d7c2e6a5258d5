package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trajectory-quality operators over point tracks — the physical-plausibility
  * layer the reference's AIS domain implies but leaves to analysts: implied
  * speed between consecutive pings (GPS-glitch / teleport detection), dwell
  * episodes (consecutive pings in one grid cell — the anchorage/port-visit
  * shape), and linear gap interpolation on a dense hourly grid (the
  * resampling step every downstream trajectory model wants). The reference
  * assembles ordered tracks app-side (`apps/track_explorer.py:53-84`) and
  * splits trips on time gaps; these operators extend that family with the
  * kinematic checks a production AIS pipeline runs before trusting a track.
  *
  * Determinism contract (cross-engine hash-match): positions become integer
  * MICRO-DEGREES (`round(deg*1e6)` longs) before any arithmetic, and ALL
  * kinematics stay in exact integers end to end — squared distance is an
  * exact BIGINT, its square root is a floor-corrected INTEGER sqrt (the
  * float `sqrt` only seeds a ±1 guess that two integer comparisons pin
  * exactly), speed is an exact integer division in micro-degrees/hour, and
  * the closing km conversions are each ONE multiply of an exactly-
  * representable integer by the shared literal `0.000111195` — a single
  * correctly-rounded IEEE op on identical inputs, bit-identical on every
  * engine with NO `round()` anywhere. (The previous chain ended in
  * `round(double, 6)`; the density-preserving 10x oracle caught a genuine
  * midpoint straddle — 8564.474331 vs .47433 — the same seam class the
  * round-15 geo rework removed. No engine-computed float reaches a bin
  * boundary anymore.) Interpolated values come from exact integer
  * (sum, count) pairs with the closing float chain written identically in
  * the oracle SQL.
  *
  * Scale shape: every operator is one shuffle on the track key followed by
  * narrow per-partition window evaluation — the same plan as any per-entity
  * window; skew follows the hottest single track, never the corpus. The
  * interpolation grid is generated per key from the key's OWN observed span
  * ([[TimeSeries.densifyHours]]), so grid size is Σ per-key spans, not
  * keys × global span.
  */
object Trajectory {

  /** Per-ping implied speed: for each consecutive ping pair within a track
    * (ordered by ts, tie-broken on `rowIdCol`), planar micro-degree distance
    * (equirectangular — degrees × 111.195 km/deg; longitude wraps the short
    * way across the antimeridian) over elapsed time. `is_teleport` flags
    * speeds above `teleportKmh` — physically impossible jumps that mark GPS
    * glitches or MMSI collisions (two transmitters sharing an id, the AIS
    * failure mode the reference's synthetic-id repair works around,
    * `apps/track_explorer.py:63-66`). First ping of a track: null speed,
    * null flag.
    */
  def impliedSpeed(points: DataFrame, idCol: String, rowIdCol: String,
                   tsCol: String, latCol: String, lonCol: String,
                   teleportKmh: Double): DataFrame = {
    require(teleportKmh > 0, "teleport threshold must be positive")
    val w = Window.partitionBy(col(idCol)).orderBy(col(tsCol), col(rowIdCol))
    val withPrev = points
      .filter(col(idCol).isNotNull && col(tsCol).isNotNull &&
        col(latCol).isNotNull && col(lonCol).isNotNull)
      .select(col(idCol), col(rowIdCol), col(tsCol),
        round(col(latCol) * 1000000).cast("long").as("__latu"),
        round(col(lonCol) * 1000000).cast("long").as("__lonu"))
      .withColumn("__ts_ms", unix_millis(col(tsCol)))
      .withColumn("__p_latu", lag(col("__latu"), 1).over(w))
      .withColumn("__p_lonu", lag(col("__lonu"), 1).over(w))
      .withColumn("__p_ts", lag(col("__ts_ms"), 1).over(w))
    val dlat = col("__latu") - col("__p_latu")
    val dlonAbs = abs(col("__lonu") - col("__p_lonu"))
    val dlon = when(dlonAbs > 180000000L, lit(360000000L) - dlonAbs)
      .otherwise(dlonAbs)
    // exact integer sqrt of the exact BIGINT squared distance: the float
    // sqrt seeds a guess within ±1 (d2 < 2^57, so the double conversion +
    // correctly-rounded sqrt err by far less than one unit), and the two
    // integer comparisons pin the true floor exactly — engine-independent
    val d2 = dlat * dlat + dlon * dlon
    val s0 = floor(sqrt(d2.cast("double"))).cast("long")
    val s1 = s0 - when(s0 * s0 > d2, lit(1L)).otherwise(lit(0L))
    val distU = s1 + when((s1 + lit(1L)) * (s1 + lit(1L)) <= d2, lit(1L))
      .otherwise(lit(0L))
    val dtMs = col("__ts_ms") - col("__p_ts")
    // exact integer micro-degrees/hour: subtract the remainder first so the
    // double division is of exactly-divisible exactly-representable values
    // (floor(a/b) on raw doubles can round UP across the integer when the
    // remainder is within an ulp of b — this form cannot)
    val spNum = distU * lit(3600000L)
    val speedMu = ((spNum - (spNum % dtMs)) / dtMs).cast("long")
    // ONE multiply of an exact integer by the shared literal — the only
    // float in each output, bit-identical across engines; never round()ed
    val distKm = distU.cast("double") * lit(KmPerMicroDeg)
    val speed = when(col("__p_ts").isNull, lit(null))
      .when(dtMs > 0, speedMu.cast("double") * lit(KmPerMicroDeg))
      .otherwise(lit(null))
    withPrev.select(
      col(idCol), col(rowIdCol), col("__ts_ms").as("ts_ms"),
      dtMs.as("gap_ms"),
      when(col("__p_ts").isNull, lit(null)).otherwise(distKm)
        .as("dist_km"),
      speed.as("speed_kmh"),
      when(speed.isNull, lit(null)).otherwise(speed > teleportKmh)
        .as("is_teleport"))
  }

  /** km per integer micro-degree (111.195 km/deg ÷ 1e6) as ONE decimal
    * literal — every consumer (batch, streaming, oracle SQL, specs) must
    * multiply by THIS literal, never by `111.195 / 1e6` (the division can
    * land one ulp away from the parsed literal).
    */
  val KmPerMicroDeg: Double = 0.000111195

  /** Dwell episodes: maximal runs of consecutive pings (per track, time
    * order) that share one grid cell, for runs of at least `minPings`.
    * The gaps-and-islands shape — island id = global row_number minus
    * per-cell row_number, both over the same total order — so a revisited
    * cell yields a NEW episode, which is what distinguishes "anchored for
    * six hours" from "passed through twice". One shuffle on the track key;
    * the island groupBy re-uses the same key prefix.
    */
  def dwellEpisodes(points: DataFrame, idCol: String, rowIdCol: String,
                    tsCol: String, cellCol: String,
                    minPings: Int = 2): DataFrame = {
    require(minPings >= 1, "minPings must be >= 1")
    val w = Window.partitionBy(col(idCol)).orderBy(col(tsCol), col(rowIdCol))
    val wc = Window.partitionBy(col(idCol), col(cellCol))
      .orderBy(col(tsCol), col(rowIdCol))
    points
      .filter(col(idCol).isNotNull && col(tsCol).isNotNull &&
        col(cellCol).isNotNull)
      .select(col(idCol), col(cellCol), col(rowIdCol), col(tsCol),
        unix_millis(col(tsCol)).as("__ts_ms"))
      .withColumn("__isl", row_number().over(w) - row_number().over(wc))
      .groupBy(col(idCol), col(cellCol), col("__isl"))
      .agg(min(col("__ts_ms")).as("start_ms"), max(col("__ts_ms")).as("end_ms"),
        count(lit(1)).as("n_pings"))
      .filter(col("n_pings") >= minPings)
      .drop("__isl")
  }

  /** Linear interpolation on a dense hourly grid: aggregate `valueCol` to
    * per-(key, hour) exact integer (sum-of-units, count) pairs, densify each
    * key's own observed span, then fill every silent hour by linear
    * interpolation between the nearest observed hours on both sides.
    * Boundary hours are always observed (the grid spans min..max observed),
    * so every silent grid point has both neighbors. `is_observed`
    * distinguishes measured from synthesized rows — downstream consumers
    * (trend models, the reference's track time-charts) must be able to tell.
    *
    * Every interpolated value is the exact rational
    * `(su_p·n_n·(q−dp) + su_n·n_p·dp) / (n_p·n_n·q)` in `unitScale` units
    * (q = hour gap, dp = offset from the left neighbor), rounded HALF-UP to
    * an integer micro-value with INTEGER arithmetic — `(2·num+den) div
    * (2·den)` — because a float chain here lands on exact .5 ties at the
    * rounding scale (the inputs are low-precision decimals, so the rationals
    * have small denominators) and the engines split on them. The closing
    * `micro / 1e6` division is the only float op and is correctly rounded
    * everywhere. Requires a nonnegative value domain (integer div truncation
    * semantics differ across engines below zero). Overflow bound: the
    * interpolation products must stay under 2^63 — `2 · max-hourly-sum ×
    * max-hourly-count × max-gap-hours < 2^63`; for very dense series drop
    * `unitScale` (the dial exists for exactly this trade).
    *
    * Per-partition cost: the prev/next scans are running `last/first` over
    * rows frames — one forward and one backward pass per key, O(grid).
    *
    * Division of labor vs [[graft.ops.Tracks.resample]]: this operator
    * gap-fills the HOURLY ROLLUP (per-hour means, integer-exact) — the
    * gold-stage consumer; `resample` interpolates between raw observations
    * at an arbitrary interval, preserving sub-hour structure. Different
    * grain, different consumers; neither subsumes the other.
    */
  def interpolateHourly(events: DataFrame, keyCol: String, tsCol: String,
                        valueCol: String, unitScale: Int = 1000000): DataFrame = {
    require(unitScale > 0, "unitScale must be positive")
    val obs = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(valueCol).isNotNull)
      .groupBy(col(keyCol), date_trunc("hour", col(tsCol)).as("hour_ts"))
      .agg(sum(round(col(valueCol) * unitScale).cast("long")).as("__su"),
        count(lit(1)).as("__n"))
    val dense = TimeSeries.densifyHours(obs, keyCol, "hour_ts",
      Seq("__su" -> lit(null), "__n" -> lit(null)))
    val ehr = (unix_millis(col("hour_ts")) / lit(3600000L)).cast("long")
    val wp = Window.partitionBy(col(keyCol)).orderBy(col("__ehr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wn = Window.partitionBy(col(keyCol)).orderBy(col("__ehr"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    def obsCol(c: String) = when(col("__su").isNotNull, col(c))
    val withNbrs = dense
      .withColumn("__ehr", ehr)
      .withColumn("__sup", last(obsCol("__su"), ignoreNulls = true).over(wp))
      .withColumn("__np", last(obsCol("__n"), ignoreNulls = true).over(wp))
      .withColumn("__hp", last(obsCol("__ehr"), ignoreNulls = true).over(wp))
      .withColumn("__sun", first(obsCol("__su"), ignoreNulls = true).over(wn))
      .withColumn("__nn", first(obsCol("__n"), ignoreNulls = true).over(wn))
      .withColumn("__hn", first(obsCol("__ehr"), ignoreNulls = true).over(wn))
    val q = col("__hn") - col("__hp")
    val dp = col("__ehr") - col("__hp")
    val num = when(col("__su").isNotNull, col("__su"))
      .otherwise(col("__sup") * col("__nn") * (q - dp) +
        col("__sun") * col("__np") * dp)
    val den = when(col("__su").isNotNull, col("__n"))
      .otherwise(col("__np") * col("__nn") * q)
    withNbrs
      .withColumn("__num", num)
      .withColumn("__den", den)
      .withColumn("value_micro", expr("(2 * __num + __den) div (2 * __den)"))
      .select(col(keyCol),
        unix_millis(col("hour_ts")).as("hour_ms"),
        col("value_micro"),
        (col("value_micro").cast("double") / lit(unitScale.toDouble))
          .as("value_interp"),
        col("__su").isNotNull.as("is_observed"))
  }
}
