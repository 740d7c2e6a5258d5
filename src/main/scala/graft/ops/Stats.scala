package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distribution-shaping operators: quantile clipping (winsorization) and
  * equi-depth histograms. Together with `QualityChecks.zscoreOutliers` these
  * are the standard value-hygiene stages of a monitoring / feature pipeline.
  */
object Stats {

  /** Per-group Pearson correlation with EXACT second moments: both inputs
    * quantize to integer units, every sum (Σx, Σy, Σx², Σy², Σxy) runs as
    * 38-digit decimal — exact integer arithmetic on any engine, immune to
    * float summation order — and floating point appears only in the final
    * `num / (√denx · √deny)` projection over exactly-agreed operands.
    * `corr` is null for degenerate groups (zero variance on either side)
    * instead of NaN.
    *
    * Scale: ONE map-side-combinable aggregate pass (six sums per group),
    * no window, no second scan — the textbook one-pass moment form made
    * safe by exact accumulation (its float form is notoriously
    * cancellation-prone; in exact integers cancellation is harmless).
    * Built-in `corr` is the non-deterministic-across-partitionings float
    * fold; this is the reproducible twin.
    */
  def exactCorr(df: DataFrame, groupCol: String, xCol: Column, yCol: Column,
                xUnit: Long = 1L, yUnit: Long = 1000000L): DataFrame = {
    val dec = "decimal(38,0)"
    val x = round(xCol * xUnit).cast(dec)
    val y = round(yCol * yUnit).cast(dec)
    val g = df.select(col(groupCol), x.as("__x"), y.as("__y"))
      .groupBy(groupCol)
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum((col("__x") * col("__x")).cast(dec)).as("sxx"),
        sum((col("__y") * col("__y")).cast(dec)).as("syy"),
        sum((col("__x") * col("__y")).cast(dec)).as("sxy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast(dec)
    val denx = (col("n") * col("sxx") - col("sx") * col("sx")).cast(dec)
    val deny = (col("n") * col("syy") - col("sy") * col("sy")).cast(dec)
    g.select(col(groupCol), col("n").cast("long").as("n"),
      when(denx > 0 && deny > 0,
        round(num.cast("double") /
          (sqrt(denx.cast("double")) * sqrt(deny.cast("double"))), 6))
        .as("corr"))
  }

  /** Per-group least-squares line `y = slope·x + intercept` with the same
    * exact decimal moments as [[exactCorr]] — the trend monitor ("is error
    * volume drifting up") whose slope cannot wobble with partitioning.
    * Slope/intercept compute from exact integer sums; the only floats are
    * the two output divisions. Degenerate groups (zero x-variance) are null.
    * Outputs descale by the units, so slope/intercept are in the original
    * y-per-x terms.
    */
  def trendFit(df: DataFrame, groupCol: String, xCol: Column, yCol: Column,
               xUnit: Long = 1L, yUnit: Long = 1000000L): DataFrame = {
    val dec = "decimal(38,0)"
    val x = round(xCol * xUnit).cast(dec)
    val y = round(yCol * yUnit).cast(dec)
    val g = df.select(col(groupCol), x.as("__x"), y.as("__y"))
      .groupBy(groupCol)
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("__x")).as("sx"), sum(col("__y")).as("sy"),
        sum((col("__x") * col("__x")).cast(dec)).as("sxx"),
        sum((col("__x") * col("__y")).cast(dec)).as("sxy"))
    val num = (col("n") * col("sxy") - col("sx") * col("sy")).cast(dec)
    val denx = (col("n") * col("sxx") - col("sx") * col("sx")).cast(dec)
    // slope_units = num/denx is y-units per x-unit; rescale to raw terms:
    // slope_raw = slope_units * xUnit / yUnit. Intercept from the exact
    // sums: (sy - slope_units * sx) / n, then /yUnit. The unit factors are
    // plan-time literals, so both engines apply identical float steps.
    val slopeU = num.cast("double") / denx.cast("double")
    g.select(col(groupCol), col("n").cast("long").as("n"),
      when(denx > 0,
        round(slopeU * (lit(xUnit.toDouble) / lit(yUnit.toDouble)), 6))
        .as("slope"),
      when(denx > 0,
        round((col("sy").cast("double") - slopeU * col("sx").cast("double"))
          / col("n").cast("double") / lit(yUnit.toDouble), 6))
        .as("intercept"))
  }

  /** Winsorize (clip) a value column at per-group exact quantiles: values
    * below the `pLo` quantile or above the `pHi` quantile snap to the
    * boundary. Quantiles are computed over `unitScale`-scaled integer units
    * (exact inputs → both engines interpolate the same doubles —
    * the same trick as `QualityChecks.zscoreOutliers`), broadcast back, and
    * applied as a narrow map — the fact table never shuffles.
    *
    * Exact `percentile` buffers each group's values on the agg side; at
    * 100 TB swap the bounds aggregate for `approx_percentile` (same plan
    * shape, sketch-mergeable) — the clip map is unchanged. The exact form is
    * kept default because it is cross-engine deterministic (oracle-checkable).
    */
  def winsorize(df: DataFrame, idCol: String, groupCol: String,
                valueCol: String, pLo: Double, pHi: Double,
                unitScale: Int = 100): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, "need 0 <= pLo < pHi <= 1")
    val units = round(col(valueCol) * unitScale).cast("long")
    val bounds = df.select(col(groupCol), units.as("__u"))
      .groupBy(col(groupCol))
      .agg(expr(s"percentile(__u, $pLo)").as("__lo"),
        expr(s"percentile(__u, $pHi)").as("__hi"))
    df.join(broadcast(bounds), groupCol)
      .select(col(idCol), col(groupCol),
        round(least(greatest(units.cast("double"), col("__lo")), col("__hi"))
          / unitScale, 6).as("clipped"),
        (units.cast("double") < col("__lo") ||
          units.cast("double") > col("__hi")).as("was_clipped"))
  }

  /** Robust per-group outlier scoring: the modified z-score
    * `(x − median) / (1.4826 · MAD)` (MAD = median absolute deviation;
    * 1.4826 the standard normal-consistency constant). The
    * median/MAD pair is what a monitoring pipeline wants when the metric
    * itself has outliers — one wild value drags a mean/std z-score's OWN
    * baseline (`QualityChecks.zscoreOutliers`), but moves a median by at
    * most one rank. Groups where more than half the values are identical
    * have MAD = 0: every rz is null there (flagging everything or nothing
    * are both wrong; the caller picks a fallback).
    *
    * Determinism: medians are exact `percentile` over `unitScale`-scaled
    * integer units; deviations are kept in DOUBLED units so the half-integer
    * median cancels back to exact integers before the second percentile —
    * both engines interpolate identical doubles end to end. Scale shape:
    * two group aggregates (the deviation pass joins the broadcast medians —
    * the fact table never shuffles), then a broadcast-stats narrow map, the
    * [[winsorize]] profile; at 100 TB swap exact percentiles for
    * `approx_percentile`, same plan.
    */
  def robustOutliers(df: DataFrame, idCol: String, groupCol: String,
                     valueCol: String, zThresh: Double,
                     unitScale: Int = 100): DataFrame = {
    require(zThresh > 0, "zThresh must be positive")
    val units = round(col(valueCol) * unitScale).cast("long")
    val med = df.select(col(groupCol), units.as("__u"))
      .groupBy(col(groupCol))
      .agg(expr("percentile(__u, 0.5)").as("__med"))
    // |2u − 2·median| is an exact long (the median is a half-integer at
    // worst), so the MAD percentile also runs over exact integer inputs
    val dev2 = df.select(col(groupCol), units.as("__u"))
      .join(broadcast(med), groupCol)
      .select(col(groupCol),
        abs(lit(2) * col("__u") - (lit(2.0) * col("__med")).cast("long"))
          .as("__d2"))
      .groupBy(col(groupCol))
      .agg(expr("percentile(__d2, 0.5)").as("__mad2"))
    val rzRaw = (units.cast("double") - col("__med")) /
      (lit(1.4826) * (col("__mad2") / lit(2.0)))
    val rz = when(col("__mad2") > 0, rzRaw).otherwise(lit(null))
    df.join(broadcast(med), groupCol)
      .join(broadcast(dev2), groupCol)
      .select(col(idCol), col(groupCol),
        round(units.cast("double") / unitScale, 6).as("value_r"),
        round(rz, 6).as("robust_z"),
        when(col("__mad2") > 0, abs(rzRaw) > zThresh).otherwise(lit(null))
          .as("is_outlier"))
  }

  /** Equi-depth histogram: split each group's values into `n` equal-count
    * buckets (`ntile`) and report each bucket's count and value range —
    * the distribution profile a monitoring dashboard reads.
    *
    * ntile sorts each group inside one task — fine for bounded groups
    * (per-type metrics, per-day slices); for corpus-scale groups derive cut
    * points from `approx_percentile` instead and bucket with a narrow map
    * (the [[winsorize]] broadcast shape). The exact window form is the
    * declared/oracle-checked one because its output is deterministic to the
    * row: ties are broken by `tieCol`, mirrored in the oracle's ORDER BY.
    */
  def equiDepthHistogram(df: DataFrame, groupCol: String, valueCol: String,
                         tieCol: String, n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(valueCol), col(tieCol))
    df.select(col(groupCol), col(valueCol), col(tieCol))
      .withColumn("bucket", ntile(n).over(w).cast("long"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).as("n_rows"),
        round(min(col(valueCol)), 6).as("lo"),
        round(max(col(valueCol)), 6).as("hi"))
  }

  /** Exponentially time-decayed sum per key: `Σ value · 2^(−age/halfLife)`
    * with `age` in whole days before `refDate` — the recency-weighted
    * engagement/volume score (a purchase a half-life ago counts half).
    * Computing it as a per-row decay + ONE map-side-combinable sum beats
    * the streaming-state formulation for batch: no order dependence, no
    * state, one shuffle on the key.
    *
    * Determinism: each term quantizes to integer micro-units BEFORE the sum
    * (the lm/entropy convention) — the aggregate is exact integer addition,
    * order-independent under any partitioning; `pow`'s last-ulp noise is
    * absorbed by the per-term rounding, which both engines apply to
    * identical doubles.
    */
  def decayedSum(df: DataFrame, keyCol: String, valueCol: Column,
                 tsCol: Column, refDate: String, halfLifeDays: Double)
      : DataFrame = {
    require(halfLifeDays > 0, "halfLifeDays must be positive")
    // age clamped at 0: an event NEWER than the reference date carries full
    // weight 1, never exponential GROWTH — unclamped, a corpus extending
    // past refDate (the density-preserving 10x span did) drives
    // 2^(+age/7)·value·1e6 beyond 2^63, which Spark silently clamps and
    // DuckDB rejects (caught by the span-corpus oracle, round 16)
    val age = greatest(
      datediff(lit(refDate).cast("date"), to_date(tsCol)), lit(0))
    val term = round(valueCol * pow(lit(2.0), -age.cast("double") / halfLifeDays)
      * 1000000.0).cast("long")
    df.select(col(keyCol), term.as("__t"))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"), sum(col("__t")).as("__s"))
      .select(col(keyCol), col("n_events"),
        round(col("__s").cast("double") / 1000000.0, 6).as("decayed_value"))
  }
}
