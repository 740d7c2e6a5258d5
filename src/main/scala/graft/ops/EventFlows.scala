package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-flow analytics: funnels, retention cohorts, and transition
  * matrices — the standard product-analytics trio over any (actor, ts,
  * event_type) stream. The reference's serving layer stops at track export
  * and top-k (`apps/export_tracks_to_explore.py`, `apps/track_explorer.py`);
  * these are the next questions an analyst asks of the same event shape
  * (where do actors drop off, do they come back, what follows what), and at
  * 100 TB they must run engine-side, not in a notebook.
  *
  * All three are one-or-two keyed-shuffle shapes: a window or aggregate on
  * the actor key, then a small rollup. Nothing is quadratic; no driver-side
  * state anywhere.
  */
object EventFlows {

  /** Earliest-chaining funnel: step 1 anchors at the actor's FIRST step-1
    * event; each later step is the first matching event STRICTLY AFTER the
    * previous step's time. `completed` = reached the last step with the
    * whole chain inside `windowMs` of the anchor. This is the standard
    * deterministic funnel semantics (greedy earliest); it can miss a
    * completion that a later anchor would have caught — the documented
    * trade every funnel engine makes for a one-pass definition.
    *
    * Output: one row per actor that performed step 1 — (key, t_1..t_n epoch
    * ms, step_reached, completed). Actors who never did step 1 are not in
    * the funnel population by definition.
    *
    * Scale: one filtered min-aggregate per step, each keyed on the actor —
    * N−1 co-partitioned joins between frames already hashed on the same
    * key, so the chain adds no extra exchanges after the first; the
    * step-k frame only shrinks (each level is a subset of the previous).
    */
  def funnel(events: DataFrame, keyCol: String, tsCol: String,
             typeCol: String, steps: Seq[String], windowMs: Long): DataFrame = {
    require(steps.size >= 2, "a funnel needs at least two steps")
    require(steps.distinct.size == steps.size, "funnel steps must be distinct")
    require(windowMs > 0, "windowMs must be positive")
    val base = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(keyCol).as("k"), unix_millis(col(tsCol)).as("ms"),
        col(typeCol).as("t"))
    var acc = base.filter(col("t") === steps.head)
      .groupBy("k").agg(min("ms").as("t_1"))
    steps.tail.zipWithIndex.foreach { case (s, i) =>
      val n = i + 2
      val nextMin = base.filter(col("t") === s)
        .join(acc.select(col("k"), col(s"t_${n - 1}")), "k")
        .filter(col("ms") > col(s"t_${n - 1}"))
        .groupBy("k").agg(min("ms").as(s"t_$n"))
      acc = acc.join(nextMin, Seq("k"), "left")
    }
    val reached = steps.indices.tail.map { i =>
      when(col(s"t_${i + 1}").isNotNull, 1L).otherwise(0L)
    }.reduce(_ + _) + lit(1L)
    val tLast = col(s"t_${steps.size}")
    acc.select(col("k").as(keyCol) +:
      steps.indices.map(i => col(s"t_${i + 1}")) :+
      reached.as("step_reached") :+
      when(tLast.isNull, lit(false))
        .otherwise(tLast - col("t_1") <= windowMs).as("completed"): _*)
  }

  /** Retention matrix: actors bucketed by first-seen day (cohort), activity
    * counted as distinct actors per (cohort, period offset). The classic
    * triangle a growth dashboard reads. Offsets are
    * `floor(days-since-cohort / periodDays)`, so offset 0 is the cohort
    * period itself.
    *
    * Scale: distinct (actor, day) first (one shuffle, map-side combine —
    * collapses event volume to actor-days), the first-seen aggregate joins
    * on the actor key, and the matrix rollup is tiny. The count-distinct in
    * the rollup is exact; swap for `approx_count_distinct` when cohorts
    * outgrow exactness needs — same plan.
    */
  def retentionMatrix(events: DataFrame, keyCol: String, tsCol: String,
                      periodDays: Int): DataFrame = {
    require(periodDays > 0, "periodDays must be positive")
    val actorDays = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("k"), date_trunc("day", col(tsCol)).as("d"))
      .distinct()
    val cohorts = actorDays.groupBy("k").agg(min(col("d")).as("d0"))
    actorDays.join(cohorts, "k")
      .select(col("k"), col("d0"),
        (datediff(col("d"), col("d0")) / periodDays).cast("long")
          .as("period_offset"))
      .groupBy(col("d0"), col("period_offset"))
      .agg(count_distinct(col("k")).as("n_active"))
      .select(unix_millis(col("d0")).as("cohort_ms"), col("period_offset"),
        col("n_active"))
  }

  /** First-order transition matrix: counts of (event type → next event type)
    * per actor-adjacent pair, in (ts, rowId) order — the Markov/Sankey view
    * of where flows go next. One window shuffle on the actor key, then a
    * tiny rollup keyed on the type pair.
    */
  def transitions(events: DataFrame, keyCol: String, rowIdCol: String,
                  tsCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(rowIdCol))
    events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull &&
        col(typeCol).isNotNull)
      .select(col(keyCol), col(tsCol), col(rowIdCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** Daily growth accounting: per day, the distinct active actors (DAU),
    * how many of them are brand new (their first-ever day), and the
    * cumulative actor count to date. The growth curve every product/corpus
    * ingest dashboard opens with.
    *
    * Scale: two aggregates keyed on the actor (first-seen day; actor-day
    * distinct), both map-side-combinable; the cumulative sum windows over
    * the DAY-grain frame — one row per day, so the unpartitioned running
    * window is O(days), never O(actors).
    */
  def growthAccounting(events: DataFrame, keyCol: String, tsCol: String)
      : DataFrame = {
    val base = events
      .filter(col(keyCol).isNotNull && col(tsCol).isNotNull)
      .select(col(keyCol).as("__k"), to_date(col(tsCol)).as("day"))
    val dau = base.groupBy("day").agg(count_distinct(col("__k")).as("dau"))
    val newByDay = base.groupBy("__k").agg(min(col("day")).as("day"))
      .groupBy("day").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dau.join(newByDay, Seq("day"), "left")
      .withColumn("new_users", coalesce(col("new_users"), lit(0L)))
      .withColumn("cum_users", sum(col("new_users")).over(w))
  }
}
