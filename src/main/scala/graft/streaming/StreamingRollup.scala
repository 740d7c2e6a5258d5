package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{micro_mean, micro_units, pos_cell_micro}

/** Structured Streaming variant of the hourly rollup (A1/U1 as a stream).
  *
  * The reference is batch-only — its "streaming" is bounded-memory chunked
  * ingestion plus day-at-a-time incremental refresh (SURVEY.md §2.10). This
  * module is the Spark-native generalization: the same rollup semantics on an
  * unbounded source, with watermarked tumbling windows standing in for the
  * `date_trunc('hour')` grain (`sql/gold/create_uid_hourly_h3.sql:56-72`) and
  * late-data tolerance replacing the reference's partition-rebuild correction
  * path (`pipelines/refresh_gold_tables.py:633-646`).
  *
  * Scale: stateful agg keyed by (uid, window) — state is bounded by the
  * watermark horizon × active vessels, and the shuffle key matches the batch
  * rollup so the same partitioning advice applies.
  */
object StreamingRollup {

  /** Watermarked hourly rollup. Works on any streaming (or batch) frame with
    * (uidCol, tsCol, posCol). Append-mode compatible: emits a (uid, hour)
    * row once the watermark passes the window end.
    */
  def hourly(events: DataFrame, uidCol: String, tsCol: String, posCol: String,
             res: Int, watermark: String = "2 hours"): DataFrame =
    events
      .filter(col(uidCol).isNotNull && col(tsCol).isNotNull &&
        col(posCol).between(0.0, 500.0))
      .withWatermark(tsCol, watermark)
      .groupBy(col(uidCol).as("uid"), window(col(tsCol), "1 hour").as("w"))
      // quantized identically to the batch rollup (CoMovement.hourlyRollup)
      // so the batch ≡ stream equivalence holds bit-for-bit at bin edges:
      // exact integer micro-unit sum + integer mean + integer lattice
      // (round-15 form — see micro_units)
      .agg(count(lit(1)).as("message_count"),
        sum(micro_units(col(posCol))).as("sum_micro"))
      .withColumn("mean_micro",
        micro_mean(col("sum_micro"), col("message_count")))
      .select(col("uid"), col("w.start").as("hour_ts"),
        to_date(col("w.start")).as("dt"), hour(col("w.start")).as("hr"),
        col("message_count"),
        (col("mean_micro").cast("double") / lit(1000000.0)).as("avg_pos"),
        pos_cell_micro(col("mean_micro"), res).as("cell"))

  /** File-source incremental ingestion: the reference's "process only new
    * daily archives" loop as a self-checkpointing stream. With
    * `Trigger.AvailableNow` this is the batch day-walk (`refresh_gold_tables
    * .py:648-669`) without the hand-rolled bookkeeping: the checkpoint tracks
    * which files are done, idempotently.
    */
  def fileStream(spark: org.apache.spark.sql.SparkSession, glob: String,
                 schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.readStream.schema(schema).option("maxFilesPerTrigger", "16").csv(glob)

  /** Session-window rollup via the BUILT-IN `session_window` aggregate — the
    * declarative counterpart of [[SessionTracks]]' custom
    * flatMapGroupsWithState trips: windows merge while events arrive within
    * `gap` of each other and close when the watermark passes last-event +
    * gap. State per (uid, open session) is managed by the engine — use this
    * form when per-session output needs no custom per-event logic; drop to
    * SessionTracks when it does (hard caps, custom emission).
    */
  def sessionized(events: DataFrame, uidCol: String, tsCol: String,
                  posCol: String, gap: String,
                  watermark: String = "2 hours"): DataFrame =
    events
      .filter(col(uidCol).isNotNull && col(tsCol).isNotNull)
      .withWatermark(tsCol, watermark)
      .groupBy(col(uidCol).as("uid"), session_window(col(tsCol), gap).as("w"))
      .agg(count(lit(1)).as("n_events"), avg(col(posCol)).as("avg_pos"))
      .select(col("uid"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"),
        col("avg_pos"))

  /** Stream-static dimension enrichment: every micro-batch of the fact
    * stream left-joins the (small) static dim, broadcast — the stateless
    * streaming join, no watermark or state store involved (unlike
    * [[StreamingJoin.intervalJoin]]'s stream-stream case).
    *
    * Freshness semantics worth pinning: a static DataFrame's CONTENT is
    * re-evaluated against the source each micro-batch (a parquet-backed dim
    * picks up newly written files), but its PLAN is fixed at query start —
    * schema or partition-layout changes need a stream restart. At 100 TB
    * the fact side never shuffles for this join; only the dim moves, once
    * per executor per batch.
    */
  def enrichWithDim(stream: DataFrame, dim: DataFrame, keyCols: Seq[String],
                    dimCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "enrichWithDim needs join keys")
    stream.join(
      broadcast(dim.select((keyCols ++ dimCols).map(col): _*)),
      keyCols, "left")
  }
}
