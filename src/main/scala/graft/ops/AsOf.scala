package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — the time-series enrichment operator Spark's built-in
  * joins lack (each left row picks the LATEST right row with
  * `right.ts <= left.ts` for the same key; the reference's notebooks do this
  * per-track with pandas merges, `notebooks/pair_analysis.ipynb`).
  *
  * Scale design: the naive formulations are both disasters at 100 TB — a
  * range-join explodes to O(left × right-per-key) candidate pairs before the
  * per-row argmax, and a per-key sort-merge with binary search needs the whole
  * right side resident per task. This is instead the union + running-`last`
  * window shape: tag right rows 0 and left rows 1, union, and run ONE window
  * per key ordered by (ts, side) carrying the most recent right payload
  * forward. Cost: one shuffle of |left| + |right| rows on the key, a
  * per-partition sort, zero candidate blow-up — the optimal distributed
  * as-of shape, and exactly what AQE can rebalance if keys skew.
  */
object AsOf {

  /** Left as-of join: every `left` row, enriched with `payload` columns from
    * the latest `right` row at-or-before its timestamp (null when no prior
    * right row exists for the key). The matched right timestamp is emitted as
    * `<prefix><ts>`; each payload column `c` as `<prefix>c`.
    *
    * `right` must be unique per (key, ts) — pre-aggregate ties first (the
    * declared query keeps the max-event_id row) so the match is deterministic
    * on every engine.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
               payload: Seq[String], prefix: String = "r_"): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one payload column")
    val pStruct = struct((col(ts) +: payload.map(col)).map(c => c): _*)
    val r = right.select(col(key), col(ts), pStruct.as("__p"),
      lit(0).as("__side"))
    val l = left.withColumn("__side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at the same ts (side 0 < 1), so an
    // exactly-simultaneous right row IS matched (<= semantics)
    val w = Window.partitionBy(col(key)).orderBy(col(ts), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matchCols =
      col(s"__m.$ts").as(s"$prefix$ts") +:
        payload.map(c => col(s"__m.$c").as(s"$prefix$c"))
    matched.select(left.columns.toIndexedSeq.map(col) ++ matchCols: _*)
  }
}
