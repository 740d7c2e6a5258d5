package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the enrichment shape the reference's
  * batch pipeline would need live (e.g. pairing position reports with alert
  * events as both arrive), expressed as a Structured Streaming interval join.
  *
  * Scale design: an unbounded stream-stream join is a state-size disaster;
  * the ONLY production-safe shape is (a) watermarks on BOTH sides and (b) an
  * event-time range condition, which together let Spark expire state — each
  * side retains at most `watermark + maxLag` of events per key. Matches emit
  * eagerly (inner join), so latency is per-batch, not per-watermark.
  */
object StreamingJoin {

  /** Inner interval join of two event streams on `key`: emits (left, right)
    * pairs where the right event lands in `[left.ts, left.ts + maxLag]`.
    * Both inputs must be streaming DataFrames; output columns are the left
    * columns followed by the right columns (the shared key deduplicated).
    *
    * `maxLag` / `watermark` are SQL interval strings (e.g. "10 minutes").
    */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String,
                   maxLag: String, watermark: String): DataFrame = {
    val l = left.withWatermark(leftTs, watermark).alias("l")
    val r = right.withWatermark(rightTs, watermark).alias("r")
    val rightCols = right.columns.filterNot(_ == key)
      .map(c => col(s"r.$c")).toSeq
    l.join(r,
        col(s"l.$key") === col(s"r.$key") &&
          col(s"r.$rightTs") >= col(s"l.$leftTs") &&
          col(s"r.$rightTs") <= col(s"l.$leftTs") + expr(s"INTERVAL $maxLag"))
      .select(left.columns.map(c => col(s"l.$c")).toSeq ++ rightCols: _*)
  }
}
