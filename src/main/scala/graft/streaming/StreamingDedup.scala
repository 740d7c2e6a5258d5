package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Streaming exact-dedup of a document stream — the online half of the dedup
  * ladder ([[graft.ops.Dedup]] is the batch half). New documents whose
  * canonical fingerprint was already seen within the watermark horizon are
  * dropped; the first arrival wins, exactly like the batch keep-first rule.
  *
  * `dropDuplicatesWithinWatermark` keys state by fingerprint and expires it
  * once the event-time watermark passes, so state is bounded by (arrival rate
  * × watermark horizon) — the trade a streaming dedup must make explicit: a
  * duplicate arriving AFTER the horizon is admitted again, and the downstream
  * batch dedup (which sees all of history) is the backstop. This is the
  * standard lambda split for 100 TB corpora: cheap online suppression of the
  * bursty near-in-time duplicates (crawl refetches, retry storms), exact
  * global dedup in the batch layer.
  */
object StreamingDedup {

  /** Drop stream rows whose text fingerprint repeats within the watermark.
    * Output carries the fingerprint for downstream lineage/audit.
    */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("fp", TextOps.fingerprint(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("fp")
}
