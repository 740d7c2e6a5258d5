package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range (interval) join as an equi-join: the classic IP-to-geo / value-band
  * lookup where each probe value must find the interval(s) `[lo, hi)`
  * containing it. Spark's native answer to a pure theta join is a broadcast
  * nested-loop (fine for a handful of ranges, quadratic pain for millions),
  * so this operator re-keys both sides on a fixed-width bin index: an
  * interval covers `floor(lo/w) .. floor(hi/w)` bins, a probe lives in
  * exactly one bin, and the join becomes a plain hash/sort-merge equi-join
  * on the bin id with a residual containment filter.
  *
  * Scale: probe-side fanout is 1 row; range-side fanout is
  * `ceil(len/w) + 1`, bounded by interval length — pick `binWidth` near the
  * median interval length so the expansion stays O(1) per interval. The
  * equi-join then shuffles (or broadcasts, when the exploded range side is
  * small) on the bin key like any other join — no nested loop at any scale.
  */
object RangeJoin {

  /** Join `probe` rows to every `ranges` row whose `[loCol, hiCol)` interval
    * contains `probeCol` (half-open, matching the reference's window
    * convention, SURVEY §2.2 P4). Bin ids are computed identically on both
    * sides (`floor(x / binWidth)` in long), so the equi-join key never
    * disagrees with the residual predicate.
    */
  def binnedRangeJoin(probe: DataFrame, probeCol: Column, ranges: DataFrame,
                      loCol: String, hiCol: String,
                      binWidth: Double): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // a malformed interval (hi < lo) emits no bins: the default descending
    // sequence would generate junk bins that only the residual filter kills
    val binLo = floor(col(loCol) / binWidth).cast("long")
    val binHi = floor(col(hiCol) / binWidth).cast("long")
    val binned = ranges.withColumn("__bin",
      explode(when(binHi >= binLo, sequence(binLo, binHi))
        .otherwise(array().cast("array<long>"))))
    probe.withColumn("__bin", floor(probeCol / binWidth).cast("long"))
      .join(binned, Seq("__bin"))
      .filter(probeCol >= col(loCol) && probeCol < col(hiCol))
      .drop("__bin")
  }
}
