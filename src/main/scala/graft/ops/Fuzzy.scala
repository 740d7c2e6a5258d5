package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy (edit-distance) similarity join — the entity-resolution primitive
  * for catalog/identity cleaning (near-identical names, typo'd ids). An exact
  * similarity join is O(n²) string comparisons; the standard scale shape is
  * blocking + verify:
  *
  *   1. BLOCK: group rows by a cheap deterministic blocking key (name prefix,
  *      sorted-neighborhood key, phonetic code — the caller picks, it is
  *      domain knowledge). Candidates are pairs within a block — an equi-join
  *      on the key, never all-pairs.
  *   2. PRUNE: |len(a) − len(b)| ≤ maxDist — a free lower bound on edit
  *      distance that kills most survivors before the expensive verify.
  *   3. VERIFY: exact Levenshtein (codegen'd built-in) on what remains.
  *
  * Join fanout is Σ block² — bounded by the blocking key's selectivity, the
  * same contract as `maxDocsPerShingle` in [[Dedup]]. Hot blocks are the skew
  * risk; pick keys with bounded occupancy or cap them upstream.
  */
object Fuzzy {

  /** Within-block pairs (id_a < id_b) at Levenshtein distance ≤ `maxDist`.
    * Output: (id_a, id_b, dist). The length prune runs before the distance;
    * `blockKey` is evaluated once per row on the build side of the join.
    * The verify uses the thresholded `levenshtein(a, b, maxDist)` form —
    * banded DP, O(len·maxDist) per pair instead of O(len²), returning −1 as
    * soon as the band exceeds the cap (then filtered). Distances of the
    * surviving pairs are exact either way.
    */
  def editDistancePairs(df: DataFrame, idCol: String, strCol: String,
                        blockKey: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val rows = df.select(col(idCol).as("id"), col(strCol).as("s"),
      blockKey.as("blk"))
    val a = rows.toDF("id_a", "s_a", "blk")
    val b = rows.toDF("id_b", "s_b", "blk")
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b") &&
        abs(length(col("s_a")) - length(col("s_b"))) <= maxDist)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("s_a"), col("s_b"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }
}
