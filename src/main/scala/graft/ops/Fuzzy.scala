package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.CacheScope

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

  /** Sorted-neighborhood candidate pairs (Hernández/Stolfo SNM): sort the
    * corpus by `sortKey` (id tiebreak) and compare each row to the next
    * `window − 1` rows in sort order. The complement of [[editDistancePairs]]'
    * hash blocking: an equi-block splits near-matches that straddle a block
    * boundary, while the sliding window sees any pair the sort brings within
    * `window` positions — production ER runs BOTH (multi-pass SNM = union of
    * passes over different sort keys, then [[Dedup.dupClusters]] resolves).
    * Output: (id_a, id_b, dist) with id_a < id_b, Levenshtein ≤ `maxDist`
    * (banded thresholded verify, length prune first — stage order as in
    * [[editDistancePairs]]).
    *
    * Scale: positions come from [[Indexing.globalIndex]]'s range-partition
    * protocol (never a single-partition window); each row then explodes to
    * `window − 1` probe positions and one equi-join on the position pairs
    * them up — O(n·window) rows through one shuffle, regardless of key skew
    * (positions are unique by construction, so the join CANNOT hot-spot the
    * way a popular blocking key does).
    */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, strCol: String,
                              sortKey: Column, window: Int, maxDist: Int,
                              scope: CacheScope = CacheScope.global): DataFrame = {
    require(window >= 2, "window must pair each row with at least its successor")
    require(maxDist >= 0, "maxDist must be non-negative")
    val pos = scope.persisted(
      Indexing.globalIndex(
          df.select(col(idCol).as("id"), col(strCol).as("s"),
            struct(sortKey.as("v"), col(idCol).as("i")).as("__k")),
          "__k", scope = scope)
        .select(col("id"), col("s"), col("global_idx").as("pos")))
    val probes = pos.select(col("id").as("ida"), col("s").as("sa"),
      explode(sequence(col("pos") + 1, col("pos") + (window - 1))).as("pos"))
    probes.join(pos.select(col("id").as("idb"), col("s").as("sb"), col("pos")),
        Seq("pos"))
      .filter(abs(length(col("sa")) - length(col("sb"))) <= maxDist)
      .select(least(col("ida"), col("idb")).as("id_a"),
        greatest(col("ida"), col("idb")).as("id_b"),
        levenshtein(col("sa"), col("sb"), maxDist).as("dist"))
      .filter(col("dist") >= 0)
  }
}
