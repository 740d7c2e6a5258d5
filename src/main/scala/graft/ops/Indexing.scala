package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.CacheScope

/** Distributed contiguous row numbering. A global `row_number()` window has
  * no partition key, so Spark funnels the whole table through ONE task — the
  * classic driver-shaped bottleneck that works at sf0.1 and dies at 100 TB.
  * The scale shape is the two-pass range-partition protocol:
  *
  *   1. range-partition + sort by the key (one shuffle, the same work a
  *      global ORDER BY does — but into N parallel partitions),
  *   2. derive each partition's size and starting offset (a ≤-N-row side
  *      table, broadcast),
  *   3. stamp each row with (partition offset + local position) — a narrow
  *      per-partition pass with no further shuffle.
  *
  * Declared entirely in DataFrame algebra: `monotonically_increasing_id()`
  * AFTER the range sort encodes (partition, local position), the offset
  * table folds its prefix sums in one bounded array expression, and the
  * stamp is a broadcast join — one action, no RDD hop, whole-stage codegen
  * end to end (an earlier `RDD.zipWithIndex` variant cost a codegen
  * boundary plus a separate partition-size count job per call). The result
  * is bit-identical to `row_number() OVER (ORDER BY key) - 1` whenever the
  * key is unique.
  */
object Indexing {

  /** Stamp every row with `global_idx`: contiguous 0-based longs in ascending
    * `keyCol` order. The key must be unique for a deterministic assignment
    * (with duplicate keys the index SET is still 0..n-1 and sorted by key,
    * but which duplicate gets which index depends on partitioning).
    */
  /** Deterministic epoch shuffle: contiguous global ids in STABLE-HASH order
    * of the key — the reproducible corpus shuffle a training run needs
    * (epoch e reads ids in `shuffleIndex(df, key, seed = e)` order; retries,
    * reruns, and other engines produce the identical permutation, unlike an
    * RNG shuffle). Same two-pass range-partition protocol as [[globalIndex]],
    * keyed on md5(seed ‖ key) with the raw key as tiebreak.
    */
  def shuffleIndex(df: DataFrame, keyCol: String, seed: Long,
                   numPartitions: Int = 0,
                   scope: CacheScope = CacheScope.global): DataFrame = {
    // md5 prefix shuffles; appending the raw key keeps the sort key unique
    // for unique inputs (no hash-collision tie nondeterminism). concat_ws is
    // null-safe, so a null key yields a non-null sort key — but all null
    // keys collapse to ONE sort key: globalIndex's uniqueness precondition
    // applies to this helper too.
    val keyed = df.withColumn("__shuf",
      concat_ws("|", md5(concat_ws("#", lit(seed), col(keyCol).cast("string"))),
        col(keyCol).cast("string")))
    globalIndex(keyed, "__shuf", numPartitions, scope).drop("__shuf")
  }

  def globalIndex(df: DataFrame, keyCol: String, numPartitions: Int = 0,
                  scope: CacheScope = CacheScope.global): DataFrame = {
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    // Pure-DataFrame zipWithIndex: monotonically_increasing_id() after the
    // range sort encodes (partition << 33) + local position, so the global
    // index is localPos + (sum of earlier partitions' sizes). The offset
    // table is ≤ `parts` rows; its prefix sums fold inside ONE bounded
    // array expression (O(parts²) adds in a single task — fine for the
    // shuffle-partition counts this runs at; a 10⁵-partition deployment
    // should switch the fold to a segmented pass). Everything rides one
    // action — no RDD hop (a codegen boundary) and no separate
    // partition-size count job like RDD.zipWithIndex's; the persist keeps
    // the range shuffle + sort from running twice (offset side + stamp
    // side), released via `scope`.
    val sorted = scope.persisted(df.repartitionByRange(parts, col(keyCol))
      .sortWithinPartitions(keyCol)
      .withColumn("__mono", monotonically_increasing_id())
      .withColumn("__pid", shiftrightunsigned(col("__mono"), 33)))
    // mono ids hold the local position in 33 bits: a range partition with
    // MORE than 2^33 rows (~8.6e9 — reachable at the 100 TB target with too
    // few partitions or heavy range skew) would overflow into the partition
    // bits and silently corrupt indices (exactly 2^33 rows still fits:
    // positions 0..2^33-1). Fail FAST instead: the assert
    // rides the __min column (coalesce of its null result) so column
    // pruning can never drop it.
    val stats = sorted.groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"), min(col("__mono")).as("__min0"))
      .select(col("__pid"), col("__cnt"),
        (col("__min0") + coalesce(
          expr("CAST(assert_true(__cnt <= 8589934592, " +
            "'globalIndex: a range partition holds > 2^33 rows; " +
            "monotonically_increasing_id would overflow into the " +
            "partition bits — raise numPartitions') AS BIGINT)"),
          lit(0L))).as("__min"))
    val offsets = stats
      .agg(sort_array(collect_list(struct(col("__pid"), col("__cnt"),
        col("__min")))).as("a"))
      .select(explode(expr(
        """transform(a, (x, i) -> struct(
          |  x.__pid AS __pid, x.__min AS __min,
          |  aggregate(slice(a, 1, i), 0L, (s, y) -> s + y.__cnt) AS __off))"""
          .stripMargin)).as("o"))
      .select(col("o.__pid").as("__pid"), col("o.__min").as("__min"),
        col("o.__off").as("__off"))
    sorted.join(broadcast(offsets), Seq("__pid"))
      .withColumn("global_idx", col("__off") + (col("__mono") - col("__min")))
      .drop("__pid", "__mono", "__min", "__off")
  }
}
