package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.engine.CacheScope

/** Distributed contiguous row numbering. A global `row_number()` window has
  * no partition key, so Spark funnels the whole table through ONE task — the
  * classic driver-shaped bottleneck that works at sf0.1 and dies at 100 TB.
  * The scale shape is the two-pass range-partition protocol:
  *
  *   1. range-partition + sort by the key (one shuffle, the same work a
  *      global ORDER BY does — but into N parallel partitions),
  *   2. count rows per partition (a cheap count-only job),
  *   3. stamp each row with (partition offset + local position) — a narrow
  *      per-partition pass with no further shuffle.
  *
  * Steps 2–3 are exactly `RDD.zipWithIndex`; this is one of the few operators
  * where the imperative per-partition protocol genuinely can't be declared in
  * DataFrame algebra (the offset of partition i depends on the sizes of
  * partitions 0..i-1). The result is bit-identical to
  * `row_number() OVER (ORDER BY key) - 1` whenever the key is unique.
  */
object Indexing {

  /** Stamp every row with `global_idx`: contiguous 0-based longs in ascending
    * `keyCol` order. The key must be unique for a deterministic assignment
    * (with duplicate keys the index SET is still 0..n-1 and sorted by key,
    * but which duplicate gets which index depends on partitioning).
    *
    * The RDD hop is a codegen boundary — use this as the final stamping step
    * before a write, not mid-pipeline.
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
    // persist the sorted frame: zipWithIndex runs a partition-size count job
    // BEFORE the real one — unpersisted, the range shuffle + sort (the
    // dominant cost) would execute twice; released via `scope`
    val sorted = scope.persisted(df.repartitionByRange(parts, col(keyCol))
      .sortWithinPartitions(keyCol))
    val schema = StructType(
      sorted.schema.fields :+ StructField("global_idx", LongType, nullable = false))
    val stamped = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(stamped, schema)
  }
}
