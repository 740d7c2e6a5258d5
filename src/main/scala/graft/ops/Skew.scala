package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join splitting (on by default)
  * handles most cases at runtime; explicit salting remains the tool when one
  * join key is pathologically hot (the port-cell problem in the co-movement
  * self-join, SCALING.md) or when AQE cannot split (e.g. bucketed inputs,
  * aggregations before the join).
  */
object Skew {

  /** Salted equi-join: the large side spreads each hot key over `salt`
    * sub-keys (deterministically, via a hash of the whole row — no RNG, so
    * the plan is replayable); the small side is replicated `salt` ways. The
    * join then distributes a hot key's rows over `salt` tasks instead of one.
    *
    * Semantics are identical to `large.join(small, keys, joinType)` ONLY for
    * join types where replicating the small side cannot fabricate rows:
    * inner / left (unmatched-large preserved once) / left_semi — enforced.
    * Right/full/anti would emit one row per unmatched small-side REPLICA.
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val jt = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi").contains(jt),
      s"saltedJoin supports inner/left/left_semi only, got '$joinType' " +
        "(small-side replication corrupts unmatched rows for other types)")
    // collision-free working column: inputs may legitimately carry `_salt`
    val sc = Iterator.from(0).map(i => s"_salt$i")
      .find(c => !large.columns.contains(c) && !small.columns.contains(c)).get
    val l = large.withColumn(sc,
      pmod(hash(large.columns.toIndexedSeq.map(col): _*), lit(salt)))
    val s = small.withColumn(sc,
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(s, keys :+ sc, joinType).drop(sc)
  }

  /** Key-distribution audit for a candidate join/aggregation key — the
    * numbers that decide, BEFORE a 100 TB shuffle is launched, whether the
    * key needs salting, AQE skew splitting, or a different partitioning:
    * rows-per-key max / exact p50 / p99, the hottest key's share (ppm), and
    * `skew_ratio = max / p50` (the one-number verdict; ≳10 means one task
    * will run 10× longer than the median).
    *
    * Scale: one map-side-combinable count per key, then a single tiny
    * aggregate over the key-count frame (exact percentiles sort the
    * per-KEY counts, not the rows — |keys| ≪ |rows|). NULL keys group like
    * any other value (they hash to one reducer too — the classic hidden
    * hot key; this report is how it gets caught).
    */
  def skewReport(df: DataFrame, keyCols: Seq[String], label: String): DataFrame = {
    require(keyCols.nonEmpty, "skewReport needs at least one key column")
    df.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
      .agg(sum(col("__n")).as("n_rows"), count(lit(1)).as("n_keys"),
        max(col("__n")).as("max_key_rows"),
        round(avg(col("__n")), 6).as("avg_key_rows"),
        round(percentile(col("__n"), lit(0.5)), 6).as("p50_key_rows"),
        round(percentile(col("__n"), lit(0.99)), 6).as("p99_key_rows"))
      .select(lit(label).as("key_set"), col("n_rows"), col("n_keys"),
        col("max_key_rows"), col("avg_key_rows"), col("p50_key_rows"),
        col("p99_key_rows"),
        round(col("max_key_rows") * 1000000.0 / col("n_rows")).cast("long")
          .as("top_share_ppm"),
        round(col("max_key_rows") / col("p50_key_rows"), 6).as("skew_ratio"))
  }
}
