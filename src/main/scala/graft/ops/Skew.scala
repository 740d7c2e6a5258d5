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
}
