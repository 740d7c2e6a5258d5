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
    * Semantics are identical to `large.join(small, keys, joinType)` for
    * row-preserving join types (inner/left).
    */
  def saltedJoin(large: DataFrame, small: DataFrame, keys: Seq[String],
                 salt: Int, joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    val l = large.withColumn("_salt",
      pmod(hash(large.columns.map(col): _*), lit(salt)))
    val s = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    l.join(s, keys :+ "_salt", joinType).drop("_salt")
  }
}
