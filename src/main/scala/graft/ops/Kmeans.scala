package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.vec_dot

/** Distributed Lloyd's k-means over an embedding column — the TRAINING step
  * the IVF index ([[Ivf]], which deliberately takes FIXED centroids) was
  * missing. The reference stops at brute-force similarity; training coarse
  * quantizers is what a 100 TB ANN build actually requires (IVF lists sized
  * k ≈ √N), so the engine owns it as a first-class operator.
  *
  * Determinism contract (what makes a cross-engine oracle possible for an
  * ITERATIVE float algorithm): all arithmetic happens on integer
  * MICRO-quantized vector components carried as float64 — every value in
  * play (components ≤ ~1e6, squared-distance sums ≤ d·(2e6)² ≈ 2.6e14,
  * per-cluster component sums ≤ N·1e6) stays far inside float64's exact-
  * integer range (2^53), so "floating point" here is exact integer math any
  * engine reproduces bit-for-bit. Assignment ties break on the lower
  * list_id; centroid updates are floor(sum/count) — both exactly
  * reproducible in SQL. The DuckDB twin is an unrolled CTE chain (one
  * assign+update pair per iteration), the same pattern as the pagerank
  * oracle.
  *
  * Scale shape: centroids are k·d doubles — driver-side between iterations,
  * a BROADCAST relation inside one. Per iteration exactly ONE shuffle, and
  * it is map-side combined twice over: the argmin `min(struct(dd, list_id))`
  * folds the k candidate rows per vector inside the scan partition, and the
  * per-(list, dim) component sums fold again before the k·d-row exchange.
  * No N-row join anywhere — the vector rides through the argmin aggregate
  * as a `first`.
  */
object Kmeans {

  /** Micro-quantized copy of a float-array embedding column: round(x·1e6)
    * per component, kept as array<double> of exact integers.
    */
  def microVec(vecCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    transform(vecCol.cast("array<double>"), x => round(x * 1e6))

  /** Convergence telemetry for [[trainWithStats]]: `iterationsRun` Lloyd
    * steps actually executed, `converged` = the centroid fixpoint was
    * REACHED (an iteration left every centroid unchanged — further
    * iterations are provably no-ops, so the loop also early-stops there).
    * A production caller alerts on `converged == false`: the quantizer it
    * is about to ship is still moving, and `iterations` was a budget, not
    * a fixpoint.
    */
  final case class TrainStats(iterationsRun: Int, converged: Boolean)

  /** `iterations` Lloyd steps from deterministic seeds (the k lowest-id
    * vectors, in id order). Returns (list_id, pos, c_micro) — the final
    * centroids, exploded to one row per dimension, c_micro a long.
    * An emptied cluster keeps its previous centroid (deterministic; with
    * k ≪ N and lowest-id seeding it essentially never triggers).
    */
  def train(emb: DataFrame, idCol: String, vecCol: String, k: Int,
            iterations: Int): DataFrame =
    trainWithStats(emb, idCol, vecCol, k, iterations)._1

  /** [[train]] plus [[TrainStats]]. Early-stops at the centroid fixpoint:
    * identical centroids reproduce identical assignments (the argmin is a
    * pure function of centroids) and hence identical sums, so once an
    * iteration moves nothing, every remaining iteration is a no-op — the
    * result is bit-identical to running the full budget, which is why the
    * unrolled DuckDB twin needs no matching early-stop.
    */
  def trainWithStats(emb: DataFrame, idCol: String, vecCol: String, k: Int,
                     iterations: Int): (DataFrame, TrainStats) = {
    val spark = emb.sparkSession
    val e = emb.select(col(idCol).as("vec_id"), microVec(col(vecCol)).as("x"))
    var cents = e.orderBy("vec_id").limit(k).orderBy("vec_id")
      .collect().zipWithIndex
      .map { case (r, i) => (i, r.getSeq[Double](1).toArray) }
    require(cents.length == k, s"need at least $k vectors to seed k-means")
    var it = 0
    var converged = false
    while (it < iterations && !converged) {
      val assigned = assignOnce(e, spark, cents)
      val sums = assigned
        .select(col("list_id"), posexplode(col("x")).as(Seq("pos", "v")))
        .groupBy("list_id", "pos")
        .agg(sum(col("v")).as("s"), count(lit(1)).as("cnt"))
        .select(col("list_id"), col("pos"),
          floor(col("s") / col("cnt")).cast("double").as("c"))
        .collect()
        .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2)))
      val byList = sums.groupBy(_._1)
      val next = cents.map { case (lid, prev) =>
        byList.get(lid) match {
          case Some(dims) =>
            val nv = prev.clone()
            dims.foreach { case (_, pos, c) => nv(pos) = c }
            (lid, nv)
          case None => (lid, prev) // emptied cluster: keep previous centroid
        }
      }
      converged = next.zip(cents).forall { case ((_, a), (_, b)) =>
        java.util.Arrays.equals(a, b) }
      cents = next
      it += 1
    }
    val rows = cents.flatMap { case (lid, cv) =>
      cv.zipWithIndex.map { case (c, pos) => (lid, pos, c.toLong) }
    }.toSeq
    import spark.implicits._
    (rows.toDF("list_id", "pos", "c_micro"), TrainStats(it, converged))
  }

  /** Final assignment under trained centroids: (vec_id, list_id). */
  def assign(emb: DataFrame, idCol: String, vecCol: String, k: Int,
             iterations: Int): DataFrame =
    assignWith(emb, idCol, vecCol, train(emb, idCol, vecCol, k, iterations))

  /** [[assign]] under an ALREADY-TRAINED centroid table
    * (list_id, pos, c_micro) — the gold-lifecycle entry point (r19): the
    * trainer runs once offline and every assignment pass reads its output
    * instead of re-running the iteration (and its per-step driver
    * collects). One argmin pass, bit-identical to [[assign]] given the
    * same centroids: the collected longs are exact and the broadcast
    * relation is built the same way.
    */
  def assignWith(emb: DataFrame, idCol: String, vecCol: String,
                 centroids: DataFrame): DataFrame = {
    val spark = emb.sparkSession
    val e = emb.select(col(idCol).as("vec_id"), microVec(col(vecCol)).as("x"))
    val trained = centroids.select("list_id", "pos", "c_micro")
      .collect().groupBy(_.getInt(0))
      .map { case (lid, rs) =>
        val cv = new Array[Double](rs.length)
        rs.foreach(r => cv(r.getInt(1)) = r.getLong(2).toDouble)
        (lid, cv)
      }.toArray.sortBy(_._1)
    assignOnce(e, spark, trained).select("vec_id", "list_id")
  }

  /** One argmin pass: cross the (tiny, broadcast) centroid relation with
    * the vectors, reduce `min(struct(dd, list_id))` per vector — partial
    * aggregation folds the k candidates map-side, so the one exchange
    * carries one row per vector. `x` rides the same aggregate as
    * `min_by(x, struct(dd, list_id))` (avoiding a join back to the input):
    * the ordering key is UNIQUE within the group (one row per list_id), so
    * the argmin is single-valued and the result is hard-deterministic under
    * any evaluation order — no FD-first whitelist rationale required (the
    * round-14 retry gate carried `first(x)` on the documented
    * x-constant-per-group argument; a unique-keyed min_by needs no
    * argument).
    */
  private def assignOnce(e: DataFrame, spark: SparkSession,
                         cents: Array[(Int, Array[Double])]): DataFrame = {
    import spark.implicits._
    val cdf = cents.toSeq.map { case (lid, cv) => (lid, cv.toSeq) }
      .toDF("list_id", "cv")
      .select(col("list_id"), col("cv"),
        vec_dot(col("cv"), col("cv")).as("c2"))
    e.crossJoin(broadcast(cdf))
      .select(col("vec_id"), col("x"), col("list_id"),
        (col("c2") - lit(2.0) * vec_dot(col("x"), col("cv"))).as("dd"))
      .groupBy("vec_id")
      .agg(min(struct(col("dd"), col("list_id"))).as("m"),
        min_by(col("x"), struct(col("dd"), col("list_id"))).as("x"))
      .select(col("vec_id"), col("m.list_id").as("list_id"), col("x"))
  }
}
