package graft.ops

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.vec_dot

/** IVF (inverted-file) approximate nearest neighbor — the scale path beyond
  * [[Similarity.lshBuckets]]: a coarse k-means quantizer assigns every vector
  * to one of `nLists` cells; a query probes only its `nProbe` nearest cells
  * and runs exact cosine inside them. Search cost drops from O(n·d) per query
  * to O((nProbe/nLists)·n·d) with recall controlled by nProbe — the standard
  * accuracy/throughput dial of production vector search.
  *
  * Scale design: the index is a DataFrame keyed by `list_id` — searches are
  * equi-joins on the probed list ids (shuffle bounded by probed fraction),
  * centroids are a driver-side array (nLists × d doubles — tiny) broadcast
  * into the probe computation. Training samples the corpus; assignment is one
  * narrow pass. NOT oracle-matched: distributed k-means is seeded but not
  * bit-stable across cluster layouts, so this ships with recall tests against
  * the exact brute-force baseline instead of a DuckDB twin.
  */
object Ivf {

  /** `trainIters`/`trainConverged` are the quantizer's convergence
    * telemetry: iterations the ML k-means actually ran, and whether it
    * PROVABLY stopped before its budget (tolerance met — a true
    * fixpoint-ish stop) rather than exhausting `maxIter` mid-descent. A
    * production caller alerts on `trainConverged == false`: the cell
    * boundaries it is about to build posting lists around were still
    * moving when training quit, and recall measured against them can
    * silently degrade.
    *
    * The flag is CONSERVATIVE at the exact boundary: a run that
    * tolerance-converges precisely on its final budgeted iteration
    * reports false, because Spark's `KMeansSummary` exposes only
    * `numIter` (no last-iteration movement/cost delta), so
    * `numIter == maxIter` is indistinguishable from a mid-descent stop.
    * Read false as "cannot prove convergence — re-run with a larger
    * budget", never as "provably diverged"; the safe direction for an
    * alerting contract (a false alarm costs a retrain, a missed one
    * costs silent recall loss).
    */
  case class Index(centroids: Array[Array[Double]], assigned: DataFrame,
                   trainIters: Int = -1, trainConverged: Boolean = true)

  /** Train the coarse quantizer and assign every vector to its list. */
  def build(emb: DataFrame, idCol: String, vecCol: String,
            nLists: Int, seed: Long = 42L, maxIter: Int = 20): Index = {
    val data = emb.select(col(idCol).as("vid"),
        Similarity.vecd(col(vecCol)).as("v"))
      .withColumn("features", array_to_vector(col("v")))
    val model = new KMeans().setK(nLists).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol("features").setPredictionCol("list_id")
      .fit(data)
    val assigned = model.transform(data)
      .select(col("vid"), col("v"), col("list_id"))
    val iters = model.summary.numIter
    Index(model.clusterCenters.map(_.toArray), assigned,
      trainIters = iters, trainConverged = iters < maxIter)
  }

  /** Nearest `nProbe` list ids per query, via a broadcast join against the
    * centroid table. The centroids live in ONE broadcast relation, so plan
    * size and codegen are O(1) in `nLists` (a literal-per-centroid chain
    * explodes the expression tree at production nLists of 4k-64k). The
    * `pr <= nProbe` filter over `row_number` compiles to WindowGroupLimit:
    * each task pre-prunes to its local nProbe per query, so the window
    * exchange carries O(|queries|·nProbe) rows.
    */
  private def probeLists(queries: DataFrame,
                         centroids: Array[Array[Double]], nProbe: Int): DataFrame = {
    val spark = queries.sparkSession
    import spark.implicits._
    // dist²(v, c) = |v|² - 2 v·c + |c|²; |v|² is rank-invariant → use |c|² - 2 v·c
    val cents = centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq, c.map(x => x * x).sum) }.toSeq
      .toDF("list_id", "cv", "c2")
    val pw = Window.partitionBy(col("q")).orderBy(col("d"), col("list_id"))
    queries.join(broadcast(cents))
      .withColumn("d", col("c2") - lit(2.0) * vec_dot(col("qv"), col("cv")))
      .withColumn("pr", row_number().over(pw))
      .filter(col("pr") <= nProbe)
      .select(col("q"), col("qv"), col("qn"), col("list_id"))
  }

  /** Nearest-centroid assignment for FIXED centroids (no k-means): the
    * deterministic half of the IVF build, exposed so the quantizer itself is
    * oracle-checkable — k-means training is seeded but not bit-stable across
    * cluster layouts, while argmin-distance to given centroids is pure
    * arithmetic any engine reproduces (rank by |c|² − 2·v·c, ties to the
    * lowest list id). Same broadcast + WindowGroupLimit shape as search-time
    * probing, so this also IS the assignment path a precomputed-codebook
    * deployment (train offline, assign at scale) runs in production.
    */
  def assignToCentroids(emb: DataFrame, idCol: String, vecCol: String,
                        centroids: Array[Array[Double]]): DataFrame =
    probeLists(
      emb.select(col(idCol).as("q"), Similarity.vecd(col(vecCol)).as("qv"))
        .withColumn("qn", Similarity.l2norm(col("qv"))),
      centroids, nProbe = 1)
      .select(col("q").as(idCol), col("list_id"))

  /** Deterministic [[Index]] over FIXED centroids (no k-means): assignment
    * via the same broadcast argmin as [[assignToCentroids]], carrying the
    * vector so the result feeds [[search]] directly. This is the
    * precomputed-codebook deployment path — and, unlike the trained build,
    * it is bit-reproducible on any engine, so end-to-end IVF search is
    * oracle-checkable through it.
    */
  def buildFixed(emb: DataFrame, idCol: String, vecCol: String,
                 centroids: Array[Array[Double]]): Index = {
    val assigned = probeLists(
      emb.select(col(idCol).as("q"), Similarity.vecd(col(vecCol)).as("qv"))
        .withColumn("qn", Similarity.l2norm(col("qv"))),
      centroids, nProbe = 1)
      .select(col("q").as("vid"), col("qv").as("v"), col("list_id"))
    Index(centroids, assigned)
  }

  /** Approximate top-k cosine neighbors for every vector in `queries`.
    * Output: (q, n_id, sim, rn) like [[Similarity.cosineTopK]].
    */
  def search(index: Index, queries: DataFrame, idCol: String, vecCol: String,
             k: Int, nProbe: Int): DataFrame = {
    val q = probeLists(
      queries.select(col(idCol).as("q"), Similarity.vecd(col(vecCol)).as("qv"))
        .withColumn("qn", Similarity.l2norm(col("qv"))),
      index.centroids, nProbe)
    val cand = index.assigned
      .withColumn("nn", Similarity.l2norm(col("v")))
      .select(col("vid").as("n_id"), col("v"), col("nn"), col("list_id"))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("n_id"))
    q.join(cand, Seq("list_id")) // equi-join on probed lists only
      .filter(col("q") =!= col("n_id"))
      .select(col("q"), col("n_id"),
        (vec_dot(col("qv"), col("v")) / nullif(col("qn") * col("nn"), lit(0.0)))
          .as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}
