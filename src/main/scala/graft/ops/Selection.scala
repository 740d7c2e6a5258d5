package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, IntegerType, StructField, StructType}

import graft.functions.vec_dot

/** Diversity-driven data selection over an embedding column: greedy k-center
  * (Gonzalez farthest-point traversal). Each round picks the point farthest
  * from every center chosen so far — the classic 2-approximation to the
  * k-center cover, and the standard coreset/"diverse subset" selector for
  * training-data curation (pick the k docs that span the embedding space,
  * not k near-copies of the densest mode).
  *
  * Scale shape: one corpus scan per round — the scan computes each point's
  * min-distance to the centers as a FIXED-ORDER `least` chain over
  * broadcast center literals (no join, no shuffle; `TakeOrdered(1)` reduces
  * per-partition), and only the single selected row is collected. k rounds =
  * k scans of O(n·k·d) work total; nothing driver-side ever holds more than
  * k vectors. The greedy traversal is inherently sequential in k — for
  * large k, amortize by persisting a running min-distance column instead of
  * recomputing the chain (the PageRank-style iterative-cache pattern);
  * at the typical k ≤ a few dozen the stateless rescan is cheaper than
  * k cache round-trips.
  *
  * Determinism (the oracle contract): distances are
  * `p² + c² − 2·(p·c)` with every dot product a strict left-associative
  * [[graft.expressions.VecDot]] chain, the running min is `least` nested in
  * selection order, and argmax ties break on the id — so an unrolled SQL
  * twin reproduces the selection bit-for-bit. Reported distances are
  * micro-unit rounded; the RAW doubles drive the argmax.
  */
object Selection {

  /** Select `k` centers from `emb`; seed = the minimum id (rank 0). Output:
    * `(sel_rank, idCol, dist_u)` where `dist_u` is the squared L2 distance
    * (micro-units) of the chosen point to the prior centers — null for the
    * seed, non-increasing in rank thereafter.
    */
  def kCenter(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be at least 1")
    require(emb.schema(idCol).dataType == LongType,
      s"kCenter ids must be LongType, got ${emb.schema(idCol).dataType} — " +
        "cast explicitly; a silent coercion would reorder string ids")
    val spark = emb.sparkSession
    val pts = emb.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .withColumn("__p2", vec_dot(col("__v"), col("__v")))
    val seed = pts.orderBy("__id").limit(1)
      .select(col("__id"), col("__v"), col("__p2")).head()
    // (id, vector, |c|²) per chosen center, in selection order
    var centers = Vector[(Long, Seq[Double], Double)](
      (seed.getLong(0), seed.getSeq[Double](1), seed.getDouble(2)))
    var out = Vector[(Int, Long, Option[Long])]((0, seed.getLong(0), None))
    while (centers.size < k) {
      val minDist = centers.map { case (_, cv, c2) =>
        col("__p2") + lit(c2) - lit(2.0) *
          vec_dot(col("__v"), lit(cv.toArray).cast("array<double>"))
      }.reduce(least(_, _))
      val next = pts.withColumn("__md", minDist)
        .orderBy(col("__md").desc, col("__id")).limit(1)
        .select(col("__id"), col("__v"), col("__p2"), col("__md")).head()
      centers :+= ((next.getLong(0), next.getSeq[Double](1), next.getDouble(2)))
      out :+= ((out.size, next.getLong(0),
        Some(math.round(next.getDouble(3) * 1e6))))
    }
    toFrame(spark, idCol, out)
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): score every document by
    * how much more likely its hashed n-gram features are under a TARGET
    * distribution (e.g. the high-quality slice you want more of) than under
    * the RAW corpus distribution. Features are word unigrams + bigrams
    * hashed into `numBuckets` fixed buckets ([[graft.functions.stable_bucket]],
    * the engine's sha256 hash, so the oracle recomputes the exact buckets);
    * both distributions are Laplace-smoothed bucket frequencies; a doc's
    * log-weight is the sum of per-feature log ratios.
    *
    * Scale shape: the bucket dictionary is O(numBuckets) — a tiny aggregate
    * broadcast back over the feature stream — so the corpus itself shuffles
    * exactly once (the per-doc sum, keyed on the id). The exploded feature
    * stream has two consumers (dictionary build + scoring) and is persisted
    * via `scope`; at corpus scale prefer recomputing the narrow explode to
    * caching terabytes (drop-in: pass a fresh scope and release right away).
    *
    * Determinism: per-bucket log ratios quantize to integer micro-nats
    * BEFORE the per-doc sum (the [[TextOps.bigramLmScore]] convention), so
    * document scores are order-independent exact integer sums.
    *
    * Output: (idCol, n_feats, logw) — logw in nats, 6dp; higher = more
    * target-like. Docs whose text yields zero features are absent (no
    * tokens → no evidence).
    */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  isTarget: Column, numBuckets: Int,
                  scope: graft.engine.CacheScope = graft.engine.CacheScope.global)
      : DataFrame = {
    require(numBuckets >= 2, "numBuckets must be at least 2")
    val ts = col("__ts")
    val grams = concat(ts, when(size(ts) >= 2,
      transform(sequence(lit(1), size(ts) - 1), i =>
        concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))
      .otherwise(array().cast("array<string>")))
    val feats = scope.persisted(docs
      .select(col(idCol).as("__id"), isTarget.as("__t"),
        TextOps.tokens(col(textCol)).as("__ts"))
      .select(col("__id"), col("__t"), explode(grams).as("__g"))
      .select(col("__id"), col("__t"),
        graft.functions.stable_bucket(col("__g"), numBuckets).as("__b")))
    val stats = feats.groupBy("__b")
      .agg(sum(when(col("__t"), 1L).otherwise(0L)).as("__ct"),
        count(lit(1)).as("__cr"))
    val totals = stats.agg(sum(col("__ct")).cast("double").as("__T"),
      sum(col("__cr")).cast("double").as("__R"))
    val bd = lit(numBuckets.toDouble)
    val lambda = stats.crossJoin(broadcast(totals))
      .select(col("__b"),
        round(log(((col("__ct").cast("double") + 1.0) * (col("__R") + bd)) /
            ((col("__cr").cast("double") + 1.0) * (col("__T") + bd))) * 1000000)
          .cast("long").as("__lu"))
    feats.join(broadcast(lambda), Seq("__b"))
      .groupBy(col("__id").as(idCol))
      .agg(count(lit(1)).as("n_feats"), sum(col("__lu")).as("__lw"))
      .select(col(idCol), col("n_feats"),
        round(col("__lw").cast("double") / 1000000.0, 6).as("logw"))
  }

  /** Deterministic DSIR selection: the `k` most target-like documents by
    * [[dsirWeights]] log-weight (id breaks exact ties) — the resampling
    * step of the paper with the Gumbel noise removed so the pick is
    * reproducible and oracle-checkable. `TakeOrdered(k)` — map-side top-k,
    * never a global sort.
    */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, numBuckets: Int, k: Int,
                 scope: graft.engine.CacheScope = graft.engine.CacheScope.global)
      : DataFrame = {
    require(k >= 1, "k must be at least 1")
    dsirWeights(docs, idCol, textCol, isTarget, numBuckets, scope)
      .orderBy(col("logw").desc, col(idCol))
      .limit(k)
  }

  private def toFrame(spark: SparkSession, idCol: String,
                      rows: Seq[(Int, Long, Option[Long])]): DataFrame = {
    val schema = StructType(Seq(
      StructField("sel_rank", IntegerType, nullable = false),
      StructField(idCol, LongType, nullable = false),
      StructField("dist_u", LongType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (r, id, d) =>
        Row(r, id, d.map(Long.box).orNull)
      }, 1), schema)
  }
}
