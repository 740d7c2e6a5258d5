package graft.ops

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.vec_dot

/** Similarity search over an embedding column (`Array[Float]`) — the ANN
  * operators a training-data pipeline needs on top of the reference's surface.
  *
  * Two tiers:
  *   - [[cosineTopK]]: brute-force exact top-k — the correctness baseline.
  *     O(n²·d) dots; each dot is a codegen'd [[graft.expressions.VecDot]]
  *     (one tight loop, no lambda interpreter). Fine for a query cohort ×
  *     corpus; the all-pairs declared query is the small-cohort case.
  *   - [[lshBuckets]] / [[cosineNearDupPairs]]: random-hyperplane LSH — the
  *     scale path. Bucket signature is `planes` sign bits; candidate pairs
  *     come from an equi-join on the bucket id, never an all-pairs join.
  *
  * Hyperplane weights are ±1 derived from md5 parity of `"plane:dim"` — fully
  * deterministic, no RNG state, and reproducible in any engine (the DuckDB
  * oracle inlines the same signs), mirroring how the reference derives its
  * stable bucket hash from SHA-256 (`pipelines/ais_pipeline.py:532-535`).
  */
object Similarity {

  /** Embedding column cast to array<double> (float→double is exact, so every
    * engine sees identical values).
    */
  def vecd(c: Column): Column = c.cast("array<double>")

  def l2norm(v: Column): Column = sqrt(vec_dot(v, v))

  /** Exact cosine top-k: every cohort vector against the full corpus. The
    * 100-TB shape: ONLY the (bounded) cohort is broadcast; the corpus streams
    * through the scan with full parallelism and is never collected or
    * replicated. The `rn <= k` filter over `row_number` compiles to Spark's
    * WindowGroupLimit, so each task keeps only its local top-k per query
    * before the shuffle — the exchange carries O(|cohort|·k·partitions)
    * rows, not O(|cohort|·n).
    */
  def cosineTopK(corpus: DataFrame, cohort: DataFrame,
                 idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("n"), vecd(col(vecCol)).as("vb"))
      .withColumn("nb", l2norm(col("vb")))
    val q = broadcast(cohort.select(col(idCol).as("q"), vecd(col(vecCol)).as("va"))
      .withColumn("na", l2norm(col("va"))))
    val sims = c.join(q, col("q") =!= col("n"))
      .select(col("q"), col("n"),
        (vec_dot(col("va"), col("vb")) / nullif(col("na") * col("nb"), lit(0.0)))
          .as("sim"))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("n"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Hard-negative mining for contrastive training: for each cohort query,
    * the `k` nearest corpus vectors with a DIFFERENT label — the
    * high-similarity wrong-class examples that make the best negatives
    * (same-label neighbors are excluded in the join condition, so a
    * positive can never leak into the negative set). Same scale contract
    * as the cohort [[cosineTopK]]: fixed-size cohort broadcasts, the
    * corpus streams once, per-query top-k is a map-side WindowGroupLimit.
    */
  def hardNegatives(corpus: DataFrame, cohort: DataFrame, idCol: String,
                    vecCol: String, labelCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("n_id"), col(labelCol).as("n_label"),
        vecd(col(vecCol)).as("vb"))
      .withColumn("nb", l2norm(col("vb")))
    val q = broadcast(cohort.select(col(idCol).as("q"),
        col(labelCol).as("q_label"), vecd(col(vecCol)).as("va"))
      .withColumn("na", l2norm(col("va"))))
    val sims = c.join(q, col("q_label") =!= col("n_label"))
      .select(col("q"), col("q_label"), col("n_id"), col("n_label"),
        (vec_dot(col("va"), col("vb")) / nullif(col("na") * col("nb"), lit(0.0)))
          .as("sim"))
    val w = Window.partitionBy(col("q")).orderBy(col("sim").desc, col("n_id"))
    sims.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** All-pairs exact top-k (the table plays both roles): the small-scale
    * correctness baseline that IVF/LSH recall tests compare against. O(n²·d)
    * by construction — never the declared 100-TB shape; use the cohort
    * overload (or [[graft.ops.Ivf]]) for real corpora.
    */
  def cosineTopK(emb: DataFrame, idCol: String, vecCol: String, k: Int): DataFrame = {
    // repartition before self-join: the source is often a tiny cached/
    // single-file frame whose 1-2 partitions would serialize the n² loop
    cosineTopK(emb.repartition(col(idCol)), emb, idCol, vecCol, k)
  }

  /** Deterministic ±1 hyperplane weights: sign(p,d) from md5("p:d") parity. */
  def planeSigns(planes: Int, dims: Int): Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, d) =>
      md.reset()
      val h = md.digest(s"$p:$d".getBytes(StandardCharsets.UTF_8))
      // value of first hex char = high nibble of byte 0; parity → sign
      if ((((h(0) >> 4) & 0xf) % 2) == 1) 1.0 else -1.0
    }
  }

  /** Plane count sized to the corpus: enough sign bits that the EXPECTED
    * bucket occupancy is ~`targetOccupancy` (2^planes ≈ n / target), so the
    * within-bucket candidate join stays linear in n instead of n²/constant.
    * Pair with banding ([[bandedLshBuckets]]) so recall survives the longer
    * signatures — more planes alone shrinks buckets AND recall.
    */
  def planesFor(n: Long, targetOccupancy: Int = 8): Int = {
    require(targetOccupancy > 0, "targetOccupancy must be positive")
    // integer-exact ceil(log2(ceil(n / target))) via bit length — float log
    // is off-by-one-ULP at powers of two, and the DuckDB oracle re-derives
    // this count with the same integer comparisons, so the two engines must
    // agree bit-for-bit
    // overflow-safe ceil-div: n + t − 1 would wrap for n near Long.MaxValue
    val nn = math.max(0L, n)
    val m = nn / targetOccupancy + (if (nn % targetOccupancy != 0) 1L else 0L)
    val needed =
      if (m <= 1L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(m - 1)
    math.min(62, math.max(1, needed))
  }

  /** Sign-matrix random projection (Achlioptas 2003, the dense ±1 variant)
    * from `dims` down to `dOut` dimensions: y_j = dot(v, s_j) / √dOut where
    * s_j is the j-th deterministic [[planeSigns]] row. The
    * Johnson–Lindenstrauss workhorse that makes everything downstream of an
    * embedding column (ANN probing, clustering, dedup) ~dims/dOut cheaper.
    *
    * Deterministic cross-engine: the sign matrix is public md5-parity (the
    * oracle re-derives it), each component is a strict left-to-right VecDot
    * chain, and the only irrational — √dOut — is embedded as a shortest-
    * repr double literal both engines parse identically. One narrow
    * codegen'd pass, no shuffle, no UDF.
    */
  def randomProject(emb: DataFrame, idCol: String, vecCol: String,
                    dOut: Int, dims: Int): DataFrame = {
    require(dOut > 0 && dims > 0, "dOut and dims must be positive")
    val signs = planeSigns(dOut, dims)
    val scale = math.sqrt(dOut.toDouble)
    val v = vecd(col(vecCol))
    val comps = (0 until dOut).map { j =>
      round(vec_dot(v, typedLit(signs(j).toSeq)) / scale, 6)
    }
    emb.select(col(idCol), array(comps: _*).as("proj"))
  }

  /** Random-hyperplane LSH bucket id per vector: bit p = [dot(v, plane_p) > 0],
    * bucket = Σ bit_p · 2^p. One narrow pass, no shuffle.
    */
  def lshBuckets(emb: DataFrame, idCol: String, vecCol: String,
                 planes: Int, dims: Int): DataFrame = {
    val signs = planeSigns(planes, dims)
    val v = vecd(col(vecCol))
    val bucket = (0 until planes).map { p =>
      val w = typedLit(signs(p).toSeq)
      when(vec_dot(v, w) > 0, 1L << p).otherwise(0L)
    }.reduce(_ + _)
    emb.select(col(idCol), bucket.as("bucket"))
  }

  /** Banded random-hyperplane LSH: `bands` independent signatures of
    * `planesPerBand` sign bits each (planes `b*r .. b*r+r-1` feed band `b`).
    * Emits one (id, band, bucket) row per band via a single narrow
    * map + explode — no shuffle. Candidates share ANY band's bucket, the
    * sign-bit analogue of MinHash banding: per-band bucket count scales as
    * 2^planesPerBand (size with [[planesFor]]) while multiple bands keep
    * recall that a single long signature would destroy.
    */
  def bandedLshBuckets(emb: DataFrame, idCol: String, vecCol: String,
                       bands: Int, planesPerBand: Int, dims: Int,
                       signStride: Int = 0): DataFrame = {
    require(bands > 0 && planesPerBand > 0 && planesPerBand <= 62,
      "bands >= 1, 1 <= planesPerBand <= 62")
    // signStride > planesPerBand pins band b to sign rows [b·stride,
    // b·stride + planesPerBand): a corpus-derived planesPerBand then never
    // shifts which hyperplanes later bands use, so bucket ids stay
    // comparable across corpus sizes (and re-derivable by a static oracle)
    val stride = if (signStride <= 0) planesPerBand else signStride
    require(stride >= planesPerBand, "signStride must cover planesPerBand")
    val signs = planeSigns((bands - 1) * stride + planesPerBand, dims)
    val v = vecd(col(vecCol))
    val perBand = (0 until bands).map { bnd =>
      val bucket = (0 until planesPerBand).map { p =>
        val w = typedLit(signs(bnd * stride + p).toSeq)
        when(vec_dot(v, w) > 0, 1L << p).otherwise(0L)
      }.reduce(_ + _)
      struct(lit(bnd).as("band"), bucket.as("bucket"))
    }
    emb.select(col(idCol), explode(array(perBand: _*)).as("bb"))
      .select(col(idCol), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** Banded embedding near-dup pairs — the 100-TB shape for embedding-cosine
    * dedup. Candidates are pairs sharing any (band, bucket); the pair list is
    * deduped on ids BEFORE vectors are re-attached, so the shuffle carries
    * (id, id, bands_shared) triples — never vector payloads — and each
    * surviving pair costs exactly one exact-cosine check. Size
    * `planesPerBand` with [[planesFor]] so per-band occupancy (and therefore
    * join fanout) stays constant as the corpus grows.
    */
  def cosineNearDupPairsBanded(emb: DataFrame, idCol: String, vecCol: String,
                               bands: Int, planesPerBand: Int, dims: Int,
                               threshold: Double, signStride: Int = 0): DataFrame = {
    val bk = bandedLshBuckets(emb, idCol, vecCol, bands, planesPerBand, dims,
      signStride)
    val a = bk.toDF("id_a", "band", "bucket")
    val b = bk.toDF("id_b", "band", "bucket")
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(count(lit(1)).as("bands_shared"))
    val e = emb.select(col(idCol).as("vid"), vecd(col(vecCol)).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    cand
      .join(e.select(col("vid").as("id_a"), col("v").as("va"), col("nrm").as("na")), "id_a")
      .join(e.select(col("vid").as("id_b"), col("v").as("vb"), col("nrm").as("nb")), "id_b")
      .select(col("id_a"), col("id_b"), col("bands_shared"),
        (vec_dot(col("va"), col("vb")) / nullif(col("na") * col("nb"), lit(0.0)))
          .as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Embedding near-dup pairs, LSH-accelerated: candidates share a bucket
    * (equi-join on bucket id), then exact cosine filters at `threshold`.
    * The scale path for embedding-cosine dedup: pair fanout is bounded by
    * bucket occupancy, not n².
    */
  def cosineNearDupPairs(emb: DataFrame, idCol: String, vecCol: String,
                         planes: Int, dims: Int, threshold: Double): DataFrame = {
    val e = emb.select(col(idCol).as("vid"), vecd(col(vecCol)).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val bucketed = e.join(
      lshBuckets(emb, idCol, vecCol, planes, dims).toDF("vid", "bucket"), "vid")
    val a = bucketed.select(col("vid").as("id_a"), col("v").as("va"),
      col("nrm").as("na"), col("bucket"))
    val b = bucketed.select(col("vid").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("bucket"),
        (vec_dot(col("va"), col("vb")) / nullif(col("na") * col("nb"), lit(0.0)))
          .as("sim"))
      .filter(col("sim") >= threshold)
  }

  /** Per-label embedding centroids: elementwise mean vector + member count —
    * the k-means/IVF codebook refresh step and the standard class-prototype
    * aggregate. Means are computed as `dims` independent `avg(element_at)`
    * aggregates in ONE groupBy, so the shuffle carries `dims` doubles per
    * (partition, label) partial — map-side combined, never a per-row vector
    * explode and never a collect. Output vector components round to 6 dp for
    * cross-engine comparability.
    */
  def centroids(emb: DataFrame, labelCol: String, vecCol: String,
                dims: Int): DataFrame = {
    require(dims > 0, "dims must be positive")
    val means = (1 to dims).map(i =>
      avg(element_at(col(vecCol), i).cast("double")).as(s"m$i"))
    val aggs = count(lit(1)).as("n") +: means
    emb.groupBy(col(labelCol))
      .agg(aggs.head, aggs.tail: _*)
      .select(col(labelCol), col("n"),
        array((1 to dims).map(i => round(col(s"m$i"), 6)): _*).as("centroid"))
  }

  /** Semantic (embedding-space) decontamination — the similarity twin of
    * [[Decontam]]'s n-gram overlap: annotate every corpus vector with its
    * maximum cosine to ANY benchmark/eval vector, and flag those at or above
    * `threshold`. Catches paraphrased leakage that exact n-gram matching
    * misses.
    *
    * Scale: the eval set is bounded (benchmarks are small) → broadcast; the
    * corpus streams once with a per-row max over the broadcast side (a
    * cohort×corpus join + max aggregate keyed on the corpus id — the
    * [[cosineTopK]] shape with k = 1 over the transposed roles). Output is a
    * total annotation (every corpus row appears), like the n-gram form.
    */
  def semanticContamination(corpus: DataFrame, eval: DataFrame, idCol: String,
                            vecCol: String, threshold: Double): DataFrame = {
    val c = corpus.select(col(idCol).as("vid"), vecd(col(vecCol)).as("v"))
      .withColumn("nrm", l2norm(col("v")))
    val e = broadcast(eval.select(col(idCol).as("eid"), vecd(col(vecCol)).as("ev"))
      .withColumn("enrm", l2norm(col("ev"))))
    // LEFT join: the output is a TOTAL annotation of the corpus (the same
    // contract as the n-gram twin) — an empty eval cohort must yield every
    // row with contaminated=false, not an empty frame
    c.join(e, lit(true), "left")
      .select(col("vid"),
        (vec_dot(col("v"), col("ev")) / nullif(col("nrm") * col("enrm"), lit(0.0)))
          .as("sim"))
      .groupBy("vid")
      .agg(max(col("sim")).as("max_eval_sim"))
      .select(col("vid").as(idCol), col("max_eval_sim"),
        coalesce(col("max_eval_sim") >= threshold, lit(false)).as("contaminated"))
  }

  /** SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    * coarse-quantize every vector to its nearest codebook centroid
    * ([[Ivf.assignToCentroids]] — the cheap global routing step), then mark a
    * vector as a semantic duplicate when an EARLIER id in the SAME cell sits
    * within cosine ≥ `threshold`. Keep-first on id makes the decision
    * deterministic and idempotent across reruns.
    *
    * Scale: pairwise cosine runs only WITHIN a cell — the equi-join on
    * `cell` bounds the fanout at Σ cell² the same way LSH bands do, and the
    * codebook (k centroids) is a broadcast, never a shuffle. Cell sizes are
    * the skew dial: more centroids → smaller cells → fewer comparisons, at
    * the cost of cross-cell recall (the paper's k ≈ √n heuristic).
    *
    * Output: one row per input vector — (id, cell, is_dup).
    */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               centroids: Array[Array[Double]], threshold: Double): DataFrame = {
    // buildFixed carries the vector WITH its cell assignment out of one pass
    // — re-joining emb on the id just to reattach vectors would add a
    // corpus-wide shuffle and a second scan
    val member = Ivf.buildFixed(emb, idCol, vecCol, centroids).assigned
      .select(col("vid"), col("v"), col("list_id").as("cell"))
      .withColumn("nrm", l2norm(col("v")))
    val cells = member.select(col("vid"), col("cell"))
    val a = member.select(col("vid").as("id_a"), col("v").as("va"),
      col("nrm").as("na"), col("cell"))
    val b = member.select(col("vid").as("id_b"), col("v").as("vb"),
      col("nrm").as("nb"), col("cell"))
    val dups = a.join(b, Seq("cell"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_b").as("vid"),
        (vec_dot(col("va"), col("vb")) / nullif(col("na") * col("nb"), lit(0.0)))
          .as("sim"))
      .filter(col("sim") >= threshold)
      .select("vid").distinct()
    cells.join(dups.withColumn("__d", lit(true)), Seq("vid"), "left")
      .select(col("vid").as(idCol), col("cell"),
        coalesce(col("__d"), lit(false)).as("is_dup"))
  }
}
