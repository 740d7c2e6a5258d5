package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.vec_dot

/** Product quantization (Jégou et al. 2011) — the compression layer under
  * billion-vector ANN: split each d-dim vector into `m` contiguous
  * sub-vectors, quantize every sub-vector to its nearest centroid in that
  * subspace's private codebook, and store only the m small codes
  * (m × log2(ksub) bits instead of d floats — 64 floats → 8 bytes at
  * m=8/ksub=256). Search-time ADC then scores candidates from per-subspace
  * lookup tables without touching raw vectors.
  *
  * Like [[Ivf]], training a codebook (k-means per subspace) is not bit-stable
  * across engines, so the operator takes FIXED centroids — the
  * precomputed-codebook deployment path, which is also what runs at scale
  * (train on a sample offline, encode the corpus with the frozen codebook).
  *
  * Encoding is one narrow codegen'd pass: per subspace, argmin over ksub
  * distances, each distance a [[graft.expressions.VecDot]] over the slice —
  * no shuffle, no UDF, full scan throughput. The codebook rides in the plan
  * as literals (m × ksub × dsub doubles — fine for coarse PQ; at production
  * ksub=256 move it to a broadcast join, the [[Ivf.assignToCentroids]]
  * shape).
  */
object Pq {

  /** Encode every vector: (id, code0 .. code{m-1}), where code_s is the index
    * of the nearest centroid (squared-L2, ties to the lowest index) of
    * `codebook(s)` to the vector's s-th `dsub`-wide slice.
    *
    * `codebook(s)(j)` = centroid j of subspace s; all centroids must share
    * the subspace width dsub = d / m.
    */
  def encode(emb: DataFrame, idCol: String, vecCol: String,
             codebook: Array[Array[Array[Double]]]): DataFrame = {
    val (m, dsub) = validatedShape(codebook)
    // materialize each slice once (a lambda-free projection) so the ksub
    // distance expressions below share it instead of re-slicing per centroid
    val sliced = emb.select(
      col(idCol) +:
        (0 until m).map(s =>
          slice(lengthChecked(Similarity.vecd(col(vecCol)), m * dsub),
            s * dsub + 1, dsub).as(s"__s$s")): _*)
    val codes = (0 until m).map { s =>
      // rank by |c|² − 2·v·c (|v|² is argmin-invariant). Linear argmin:
      // array_position finds the FIRST occurrence of the minimum, so ties
      // break to the lowest index — the same contract as Ivf assignment.
      // (A when-chain fold embeds the running best twice per step: an
      // O(2^ksub) expression tree that stalls analysis at real ksub.)
      val dists = array(codebook(s).toIndexedSeq.map { c =>
        lit(c.map(x => x * x).sum) -
          lit(2.0) * vec_dot(col(s"__s$s"), typedLit(c.toSeq))
      }: _*)
      (array_position(dists, array_min(dists)) - 1).cast("int").as(s"code$s")
    }
    sliced.select(col(idCol) +: codes: _*)
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: each query keeps its REAL
    * vector; every corpus vector is represented only by its m codes. Distance
    * ≈ Σ_s ‖q_s − centroid(code_s)‖², read from a per-query lookup table of
    * m × ksub precomputed sub-distances — the search side of the PQ paper.
    *
    * Scale shape: the corpus side streams CODES ONLY (m ints per vector —
    * the whole point: the scan is ~100× narrower than raw vectors); the
    * query cohort with its LUT arrays is a broadcast; the per-pair distance
    * is a fixed chain of m array lookups + adds inside codegen (strict
    * left-to-right, so any engine reproduces it bit-for-bit); `rn <= k`
    * compiles to WindowGroupLimit per-task heaps.
    *
    * Output: (q, n_id, adc, rn) — squared-L2 ADC distance, ascending.
    */
  def adcTopK(corpusCodes: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, codebook: Array[Array[Array[Double]]],
              k: Int): DataFrame = {
    val (m, dsub) = validatedShape(codebook)
    val qsliced = queries.select(
      col(idCol).as("q") +:
        (0 until m).map(s =>
          slice(lengthChecked(Similarity.vecd(col(vecCol)), m * dsub),
            s * dsub + 1, dsub).as(s"__s$s")): _*)
    // LUT_s[j] = ‖q_s − c_j‖² expanded as (q·q − 2 q·c) + |c|², every term a
    // fixed-order chain the oracle mirrors verbatim
    val luts = (0 until m).map { s =>
      val qs = col(s"__s$s")
      array(codebook(s).toIndexedSeq.map { c =>
        vec_dot(qs, qs) - lit(2.0) * vec_dot(qs, typedLit(c.toSeq)) +
          lit(c.map(x => x * x).sum)
      }: _*).as(s"__lut$s")
    }
    val q = broadcast(qsliced.select(col("q") +: luts: _*))
    val adc = (0 until m).map(s =>
      element_at(col(s"__lut$s"), col(s"code$s") + 1)).reduce(_ + _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q")).orderBy(col("adc"), col("n_id"))
    require(corpusCodes.columns.contains(idCol),
      s"corpusCodes must carry the id column '$idCol' (got ${corpusCodes.columns.mkString(", ")})")
    corpusCodes.withColumnRenamed(idCol, "n_id")
      .join(q, col("q") =!= col("n_id"))
      .select(col("q"), col("n_id"), adc.as("adc"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Codebook from the corpus itself: subspace s's centroids are the s-th
    * slices of the first `ksub` vectors by id — the deterministic stand-in
    * for an offline-trained codebook (same role as the fixed [[Ivf]]
    * centroids in the declared queries).
    */
  def codebookFromFirst(emb: DataFrame, idCol: String, vecCol: String,
                        m: Int, ksub: Int): Array[Array[Array[Double]]] = {
    val first = emb.filter(col(idCol) < ksub).orderBy(idCol)
      .select(Similarity.vecd(col(vecCol)).as("v"))
      .collect().map(_.getSeq[Double](0).toArray)
    require(first.length == ksub, s"need $ksub codebook rows, got ${first.length}")
    val d = first(0).length
    require(d % m == 0,
      s"vector dimension $d is not divisible by m=$m subspaces — the trailing " +
        s"${d % m} dims would be silently dropped from every subspace")
    require(first.forall(_.length == d),
      "codebook source vectors must all share one dimension")
    val dsub = d / m
    Array.tabulate(m, ksub) { (s, j) => first(j).slice(s * dsub, (s + 1) * dsub) }
  }

  /** (m, dsub) of a codebook, validated: non-empty, and every centroid in
    * every subspace shares one width — a ragged codebook would slice and
    * score on partial vectors without any error.
    */
  private def validatedShape(codebook: Array[Array[Array[Double]]]): (Int, Int) = {
    val m = codebook.length
    require(m > 0 && codebook.forall(_.nonEmpty), "codebook must be non-empty")
    val dsub = codebook(0)(0).length
    require(codebook.forall(_.forall(_.length == dsub)),
      s"all centroids must share subspace width $dsub")
    (m, dsub)
  }

  /** Fail loudly on a vector whose length is not the codebook's m·dsub —
    * `slice` would otherwise quantize a truncated (or partial-trailing)
    * vector silently. One cheap size comparison per row, inside codegen.
    */
  private def lengthChecked(v: Column, d: Int): Column =
    when(size(v) === d, v).otherwise(raise_error(concat(
      lit(s"PQ: vector length must be $d (m·dsub), got "), size(v).cast("string"))))

  /** Int8 scalar quantization (the FAISS `SQ8` tier — 4× smaller than
    * float32 with near-lossless recall for most embedding families): each
    * vector quantizes against its OWN [min, max] span — `code_i =
    * clamp(⌊(v_i − min)/span · 256⌋, 0..255)`, reconstruction at the cell
    * midpoint `min + (code_i + 0.5)·span/256`. Per-vector (not trained
    * per-dimension) bounds keep the operator stateless and deterministic:
    * no codebook, no training pass, bit-stable across engines (⌊·⌋ instead
    * of a round so no tie can split — the `gap_interp` lesson).
    *
    * Output per vector: dims, the exact integer code sum/min/max (the
    * compressed payload's checksum-grade summary), the span bounds, and the
    * mean absolute reconstruction error — summed in a FIXED-ORDER left fold
    * so both engines chain the identical IEEE additions.
    *
    * Scale: one narrow codegen'd map, zero shuffle — runs at scan
    * throughput next to the parquet read, the preprocessing step before
    * shipping vectors to an ANN index that accepts SQ8 payloads.
    */
  def scalarQuantize8(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = Similarity.vecd(col(vecCol))
    val mn = array_min(v)
    val mx = array_max(v)
    val span = mx - mn
    def codeOf(x: Column): Column =
      when(span === 0.0, lit(0))
        .otherwise(least(lit(255), floor((x - mn) / span * 256).cast("int")))
    val codes = transform(v, codeOf _)
    val errs = transform(v, (x: Column) =>
      abs(x - (mn + (codeOf(x).cast("double") + 0.5) * span / lit(256.0))))
    val errSum = aggregate(errs, lit(0.0), (acc: Column, e: Column) => acc + e)
    emb.select(col(idCol),
      size(v).as("n_dims"),
      aggregate(codes, lit(0L), (acc: Column, c: Column) => acc + c)
        .as("code_sum"),
      array_min(codes).as("code_min"),
      array_max(codes).as("code_max"),
      round(mn, 6).as("lo"),
      round(mx, 6).as("hi"),
      round(errSum / size(v), 6).as("mean_abs_err"))
  }
}
