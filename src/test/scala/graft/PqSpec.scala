package graft

import org.apache.spark.sql.functions._

import graft.ops.Pq

class PqSpec extends SparkSpec {
  import spark.implicits._

  // 4 vectors of 8 dims → m=2 subspaces × 4 dims, ksub=4. Values chosen so
  // every subspace slice of every codebook row is distinct.
  private val emb = Seq(
    (0L, Seq(0f, 0f, 0f, 0f, 9f, 9f, 9f, 9f)),
    (1L, Seq(1f, 1f, 1f, 1f, 5f, 5f, 5f, 5f)),
    (2L, Seq(4f, 4f, 4f, 4f, 1f, 1f, 1f, 1f)),
    (3L, Seq(8f, 8f, 8f, 8f, 0f, 0f, 0f, 0f)),
    // near vec 1 in subspace 0, near vec 3 in subspace 1
    (4L, Seq(1.2f, 1.2f, 0.8f, 0.9f, 0.1f, 0f, 0.2f, 0f)),
    // near vec 3 in subspace 0, near vec 0 in subspace 1
    (5L, Seq(7.5f, 8.1f, 8f, 8.2f, 9.4f, 8.8f, 9f, 9.1f))
  ).toDF("vec_id", "embedding")

  private lazy val cb = Pq.codebookFromFirst(emb, "vec_id", "embedding", m = 2, ksub = 4)

  test("codebookFromFirst slices the first ksub vectors per subspace") {
    assert(cb.length === 2 && cb(0).length === 4 && cb(0)(0).length === 4)
    assert(cb(0)(3).toSeq === Seq(8.0, 8.0, 8.0, 8.0))
    assert(cb(1)(0).toSeq === Seq(9.0, 9.0, 9.0, 9.0))
  }

  test("encode: codebook rows encode to their own index in every subspace") {
    val out = Pq.encode(emb.filter(col("vec_id") < 4), "vec_id", "embedding", cb)
      .orderBy("vec_id").select("code0", "code1").as[(Int, Int)].collect()
    assert(out.toSeq === (0 until 4).map(j => (j, j)))
  }

  test("encode picks the argmin centroid independently per subspace") {
    val out = Pq.encode(emb, "vec_id", "embedding", cb)
      .filter(col("vec_id") >= 4).orderBy("vec_id")
      .select("code0", "code1").as[(Int, Int)].collect()
    assert(out.toSeq === Seq((1, 3), (3, 0)))
  }

  test("encode agrees with brute-force per-subspace argmin on random vectors") {
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 60L).map(i => (i, Array.fill(8)(rnd.nextInt(100) / 10.0f)))
    val df = vecs.toDF("vec_id", "embedding")
    val book = Pq.codebookFromFirst(df, "vec_id", "embedding", m = 2, ksub = 4)
    val got = Pq.encode(df, "vec_id", "embedding", book)
      .select("vec_id", "code0", "code1").as[(Long, Int, Int)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    vecs.foreach { case (id, v) =>
      def argmin(s: Int): Int = {
        val sub = v.slice(s * 4, s * 4 + 4).map(_.toDouble)
        val d = book(s).map(c => sub.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
        d.zipWithIndex.minBy { case (dist, j) => (dist, j) }._2
      }
      assert(got(id) === ((argmin(0), argmin(1))), s"codes for vec $id")
    }
  }

  test("adcTopK: lookup-table distances rank the coded corpus, self excluded") {
    // query v0 = (0⁴, 9⁴): LUT₀ = [0,4,64,256], LUT₁ = [0,64,256,324];
    // codes: v1=(1,1) → 68, v5=(3,0) → 256, v2=(2,2) → 320, v4=(1,3) → 328,
    // v3=(3,3) → 580
    val codes = Pq.encode(emb, "vec_id", "embedding", cb)
    val got = Pq.adcTopK(codes, emb.filter(col("vec_id") === 0),
        "vec_id", "embedding", cb, k = 5)
      .orderBy("rn").select("n_id", "adc").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq === Seq(1L, 5L, 2L, 4L, 3L))
    assert(got.map(_._2).toSeq === Seq(68.0, 256.0, 320.0, 328.0, 580.0))
  }

  test("codebookFromFirst rejects a dimension not divisible by m") {
    val bad = Seq((0L, Seq(1f, 2f, 3f)), (1L, Seq(4f, 5f, 6f)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Pq.codebookFromFirst(bad, "vec_id", "embedding", m = 2, ksub = 2)
    }
    assert(e.getMessage.contains("not divisible"))
  }

  test("encode fails loudly on a vector whose length is not m*dsub") {
    // 6-dim row in an 8-dim corpus: slicing would silently quantize a
    // truncated subspace-1 — the guard must raise instead
    val mixed = emb.union(Seq((9L, Seq(1f, 2f, 3f, 4f, 5f, 6f)))
      .toDF("vec_id", "embedding"))
    val e = intercept[Exception] {
      Pq.encode(mixed, "vec_id", "embedding", cb).collect()
    }
    assert(e.getMessage.contains("vector length must be 8") ||
      Option(e.getCause).exists(_.getMessage.contains("vector length must be 8")))
  }

  test("encode/adcTopK reject a ragged codebook") {
    val ragged = Array(
      Array(Array(1.0, 2.0), Array(3.0, 4.0)),
      Array(Array(1.0, 2.0), Array(3.0, 4.0, 5.0)))
    intercept[IllegalArgumentException] {
      Pq.encode(emb, "vec_id", "embedding", ragged)
    }
    intercept[IllegalArgumentException] {
      Pq.adcTopK(emb, emb, "vec_id", "embedding", ragged, k = 1)
    }
  }

  test("scalarQuantize8: hand-computed codes, midpoint error, degenerate span") {
    val df = Seq(
      (1L, Seq(0.0, 1.0, 0.5)), // span 1: codes 0 / 255 (clamped 256) / 128
      (2L, Seq(2.0, 2.0))       // zero span: codes 0, exact reconstruction
    ).toDF("vec_id", "embedding")
    val out = Pq.scalarQuantize8(df, "vec_id", "embedding")
      .select("vec_id", "n_dims", "code_sum", "code_min", "code_max",
        "lo", "hi", "mean_abs_err")
      .as[(Long, Int, Long, Int, Int, Double, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, 3, 383L, 0, 255, 0.0, 1.0, 0.001953)))
    // midpoint recon error is span/512 = 1/512 for every in-range cell and
    // ALSO for the clamped max (|1 − 255.5/256| = 1/512) → mean 0.001953125
    assert(out(2L) === ((2L, 2, 0L, 0, 0, 2.0, 2.0, 0.0)))
  }
}
