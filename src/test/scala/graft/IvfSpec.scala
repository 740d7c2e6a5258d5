package graft

import org.apache.spark.sql.functions._

import graft.ops.{Ivf, Similarity}

/** IVF ANN spec: recall against the exact brute-force baseline, probe-fraction
  * cost model, and full-probe equivalence.
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb =
    graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")

  private lazy val exact = Similarity
    .cosineTopK(emb, "vec_id", "embedding", k = 5)
    .select("q", "n", "rn").as[(Long, Long, Int)].collect()
    .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("full probe (nProbe = nLists) reproduces the exact top-k") {
    val idx = Ivf.build(emb, "vec_id", "embedding", nLists = 8)
    val got = Ivf.search(idx, emb, "vec_id", "embedding", k = 5, nProbe = 8)
      .select("q", "n_id", "rn").as[(Long, Long, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(got.keySet === exact.keySet)
    val agree = exact.keys.count(q => got(q) == exact(q))
    assert(agree === exact.size, s"full probe must equal exact; agreed $agree/${exact.size}")
  }

  test("probe plan is O(1) in nLists: 1024 centroids stay out of the plan") {
    val nLists = 1024
    // centroids on a line at x = i; query at x = 7 probes exactly list 7
    val centroids = Array.tabulate(nLists)(i => Array(i.toDouble, 0.0))
    val assigned = (0 until 4096)
      .map(i => (i.toLong, Seq((i % nLists).toDouble, 1.0), i % nLists))
      .toDF("vid", "v", "list_id")
    val idx = Ivf.Index(centroids, assigned)
    val queries = Seq((9999L, Seq(7.0f, 1.0f))).toDF("vec_id", "embedding")
    val res = Ivf.search(idx, queries, "vec_id", "embedding", k = 3, nProbe = 1)
    val got = res.select("n_id").as[Long].collect().toSet
    assert(got.nonEmpty && got.forall(_ % nLists == 7),
      s"nProbe=1 must draw candidates only from the probed list, got $got")
    // broadcast-relation centroids: no literal-per-centroid expression chain
    val plan = res.queryExecution.optimizedPlan.toString
    assert(plan.length < 50000,
      s"plan grew with nLists (len=${plan.length}) — centroids are being inlined")
  }

  test("partial probe trades recall for candidate volume") {
    val idx = Ivf.build(emb, "vec_id", "embedding", nLists = 8)
    val got = Ivf.search(idx, emb, "vec_id", "embedding", k = 5, nProbe = 3)
      .select("q", "n_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // recall@5 over all queries
    val hits = exact.toSeq.map { case (q, nbrs) =>
      got.get(q).map(g => (g & nbrs).size).getOrElse(0)
    }.sum
    val recall = hits.toDouble / (exact.size * 5)
    assert(recall > 0.25, s"recall@5 unreasonably low: $recall")
    assert(recall < 1.01)
    // candidate volume must be bounded by the probed fraction (≈3/8 + skew)
    val cands = Ivf.search(idx, emb, "vec_id", "embedding", k = 1000, nProbe = 3)
      .count()
    val full = emb.count() * (emb.count() - 1)
    assert(cands < full, s"partial probe must prune candidates ($cands vs $full)")
  }

  test("semDedup: within-cell keep-first marking, cells never mix") {
    // two orthogonal cells; ids 1,2,3 route to cell 0 and 4,5 to cell 1.
    // 2 duplicates 1 (same direction), 3 is orthogonal-ish only to cell-1
    // vectors — near-dups ACROSS cells are deliberately not compared.
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(
      (1L, Array(1.0f, 0.1f)),
      (2L, Array(2.0f, 0.2f)),   // cos(1,2) = 1 → dup of 1
      (3L, Array(1.0f, -0.9f)),  // cell 0 (closer to x-axis), far from 1 and 2
      (4L, Array(0.1f, 1.0f)),
      (5L, Array(0.1f, 1.0f))    // exact copy of 4 → dup
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDedup(df, "vec_id", "embedding", cents, 0.95)
      .orderBy("vec_id")
      .select("vec_id", "cell", "is_dup").as[(Long, Int, Boolean)].collect()
    assert(got.map(_._2).toSeq === Seq(0, 0, 0, 1, 1))
    assert(got.map(_._3).toSeq === Seq(false, true, false, false, true))
  }

  test("semDedup is idempotent: dropping marked dups leaves no new dups") {
    val cents = Array(Array(1.0, 0.0), Array(0.0, 1.0))
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(2.0f, 0.0f)), (3L, Array(3.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val first = Similarity.semDedup(df, "vec_id", "embedding", cents, 0.95)
    val kept = df.join(first.filter(!col("is_dup")).select("vec_id"), "vec_id")
    val second = Similarity.semDedup(kept, "vec_id", "embedding", cents, 0.95)
    assert(second.filter(col("is_dup")).count() === 0)
  }

  test("centroids: elementwise mean and member count per label") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f, 3.0f), 0),
      (2L, Array(3.0f, 4.0f, 5.0f), 0),
      (3L, Array(10.0f, 0.0f, -2.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.centroids(df, "label", "embedding", dims = 3)
      .orderBy("label")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getSeq[Double](2).toSeq))
    assert(got.toSeq === Seq(
      (0, 2L, Seq(2.0, 3.0, 4.0)),
      (1, 1L, Seq(10.0, 0.0, -2.0))))
  }

  test("randomProject: components are the exact signed sums over √dOut") {
    val df = Seq((1L, Array(1.0f, 2.0f, 4.0f, 8.0f))).toDF("vec_id", "embedding")
    val signs = Similarity.planeSigns(2, 4)
    val got = Similarity.randomProject(df, "vec_id", "embedding", dOut = 2, dims = 4)
      .select("proj").collect().head.getSeq[Double](0)
    val v = Array(1.0, 2.0, 4.0, 8.0)
    val want = (0 until 2).map { j =>
      val dot = v.indices.foldLeft(0.0)((a, i) => a + v(i) * signs(j)(i))
      BigDecimal(dot / math.sqrt(2.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    }
    assert(got.toSeq === want)
  }

  test("randomProject roughly preserves relative distances (JL property)") {
    // 20 vectors in 32 dims → 8 dims; close pairs must stay closer than the
    // far pair by a wide margin (sanity, not a tight bound)
    val rnd = new scala.util.Random(7)
    val base = Array.fill(32)(rnd.nextGaussian().toFloat)
    val near = base.map(x => x + 0.01f)
    val far = Array.fill(32)(rnd.nextGaussian().toFloat * 5f)
    val df = Seq((0L, base), (1L, near), (2L, far)).toDF("vec_id", "embedding")
    val p = Similarity.randomProject(df, "vec_id", "embedding", dOut = 8, dims = 32)
      .orderBy("vec_id").collect().map(_.getSeq[Double](1).toArray)
    def d2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    assert(d2(p(0), p(1)) * 10 < d2(p(0), p(2)),
      "a near pair must project far closer than a far pair")
  }

  test("build surfaces quantizer convergence telemetry") {
    val idx = Ivf.build(emb, "vec_id", "embedding", nLists = 8)
    assert(idx.trainIters >= 1, "the summary's iteration count is recorded")
    assert(idx.trainConverged === (idx.trainIters < 20),
      "converged ⟺ stopped strictly before the maxIter budget — the " +
        "documented CONSERVATIVE contract (a tolerance stop exactly on " +
        "the final budgeted iteration also reads false: Spark's summary " +
        "has no last-iteration delta, so it cannot be proven converged)")
    // a 1-iteration budget cannot certify a tolerance stop on this corpus
    val tight = Ivf.build(emb, "vec_id", "embedding", nLists = 8, maxIter = 1)
    assert(tight.trainIters === 1 && !tight.trainConverged,
      "exhausting maxIter (provable or not) must read as non-converged")
  }
}
