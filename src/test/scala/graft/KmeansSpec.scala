package graft

import org.apache.spark.sql.functions._

import graft.ops.Kmeans

/** [[graft.ops.Kmeans]] — hand-checkable Lloyd steps in micro space, plus
  * the determinism properties the oracle depends on (tie-break, floor
  * updates, partition independence).
  */
class KmeansSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("one iteration on a hand-computed 1-d-style instance") {
    // 2-d vectors, k=2, seeds = vecs 0 and 1. micro space:
    // v0=(0,0) v1=(1e6,0) v2=(100000,0) v3=(900000,0)
    // assign: v0,v2 -> c0; v1,v3 -> c1
    // update: c0 = floor((0+100000)/2)=50000, c1 = floor((1e6+900000)/2)=950000
    val df = emb(
      0L -> Seq(0f, 0f), 1L -> Seq(1f, 0f),
      2L -> Seq(0.1f, 0f), 3L -> Seq(0.9f, 0f))
    val cents = Kmeans.train(df, "vec_id", "embedding", k = 2, iterations = 1)
      .orderBy("list_id", "pos").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    // 0.1f widens to ~0.100000001490116; micro = round(·1e6) = 100000
    assert(cents.toSeq === Seq((0, 0, 50000L), (0, 1, 0L), (1, 0, 950000L), (1, 1, 0L)))
    val assign = Kmeans.assign(df, "vec_id", "embedding", k = 2, iterations = 1)
      .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(assign.toSeq === Seq(0L -> 0, 1L -> 1, 2L -> 0, 3L -> 1))
  }

  test("equidistant vector breaks the tie toward the lower list_id") {
    val df = emb(0L -> Seq(0f), 1L -> Seq(1f), 2L -> Seq(0.5f))
    val assign = Kmeans.assign(df, "vec_id", "embedding", k = 2, iterations = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(assign(2L) === 0, "exact tie must go to the lower centroid id")
  }

  test("floor update is exact for negative sums (floor, not truncate)") {
    // v0=-1 (micro -1e6) seeds c0; v1=-0.5, v2=0.2 with k=1:
    // all 3 in c0; sum = -1e6 - 500000 + 200000 = -1300000; /3 = -433333.33
    // floor = -433334 (truncation would give -433333)
    val df = emb(0L -> Seq(-1f), 1L -> Seq(-0.5f), 2L -> Seq(0.2f))
    val c = Kmeans.train(df, "vec_id", "embedding", k = 1, iterations = 1)
      .collect().map(r => r.getLong(2))
    assert(c.toSeq === Seq(-433334L))
  }

  test("results are partition-count independent") {
    val vecs = (0L until 40L).map(i =>
      i -> Seq.tabulate(4)(j => ((i * 7 + j * 3) % 11).toFloat / 11f))
    val one = Kmeans.train(emb(vecs: _*).repartition(1), "vec_id", "embedding",
      k = 3, iterations = 3).collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val many = Kmeans.train(emb(vecs: _*).repartition(13), "vec_id", "embedding",
      k = 3, iterations = 3).collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(one === many, "integer micro math must not depend on partitioning")
  }

  test("iterations strictly refine: within-cluster cost is non-increasing") {
    val vecs = (0L until 60L).map(i =>
      i -> Seq.tabulate(8)(j => math.sin(i * 13.7 + j).toFloat))
    val df = emb(vecs: _*)
    def cost(iters: Int): Double = {
      val cents = Kmeans.train(df, "vec_id", "embedding", k = 4, iterations = iters)
        .collect().groupBy(_.getInt(0)).map { case (lid, rs) =>
          lid -> rs.sortBy(_.getInt(1)).map(_.getLong(2).toDouble)
        }
      df.select(col("vec_id"), Kmeans.microVec(col("embedding")).as("x"))
        .collect().map { r =>
          val x = r.getSeq[Double](1)
          cents.values.map(c => x.zip(c).map { case (a, b) =>
            (a - b) * (a - b) }.sum).min
        }.sum
    }
    val c1 = cost(1); val c2 = cost(2); val c3 = cost(3)
    assert(c2 <= c1 && c3 <= c2, s"cost must not increase: $c1, $c2, $c3")
  }

  test("trainWithStats: fixpoint early-stop reported as converged, a moving budget as not") {
    // two points seeding two clusters: assignments can never change, so
    // iteration 1 moves nothing — converged, early-stopped, and the result
    // is bit-identical to the full budget (the no-op-iterations argument)
    val tiny = emb(0L -> Seq(0f), 1L -> Seq(1f))
    val (c10, s10) = Kmeans.trainWithStats(tiny, "vec_id", "embedding",
      k = 2, iterations = 10)
    assert(s10.converged, "a reached fixpoint must be reported")
    assert(s10.iterationsRun < 10, "further no-op iterations are skipped")
    val full = Kmeans.train(tiny, "vec_id", "embedding", k = 2, iterations = 10)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(c10.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
      === full)
    // 60 spread vectors, budget 1: centroids move on the first step —
    // the telemetry must say the budget, not a fixpoint, ended training
    val vecs = (0L until 60L).map(i =>
      i -> Seq.tabulate(8)(j => math.sin(i * 13.7 + j).toFloat))
    val (_, s1) = Kmeans.trainWithStats(emb(vecs: _*), "vec_id", "embedding",
      k = 4, iterations = 1)
    assert(!s1.converged && s1.iterationsRun === 1,
      "an exhausted budget with moving centroids is NOT convergence")
  }
}
