package graft

import org.apache.spark.sql.functions._

import graft.ops.{Decontam, Similarity}

/** Unit spec for eval-set decontamination (the declared `decontam` query is
  * additionally oracle-checked end-to-end).
  */
class DecontamSpec extends SparkSpec {
  import spark.implicits._

  test("semanticContamination: max-cosine annotation against a broadcast eval set") {
    // eval = x-axis direction; corpus: parallel (contaminated), near-parallel
    // (contaminated at 0.9), orthogonal (clean)
    val eval = Seq((1L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = Seq(
      (10L, Array(2.0f, 0.0f)),   // cos = 1
      (11L, Array(1.0f, 0.3f)),   // cos ≈ 0.958
      (12L, Array(0.0f, 5.0f))    // cos = 0
    ).toDF("vec_id", "embedding")
    val out = Similarity
      .semanticContamination(corpus, eval, "vec_id", "embedding", 0.9)
      .orderBy("vec_id")
      .select("vec_id", "contaminated").as[(Long, Boolean)].collect()
    assert(out.toSeq === Seq((10L, true), (11L, true), (12L, false)))
    // total annotation: every corpus row appears exactly once
    assert(out.length === 3)
  }

  test("semanticContamination: empty eval set yields a total clean annotation") {
    val corpus = Seq((10L, Array(1.0f, 0.0f)), (11L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val eval = corpus.filter(col("vec_id") < 0) // empty cohort
    val out = Similarity
      .semanticContamination(corpus, eval, "vec_id", "embedding", 0.9)
      .select("vec_id", "contaminated").as[(Long, Boolean)].collect()
    assert(out.toSeq.sorted === Seq((10L, false), (11L, false)))
  }

  test("evalOverlap: exact copy, partial overlap, clean, and short docs") {
    val eval = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val train = Seq(
      (10L, "a b c d e"),   // identical → all 3 shingles hit
      (11L, "a b c x y z"), // shares only "a b c" of its 4 shingles
      (12L, "p q r s"),     // disjoint
      (13L, "p q")          // < 3 tokens → zero shingles, must still appear
    ).toDF("doc_id", "text")
    val got = Decontam.evalOverlap(train, eval, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_sh", "hits", "overlap_frac", "contaminated")
      .as[(Long, Long, Long, Double, Boolean)].collect()
    assert(got === Array(
      (10L, 3L, 3L, 1.0, true),
      (11L, 4L, 1L, 0.25, true),
      (12L, 2L, 0L, 0.0, false),
      (13L, 0L, 0L, 0.0, false)))
  }

  test("evalOverlap: minHits raises the contamination bar") {
    val eval = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val train = Seq((10L, "a b c x y z"), (11L, "a b c d e")).toDF("doc_id", "text")
    val got = Decontam.evalOverlap(train, eval, "doc_id", "text", n = 3, minHits = 2)
      .orderBy("doc_id").select("doc_id", "contaminated")
      .as[(Long, Boolean)].collect()
    assert(got === Array((10L, false), (11L, true)))
  }

  test("evalOverlap: hits count distinct shingles, not occurrences") {
    // train doc repeats the eval shingle — shinglesOfTokens is distinct, so
    // the repeated "a b c" counts once in both n_sh and hits
    val eval = Seq((1L, "a b c")).toDF("doc_id", "text")
    val train = Seq((10L, "a b c a b c")).toDF("doc_id", "text")
    val got = Decontam.evalOverlap(train, eval, "doc_id", "text", n = 3)
      .select("n_sh", "hits").as[(Long, Long)].head()
    // "a b c a b c" → shingles {a b c, b c a, c a b} (distinct), one hit
    assert(got === ((3L, 1L)))
  }

  test("evalOverlap plan broadcasts the eval n-gram set") {
    val eval = Seq((1L, "a b c d e")).toDF("doc_id", "text")
    val train = Seq((10L, "a b c d e")).toDF("doc_id", "text")
    val plan = Decontam.evalOverlap(train, eval, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"eval side must broadcast-join, got:\n$plan")
  }
}
