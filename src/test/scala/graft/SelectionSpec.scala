package graft

import graft.ops.Selection

class SelectionSpec extends SparkSpec {
  import spark.implicits._

  // points on a plane with a unique greedy traversal: seed id 1 at origin,
  // then 5 (d²=101), 6 (34), 3 (16) — hand-traced farthest-point walk
  private val pts = Seq(
    (1L, Seq(0.0, 0.0)), (2L, Seq(10.0, 0.0)), (3L, Seq(5.0, 0.0)),
    (4L, Seq(0.0, 1.0)), (5L, Seq(10.0, 1.0)), (6L, Seq(5.0, 4.0)))

  test("kCenter: hand-computed farthest-point traversal with distances") {
    val out = Selection.kCenter(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 4)
      .orderBy("sel_rank")
      .collect().map(r => (r.getInt(0), r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2)))
    assert(out.toSeq === Seq((0, 1L, -1L), (1, 5L, 101000000L),
      (2, 6L, 34000000L), (3, 3L, 16000000L)))
  }

  test("kCenter: selection is partitioning-independent") {
    val base = pts.toDF("vec_id", "embedding")
    val a = Selection.kCenter(base, "vec_id", "embedding", 4)
      .orderBy("sel_rank").collect().toSeq
    val b = Selection.kCenter(base.repartition(7), "vec_id", "embedding", 4)
      .orderBy("sel_rank").collect().toSeq
    assert(a === b)
  }

  test("kCenter: coverage radius never increases with rank") {
    val d = Selection.kCenter(pts.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 6)
      .orderBy("sel_rank").collect().drop(1).map(_.getLong(2))
    assert(d.toSeq === d.sorted(Ordering[Long].reverse).toSeq,
      s"radii must be non-increasing: ${d.toSeq}")
  }

  test("kCenter: exact distance ties break on the lower id") {
    // 2 and 3 are both at d²=1 from the seed; 2 must win
    val sym = Seq((1L, Seq(0.0)), (2L, Seq(1.0)), (3L, Seq(-1.0)))
    val out = Selection.kCenter(sym.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 2)
      .orderBy("sel_rank").collect().map(_.getLong(1))
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("kCenter: k=1 returns only the seed") {
    val out = Selection.kCenter(pts.toDF("vec_id", "embedding"),
      "vec_id", "embedding", k = 1).collect()
    assert(out.length === 1 && out(0).getLong(1) === 1L && out(0).isNullAt(2))
  }

  private def dsirDocs = Seq(
    (1L, "alpha beta gamma", true), (2L, "alpha beta delta", true),
    (3L, "alpha gamma beta", true),
    (4L, "zork quux blarg", false), (5L, "zork blarg quux", false),
    (6L, "alpha beta gamma", false),  // target-like text, raw slice
    (7L, "quux zork blarg", false))
    .toDF("doc_id", "text", "tgt")

  test("dsirWeights: target-like text outscores off-target text") {
    import org.apache.spark.sql.functions.col
    val w = Selection.dsirWeights(dsirDocs, "doc_id", "text", col("tgt"), 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 6 shares the target slice's vocabulary; docs 4/5/7 do not
    assert(w(6) > w(4) && w(6) > w(5) && w(6) > w(7),
      s"target-like doc must outrank off-target docs: $w")
    // feature count = unigrams + bigrams = 3 + 2 per doc here
    val n = Selection.dsirWeights(dsirDocs, "doc_id", "text", col("tgt"), 64)
      .collect().map(_.getLong(1))
    assert(n.forall(_ === 5L))
  }

  test("dsirWeights is partitioning-independent") {
    import org.apache.spark.sql.functions.col
    def run(df: org.apache.spark.sql.DataFrame) =
      Selection.dsirWeights(df, "doc_id", "text", col("tgt"), 64)
        .orderBy("doc_id").collect().toSeq
    assert(run(dsirDocs) === run(dsirDocs.repartition(13)))
  }

  test("dsirSelect returns the k best by weight with id tiebreak") {
    import org.apache.spark.sql.functions.col
    val sel = Selection.dsirSelect(dsirDocs, "doc_id", "text", col("tgt"),
        64, k = 3)
      .collect().map(_.getLong(0)).toSet
    val all = Selection.dsirWeights(dsirDocs, "doc_id", "text", col("tgt"), 64)
      .collect().map(r => (r.getDouble(2), r.getLong(0)))
      .sortBy { case (lw, id) => (-lw, id) }.take(3).map(_._2).toSet
    assert(sel === all)
  }
}
