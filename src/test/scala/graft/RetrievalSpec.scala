package graft

import org.apache.spark.sql.functions._

import graft.ops.Retrieval

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("rankByScore: descending score, id breaks exact ties, 1-based") {
    val ranked = Retrieval.rankByScore(
      Seq((30L, 0.5), (10L, 0.9), (20L, 0.5)).toDF("id", "s"),
      "id", "s", "rk").orderBy("rk")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ranked === Seq((10L, 1L), (20L, 2L), (30L, 3L)))
  }

  test("rrfFuse: hand-computed fusion, absent leg contributes zero") {
    // lex ranks: a=1 b=2 c=3 ; sem ranks: b=1 d=2
    val lex = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("id", "lex_rank")
    val sem = Seq(("b", 1L), ("d", 2L)).toDF("id", "sem_rank")
    val out = Retrieval.rrfFuse(Seq(lex -> "lex_rank", sem -> "sem_rank"),
        "id", k = 10, c = 60)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        r.getDouble(3)))
    // b: 1/62 + 1/61 = 0.032524...; a: 1/61 = 0.016393; d: 1/62 = 0.016129
    assert(out.map(_._1).toSeq === Seq("b", "a", "d", "c"),
      s"fused order wrong: ${out.mkString(",")}")
    val byId = out.map(t => t._1 -> t).toMap
    assert(byId("b") === (("b", 2L, 1L, math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6)))
    assert(byId("a")._3 === -1L, "doc absent from the sem leg keeps a null rank")
    assert(byId("a")._4 === math.rint(1.0 / 61 * 1e6) / 1e6)
  }

  test("rrfFuse: k truncates on the fused score with id tie-break") {
    val l1 = Seq(("x", 1L), ("y", 2L)).toDF("id", "r1")
    val l2 = Seq(("y", 1L), ("x", 2L)).toDF("id", "r2")
    // x and y tie exactly (1/61 + 1/62 both); id decides, k=1 keeps x
    val out = Retrieval.rrfFuse(Seq(l1 -> "r1", l2 -> "r2"), "id", k = 1)
      .collect()
    assert(out.length === 1 && out(0).getString(0) === "x")
  }

  test("rankEval: recall and reciprocal rank, hand-computed") {
    // q=1: ann found 2 of 3 truth ids; true top-1 (id 100) sits at ann rank 2
    // q=2: ann found none; rr = 0
    val exact = Seq((1L, 100L, 1), (1L, 101L, 2), (1L, 102L, 3),
                    (2L, 200L, 1), (2L, 201L, 2), (2L, 202L, 3))
      .toDF("q", "n_id", "rn")
    val ann = Seq((1L, 103L, 1), (1L, 100L, 2), (1L, 102L, 3),
                  (2L, 300L, 1), (2L, 301L, 2), (2L, 302L, 3))
      .toDF("q", "n_id", "rn")
    val out = Retrieval.rankEval(ann, exact, "q", "n_id", "rn", k = 3)
      .orderBy("q")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out(0) === ((1L, 0.666667, 0.5)))
    assert(out(1) === ((2L, 0.0, 0.0)))
  }

  test("rankEval: perfect index scores recall 1.0, rr 1.0") {
    val exact = Seq((1L, 10L, 1), (1L, 11L, 2)).toDF("q", "n_id", "rn")
    val out = Retrieval.rankEval(exact, exact, "q", "n_id", "rn", k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq === Seq((1L, 1.0, 1.0)))
  }
}
