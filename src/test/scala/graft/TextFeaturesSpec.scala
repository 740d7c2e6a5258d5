package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

class TextFeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("tfidfTopK: rare terms outrank common ones, ties break on term") {
    // 'shared' appears in all 4 docs (idf = ln(5/5) = 0 → never top),
    // 'rare' only in doc 1 (idf = ln(5/2)), tf boosts repeated terms
    val docs = Seq(
      (1L, "shared rare rare alpha"),
      (2L, "shared alpha beta beta"),
      (3L, "shared beta"),
      (4L, "shared gamma")
    ).toDF("doc_id", "text")
    val out = TextOps.tfidfTopK(docs, "doc_id", "text", k = 2)
      .select("doc_id", "term", "tf", "df_cnt", "score", "rk")
      .as[(Long, String, Long, Long, Double, Long)]
      .collect().sortBy(r => (r._1, r._6))

    val d1 = out.filter(_._1 == 1L)
    assert(d1.map(_._2).toSeq === Seq("rare", "alpha"))
    assert(d1.head._3 === 2L && d1.head._4 === 1L)  // tf=2, df=1
    assert(math.abs(d1.head._5 - 2.0 * math.log(5.0 / 2.0)) < 1e-6)

    // doc 3: beta (df 2) outranks shared (idf 0); exactly k rows per doc
    val d3 = out.filter(_._1 == 3L)
    assert(d3.map(_._2).toSeq === Seq("beta", "shared"))
    assert(out.groupBy(_._1).forall(_._2.length == 2))

    // score=0 group (idf=0 terms, same tf): rank ties resolve by term asc
    val d4 = out.filter(_._1 == 4L)
    assert(d4.map(_._2).toSeq === Seq("gamma", "shared"))
  }

  test("tfidfTopK: k larger than vocabulary returns all terms ranked") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    val out = TextOps.tfidfTopK(docs, "doc_id", "text", k = 10)
    assert(out.count() === 2)
  }
}
