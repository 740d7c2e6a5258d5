package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE fixture: low×5, lower×2, lowest×1
  private lazy val words =
    Seq(("low", 5L), ("lower", 2L), ("lowest", 1L)).toDF("word", "cnt")

  test("train learns the classic merge sequence with deterministic ties") {
    val merges = Bpe.train(words, "word", "cnt", numMerges = 10)
    // pair weights round 0: (l,o)=8, (o,w)=8, (w,e)=3, (e,r)=2 — tie on 8
    // breaks lexicographically to (l,o); then (lo,w)=8, (low,e)=3, (lowe,r)=2;
    // remaining pairs are weight 1 < minPairCount → early stop
    assert(merges.map(m => (m.left, m.right, m.weight)) === Seq(
      ("l", "o", 8L), ("lo", "w", 8L), ("low", "e", 3L), ("lowe", "r", 2L)))
    assert(merges.map(_.rank) === Seq(0, 1, 2, 3))
  }

  test("segment applies merges greedily; token concat reproduces the word") {
    val merges = Bpe.train(words, "word", "cnt", numMerges = 10)
    val out = Bpe.segment(Seq("lowest", "slower", "low").toDF("word"),
        "word", merges)
      .select(col("word"), col("tokens"))
      .as[(String, Seq[String])].collect().toMap
    assert(out("lowest") === Seq("lowe", "s", "t"))
    assert(out("slower") === Seq("s", "lower"))
    assert(out("low") === Seq("low"))
    out.foreach { case (w, ts) => assert(ts.mkString === w) }
  }

  test("train stops when no pair clears minPairCount") {
    val singletons = Seq(("ab", 1L), ("cd", 1L)).toDF("word", "cnt")
    assert(Bpe.train(singletons, "word", "cnt", numMerges = 5).isEmpty)
  }

  test("repeated-symbol merges apply left-to-right without overlap") {
    val rep = Seq(("aaaa", 3L)).toDF("word", "cnt")
    val merges = Bpe.train(rep, "word", "cnt", numMerges = 1)
    assert(merges.map(m => (m.left, m.right)) === Seq(("a", "a")))
    val out = Bpe.segment(Seq("aaaaa").toDF("word"), "word", merges)
      .select("tokens").as[Seq[String]].head()
    assert(out === Seq("aa", "aa", "a")) // greedy non-overlapping
  }
}
