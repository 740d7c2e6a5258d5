package graft

import org.apache.spark.sql.functions._

import graft.engine.CacheScope
import graft.ops.Bpe

/** [[graft.ops.Bpe]] — hand-computed merges, the BpeMerge fold's edge
  * cases, and the trainLocal ≡ train production-path equivalence.
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("bpe_merge expression: leftmost non-overlapping fold") {
    import graft.functions.bpe_merge
    val df = Seq(
      (1L, Seq("a", "a", "a")),          // (a,a): [aa, a] not [aa, aa]
      (2L, Seq("a", "b", "a", "b")),     // (a,b) elsewhere: untouched here
      (3L, Seq("x", "a", "a", "a", "a")) // two non-overlapping merges
    ).toDF("id", "syms")
    val out = df.select(col("id"), bpe_merge(col("syms"), lit("a"), lit("a")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq("aa", "a"))
    assert(out(2L) === Seq("a", "b", "a", "b"))
    assert(out(3L) === Seq("x", "aa", "aa"))
    // merged symbol is ONE element: 'aa' then trailing 'a' must not re-merge
    val out2 = df.select(col("id"),
        bpe_merge(bpe_merge(col("syms"), lit("a"), lit("a")),
          lit("aa"), lit("a")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out2(1L) === Seq("aaa"))
  }

  test("hand-computed training on a 3-word corpus") {
    // corpus: "low low lower" → vocab: low×2, lower×1
    // syms: [l,o,w,</w>]×2, [l,o,w,e,r,</w>]×1
    // step0 pairs: (l,o)=3 (o,w)=3 (w,</w>)=2 (w,e)=1 (e,r)=1 (r,</w>)=1
    //   winner: tie 3 → lex: (l,o)
    // step1: [lo,w,</w>]×2, [lo,w,e,r,</w>]: (lo,w)=3 wins
    // step2: [low,</w>]×2 [low,e,r,</w>]: (low,</w>)=2 wins
    val df = Seq("low low lower").toDF("text")
    val m = Bpe.train(df, "text", 3, new CacheScope)
      .orderBy("step").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq(
      (0, "l", "o", 3L), (1, "lo", "w", 3L), (2, "low", "</w>", 2L)))
  }

  test("trainLocal ≡ train on real testdata (production-path equivalence)") {
    val docs = engine.Tables.documents(spark, "/root/testdata/sf0.001").limit(120)
    val a = Bpe.train(docs, "text", 6, new CacheScope).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val b = Bpe.trainLocal(docs, "text", 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(a === b, "driver-side loop must replay the distributed iteration exactly")
  }

  test("trainLocal maxVocab: capped ≡ uncapped when the vocab fits the cap") {
    val docs = engine.Tables.documents(spark, "/root/testdata/sf0.001").limit(120)
    val nWords = Bpe.wordVocab(docs, "text").count()
    val roomy = Bpe.trainLocal(docs, "text", 6, maxVocab = nWords.toInt + 10)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val default = Bpe.trainLocal(docs, "text", 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(roomy === default, "a cap above the vocab size must be a no-op")
  }

  test("trainLocal maxVocab: an exercised cap keeps the frequency head") {
    // freq: aa×4, bb×2, cc×1 — cap 2 keeps {aa, bb}; merges then come from
    // the head only, and driver state never exceeds the cap
    val df = Seq("aa aa aa aa bb bb cc").toDF("text")
    val m = Bpe.trainLocal(df, "text", 1, maxVocab = 2)
      .collect().map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    // pairs over {aa×4, bb×2}: (a,a)=4 (a,</w>)=4 (b,b)=2 (b,</w>)=2 —
    // cc's (c,c)/(c,</w>) must NOT appear; tie at 4 breaks lexicographically
    // and "</w>" < "a" in codepoint order, so (a,</w>)=4 wins
    assert(m === Seq(("a", "</w>", 4L)),
      "the cut must drop the tail word's pairs before the merge loop")
  }

  test("unicode symbols are codepoint-wise in both paths") {
    val df = Seq("日本 日本 日本語").toDF("text")
    val a = Bpe.train(df, "text", 2, new CacheScope).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    val b = Bpe.trainLocal(df, "text", 2).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(a === b)
    assert(a.head === (("日", "本", 3L)), "codepoints, not bytes or chars")
  }

  test("bpe_apply ≡ unrolled replay of bpe_merge on real testdata") {
    import graft.functions.{bpe_apply, bpe_merge}
    val docs = engine.Tables.documents(spark, "/root/testdata/sf0.001").limit(120)
    val merges = Bpe.trainLocal(docs, "text", 8).orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val words = docs
      .select(explode(graft.ops.TextOps.tokens(
        graft.ops.TextOps.normalizeText(col("text")))).as("word"))
      .filter(length(col("word")) > 0)
      .select(Bpe.initialSymbols(col("word")).as("syms"))
    val replayed = merges.foldLeft(col("syms")) { case (c, (l, r)) =>
      bpe_merge(c, lit(l), lit(r))
    }
    val diff = words.select(
        replayed.as("a"),
        bpe_apply(col("syms"), typedLit(merges.map(_._1)),
          typedLit(merges.map(_._2))).as("b"))
      .filter(not(col("a") === col("b")))
    assert(diff.count() === 0L,
      "priority kernel must equal rank-order replay on every word")
  }

  test("bpe_apply skips destroyed lower-rank pairs exactly like replay") {
    import graft.functions.bpe_apply
    // table: rank0 (a,b); rank1 (ab,c); rank2 (b,c)
    // "abc": rank0 → [ab, c]; rank1 → [abc]; rank2 pair (b,c) was destroyed
    // "xbc": rank0/1 absent; rank2 → [x, bc]
    val df = Seq(
      (1L, Seq("a", "b", "c", "</w>")),
      (2L, Seq("x", "b", "c", "</w>"))).toDF("id", "syms")
    val out = df.select(col("id"),
        bpe_apply(col("syms"), typedLit(Seq("a", "ab", "b")),
          typedLit(Seq("b", "c", "c"))).as("m"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(out(1L) === Seq("abc", "</w>"))
    assert(out(2L) === Seq("x", "bc", "</w>"))
  }

  test("vocabIds: base symbols sorted, merge outputs by rank, dup spellings collapse") {
    // corpus chars: a,b,c + </w>; merges (a,b)→ab, (ab,c)→abc, (c,a)→ca
    // and a DUPLICATE spelling: (a,bc) would also spell 'abc' — first wins
    val df = Seq("abc ca abc").toDF("text")
    val ids = Bpe.vocabIds(df, "text",
        Seq(("a", "b"), ("ab", "c"), ("a", "bc"), ("c", "a")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(ids === Map(
      "</w>" -> 0L, "a" -> 1L, "b" -> 2L, "c" -> 3L,
      "ab" -> 4L, "abc" -> 5L, "ca" -> 6L))
  }

  test("early exhaustion: single-char words stop after the only merge") {
    // "a b" → vocab a×1 b×1; syms [a,</w>],[b,</w>] — pairs (a,</w>)=1,(b,</w>)=1
    // step0 winner (a,</w>); step1 only (b,</w>); step2 nothing mergeable…
    // after both merge into single symbols there are NO pairs → stop
    val df = Seq("a b").toDF("text")
    val m = Bpe.train(df, "text", 10, new CacheScope).collect()
    assert(m.length === 2)
  }

  test("trainLocalWithStats: exhaustion is reported, not silently under-delivered") {
    // "ab" alone supplies exactly 2 merges ((a,b) then (ab,</w>)); asking
    // for 10 exhausts the pair supply — the caller must see that the
    // learned table is smaller than the requested budget
    val df = Seq("ab ab").toDF("text")
    val (m, stats) = Bpe.trainLocalWithStats(df, "text", nMerges = 10)
    assert(stats.exhausted, "supply ran dry before the budget")
    assert(stats.mergesLearned === 2 && m.count() === 2L)
    // a budget the corpus can fill is NOT exhaustion
    val (_, s2) = Bpe.trainLocalWithStats(df, "text", nMerges = 1)
    assert(!s2.exhausted && s2.mergesLearned === 1)
  }
}
