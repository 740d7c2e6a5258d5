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

  test("bigramLmScore: corpus transition probabilities, micro-nat quantized") {
    // c1(a·) = 3; every transition has P = 1/3 → score ln(1/3) for both docs
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "solo")).toDF("doc_id", "text")
    val out = TextOps.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L))   // <2-token doc has no score
    assert(out.map(_._2).toSeq === Seq(2L, 1L))
    out.foreach(r => assert(math.abs(r._3 - math.log(1.0 / 3)) < 1e-5))
  }

  test("bigramLmScore: fluent (frequent) transitions outscore rare ones") {
    val docs = Seq((1L, "x y x y x y"), (2L, "x z")).toDF("doc_id", "text")
    val out = TextOps.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect()
    // doc1: 3×P(y|x)=3/4 + 2×P(x|y)=1 → avg ≈ −0.173; doc2: P(z|x)=1/4 → −1.386
    assert(out(0)._3 > out(1)._3)
    assert(math.abs(out(0)._3 - 3 * math.log(0.75) / 5) < 1e-5)
    assert(math.abs(out(1)._3 - math.log(0.25)) < 1e-5)
  }

  test("normalizeText: control strip, zero-width strip, whitespace collapse") {
    val messy = Seq(
      (1L, "  hello\t\tworld \n next\r\nline  "),
      (2L, "zero​width﻿gone"),
      (3L, "ctrlcharsout"),
      (4L, "already clean"),
      (5L, "UPPER Case Kept")
    ).toDF("doc_id", "text")
    val got = messy.select(col("doc_id"),
        TextOps.normalizeText(col("text")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "hello world next line")
    assert(got(2L) === "zerowidthgone")
    assert(got(3L) === "ctrlcharsout")
    assert(got(4L) === "already clean")
    assert(got(5L) === "UPPER Case Kept", "case must be preserved")
  }

  test("boilerplateScore: shared grams flag, unique docs score zero, short docs survive") {
    // srcA: docs 1,2 identical (both 3-grams shared at df=2 > 0.5*3), doc 3
    // disjoint; srcB: doc 4 alone (df can never exceed 0.5*1); doc 5 too
    // short for any 3-gram
    val docs = Seq(
      (1L, "a b c d", "srcA"),
      (2L, "a b c d", "srcA"),
      (3L, "x y z w", "srcA"),
      (4L, "a b c d", "srcB"),
      (5L, "hi", "srcB")
    ).toDF("doc_id", "text", "source")
    val got = graft.ops.TextOps.boilerplateScore(docs, "doc_id", "text",
        "source", n = 3, dfFrac = 0.5)
      .orderBy("doc_id").collect()
    def row(i: Int) = (got(i).getLong(1), got(i).getLong(2),
      if (got(i).isNullAt(3)) None else Some(got(i).getDouble(3)))
    assert(row(0) === ((2L, 2L, Some(1.0))), "dup doc: all grams are furniture")
    assert(row(1) === ((2L, 2L, Some(1.0))))
    assert(row(2) === ((2L, 0L, Some(0.0))), "unique doc: zero boilerplate")
    assert(row(3) === ((2L, 0L, Some(0.0))), "sole doc in group never flags")
    assert(row(4) === ((0L, 0L, None)), "sub-n doc: zero grams, null fraction")
  }

  test("searchTopK: ranking, no-match exclusion, k cut, doc-id tie-break") {
    val docs = Seq(
      (1L, "spark spark spark"),      // tf=3 on the only query term it has
      (2L, "spark join other words"), // two terms, lower tf each
      (3L, "nothing relevant here"),  // no query term: not a result
      (4L, "spark spark spark"),      // exact tie with doc 1 -> id order
      (5L, "join join join join")
    ).toDF("doc_id", "text")
    assert(graft.ops.TextOps.searchTopK(docs, "doc_id", "text",
      Seq("spark", "join"), k = 3).count() === 3, "k cut applies")
    val got = graft.ops.TextOps.searchTopK(docs, "doc_id", "text",
        Seq("spark", "join"), k = 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.length === 4, "only 4 docs match any term")
    assert(!got.map(_._1).contains(3L), "no-match doc is not a result")
    val ids = got.map(_._1)
    assert(ids.indexOf(4L) === ids.indexOf(1L) + 1,
      s"exact score ties break by doc id, saw ${got.toSeq}")
    assert(got.map(_._2).toSeq === got.map(_._2).sorted.reverse.toSeq,
      "results descend by score")
    // scores agree with the audit-style full scorer on the same corpus
    val full = graft.ops.TextOps.bm25(docs, "doc_id", "text",
        Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (id, s) => assert(s === full(id),
      s"retrieval score for doc $id must match bm25's") }
  }

  test("pmiBigrams: collocations outrank chance pairs, minCount gates the tail") {
    import spark.implicits._
    // "new york" always co-occurs (PMI high); "the the" pairs arise from
    // independent frequent tokens (PMI ~ 0); "rare gem" appears once
    val docs = Seq(
      (1L, "new york is big and the city of new york is old"),
      (2L, "the people of new york like the parks of the city"),
      (3L, "rare gem")
    ).toDF("doc_id", "text")
    val all = graft.ops.TextOps.pmiBigrams(docs, "doc_id", "text",
        minCount = 1L, topK = 1000)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val (nyCount, nyPmi) = all(("new", "york"))
    assert(nyCount === 3L)
    // hand-computed: c12=3, c1(new)=3, cr(york)=3, N=22 -> ln(3*22/9)
    assert(nyPmi === math.round(math.log(3.0 * 22 / 9) * 1e6))
    assert(nyPmi > all(("of", "the"))._2,
      "a true collocation outranks a chance pairing of frequent tokens")
    val gated = graft.ops.TextOps.pmiBigrams(docs, "doc_id", "text",
        minCount = 2L, topK = 1000)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(!gated.contains(("rare", "gem")), "minCount drops hapax pairs")
    assert(gated.contains(("new", "york")))
  }

  test("charEntropy: hand-computed nats via the micro-unit path") {
    import spark.implicits._
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val docs = Seq((1L, "aab"), (2L, "ab"), (3L, "aaaa")).toDF("doc_id", "text")
    val out = graft.ops.TextOps.charEntropy(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // doc 1: counts a=2 b=1; t_u = round(2·ln2·1e6) = 1386294
    assert(out(0) === ((1L, 3L, r6(math.log(3.0) - 1386294.0 / 1e6 / 3))))
    // doc 2: uniform two chars -> exactly ln 2
    assert(out(1) === ((2L, 2L, r6(math.log(2.0)))))
    // doc 3: single repeated char -> zero entropy (after quantization)
    assert(out(2)._3 === 0.0)
  }

  test("compressionSignals: repetitive text compresses, high-entropy text doesn't") {
    import spark.implicits._
    val repetitive = ("lorem ipsum " * 60).trim
    val random = new scala.util.Random(42)
    val noise = Array.fill(720)((random.nextInt(94) + 33).toChar).mkString
    val docs = Seq((1L, repetitive), (2L, noise)).toDF("doc_id", "text")
    val out = graft.ops.TextOps.compressionSignals(docs, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getDouble(3)))
    assert(out(0)._4 < 0.15,
      s"repeated phrase must compress hard, got ${out(0)}")
    assert(out(1)._4 > 0.7,
      s"printable noise must stay near-incompressible, got ${out(1)}")
    assert(out.forall(t => t._3 > 0 && t._2 > 0))
    // codegen and interpreted paths agree (same JVM Deflater)
    val again = graft.ops.TextOps.compressionSignals(docs.repartition(3),
      "doc_id", "text").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(again.map(_._2).toSeq === out.map(_._4).toSeq)
  }

  test("winnowing: the match-length guarantee the mod-p sieve lacks") {
    // Schleimer et al.: any shared substring of length >= w + k - 1 must
    // yield >= 1 SHARED selected fingerprint. Randomized adversarial
    // check: random docs with a planted common substring of exactly the
    // guarantee length at random offsets
    val k = 8; val w = 8
    val rnd = new scala.util.Random(7)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val planted = randStr(w + k - 1)
    val docs = (1L to 20L).map { i =>
      val pre = randStr(rnd.nextInt(40))
      val post = randStr(rnd.nextInt(40))
      (i, pre + planted + post)
    }.toDF("doc_id", "text")
    val sel = graft.ops.TextOps.winnowedFingerprints(docs, "doc_id", "text", k, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val common = sel.values.reduce(_ intersect _)
    assert(common.nonEmpty,
      "every doc pair shares the planted substring at guarantee length — " +
        "the winnowed sets must share a fingerprint")
    // a doc shorter than one window still yields its global-min fingerprint
    val tiny = Seq((1L, "abcdefghij")).toDF("doc_id", "text") // 3 kgrams < w
    assert(graft.ops.TextOps.winnowedFingerprints(tiny, "doc_id", "text", k, w)
      .count() === 1L)
    // and shorter than k yields nothing
    val sub = Seq((1L, "abc")).toDF("doc_id", "text")
    assert(graft.ops.TextOps.winnowedFingerprints(sub, "doc_id", "text", k, w)
      .count() === 0L)
  }

  test("winnow_min deque == the naive slice/array_min comprehension on random input") {
    // the O(n) kernel must select the IDENTICAL set as the O(n·w)
    // reference comprehension (the DuckDB twin's shape) — including
    // tie-heavy inputs where many windows share minima
    val k = 8; val w = 8
    val rnd = new scala.util.Random(13)
    val docs = (1L to 30L).map { i =>
      val alpha = if (i % 2 == 0) 3 else 26 // half tie-heavy, half diverse
      (i, (1 to rnd.nextInt(200)).map(_ => ('a' + rnd.nextInt(alpha)).toChar).mkString)
    }.toDF("doc_id", "text")
    val h = graft.functions.rolling_kgrams(col("text"), k)
    val n = size(h)
    val naive = when(n >= w,
        array_distinct(transform(sequence(lit(0), n - w),
          i => array_min(slice(h, i + 1, lit(w))))))
      .otherwise(when(n > 0, array(array_min(h)))
        .otherwise(array().cast("array<long>")))
    val got = docs.select(col("doc_id"),
        graft.functions.winnow_min(h, w).as("fast"), naive.as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1).toSet === r.getSeq[Long](2).toSet,
        s"doc ${r.getLong(0)}: deque and comprehension must select the same set")
    }
  }

  test("htmlExtract: script subtrees vanish, tags become boundaries, entities single-decode") {
    import spark.implicits._
    val cases = Seq(
      // multiline script WITH markup-looking code inside; style block too
      (1L, "<html><head><style>p { color: red; }</style>" +
        "<script>\nif (a < b && c > d) { f(\"<p>\"); }\n</script></head>" +
        "<body><p>Hello</p><p>world</p></body></html>",
        "Hello world"),
      // tag boundary must be a WORD boundary, never a fusion
      (2L, "<p>alpha</p><p>beta</p>", "alpha beta"),
      // entity decoding incl. the double-encoded form: one decode only
      (3L, "A &amp; B, 5 &lt; 6, say &quot;hi&quot;, it&#39;s" +
        " &nbsp;spaced, literal &amp;lt;tag&amp;gt;",
        "A & B, 5 < 6, say \"hi\", it's spaced, literal &lt;tag&gt;"),
      // comments drop, attributes don't leak, whitespace collapses
      (4L, "  <div class=\"x\" data-v='1'>\n  kept\n  </div> <!-- not me --> ",
        "kept"),
      // plain text passes through untouched (modulo collapse)
      (5L, "no markup  here", "no markup here"),
      // cross-match trap #1: a style block whose body contains
      // </script> must die as ONE style block — nothing leaks (the old
      // combined alternation terminated at </script> and leaked "leak")
      (6L, "<style>p{color:red}</script>leak</style><p>kept</p>", "kept"),
      // cross-match trap #2 (the round-13 review find): a literal
      // <script> token INSIDE a style body must not hijack the block —
      // two sequential per-tag passes consumed from it to the real
      // </script>, deleting the prose in between
      (8L, "<style>.a{content:\"<script>\"}</style><p>Hello</p>" +
        "<script>var x;</script><p>more</p>", "Hello more"),
      // numeric character references, all four fates: decimal + hex
      // decode, C0 control and surrogate stay literal, and BOTH
      // double-encoded forms single-decode (no regex ordering does this)
      (7L, "<p>&#65;&#x42; &#8212;&#169; &#7; &#xD800; &#38;amp; &amp;#65;" +
        " &#1114112; &#x110000; &#; bare&#65 tail</p>",
        "AB —© &#7; &#xD800; &amp; &#65;" +
          " &#1114112; &#x110000; &#; bare&#65 tail"))
    val got = cases.map(c => (c._1, c._2)).toDF("id", "t")
      .select(col("id"), graft.ops.TextOps.htmlExtract(col("t")).as("c"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    cases.foreach { case (i, _, want) =>
      assert(got(i) === want, s"case $i: got '${got(i)}'")
    }
    // audit columns: tag count + the had_html flag
    val d = graft.ops.TextOps.htmlExtractDocs(
        Seq((1L, "<p>x</p>"), (2L, "plain")).toDF("id", "t"), "id", "t")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(d(1L) === ((2L, true)) && d(2L) === ((0L, false)))
  }
}
