package graft

import org.apache.spark.sql.functions._

import graft.ops.{Curation, TextOps}

/** Unit specs for the curation operators (stratified sampling, token packing,
  * composite quality filter) and BM25 scoring — the oracle checks the declared
  * queries end-to-end; these pin the operator semantics on hand-built fixtures
  * with independently recomputed expectations.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // ---- repetition signals -----------------------------------------------

  test("repetition: uniform doc clean; repeated token and 2-gram loop flagged") {
    val df = Seq(
      (1L, "a b c d e"),       // all distinct: top 1/5, no dup 2-grams
      (2L, "x x x x y"),       // top_tok_frac 4/5
      (3L, "a b a b a b"),     // 2-grams: ab ba ab ba ab → 2 distinct of 5
      (4L, "solo")             // single token: zero 2-grams, frac 0
    ).toDF("doc_id", "text")
    val got = TextOps.repetitionSignals(df, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_toks", "top_tok_frac", "dup_2gram_frac", "repetitive")
      .as[(Long, Int, Double, Double, Boolean)].collect()
    assert(got(0) === ((1L, 5, 0.2, 0.0, false))) // 0.2 is not > 0.2
    assert(got(1) === ((2L, 5, 0.8, 0.5, true))) // grams xx xx xx xy → 2 of 4
    assert(got(2) === ((3L, 6, 0.5, 0.6, true)))
    assert(got(3) === ((4L, 1, 1.0, 0.0, true))) // degenerate: one token is 100%
  }

  // ---- split assignment ---------------------------------------------------

  test("splitAssign: total, deterministic, and consistent with stable_bucket") {
    val df = (0L until 200L).toDF("doc_id")
    val splits = Seq("train" -> 90, "val" -> 5, "test" -> 5)
    val got = Curation.splitAssign(df, "doc_id", splits)
      .select(col("doc_id"),
        graft.functions.stable_bucket(col("doc_id").cast("string"), 100).as("b"),
        col("split"))
      .as[(Long, Long, String)].collect()
    assert(got.length === 200)
    got.foreach { case (_, b, s) =>
      val want = if (b < 90) "train" else if (b < 95) "val" else "test"
      assert(s === want)
    }
    // deterministic across evaluations
    val again = Curation.splitAssign(df, "doc_id", splits)
      .select("doc_id", "split").as[(Long, String)].collect()
    assert(again.toSeq === got.map(g => (g._1, g._3)).toSeq)
  }

  test("splitAssign: zero-weight split never matches; weights must sum to 100") {
    val df = (0L until 100L).toDF("doc_id")
    val got = Curation.splitAssign(df, "doc_id",
        Seq("train" -> 100, "val" -> 0))
      .select("split").as[String].collect()
    assert(got.forall(_ == "train"))
    assertThrows[IllegalArgumentException] {
      Curation.splitAssign(df, "doc_id", Seq("a" -> 50, "b" -> 40))
    }
  }

  // ---- BM25 -------------------------------------------------------------

  test("bm25: all-terms doc outscores partial match; no-match doc scores 0") {
    val df = Seq(
      (1L, "spark shuffle join"),
      (2L, "spark spark spark"),
      (3L, "cat dog bird")).toDF("doc_id", "text")
    val got = TextOps.bm25(df, "doc_id", "text", Seq("spark", "shuffle"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25"))
      .toMap

    // independent recompute: N=3, avgdl=3, df(spark)=2, df(shuffle)=1
    val k1 = 1.2; val b = 0.75
    def idf(dfT: Double) = math.log((3.0 - dfT + 0.5) / (dfT + 0.5) + 1.0)
    def term(tf: Double, dfT: Double, dl: Double) =
      if (tf == 0) 0.0
      else idf(dfT) * (tf * (k1 + 1.0)) /
        (tf + k1 * ((1.0 - b) + b * (dl / 3.0)))
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    assert(got(1L) === r6(term(1, 2, 3) + term(1, 1, 3)))
    assert(got(2L) === r6(term(3, 2, 3)))
    assert(got(3L) === 0.0)
    assert(got(1L) > got(2L)) // both query terms beat one repeated term
  }

  test("bm25: idf stays positive when a term is in more than half the corpus") {
    // "the" appears in 3 of 4 docs (df > N/2): classic BM25 idf would go
    // negative; the Lucene-style +1 keeps it positive, so a match must still
    // score strictly above a non-match.
    val df = Seq(
      (1L, "the cat"), (2L, "the dog"), (3L, "the bird"), (4L, "fish fin"))
      .toDF("doc_id", "text")
    val got = TextOps.bm25(df, "doc_id", "text", Seq("the"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("bm25"))
      .toMap
    assert(got(1L) > 0.0)
    assert(got(4L) === 0.0)
  }

  // ---- Stratified hash sampling ----------------------------------------

  test("stratified sample: rate-0 stratum drops all, rate-100 keeps all, deterministic") {
    val df = (1L to 200L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("doc_id", "stratum")
    val run1 = Curation.stratifiedHashSample(df, "doc_id", "stratum",
      Map("a" -> 0, "b" -> 100), defaultRate = 50)
      .select("doc_id").as[Long].collect().sorted
    assert(run1.forall(_ % 2 == 1)) // every "a" row gone
    assert(run1.length === 100)     // every "b" row kept

    // partial rate is deterministic across reruns (hash, not RNG)
    val p1 = Curation.stratifiedHashSample(df, "doc_id", "stratum",
      Map.empty, defaultRate = 37).select("doc_id").as[Long].collect().sorted
    val p2 = Curation.stratifiedHashSample(df, "doc_id", "stratum",
      Map.empty, defaultRate = 37).select("doc_id").as[Long].collect().sorted
    assert(p1.toSeq === p2.toSeq)
    assert(p1.nonEmpty && p1.length < 200) // 37% keeps a real subset
  }

  // ---- Concat-and-chunk token packing ----------------------------------

  test("token packing: doc spanning a chunk cut lands in both chunks") {
    // one shard, docs of 4/5/3 tokens, chunks of 6:
    //   d1 [0,4)  → chunk 0 only
    //   d2 [4,9)  → crosses the cut at 6: chunks 0..1
    //   d3 [9,12) → chunk 1 only
    val df = Seq((0, 1L, 4), (0, 2L, 5), (0, 3L, 3)).toDF("shard", "pos", "toks")
    val got = Curation.concatChunkPacking(df, "shard", "pos", col("toks"), 6)
      .orderBy("pos")
      .select("pos", "tok_start", "tok_end", "first_chunk", "last_chunk")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq((0L, 4L, 0L, 0L), (4L, 9L, 0L, 1L), (9L, 12L, 1L, 1L)))
  }

  test("token packing: zero-token doc has empty interval and null last_chunk") {
    val df = Seq((0, 1L, 2), (0, 2L, 0), (0, 3L, 2)).toDF("shard", "pos", "toks")
    val got = Curation.concatChunkPacking(df, "shard", "pos", col("toks"), 4)
      .orderBy("pos").collect()
    val empty = got(1)
    assert(empty.getAs[Long]("tok_start") === empty.getAs[Long]("tok_end"))
    assert(empty.isNullAt(empty.fieldIndex("last_chunk")))
    // and the neighbours are unaffected: d3 starts where d1 ended
    assert(got(2).getAs[Long]("tok_start") === 2L)
  }

  test("token packing is shard-local: same order key restarts per shard") {
    val df = Seq((0, 1L, 3), (1, 1L, 3)).toDF("shard", "pos", "toks")
    val got = Curation.concatChunkPacking(df, "shard", "pos", col("toks"), 8)
      .select("tok_start").as[Long].collect()
    assert(got.toSeq === Seq(0L, 0L)) // both shards start at token 0
  }

  // ---- PII redaction ----------------------------------------------------

  test("pii redaction: counts fold with the rewrite — no type ever double-counts") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@test.org or visit https://x.io/a?u=a@b.co now"),
      (2L, "server 10.0.255.7 and call 555-123-4567 or +44 123 4567"),
      (3L, "nothing sensitive here"),
      (4L, "ssn 123-45-6789 card 4111111111111111 intl +4915123456789")
    ).toDF("doc_id", "text")
    val got = Curation.redactPii(df, "doc_id", "text").orderBy("doc_id").collect()

    // doc 1: the a@b.co inside the URL is swallowed by the URL stage, so
    // the email count (measured AFTER URL redaction) sees only the bare
    // one — counts and placeholders agree
    assert(got(0).getAs[Int]("n_urls") === 1)
    assert(got(0).getAs[Int]("n_emails") === 1)
    assert(got(0).getAs[String]("redacted") ===
      "mail me at [EMAIL] or visit [URL] now")

    // doc 2: ip + one standard phone; "+44 123 4567" fits neither shape
    assert(got(1).getAs[Int]("n_ips") === 1)
    assert(got(1).getAs[Int]("n_phones") === 1)
    assert(got(1).getAs[String]("redacted") ===
      "server [IP] and call [PHONE] or +44 123 4567")

    // doc 3 untouched
    assert(got(2).getAs[String]("redacted") === "nothing sensitive here")
    assert(Seq("n_urls", "n_emails", "n_ips", "n_ids", "n_cards", "n_phones")
      .forall(c => got(2).getAs[Int](c) === 0))

    // doc 4: the dashed SSN is an [ID] (never re-counted as a phone), the
    // 16-digit run a [CARD], the international number a [PHONE]
    assert(got(3).getAs[Int]("n_ids") === 1)
    assert(got(3).getAs[Int]("n_cards") === 1)
    assert(got(3).getAs[Int]("n_phones") === 1)
    assert(got(3).getAs[String]("redacted") ===
      "ssn [ID] card [CARD] intl [PHONE]")
  }

  // ---- Fingerprint overlap pairs ----------------------------------------

  test("fp overlap: shared substring pairs docs regardless of alignment; guard drops hot hashes") {
    val core = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq(
      (1L, core + " tail one"),
      (2L, "prefix shift " + core),   // same substring, different alignment
      (3L, "completely different words with no common runs at all here")
    ).toDF("doc_id", "text")
    val pairs = TextOps.fingerprintOverlapPairs(df, "doc_id", "text",
        k = 8, p = 4, minShared = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.toSeq === Seq((1L, 2L))) // content-anchored: alignment-free
    // a df cap of 1 drops every hash two docs share → no pairs survive
    val guarded = TextOps.fingerprintOverlapPairs(df, "doc_id", "text",
        k = 8, p = 4, minShared = 1, maxDocsPerHash = 1)
    assert(guarded.count() === 0L)
  }

  // ---- Mixture sampling -------------------------------------------------

  test("mixture sampling: rates from weights x budget / stratum tokens, capped at 1") {
    // stratum a: 100 tokens, weight .8, budget 50 → rate .4
    // stratum b: 10 tokens, weight .2, budget 50 → min(1, 10/10) = 1 → all kept
    val df = (1L to 10L).map(i => (i, "a", 10))
      .union((11L to 12L).map(i => (i, "b", 5))).toDF("doc_id", "lang", "n")
    val got = Curation.mixtureSample(df, "doc_id", "lang", col("n"),
        Map("a" -> 0.8, "b" -> 0.2), budgetTokens = 50L)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("lang"),
        r.getAs[Double]("rate"), r.getAs[Boolean]("keep")))
    assert(got.filter(_._2 == "a").forall(_._3 === 0.4))
    assert(got.filter(_._2 == "b").forall(g => g._3 === 1.0 && g._4))
    // membership is exactly the stable-bucket rule, hence deterministic
    val buckets = df.select(col("doc_id"),
        graft.functions.stable_bucket(col("doc_id").cast("string"), 10000).as("b"))
      .as[(Long, Long)].collect().toMap
    got.filter(_._2 == "a").foreach { g =>
      assert(g._4 === (buckets(g._1) < 4000), s"doc ${g._1}")
    }
    // unnormalized weights are rejected
    assertThrows[IllegalArgumentException] {
      Curation.mixtureSample(df, "doc_id", "lang", col("n"),
        Map("a" -> 0.8, "b" -> 0.5), 50L)
    }
  }

  // ---- Per-domain cap ---------------------------------------------------

  test("domain cap: keeps exactly N per domain, ranks restart per domain, hash-ordered") {
    val df = (1L to 5L).map(i => (i, "a")).toDF("doc_id", "source")
      .union(Seq((10L, "b"), (11L, "b")).toDF("doc_id", "source"))
    val got = Curation.domainCap(df, "doc_id", "source", maxDocs = 3)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
        r.getAs[Long]("cap_rank"), r.getAs[Boolean]("keep")))
    assert(got.count(g => g._2 == "a" && g._4) === 3)
    assert(got.filter(_._2 == "b").map(_._3).sorted.toSeq === Seq(1L, 2L)) // both kept
    assert(got.filter(_._2 == "a").map(_._3).sorted.toSeq === (1L to 5L))
    // rank order is the md5 order of the id string, not the id order
    val expectOrder = (1L to 5L).sortBy(i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(i.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    val byRank = got.filter(_._2 == "a").sortBy(_._3).map(_._1)
    assert(byRank.toSeq === expectOrder)
  }

  // ---- Sliding-window chunking ------------------------------------------

  test("chunking: overlap shared, final chunk clamps, short doc single chunk") {
    val df = Seq((1L, "a b c d e f g"), (2L, "x y")).toDF("doc_id", "text")
    val got = Curation.chunkDocs(df, "doc_id", "text", chunkTokens = 4, overlap = 2)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("chunk_idx"),
        r.getAs[Long]("chunk_start"), r.getAs[Long]("chunk_len")))
    // doc 1 (7 tokens, stride 2): starts 1,3,5,7 → lens 4,4,3,1
    assert(got.filter(_._1 == 1L).toSeq ===
      Seq((1L, 0L, 1L, 4L), (1L, 1L, 3L, 4L), (1L, 2L, 5L, 3L), (1L, 3L, 7L, 1L)))
    // doc 2 fits in one chunk
    assert(got.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 1L, 2L)))
    // chunk text digest is over the joined token slice
    val md5First = Curation.chunkDocs(df, "doc_id", "text", 4, 2)
      .filter(col("doc_id") === 1L && col("chunk_idx") === 0L)
      .select("chunk_md5").as[String].head()
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest("a b c d".getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(md5First === want)
  }

  test("chunking invariants: full token coverage, exact overlap, randomized") {
    val rnd = new scala.util.Random(7)
    val docs = (1L to 40L).map { i =>
      (i, Seq.fill(1 + rnd.nextInt(120))("w" + rnd.nextInt(50)).mkString(" "))
    }
    val chunkTokens = 16; val overlap = 5
    val got = Curation.chunkDocs(docs.toDF("doc_id", "text"), "doc_id", "text",
        chunkTokens, overlap)
      .select("doc_id", "chunk_idx", "chunk_start", "chunk_len")
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    docs.foreach { case (id, text) =>
      val n = text.split(" ").length
      val chunks = got(id)
      // every token position covered by at least one chunk
      val covered = chunks.flatMap(c => c._3 until (c._3 + c._4)).toSet
      assert(covered === (1L to n).toSet, s"doc $id coverage")
      // consecutive chunk starts step by exactly chunkTokens - overlap
      chunks.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._3 - a._3 === (chunkTokens - overlap).toLong)
        case _ =>
      }
      // chunks never exceed the configured size and never run past the doc
      chunks.foreach { c =>
        assert(c._4 <= chunkTokens.toLong)
        assert(c._3 + c._4 - 1 <= n.toLong)
      }
    }
  }

  // ---- n-gram vocabulary ------------------------------------------------

  test("vocab: every occurrence counts, ties break by gram text, topK cuts") {
    val df = Seq((1L, "a b a b c"), (2L, "a b z z")).toDF("doc_id", "text")
    val got = TextOps.ngramVocab(df, "text", n = 2, topK = 3)
      .as[(String, Long)].collect()
    // 2-grams: doc1 → "a b","b a","a b","b c"; doc2 → "a b","b z","z z"
    assert(got.toSeq === Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
    // short docs contribute nothing and don't crash
    val single = TextOps.ngramVocab(Seq((1L, "solo")).toDF("doc_id", "text"), "text", 2, 10)
    assert(single.count() === 0L)
  }

  // ---- C4-style quality filter -----------------------------------------

  test("classifier score: independent logistic recompute, punct noise demotes") {
    val df = Seq(
      (1L, "the cat and the dog is here today"),
      (2L, "the cat and the dog is here !!!! ,,,, ;;;;")).toDF("doc_id", "text")
    val w = Seq(0.8, -20.0, 5.0, -0.4); val b = -1.0
    val got = Curation.classifierScore(df, "doc_id", "text", w, b, minScore = 0.5)
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Double]("score"), r.getAs[Boolean]("keep")))

    // doc 1 by hand: 8 toks (stopwords the×2, and, is → 4), 33 chars, no punct
    val text1 = "the cat and the dog is here today"
    val n = 8.0
    val f = Seq(math.log(n + 1), 0.0, 4.0 / n, (text1.length - n + 1) / n)
    val z = f.zip(w).map { case (a, c) => a * c }.sum + b
    val expect = BigDecimal(1.0 / (1.0 + math.exp(-z)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0)._1 === expect)
    assert(got(0)._2 === (expect >= 0.5))
    // punctuation noise must strictly demote
    assert(got(1)._1 < got(0)._1)
  }

  test("quality filter: each bitmask bit fires in isolation") {
    val longText = Seq.fill(1001)("the").mkString(" ")
    val df = Seq(
      (0L, "the cat and dog is here"),         // all checks pass
      (1L, "the and is"),                       // 3 tokens < 5 → bit 1
      (2L, longText),                           // 1001 tokens > 1000 → bit 2
      (3L, "the cat and a dog is !!!! ,,,,"),   // punct-heavy → bit 4
      (4L, "cat dog bird fish mouse wolf")      // zero stopwords → bit 8
    ).toDF("doc_id", "text")
    val got = Curation.qualityFilter(df, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Int]("drop_reasons"), r.getAs[Boolean]("keep")))
    assert(got.toSeq === Seq((0, true), (1, false), (2, false), (4, false), (8, false)))
  }

  // ---- shard manifest ----------------------------------------------------

  test("shard manifest checksum is identical under any partitioning") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, s"s${i % 3}", s"tok$i text body"))
      .toDF("doc_id", "source", "text")
    def run(parts: Int) =
      Curation.shardManifest(df.repartition(parts), "source", "doc_id", "text")
        .select("source", "n_rows", "n_tokens", "xor_sig")
        .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val a = run(1)
    assert(a === run(13))
    assert(a.map(_._2).sum === 300L)
    assert(a.forall(_._3 == 100L * 3)) // 3 tokens per doc, 100 docs per shard
  }

  test("shard manifest detects a single-row content change") {
    import spark.implicits._
    val base = (1 to 50).map(i => (i.toLong, "s", s"text $i"))
    val changed = base.updated(24, (25L, "s", "text 25 CHANGED"))
    def sig(rows: Seq[(Long, String, String)]) =
      Curation.shardManifest(rows.toDF("doc_id", "source", "text"),
        "source", "doc_id", "text").select("xor_sig").as[Long].head()
    assert(sig(base) !== sig(changed))
  }

  // ---- priority (weighted) sampling --------------------------------------

  test("priority sample: deterministic, top-k per stratum, weight-monotone") {
    import spark.implicits._
    val df = (1 to 200).map(i => (i.toLong, s"s${i % 2}", i.toLong * 10))
      .toDF("id", "stratum", "w")
    def run() = Curation.prioritySample(df, "id", "stratum", col("w"), k = 5)
      .select("id", "stratum", "rk").as[(Long, String, Long)]
      .collect().sortBy(r => (r._2, r._3)).toSeq
    val a = run()
    assert(a === run()) // rerun → identical sample (no RNG)
    assert(a.count(_._2 == "s0") === 5 && a.count(_._2 == "s1") === 5)
    assert(a.groupBy(_._2).values.forall(_.map(_._3).sorted == Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("priority sample: a dominant weight is effectively always selected") {
    import spark.implicits._
    // one row carries ~all the weight: u >= 2^-21 bounds priority from below,
    // so w=10^12 beats any unit-weight row's max priority of ~2^21
    val df = ((1 to 100).map(i => (i.toLong, 1L)) :+ (999L, 1000000000000L))
      .toDF("id", "w").withColumn("stratum", lit("s"))
    val picked = Curation.prioritySample(df, "id", "stratum", col("w"), k = 1)
      .select("id").as[Long].head()
    assert(picked === 999L)
  }

  // ---- nucleus (top-p) token budget --------------------------------------

  test("top-p cap: stops at the budget boundary, never overshoots") {
    import spark.implicits._
    val df = (1 to 40).map(i => (i.toLong, s"d${i % 2}", 10L))
      .toDF("id", "domain", "toks")
    val out = Curation.topPByTokens(df, "id", "domain", col("toks"), p = 0.5)
    val byDomain = out.select("domain", "cum_tokens", "total_tokens", "keep")
      .as[(String, Long, Long, Boolean)].collect().groupBy(_._1)
    for ((_, rows) <- byDomain) {
      val total = rows.head._3
      val keptTokens = rows.filter(_._4).map(_ => 10L).sum
      assert(keptTokens <= (0.5 * total).toLong) // never overshoots the budget
      // kept set is exactly the prefix of the cum-token walk
      assert(rows.filter(_._4).map(_._2).max <= rows.filterNot(_._4).map(_._2).min)
    }
  }

  test("top-p cap: p=1 keeps everything") {
    import spark.implicits._
    val df = (1 to 10).map(i => (i.toLong, "d", i.toLong)).toDF("id", "domain", "toks")
    val out = Curation.topPByTokens(df, "id", "domain", col("toks"), p = 1.0)
    assert(out.filter(!col("keep")).count() === 0)
  }

  test("top-p cap: a domain whose first doc exceeds the budget still keeps it") {
    import spark.implicits._
    // nucleus semantics: the smallest prefix REACHING p — never zero docs
    val df = Seq((1L, "d", 90L), (2L, "d", 5L), (3L, "d", 5L))
      .toDF("id", "domain", "toks")
    val out = Curation.topPByTokens(df, "id", "domain", col("toks"), p = 0.5)
    assert(out.filter(col("keep")).count() === 1)
  }

  test("temperatureWeights: alpha=1 is identity, alpha->0 flattens, order kept") {
    val raw = Map("en" -> 0.8, "sw" -> 0.15, "yo" -> 0.05)
    val id = Curation.temperatureWeights(raw, alpha = 1.0)
    raw.foreach { case (k, v) => assert(math.abs(id(k) - v) < 1e-12) }
    val cool = Curation.temperatureWeights(raw, alpha = 0.3)
    assert(math.abs(cool.values.sum - 1.0) < 1e-12, "stays normalized")
    assert(cool("yo") > raw("yo") && cool("en") < raw("en"),
      "cooling boosts low-resource strata at the head's expense")
    assert(cool("en") > cool("sw") && cool("sw") > cool("yo"),
      "rescaling must never reorder strata")
    // the rescaled map feeds mixtureSample's normalization gate directly
    import spark.implicits._
    val docs = Seq((1L, "en", 100L), (2L, "sw", 100L), (3L, "yo", 100L))
      .toDF("id", "s", "toks")
    val sampled = Curation.mixtureSample(docs, "id", "s", col("toks"),
      cool, budgetTokens = 150L)
    assert(sampled.count() === 3)
  }

  test("leakageSafeSplit: near-dup clusters never straddle the split boundary") {
    val docs = (1L to 40L).map(i => Tuple1(i)).toDF("doc_id")
    // two clusters — {1,2,3} (chain) and {10,11} — plus singletons
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val out = Curation.leakageSafeSplit(docs, "doc_id", pairs,
        "doc_a", "doc_b", Seq("train" -> 50, "val" -> 25, "test" -> 25))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1), r.getString(2)))
    val byId = out.map(t => t._1 -> t).toMap
    assert(Seq(1L, 2L, 3L).map(byId(_)._3).distinct.size === 1,
      "a whole chain cluster lands on one side")
    assert(byId(10L)._3 === byId(11L)._3)
    assert(byId(1L)._2 === 1L && byId(3L)._2 === 1L && byId(11L)._2 === 10L)
    assert(byId(7L)._2 === -1L, "singletons carry no cluster label")
    // singleton assignment is exactly the plain hash split on the own id
    val plain = Curation.splitAssign(docs, "doc_id",
        Seq("train" -> 50, "val" -> 25, "test" -> 25))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.filter(_._2 == -1L).foreach { case (id, _, s) =>
      assert(s === plain(id), s"singleton $id must match the plain split")
    }
  }

  test("curriculumOrder: quartile buckets walk easy->hard, positions contiguous") {
    // docs with 1..8 tokens; quartile bounds over [1..8] = 2.75 / 4.5 / 6.25
    val docs = (1L to 8L).map(i => (i, (1L to i).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")
    val scope = new graft.engine.CacheScope
    val out = Curation.curriculumOrder(docs, "doc_id", "text",
        buckets = 4, seed = 1L, scope = scope)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    scope.release()
    val byDoc = out.map(t => t._1 -> t).toMap
    assert(out.map(_._2).toSeq.sorted === (1L to 8L).toSeq, "token counts")
    assert(byDoc(1L)._3 === 1 && byDoc(2L)._3 === 1 && byDoc(3L)._3 === 2 &&
      byDoc(4L)._3 === 2 && byDoc(5L)._3 === 3 && byDoc(6L)._3 === 3 &&
      byDoc(7L)._3 === 4 && byDoc(8L)._3 === 4, s"bucket map: ${out.toSeq}")
    assert(out.map(_._4).toSeq.sorted === (0L to 7L).toSeq,
      "global positions are contiguous 0..n-1")
    // every easier-bucket doc reads before every harder-bucket doc
    for (a <- out; b <- out if a._3 < b._3)
      assert(a._4 < b._4, s"bucket ${a._3} doc must precede bucket ${b._3}")
  }

  test("curriculumOrder: deterministic across partitionings, seed reshuffles") {
    val docs = (1L to 40L).map(i => (i, (0L to i % 7).map(_ => "w").mkString(" ")))
      .toDF("doc_id", "text")
    val s1 = new graft.engine.CacheScope
    val s2 = new graft.engine.CacheScope
    val a = Curation.curriculumOrder(docs, "doc_id", "text", scope = s1)
      .orderBy("doc_id").collect().toSeq
    val b = Curation.curriculumOrder(docs.repartition(7), "doc_id", "text",
        scope = s2)
      .orderBy("doc_id").collect().toSeq
    s1.release(); s2.release()
    assert(a === b, "same permutation under any partitioning")
    val s3 = new graft.engine.CacheScope
    val c = Curation.curriculumOrder(docs, "doc_id", "text", seed = 2L,
        scope = s3)
      .orderBy("doc_id").collect().toSeq
    s3.release()
    assert(a.map(r => (r.getLong(0), r.getInt(2))) ===
      c.map(r => (r.getLong(0), r.getInt(2))),
      "seed must not move bucket membership")
    assert(a.map(_.getLong(3)) !== c.map(_.getLong(3)),
      "a different seed reshuffles within buckets")
  }

  test("qualityEnsemble: rank blend, direction flip, and tiebreak") {
    import org.apache.spark.sql.functions.col
    // doc 1 best on both 'good' signals; doc 3 worst; rep LOWER is better
    val sig = Seq(
      (1L, 0.9, 0.1), (2L, 0.5, 0.5), (3L, 0.1, 0.9))
      .toDF("doc_id", "good", "rep")
    val out = Curation.qualityEnsemble(sig, "doc_id",
        Seq("good" -> true, "rep" -> false))
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Double]("pr_good"), r.getAs[Double]("pr_rep"),
          r.getAs[Double]("q_blend"))).toMap
    assert(out(1L) === ((1.0, 1.0, 1.0)))   // highest good, lowest rep
    assert(out(2L) === ((0.5, 0.5, 0.5)))
    assert(out(3L) === ((0.0, 0.0, 0.0)))
    // exact ties rank by id: two equal signals still get distinct ranks
    val tied = Seq((1L, 0.5), (2L, 0.5)).toDF("doc_id", "v")
    val t = Curation.qualityEnsemble(tied, "doc_id", Seq("v" -> true))
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("pr_v")).toMap
    assert(t === Map(1L -> 0.0, 2L -> 1.0))
  }

  test("qualityPrune: each domain keeps its own top slice; singleton kept") {
    import org.apache.spark.sql.functions.col
    val scored = Seq(
      // domain A: 5 docs, scores 0.9..0.5 → keepFrac 0.5 keeps pr <= 0.5
      (1L, "A", 0.9), (2L, "A", 0.8), (3L, "A", 0.7), (4L, "A", 0.6),
      (5L, "A", 0.5),
      // domain B sits uniformly LOWER but still keeps its own best
      (6L, "B", 0.3), (7L, "B", 0.2),
      // singleton domain: percent_rank = 0 → always kept
      (8L, "C", 0.01))
      .toDF("doc_id", "source", "score")
    val out = Curation.qualityPrune(scored, "doc_id", "source", "score", 0.5)
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(out === Map(1L -> true, 2L -> true, 3L -> true, 4L -> false,
      5L -> false, 6L -> true, 7L -> false, 8L -> true))
    // ties break on the id: equal scores rank deterministically
    val tied = Seq((1L, "A", 0.5), (2L, "A", 0.5)).toDF("doc_id", "source", "score")
    val t = Curation.qualityPrune(tied, "doc_id", "source", "score", 0.5)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(t(1L) === 0.0 && t(2L) === 1.0)
  }

  test("gopherRules: each rule trips on its own fixture, clean doc keeps") {
    val clean = ("the cat and the dog have been to the park of dreams " +
      "and that was fine with everyone there today really truly ") * 3 // 57 words
    val df = Seq(
      (1L, clean),
      (2L, "the of and " * 5),                        // 15 words → rule 1
      (3L, ("a b c " * 20) + "the of and that"),      // mean len < 3 → rule 2
      (4L, clean + " " + ("# # # # # # # " * 2)),     // symbols → rule 4
      (5L, clean + "\n- one\n- two\n- three\n- four\n- five\n- six\n- seven" +
        "\n- eight\n- nine\n- ten\n- more\n- again\n- yet\n- still"), // rule 8
      (6L, clean + "\nwe trailed off...\nand again…\nmore words here"), // rule 16
      (7L, ("1 2 3 4 5 6 7 8 9 10 " * 6) + "the of and that with"),   // rule 32
      (8L, "cats dogs birds fish mice " * 11)         // no stop words → rule 64
    ).toDF("doc_id", "text")
    val out = Curation.gopherRules(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getInt(8), r.getBoolean(9))).toMap
    assert(out(1L) === ((0, true)), s"clean doc: $out")
    assert((out(2L)._1 & 1) === 1)
    assert((out(3L)._1 & 2) === 2)
    assert((out(4L)._1 & 4) === 4)
    assert((out(5L)._1 & 8) === 8)
    assert((out(6L)._1 & 16) === 16)
    assert((out(7L)._1 & 32) === 32)
    assert(out(8L) === ((64, false)))
  }

  test("gopherRules: empty text fails word count only, ratios null") {
    val out = Curation.gopherRules(Seq((1L, "")).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    assert(out.getLong(1) === 0L)     // n_words
    assert(out.isNullAt(2) && out.isNullAt(3) && out.isNullAt(6))
    assert(out.getInt(8) === (1 + 64) && !out.getBoolean(9))
  }
}
