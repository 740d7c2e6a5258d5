package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Similarity, TextOps}

/** Unit specs for the dedup ladder + similarity ops (the oracle checks the
  * full queries end-to-end; these pin the building blocks).
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("incremental exact dedup: batch-internal and standing dups flagged apart") {
    val docs = Seq(
      (1L, "old one"), (2L, "old two"),
      (10L, "old one"),                 // fp exists in the standing index
      (11L, "fresh"), (12L, "Fresh"),   // canonicalized fp → batch-internal dup
      (13L, "unique")
    ).toDF("doc_id", "text")
    val standing = graft.ops.Dedup
      .exact(docs.filter(col("doc_id") < 10), "doc_id", "text").select("fp")
    val out = graft.ops.Dedup
      .incrementalExact(docs.filter(col("doc_id") >= 10), "doc_id", "text", standing)
      .orderBy("doc_id").select("doc_id", "is_dup", "dup_of_standing")
      .as[(Long, Boolean, Boolean)].collect()
    assert(out.toSeq === Seq((10L, true, true), (11L, false, false),
      (12L, true, false), (13L, false, false)))
  }

  test("scrubSegments: corpus-wide first occurrence kept, docs re-stitched in order") {
    val docs = Seq(
      (1L, "a b c d e f"),       // both segments novel
      (2L, "a b c x y z"),       // "a b c" repeats doc 1's first segment
      (3L, "d e f d e f"),       // both segments repeat doc 1's second
      (4L, "p q r p q r p")      // later repeat WITHIN one doc also drops
    ).toDF("doc_id", "text")
    val out = Dedup.scrubSegments(docs, "doc_id", "text", segTokens = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_segs", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    assert(out.toSeq === Seq(
      (1L, 2L, 2L, "a b c d e f"),
      (2L, 2L, 1L, "x y z"),
      (3L, 2L, 0L, ""),           // fully-duplicate doc scrubs to empty
      (4L, 3L, 2L, "p q r p")))   // trailing short segment survives
  }

  test("scrubSegments: null-text docs surface as empty, not silently dropped") {
    // null text coalesces to '' before tokenizing — the doc appears in the
    // output with one empty segment instead of vanishing (transform over a
    // null token array emits no rows). Empty and null docs share the ''
    // segment, so only the first keeps it; none of them disappears.
    val docs = Seq(
      (1L, "a b c"),
      (2L, null.asInstanceOf[String]),
      (3L, ""),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = Dedup.scrubSegments(docs, "doc_id", "text", segTokens = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_segs", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    assert(out.toSeq === Seq(
      (1L, 1L, 1L, "a b c"),
      (2L, 1L, 1L, ""),   // first '' segment in (doc_id, seg_idx) order wins
      (3L, 1L, 0L, ""),
      (4L, 1L, 0L, "")))
  }

  test("dupSpanCoverage: stride-1 windows catch offset-shifted repeats") {
    // doc 2 repeats doc 1's "a b c" span at a DIFFERENT offset (1 vs 0) —
    // a fixed-window segmenter never aligns them; stride-1 always does.
    // doc 4 is a pure self-repeat; doc 3 is shorter than the window.
    val docs = Seq(
      (1L, "a b c d e"),    // windows: "a b c","b c d","c d e"
      (2L, "x a b c d"),    // windows: "x a b","a b c","b c d" — 2 shared
      (3L, "q r"),          // short doc: one whole-doc window
      (4L, "s s s s")       // "s s s" twice: self-repeat duplicates
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpanCoverage(docs, "doc_id", "text", w = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_windows", "n_dup_windows", "dup_frac")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      (1L, 3L, 2L, 0.666667),
      (2L, 3L, 2L, 0.666667),
      (3L, 1L, 0L, 0.0),
      (4L, 2L, 2L, 1.0)))
  }

  test("dupSpanCoverage matches a brute-force reference on a random corpus") {
    // independent oracle in plain Scala (sliding windows + a hash-free
    // occurrence count) over a tiny-vocab random corpus dense in repeats —
    // validates the digest/window/rollup plumbing beyond hand fixtures
    val w = 3
    val rnd = new scala.util.Random(42)
    val vocab = Array("a", "b", "c", "d")
    val docs: Seq[(Long, String)] = (1L to 40L).map { id =>
      id -> Seq.fill(rnd.nextInt(11))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
    def winsOf(text: String): Seq[String] = {
      val t = text.split(" ", -1).toSeq // Spark split keeps empties
      val starts = 1 to math.max(t.length - (w - 1), 1)
      starts.map(s => t.slice(s - 1, s - 1 + w).mkString(" "))
    }
    val occ = docs.flatMap { case (_, t) => winsOf(t) }
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val expected = docs.map { case (id, t) =>
      val ws = winsOf(t)
      val dup = ws.count(occ(_) >= 2).toLong
      (id, ws.length.toLong, dup,
        BigDecimal(dup.toDouble / ws.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = Dedup.dupSpanCoverage(docs.toDF("doc_id", "text"),
        "doc_id", "text", w)
      .orderBy("doc_id")
      .select("doc_id", "n_windows", "n_dup_windows", "dup_frac")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === expected)
  }

  test("incrementalSpanCoverage: store hits + in-batch repeats, standing never rescanned") {
    val standingDocs = Seq((1L, "a b c d")).toDF("doc_id", "text")
    val standing = Dedup.spanWindows(standingDocs, "doc_id", "text", 3)
      .select("wkey").distinct()
    val batch = Seq(
      (10L, "a b c x"),          // "a b c" hits the store; "b c x" novel
      (11L, "p q r p q r"),      // "p q r" repeats IN batch (both count)
      (12L, "b c d")             // single window, store hit
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalSpanCoverage(batch, "doc_id", "text", 3, standing)
      .orderBy("doc_id")
      .select("doc_id", "n_windows", "n_dup_windows", "n_standing_hits", "dup_frac")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.toSeq === Seq(
      (10L, 2L, 1L, 1L, 0.5),
      (11L, 4L, 2L, 0L, 0.5),
      (12L, 1L, 1L, 1L, 1.0)))
  }

  test("scrubSpans: offset-shifted repeats removed at every later occurrence") {
    // doc 2 re-quotes doc 1's passage at offset +1 — the fixed-window scrub
    // cannot align it; the stride-1 rewrite removes the union of its
    // duplicated windows' positions while doc 1 survives verbatim. doc 3 is
    // a verbatim full duplicate and scrubs to empty.
    val docs = Seq(
      (1L, "a b c d e"),     // all three windows are first occurrences
      (2L, "z a b c d"),     // windows "a b c","b c d" repeat doc 1 → only "z" survives
      (3L, "a b c d e")      // whole doc duplicated → everything covered
    ).toDF("doc_id", "text")
    val out = Dedup.scrubSpans(docs, "doc_id", "text", w = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect()
    assert(out.toSeq === Seq(
      (1L, 5L, 0L, "a b c d e"),
      (2L, 5L, 4L, "z"),
      (3L, 5L, 5L, "")))
  }

  test("scrubSpans matches a brute-force reference on a random corpus") {
    // independent plain-Scala oracle: global (doc, pos) rank per window
    // string, later occurrences cover their positions, docs re-assemble
    // from uncovered tokens — exercises the interval-union logic across a
    // repeat-dense random corpus
    val w = 3
    val rnd = new scala.util.Random(7)
    val vocab = Array("a", "b", "c", "d")
    val docs: Seq[(Long, String)] = (1L to 40L).map { id =>
      id -> Seq.fill(rnd.nextInt(11))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
    def winsOf(text: String): Seq[(Int, String)] = {
      val t = text.split(" ", -1).toSeq
      (1 to math.max(t.length - (w - 1), 1))
        .map(s => s -> t.slice(s - 1, s - 1 + w).mkString(" "))
    }
    val firstOf = docs.flatMap { case (id, t) =>
        winsOf(t).map { case (p, win) => (win, id, p) }
      }.groupBy(_._1).map { case (win, occ) =>
        win -> occ.map(o => (o._2, o._3)).min
      }
    val expected = docs.map { case (id, t) =>
      val toks = t.split(" ", -1).toSeq
      val covered = winsOf(t)
        .filter { case (p, win) => firstOf(win) != ((id, p)) }
        .flatMap { case (p, _) => p until (p + w) }.toSet
      val kept = toks.zipWithIndex.collect {
        case (tok, i) if !covered(i + 1) => tok }
      (id, toks.length.toLong, toks.indices.count(i => covered(i + 1)).toLong,
        kept.mkString(" "))
    }
    val got = Dedup.scrubSpans(docs.toDF("doc_id", "text"), "doc_id", "text", w)
      .orderBy("doc_id")
      .select("doc_id", "n_tokens", "n_removed", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === expected)
  }

  test("scrubSpans is partition-count independent") {
    val docs = engine.Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    def run(parts: Int) =
      Dedup.scrubSpans(docs.repartition(parts), "doc_id", "text", 8)
        .orderBy("doc_id")
        .select("doc_id", "n_tokens", "n_removed", "clean_text")
        .as[(Long, Long, Long, String)].collect().toSeq
    assert(run(1) === run(7))
  }

  test("scrubSegments matches a brute-force reference on a random corpus") {
    // plain-Scala oracle for the fixed-window scrub: global (doc, seg_idx)
    // rank per segment string, first kept, docs re-stitched in order
    val w = 3
    val rnd = new scala.util.Random(13)
    val vocab = Array("a", "b", "c", "d")
    val docs: Seq[(Long, String)] = (1L to 40L).map { id =>
      id -> Seq.fill(rnd.nextInt(11))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
    def segsOf(text: String): Seq[(Int, String)] = {
      val t = text.split(" ", -1).toSeq
      val starts = 1 to math.max(t.length, 1) by w
      starts.zipWithIndex.map { case (s, i) =>
        i -> t.slice(s - 1, s - 1 + w).mkString(" ") }
    }
    val firstOf = docs.flatMap { case (id, t) =>
        segsOf(t).map { case (i, seg) => (seg, id, i) }
      }.groupBy(_._1).map { case (seg, occ) =>
        seg -> occ.map(o => (o._2, o._3)).min }
    val expected = docs.map { case (id, t) =>
      val ss = segsOf(t)
      val kept = ss.filter { case (i, seg) => firstOf(seg) == ((id, i)) }
      (id, ss.length.toLong, kept.length.toLong, kept.map(_._2).mkString(" "))
    }
    val got = Dedup.scrubSegments(docs.toDF("doc_id", "text"),
        "doc_id", "text", w)
      .orderBy("doc_id")
      .select("doc_id", "n_segs", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got === expected)
  }

  test("incrementalSpanCoverage matches brute force against a random standing corpus") {
    val w = 3
    val rnd = new scala.util.Random(99)
    val vocab = Array("a", "b", "c")
    def gen(ids: Range): Seq[(Long, String)] = ids.map { id =>
      id.toLong -> Seq.fill(rnd.nextInt(9))(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")
    }
    val standingDocs = gen(1 to 20)
    val batchDocs = gen(100 to 120)
    def winsOf(text: String): Seq[String] = {
      val t = text.split(" ", -1).toSeq
      (1 to math.max(t.length - (w - 1), 1))
        .map(s => t.slice(s - 1, s - 1 + w).mkString(" "))
    }
    val standingSet = standingDocs.flatMap(d => winsOf(d._2)).toSet
    val batchOcc = batchDocs.flatMap(d => winsOf(d._2))
      .groupBy(identity).map { case (k, v) => k -> v.size }
    val expected = batchDocs.map { case (id, t) =>
      val ws = winsOf(t)
      val dup = ws.count(win => batchOcc(win) >= 2 || standingSet(win)).toLong
      val hits = ws.count(standingSet).toLong
      (id, ws.length.toLong, dup, hits,
        BigDecimal(dup.toDouble / ws.length)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val standing = Dedup.spanWindows(standingDocs.toDF("doc_id", "text"),
      "doc_id", "text", w).select("wkey").distinct()
    val got = Dedup.incrementalSpanCoverage(batchDocs.toDF("doc_id", "text"),
        "doc_id", "text", w, standing)
      .orderBy("doc_id")
      .select("doc_id", "n_windows", "n_dup_windows", "n_standing_hits",
        "dup_frac")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got === expected)
  }

  test("dupSpanCoverage is partition-count independent") {
    // occurrence counts come from an unordered count over the digest
    // partition — no order sensitivity to hide — and the rollup is a plain
    // aggregate; physical partitioning must never change the profile
    val docs = engine.Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    def run(parts: Int) =
      Dedup.dupSpanCoverage(docs.repartition(parts), "doc_id", "text", 8)
        .orderBy("doc_id")
        .select("doc_id", "n_windows", "n_dup_windows", "dup_frac")
        .as[(Long, Long, Long, Double)].collect().toSeq
    assert(run(1) === run(7))
  }

  test("scrubSegments is partition-count independent") {
    // the keep rule is a row_number over (seg) ordered by (doc_id, seg_idx)
    // — a total order, so physical partitioning must never change output;
    // this guards the classic nondeterministic-window regression
    val docs = engine.Tables.documents(spark, "/root/testdata/sf0.001").limit(200)
    def run(parts: Int) =
      Dedup.scrubSegments(docs.repartition(parts), "doc_id", "text", 8)
        .orderBy("doc_id")
        .select("doc_id", "n_segs", "n_kept", "clean_text")
        .as[(Long, Long, Long, String)].collect().toSeq
    assert(run(1) === run(7))
  }

  test("shingles: distinct 3-grams; short texts yield empty, not descending sequence") {
    val df = Seq("a b c d", "a b", "", "x y z x y z").toDF("text")
    val got = df.select(Dedup.shingles(col("text")).as("s"))
      .as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
    assert(got(2) === Seq.empty)
    assert(got(3) === Seq("x y z", "y z x", "z x y")) // distinct
  }

  test("exact dedup flags every copy after the first by id") {
    val df = Seq((10L, "same  Text"), (7L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    // fingerprint collapses whitespace + case → 7 and 10 collide, 7 kept
    val got = Dedup.exact(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(got.map(_.getAs[Boolean]("is_dup")).toSeq === Seq(false, false, true))
  }

  test("ngram jaccard: identical docs score 1.0; skew guard drops hot shingles") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "q r s t u"))
      .toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.5).collect()
    assert(pairs.length === 1)
    assert(pairs.head.getAs[Double]("jaccard") === 1.0)
    // guard: with maxDocsPerShingle=1 the shared shingles are dropped → no pairs
    val guarded = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.0,
      maxDocsPerShingle = 1).collect()
    assert(guarded.isEmpty)
  }

  test("ngram guard drops only hot shingles; real pairs survive") {
    // "x y z" is in all 4 docs (df=4, hot under cap=3); every other shingle
    // has df=2. The guard must drop only the hot key — the two true pairs
    // still match on their remaining shingles with jaccard 1.0.
    val df = Seq((1L, "x y z a b c"), (2L, "x y z a b c"),
                 (3L, "x y z p q r"), (4L, "x y z p q r")).toDF("doc_id", "text")
    val got = Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.5,
      maxDocsPerShingle = 3).orderBy("doc_a", "doc_b").collect()
    assert(got.map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq
      === Seq((1L, 2L), (3L, 4L)))
    assert(got.forall(_.getAs[Double]("jaccard") === 1.0))
  }

  test("containment finds the wholesale quote that jaccard misses") {
    // doc 1 (4 shingles) is quoted verbatim inside doc 2 (12 shingles):
    // jaccard = 4/12 ≈ 0.33 — below any dedup threshold — but
    // containment(1→2) = 4/4 = 1.0. The reverse direction stays low.
    val small = "a b c d e f"                              // shingles: 4
    val big = small + " p q r s t u v w"                   // 12, superset
    val df = Seq((1L, small), (2L, big), (3L, "z z z y y y x x x"))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "doc_id", "text", n = 3,
      threshold = 0.8).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) === ((1L, 2L)))
    assert(r.getAs[Double]("cont_a_in_b") === 1.0,
      "every shingle of the quote appears in the host")
    assert(r.getAs[Double]("cont_b_in_a") < 0.5)
    // the symmetric score would have rejected this pair
    assert(Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.5).isEmpty)
  }

  test("minhash LSH: identical docs share all bands, disjoint docs none") {
    val df = Seq((1L, "a b c d e f"), (2L, "a b c d e f"), (3L, "q r s t u v"))
      .toDF("doc_id", "text")
    val got = Dedup.minhashLshPairs(df, "doc_id", "text", k = 8, rowsPerBand = 2)
      .collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("doc_a") === 1L)
    assert(got.head.getAs[Long]("doc_b") === 2L)
    assert(got.head.getAs[Long]("bands_shared") === 4L)
  }

  test("simhash matches an independent scala recomputation") {
    val text = "spark join shuffle spark"
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val row = Dedup.simhash(df, "doc_id", "text").collect().head

    // independent model: per-token md5, hex-digit bit votes
    def md5hex(s: String): String = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8)).map("%02x".format(_)).mkString
    val votes = Array.fill(64)(0)
    text.split(" ").foreach { tok =>
      val h = md5hex(tok)
      (0 until 64).foreach { j =>
        val digit = Integer.parseInt(h.charAt(j / 4).toString, 16)
        val bit = (digit >> (j % 4)) & 1
        votes(j) += (if (bit == 1) 1 else -1)
      }
    }
    def pack(lo: Int, hi: Int): Long =
      (lo until hi).map(j => if (votes(j) > 0) 1L << (j - lo) else 0L).sum
    assert(row.getAs[Long]("simhash_lo") === pack(0, 32))
    assert(row.getAs[Long]("simhash_hi") === pack(32, 64))
  }

  test("plane signs are deterministic and balanced-ish") {
    val s1 = Similarity.planeSigns(8, 64)
    val s2 = Similarity.planeSigns(8, 64)
    assert(s1.map(_.toSeq).toSeq === s2.map(_.toSeq).toSeq)
    assert(s1.flatten.forall(v => v == 1.0 || v == -1.0))
    val pos = s1.flatten.count(_ > 0)
    assert(pos > 150 && pos < 350) // md5 parity ≈ balanced over 512 entries
  }

  test("lsh bucket co-location implies real similarity ordering (smoke on testdata)") {
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pairs = Similarity.cosineNearDupPairs(emb, "vec_id", "embedding",
      planes = 8, dims = 64, threshold = -1.0)
    // all returned sims are valid cosines
    val sims = pairs.select("sim").as[Double].collect()
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
  }

  test("simhash pairs: identical docs pair at hamming 0; disjoint docs don't pair") {
    val df = Seq(
      (1L, "spark shuffle join partition spark"),
      (2L, "spark shuffle join partition spark"), // identical → hamming 0
      (3L, "q r s t u v w x y z"))                // disjoint vocabulary
      .toDF("doc_id", "text")
    val got = Dedup.simhashPairs(df, "doc_id", "text", maxHamming = 3).collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("doc_a") === 1L)
    assert(got.head.getAs[Long]("doc_b") === 2L)
    assert(got.head.getAs[Long]("hamming") === 0L)
  }

  test("dup clusters: multi-hop chains collapse to the min id, canonical flagged") {
    // components: {1,2,3,9} via chain 9-2, 2-3, 1-3 (diameter 3) and {5,6};
    // 7-7-free singletons never appear (no edges)
    val pairs = Seq((2L, 9L), (2L, 3L), (1L, 3L), (5L, 6L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(pairs, "doc_a", "doc_b")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(got.toSeq === Seq(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (5L, 5L, true), (6L, 5L, false), (9L, 1L, false)))
  }

  test("dup clusters: star rounds resolve a >20-diameter chain inside the default cap; an exhausted cap throws") {
    // a 30-hop chain: min-label propagation would need ~diameter (30)
    // rounds — past the default cap; the large-star/small-star interior is
    // diameter-INDEPENDENT (log-round folding), so the same default cap
    // resolves it with room to spare. Mislabeled clusters would feed
    // leakfree_split and the curation funnel downstream, so the cap is
    // still converge-or-fail: a cap too small to reach the union-of-stars
    // fixpoint throws rather than returning a partially-starred labeling.
    val chain = (0 until 30).map(i => (100L + i, 101L + i))
      .toDF("doc_a", "doc_b")
    val got = Dedup.dupClusters(chain, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size === 31 && got.values.forall(_ == 100L),
      "one component labeled by its minimum id end-to-end")
    val e = intercept[IllegalArgumentException] {
      Dedup.dupClusters(chain, "doc_a", "doc_b", maxRounds = 1).count()
    }
    assert(e.getMessage.contains("fixpoint"), e.getMessage)
    // a degenerate self-pair still labels its node as a singleton cluster
    val selfp = Seq((7L, 7L), (1L, 2L)).toDF("doc_a", "doc_b")
    val s = Dedup.dupClusters(selfp, "doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(s === Set((1L, 1L, true), (2L, 1L, false), (7L, 7L, true)))
  }

  test("star tier ≡ propagation tier on randomized graphs (the escalation is invisible in results)") {
    // the two-tier resolver's correctness rests on both tiers converging
    // to the SAME unique component-minimum labeling — pin it empirically
    // on random topology, forcing each tier via propRounds: 0 sends every
    // graph straight to star rounds, a large budget keeps propagation
    val rnd = new scala.util.Random(20260814L)
    (1 to 4).foreach { trial =>
      val n = 30 + rnd.nextInt(40)
      val pairs = (0 until n).map { _ =>
        (rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)
      }.filter { case (a, b) => a != b }
      val df = pairs.toDF("doc_a", "doc_b")
      val viaStar = Dedup.dupClusters(df, "doc_a", "doc_b",
          maxRounds = 30, propRounds = 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      val viaProp = Dedup.dupClusters(df, "doc_a", "doc_b",
          maxRounds = 30, propRounds = 100)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
      assert(viaStar === viaProp, s"trial $trial (${pairs.size} pairs)")
    }
  }

  test("planesFor sizes signatures to hold expected occupancy constant") {
    assert(Similarity.planesFor(512, 8) === 6)            // 2^6 buckets ≈ 512/8
    assert(Similarity.planesFor(1L << 20, 8) === 17)
    assert(Similarity.planesFor(1L << 40, 8) === 37)      // grows with log2(n)
    assert(Similarity.planesFor(4, 8) === 1)              // tiny corpora: floor 1
    assert(Similarity.planesFor(Long.MaxValue, 1) === 62) // bit-width ceiling
  }

  test("declared-query plane derivation: corpus-sized below the oracle cap") {
    // SparkEntry caps the DERIVED count at LshMaxPlanes because the static
    // oracle pre-generates one gated sign chain per plane; the library path
    // (planesFor) keeps growing to 62 for callers without an oracle
    assert(SparkEntry.lshPlanesDerived(500) === 6)
    assert(SparkEntry.lshPlanesDerived(1L << 20) === SparkEntry.LshMaxPlanes)
    assert(SparkEntry.lshPlanesDerived(Long.MaxValue) === SparkEntry.LshMaxPlanes)
  }

  test("banded LSH: planesFor-sized buckets stay small; planted dups still found") {
    // deterministic "random" fixture: 512 spread vectors + 8 planted
    // near-identical pairs on top
    val rnd = new scala.util.Random(42)
    val dims = 16
    val spread = (0 until 512).map { i =>
      (i.toLong, Array.fill(dims)(rnd.nextGaussian().toFloat))
    }
    val planted = (0 until 8).map { i =>
      val v = spread(i * 7)._2
      (10000L + i, v.map(x => x + 0.001f * (i + 1)))
    }
    val df = (spread ++ planted).toDF("vec_id", "embedding")
    val n = 520L
    val planes = Similarity.planesFor(n, targetOccupancy = 8)

    // occupancy: with log-sized signatures no (band, bucket) degenerates into
    // a quadratic hotspot on a diverse corpus
    val occ = Similarity.bandedLshBuckets(df, "vec_id", "embedding",
        bands = 2, planesPerBand = planes, dims = dims)
      .groupBy("band", "bucket").count()
      .agg(max("count")).as[Long].collect().head
    assert(occ <= 8 * 8, s"max bucket occupancy $occ should stay near target 8")

    // recall: every planted near-identical pair survives banding (cosine ≈ 1,
    // same side of every hyperplane in at least one band)
    val pairs = Similarity.cosineNearDupPairsBanded(df, "vec_id", "embedding",
        bands = 2, planesPerBand = planes, dims = dims, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val want = (0 until 8).map(i => (spread(i * 7)._1, 10000L + i)).toSet
    assert(want.subsetOf(pairs), s"missing planted pairs: ${want -- pairs}")
  }

  test("banded LSH bucket ids: band 0 matches the single-band layout") {
    val emb = graft.engine.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val single = Similarity.lshBuckets(emb, "vec_id", "embedding", 8, 64)
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    val band0 = Similarity.bandedLshBuckets(emb, "vec_id", "embedding", 2, 8, 64)
      .filter(col("band") === 0).select("vec_id", "bucket")
      .orderBy("vec_id").as[(Long, Long)].collect().toSeq
    assert(single === band0)
  }

  test("language id tie-break picks first language in marker order") {
    val df = Seq((1L, "nothing matches here")).toDF("doc_id", "text")
    val got = TextOps.languageId(df, "doc_id", "text").collect().head
    assert(got.getAs[String]("pred_lang") === TextOps.LangMarkers.head._1)
  }

  test("hybrid dedup: lexical candidates confirmed or vetoed by embedding cosine") {
    // two identical-text pairs -> both are LSH candidates; embeddings agree
    // for (1,2) and point opposite ways for (3,4) — only (1,2) is a dup
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "one two three four five six"),
      (4L, "one two three four five six"),
      (5L, "totally unrelated text body here")
    ).toDF("doc_id", "text")
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f)), (4L, Seq(-1.0f, 0.0f)),
      (5L, Seq(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val scope = new graft.engine.CacheScope
    val got = Dedup.hybridNearDupPairs(docs, emb, "doc_id", "text",
        "vec_id", "embedding", cosThreshold = 0.5, scope = scope)
      .orderBy("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(3), r.getBoolean(4)))
    scope.release()
    assert(got.toSeq === Seq((1L, 2L, 1.0, true), (3L, 4L, -1.0, false)),
      "the semantic check must confirm (1,2) and veto (3,4)")
  }

  test("corpus resemblance: identical halves 1.0, disjoint near 0, stable") {
    import spark.implicits._
    val a = Seq((1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val same = Dedup.corpusJaccardEstimate(
      Dedup.corpusSignature(a, "doc_id", "text"),
      Dedup.corpusSignature(a, "doc_id", "text")).head()
    assert(same.getLong(0) === 16L && same.getLong(1) === 16L &&
      same.getDouble(2) === 1.0)
    val b = Seq((3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"))
      .toDF("doc_id", "text")
    val diff = Dedup.corpusJaccardEstimate(
      Dedup.corpusSignature(a, "doc_id", "text"),
      Dedup.corpusSignature(b, "doc_id", "text")).head()
    assert(diff.getDouble(2) <= 0.25,
      s"disjoint shingle sets must estimate near zero, got $diff")
    val repartitioned = Dedup.corpusJaccardEstimate(
      Dedup.corpusSignature(a.repartition(5), "doc_id", "text"),
      Dedup.corpusSignature(b.repartition(3), "doc_id", "text")).head()
    assert(repartitioned.getDouble(2) === diff.getDouble(2),
      "global minima cannot vary with partitioning")
  }

  test("incremental LSH ≡ full-batch pairs restricted to pairs touching the batch") {
    import spark.implicits._
    val mk = (id: Long, t: String) => (id, t)
    // 1≈2 standing-standing (must NOT re-emit), 3≈103 standing-new,
    // 101≈102 new-new (distinct must collapse the double match), 104 unique
    val docs = Seq(
      mk(1L, "alpha beta gamma delta epsilon zeta eta"),
      mk(2L, "alpha beta gamma delta epsilon zeta theta"),
      mk(3L, "one two three four five six seven eight"),
      mk(101L, "red orange yellow green blue indigo violet"),
      mk(102L, "red orange yellow green blue indigo ultraviolet"),
      mk(103L, "one two three four five six seven nine"),
      mk(104L, "completely unrelated text with no shared shingles at all")
    ).toDF("doc_id", "text")
    val isNew = (id: Long) => id >= 100L
    val standing = docs.filter(!col("doc_id").geq(100L))
    val batch = docs.filter(col("doc_id").geq(100L))
    val incr = Dedup.incrementalLshPairs(
        Dedup.bandedSignature(batch, "doc_id", "text"),
        Dedup.bandedSignature(standing, "doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val scope = new graft.engine.CacheScope
    val full = Dedup.minhashLshPairs(docs, "doc_id", "text", scope = scope)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    scope.release()
    assert(incr === full.filter(p => isNew(p._1) || isNew(p._2)),
      s"incremental must equal the batch-touching slice of the full run\n" +
        s"incr=$incr\nfull=$full")
    assert(!incr.exists(p => !isNew(p._1) && !isNew(p._2)),
      "standing-vs-standing pairs never re-emit")
    assert(incr.exists(p => isNew(p._1) && isNew(p._2)),
      "new-vs-new pairs emit once despite the two-directional match")
  }

  test("fastMinhashSignature: set-determined, partition-independent, k slots") {
    val docs = Seq(
      (1L, "a b c d e"), (2L, "a b c d e"),   // identical → identical sig
      (3L, "c b a e d"),                      // same tokens, other shingles
      (4L, "x"))                              // < n tokens → no signature
      .toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Dedup.fastMinhashSignature(df, "doc_id", "text", k = 8)
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val sigs = run(docs)
    assert(sigs.keySet === Set(1L, 2L, 3L), "shingle-less doc has no signature")
    assert(sigs(1L).length === 8)
    assert(sigs(1L) === sigs(2L), "signature is a function of the shingle set")
    assert(sigs(1L) !== sigs(3L))
    assert(run(docs.repartition(7)) === sigs)
  }

  test("minhash_sig expression: eval/codegen agree, null-element and empty semantics") {
    import graft.functions.minhash_sig
    import org.apache.spark.sql.functions.array
    val df = Seq(
      (1L, Seq("aa", "bb")), (2L, Seq("bb", "aa")),  // order-free
      (3L, Seq("aa")))
      .toDF("id", "sh")
    val viaDf = df.select(col("id"), minhash_sig(col("sh"), 4).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaDf(1L) === viaDf(2L), "signature must not depend on element order")
    // interpreted eval (direct helper call) agrees with the codegen'd column
    val direct = graft.expressions.MinHashSig.sig(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array(org.apache.spark.unsafe.types.UTF8String.fromString("aa"),
          org.apache.spark.unsafe.types.UTF8String.fromString("bb"))), 4)
      .toLongArray.toSeq
    assert(viaDf(1L) === direct)
    // null element skipped; minima over the remaining element only
    graft.engine.GraftExtensions.register(spark)
    val nullSkipped = spark.sql(
        "SELECT minhash_sig(array('aa', CAST(NULL AS STRING)), 4) AS s")
      .collect()(0).getSeq[Long](0)
    assert(nullSkipped === viaDf(3L))
    // empty array → null signature
    assert(df.limit(1)
      .select(minhash_sig(array().cast("array<string>"), 4).as("s"))
      .collect()(0).isNullAt(0))
  }

  test("minhash_text ≡ minhash_sig over shinglesOfTokens (byte-span property)") {
    import graft.functions.{minhash_sig, minhash_text}
    // tricky shapes: repeated spaces (empty tokens), leading space, unicode
    // multi-byte chars, duplicate shingles (multiset min = set min)
    val texts = Seq(
      "a b c d e", "a  b c", " a b c", "ü ñ 漢 字 x", "a b a b a b a b",
      "x y z", "one two three four five six")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val viaText = df.select(col("id"), minhash_text(col("text"), 3, 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val viaArray = df.select(col("id"),
        minhash_sig(Dedup.shinglesOfTokens(
          graft.ops.TextOps.tokens(col("text")), 3), 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(viaText === viaArray,
      "the zero-copy text kernel must equal the array form on every input")
  }

  test("shingle_hashes ≡ xxhash64 over string shingles (distinct, sorted)") {
    import graft.functions.shingle_hashes
    val texts = Seq(
      "a b c d e", "a  b c", " a b c", "ü ñ 漢 字 x", "a b a b a b a b",
      "x y", "x y z", "", "one two three four five six")
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val viaKernel = df.select(col("id"), shingle_hashes(col("text"), 3).as("hs"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) null else r.getSeq[Long](1))).toMap
    val viaStrings = df.select(col("id"),
        sort_array(transform(Dedup.shinglesOfTokens(
          graft.ops.TextOps.tokens(col("text")), 3), s => xxhash64(s))).as("hs"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    texts.indices.foreach { i =>
      val k = viaKernel(i.toLong)
      val s = viaStrings(i.toLong)
      if (s.isEmpty) assert(k == null, s"doc $i: <n tokens must be null")
      else assert(k === s, s"doc $i: kernel must equal hashed string shingles")
    }
  }

  test("fastBandedSignature: identical docs collide on every band, long buckets") {
    val docs = Seq((1L, "a b c d e"), (2L, "a b c d e"), (3L, "p q r s t"))
      .toDF("doc_id", "text")
    val rows = Dedup.fastBandedSignature(docs, "doc_id", "text",
        k = 8, rowsPerBand = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val byDoc = rows.groupBy(_._1)
    assert(byDoc(1L).map(x => (x._2, x._3)).toSet ===
      byDoc(2L).map(x => (x._2, x._3)).toSet,
      "identical docs must collide on all 4 band buckets")
    assert(byDoc(1L).map(x => (x._2, x._3)).toSet
      .intersect(byDoc(3L).map(x => (x._2, x._3)).toSet).isEmpty,
      "disjoint docs share no buckets")
    // probe-compatible with the incremental store logic
    val pairs = Dedup.incrementalLshPairs(
        Dedup.fastBandedSignature(docs.filter(col("doc_id") === 2L),
          "doc_id", "text", 8, 2),
        Dedup.fastBandedSignature(docs.filter(col("doc_id") =!= 2L),
          "doc_id", "text", 8, 2))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 4L)))
  }

  test("lshCalibration: exact Jaccard by hand; identical docs estimate 1.0") {
    // doc1 {a b c, b c d}; doc2 {a b c, b c e} → shared 1, union 3 → 1/3
    // doc3 ≡ doc1 → jaccard 1, ALL minhash slots must match
    // doc4 disjoint → appears in no pair
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "a b c d"), (4L, "x y z w"))
      .toDF("doc_id", "text")
    val scope = new graft.engine.CacheScope
    val out = Dedup.lshCalibration(docs, "doc_id", "text", k = 8,
        scope = scope)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(5), r.getLong(6), r.getDouble(7))).toMap
    scope.release()
    assert(out.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    val (s12, j12, m12, e12) = out((1L, 2L))
    assert(s12 === 1L && j12 === 0.333333)
    assert(m12 <= 8L && e12 === m12 / 8.0) // eighths are exact in binary
    val (s13, j13, m13, e13) = out((1L, 3L))
    assert(s13 === 2L && j13 === 1.0 && m13 === 8L && e13 === 1.0,
      "identical shingle sets share every minhash slot")
  }

  test("contentChunkDedup: chunks partition the doc; cuts survive a prefix shift") {
    val rng = new scala.util.Random(42)
    def rand(n: Int) = (1 to n).map(_ => ('a' + rng.nextInt(26)).toChar).mkString
    val base = rand(400)
    val docs = Seq(
      (1L, base),
      (2L, base),            // exact copy — every chunk already owned by doc 1
      (3L, "ZZZZZ" + base),  // shifted copy — every FIXED-size chunk changes
      (4L, rand(400)),       // fresh content
      (5L, "tiny")           // shorter than k → single whole-doc chunk
    ).toDF("doc_id", "text")
    val out = Dedup.contentChunkDedup(docs, "doc_id", "text", k = 8, div = 16)
      .select("doc_id", "n_chunks", "n_chars", "dup_chars", "dup_char_frac")
      .as[(Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L)._3 === 400L && out(3L)._3 === 405L && out(5L)._3 === 4L,
      "chunk lengths must sum to the document length (chunks partition it)")
    assert(out(5L)._2 === 1L)
    assert(out(1L)._4 === 0L && out(4L)._4 === 0L)
    assert(out(2L)._5 === Some(1.0), "exact copy is fully duplicated mass")
    // content-defined boundaries re-sync at the first shared cut: the
    // shifted copy dedups everything past its head chunk (~div chars)
    assert(out(3L)._4 > 300L,
      s"shifted copy should share most chunk mass, got ${out(3L)._4}")
  }
}
