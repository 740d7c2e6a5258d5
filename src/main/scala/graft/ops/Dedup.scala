package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import org.apache.spark.sql.graftbridge.bridge

import graft.engine.CacheScope

/** Deduplication operators for a training-data pipeline over `documents`.
  * Four tiers, cheapest first — the standard large-corpus dedup ladder:
  *
  *   1. exact (hash-groupBy on a canonical fingerprint)        — one shuffle
  *   2. MinHash + LSH (shingle → minhash sig → band buckets)   — candidate
  *      pairs come from equi-joins on band buckets, never an all-pairs join
  *   3. SimHash (64-bit near-dup signature, one narrow pass)
  *   4. n-gram Jaccard (exact set overlap on candidate pairs)
  *
  * Scale design: every pairwise step is keyed (shingle id or band bucket), so
  * the join fanout is bounded by real collisions, not n². At 100 TB the
  * shingle→doc list is the classic skew risk (stopword-like shingles); the
  * declared queries shingle at 3 tokens which keeps per-key fanout bounded,
  * and a `maxDocsPerShingle` guard drops degenerate keys the way production
  * MinHash pipelines drop stop-shingles.
  *
  * Cache lifecycle: the pair operators persist a shared intermediate (the
  * exploded shingle / signature frame feeds both join sides) that must
  * outlive the call — the caller's action is what reads it — so each takes a
  * [[graft.engine.CacheScope]] and registers the handle there. Pass your own
  * scope and `release()` after the action for deterministic cleanup; the
  * default [[CacheScope.global]] is released wholesale by
  * `CacheScope.releaseAll()` / `spark.catalog.clearCache()`.
  */
object Dedup {

  /** 3-token shingles (distinct) from a pre-split token array. Guarded for
    * texts shorter than `n` tokens (Spark `sequence(1,0)` would descend).
    */
  def shinglesOfTokens(ts: Column, n: Int = 3): Column =
    when(size(ts) >= n,
      array_distinct(transform(sequence(lit(1), size(ts) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(k => element_at(ts, i + k)): _*))))
      .otherwise(array().cast("array<string>"))

  /** 3-token shingles of a text column. Composition convenience — hot paths
    * should go through [[shingleRows]], which materializes the token split
    * once per row first (`element_at` inside the transform lambda references
    * the array 3n times, and lambda captures defeat common-subexpression
    * elimination, so inlining the split re-splits the text per shingle term).
    */
  def shingles(text: Column, n: Int = 3): Column =
    shinglesOfTokens(TextOps.tokens(text), n)

  /** Exploded (doc_id, shingle) rows with the token split materialized in its
    * own projection — the shared front of every shingle-based tier.
    */
  private def shingleRows(df: DataFrame, idCol: String, textCol: String,
                          n: Int): DataFrame =
    fanout(df)
      .select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), explode(shinglesOfTokens(col("toks"), n)).as("shingle"))

  /** Exact dedup (hash-groupBy): fingerprint + keep-first flag per group.
    * `is_dup` marks every row after the lowest id with an identical
    * fingerprint — the exact-hash tier of the dedup ladder.
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(col("fp")).orderBy(col(idCol))
    df.select(col(idCol), TextOps.fingerprint(col(textCol)).as("fp"))
      .withColumn("rn", row_number().over(w))
      .select(col(idCol), col("fp"), (col("rn") > 1).as("is_dup"))
  }

  /** Incremental exact dedup: a NEW batch against the standing corpus's
    * fingerprint index, without rescanning the standing corpus. The index is
    * fingerprints only (16 bytes/doc — the gold artifact a daily dedup job
    * maintains); within-batch keep-first runs exactly like [[exact]], and a
    * batch doc also counts as dup when its fingerprint already exists in the
    * index. At 100 TB this is the shape that makes daily ingest dedup
    * O(|batch| + |index keys|), not O(corpus): bucket the index by `fp` and
    * the probe join is exchange-free on the index side.
    *
    * Output per batch row: (id, fp, is_dup, dup_of_standing).
    */
  def incrementalExact(newDocs: DataFrame, idCol: String, textCol: String,
                       standingFps: DataFrame, fpCol: String = "fp"): DataFrame = {
    val batch = exact(newDocs, idCol, textCol)
    val seen = standingFps.select(col(fpCol).as("fp")).distinct()
      .withColumn("__seen", lit(true))
    batch.join(seen, Seq("fp"), "left")
      .select(col(idCol), col("fp"),
        (col("is_dup") || coalesce(col("__seen"), lit(false))).as("is_dup"),
        coalesce(col("__seen"), lit(false)).as("dup_of_standing"))
  }

  /** n-gram Jaccard near-dup pairs: explode distinct shingles, group docs by
    * shingle (keyed, not all-pairs), emit each shingle's C(d,2) pairs from
    * the sorted doc list, Jaccard = |∩| / |∪|. `threshold` prunes the
    * candidate set; `maxDocsPerShingle` drops degenerate high-frequency
    * shingles in a cheap count pass BEFORE any doc list is collected (skew
    * guard — a shingle shared by d docs costs d² pair rows, and the guard is
    * also what bounds the per-shingle list buffer). Callers disabling the
    * guard accept an unbounded list buffer on hot shingles — always set a cap
    * at corpus scale.
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, threshold: Double = 0.5,
                        maxDocsPerShingle: Int = Int.MaxValue,
                        scope: CacheScope = CacheScope.global): DataFrame = {
    // the shingle generation is the single most expensive narrow stage and
    // has TWO consumers under the guard (the hot count and the anti-join
    // probe) — materialize it once, like any production dedup job's shingle
    // table; the caller releases it via `scope` (see the object doc).
    // Shingles are born as xxhash64 LONGS ([[graft.expressions
    // .ShingleHashes]] — one codegen'd byte pass, no intermediate shingle
    // Strings ever allocated): every downstream stage (hot-shingle count,
    // anti-join, doc-list groupBy) shuffles and persists 8-byte keys
    // instead of ~n·word strings — per-doc distinctness (what the Jaccard
    // counts measure) survives hashing, and a 64-bit collision would need
    // ~2^32 distinct shingles in one corpus to appear once, far beyond any
    // audit slice this exact-tier operator is for.
    val sh0raw = fanout(df)
      .select(col(idCol).as("doc_id"),
        explode(graft.functions.shingle_hashes(col(textCol), n)).as("shingle"))
    val sh0 =
      if (maxDocsPerShingle == Int.MaxValue) sh0raw
      else scope.persisted(sh0raw)
    val shUnp =
      if (maxDocsPerShingle == Int.MaxValue) sh0
      else {
        // stop-shingle guard via groupBy-count + anti-join: partial (map-side)
        // aggregation collapses each shingle before the shuffle, and the hot
        // set is tiny so AQE broadcasts the anti-join — strictly cheaper than
        // a windowed count (full sort of every partition by shingle)
        val hot = sh0.groupBy("shingle").agg(count(lit(1)).as("df_cnt"))
          .filter(col("df_cnt") > maxDocsPerShingle)
          .select("shingle")
        // USING join puts the key first — restore (doc_id, shingle) order
        sh0.join(hot, Seq("shingle"), "left_anti").select("doc_id", "shingle")
      }
    // one doc-list row per surviving shingle: the guard above caps survivors
    // at `maxDocsPerShingle` docs, so the collect_set buffer is bounded (the
    // unguarded frame is never collected — a hot shingle dies in the cheap
    // count pass, not in an unbounded list buffer). Generating pairs from the
    // sorted list replaces the shingle self-join entirely: same C(d,2) fanout,
    // but as a narrow explode after ONE groupBy instead of a second shuffle
    // join over the full exploded frame — and the persisted intermediate is
    // one row per shingle, not one per (doc, shingle)
    val lists = scope.persisted(shUnp.groupBy("shingle")
      .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .select("ds"))
    // per-doc surviving-shingle counts straight off the guarded rows (map-
    // side combine shrinks the shuffle to one row per doc per task) — NOT by
    // re-exploding `lists`, which re-materializes every (doc, shingle) pair.
    // Persisted because BOTH sides of the final join consume it; identical-
    // subplan reuse does not survive the two different broadcast projections.
    val sizes = scope.persisted(
      shUnp.groupBy("doc_id").agg(count(lit(1)).as("n_sh")))
    val pairsOfList = flatten(transform(col("ds"), (a, i) =>
      transform(slice(col("ds"), i + lit(2), size(col("ds"))), b =>
        struct(a.as("doc_a"), b.as("doc_b")))))
    val shared = lists.filter(size(col("ds")) >= 2)
      .select(explode(pairsOfList).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    shared
      .join(sizes.toDF("doc_a", "na"), Seq("doc_a"))
      .join(sizes.toDF("doc_b", "nb"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("na"), col("nb"),
        (col("inter").cast("double") / (col("na") + col("nb") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Asymmetric containment pairs: |A∩B| / |A| and |A∩B| / |B| over the
    * same guarded shingle machinery as [[ngramJaccardPairs]]. Containment
    * is the quote detector symmetric Jaccard structurally misses: a short
    * document quoted wholesale inside a much larger one scores
    * jaccard ≈ |small|/|big| ≈ 0 but containment(small→big) = 1.0. The
    * filter keeps pairs where EITHER direction clears `threshold` —
    * downstream decides which side is the quote.
    *
    * Cost identical to the Jaccard pass (the pair frame is the same; only
    * the denominator differs), including the `maxDocsPerShingle` hot-
    * shingle guard.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
                       n: Int = 3, threshold: Double = 0.8,
                       maxDocsPerShingle: Int = Int.MaxValue,
                       scope: CacheScope = CacheScope.global): DataFrame = {
    val pairs = ngramJaccardPairs(df, idCol, textCol, n, threshold = 0.0,
      maxDocsPerShingle, scope)
    pairs.select(col("doc_a"), col("doc_b"), col("inter"),
        col("na"), col("nb"),
        (col("inter").cast("double") / col("na")).as("cont_a_in_b"),
        (col("inter").cast("double") / col("nb")).as("cont_b_in_a"))
      .filter(greatest(col("cont_a_in_b"), col("cont_b_in_a")) >= threshold)
  }

  /** MinHash signatures, wide: one row per doc with columns h0..h(k-1), where
    * hash i of a shingle is the (lexicographically ordered) md5 of
    * `"i:shingle"` — a string-ordered MinHash that both engines compute
    * bit-identically. The k mins run as k aggregates over ONE pass of the
    * shingle rows (partial map-side aggregation shrinks the shuffle to one
    * k-string row per doc per task) — no ×k row explosion.
    */
  def minhashSignatureWide(df: DataFrame, idCol: String, textCol: String,
                           k: Int, n: Int = 3): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i"))
    shingleRows(df, idCol, textCol, n)
      .groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** MinHash signatures in long form (doc_id, i, h) — the narrow-schema view
    * of [[minhashSignatureWide]] for consumers that iterate hash index.
    */
  def minhashSignature(df: DataFrame, idCol: String, textCol: String,
                       k: Int, n: Int = 3): DataFrame = {
    val pairs = (0 until k).flatMap(i => Seq(lit(i).cast("int"), col(s"h$i")))
    minhashSignatureWide(df, idCol, textCol, k, n)
      .select(col("doc_id"), explode(map(pairs: _*)).as(Seq("i", "h")))
  }

  /** MinHash calibration report over a bounded AUDIT slice: per doc pair
    * with any shingle overlap, the exact n-gram Jaccard next to the k-slot
    * MinHash estimate (`slots_matched / k`). This is how band/row/k
    * parameters get TUNED for a 100 TB dedup run: measure estimator error
    * on a small slice, pick k and the LSH banding from the measured curve,
    * then run the linear-cost [[minhashLshPairs]] corpus-wide. The exact
    * Jaccard requires the quadratic shingle self-join — by contract the
    * caller passes a bounded slice (hundreds of docs), never the corpus.
    *
    * Pairs with zero shared shingles are omitted on BOTH columns: an md5
    * slot match implies a shared shingle, so estimate > 0 ⟹ shared > 0 —
    * the omission cannot bias the report (only all-zero rows drop).
    */
  def lshCalibration(audit: DataFrame, idCol: String, textCol: String,
                     k: Int, n: Int = 3,
                     scope: CacheScope = CacheScope.global): DataFrame = {
    require(k >= 1, "k must be at least 1")
    // three consumers (sizes, pair overlap ×2 sides) — materialize the
    // per-doc distinct shingle rows once
    val sh = scope.persisted(shingleRows(audit, idCol, textCol, n))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val shared = sh.select(col("doc_id").as("doc_a"), col("shingle"))
      .join(sh.select(col("doc_id").as("doc_b"), col("shingle")), Seq("shingle"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
    val sig = minhashSignature(audit, idCol, textCol, k, n)
    val matches = sig.select(col("doc_id").as("doc_a"), col("i"), col("h"))
      .join(sig.select(col("doc_id").as("doc_b"), col("i"), col("h")),
        Seq("i", "h"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("slots_matched"))
    shared
      .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")),
        Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")),
        Seq("doc_b"))
      .join(matches, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), col("shared"), col("n_a"), col("n_b"),
        round(col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")), 6).as("jaccard"),
        coalesce(col("slots_matched"), lit(0L)).as("slots_matched"),
        round(coalesce(col("slots_matched"), lit(0L)).cast("double") / k, 6)
          .as("jaccard_est"))
  }

  /** Corpus-level MinHash signature: the k global minima over EVERY shingle
    * in the dataset, as `(i, h)` rows — a 16-string fingerprint of a whole
    * corpus. Two corpora's signatures estimate their shingle-set Jaccard
    * ([[corpusJaccardEstimate]]): the dataset-versioning / snapshot-diff
    * signal ("how much did this week's crawl overlap last week's") that
    * needs no pairwise doc work at all. One shingle pass, k map-side-
    * combined min aggregates, a single output row per hash — O(corpus)
    * scan, O(k) state, O(k) result.
    */
  def corpusSignature(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 16, n: Int = 3): DataFrame = {
    val aggs = (0 until k).map(i =>
      min(md5(concat(lit(s"$i:"), col("shingle")))).as(s"h$i"))
    val pairs = (0 until k).flatMap(i => Seq(lit(i).cast("int"), col(s"h$i")))
    shingleRows(df, idCol, textCol, n)
      .agg(aggs.head, aggs.tail: _*)
      .select(explode(map(pairs: _*)).as(Seq("i", "h")))
  }

  /** Jaccard resemblance estimate between two [[corpusSignature]] frames:
    * the fraction of hash slots whose global minima coincide. Standard
    * MinHash estimator — error ~ 1/√k; raise k for tighter diffs.
    */
  def corpusJaccardEstimate(a: DataFrame, b: DataFrame): DataFrame = {
    val joined = a.select(col("i"), col("h").as("ha"))
      .join(b.select(col("i"), col("h").as("hb")), Seq("i"))
    joined.agg(count(lit(1)).as("k"),
        sum(when(col("ha") === col("hb"), 1L).otherwise(0L)).as("matches"))
      .select(col("k"), col("matches"),
        round(col("matches").cast("double") / col("k"), 6).as("jaccard_est"))
  }

  /** Small single-file tables scan as one partition; the heavy narrow chains
    * (shingle explode, per-token hashing) need real parallelism before the
    * first shuffle. At 100 TB the scan is already split — this is a no-op
    * there (cheap row-count-preserving round-robin of input splits).
    */
  private[ops] def fanout(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt)

  /** MinHash + LSH candidate pairs: band the k-row signature into
    * `k / rowsPerBand` buckets; docs sharing any band bucket are candidates.
    * The pair join is an equi-join on (band, bucket) — the LSH trick that
    * makes near-dup detection linear-ish at corpus scale.
    */
  def minhashLshPairs(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 8, rowsPerBand: Int = 2, n: Int = 3,
                      scope: CacheScope = CacheScope.global): DataFrame = {
    // both join sides read the signature; the shingle hashing behind it is
    // the expensive part — materialize once, partitioned on the band-bucket
    // join key to keep the candidate join parallel
    val sig = scope.persisted(
      bandedSignature(df, idCol, textCol, k, rowsPerBand, n)
        .repartition(col("band"), col("bucket")))
    sig.toDF("doc_a", "band", "bucket")
      .join(sig.toDF("doc_b", "band", "bucket"), Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("bands_shared"))
  }

  /** Banded signature rows `(doc_id, band, bucket)` — the standing LSH store
    * a production near-dup job maintains (write it bucketed/partitioned on
    * `(band, bucket)` and the candidate probes below are exchange-free on
    * the store side). One bucket string per band per doc.
    */
  def bandedSignature(df: DataFrame, idCol: String, textCol: String,
                      k: Int = 8, rowsPerBand: Int = 2, n: Int = 3): DataFrame = {
    require(k % rowsPerBand == 0, "k must be a multiple of rowsPerBand")
    val bands = (0 until k / rowsPerBand).map { b =>
      val hs = (b * rowsPerBand until (b + 1) * rowsPerBand).map(i => col(s"h$i"))
      struct(lit(b).as("band"), concat_ws("|", hs: _*).as("bucket"))
    }
    minhashSignatureWide(df, idCol, textCol, k, n)
      .select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))
  }

  /** PRODUCTION-path MinHash: integer signatures from ONE codegen'd kernel
    * over the per-doc shingle array ([[graft.expressions.MinHashSig]] —
    * one xxhash64 per shingle + k O(1) splitmix mixes; no explode, no
    * per-hash string concatenation or md5 churn). At corpus scale this is
    * the form to run: the md5-string MinHash ([[minhashSignatureWide]])
    * exists because DuckDB can recompute it bit-for-bit (the AUDIT path —
    * every declared dedup query stays on it); the integer kernel has no
    * cross-engine twin, so this path is spec-verified instead (same-set ⟹
    * same signature; LSH collisions behave identically). A higher-order
    * `transform`+`array_min` formulation was measured 7–12× SLOWER than
    * even the md5 explode+aggregate (HOF lambdas evaluate interpreted) —
    * see SCALING.md; the custom Expression is what makes this path fast.
    *
    * Output: (doc_id, sig array<long>); docs with no shingles are absent,
    * matching the md5 form.
    */
  def fastMinhashSignature(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 8, n: Int = 3): DataFrame = {
    require(k >= 1, "k must be at least 1")
    fanout(df)
      .select(col(idCol).as("doc_id"),
        graft.functions.minhash_text(col(textCol), n, k).as("sig"))
      .filter(col("sig").isNotNull)
  }

  /** Banded LSH rows from [[fastMinhashSignature]]: bucket = xxhash64 of the
    * band's signature slice — (doc_id, band, bucket) with a LONG bucket key
    * (16 bytes/row vs the audit path's md5-hex strings; the standing store
    * a daily dedup job maintains shrinks ~4×). Join-compatible with
    * [[minhashLshPairs]]/[[incrementalLshPairs]]'s probe logic.
    */
  def fastBandedSignature(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 8, rowsPerBand: Int = 2, n: Int = 3): DataFrame = {
    require(k % rowsPerBand == 0, "k must be a multiple of rowsPerBand")
    val nBands = k / rowsPerBand
    val bands = (0 until nBands).map { b =>
      val slice0 = (b * rowsPerBand until (b + 1) * rowsPerBand)
        .map(i => element_at(col("sig"), i + 1))
      struct(lit(b).as("band"),
        xxhash64(lit(b) +: slice0: _*).as("bucket"))
    }
    fastMinhashSignature(df, idCol, textCol, k, n)
      .select(col("doc_id"), explode(array(bands: _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }

  /** Incremental MinHash-LSH: candidate pairs TOUCHING a new batch, probed
    * against the standing banded-signature store — the daily-ingest shape.
    * Only the batch is shingled/hashed; the standing corpus contributes its
    * (tiny) signature rows, so the job is O(|batch| + collisions), never
    * O(corpus). Pairs are normalized (`doc_a < doc_b`) and count shared
    * bands exactly like [[minhashLshPairs]]; both new-vs-standing and
    * new-vs-new pairs emit (the per-(pair, band) `distinct` collapses the
    * double match when both sides sit in the batch). Append `newSigs` to
    * the store afterwards — the returned pair frame never contains
    * standing-vs-standing pairs, which the store already produced.
    */
  def incrementalLshPairs(newSigs: DataFrame, standingSigs: DataFrame): DataFrame = {
    val all = standingSigs.select("doc_id", "band", "bucket")
      .unionByName(newSigs.select("doc_id", "band", "bucket"))
    newSigs.select(col("doc_id").as("doc_n"), col("band"), col("bucket"))
      .join(all, Seq("band", "bucket"))
      .filter(col("doc_n") =!= col("doc_id"))
      .select(least(col("doc_n"), col("doc_id")).as("doc_a"),
        greatest(col("doc_n"), col("doc_id")).as("doc_b"), col("band"))
      .distinct()
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("bands_shared"))
  }

  /** SimHash-64: per-token md5, bit j of the hash votes ±1 on signature bit j;
    * sign of the vote sum is the bit. Emitted as two unsigned 32-bit halves
    * (lo = bits 0..31) so the value stays in signed BIGINT range on every
    * engine. Bit j of md5 = bit (j mod 4) of hex digit (j div 4) — defined on
    * the hex string so SQL engines reproduce it exactly.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = fanout(df).select(col(idCol).as("doc_id"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col("doc_id"), md5(col("tok")).as("h"))
    // one ±1 vote sum per signature bit, all 64 in a SINGLE groupBy: the
    // partial (map-side) aggregate carries 64 longs per doc instead of the
    // 64× exploded bit rows through two shuffles — shuffle volume is
    // O(docs·64 longs), independent of token count. Bit j of md5 = bit
    // (j mod 4) of hex digit (j div 4); j is a literal here so the digit
    // index and shift constant-fold into codegen.
    val votes = (0 until 64).map { j =>
      val digit = conv(col("h").substr(j / 4 + 1, 1), 16, 10).cast("int")
      sum(shiftright(digit, j % 4).mod(2) * 2 - 1).as(s"s$j")
    }
    def half(lo: Int): Column = (0 until 32).map { b =>
      when(col(s"s${lo + b}") > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
    toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        half(0).cast("long").as("simhash_lo"),
        half(32).cast("long").as("simhash_hi"))
  }

  /** SimHash near-dup pairs via the pigeonhole band trick (Charikar 2002 /
    * Manku et al. 2007): split the 64-bit signature into 4 bands of 16 bits —
    * any pair within hamming distance 3 MUST share at least one band exactly,
    * so candidates come from an equi-join on (band, 16-bit key) and only
    * candidates pay the exact `bit_count(xor)` check. Never all-pairs; the
    * band key space (65536 per band) bounds bucket occupancy at corpus scale
    * the same way LSH bands do.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3,
                   scope: CacheScope = CacheScope.global): DataFrame =
    simhashPairsFrom(simhash(df, idCol, textCol), maxHamming, scope)

  /** [[simhashPairs]] from an ALREADY-COMPUTED signature table
    * (doc_id, simhash_lo, simhash_hi) — the gold-lifecycle entry point
    * (r19): the signature pass is the expensive stage (one token-explode
    * groupBy over the corpus) and it feeds both the signature report and
    * the pair derivation, so production maintains it once and every
    * consumer reads it. Bit-identical to [[simhashPairs]] given the same
    * signatures (the band split and hamming check start from the stored
    * longs either way).
    */
  def simhashPairsFrom(sig0: DataFrame, maxHamming: Int = 3,
                       scope: CacheScope = CacheScope.global): DataFrame = {
    require(maxHamming <= 3, "4 bands of 16 bits guarantee recall only to hamming 3")
    val sig = scope.persisted(sig0.repartition(col("doc_id")))
    val bands = (0 until 4).map { b =>
      val half = if (b < 2) col("simhash_lo") else col("simhash_hi")
      val key = shiftright(half, (b % 2) * 16).mod(65536L)
      struct(lit(b).as("band"), key.as("key"))
    }
    val banded = sig.select(col("doc_id"), col("simhash_lo"), col("simhash_hi"),
      explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("simhash_lo"), col("simhash_hi"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    val a = banded.toDF("doc_a", "lo_a", "hi_a", "band", "key")
    val b = banded.toDF("doc_b", "lo_b", "hi_b", "band", "key")
    a.join(b, Seq("band", "key"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (bit_count(col("lo_a").bitwiseXOR(col("lo_b"))) +
          bit_count(col("hi_a").bitwiseXOR(col("hi_b")))).cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct() // a pair may share several bands
  }

  /** Cross-document chunk-level dedup (the sub-document granularity of
    * C4/Dolma paragraph dedup, on synthetic fixed-size chunks since the
    * corpus has no paragraph marks): chunk every document
    * ([[Curation.chunkDocs]], zero overlap so each token belongs to one
    * chunk), keep the FIRST occurrence of each chunk content corpus-wide
    * (lowest doc id, then chunk index), and report each document's duplicate
    * mass — how many of its chunks already exist elsewhere. `dup_frac` is
    * the quality signal curation pipelines threshold on.
    *
    * Scale: one shuffle on the chunk digest (16-byte key) + one on the doc
    * id for the rollup — the same two-shuffle profile as exact doc dedup,
    * ×(chunks per doc) rows.
    */
  /** Content-defined chunking dedup (the storage-dedup/LBFS boundary trick
    * applied to corpus text): cut each document where the rolling k-gram
    * hash ≡ 0 (mod `div`) — boundaries anchor to CONTENT, not offsets, so
    * inserting a prefix shifts every fixed-size chunk but leaves every
    * content-defined chunk after the first shared cut intact. Expected chunk
    * length ≈ `div` chars. Chunks partition the document exactly (forced cut
    * at position 1); each chunk's md5 keeps its corpus-wide FIRST occurrence
    * (lowest doc id, then position) and the per-document report counts the
    * duplicated remainder in chars — the signal that catches quoted/ shifted
    * passages fixed-size [[chunkDedup]] misses.
    *
    * This is the boundary-only variant (no min/max chunk clamp): every cut
    * decision is a pure function of the k chars under it, so cut selection
    * is a NARROW codegen'd map — the min-size variant needs a sequential
    * scan per doc and buys little at audit granularity.
    *
    * Scale: cut positions come from one `transform`/`filter` over the
    * [[graft.expressions.RollingKgramHash]] array — no shuffle, no join;
    * the only exchanges are the first-occurrence window on the 16-byte
    * digest and the per-doc rollup, the exact-dedup profile.
    */
  def contentChunkDedup(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 8, div: Int = 64): DataFrame = {
    require(div > 0, "chunk divisor must be positive")
    val t = col(textCol)
    // 1-based cut positions: k-gram starts whose hash hits, plus the forced
    // doc-start cut (position 1 excluded from the hash hits so it is never
    // duplicated)
    val hits = filter(
      transform(graft.functions.rolling_kgrams(t, k),
        (h: Column, i: Column) => when(h % div === 0, i + 1)),
      c => c.isNotNull && c > 1)
    val cuts = concat(array(lit(1)), hits)
    val chunkArr = transform(cuts, (c: Column, i: Column) =>
      struct(c.cast("long").as("pos"),
        t.substr(c,
          coalesce(try_element_at(cuts, (i + lit(2)).cast("int")),
            length(t) + 1) - c).as("chunk")))
    val chunks = df
      .select(col(idCol), explode(chunkArr).as("ch"))
      .select(col(idCol), col("ch.pos").as("pos"),
        md5(col("ch.chunk")).as("h"),
        length(col("ch.chunk")).cast("long").as("clen"))
    val w = Window.partitionBy(col("h")).orderBy(col(idCol), col("pos"))
    chunks.withColumn("rn", row_number().over(w))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(col("clen")).as("n_chars"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"),
        sum(when(col("rn") > 1, col("clen")).otherwise(0L)).as("dup_chars"))
      .withColumn("dup_char_frac",
        when(col("n_chars") > 0,
          round(col("dup_chars").cast("double") / col("n_chars"), 6)))
  }

  /** Duplicate-passage SCRUB — the rewrite step of sub-document dedup
    * (CCNet/FineWeb line-removal semantics over fixed word-window segments,
    * since this corpus has no newlines): every `segTokens`-word segment keeps
    * only its corpus-wide FIRST occurrence (global min (doc, position) —
    * later repeats in the same doc drop too), and each document is
    * re-assembled from its surviving segments in order. [[chunkDedup]]
    * profiles duplicate mass; this emits the cleaned corpus a training run
    * would actually read.
    *
    * Scale: one shuffle keyed on `md5(seg)` — a fixed 16-byte key, so the
    * window's shuffle/sort compares digests instead of full segment text
    * (the text rides along as a VALUE column only; at corpus scale the raw
    * text as both key and value doubled the exchanged bytes and made every
    * sort comparison O(segment length)). 128-bit digests make a cross-text
    * collision astronomically unlikely (~n²/2¹²⁸); one doc-keyed groupBy
    * re-stitches. Never all-pairs; shuffle volume = corpus token count.
    *
    * Null-text docs are treated as empty text (coalesce before tokenizing),
    * so they surface with one empty segment instead of silently vanishing
    * from the output — pinned by a DedupSpec fixture.
    */
  def scrubSegments(df: DataFrame, idCol: String, textCol: String,
                    segTokens: Int): DataFrame = {
    val segs = segmentize(df, idCol, textCol, segTokens)
    val w = Window.partitionBy(unhex(md5(col("seg"))))
      .orderBy(col("doc_id"), col("seg_idx"))
    restitch(segs.withColumn("rn", row_number().over(w))
      .withColumn("kept", col("rn") === 1))
  }

  /** The segmentation half of [[scrubSegments]], shared with
    * [[graft.streaming.StreamingScrub]]: fixed `segTokens`-word windows as
    * `(doc_id, seg_idx, seg)` rows. Null text coalesces to `''` — every
    * input doc emits at least one (possibly empty) segment, so no doc can
    * silently vanish from a scrub output.
    */
  def segmentize(df: DataFrame, idCol: String, textCol: String,
                 segTokens: Int): DataFrame = {
    require(segTokens > 0, "segTokens must be positive")
    df.select(col(idCol).as("doc_id"),
        TextOps.tokens(coalesce(col(textCol), lit(""))).as("__toks"))
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), greatest(size(col("__toks")), lit(1)), lit(segTokens)),
          s => array_join(slice(col("__toks"), s, lit(segTokens)), " ")))
          .as(Seq("seg_idx", "seg")))
  }

  /** The re-stitch half of [[scrubSegments]] (shared with the streaming
    * twin): collapse flagged `(doc_id, seg_idx, seg, kept)` rows back to one
    * row per doc, surviving segments re-joined in position order.
    */
  def restitch(flagged: DataFrame): DataFrame =
    flagged.groupBy("doc_id")
      .agg(count(lit(1)).as("n_segs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        array_join(transform(sort_array(collect_list(
            when(col("kept"), struct(col("seg_idx"), col("seg"))))),
          x => x.getField("seg")), " ").as("clean_text"))

  /** ExactSubstr-style duplicate-span PROFILE (the detection half of Lee et
    * al. 2021's "Deduplicating Training Data Makes Language Models Better",
    * §4.1 ExactSubstr): every `w`-token window at STRIDE 1 is digested; a
    * window is duplicated when its digest occurs ≥2 times corpus-wide
    * (cross-doc or self-repeat). Per doc: window count, duplicated-window
    * count, duplicated fraction. Fixed-window operators structurally miss
    * offset-shifted repeats — a passage repeated at a different token
    * offset never aligns with a fixed segment boundary but ALWAYS aligns
    * with some stride-1 window — so this is the detector you run to decide
    * whether [[scrubSegments]]' rewrite is worth its shuffle, and
    * `dup_frac`'s corpus distribution is the scrub's calibration curve.
    *
    * Scale: one row per token position (the honest stride-1 price — the
    * same O(corpus tokens) volume as the shingle shuffle in
    * [[ngramJaccardPairs]]), each row a 16-byte md5 digest + ids, never
    * window text; occurrence counting rides ONE digest-keyed window pass
    * (count over an unordered frame — no join-back, no second scan of the
    * big frame), then one doc-keyed rollup. Docs shorter than `w` tokens
    * emit one whole-doc window, so every doc appears in the profile.
    */
  def dupSpanCoverage(df: DataFrame, idCol: String, textCol: String,
                      w: Int): DataFrame = {
    val wins = spanWindows(df, idCol, textCol, w)
    val occ = count(lit(1)).over(Window.partitionBy(col("wkey")))
    wins.withColumn("occ", occ)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("occ") >= 2, 1L).otherwise(0L)).as("n_dup_windows"))
      .withColumn("dup_frac",
        round(col("n_dup_windows").cast("double") / col("n_windows"), 6))
  }

  /** Stride-1 window digests: `(doc_id, wkey)` with one 16-byte md5 per
    * token position (shared by [[dupSpanCoverage]] and
    * [[incrementalSpanCoverage]]; `.select("wkey").distinct()` of this is
    * the standing span store an incremental profile probes).
    */
  def spanWindows(df: DataFrame, idCol: String, textCol: String,
                  w: Int): DataFrame =
    spanWindowsAt(tokenArrays(df, idCol, textCol), w).drop("pos")

  /** ExactSubstr REWRITE (the removal half of Lee et al. 2021 §4.1, stride-1
    * grain): every `w`-token window keeps its corpus-wide FIRST occurrence
    * (global min (doc, position) — the same total order as
    * [[scrubSegments]]); every LATER occurrence marks its `w` token
    * positions as covered, and each document is re-assembled from its
    * uncovered tokens in order. Catches the offset-shifted repeated passage
    * that fixed-window [[scrubSegments]] structurally cannot align — the
    * duplicated span is removed wherever it re-occurs, at ANY offset, while
    * its first occurrence survives verbatim.
    *
    * Scale: the window pass is O(corpus tokens) of 16-byte digests (same as
    * [[dupSpanCoverage]]); the w× position fanout happens ONLY for
    * duplicated non-first windows (duplicate mass, not corpus mass); the
    * cover join is a (doc, position)-keyed equi-join of integers. The keep
    * rule is a total order, so output is partitioning-independent
    * (spec-pinned like the segment scrub).
    */
  def scrubSpans(df: DataFrame, idCol: String, textCol: String, w: Int,
                 scope: CacheScope = CacheScope.global): DataFrame = {
    // token arrays feed BOTH the window pass and the token explode
    val toks = scope.persisted(tokenArrays(df, idCol, textCol))
    val wins = spanWindowsAt(toks, w)
    val rnW = Window.partitionBy(col("wkey")).orderBy(col("doc_id"), col("pos"))
    val covered = wins.withColumn("rn", row_number().over(rnW))
      .filter(col("rn") > 1)
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + (w - 1))).as("tpos"))
      .distinct()
      .withColumn("__cov", lit(true))
    assembleUncovered(toks, covered)
  }

  /** `(doc_id, __toks)` token arrays with the null→'' coalesce every span
    * operator shares.
    */
  def tokenArrays(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).as("doc_id"),
      TextOps.tokens(coalesce(col(textCol), lit(""))).as("__toks"))

  /** Stride-1 window digests WITH their 1-based start positions:
    * `(doc_id, pos, wkey)` over a [[tokenArrays]] frame — the position-aware
    * form [[scrubSpans]] and [[graft.streaming.StreamingScrub]]'s span twin
    * share ([[spanWindows]] is the position-free profile form).
    */
  def spanWindowsAt(toks: DataFrame, w: Int): DataFrame = {
    require(w > 0, "window tokens must be positive")
    toks.select(col("doc_id"),
        posexplode(transform(
          sequence(lit(1), greatest(size(col("__toks")) - (w - 1), lit(1))),
          s => unhex(md5(array_join(slice(col("__toks"), s, lit(w)), " ")))))
          .as(Seq("__p0", "wkey")))
      .withColumn("pos", col("__p0") + 1) // transform order ⇒ start = idx+1
      .select("doc_id", "pos", "wkey")
  }

  /** Re-assemble docs from tokens NOT in `covered` (`(doc_id, tpos, __cov)`
    * rows): `n_tokens`, `n_removed`, and `clean_text` in position order —
    * the rewrite half [[scrubSpans]] and the streaming span twin share.
    */
  def assembleUncovered(toks: DataFrame, covered: DataFrame): DataFrame =
    toks.select(col("doc_id"), posexplode(col("__toks")).as(Seq("__t0", "tok")))
      .withColumn("tpos", col("__t0") + 1)
      .join(covered, Seq("doc_id", "tpos"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__cov").isNotNull, 1L).otherwise(0L)).as("n_removed"),
        array_join(transform(sort_array(collect_list(
            when(col("__cov").isNull, struct(col("tpos"), col("tok"))))),
          x => x.getField("tok")), " ").as("clean_text"))

  /** Incremental [[dupSpanCoverage]] — the continuous-ingestion form: only
    * the BATCH is segmented (O(batch tokens)); duplication against history
    * comes from probing `standingKeys` (one distinct 16-byte digest per
    * standing window — the same text-free store discipline as
    * [[graft.streaming.StreamingScrub]]), so the standing corpus is never
    * rescanned. A batch window is duplicated when it repeats WITHIN the
    * batch (occurrence ≥2) or hits the store; `n_standing_hits` separates
    * the cross-snapshot signal, mirroring [[incrementalExact]]'s
    * `dup_of_standing`.
    *
    * Scale: one digest-keyed window pass over the batch + one digest
    * equi-join against the store — both on fixed 16-byte keys.
    */
  def incrementalSpanCoverage(batch: DataFrame, idCol: String, textCol: String,
                              w: Int, standingKeys: DataFrame): DataFrame = {
    val wins = spanWindows(batch, idCol, textCol, w)
    val seen = standingKeys.select(col("wkey")).distinct()
      .withColumn("__seen", lit(true))
    val occ = count(lit(1)).over(Window.partitionBy(col("wkey")))
    wins.withColumn("occ", occ)
      .join(seen, Seq("wkey"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when(col("occ") >= 2 || col("__seen").isNotNull, 1L)
          .otherwise(0L)).as("n_dup_windows"),
        sum(when(col("__seen").isNotNull, 1L).otherwise(0L))
          .as("n_standing_hits"))
      .withColumn("dup_frac",
        round(col("n_dup_windows").cast("double") / col("n_windows"), 6))
  }

  def chunkDedup(df: DataFrame, idCol: String, textCol: String,
                 chunkTokens: Int): DataFrame = {
    val chunks = Curation.chunkDocs(df, idCol, textCol, chunkTokens, 0)
    val w = Window.partitionBy(col("chunk_md5"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    chunks
      .withColumn("rn", row_number().over(w))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_chunks"))
      .withColumn("dup_frac",
        round(col("n_dup_chunks").cast("double") / col("n_chunks"), 6))
  }

  /** Connected components over an undirected near-dup pair list: every doc in
    * the pair graph gets `cluster` = the minimum doc id reachable from it, and
    * `is_canonical` marks the cluster representative — the keep-one-per-cluster
    * resolution step that turns pairwise similarity output into dedup
    * decisions.
    *
    * TWO-TIER resolution, both tiers converging to the same unique labeling
    * (component-minimum ids), so the escalation is invisible in results:
    *
    *   1. Min-label propagation for up to `propRounds` rounds — ONE cheap
    *      join+groupBy per round. Real near-dup clusters are stars (copies
    *      of one document, diameter ≤ 2) and resolve here in a round or
    *      two; this tier exists so the common case never pays the star
    *      machinery (switching wholesale to star rounds measured +75% on
    *      pair_components at sf0.1).
    *   2. If propagation hasn't reached its fixpoint — rounds track
    *      component DIAMETER, so a deep chain exhausts the budget —
    *      escalate to alternating large-star / small-star rounds (Kiveris
    *      et al., "Connected Components in MapReduce and Beyond",
    *      SoCC 2014), which are diameter-INDEPENDENT. Each round rewrites
    *      the edge set from every node's neighborhood minimum
    *      `m(u) = min(Γ(u) ∪ u)`: large-star connects each strictly
    *      larger neighbor to m(u) (long tails fold toward local minima);
    *      small-star connects each smaller neighbor and u itself to m(u)
    *      (local minima chain toward the component minimum). Both
    *      operations preserve connectivity and node presence (paper §3),
    *      so the fixpoint — an edge set both leave unchanged — is a
    *      disjoint union of STARS centered at component minima; rounds
    *      grow with log(component size) (the 30-hop chain fixture: 3 star
    *      rounds where propagation needs 30). Labels read directly off
    *      the star edges: leaf → its center, center → itself.
    *
    * Scale: the star tier's edge frame only ever holds CANONICAL (lo < hi)
    * distinct pairs — bounded by the input pair count; each round is two
    * groupBy-join-distinct passes keyed on node id behind an eager
    * constraint-free truncation
    * ([[org.apache.spark.sql.graftbridge.bridge.truncated]] — see its doc
    * for why `Dataset.localCheckpoint` is poison in two-reference loops).
    * The star fixpoint test rides the round's shuffle shape: equal edge
    * counts plus an empty one-sided anti-join certify set equality for
    * distinct sets.
    *
    * Converge-or-fail: `maxRounds` caps the STAR tier, and exhausting it
    * throws rather than silently mislabeling — this operator feeds cluster
    * resolution, leak-free splits, and the curation funnel, where a wrong
    * cluster id quietly changes which documents survive. The log-round
    * bound makes the default cap astronomically deep (2^20-node
    * components), so in practice it guards corrupt topology, not honest
    * graphs.
    */
  def dupClusters(pairs: DataFrame, aCol: String, bCol: String,
                  maxRounds: Int = 20, propRounds: Int = 4): DataFrame =
    propagationClusters(pairs, aCol, bCol, propRounds).getOrElse(
      starClusters(pairs, aCol, bCol, maxRounds))

  /** Tier-1 resolver (see [[dupClusters]]): min-label propagation, up to
    * `rounds` rounds. Some(labels) on fixpoint, None when the budget runs
    * out — the caller escalates, it never throws.
    */
  private def propagationClusters(pairs: DataFrame, aCol: String,
                                  bCol: String, rounds: Int): Option[DataFrame] = {
    val edges = pairs.select(col(aCol).as("id"), col(bCol).as("nbr"))
      .union(pairs.select(col(bCol).as("id"), col(aCol).as("nbr")))
      .filter(col("id").isNotNull)
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // seed with the one-hop minimum (id vs smallest neighbor): the node
    // list needs a groupBy anyway, and a star-shaped cluster converges in
    // a single round from this seed. Plain localCheckpoint here, NOT
    // bridge.truncated: the constraint-rewrite blowup it exists to dodge
    // doubles per checkpoint generation, and this tier is capped at
    // `rounds` (default 4) generations — ≤16 carried constraint exprs,
    // harmless — while the truncation helper's extra materialization pass
    // measured ~+0.12 s per call on the hot resolution path. The UNCAPPED
    // star tier below is where the helper is load-bearing.
    var labels = edges.groupBy(col("id"))
      .agg(min(col("nbr")).as("__m"))
      .select(col("id"), least(col("id"), col("__m")).as("cluster"))
      .localCheckpoint()
    var round = 0
    var changed = 1L
    while (changed > 0 && round < rounds) {
      val nbrMin = edges
        .join(labels.select(col("id").as("nbr"), col("cluster").as("nbr_cluster")), "nbr")
        .groupBy("id").agg(min("nbr_cluster").as("nbr_min"))
      val next = labels.join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nbr_min"), col("cluster"))).as("cluster"),
          (coalesce(col("nbr_min"), col("cluster")) < col("cluster")).as("moved"))
        .localCheckpoint()
      changed = next.filter(col("moved")).count()
      labels = next.select("id", "cluster")
      round += 1
    }
    edges.unpersist()
    if (changed > 0) None
    else Some(labels.select(col("id"), col("cluster"),
      (col("id") === col("cluster")).as("is_canonical")))
  }

  /** Tier-2 resolver (see [[dupClusters]]): alternating large-star /
    * small-star to the union-of-stars fixpoint, converge-or-fail.
    */
  private def starClusters(pairs: DataFrame, aCol: String, bCol: String,
                           maxRounds: Int): DataFrame = {
    var e = bridge.truncated(
      pairs.select(least(col(aCol), col(bCol)).as("lo"),
          greatest(col(aCol), col(bCol)).as("hi"))
        .filter(col("lo").isNotNull && col("lo") =!= col("hi"))
        .distinct())
    var round = 0
    var converged = false
    while (round < maxRounds && !converged) {
      val next = bridge.truncated(star(star(e, large = true), large = false))
      // distinct canonical sets: same count + nothing in next missing from
      // e ⟹ equal sets (one anti-join, no symmetric difference needed)
      converged = next.count() == e.count() &&
        next.join(e, Seq("lo", "hi"), "left_anti").isEmpty
      e = next
      round += 1
    }
    require(converged, s"dupClusters: star rounds did not reach the " +
      s"union-of-stars fixpoint within maxRounds=$maxRounds; raise " +
      "maxRounds — rounds grow with log(component size)")
    // the fixpoint is a union of stars: every edge is (center, leaf) with
    // center = component min, so labels are one aggregate over the
    // symmetric view — leaf → min neighbor, center → itself. The final
    // left join against the ORIGINAL endpoint set keeps the output's node
    // universe exactly the input's (a degenerate self-pair row (x, x)
    // never enters the star rounds but must still label x as its own
    // singleton cluster, as the propagation implementation did).
    val starLabels = e.select(col("lo").as("id"), col("hi").as("nbr"))
      .union(e.select(col("hi").as("id"), col("lo").as("nbr")))
      .groupBy("id").agg(min(col("nbr")).as("__m"))
      .select(col("id"), least(col("id"), col("__m")).as("cluster"))
    val nodes = pairs.select(col(aCol).as("id"))
      .union(pairs.select(col(bCol).as("id")))
      .filter(col("id").isNotNull).distinct()
    // one last truncation so CONSUMERS see a leaf, not the label-assembly
    // exchanges — the declared queries' shuffle budgets (and any caller
    // joining the labels twice) count live exchanges in the returned plan,
    // and the labels are node-bounded and already being materialized once
    // per fixpoint check anyway
    bridge.truncated(nodes.join(starLabels, Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster"), col("id")).as("cluster"))
      .select(col("id"), col("cluster"),
        (col("id") === col("cluster")).as("is_canonical")))
  }

  /** One star operation over a canonical (lo < hi) distinct edge frame —
    * see [[dupClusters]]. Output is again canonical and distinct; emitted
    * (v, m) edges always satisfy m < v (m ≤ u and, in the large arm,
    * u < v; in the small arm self-pairs are the only m = v cases and are
    * filtered), so `least/greatest` is re-canonicalization, not a guess.
    */
  private def star(e: DataFrame, large: Boolean): DataFrame = {
    val sym = e.select(col("lo").as("u"), col("hi").as("v"))
      .union(e.select(col("hi").as("u"), col("lo").as("v")))
    val m = sym.groupBy("u").agg(min(col("v")).as("__n"))
      .select(col("u"), least(col("u"), col("__n")).as("m"))
    val j = sym.join(m, "u")
    val emitted =
      if (large) j.filter(col("v") > col("u")).select(col("v"), col("m"))
      else j.filter(col("v") < col("u")).select(col("v"), col("m"))
        .union(m.select(col("u").as("v"), col("m"))) // u itself joins its min
    emitted.filter(col("v") =!= col("m"))
      .select(least(col("v"), col("m")).as("lo"),
        greatest(col("v"), col("m")).as("hi"))
      .distinct()
  }

  /** Hybrid near-dup pairs: MinHash-LSH TEXT candidates confirmed by
    * EMBEDDING cosine — the two-signal fusion a production curation stack
    * runs, because each signal fails alone: shingle LSH misses paraphrases
    * that keep few exact n-grams, and embedding similarity happily marries
    * documents that merely share a topic. A pair survives only when the
    * lexical candidate generator proposed it AND the semantic check agrees
    * (`cos ≥ cosThreshold`); `is_dup` carries the verdict alongside both
    * evidence columns so a triage queue can sort by either.
    *
    * `emb` maps `vecIdCol` to the SAME id space as `docs(idCol)` — the
    * caller owns that correspondence (here: vec i is doc i's embedding).
    *
    * Scale: candidate volume is bounded by the LSH band-bucket join (never
    * all-pairs); the verify stage joins candidates to the embedding table
    * twice on its key — co-partitioned equi-joins proportional to the
    * CANDIDATE count, so the expensive exact cosine runs only where the
    * cheap signal already fired (the standard retrieve-then-rerank shape).
    */
  def hybridNearDupPairs(docs: DataFrame, emb: DataFrame, idCol: String,
                         textCol: String, vecIdCol: String, vecCol: String,
                         cosThreshold: Double, k: Int = 8, rowsPerBand: Int = 2,
                         n: Int = 3,
                         scope: CacheScope = CacheScope.global): DataFrame =
    cosineVerifyPairs(
      minhashLshPairs(docs, idCol, textCol, k, rowsPerBand, n, scope),
      emb, "doc_a", "doc_b", vecIdCol, vecCol, cosThreshold)

  /** The verify stage of [[hybridNearDupPairs]], reusable over ANY candidate
    * pair frame (a materialized LSH gold stage, simhash pairs, fuzzy-join
    * output): joins both pair sides to the embedding table on its key and
    * scores exact cosine. Candidate columns pass through; `cos`/`is_dup`
    * append the semantic verdict.
    */
  def cosineVerifyPairs(cand: DataFrame, emb: DataFrame, aCol: String,
                        bCol: String, vecIdCol: String, vecCol: String,
                        cosThreshold: Double): DataFrame = {
    val e = emb.select(col(vecIdCol).as("vid"),
        Similarity.vecd(col(vecCol)).as("v"))
      .withColumn("nrm", Similarity.l2norm(col("v")))
    val cos = graft.functions.vec_dot(col("va"), col("vb")) /
      nullif(col("na") * col("nb"), lit(0.0))
    val passthrough = cand.columns.map(col).toSeq
    cand
      .join(e.select(col("vid").as(aCol), col("v").as("va"),
        col("nrm").as("na")), aCol)
      .join(e.select(col("vid").as(bCol), col("v").as("vb"),
        col("nrm").as("nb")), bCol)
      .select(passthrough :+ round(cos, 6).as("cos") :+
        (cos >= cosThreshold).as("is_dup"): _*)
  }
}
