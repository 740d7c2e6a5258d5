package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.CacheScope

/** Text-analysis operators for a large-scale training-data pipeline, run over
  * the `documents` table (doc_id, text, lang, source, n_chars). These extend
  * the reference's capability surface (it has no text ops) with the standard
  * LLM-data-prep toolkit: token counting, quality scoring, language ID,
  * document fingerprinting.
  *
  * All column logic is codegen'd built-ins (split/regexp/aggregate) — no UDFs —
  * and every operator is a narrow map over the scan: no shuffle except the
  * final deterministic ORDER BY in the declared queries. At 100 TB these run
  * at full scan throughput with column pruning (only `text` + id are read).
  */
object TextOps {

  /** Whitespace tokens. The testdata is single-space word soup; real corpora
    * want `\\s+` — both engines split identically on the regex.
    */
  def tokens(text: Column): Column = split(text, " ")

  /** Unicode hygiene pass — the standard C4/Dolma-style cleanup applied
    * before any tokenization or hashing: strip control characters, strip
    * zero-width/BOM code points, collapse whitespace runs to single spaces,
    * trim. Deliberately NOT lossy beyond that (no case folding, no accent
    * stripping) — dedup fingerprints downstream must not merge texts that
    * differ in content.
    *
    * One narrow codegen'd map; regex classes are spelled explicitly (hex and
    * `\x{...}` escapes) so Java regex and RE2-based engines — the oracle —
    * match the identical character sets (`\s` differs between the two).
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(regexp_replace(regexp_replace(c,
      "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]", ""),
      "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}]", ""),
      "[ \\t\\n\\r\\f]+", " "))

  /** HTML → text extraction — the step BEFORE every text-quality signal
    * when the corpus arrives as markup (the C4/CCNet lineage starts here):
    * drop script/style subtrees WITH their contents (their text is code,
    * not prose), drop comments, turn every remaining tag into a space
    * (tag boundaries are word boundaries — `<p>a</p><p>b</p>` must not
    * fuse into "ab"), decode character references (the six ubiquitous
    * named entities PLUS numeric `&#NNN;`/`&#xHH;` for the printable
    * subset — [[graft.expressions.EntityDecode]]), collapse whitespace.
    * The block/tag/comment rules stay regex in the Java∩RE2 subset
    * ([[normalizeText]]'s discipline): `(?s)` dot-all with non-greedy
    * bodies, explicit whitespace class for the collapse.
    *
    * The block rule is ONE alternation of two COMPLETE per-tag patterns
    * (`<script…</script> | <style…</style>`), which is the only regex
    * shape that survives both cross-match directions without a
    * backreference (staying RE2): the grouped-alternation form
    * `<(script|style)…</(script|style)>` lets a block open as one tag and
    * close as the other (`<style>x</script>y</style>` terminated at
    * `</script>` and leaked `y`), while two SEQUENTIAL per-tag passes let
    * a literal `<script` inside a style body hijack the script pass and
    * delete prose past the block (`<style>.a{content:"<script>"}</style>
    * <p>Hi</p><script>x</script>` lost `Hi`). With complete alternatives,
    * the regex engine's leftmost-match rule means whichever block OPENS
    * first is consumed to its OWN closing tag — embedded opener tokens are
    * just body text.
    *
    * Entity decode is ONE left-to-right pass, which is what makes the
    * single-decode reading hold everywhere at once: `&amp;lt;` yields the
    * literal `&lt;`, `&amp;#65;` the literal `&#65;`, and `&#38;amp;` the
    * literal `&amp;` — no regex ordering can satisfy all three (see
    * [[graft.expressions.EntityDecode]]).
    *
    * One narrow codegen'd map — no shuffle, no UDF; a full-corpus
    * extraction is scan-speed.
    */
  def htmlExtract(c: Column): Column = {
    val noBlocks = regexp_replace(c,
      "(?s)<script[^>]*>.*?</script>|<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noBlocks, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "<[^>]+>", " ")
    val ent = graft.functions.entity_decode(noTags)
    trim(regexp_replace(ent, "[ \\t\\n\\r\\f]+", " "))
  }

  /** [[htmlExtract]] over a frame, with the audit columns an intake wants
    * alongside the cleaned text: the tag count (markup density is itself a
    * quality signal) and whether the row looked like HTML at all.
    * Output: (idCol, text_clean, n_tags, had_html).
    */
  def htmlExtractDocs(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      htmlExtract(col(textCol)).as("text_clean"),
      size(regexp_extract_all(col(textCol), lit("<[^>]+>"), lit(0)))
        .cast("long").as("n_tags"),
      (size(regexp_extract_all(col(textCol), lit("<[^>]+>"), lit(0))) > 0)
        .as("had_html"))

  /** Token counting (whitespace + a BPE-ish regex): `\\w+` word runs plus
    * single non-space punctuation — the standard pre-tokenizer shape.
    */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(tokens(col(textCol))).as("ws_tokens"),
      size(regexp_extract_all(col(textCol), lit("\\w+|[^\\w\\s]"), lit(0))).as("bpe_tokens"),
      length(col(textCol)).as("n_chars"))

  /** Per-language marker stopwords for the n-gram/stopword language-ID
    * heuristic. Deterministic tie-break: first language in this list wins.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "est"),
    "es" -> Seq("el", "los", "y", "es", "una"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  private def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => markers.map(m => t === lit(m)).reduce(_ || _)))

  /** Language ID: argmax of marker-stopword hit counts, ties broken by
    * [[LangMarkers]] order (first language equal to the max wins).
    */
  def languageId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // token split in its own projection: each markerCount references the
    // array, and inlining the split would re-split the text per language
    val toks = col("__toks")
    val scored = df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(
        col(idCol) +: LangMarkers.map { case (lang, ms) =>
          markerCount(toks, ms).as(s"score_$lang")
        }: _*)
    val best = greatest(LangMarkers.map { case (l, _) => col(s"score_$l") }: _*)
    val pred = LangMarkers.tail.foldLeft(
      when(col(s"score_${LangMarkers.head._1}") === best, LangMarkers.head._1)) {
        case (acc, (lang, _)) => acc.when(col(s"score_$lang") === best, lang)
      }
    scored.select(
      (col(idCol) +: LangMarkers.map { case (l, _) => col(s"score_$l") }) :+
        pred.as("pred_lang"): _*)
  }

  /** Quality scoring: length / punctuation / stopword / uppercase ratios plus
    * a composite score in [0,1] — the standard heuristic pre-filter shape
    * (length-window, low punctuation noise, natural stopword density).
    */
  def qualityScores(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pre = df.select(col(idCol), col(textCol), tokens(col(textCol)).as("__toks"))
    val t = col(textCol)
    val toks = col("__toks")
    val nChars = length(t).cast("double")
    val nToks = size(toks).cast("double")
    val punct = size(regexp_extract_all(t, lit("[^\\w\\s]"), lit(0))).cast("double")
    val upper = size(regexp_extract_all(t, lit("[A-Z]"), lit(0))).cast("double")
    val stop = markerCount(toks, LangMarkers.head._2).cast("double")
    val lenScore = when(nChars.between(100, 400), 1.0).otherwise(0.5)
    val punctRatio = punct / nChars
    val stopRatio = stop / nToks
    val upperRatio = upper / nChars
    pre.select(
      col(idCol),
      size(toks).as("n_tokens"),
      round(punctRatio, 6).as("punct_ratio"),
      round(stopRatio, 6).as("stopword_ratio"),
      round(upperRatio, 6).as("upper_ratio"),
      round(
        lit(0.4) * lenScore
          + lit(0.3) * when(stopRatio.between(0.01, 0.5), 1.0).otherwise(0.0)
          + lit(0.3) * when(punctRatio <= 0.1, 1.0).otherwise(0.0),
        6).as("quality_score"))
  }

  /** (n_chars, t_sum) column kernels for [[charEntropy]] — exposed so the
    * fused ensemble scan ([[graft.ops.Curation.qualitySignals]]) computes
    * the IDENTICAL expressions (same shapes ⇒ same doubles ⇒ the DuckDB
    * twins stay bit-exact) without a join back to this operator's frame.
    */
  private[graft] def entropyTerms(text: Column): (Column, Column) = {
    val t = graft.expressions.col(
      graft.expressions.EntropyTerms(graft.expressions.expr(text)))
    (t.getField("n_chars"), t.getField("t_sum"))
  }

  /** The rounded entropy from [[entropyTerms]]'s (n_chars, t_sum). */
  private[graft] def entropyFrom(nChars: Column, tSum: Column): Column =
    round(log(nChars.cast("double"))
      - tSum.cast("double") / 1000000.0 / nChars, 6)

  /** Per-document Shannon character entropy (nats) — the gibberish/encoding
    * screen: natural text sits ~2.5–3.5 nats, base64/hex blobs and
    * single-character runs fall far outside. `H = ln n − (Σ c·ln c)/n` over
    * per-character counts `c`.
    *
    * Scale/determinism: computed PER ROW by the native one-pass kernel
    * [[graft.expressions.EntropyTerms]] — O(length) per document, zero
    * shuffle, codegen'd. (History, both measured at sf0.1: the original
    * explode-per-char + two hash aggregates ran 0.22 s — shuffle volume
    * was fine via map-side combine, but the 300× row materialization is
    * pure overhead; a higher-order-function rewrite removed the shuffles
    * and ran 3.7 s, 16× worse, because HOFs evaluate interpreted at
    * O(alphabet·length) with UTF8String equality per probe. The native
    * kernel beats both.) The micro-unit LONG quantization is inside the
    * kernel, bit-matching the SQL round (BigDecimal HALF_UP); empty/null
    * text produces no row, exactly like the explode shape.
    */
  def charEntropy(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (nChars, tSum) = entropyTerms(col(textCol))
    df.select(col(idCol).as("doc_id"),
        nChars.as("n_chars"), tSum.as("t_sum"))
      .filter(col("n_chars") > 0)
      .select(col("doc_id"), col("n_chars"),
        entropyFrom(col("n_chars"), col("t_sum")).as("entropy"))
  }

  /** Compression-ratio quality signal (the CCNet/Gopher screen
    * [[charEntropy]] and [[repetitionSignals]] approximate from counts):
    * `deflate_len / utf8_len`. Templated/repetitive text lands well below
    * natural prose (~0.4–0.6); random or already-compressed payloads sit
    * near (or above — deflate framing) 1.0. A narrow codegen'd map
    * ([[graft.functions.deflate_size]]) — zero shuffle, scan throughput.
    * Spec-gated, not oracle-gated: no SQL twin of zlib exists.
    */
  def compressionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      octet_length(col(textCol)).as("n_bytes"),
      graft.functions.deflate_size(col(textCol)).as("deflate_bytes"))
      .withColumn("compression_ratio",
        round(col("deflate_bytes") / col("n_bytes"), 6))

  /** Top-token fraction kernel — the [[repetitionSignals]] `top_tok_frac`
    * expression as a reusable column (same shape in the fused ensemble
    * scan; the quality_ensemble oracle recomputes it independently, so any
    * divergence between the two call sites fails the hash gate).
    */
  private[graft] def topTokFrac(toks: Column): Column =
    round(array_max(transform(array_distinct(toks),
        t => size(filter(toks, x => x === t))))
      .cast("double") / size(toks), 6)

  /** Repetition signals (the Gopher/C4 repetitive-content filters): fraction
    * of tokens taken by the single most frequent token, and the fraction of
    * duplicate 2-grams; `repetitive` flags docs where either exceeds
    * `threshold` (Gopher uses 0.2 for dup-2-gram). All array built-ins — a
    * narrow, shuffle-free map over the scan; the per-row cost is
    * O(distinct·tokens), bounded by document length, never corpus size.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String,
                        threshold: Double = 0.2): DataFrame = {
    val toks = col("__toks")
    val counts = transform(array_distinct(toks), t => size(filter(toks, x => x === t)))
    val grams2 = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    df.select(col(idCol), tokens(col(textCol)).as("__toks"))
      .select(col(idCol), size(toks).as("n_toks"),
        counts.as("__cnts"), grams2.as("__g2"))
      .select(col(idCol), col("n_toks"),
        round(array_max(col("__cnts")).cast("double") / col("n_toks"), 6)
          .as("top_tok_frac"),
        round(when(size(col("__g2")) > 0,
          lit(1.0) - size(array_distinct(col("__g2"))).cast("double")
            / size(col("__g2"))).otherwise(0.0), 6).as("dup_2gram_frac"))
      .withColumn("repetitive",
        col("top_tok_frac") > threshold || col("dup_2gram_frac") > threshold)
  }

  /** Canonical document fingerprint: md5 of whitespace-collapsed, lowercased
    * text — the exact-dedup key. Cross-engine reproducible (md5 is md5).
    */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** Mod-p rolling-hash document fingerprints (Manber-style content
    * fingerprinting): hash every k-gram with the O(n) rolling polynomial
    * ([[graft.expressions.RollingKgramHash]]) and keep positions whose hash
    * ≡ 0 (mod p) — an expected 1/p density, content-anchored selection, so
    * shared substrings select the SAME fingerprints in both documents
    * regardless of alignment. Output: one row per selected k-gram
    * (id, pos, h), 1-based positions. A narrow map + filter: no shuffle, and
    * the per-doc fingerprint count is ~len/p — the overlap-join input at
    * corpus scale is p× smaller than the shingle explode.
    */
  def rollingFingerprints(df: DataFrame, idCol: String, textCol: String,
                          k: Int = 8, p: Int = 16): DataFrame = {
    require(p > 0, "selection modulus p must be positive")
    df.select(col(idCol),
        posexplode(graft.functions.rolling_kgrams(col(textCol), k)).as(Seq("pos0", "h")))
      .filter(col("h") % p === 0)
      .select(col(idCol), (col("pos0") + 1).cast("long").as("pos"), col("h"))
  }

  /** Winnowing fingerprint selection (Schleimer, Wilkerson & Aiken,
    * SIGMOD 2003 — the MOSS algorithm): from each document's rolling
    * k-gram hash sequence, select the MINIMUM hash of every length-`w`
    * window, deduplicated. Unlike [[rollingFingerprints]]' `h % p == 0`
    * sieve — which can leave arbitrarily long unselected gaps, so a
    * matching substring may contribute no shared fingerprint at all —
    * winnowing guarantees every match of length ≥ `w + k − 1` shares at
    * least one selected fingerprint, with expected density 2/(w+1). The
    * guaranteed-recall selection tier for plagiarism/near-dup detection.
    *
    * Implemented as a single narrow projection over two native codegen'd
    * expressions: `rolling_kgrams` then [[graft.expressions.WinnowMin]] —
    * the O(n) monotonic-deque sliding minimum (the naive
    * `transform`/`slice`/`array_min` comprehension is O(n·w) with a
    * w-slice allocation per window and benched 13× slower). No shuffle
    * before the output explode; the window-minimum SET is
    * tie-rule-independent (equal minima share the hash value), which is
    * what makes the DuckDB list-comprehension twin exact. Documents
    * shorter than one window contribute their global minimum (the
    * ≥1-fingerprint convention); documents shorter than `k` contribute
    * nothing. Output: (idCol, h) distinct selected fingerprints.
    */
  def winnowedFingerprints(df: DataFrame, idCol: String, textCol: String,
                           k: Int = 8, w: Int = 8): DataFrame = {
    require(w >= 1, "window must be at least 1")
    val sel = graft.functions.winnow_min(
      graft.functions.rolling_kgrams(col(textCol), k), w)
    df.select(col(idCol), explode(sel).as("h"))
  }

  /** Substring-level near-dup pairs from shared rolling-hash fingerprints
    * (the content-defined-chunking dedup tier between exact-hash and
    * token-shingle methods): two documents sharing `minShared`+ selected
    * k-gram fingerprints share that many (probabilistically distinct) raw
    * substrings — robust to token-boundary edits that break word shingles.
    *
    * Scale shape mirrors [[Dedup.ngramJaccardPairs]]: distinct (doc, hash)
    * rows, a stop-hash guard (a fingerprint in d docs costs d² candidate
    * rows — drop non-discriminative hashes via groupBy-count + broadcast
    * anti-join, which also bounds the list buffer below), then C(d,2) pairs
    * exploded narrowly from each hash's sorted doc list — never all-pairs,
    * and no self-join shuffle of the exploded frame.
    */
  def fingerprintOverlapPairs(df: DataFrame, idCol: String, textCol: String,
                              k: Int = 8, p: Int = 16, minShared: Int = 2,
                              maxDocsPerHash: Int = Int.MaxValue,
                              scope: CacheScope = CacheScope.global): DataFrame = {
    require(minShared >= 1, "minShared must be at least 1")
    // the rolling-hash explode + distinct has two consumers under the guard
    // (hot count + anti-join probe) — materialize it once, same as the
    // shingle frame in Dedup.ngramJaccardPairs; released via `scope`
    val fp0raw = rollingFingerprints(df, idCol, textCol, k, p)
      .select(col(idCol).as("doc_id"), col("h")).distinct()
    val fp0 =
      if (maxDocsPerHash == Int.MaxValue) fp0raw
      else scope.persisted(fp0raw)
    val fpUnp =
      if (maxDocsPerHash == Int.MaxValue) fp0
      else {
        val hot = fp0.groupBy("h").agg(count(lit(1)).as("df_cnt"))
          .filter(col("df_cnt") > maxDocsPerHash)
          .select("h")
        fp0.join(hot, Seq("h"), "left_anti").select("doc_id", "h")
      }
    // pairs from per-hash doc lists (the Dedup.ngramJaccardPairs shape): the
    // guard above caps survivors at maxDocsPerHash docs, so the collect
    // buffer is bounded and the C(d,2) fanout explodes narrowly from ONE
    // groupBy instead of a self-join shuffle over the exploded frame
    val lists = fpUnp.groupBy("h")
      .agg(sort_array(collect_set(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) >= 2)
    val pairsOfList = flatten(transform(col("ds"), (a, i) =>
      transform(slice(col("ds"), i + lit(2), size(col("ds"))), b =>
        struct(a.as("doc_a"), b.as("doc_b")))))
    lists.select(explode(pairsOfList).as("pr"))
      .select(col("pr.doc_a"), col("pr.doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }

  /** BM25 relevance of every document for a bag of query terms (Lucene-style
    * idf: `ln((N - df + 0.5)/(df + 0.5) + 1)`). Two corpus-level scalars
    * (N, avgdl) and one df per term are computed in a single tiny aggregate
    * and broadcast back over the scan — the per-document work is a narrow,
    * codegen'd map. No shuffle of the corpus at any scale.
    */
  def bm25(df: DataFrame, idCol: String, textCol: String, terms: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25 needs at least one query term")
    val base = df.select(col(idCol), tokens(col(textCol)).as("ts"))
      .withColumn("dl", size(col("ts")).cast("double"))
    val withTf = terms.zipWithIndex.foldLeft(base) { case (acc, (t, i)) =>
      acc.withColumn(s"tf_$i", size(filter(col("ts"), x => x === lit(t))).cast("double"))
    }
    val aggs =
      count(lit(1)).cast("double").as("n_docs") ::
      avg(col("dl")).as("avgdl") ::
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1.0).otherwise(0.0)).as(s"df_$i")).toList
    val stats = withTf.agg(aggs.head, aggs.tail: _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i")
      val idf = log((col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl"))))
    }.reduce(_ + _)
    scored.select(col(idCol), round(score, 6).as("bm25"))
  }

  /** BM25 top-k retrieval: the query-side posting plan — explode tokens,
    * keep ONLY the query terms (the posting selection; everything else in
    * the doc never leaves the scan stage), aggregate per-doc term
    * frequencies, score with the same fixed-order BM25 chain as [[bm25]],
    * and return the best `k` docs by raw score (doc id breaks exact ties).
    * Only docs containing at least one query term are retrieval results —
    * the no-match score is identically zero and excluded by construction.
    *
    * Versus [[bm25]] (which scores every document for audit-style use),
    * this is the shape a search serves: per-term posting rows → keyed
    * aggregate → `TakeOrdered` top-k; no full-corpus score materializes.
    * At production scale the posting rows come from a maintained inverted
    * index (the [[Indexing.globalIndex]] family) instead of an explode —
    * the query-side plan from the postings on is identical.
    *
    * Determinism: tf/df/dl are exact integers, the score chain is evaluated
    * in declared term order, and ranking uses the RAW double (identical
    * cross-engine given identical inputs) — rounding happens only in the
    * output projection.
    */
  private def tfAggs(terms: Seq[String]): Seq[Column] =
    terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, 1.0).otherwise(0.0)).as(s"tf_$i")
    }

  def searchTopK(df: DataFrame, idCol: String, textCol: String,
                 terms: Seq[String], k: Int,
                 k1: Double = 1.2, b: Double = 0.75,
                 scope: CacheScope = CacheScope.global): DataFrame = {
    require(terms.nonEmpty, "search needs at least one query term")
    require(terms.distinct.size == terms.size, "query terms must be distinct")
    require(k > 0, "k must be positive")
    val base = df.select(col(idCol).as("doc_id"), tokens(col(textCol)).as("ts"))
      .withColumn("dl", size(col("ts")).cast("double"))
    val stats = base.agg(count(lit(1)).cast("double").as("n_docs"),
      avg(col("dl")).as("avgdl"))
    // one row per matching doc; persisted because the df aggregate and the
    // scoring projection both read it — exchange reuse does not dedupe the
    // two consumers (verified on the executed plan), and the explode+shuffle
    // behind it is the expensive part of the query
    val perDoc = scope.persisted(base
      .select(col("doc_id"), col("dl"), explode(col("ts")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "dl")
      .agg(tfAggs(terms).head, tfAggs(terms).tail: _*))
    val dfAggs = terms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, 1.0).otherwise(0.0)).as(s"df_$i"))
    val dfs = perDoc.agg(dfAggs.head, dfAggs.tail: _*)
    val scored = perDoc.crossJoin(broadcast(stats)).crossJoin(broadcast(dfs))
    val score = terms.indices.map { i =>
      val tf = col(s"tf_$i")
      val idf = log((col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5) + 1.0)
      idf * (tf * (k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * (col("dl") / col("avgdl"))))
    }.reduce(_ + _)
    scored.withColumn("__s", score)
      .orderBy(col("__s").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("__s"), 6).as("bm25"))
  }

  /** Corpus n-gram vocabulary: the `topK` most frequent token n-grams with
    * their occurrence counts (every occurrence counts, not once-per-doc) —
    * the frequency table a BPE/vocab-building pass starts from. Deterministic
    * tie-break at the cut: equal counts order by gram text.
    *
    * Scale: explode is a narrow per-doc fanout (n_tokens rows per doc); the
    * count is ONE shuffle with map-side partial aggregation, and the top-k is
    * TakeOrdered (per-partition heaps, no global sort). At open-vocabulary
    * 100 TB scale, cap the key space first (min-frequency pre-filter per
    * partition, or a count-min sketch pass) before the exact count.
    */
  def ngramVocab(df: DataFrame, textCol: String, n: Int, topK: Int): DataFrame = {
    require(n > 0 && topK > 0, "n and topK must be positive")
    val toks = col("__toks")
    df.select(tokens(col(textCol)).as("__toks"))
      .select(explode(when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)), i =>
          array_join(slice(toks, i, lit(n)), " ")))
        .otherwise(array().cast("array<string>"))).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("gram"))
      .limit(topK)
  }

  /** Self-trained word-bigram language-model fluency score — the
    * KenLM-perplexity role in a quality-filter stack (Gopher/CCNet rank
    * documents by LM log-prob; a corpus-trained n-gram model is its
    * deterministic, dependency-free stand-in). `P(w2|w1) = cnt(w1 w2) /
    * cnt(w1 ·)` over the whole corpus; a document's score is the mean
    * log-prob of its bigram transitions — low = disfluent/rare transitions.
    *
    * Determinism: each transition's log-prob quantizes to integer micro-nats
    * BEFORE the per-doc sum, so the aggregate is an exact integer in any
    * partitioning/engine — and the closing mean stays in integer arithmetic
    * too: `lp_sum / n` lands EXACTLY on a 6-dp midpoint whenever n divides
    * 2·lp_sum (the sf1e stretch oracle caught three docs where Spark's
    * HALF_UP on the binary double — a hair below the decimal midpoint —
    * rounded down while DuckDB rounded the midpoint away from zero). The
    * mean micro-nat value is therefore computed as exact integer
    * round-half-away-from-zero, `sign · (2·|lp_sum| + n) div (2·n)`,
    * identical in any engine; the only float op left is the final exact
    * small-integer-to-double display division.
    *
    * Scale: two count shuffles over the bigram stream (map-side combined),
    * one model join keyed on the bigram (dictionary-sized right side → AQE
    * broadcast), one per-doc rollup. Docs with <2 tokens have no transitions
    * and drop out — score them with a length prior upstream.
    */
  def bigramLmScore(df: DataFrame, idCol: String, textCol: String,
                    scope: CacheScope = CacheScope.global): DataFrame = {
    val ts = col("__ts")
    // the tokenize+explode stream has two consumers (the model aggregate and
    // the scoring probe join) — materialize it once; released via `scope`.
    // The prefix counts derive from the bigram counts algebraically
    // (Σ_w2 c2 = c1, exact integers), saving a third corpus pass entirely.
    val bigrams = scope.persisted(df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__ts"))
      .select(col("doc_id"), explode(when(size(ts) >= 2,
        transform(sequence(lit(1), size(ts) - 1), i =>
          struct(element_at(ts, i).as("w1"), element_at(ts, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("bg"))
      .select(col("doc_id"), col("bg.w1").as("w1"), col("bg.w2").as("w2")))
    val c2 = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = c2.groupBy("w1").agg(sum(col("c2")).as("c1"))
    val model = c2.join(c1, "w1")
      .select(col("w1"), col("w2"),
        round(log(col("c2").cast("double") / col("c1")) * 1000000).cast("long")
          .as("lp_u"))
    bigrams.join(model, Seq("w1", "w2")) // self-trained: every transition hits
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_u")).as("lp_sum"))
      .select(col("doc_id"), col("n_bigrams"),
        // exact integer half-away mean in micro-nats (see Determinism note)
        (expr("CAST(CASE WHEN lp_sum < 0 THEN -1 ELSE 1 END AS BIGINT)") *
          expr("(2 * abs(lp_sum) + n_bigrams) DIV (2 * n_bigrams)"))
          .cast("double").divide(lit(1000000.0)).as("avg_logp"))
  }

  /** Corpus collocations by pointwise mutual information over adjacent token
    * pairs: `pmi(w1,w2) = ln( c12·N / (c1·c2) )` where `c12` counts the
    * bigram, `c1`/`c2` count it as a LEFT/RIGHT element, and `N` is the
    * total bigram count — the multiword-expression detector (phrase mining,
    * tokenizer-merge candidates, stopword-collocation screens). `minCount`
    * drops the unstable low-frequency tail (textbook PMI pathology: a
    * hapax pair scores maximal PMI), `topK` bounds the result.
    *
    * Scale: one explode (narrow per-doc fanout) feeds ONE bigram shuffle
    * with map-side combine into the count frame, which PERSISTS (released
    * via `scope`) because four consumers read it — the filtered output and
    * all three marginals; unpersisted, each consumer would re-explode the
    * corpus (plan-verified: 4 scans → 1). The marginals are aggregates over
    * the distinct-bigram dictionary, `N` broadcasts as a single-row
    * aggregate, and the top-k is TakeOrdered.
    *
    * Determinism: all counts are exact integers; the score is ONE division
    * of exactly-representable products followed by ONE `ln`, identical
    * cross-engine up to libm's final ulp — so ranking and output use the
    * micro-unit-rounded `pmi_u = round(pmi·10⁶)` (the [[bigramLmScore]]
    * convention), never the raw double.
    */
  def pmiBigrams(df: DataFrame, idCol: String, textCol: String,
                 minCount: Long, topK: Int,
                 scope: CacheScope = CacheScope.global): DataFrame = {
    val ts = col("__ts")
    val bigrams = df
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__ts"))
      .select(explode(when(size(ts) >= 2,
        transform(sequence(lit(1), size(ts) - 1), i =>
          struct(element_at(ts, i).as("w1"), element_at(ts, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("bg"))
      .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val c12 = scope.persisted(
      bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c12")))
    val left = c12.groupBy("w1").agg(sum(col("c12")).as("c1"))
    val right = c12.groupBy("w2").agg(sum(col("c12")).as("cr"))
    val n = c12.agg(sum(col("c12")).as("n_bi"))
    val pmi = log(col("c12").cast("double") * col("n_bi") /
      (col("c1") * col("cr")).cast("double"))
    c12.filter(col("c12") >= minCount)
      .join(left, "w1").join(right, "w2")
      .crossJoin(broadcast(n))
      .select(col("w1"), col("w2"), col("c12"),
        round(pmi * 1000000.0).cast("long").as("pmi_u"))
      .orderBy(col("pmi_u").desc, col("w1"), col("w2"))
      .limit(topK)
  }

  /** Per-document top-k TF-IDF terms — the classic keyword/feature extractor
    * (retrieval features, topic fingerprints, cluster labeling).
    * `score = tf · ln((N+1)/(df+1))` with the +1 smoothing that keeps
    * corpus-wide terms finite; ties break on the term string so the ranking
    * is total.
    *
    * Plan shape at scale: one shuffle for per-(doc, term) counts (map-side
    * combined), the document-frequency table derives from THAT frame (already
    * one row per doc-term — no second pass over the corpus), the corpus size
    * joins in as a broadcast single-row aggregate, and `rk <= k` over the
    * per-doc window compiles to WindowGroupLimit (per-task heaps before the
    * shuffle). The term dictionary join is AQE-broadcast when it fits.
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("score").desc, col("term"))
    val tf = df
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    // document frequency WITHOUT a dictionary join: tf has one row per
    // (doc, term), so df is just the term-partition row count — one window
    // pass over the frame that exists anyway, instead of a groupBy(term)
    // dictionary + a second term-keyed shuffle of tf to join it back
    // (plan: 7 exchanges → 5; the doc-term frame shuffles once per key)
    val wTerm = org.apache.spark.sql.expressions.Window.partitionBy(col("term"))
    val nDocs = df.select(count_distinct(col(idCol)).as("n_docs"))
    tf.withColumn("df_cnt", count(lit(1)).over(wTerm))
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        col("tf") * log((col("n_docs") + lit(1.0)) / (col("df_cnt") + lit(1.0))))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df_cnt"),
        round(col("score"), 6).as("score"), col("rk").cast("long").as("rk"))
  }

  /** Boilerplate/template score: per document, the fraction of its DISTINCT
    * n-gram shingles that recur across more than `dfFrac` of its group's
    * documents — the RefinedWeb/CCNet-family commonality signal that catches
    * per-site templates, navigation chrome, and license banners, which
    * per-document quality scores ([[qualityScore]]) and intra-document
    * repetition ([[repetitionSignals]]) are both blind to. Group by domain /
    * source; a high `bp_frac` marks a doc that is mostly its group's
    * furniture.
    *
    * Scale shape: one shuffle counts (group, gram) document frequencies with
    * map-side combine; the flagged-gram dictionary joins back on the SAME
    * (group, gram) key, so the exchange is reused, and the per-doc rollup is
    * the only other shuffle. The dictionary is the df-distribution head
    * (grams above the threshold), tiny at a production `dfFrac` ≥ 0.3 — AQE
    * demotes that join to broadcast on its own. Docs shorter than `n` tokens
    * surface with `n_grams = 0` and a null fraction rather than vanishing.
    */
  def boilerplateScore(docs: DataFrame, idCol: String, textCol: String,
                       groupCol: String, n: Int = 3, dfFrac: Double = 0.5,
                       scope: CacheScope = CacheScope.global): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(dfFrac > 0 && dfFrac < 1, "dfFrac must be in (0, 1)")
    val grams = scope.persisted(docs
      .select(col(idCol).as("doc_id"), col(groupCol).as("grp"),
        tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), col("grp"),
        explode(Dedup.shinglesOfTokens(col("toks"), n)).as("gram")))
    val groupDocs = docs.groupBy(col(groupCol).as("grp"))
      .agg(count_distinct(col(idCol)).as("n_docs"))
    val flagged = grams.groupBy("grp", "gram")
      .agg(count(lit(1)).as("df"))
      .join(broadcast(groupDocs), "grp")
      .filter(col("df").cast("double") > lit(dfFrac) * col("n_docs"))
      .select(col("grp"), col("gram"), lit(true).as("__bp"))
    val perDoc = grams
      .join(flagged, Seq("grp", "gram"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("__bp"), 1L).otherwise(0L)).as("n_bp"))
    docs.select(col(idCol).as("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_bp"), lit(0L)).as("n_bp"),
        round(col("n_bp").cast("double") / col("n_grams"), 6).as("bp_frac"))
  }
}
