package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.CacheScope
import graft.functions.stable_bucket

/** Corpus-curation operators for a training-data pipeline: deterministic
  * sampling, token-budget packing, and composite quality filtering. These
  * extend the reference's capability surface with the standard LLM-data-prep
  * curation stages that sit between dedup and tokenization.
  *
  * Scale design: sampling and filtering are narrow, codegen'd row maps (no
  * shuffle, no RNG state — reruns and retried tasks produce identical
  * output). Packing shuffles once on the shard key and windows within each
  * shard only — never a global sort.
  */
object Curation {

  /** Deterministic stratified sample: keep a row iff its stable hash bucket
    * (sha256-based, 0..99) falls under its stratum's percentage. No RNG —
    * the sample is reproducible across reruns, retries, and engines (the
    * reference derives its bucket hash the same way, `ais_pipeline.py:532-535`),
    * and membership is decided per row with zero shuffle.
    *
    * `rates`: stratum value → keep-percentage (0..100); `defaultRate` applies
    * to unlisted strata.
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
                           rates: Map[String, Int], defaultRate: Int): DataFrame = {
    require((rates.values.toSeq :+ defaultRate).forall(r => r >= 0 && r <= 100),
      "rates are percentages in [0, 100]")
    val rate = rates.foldLeft(lit(defaultRate)) { case (acc, (s, r)) =>
      when(col(strataCol) === lit(s), lit(r)).otherwise(acc)
    }
    df.filter(stable_bucket(col(keyCol).cast("string"), 100) < rate)
  }

  /** Deterministic train/val/test split assignment: the stable hash bucket
    * (0..99) of the key is routed through cumulative split weights, so every
    * row lands in exactly one named split, reproducibly across reruns,
    * retries, and engines — the property a multi-epoch training pipeline
    * needs so eval rows NEVER migrate into train between runs. Narrow
    * codegen'd row map; no shuffle, no RNG.
    *
    * `splits`: ordered (name, percent) with percents summing to 100.
    */
  def splitAssign(df: DataFrame, keyCol: String,
                  splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) &&
      splits.map(_._2).sum == 100, "split percents must be >= 0 and sum to 100")
    val bucket = stable_bucket(col(keyCol).cast("string"), 100)
    val cum = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val assigned = splits.zip(cum).tail
      .foldLeft(when(bucket < cum.head, splits.head._1)) {
        case (acc, ((name, _), hi)) => acc.when(bucket < hi, name)
      }
    df.withColumn("split", assigned)
  }

  /** Concat-and-chunk token packing (GPT-style pretraining batches): within
    * each shard, documents are laid end-to-end in `orderCol` order and the
    * token stream is cut every `chunkTokens`. Emits each document's position:
    * the half-open token interval [tok_start, tok_end) and the chunk range
    * [first_chunk, last_chunk] it lands in — a doc spanning a cut appears in
    * multiple chunks, exactly like fixed-length pretraining examples.
    *
    * The window partitions by `shardCol` (shard-local packing, the way a
    * multi-worker loader packs per shard) — no global sort at any scale.
    */
  def concatChunkPacking(df: DataFrame, shardCol: String, orderCol: String,
                         tokensCol: Column, chunkTokens: Int): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    val w = Window.partitionBy(col(shardCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(shardCol), col(orderCol), tokensCol.cast("long").as("n_tokens"))
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .withColumn("first_chunk",
        floor(col("tok_start") / chunkTokens.toLong).cast("long"))
      .withColumn("last_chunk",
        when(col("n_tokens") > 0,
          floor((col("tok_end") - 1L) / chunkTokens.toLong)).otherwise(null)
          .cast("long"))
  }

  /** Mixture sampling (the data-mixing stage of pretraining pipelines —
    * Pile/DoReMi-style): given NORMALIZED mixture weights per stratum and a
    * total token budget, each stratum's keep rate is
    * `min(1, weight × budget / stratum_tokens)`, and membership is decided
    * per row by stable hash against that rate — deterministic across reruns,
    * retries, and engines, like every sampler here.
    *
    * Scale: one tiny per-stratum aggregate (exact integer token sums,
    * map-side combined) broadcast back over the scan, then a narrow row map —
    * the corpus itself never shuffles. Emits the audit rate alongside the
    * decision so a mixing run can report realized vs requested proportions.
    */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
                    tokensCol: Column, weights: Map[String, Double],
                    budgetTokens: Long, granularity: Int = 10000): DataFrame = {
    require(math.abs(weights.values.sum - 1.0) < 1e-9,
      "mixture weights must be normalized (sum to 1)")
    require(budgetTokens > 0 && granularity > 0, "budget and granularity positive")
    val totals = df.groupBy(col(strataCol))
      .agg(sum(tokensCol.cast("long")).as("__toks"))
    val w = weights.foldLeft(lit(0.0)) { case (acc, (s, v)) =>
      when(col(strataCol) === lit(s), lit(v)).otherwise(acc)
    }
    val rate = least(lit(1.0), w * budgetTokens / col("__toks"))
    df.join(broadcast(totals), strataCol)
      .withColumn("rate", round(rate, 4))
      .withColumn("keep",
        stable_bucket(col(idCol).cast("string"), granularity)
          < round(col("rate") * granularity))
      .select(col(idCol), col(strataCol), col("rate"), col("keep"))
  }

  /** Temperature-rescaled mixture weights (the multilingual alpha-sampling
    * rule, mC4/XLM-R): `w_i^α / Σ w_j^α`. α = 1 keeps the natural
    * proportions; α → 0 flattens toward uniform, boosting low-resource
    * strata. Computed DRIVER-side on the raw proportions and passed to
    * [[mixtureSample]] as plain constants — `pow` never reaches a
    * distributed expression, so cross-engine float parity is a non-issue by
    * construction.
    */
  def temperatureWeights(raw: Map[String, Double],
                         alpha: Double): Map[String, Double] = {
    require(alpha > 0, "alpha must be positive")
    require(raw.nonEmpty && raw.values.forall(_ > 0),
      "raw proportions must be positive")
    val powed = raw.map { case (k, v) => k -> math.pow(v, alpha) }
    val z = powed.values.sum
    powed.map { case (k, v) => k -> v / z }
  }

  /** Deterministic weighted sampling without replacement — priority sampling
    * (Duffield, Lund & Thorup, JACM 2007): each row draws a pseudo-uniform
    * `u ∈ (0,1)` from its stable hash, gets priority `w / u`, and the top-k
    * priorities per stratum are the sample. Heavier rows are proportionally
    * more likely to be picked, the inclusion math supports unbiased subset-sum
    * estimation, and — unlike RNG-based weighted sampling — the draw is a pure
    * function of the key, so reruns, task retries, and other engines produce
    * the SAME sample. Only +,/ arithmetic (no ln/pow), so the priority is
    * bit-identical across engines — safe to rank on and to oracle-check.
    *
    * Scale: narrow map to compute priorities, then one shuffle on the stratum
    * with a rank-limit window — Spark pushes `row_number <= k` into
    * WindowGroupLimit, so each map task keeps only k rows per stratum before
    * the shuffle (map-side top-k, same shape as `Similarity.cosineTopK`).
    */
  def prioritySample(df: DataFrame, idCol: String, strataCol: String,
                     weightCol: Column, k: Int,
                     granularity: Int = 1 << 20): DataFrame = {
    require(k > 0 && granularity > 0, "k and granularity must be positive")
    // u = (bucket + 0.5) / granularity — strictly inside (0,1), so w/u is finite
    val u = (stable_bucket(col(idCol).cast("string"), granularity)
      .cast("double") + 0.5) / granularity
    val pri = weightCol.cast("double") / u
    val w = Window.partitionBy(col(strataCol)).orderBy(pri.desc, col(idCol))
    df.withColumn("priority", pri)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col(idCol), col(strataCol), col("rk"),
        round(col("priority"), 4).as("priority"))
  }

  /** Per-domain top-p ("nucleus") token budget: walk each domain's documents
    * in deterministic stable-hash order and keep them until `p` of the
    * domain's total tokens is covered — the token-budget twin of
    * [[domainCap]]'s document-count cap, matching how published pipelines
    * bound a domain's token SHARE rather than its doc count. Emits the
    * running and total token counts so a curation run can audit exactly
    * where each domain's cut landed.
    *
    * Scale: one shuffle on the domain; the running sum and the domain total
    * share the same window partitioning, so Catalyst evaluates both in one
    * Window pass over one sort. Same hot-domain caveat as [[domainCap]].
    */
  def topPByTokens(df: DataFrame, idCol: String, domainCol: String,
                   tokensCol: Column, p: Double): DataFrame = {
    require(p > 0 && p <= 1, "p must be in (0, 1]")
    val order = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val run = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(col(domainCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.select(col(idCol), col(domainCol), tokensCol.cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(run))
      .withColumn("total_tokens", sum(col("n_tokens")).over(all))
      // nucleus semantics: keep the smallest prefix whose cumulative mass
      // REACHES p — i.e. keep while the mass BEFORE this doc is still short
      // of the budget. Always keeps ≥ 1 doc per domain (a doc holding more
      // than p of the domain on its own must not zero the domain out).
      .withColumn("keep",
        (col("cum_tokens") - col("n_tokens")).cast("double")
          < lit(p) * col("total_tokens").cast("double"))
  }

  /** Per-domain document cap (RefinedWeb/C4-style): rank each domain's
    * documents in deterministic stable-hash order (md5 of the id, ties by
    * id) and keep the first `maxDocs` — so over-represented domains are
    * down-weighted reproducibly, with no RNG and no dependence on scan
    * order. Emits the rank and keep decision rather than dropping, so a
    * curation run can audit how much mass each domain lost.
    *
    * Scale: one shuffle on the domain key; per-partition work is a heap-free
    * running rank. A pathologically hot mega-domain concentrates its rows in
    * one partition — at that scale, pre-thin with a per-domain count +
    * hash-threshold pass (two-phase cap) before the exact rank.
    */
  def domainCap(df: DataFrame, idCol: String, domainCol: String,
                maxDocs: Int): DataFrame = {
    require(maxDocs > 0, "maxDocs must be positive")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.select(col(idCol), col(domainCol))
      .withColumn("cap_rank", row_number().over(w).cast("long"))
      .withColumn("keep", col("cap_rank") <= maxDocs)
  }

  /** Sliding-window document chunking (RAG / fixed-context pretraining prep):
    * cut each document's token stream into `chunkTokens`-sized pieces whose
    * starts step by `chunkTokens - overlap`, so consecutive chunks share
    * `overlap` tokens. The final chunk may be short (it clamps at the end of
    * the document). Emits the chunk index, 1-based token start, actual chunk
    * length, and an md5 digest of the chunk text.
    *
    * Scale: narrow map + explode — per-row fanout is ceil(n/stride), bounded
    * by document length, never corpus size; no shuffle at any scale.
    */
  def chunkDocs(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      "need 0 <= overlap < chunkTokens")
    val stride = chunkTokens - overlap
    df.select(col(idCol).as("doc_id"), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"), size(col("__toks")).as("n"),
        explode(sequence(lit(1), greatest(size(col("__toks")), lit(1)),
          lit(stride))).as("chunk_start"))
      .select(col("doc_id"),
        ((col("chunk_start") - 1) / stride).cast("long").as("chunk_idx"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(lit(chunkTokens), col("n") - col("chunk_start") + 1)
          .cast("long").as("chunk_len"),
        md5(array_join(slice(col("__toks"), col("chunk_start"), lit(chunkTokens)),
          " ")).as("chunk_md5"))
  }

  /** Redaction patterns shared by the engine and the DuckDB oracle — kept to
    * the regex subset with identical semantics in Java regex and RE2 (no
    * lookaround, no backrefs). Order matters: URLs first, so an email inside
    * a URL redacts as part of the URL, then emails, IPv4s, phones.
    */
  /** PII pattern inventory for [[redactPii]] and its oracle twins. Every
    * pattern is written in the COMMON subset of Java regex (Spark) and RE2
    * (DuckDB) — no lookarounds, no backreferences — so both engines match
    * identical spans. Order is part of the contract: URLs first (an email
    * or IP inside a URL redacts as part of the URL, never double-counts),
    * then emails, then the structured-digit shapes from most to least
    * specific (IP, SSN-style id, card-style run) so the generic phone
    * alternation can never swallow them.
    */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("urls", "https?://\\S+", "[URL]"),
    ("emails", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ips", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    ("ids", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[ID]"),
    ("cards", "\\b\\d{15,16}\\b", "[CARD]"),
    ("phones", "\\+\\d{9,14}\\b|\\b\\+?\\d{3}[- ]\\d{3}[- ]\\d{4}\\b", "[PHONE]"))

  /** PII scrub (URLs / emails / IPv4 / SSN-shaped ids / card-shaped
    * numbers / phone shapes): per-type match counts for the removal audit
    * plus the sequentially redacted text — the standard pre-training scrub
    * stage. Each pattern's count is measured ON THE RESULT OF THE PREVIOUS
    * REDACTIONS (the same fold as the rewrite), so counts and placeholders
    * always agree: a dashed SSN counts once as `ids` and never again as
    * `phones`, an email inside a URL counts as part of the URL. Regex-based
    * by design — auditable, deterministic, engine-portable (see
    * [[PiiPatterns]]); an ML NER pass is a separate, slower stage that
    * doesn't belong in the engine. Narrow codegen'd row map; no shuffle at
    * any scale.
    */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val (redacted, counts) =
      PiiPatterns.foldLeft((col(textCol), Seq.empty[Column])) {
        case ((txt, acc), (name, re, tag)) =>
          val n = size(regexp_extract_all(txt, lit(re), lit(0))).as(s"n_$name")
          (regexp_replace(txt, re, tag), acc :+ n)
      }
    df.select(col(idCol) +: counts :+ redacted.as("redacted"): _*)
  }

  /** Model-based quality scoring (the fastText-classifier stage of published
    * corpus pipelines, as a deterministic stand-in): a fixed-weight logistic
    * model over cheap text features — log token count, punctuation ratio,
    * stopword ratio, mean token length. Weights are plan-time constants (a
    * trained model would arrive the same way: broadcast coefficients), so the
    * whole scorer is a narrow codegen'd row map — zero shuffle, full scan
    * throughput at any corpus size, and bit-reproducible across reruns.
    *
    * `keep` thresholds the sigmoid at `minScore` — the binary decision a
    * pacing/filtering stage consumes.
    */
  /** The rounded logistic score as a column kernel — shared by
    * [[classifierScore]] and the fused ensemble scan ([[qualitySignals]]):
    * one expression shape, so both call sites produce identical doubles.
    */
  private[graft] def scoreExpr(text: Column, toks: Column,
                               weights: Seq[Double], bias: Double): Column = {
    require(weights.length == 4, "model has 4 features: ln_toks, punct, stop, mean_len")
    val nToks = size(toks).cast("double")
    val features = Seq(
      log(nToks + 1.0),
      size(regexp_extract_all(text, lit("[^\\w\\s]"), lit(0))).cast("double")
        / length(text),
      size(filter(toks, x =>
        TextOps.LangMarkers.head._2.map(m => x === lit(m)).reduce(_ || _)))
        .cast("double") / nToks,
      (length(text) - nToks + 1.0) / nToks) // mean token length
    val z = features.zip(weights).map { case (f, w) => f * w }
      .reduce(_ + _) + bias
    round(lit(1.0) / (lit(1.0) + exp(-z)), 6)
  }

  def classifierScore(df: DataFrame, idCol: String, textCol: String,
                      weights: Seq[Double], bias: Double,
                      minScore: Double): DataFrame = {
    val pre = df.select(col(idCol), col(textCol), TextOps.tokens(col(textCol)).as("__toks"))
    val score = scoreExpr(col(textCol), col("__toks"), weights, bias)
    pre.select(col(idCol), score.as("score"), (score >= minScore).as("keep"))
  }

  /** One-scan fused signal frame for the quality ensemble: (doc_id, score,
    * entropy, top_tok_frac) computed in a SINGLE projection from the same
    * expression kernels [[classifierScore]] / [[graft.ops.TextOps.charEntropy]] /
    * [[graft.ops.TextOps.repetitionSignals]] use — the three-operator
    * composition joined this frame together on doc_id, which at corpus
    * scale is three full scans and two corpus-wide shuffles for what is a
    * pure row map. Inner-join semantics preserved: documents with no
    * countable characters drop, exactly as charEntropy drops them.
    */
  def qualitySignals(df: DataFrame, idCol: String, textCol: String,
                     weights: Seq[Double], bias: Double): DataFrame = {
    val (nChars, tSum) = TextOps.entropyTerms(col(textCol))
    df.select(col(idCol), col(textCol),
        TextOps.tokens(col(textCol)).as("__toks"),
        nChars.as("__nc"), tSum.as("__ts"))
      .filter(col("__nc") > 0)
      .select(col(idCol),
        scoreExpr(col(textCol), col("__toks"), weights, bias).as("score"),
        TextOps.entropyFrom(col("__nc"), col("__ts")).as("entropy"),
        TextOps.topTokFrac(col("__toks")).as("top_tok_frac"))
  }

  /** Per-domain quality-percentile pruning (the fastText-score pruning
    * stage of CCNet/RefinedWeb, made stratified): within each domain, rank
    * documents by quality score and keep the top `keepFrac`. Stratifying by
    * domain keeps the cut from emptying whole sources whose score
    * distribution sits lower — every domain contributes its own best slice.
    *
    * Determinism: ranks order on the 6dp-ROUNDED score with the id as
    * tiebreak, and `keep` thresholds the 6dp-rounded percent_rank — both
    * sides of the oracle compare compute the identical doubles (the
    * `mixture_sample` rounded-threshold convention).
    *
    * Scale: one window shuffle partitioned by domain. A pathologically hot
    * domain makes that window's sort big; the score column is one double —
    * sort spills, nothing else grows.
    */
  def qualityPrune(scored: DataFrame, idCol: String, domainCol: String,
                   scoreCol: String, keepFrac: Double): DataFrame = {
    require(keepFrac > 0.0 && keepFrac <= 1.0, "keepFrac must be in (0, 1]")
    val w = Window.partitionBy(col(domainCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    scored.withColumn("q_pr", round(percent_rank().over(w), 6))
      .withColumn("keep", col("q_pr") <= keepFrac)
  }

  /** Ensemble quality ranking (the DCLM/"ask-several-judges" pattern):
    * blend heterogeneous quality signals by averaging their corpus
    * percent-ranks rather than their raw values — rank space is the only
    * scale on which a logistic score, an entropy in nats, and a repetition
    * fraction are commensurable. Each signal ranks on its value with the id
    * as tiebreak (`better` = whether high raw values are good); the id makes
    * the order total, so percent_rank degenerates to (row position)/(n−1)
    * and both engines rank identical doubles.
    *
    * Scale: each signal's rank comes from [[Indexing.globalIndex]]'s
    * range-partition protocol (range shuffle + per-partition offsets), NOT a
    * corpus-wide single-partition window — every stage stays distributed at
    * 100 TB. One range shuffle + one id-keyed join back per signal.
    *
    * Precondition: signal values non-null and finite (NaN/null order
    * differently under the descending-as-negation encoding than under a
    * true DESC sort; every shipped signal is a rounded finite double).
    */
  def qualityEnsemble(signals: DataFrame, idCol: String,
                      cols: Seq[(String, Boolean)],
                      scope: CacheScope = CacheScope.global): DataFrame = {
    require(cols.nonEmpty, "need at least one signal column")
    val base = scope.persisted(signals)
    // n-1 rides the action as a broadcast single-row aggregate — building
    // the ensemble triggers no eager count
    val denom = base.agg(
      greatest(count(lit(1)) - lit(1L), lit(1L)).cast("double").as("__qe_denom"))
    val ranked = cols.foldLeft(base) { case (acc, (c, better)) =>
      // ORDER BY c asc|desc, id asc as ONE range-sortable struct key:
      // descending doubles sort ascending after negation (±0.0 pinned to
      // one representative so negation cannot split a tie a DESC sort
      // would keep together)
      val v = col(c).cast("double")
      val key = if (better) v else when(v === 0.0, lit(0.0)).otherwise(-v)
      val idx = Indexing.globalIndex(
          base.select(col(idCol),
            struct(key.as("v"), col(idCol).as("i")).as("__k")),
          "__k", scope = scope)
        .select(col(idCol), col("global_idx").as(s"__gi_$c"))
      acc.join(idx, Seq(idCol))
    }
    val withPr = cols.foldLeft(ranked.crossJoin(broadcast(denom))) {
      case (acc, (c, _)) =>
        acc.withColumn(s"pr_$c", round(col(s"__gi_$c") / col("__qe_denom"), 6))
    }
    val blend = cols.map { case (c, _) => col(s"pr_$c") }
      .reduce(_ + _) / cols.length.toDouble
    withPr.withColumn("q_blend", round(blend, 6))
      .drop("__qe_denom" +: cols.map { case (c, _) => s"__gi_$c" }: _*)
  }

  /** Shard manifest — the reproducibility receipt a corpus release ships
    * with: per shard, the row count, exact token total, and an
    * order-independent content checksum (XOR of the stable SHA-256 hash of
    * id and content digest; 31 bits here — `StableHashBucket`'s modulus —
    * widen with a second salted half when collision odds matter). XOR is
    * commutative/associative and
    * overflow-free, so the checksum is IDENTICAL under any partitioning,
    * retry, or engine — two sides of a data handoff can verify a 100 TB
    * shard without agreeing on row order (the same determinism contract as
    * [[graft.ops.Sketches]]).
    *
    * Scale: one map-side-combinable aggregate per shard; nothing else moves.
    */
  def shardManifest(df: DataFrame, shardCol: String, idCol: String,
                    textCol: String): DataFrame =
    df.select(col(shardCol), col(idCol),
        TextOps.tokens(col(textCol)).as("__toks"),
        concat(col(idCol).cast("string"), lit("|"), md5(col(textCol))).as("__sig"))
      .groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(size(col("__toks")).cast("long")).as("n_tokens"),
        bit_xor(stable_bucket(col("__sig"), Int.MaxValue)).as("xor_sig"))

  /** The Gopher (Rae et al. 2021, §A1.1) stop list — rule 7 counts hits. */
  val GopherStops: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Gopher-style document quality rules (Rae et al. 2021, §A1.1) — the
    * OTHER canonical heuristic battery next to [[qualityFilter]]'s C4 set:
    * word-count bounds, mean-word-length bounds, symbol-to-word ratio
    * (`#`/ellipsis noise), bullet-start and ellipsis-end line fractions,
    * alphabetic-word fraction, and a minimum stop-word hit count. Emits
    * every signal plus a failure bitmask (1 = word count, 2 = mean word
    * length, 4 = symbol ratio, 8 = bullet lines, 16 = ellipsis lines,
    * 32 = alpha words, 64 = stop hits) and `keep` = no bits — per-row audit
    * of removed mass, same rationale as [[qualityFilter]].
    *
    * Line rules read the RAW text (normalization collapses newlines); word
    * rules read normalized tokens. One narrow codegen'd map, no shuffle —
    * the 100 TB cost is exactly one scan. Regex classes are spelled to the
    * RE2 ∩ Java subset so the DuckDB twin matches character-for-character.
    */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxSymbolRatio: Double = 0.1, maxBulletFrac: Double = 0.9,
                  maxEllipsisFrac: Double = 0.3, minAlphaFrac: Double = 0.8,
                  minStopHits: Int = 2): DataFrame = {
    val raw = col(textCol)
    val pre = df.select(col(idCol), raw,
      filter(TextOps.tokens(TextOps.normalizeText(raw)),
        w => length(w) > 0).as("__toks"),
      split(raw, "\n").as("__lines"))
    val toks = col("__toks")
    val lines = col("__lines")
    val nWords = size(toks)
    val nWordsD = nWords.cast("double")
    val nLinesD = size(lines).cast("double")
    val meanLen = when(nWords > 0,
      aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double")
        / nWordsD)
    val symbolRatio = when(nWords > 0,
      size(regexp_extract_all(raw, lit("#|\\.\\.\\.|…"), lit(0)))
        .cast("double") / nWordsD)
    val bulletFrac =
      size(filter(lines, l => l.rlike("^[-*•‣▪]"))).cast("double") / nLinesD
    val ellipsisFrac =
      size(filter(lines, l => l.rlike("(\\.\\.\\.|…)$"))).cast("double") / nLinesD
    val alphaFrac = when(nWords > 0,
      size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("double") / nWordsD)
    val stopHits = size(filter(toks,
      w => GopherStops.map(s => w === lit(s)).reduce(_ || _))).cast("long")
    val flags =
      when(nWords < minWords || nWords > maxWords, 1).otherwise(0) +
      when(meanLen < minMeanLen || meanLen > maxMeanLen, 2).otherwise(0) +
      when(symbolRatio > maxSymbolRatio, 4).otherwise(0) +
      when(bulletFrac > maxBulletFrac, 8).otherwise(0) +
      when(ellipsisFrac > maxEllipsisFrac, 16).otherwise(0) +
      when(alphaFrac < minAlphaFrac, 32).otherwise(0) +
      when(stopHits < minStopHits, 64).otherwise(0)
    pre.select(col(idCol),
      nWords.cast("long").as("n_words"),
      round(meanLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(bulletFrac, 6).as("bullet_frac"),
      round(ellipsisFrac, 6).as("ellipsis_frac"),
      round(alphaFrac, 6).as("alpha_frac"),
      stopHits.as("stop_hits"),
      flags.as("flags"), (flags === 0).as("keep"))
  }

  /** C4-style composite quality filter: every heuristic votes, failures are
    * recorded as a bitmask (1 = too short, 2 = too long, 4 = punctuation
    * noise, 8 = unnatural stopword density), `keep` = no bits set. Keeping
    * the reasons per row (instead of just dropping) is what lets a 100 TB
    * curation run audit WHY mass was removed — the standard practice in
    * published corpus pipelines.
    */
  def qualityFilter(df: DataFrame, idCol: String, textCol: String,
                    minTokens: Int = 5, maxTokens: Int = 1000,
                    maxPunctRatio: Double = 0.1,
                    minStopRatio: Double = 0.005): DataFrame = {
    val pre = df.select(col(idCol), col(textCol),
      TextOps.tokens(col(textCol)).as("__toks"))
    val t = col(textCol)
    val toks = col("__toks")
    val nToks = size(toks).cast("double")
    val punctRatio =
      size(regexp_extract_all(t, lit("[^\\w\\s]"), lit(0))).cast("double") / length(t)
    val stopRatio = size(filter(toks, x =>
      TextOps.LangMarkers.head._2.map(m => x === lit(m)).reduce(_ || _)))
      .cast("double") / nToks
    val reasons =
      when(nToks < minTokens, 1).otherwise(0) +
      when(nToks > maxTokens, 2).otherwise(0) +
      when(punctRatio > maxPunctRatio, 4).otherwise(0) +
      when(stopRatio < minStopRatio, 8).otherwise(0)
    pre.select(col(idCol), reasons.as("drop_reasons"),
      (reasons === 0).as("keep"))
  }

  /** Train/val/test assignment that CANNOT leak near-duplicates across the
    * boundary: every doc in a near-dup cluster adopts the cluster's min-id
    * label as its split key, so whole clusters land on one side — the
    * hygiene rule a plain per-doc hash split silently violates (a test doc
    * whose near-copy sits in train is a leaked answer). Singletons key by
    * their own id; assignment is [[splitAssign]]'s deterministic sha bucket.
    *
    * Scale: cluster resolution is [[graft.ops.Dedup.dupClusters]] over the
    * candidate pairs only (docs with ≥1 near-dup — a small corpus
    * fraction); everything else is one left join + a narrow hash map.
    */
  def leakageSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       aCol: String, bCol: String,
                       splits: Seq[(String, Int)]): DataFrame =
    leakageSafeSplitClusters(docs, idCol,
      Dedup.dupClusters(pairs, aCol, bCol), splits)

  /** [[leakageSafeSplit]] over ALREADY-RESOLVED clusters (`id`, `cluster`
    * columns) — the production entry point: cluster resolution is a
    * maintained artifact refreshed with the pair table, not recomputed per
    * split request.
    */
  def leakageSafeSplitClusters(docs: DataFrame, idCol: String,
                               clusters: DataFrame,
                               splits: Seq[(String, Int)]): DataFrame = {
    val cl = clusters.select(col("id").as(idCol), col("cluster"))
    val keyed = docs.join(cl, Seq(idCol), "left")
      .withColumn("__skey", coalesce(col("cluster"), col(idCol)))
    splitAssign(keyed, "__skey", splits).drop("__skey")
  }

  /** Length-curriculum ordering: contiguous global positions that walk the
    * corpus shortest-bucket-first (easy→hard), deterministically shuffled
    * WITHIN each difficulty bucket — the curriculum-training read order,
    * reproducible across reruns, retries, and engines (no RNG). Difficulty
    * = exact token count; bucket bounds = exact percentiles (broadcast
    * single-row aggregate), so membership is a narrow comparison chain.
    *
    * Scale: one scan for counts, one bounds aggregate, then the
    * [[graft.ops.Indexing.globalIndex]] two-pass range-partition stamping
    * over the composite `bucket|md5(seed#id)|id` key — the same protocol as
    * the epoch shuffle, so ordering cost is one range shuffle regardless of
    * bucket count. Within-bucket order is the md5 keystream; changing
    * `seed` reshuffles every bucket without touching bucket membership.
    * The EXACT percentile bounds buffer every count in one aggregate task —
    * at real corpus scale swap them for `approx_percentile` (same plan
    * shape, sketch-mergeable; winsorize documents the same trade). The
    * exact form stays default because it is oracle-checkable.
    */
  def curriculumOrder(df: DataFrame, idCol: String, textCol: String,
                      buckets: Int = 4, seed: Long = 1L,
                      scope: graft.engine.CacheScope =
                        graft.engine.CacheScope.global): DataFrame = {
    require(buckets >= 2 && buckets <= 99, "buckets must be in [2, 99]")
    val toks = df.select(col(idCol).as("doc_id"),
      size(TextOps.tokens(col(textCol))).cast("long").as("n_toks"))
    val qs = (1 until buckets).map(i =>
      expr(s"percentile(n_toks, ${i.toDouble / buckets})").as(s"__b$i"))
    val bounds = toks.agg(qs.head, qs.tail: _*)
    val bucket = (1 until buckets).map(i =>
      when(col("n_toks") > col(s"__b$i"), 1).otherwise(0))
      .foldLeft(lit(1))(_ + _).cast("int")
    val keyed = toks.crossJoin(broadcast(bounds))
      .select(col("doc_id"), col("n_toks"), bucket.as("bucket"))
      .withColumn("__curr", concat_ws("|",
        lpad(col("bucket").cast("string"), 2, "0"),
        md5(concat_ws("#", lit(seed), col("doc_id").cast("string"))),
        col("doc_id").cast("string")))
    Indexing.globalIndex(keyed, "__curr", scope = scope).drop("__curr")
  }
}
