package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public column-function surface of the engine. Everything here is either a
  * composition of codegen'd built-ins or a native catalyst Expression — no
  * Scala UDFs (SURVEY.md §7.4: "Functions, not UDFs").
  */
object functions {

  /** Hexagonal cell address (15 hex chars, true hex adjacency) from
    * (lat, lon, res) — see [[graft.expressions.GeoCell]].
    */
  def geo_cell(lat: Column, lon: Column, res: Column): Column =
    expressions.col(expressions.GeoCell(
      expressions.expr(lat), expressions.expr(lon), expressions.expr(res)))

  def geo_cell(lat: Column, lon: Column, res: Int): Column = geo_cell(lat, lon, lit(res))

  /** Image format + dimensions (`fmt w h`, null for unparseable) from raw
    * header bytes of a binary column — see [[graft.expressions.ImageDims]].
    */
  def image_dims(bin: Column): Column =
    expressions.col(expressions.ImageDims(expressions.expr(bin)))

  /** PCM-WAV metadata (`wav ch rate bits frames`, null for unparseable)
    * from raw RIFF bytes — see [[graft.expressions.WavMeta]].
    */
  def wav_meta(bin: Column): Column =
    expressions.col(expressions.WavMeta(expressions.expr(bin)))

  /** MP4/ISO-BMFF metadata (`mp4 brand w h timescale duration`, null for
    * unparseable) from raw box bytes — see [[graft.expressions.Mp4Meta]].
    */
  def mp4_meta(bin: Column): Column =
    expressions.col(expressions.Mp4Meta(expressions.expr(bin)))

  /** Distinct sliding-window minima of a long array (O(n) monotonic
    * deque) — the winnowing selection kernel; see
    * [[graft.expressions.WinnowMin]].
    */
  def winnow_min(arr: Column, w: Int): Column =
    expressions.col(expressions.WinnowMin(expressions.expr(arr),
      expressions.expr(lit(w))))

  /** 1-D variant used against the testdata `events.value` column (FIXTURES.md §3:
    * `value` plays the position role). `cell = floor(value / (500 / 2^res))` —
    * SQL-expressible for the DuckDB oracle as
    * `CAST(FLOOR(value / width) AS BIGINT)`.
    */
  def pos_cell(value: Column, res: Int): Column = {
    val width = posCellWidth(res)
    floor(value / lit(width)).cast("long")
  }

  /** Cell width for [[pos_cell]]: the events `value` domain is [0, 500); the
    * resolution halves the width per step, mirroring H3's res ladder.
    */
  def posCellWidth(res: Int): Double = 500.0 / (1L << res)

  /** Per-row exact micro-unit quantization: round-half-up of `v · 1e6` as
    * BIGINT. Cross-engine deterministic where `round(double, 6)` is NOT:
    * `v` comes straight from storage (identical bits in every engine), and
    * `v * 1e6 + 0.5` / `floor` are single IEEE-754 ops both engines perform
    * identically — whereas Spark's `round(v, 6)` is HALF_UP on the
    * shortest-decimal BigDecimal and DuckDB's rounds the binary value, so
    * doubles whose shortest repr ends in a 7th-decimal '5' a hair off the
    * true midpoint round DIFFERENTLY even from identical inputs (the
    * lm_score lesson, `TextOps.bigramLmScore`). floor-then-cast (never
    * cast-the-fraction) because double→BIGINT casts also disagree across
    * engines (Spark truncates, DuckDB rounds); a floored integral double
    * casts identically everywhere. DuckDB twin:
    * `CAST(floor(v * 1000000.0 + 0.5) AS BIGINT)`.
    */
  def micro_units(v: Column): Column =
    floor(v * lit(1000000.0) + lit(0.5)).cast("long")

  /** Exact integer round-half-away-from-zero mean of a [[micro_units]] sum:
    * `sign(s) · (2·|s| + n) div (2·n)` — the whole mean stays in BIGINT
    * arithmetic, so it is summation-order independent AND engine independent
    * (no double mean to differ in the last ulp, no decimal-vs-binary
    * rounding seam at 6-dp midpoints). DuckDB twin:
    * `(CASE WHEN s < 0 THEN -1 ELSE 1 END) * ((2*abs(s) + n) // (2*n))`.
    */
  def micro_mean(sumMicro: Column, n: Column): Column =
    when(sumMicro < 0, lit(-1L)).otherwise(lit(1L)) *
      call_function("div",
        lit(2L) * abs(sumMicro) + n, lit(2L) * n)

  /** [[pos_cell]] on an exact integer micro-unit mean: the [0, 500) value
    * domain is 500e6 micro-units, so `cell = (mean_micro · 2^res) div 5e8`
    * — pure BIGINT lattice math, no double division whose ulp could sit on
    * the old `floor(q / width)` bin edge. Non-negative domain only (div
    * truncates toward zero; for v ≥ 0 that IS floor). DuckDB twin:
    * `(mean_micro * (1 << res)) // 500000000`.
    */
  def pos_cell_micro(meanMicro: Column, res: Int): Column =
    call_function("div", meanMicro * lit(1L << res), lit(500000000L))

  /** Bit-exact reference bucket hash — see [[graft.expressions.StableHashBucket]]
    * (`ais_pipeline.py:532-535`).
    */
  def stable_bucket(value: Column, numBuckets: Int): Column =
    expressions.col(expressions.StableHashBucket(
      expressions.expr(value.cast("string")), expressions.expr(lit(numBuckets))))

  /** Tiered timestamp normalizer — port of the reference's messy-NOAA-timestamp
    * COALESCE chain (`sql/gold/create_uid_hourly_h3.sql:30-43`,
    * `refresh_gold_tables.py:101-114`). Accepts, in order:
    *   1. `YYYY-MM-DD HH:MM:SS[.fff]`          (plain, assumed UTC)
    *   2. `YYYY-MM-DDTHH:MM:SS[.fff]`          (ISO T separator)
    *   3. trailing `Z` or `±HH:MM` offset      (normalized to UTC)
    * Unparsable input → NULL (dropped downstream, P5 / `ais_pipeline.py:508`).
    * Session timezone must be UTC (enforced in build.sbt / session builders).
    */
  def normalize_ts(s: Column): Column = {
    // canonical form: space separator, no zone suffix -> parsed as UTC wall time
    val plain = try_to_timestamp(s, lit("yyyy-MM-dd HH:mm:ss"))
    val plainFrac = try_to_timestamp(s, lit("yyyy-MM-dd HH:mm:ss.SSSSSS"))
    val isoT = try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss"))
    val isoTFrac = try_to_timestamp(s, lit("yyyy-MM-dd'T'HH:mm:ss.SSSSSS"))
    // zone-suffixed (Z or +hh:mm): let Spark's ISO parser handle the offset
    val zoned = when(s.rlike("[Tt].*([Zz]|[+-]\\d{2}:?\\d{2})$"),
      try_to_timestamp(regexp_replace(s, "[Tt]", "T")))
    coalesce(plain, plainFrac, isoT, isoTFrac, zoned)
  }

  /** Morton (Z-order) interleave of two non-negative keys into one 64-bit
    * clustering sort key — see [[graft.expressions.BitInterleave]]. Sort or
    * range-partition output files by this to get multi-dimensional
    * data-skipping from parquet min/max stats.
    */
  def z_order(x: Column, y: Column): Column =
    expressions.col(expressions.BitInterleave(
      expressions.expr(x.cast("long")), expressions.expr(y.cast("long"))))

  /** Codegen'd dot product of two array<double> columns — see
    * [[graft.expressions.VecDot]]. Strict in-order summation (bit-matches a
    * left-associative SQL `a[1]*b[1] + …` chain).
    */
  def vec_dot(a: Column, b: Column): Column =
    expressions.col(expressions.VecDot(expressions.expr(a), expressions.expr(b)))

  /** Rabin–Karp rolling hash of every k-gram (array<long>, base 257 mod
    * 2^31−1 over UTF-8 bytes) — see [[graft.expressions.RollingKgramHash]].
    */
  def rolling_kgrams(text: Column, k: Int): Column =
    expressions.col(expressions.RollingKgramHash(
      expressions.expr(text), expressions.expr(lit(k))))

  /** k-slot integer MinHash signature of a string-array column (one
    * xxhash64 per element + k splitmix mixes, single codegen'd loop) — see
    * [[graft.expressions.MinHashSig]]. Production dedup path; spec-gated
    * (no SQL twin — the oracle-checked dedup queries use the md5 form).
    */
  def minhash_sig(shingles: Column, k: Int): Column =
    expressions.col(expressions.MinHashSig(
      expressions.expr(shingles), expressions.expr(lit(k))))

  /** One BPE merge over a symbol array: leftmost non-overlapping (left,
    * right) → left||right — see [[graft.expressions.BpeMerge]].
    */
  def bpe_merge(syms: Column, left: Column, right: Column): Column =
    expressions.col(expressions.BpeMerge(
      expressions.expr(syms), expressions.expr(left), expressions.expr(right)))

  /** Full BPE encode of a symbol array against a literal merge table
    * (lhs/rhs arrays indexed by rank) — see [[graft.expressions.BpeApply]].
    */
  def bpe_apply(syms: Column, lhs: Column, rhs: Column): Column =
    expressions.col(expressions.BpeApply(
      expressions.expr(syms), expressions.expr(lhs), expressions.expr(rhs)))

  /** Distinct n-token shingle hashes of a text as `array<long>`, one
    * codegen'd pass, no intermediate strings — the exact-dedup-tier feeder;
    * see [[graft.expressions.ShingleHashes]]. Null below n tokens.
    */
  def shingle_hashes(text: Column, n: Int): Column =
    expressions.col(expressions.ShingleHashes(
      expressions.expr(text), expressions.expr(lit(n))))

  /** End-to-end text→MinHash kernel: tokenize + n-token shingles + k-slot
    * signature in one pass over the UTF-8 bytes, zero intermediate
    * allocation — see [[graft.expressions.MinHashText]]. Null when the
    * text has fewer than n tokens.
    */
  def minhash_text(text: Column, n: Int, k: Int): Column =
    expressions.col(expressions.MinHashText(
      expressions.expr(text), expressions.expr(lit(n)), expressions.expr(lit(k))))

  /** Deflate-compressed byte size of a string (level 6, fixed) — the raw
    * material of the compression-ratio quality signal; see
    * [[graft.expressions.DeflateSize]]. Spec-gated (no SQL twin exists).
    */
  def deflate_size(s: Column): Column =
    expressions.col(expressions.DeflateSize(expressions.expr(s)))

  /** HTML character-reference decode: the six ubiquitous named entities +
    * printable-subset numeric references, one left-to-right pass (the only
    * shape under which every form single-decodes) — see
    * [[graft.expressions.EntityDecode]].
    */
  def entity_decode(s: Column): Column =
    expressions.col(expressions.EntityDecode(expressions.expr(s)))

  /** Deterministic display color from a track id (F15,
    * `apps/track_explorer.py:251-257`): first 6 hex chars of SHA-256 as RGB.
    */
  def track_color(id: Column): Column =
    concat(lit("#"), substring(sha2(id.cast("string"), 256), 1, 6))

  /** Szymkiewicz–Simpson overlap coefficient `|A∩B| / min(|A|,|B|)` with the
    * reference's NULLIF zero-denominator guard (`create_pairs_daily.sql:23-27`,
    * metric rationale `README.md:155-170`).
    */
  def overlap_coef(shared: Column, cntA: Column, cntB: Column): Column =
    shared.cast("double") / nullif(least(cntA, cntB).cast("double"), lit(0.0))
}
