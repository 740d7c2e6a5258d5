package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.{Aggregator, UserDefinedFunction}
import org.apache.spark.sql.functions._

import graft.expressions.StableHashBucket

/** Result of a [[BitsetDistinct]] aggregation: the number of set bits and
  * the linear-counting estimate derived from it.
  */
case class BitsetDistinctResult(n_set: Long, est_distinct: Double)

/** Deterministic distinct-count sketch as a typed `Aggregator` (the UDAF
  * surface of SURVEY §2.9): a fixed `m`-bit bitset where each value sets `k`
  * bit positions derived from the engine's stable SHA-256 bucket hash
  * ([[graft.expressions.StableHashBucket]], `ais_pipeline.py:532-535`), and
  * the finish step reports set-bit count plus the linear-counting estimate
  * `-m · ln(1 − n_set/m)` (Whang et al., ACM TODS 1990).
  *
  * Unlike `approx_count_distinct`'s HLL++ (whose binary sketch is
  * engine-private), every step here is public arithmetic: bit positions are
  * reproducible in any engine that has sha256, and the bitwise-OR merge is
  * commutative and associative — so the result is IDENTICAL regardless of
  * partitioning, task retries, or merge order, and cross-checkable by a
  * DuckDB oracle. That determinism is the property a data-contract gate
  * needs from a sketch.
  *
  * Scale: the buffer is `m/8` bytes (512 B at the default m=4096) regardless
  * of input size; partial aggregation ORs map-side, so the shuffle carries
  * one buffer per group per partition — the same profile as any algebraic
  * aggregate. Size `m` ≳ 10× the expected distinct count per group to keep
  * the linear-counting load factor in its accurate range; at `n_set == m`
  * the estimate saturates to +∞ (documented linear-counting behavior —
  * use a bigger `m`).
  */
class BitsetDistinct(m: Int, k: Int)
    extends Aggregator[String, Array[Long], BitsetDistinctResult] {
  require(m > 0 && m % 64 == 0, "m must be a positive multiple of 64")
  require(k > 0, "k must be positive")

  override def zero: Array[Long] = new Array[Long](m / 64)

  override def reduce(b: Array[Long], v: String): Array[Long] = {
    if (v != null) {
      var j = 0
      while (j < k) {
        // same hash family as every sampler in the engine: sha256 of the
        // value with a "#j" salt, first 8 bytes unsigned, mod m
        val pos = StableHashBucket.bucket(v + "#" + j, m).toInt
        b(pos >> 6) |= 1L << (pos & 63)
        j += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): BitsetDistinctResult = {
    var n = 0L
    var i = 0
    while (i < b.length) { n += java.lang.Long.bitCount(b(i)); i += 1 }
    // mirror the oracle's op tree exactly: -m * ln(1 - n/m), rounded to 4
    val est = -m.toDouble * math.log(1.0 - n.toDouble / m)
    val rounded =
      if (est.isInfinite) est
      else new JBigDecimal(est).setScale(4, RoundingMode.HALF_UP).doubleValue()
    BitsetDistinctResult(n, rounded)
  }

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[BitsetDistinctResult] =
    Encoders.product[BitsetDistinctResult]
}

/** Mergeable equi-width histogram sketch as a typed `Aggregator`: `nBins`
  * fixed-width buckets over `[lo, hi)` plus underflow/overflow slots. Unlike
  * the exact `ntile` equi-DEPTH histogram ([[Stats.equiDepthHistogram]],
  * which sorts each group), this is a one-pass algebraic aggregate: the
  * buffer is `nBins + 2` longs, partials merge by element-wise addition
  * (commutative/associative — identical under any partitioning or retry),
  * and no sort happens anywhere. The standard monitoring-profile shape at
  * fact-table scale; bin edges are plan-time constants, so every engine
  * reproduces the counts exactly.
  */
class HistogramSketch(lo: Double, hi: Double, nBins: Int)
    extends Aggregator[java.lang.Double, Array[Long], Seq[Long]] {
  require(nBins > 0 && hi > lo, "need nBins > 0 and hi > lo")
  private val width = (hi - lo) / nBins

  override def zero: Array[Long] = new Array[Long](nBins + 2) // [under, bins..., over]

  override def reduce(b: Array[Long], v: java.lang.Double): Array[Long] = {
    if (v != null) {
      val x = v.doubleValue()
      // NaN lands in overflow — both JVM comparisons below are false for
      // NaN, which would otherwise corrupt bin 0; overflow matches SQL
      // engines' total order (NaN sorts above every number)
      val slot =
        if (x.isNaN) nBins + 1
        else if (x < lo) 0
        else if (x >= hi) nBins + 1
        else 1 + math.min(nBins - 1, ((x - lo) / width).toInt)
      b(slot) += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a typed `Aggregator`:
  * a fixed `depth × width` counter matrix; value v increments one cell per
  * row, at column `stable_hash(v + "#" + row) mod width`. A point estimate
  * reads the MINIMUM of v's `depth` cells — it never undercounts (every
  * occurrence of v landed in all of them) and overcounts only by colliding
  * mass, bounded by ~2n/width with probability 1 − 2^-depth. The standard
  * heavy-hitter / frequency sketch where an exact groupBy over a hot key
  * space is too big to hold.
  *
  * Same determinism contract as [[BitsetDistinct]]: positions come from the
  * engine's public SHA-256 bucket hash, and partials merge by element-wise
  * ADDITION — commutative/associative, so the matrix is the identical
  * integer array under any partitioning, retry, or merge order, and a
  * DuckDB oracle recomputes it cell-for-cell from the same rows.
  *
  * Scale: the buffer is `depth·width` longs (8 KB at 4×256) regardless of
  * input size; partial aggregation collapses each map task to one matrix
  * before the shuffle — the same profile as any algebraic aggregate.
  */
class CountMinSketch(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  require(depth > 0 && width > 0, "need depth > 0 and width > 0")

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], v: String): Array[Long] = {
    if (v != null) {
      var j = 0
      while (j < depth) {
        b(j * width + StableHashBucket.bucket(v + "#" + j, width).toInt) += 1
        j += 1
      }
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** One tracked heavy hitter: `est` never undercounts the item's true
  * frequency, and `est - err` never overcounts it.
  */
case class HeavyHitter(item: String, est: Long, err: Long)

/** SpaceSaving buffer: per-item count upper bounds and their error terms. */
case class SpaceSavingBuffer(counts: Map[String, Long], errs: Map[String, Long])

/** SpaceSaving / stream-summary heavy hitters (Metwally, Agrawal & El Abbadi,
  * ICDT 2005) as a typed `Aggregator`: at most `k` tracked items. A tracked
  * arrival increments its count; an untracked arrival beyond capacity evicts
  * the minimum-count item and inherits its count as both floor and error.
  * Any item with true frequency > n/k is guaranteed tracked, `est ≥ true ≥
  * est − err` always — the exact complement of [[CountMinSketch]] (CMS
  * answers "how often is THIS item?", SpaceSaving answers "WHICH items are
  * frequent?" without enumerating the key space).
  *
  * Merge follows the mergeable-summaries construction (Agarwal et al., PODS
  * 2012): an item absent from one side contributes that side's minimum count
  * as both estimate and error (absent means "at most min occurrences there" —
  * zero only while that side is below capacity), then the union is cut back
  * to the top `k`. Eviction, survivor, and output ties all break on
  * (count desc, item asc), so a FIXED merge tree reproduces bit-identically;
  * across different partitionings the tracked SET can differ (inherent to
  * the sketch — the bounds above are the invariant), which is why this is
  * guarantee-tested in `SketchesSpec` rather than DuckDB-oracle'd, same as
  * `Ivf`/`Bpe`.
  *
  * Scale: the buffer is ≤ k entries regardless of input size and partials
  * collapse map-side, so the shuffle carries one k-entry summary per group
  * per partition. Per-row cost is O(log k) map update (+O(k) scan only on
  * eviction) — sized for the k ≤ a-few-hundred regime every heavy-hitter
  * report uses.
  */
class SpaceSaving(k: Int)
    extends Aggregator[String, SpaceSavingBuffer, Seq[HeavyHitter]] {
  require(k > 0, "k must be positive")

  override def zero: SpaceSavingBuffer =
    SpaceSavingBuffer(Map.empty, Map.empty)

  private def minKey(counts: Map[String, Long]): (String, Long) =
    // deterministic victim: smallest count, lexicographically smallest item
    counts.minBy { case (item, cnt) => (cnt, item) }

  override def reduce(b: SpaceSavingBuffer, v: String): SpaceSavingBuffer = {
    if (v == null) b
    else b.counts.get(v) match {
      case Some(c) =>
        b.copy(counts = b.counts.updated(v, c + 1))
      case None if b.counts.size < k =>
        SpaceSavingBuffer(b.counts.updated(v, 1L), b.errs.updated(v, 0L))
      case None =>
        val (victim, floor) = minKey(b.counts)
        SpaceSavingBuffer(
          b.counts - victim + (v -> (floor + 1)),
          b.errs - victim + (v -> floor))
    }
  }

  override def merge(a: SpaceSavingBuffer, b: SpaceSavingBuffer): SpaceSavingBuffer = {
    if (b.counts.isEmpty) return a
    if (a.counts.isEmpty) return b
    // an absent item may have occurred up to that side's min count times —
    // except below capacity, where absence means exactly zero
    val minA = if (a.counts.size < k) 0L else a.counts.values.min
    val minB = if (b.counts.size < k) 0L else b.counts.values.min
    val items = a.counts.keySet ++ b.counts.keySet
    val merged = items.iterator.map { i =>
      val (ca, ea) = (a.counts.getOrElse(i, minA), a.errs.getOrElse(i, minA))
      val (cb, eb) = (b.counts.getOrElse(i, minB), b.errs.getOrElse(i, minB))
      (i, ca + cb, ea + eb)
    }.toSeq.sortBy { case (i, c, _) => (-c, i) }.take(k)
    SpaceSavingBuffer(
      merged.map { case (i, c, _) => i -> c }.toMap,
      merged.map { case (i, _, e) => i -> e }.toMap)
  }

  override def finish(b: SpaceSavingBuffer): Seq[HeavyHitter] =
    b.counts.toSeq.sortBy { case (i, c) => (-c, i) }
      .map { case (i, c) => HeavyHitter(i, c, b.errs.getOrElse(i, 0L)) }

  override def bufferEncoder: Encoder[SpaceSavingBuffer] =
    Encoders.product[SpaceSavingBuffer]
  override def outputEncoder: Encoder[Seq[HeavyHitter]] =
    ExpressionEncoder[Seq[HeavyHitter]]()
}

/** [[BitsetDistinct]]'s build half: same bitset, but `finish` returns the
  * RAW buffer instead of the estimate — the persistable partial a
  * sketch-merge pipeline stores per group (per day, per shard) and
  * re-aggregates later with [[BitsetUnion]] without touching raw data again.
  */
class BitsetBuild(m: Int, k: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {
  private val inner = new BitsetDistinct(m, k)
  override def zero: Array[Long] = inner.zero
  override def reduce(b: Array[Long], v: String): Array[Long] = inner.reduce(b, v)
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  override def finish(b: Array[Long]): Seq[Long] = b.toSeq
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** [[BitsetDistinct]]'s merge half: input rows are stored [[BitsetBuild]]
  * buffers; OR them and report the same (n_set, linear-counting estimate)
  * as a fresh build over the union of the underlying values would —
  * OR is idempotent/commutative/associative, so merge(build(A), build(B))
  * ≡ build(A ∪ B) exactly, under any grouping of the partials.
  */
class BitsetUnion(m: Int)
    extends Aggregator[Seq[Long], Array[Long], BitsetDistinctResult] {
  require(m > 0 && m % 64 == 0, "m must be a positive multiple of 64")
  private val inner = new BitsetDistinct(m, 1)
  override def zero: Array[Long] = new Array[Long](m / 64)
  override def reduce(b: Array[Long], v: Seq[Long]): Array[Long] = {
    if (v != null) {
      require(v.length == b.length,
        s"sketch width mismatch: got ${v.length * 64} bits, expected $m")
      var i = 0
      while (i < b.length) { b(i) |= v(i); i += 1 }
    }
    b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
  override def finish(b: Array[Long]): BitsetDistinctResult = inner.finish(b)
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[BitsetDistinctResult] =
    Encoders.product[BitsetDistinctResult]
}

/** Result of an [[HllSketch]] aggregation — the same exact-integer
  * estimator state as [[Sketches.hllDistinct]]; `denom_scaled` rides as a
  * plain integer STRING because Spark's default product encoding for
  * BigDecimal is DECIMAL(38,18), whose 20 integer digits the 2^63-scaled
  * denominator (up to m · 2^63 ≈ 10^22) can overflow.
  */
case class HllState(n_buckets: Long, v_zero: Long, denom_scaled: String)

/** [[Sketches.hllRegisters]] as a typed single-pass `Aggregator`: a fixed
  * 2^p-byte register buffer per group (rho ≤ 63 fits a byte), bytewise-max
  * merge — the store-and-merge-later form (persist one sketch per
  * day/shard, re-aggregate without rescanning). Hash math is
  * BIT-IDENTICAL to the built-ins path (same sha256 words, same 62-bit rho
  * window; spec-pinned), so a stored Aggregator sketch and a stored
  * register TABLE are interchangeable state.
  */
class HllSketch(p: Int) extends Aggregator[String, Array[Byte], HllState] {
  require(p >= 4 && p <= 16, "p in [4, 16]")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(b: Array[Byte], v: String): Array[Byte] = {
    if (v != null) {
      val (bucket, rho) = HllSketch.bucketRho(v, m)
      if (rho > b(bucket)) b(bucket) = rho
    }
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(b: Array[Byte]): HllState = {
    val two63 = new JBigDecimal("9223372036854775808")
    var denom = JBigDecimal.ZERO
    var seen = 0L
    var i = 0
    while (i < m) {
      if (b(i) > 0) {
        seen += 1
        denom = denom.add(new JBigDecimal(1L << (Sketches.HllScaleBits - b(i))))
      } else denom = denom.add(two63)
      i += 1
    }
    HllState(seen, m - seen, denom.toPlainString)
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[HllState] = Encoders.product[HllState]
}

object HllSketch {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-256")
  }

  /** (bucket, rho) from sha256(v): word 1 (bytes 0-7, unsigned) mod m;
    * word 2 (bytes 8-15) reduced to the 62-bit window, rho = 63 − bitlen
    * (= leading-zero rank + 1 in the window; 63 when the window is zero).
    */
  def bucketRho(v: String, m: Int): (Int, Byte) = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(v.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var u1 = 0L; var u2 = 0L
    var i = 0
    while (i < 8) {
      u1 = (u1 << 8) | (bytes(i) & 0xffL)
      u2 = (u2 << 8) | (bytes(i + 8) & 0xffL)
      i += 1
    }
    val bucket = java.lang.Long.remainderUnsigned(u1, m.toLong).toInt
    val w62 = java.lang.Long.remainderUnsigned(u2, Sketches.HllW)
    val rho =
      if (w62 == 0L) 63
      else 63 - (64 - java.lang.Long.numberOfLeadingZeros(w62))
    (bucket, rho.toByte)
  }
}

/** Bounded k-minimum-values (bottom-k / theta) sketch as a typed
  * `Aggregator` over pre-hashed longs ([[Sketches.kmvHash]], 62-bit so
  * signed ordering is the unsigned one): the buffer is the sorted array of
  * the ≤ k smallest DISTINCT hashes seen, so state is ≤ 8k bytes per group
  * regardless of cardinality and the merge (sorted-merge, dedup, truncate
  * at k) is commutative, associative, and idempotent — partitioning-,
  * retry-, and merge-order-independent by construction. Unlike the HLL
  * register table, the KMV sketch supports SET OPERATIONS: the k smallest
  * of two sketches' union is a valid sketch of the set union, and sketch
  * membership intersections estimate Jaccard ([[Sketches.kmvOverlap]]).
  */
class KmvSketch(k: Int) extends Aggregator[Long, Array[Long], Seq[Long]] {
  require(k >= 2 && k <= (1 << 20), "k in [2, 2^20]")

  override def zero: Array[Long] = Array.emptyLongArray

  override def reduce(b: Array[Long], hv: Long): Array[Long] = {
    val i = java.util.Arrays.binarySearch(b, hv)
    if (i >= 0) b // already present
    else {
      val at = -i - 1
      if (at >= k) b // not among the k smallest
      else {
        val n = math.min(b.length + 1, k)
        val out = new Array[Long](n)
        System.arraycopy(b, 0, out, 0, at)
        out(at) = hv
        System.arraycopy(b, at, out, at + 1, n - at - 1)
        out
      }
    }
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    val tmp = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var n = 0
    while (n < tmp.length && (i < a.length || j < b.length)) {
      val takeA = j >= b.length || (i < a.length && a(i) <= b(j))
      val v = if (takeA) a(i) else b(j)
      if (takeA) i += 1 else j += 1
      if (n == 0 || tmp(n - 1) != v) { tmp(n) = v; n += 1 }
    }
    if (n == tmp.length) tmp else java.util.Arrays.copyOf(tmp, n)
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object Sketches {
  /** Column-function form of [[BitsetDistinct]] for use in `agg(...)`. */
  def bitsetDistinct(m: Int, k: Int): UserDefinedFunction =
    udaf(new BitsetDistinct(m, k), Encoders.STRING)

  /** Column-function form of [[BitsetBuild]]: the raw m-bit buffer. */
  def bitsetBuild(m: Int, k: Int): UserDefinedFunction =
    udaf(new BitsetBuild(m, k), Encoders.STRING)

  /** Column-function form of [[BitsetUnion]] over stored buffers. */
  def bitsetUnion(m: Int): UserDefinedFunction =
    udaf(new BitsetUnion(m), ExpressionEncoder[Seq[Long]]())

  /** Sliding-window distinct counts by SKETCH MERGE — the scale answer to
    * "distinct users over the trailing `windowDays` days, per day": build
    * one [[BitsetBuild]] buffer per day (raw data read once, partials OR
    * map-side), then each output day ORs the ≤ `windowDays` day-buffers in
    * its window via [[BitsetUnion]] — re-aggregation moves
    * days × windowDays × m/8 bytes and NEVER rescans events, the
    * mergeable-summaries pattern (Agarwal et al.) every warehouse rollup
    * uses for COUNT DISTINCT over overlapping windows (where plain counts
    * cannot merge).
    *
    * Output per observed day: exact trailing distinct (`n_exact`, the
    * audit/calibration column — computed from distinct (day, key) pairs,
    * the one genuinely non-mergeable aggregate here), the sketch's set-bit
    * count and linear-counting estimate. Windows cover [day−W+1, day]
    * restricted to observed days.
    */
  def slidingDistinct(df: DataFrame, tsCol: String, keyCol: String,
                      windowDays: Int, m: Int, k: Int): DataFrame = {
    require(windowDays >= 1, "window must cover at least the day itself")
    val base = df.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .select(to_date(col(tsCol)).as("day"), col(keyCol).cast("string").as("__v"))
    val daySketch = base.groupBy("day")
      .agg(bitsetBuild(m, k)(col("__v")).as("__sk"))
    // a day's sketch serves every window ENDING within the next W−1 days
    val merged = daySketch
      .select(explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
        .as("day"), col("__sk"))
      .groupBy("day").agg(bitsetUnion(m)(col("__sk")).as("__r"))
    val exact = base.distinct()
      .select(explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
        .as("day"), col("__v"))
      .groupBy("day").agg(countDistinct(col("__v")).as("n_exact"))
    daySketch.select(col("day"))
      .join(merged, Seq("day")).join(exact, Seq("day"))
      .select(col("day"), col("n_exact"),
        col("__r.n_set").as("n_set"),
        col("__r.est_distinct").as("est_distinct"))
  }

  /** Column-function form of [[SpaceSaving]]: the ≤ k tracked heavy hitters,
    * ordered (est desc, item asc).
    */
  def spaceSaving(k: Int): UserDefinedFunction =
    udaf(new SpaceSaving(k), Encoders.STRING)

  /** Column-function form of [[CountMinSketch]]: the flattened counter
    * matrix, row-major — cell (j, p) at index `j · width + p`.
    */
  def countMin(depth: Int, width: Int): UserDefinedFunction =
    udaf(new CountMinSketch(depth, width), Encoders.STRING)

  /** Column-function form of [[HistogramSketch]]: counts array of length
    * nBins + 2 — [underflow, bin 0 .. nBins-1, overflow].
    */
  def histogramSketch(lo: Double, hi: Double, nBins: Int): UserDefinedFunction =
    udaf(new HistogramSketch(lo, hi, nBins), Encoders.DOUBLE)

  /** Column-function form of [[HllSketch]]: single-pass per-group HLL
    * state, interchangeable with [[hllDistinct]]'s (spec-pinned).
    */
  def hllSketch(p: Int): UserDefinedFunction =
    udaf(new HllSketch(p), Encoders.STRING)

  // --------------------------------------------------------------- Bloom

  /** Build the m-bit Bloom filter of a (small) key column as a driver-side
    * long array — [[BitsetBuild]]'s buffer, collected. The filter is
    * DETERMINISTIC (k sha256-derived positions per key, the engine's
    * stable-bucket contract), so unlike Spark's own
    * `spark.sql.optimizer.runtime.bloomFilter.*` rewrite — which is
    * planner-private, per-query, and engine-specific — this one can be
    * PERSISTED and shared across jobs/engines as 8·m/64 bytes, and an
    * oracle can recompute every bit. Collect is bounded: m/64 longs (64 at
    * the default m=4096), independent of the build side's row count.
    */
  def bloomBits(df: DataFrame, keyCol: String, m: Int, k: Int): Array[Long] = {
    val buf = df.filter(col(keyCol).isNotNull)
      .agg(bitsetBuild(m, k)(col(keyCol).cast("string")).as("b"))
      .collect()(0).getSeq[Long](0)
    buf.toArray
  }

  /** Membership test against a [[bloomBits]] filter as a pure codegen'd
    * column: all k sha256 positions set ⇒ maybe-present (false positives
    * possible, false negatives impossible). The filter rides as an array
    * LITERAL — no broadcast machinery, no driver round trip at run time.
    */
  def bloomMightContain(key: Column, bits: Array[Long], m: Int, k: Int): Column = {
    val arr = typedLit(bits.toSeq)
    (0 until k).map { j =>
      val pos = graft.functions.stable_bucket(
        concat(key.cast("string"), lit("#"), lit(j.toString)), m)
      // long `/` is double division in the Column algebra — use integral div
      val word = element_at(arr,
        call_function("div", pos, lit(64L)).cast("int") + 1)
      // & 1, NOT % 2: shiftright is arithmetic (sign-extends), and a
      // negative shifted word's `% 2` is -1 in SQL — a set bit 63 would
      // read as ABSENT and manufacture false negatives
      call_function("shiftright", word, (pos % 64).cast("int"))
        .bitwiseAND(lit(1L)) === 1L
    }.reduce(_ && _)
  }

  /** Bloom-pruned left-semi join — the 100 TB shape: the BIG side is
    * filtered by the small side's Bloom filter BEFORE the join's exchange,
    * so the shuffle carries only maybe-matching rows (true matches + the
    * filter's false positives) instead of the full fact table; the
    * left-semi join then removes the false positives, so the RESULT is
    * exactly `big ⋉ small` — the filter can only cut cost, never change
    * rows. This is what a star-schema semi-join looks like when the dim
    * filter must survive across jobs (persisted [[bloomBits]]) instead of
    * living inside one query's runtime-filter rewrite.
    */
  def bloomSemiJoin(big: DataFrame, bigKey: String, small: DataFrame,
                    smallKey: String, m: Int, k: Int): DataFrame = {
    val bits = bloomBits(small, smallKey, m, k)
    big.filter(bloomMightContain(col(bigKey), bits, m, k))
      .join(broadcast(small.select(col(smallKey).as(bigKey)).distinct()),
        Seq(bigKey), "left_semi")
  }

  // ----------------------------------------------------------------- HLL

  /** The rho window width: the second sha256 word reduced mod 2^62 gives a
    * uniform 62-bit stream, so rho = 63 − bitlen(w) ∈ [1, 63] (w = 0 → 63).
    */
  val HllW: Long = 1L << 62

  /** The denominator scale: registers contribute 2^(63−r) EXACT integers
    * (≤ 2^63 for the mandatory zero-register term), so the harmonic-mean
    * denominator Σ 2^−r rides as `denom_scaled = Σ 2^(63−r)` in
    * DECIMAL(38,0) — no float sum whose ordering could differ across
    * engines or retries.
    */
  val HllScaleBits: Int = 63

  /** HyperLogLog register table (Flajolet et al., AofA 2007) from PURE
    * BUILT-INS — no custom expression, no engine-private sketch binary:
    * `bucket` = first sha256 word mod 2^p, `rho` = leading-zero rank of the
    * second sha256 word in a 62-bit window, register = `max(rho)` per
    * (group, bucket). Every step is public arithmetic (sha2, conv,
    * substring, bin, max), so the register table is IDENTICAL in any
    * engine — unlike `approx_count_distinct`'s HLL++ binary — and
    * merge-order / retry / partitioning independent by construction (max
    * is idempotent-commutative-associative; the round-15 retry rehearsal's
    * favorite property). This is the 100 TB COUNT DISTINCT shape: the
    * shuffle carries ≤ 2^p register rows per group instead of every
    * distinct key, and stored register tables for different days/shards
    * re-merge by `max` without rescanning the data (the
    * [[slidingDistinct]] pattern at HLL's O(log log n) register width).
    */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   p: Int): DataFrame = {
    require(p >= 4 && p <= 16, "p in [4, 16] (m = 2^p registers)")
    val m = 1 << p
    val h = sha2(col(valueCol).cast("string"), 256)
    // conv(hex, 16, 10) yields the UNSIGNED 64-bit value as a decimal
    // string; DECIMAL(20,0) holds it exactly (the corpus_split /
    // StableHashBucket convention, SQL-expressible in DuckDB as
    // ('0x' || substr(sha256(v), ...))::UBIGINT)
    val u1 = conv(substring(h, 1, 16), 16, 10).cast("decimal(20,0)")
    val u2 = conv(substring(h, 17, 16), 16, 10).cast("decimal(20,0)")
    val w62 = (u2 % lit(HllW)).cast("long")
    val rho = when(col("__w62") === 0L, lit(63))
      .otherwise(lit(63) - length(bin(col("__w62")))).cast("int")
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+
        (u1 % lit(m.toLong)).cast("long").as("bucket") :+
        w62.as("__w62"): _*)
      .withColumn("r", rho)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(max(col("r")).as("r"))
  }

  /** Per-group HLL state in EXACT integers: `n_buckets` registers present,
    * `v_zero` empty registers, and the 2^63-scaled harmonic denominator —
    * the full estimator input with no engine-computed float anywhere
    * (the lm_score/micro_mean oracle discipline applied to a sketch).
    * Feed to [[hllEstimate]] for the number humans want.
    */
  def hllDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  p: Int): DataFrame =
    hllState(hllRegisters(df, groupCols, valueCol, p), groupCols, p)

  /** Roll a register table (columns `groupCols :+ bucket :+ r`) up to the
    * per-group exact estimator state — the shared second half of
    * [[hllDistinct]] and [[hllSliding]]; callers may max-merge register
    * tables (across days, shards, stores) before rolling up.
    */
  def hllState(registers: DataFrame, groupCols: Seq[String],
               p: Int): DataFrame = {
    val m = 1 << p
    registers
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_buckets"),
        // r >= 1 always, so the shift is <= 62 and each term fits a long
        // exactly before the decimal cast
        sum(expr(s"CAST(shiftleft(1L, $HllScaleBits - r) AS DECIMAL(38,0))"))
          .as("__nz"))
      .select(groupCols.map(col) :+
        col("n_buckets") :+
        (lit(m.toLong) - col("n_buckets")).as("v_zero") :+
        (col("__nz") + (lit(m.toLong) - col("n_buckets")).cast("decimal(38,0)") *
          // 2^63 overflows a long literal — spell it as a decimal
          lit(new java.math.BigDecimal("9223372036854775808"))
            .cast("decimal(38,0)")).as("denom_scaled"): _*)
  }

  /** Trailing-window distinct state by HLL REGISTER MERGE — the
    * [[slidingDistinct]] pattern at HLL's O(2^p) register width: one
    * register table per observed day (raw data read ONCE), each output day
    * max-merges the ≤ `windowDays` day-tables in its window, then rolls up
    * to exact estimator state. Re-aggregation moves days × window × ≤2^p
    * register rows and never rescans events — the warehouse COUNT DISTINCT
    * over overlapping windows, where plain counts cannot merge and bitset
    * linear counting saturates. Windows cover [day−W+1, day] restricted to
    * observed days.
    */
  def hllSliding(df: DataFrame, tsCol: String, keyCol: String,
                 windowDays: Int, p: Int): DataFrame = {
    require(windowDays >= 1, "window must cover at least the day itself")
    val daily = hllRegisters(
      df.filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
        .select(to_date(col(tsCol)).as("day"), col(keyCol)),
      Seq("day"), keyCol, p)
    // a day's registers serve every window ENDING within the next W−1 days
    val windowed = daily
      .select(explode(sequence(col("day"), date_add(col("day"), windowDays - 1)))
        .as("day"), col("bucket"), col("r"))
      .groupBy("day", "bucket").agg(max(col("r")).as("r"))
    // restrict to observed days (the explode manufactures trailing ghosts)
    hllState(windowed.join(daily.select("day").distinct(), Seq("day")),
      Seq("day"), p)
  }

  /** The standard HLL estimate from [[hllDistinct]]'s exact state:
    * `alpha_m · m² · 2^63 / denom_scaled`, with the small-range
    * linear-counting correction (`m · ln(m / v_zero)` when est ≤ 2.5m and
    * empty registers remain). Engine-side only — the ln/division floats
    * are NOT part of any oracle contract (accuracy is pinned by
    * `SketchesSpec` against exact distinct counts instead).
    */
  def hllEstimate(state: DataFrame, p: Int): DataFrame = {
    val m = (1 << p).toDouble
    val alpha = p match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = lit(alpha * m * m) /
      (col("denom_scaled").cast("double") / lit(math.pow(2.0, HllScaleBits)))
    state.withColumn("est_distinct",
      when(raw <= lit(2.5 * m) && col("v_zero") > 0L,
        lit(m) * log(lit(m) / col("v_zero").cast("double")))
        .otherwise(raw))
  }

  // ----------------------------------------------------------------- KMV

  /** The KMV hash window: sha256 word 1 reduced mod 2^62 — uniform on
    * [0, 2^62), always-positive longs, so natural BIGINT ordering agrees
    * across engines (the [[HllW]] convention applied to word 1).
    */
  val KmvW: Long = 1L << 62

  /** The 62-bit KMV hash from pure built-ins — same sha256-word-1
    * derivation as [[hllRegisters]]'s bucket, full 62-bit width instead of
    * mod m. SQL-expressible in DuckDB as
    * `('0x' || substr(sha256(v), 1, 16))::UBIGINT % 2^62`.
    */
  def kmvHash(c: Column): Column =
    (conv(substring(sha2(c.cast("string"), 256), 1, 16), 16, 10)
      .cast("decimal(20,0)") % lit(KmvW)).cast("long")

  /** Column-function form of [[KmvSketch]]: the group's k smallest
    * distinct [[kmvHash]] values, ascending.
    */
  def kmvSketch(k: Int): UserDefinedFunction =
    udaf(new KmvSketch(k), Encoders.scalaLong)

  /** Per-group KMV minhash table in relational form: (group, rank 1..k,
    * hv) — the bottom-k sketch a DuckDB window query can re-derive row for
    * row, so the oracle's hash match PROVES the bounded aggregate ≡ the
    * naive "k smallest of all distinct hashes". The shuffle carries one
    * ≤ k-long array per group, never the distinct keys themselves.
    */
  def kmvMinhashes(df: DataFrame, groupCols: Seq[String], valueCol: String,
                   k: Int): DataFrame = {
    val sk = df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ kmvHash(col(valueCol)).as("__hv"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kmvSketch(k)(col("__hv")).as("__mins"))
    sk.select(groupCols.map(col) :+ posexplode(col("__mins")): _*)
      .select(groupCols.map(col) :+
        (col("pos") + 1).cast("int").as("rank") :+ col("col").as("hv"): _*)
  }

  /** Per-group KMV estimator state in EXACT integers: `n_kept` (sketch
    * size, = exact distinct count while the group has < k distinct
    * hashes) and `kth_scaled` (the k-th smallest hash, the 2^62-scaled
    * theta). No engine-computed float crosses the oracle boundary; feed
    * to [[kmvEstimate]] for the number humans want.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  k: Int): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .select(groupCols.map(col) :+ kmvHash(col(valueCol)).as("__hv"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(kmvSketch(k)(col("__hv")).as("__mins"))
      .select(groupCols.map(col) :+
        size(col("__mins")).cast("long").as("n_kept") :+
        element_at(col("__mins"), -1).as("kth_scaled"): _*)

  /** Pairwise segment overlap from the K-MIN-VALUE SKETCHES ALONE — the
    * set operation HLL registers cannot express (max-merge is union-only;
    * inclusion-exclusion on two ±2% estimates loses all precision when
    * the overlap is small). The k smallest of `Sa ∪ Sb` is itself a valid
    * KMV sketch of `A ∪ B` (any of the union's k smallest is necessarily
    * within its own set's k smallest), and the fraction of those union
    * minima present in BOTH sketches is the standard Jaccard estimator
    * (Beyer et al., SIGMOD 2007 — the theta-sketch intersection shape).
    *
    * At 100 TB: per-segment sketches are built in one pass (bounded
    * k-long state per group), and every pairwise overlap is then computed
    * on the sketch table alone — S² / 2 pairs of ≤ k-long arrays, data
    * never rescanned. The pair join broadcasts the sketch table (S·k
    * longs) against itself, so the plan carries no shuffle at all beyond
    * the sketch build. Output per pair, in exact integers: `k_union`
    * (union sketch size), `kth_union` (its 2^62-scaled theta), `n_inter`
    * (union minima present in both sketches). [[kmvEstimate]] turns the
    * state into union / Jaccard / intersection estimates engine-side.
    *
    * BOUND (`maxSegments`, the `pairsDaily(maxUidsPerCell)` discipline
    * made LOUD): the pair stage is quadratic in SEGMENTS — S²/2 pairs
    * each folding two ≤ k-long arrays, with the whole S·k-long sketch
    * table on the broadcast side. Right-sized for its documented grain
    * (days / cohorts / shards: hundreds to a few thousand segments), it
    * silently becomes the cost center at, say, 10⁵ user-grain segments
    * (5·10⁹ pairs, a multi-GB broadcast). Rather than degrade silently,
    * the guard fails loudly above the cap — INSIDE the plan, not as a
    * separate action: an UNPARTITIONED window counts the broadcast
    * (pair-build) side's own rows and a FILTER raises above the cap, so
    * the error fires while the broadcast side MATERIALIZES — before a
    * single quadratic pair is streamed — and construction stays LAZY.
    * Cost at any scale ≈ one single-task exchange of ≤ cap sketch rows
    * (the funnel is bounded by the guard itself; PlanSpec's
    * unpartitioned-window whitelist carries the bound). History: the r17
    * guard ran `limit(cap+1).count()` as an extra eager action plus a
    * persist (measured ~2.4×, replaced r18); the r18 guard cross-joined
    * a 1-row count aggregate that rode the sketch build's shuffle via
    * ReuseExchange but still re-ran the per-segment merge — a ~0.35 s
    * fixed residual, ~2× the unguarded floor (probes/r18). The r19
    * window guard rides side b's single evaluation: same-box 15-rep pair
    * guarded 0.370/0.394 vs unguarded 0.362/0.375 (min/p25,
    * probes/r19/kmv_overlap.*). Pass `maxSegments = 0` to disable when
    * the quadratic cost is understood, or pre-bucket segments coarser.
    */
  val DefaultMaxKmvSegments: Int = 4096 // ≈ 8.4M broadcast pairs — the ceiling of "pair stage stays trivial next to the sketch build"

  /** NOTE on sharing: the sketch table feeds two consumers (the pair
    * sides; the r19 guard counts side b's own rows in-plan and adds no
    * third subtree), but it is NOT persisted — both subtrees are
    * canonically identical above the sketch build's shuffle, so Spark's
    * ReuseExchange serves them from ONE events scan within the single
    * action (r18 adjudication: the r17 persist's cache round-trip cost
    * ~0.3 s fixed on a 0.4 s query while buying nothing the reused
    * exchange didn't already provide — probes/r18/, SCALING.md).
    * Construction is lazy: no Spark job runs until the returned frame is
    * acted on (the guard is in-plan). A caller who materializes the
    * result more than once should persist the RESULT (S²/2 small rows),
    * not the input.
    */
  def kmvOverlap(df: DataFrame, segCol: String, valueCol: String,
                 k: Int, maxSegments: Int = DefaultMaxKmvSegments): DataFrame =
    kmvOverlapOnSketches(
      df.filter(col(segCol).isNotNull && col(valueCol).isNotNull)
        .select(col(segCol).as("seg"), kmvHash(col(valueCol)).as("__hv"))
        .groupBy("seg").agg(kmvSketch(k)(col("__hv")).as("__mins")),
      k, maxSegments)

  /** The pair half of [[kmvOverlap]], over an ALREADY-BUILT sketch table
    * (`seg`, `__mins` ascending ≤ k-long hash array) — shared with the
    * streaming standing-sketch reader ([[graft.streaming.StreamingKmv]]),
    * where the sketches come out of a store instead of a scan. Enforces
    * the `maxSegments` bound documented on [[kmvOverlap]] (0 = off).
    */
  def kmvOverlapOnSketches(sk: DataFrame, k: Int,
                           maxSegments: Int = DefaultMaxKmvSegments): DataFrame = {
    val a = sk.select(col("seg").as("seg_a"), col("__mins").as("__ma"))
    val b0 = sk.select(col("seg").as("seg_b"), col("__mins").as("__mb"))
    // the guard lives INSIDE the broadcast side's plan as a FILTER (not a
    // separate count action — see the BOUND note on [[kmvOverlap]]): an
    // UNPARTITIONED window counts the broadcast side's own rows, and
    // every row must pass `__s ≤ cap` or raise. The count rides side b's
    // single evaluation — no separate count subtree at all, so nothing to
    // keep canonically identical for ReuseExchange and no third
    // evaluation of the sketch merge (the r18 cross-joined count
    // aggregate re-ran the per-segment merge after the reused exchange:
    // a measured ~0.35 s fixed residual on a 0.4 s query, ~2× the
    // unguarded floor — probes/r18 + r19 probe pair). The single-task
    // window funnel is bounded BY THE GUARD ITSELF: a conforming input
    // puts ≤ maxSegments sketch rows through it, and a violating one
    // raises before the quadratic stage streams (PlanSpec's
    // unpartitioned-window whitelist carries this bound). The filter
    // fires while the broadcast side MATERIALIZES — before any of the
    // S²/2 pairs stream — and the whole operator stays ONE lazy action.
    // The otherwise-branch coalesces the raise to FALSE so even an
    // optimizer that somehow skipped the raise would drop every row
    // loudly rather than run the quadratic stage.
    val b = if (maxSegments <= 0) b0 else {
      val all = org.apache.spark.sql.expressions.Window.partitionBy()
      b0.withColumn("__s", count(lit(1)).over(all))
        .filter(when(col("__s") <= maxSegments, lit(true))
          .otherwise(coalesce(
            raise_error(concat(
              col("__s").cast("string"),
              lit(s" segments exceed maxSegments=$maxSegments — the pair " +
                s"stage grows S²/2 broadcast pairs and would stop being " +
                s"trivial next to the sketch build; pre-bucket segments " +
                s"coarser or pass maxSegments=0 with the quadratic cost " +
                s"understood"))).cast("boolean"),
            lit(false))))
        .select(col("seg_b"), col("__mb"))
    }
    // one sketch row per segment: broadcast forces BroadcastNestedLoopJoin
    // for the non-equi pair condition (never a CartesianProduct)
    a.join(broadcast(b), col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        slice(array_sort(array_union(col("__ma"), col("__mb"))), 1, k).as("__u"),
        array_intersect(col("__ma"), col("__mb")).as("__both"))
      .select(col("seg_a"), col("seg_b"),
        size(col("__u")).cast("long").as("k_union"),
        element_at(col("__u"), -1).as("kth_union"),
        size(array_intersect(col("__u"), col("__both"))).cast("long")
          .as("n_inter"))
  }

  /** Engine-side estimates from KMV exact-integer state — the ln/division
    * floats are NOT part of any oracle contract (accuracy pinned in
    * SketchesSpec against exact counts, the [[hllEstimate]] discipline).
    * For distinct state (`n_kept`, `kth_scaled`): a sketch that never
    * filled (n < k) holds EVERY distinct hash, so the count is exact;
    * otherwise est = (k−1) / theta with theta = kth / 2^62.
    */
  def kmvEstimate(state: DataFrame, k: Int): DataFrame =
    state.withColumn("est_distinct",
      when(col("n_kept") < k, col("n_kept").cast("double"))
        .otherwise(lit((k - 1).toDouble) *
          (lit(KmvW.toDouble) / col("kth_scaled").cast("double"))))

  /** [[kmvEstimate]] for [[kmvOverlap]] state: union size from
    * (`k_union`, `kth_union`), Jaccard = `n_inter / k_union`, intersection
    * = Jaccard · union.
    */
  def kmvOverlapEstimate(overlap: DataFrame, k: Int): DataFrame = {
    val unionEst = when(col("k_union") < k, col("k_union").cast("double"))
      .otherwise(lit((k - 1).toDouble) *
        (lit(KmvW.toDouble) / col("kth_union").cast("double")))
    overlap
      .withColumn("est_union", unionEst)
      .withColumn("est_jaccard",
        col("n_inter").cast("double") / col("k_union").cast("double"))
      .withColumn("est_inter", col("est_jaccard") * col("est_union"))
  }
}
