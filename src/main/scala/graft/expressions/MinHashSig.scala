package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** k-slot MinHash signature of a string array (the per-doc shingle set), as
  * ONE native codegen'd Expression returning `array<long>` — the
  * production-path signature kernel behind [[graft.ops.Dedup
  * .fastMinhashSignature]].
  *
  * Algorithm: each element is xxhash64'd ONCE (`XXH64.hashUnsafeBytes` on
  * the UTF8String's raw bytes — zero copies, zero String churn), then the k
  * slot values derive by k O(1) splitmix64 finalizer mixes of that one
  * hash (Broder's "one hash + k permutations" construction) — per-row cost
  * O(bytes + k·elements), not O(k·bytes·elements).
  *
  * Why an Expression and not `transform`/`array_min` built-ins: Spark's
  * higher-order functions evaluate their lambdas INTERPRETED (no doGenCode)
  * and allocate an intermediate array per seed — measured 7–12× slower
  * than even the exploded md5 aggregate at sf0.1. This kernel stays one
  * tight JIT loop inside WholeStageCodegen with a single result
  * allocation.
  *
  * Cross-engine note: xxhash64+splitmix has no DuckDB twin, so declared
  * dedup queries keep the md5-string MinHash (the audit path the oracle
  * recomputes bit-for-bit); this form is spec-verified (set-determined,
  * partition-independent, LSH-collision-compatible).
  *
  * NULL semantics: null elements are skipped; an EMPTY (or all-null) array
  * yields null — "no shingles → no signature", matching the md5 path's
  * absent row.
  */
case class MinHashSig(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(arr: Any, k: Any): Any =
    MinHashSig.sig(arr.asInstanceOf[ArrayData], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, (a, k) =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)
         |  graft.expressions.MinHashSig.sig($a, $k);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)
    code
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** End-to-end MinHash kernel: TEXT in, k-slot signature out — tokenize on
  * single spaces, form n-token shingles, xxhash64 each shingle, take the k
  * splitmix-mixed minima, all in ONE pass over the string's UTF-8 bytes
  * with ZERO intermediate allocation.
  *
  * The trick that makes it allocation-free: shingles are n tokens joined by
  * a single space, and `split(text, " ")` tokens are the text's own
  * space-separated byte runs — so every shingle's bytes are EXACTLY a
  * contiguous byte span of the original string (empty tokens from repeated
  * spaces reproduce those repeated spaces in the joined form too). The
  * kernel hashes `XXH64.hashUnsafeBytes` over each token-window span
  * in place. Duplicate shingles need no dedup: a multiset's minimum is its
  * set's minimum, so the signature equals the md5-path's distinct-shingle
  * semantics by construction (space bytes cannot occur inside multi-byte
  * UTF-8 sequences, so boundaries are byte-exact).
  *
  * Produces the same signatures as [[MinHashSig]] over
  * `shinglesOfTokens(tokens(text), n)` — property-tested — at none of the
  * interpreted higher-order-function cost. Null when fewer than n tokens.
  */
case class MinHashText(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, IntegerType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_text"

  override def nullSafeEval(text: Any, n: Any, k: Any): Any =
    MinHashSig.sigOfText(text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      n.asInstanceOf[Int], k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n, k) =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)
         |  graft.expressions.MinHashSig.sigOfText($t, $n, $k);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

/** DISTINCT n-token shingle hashes of a text, as ONE codegen'd pass:
  * `array<long>` of xxhash64 over each distinct shingle's in-place byte
  * span (same span walk as [[MinHashText]] — shingles joined by ' ' ARE
  * contiguous spans), sort+dedup'd in a primitive array. Replaces the
  * `explode(array_distinct(transform(...concat_ws...)))` string-churn
  * stage of the exact n-gram tier: downstream (hot-shingle count, doc-list
  * groupBy) consumes 8-byte keys that never existed as Strings at all.
  * Per-doc distinctness — the thing Jaccard counts measure — is what
  * sort+dedup preserves. Null when fewer than n tokens (explode then drops
  * the doc, matching the string path's empty array).
  */
case class ShingleHashes(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(text: Any, n: Any): Any =
    MinHashSig.shingleHashes(
      text.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, n) =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)
         |  graft.expressions.MinHashSig.shingleHashes($t, $n);
         |${ev.isNull} = ${ev.value} == null;""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object MinHashSig {
  /** Element-hash seed; fixed so signatures are stable artifacts. */
  val Seed = 42L
  private val Golden = 0x9E3779B97F4A7C15L

  /** splitmix64 finalizer — the slot-i permutation of the element hash. */
  @inline private def mix(z0: Long): Long = {
    var z = z0
    z ^= (z >>> 30); z *= 0xBF58476D1CE4E5B9L
    z ^= (z >>> 27); z *= 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** k slot minima over the array's element hashes; null when no non-null
    * element exists (no shingles → no signature).
    */
  def sig(arr: ArrayData, k: Int): GenericArrayData = {
    require(k > 0, "minhash_sig k must be positive")
    val n = arr.numElements()
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        any = true
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, Seed)
        var i = 0
        while (i < k) {
          val v = mix(h + Golden * (i + 1))
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) null else new GenericArrayData(mins)
  }

  /** Distinct shingle-hash kernel (see [[ShingleHashes]]): the same span
    * walk as [[sigOfText]], but emitting the distinct span hashes
    * themselves — sorted ascending (sort is the dedup). Null when fewer
    * than n tokens.
    */
  def shingleHashes(text: org.apache.spark.unsafe.types.UTF8String,
                    n: Int): GenericArrayData = {
    require(n > 0, "shingle_hashes n must be positive")
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    var nTokens = 1
    var p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) nTokens += 1
      p += 1
    }
    if (nTokens < n) return null
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var t = 0
    starts(0) = 0
    p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) {
        ends(t) = p; t += 1; starts(t) = p + 1
      }
      p += 1
    }
    ends(t) = len
    val nSh = nTokens - n + 1
    val hs = new Array[Long](nSh)
    var w = 0
    while (w < nSh) {
      val s = starts(w)
      val e = ends(w + n - 1)
      hs(w) = XXH64.hashUnsafeBytes(base, off + s, e - s, Seed)
      w += 1
    }
    java.util.Arrays.sort(hs)
    var uniq = 1
    var i = 1
    while (i < nSh) {
      if (hs(i) != hs(i - 1)) { hs(uniq) = hs(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(if (uniq == nSh) hs else java.util.Arrays.copyOf(hs, uniq))
  }

  /** One-pass text→signature kernel (see [[MinHashText]]): token boundaries
    * by scanning for 0x20, shingle hashes over in-place byte spans, k
    * mixed minima. Null when fewer than n tokens.
    */
  def sigOfText(text: org.apache.spark.unsafe.types.UTF8String, n: Int,
                k: Int): GenericArrayData = {
    require(n > 0, "minhash_text n must be positive")
    require(k > 0, "minhash_text k must be positive")
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val len = text.numBytes
    // token i spans [starts(i), ends(i)); split(" ", text) semantics — an
    // empty string still yields one (empty) token, like Spark's split
    var nTokens = 1
    var p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) nTokens += 1
      p += 1
    }
    if (nTokens < n) return null
    val starts = new Array[Int](nTokens)
    val ends = new Array[Int](nTokens)
    var t = 0
    starts(0) = 0
    p = 0
    while (p < len) {
      if (org.apache.spark.unsafe.Platform.getByte(base, off + p) == 0x20) {
        ends(t) = p; t += 1; starts(t) = p + 1
      }
      p += 1
    }
    ends(t) = len
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var w = 0
    val lastW = nTokens - n
    while (w <= lastW) {
      val s = starts(w)
      val e = ends(w + n - 1)
      val h = XXH64.hashUnsafeBytes(base, off + s, e - s, Seed)
      var i = 0
      while (i < k) {
        val v = mix(h + Golden * (i + 1))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      w += 1
    }
    new GenericArrayData(mins)
  }
}
