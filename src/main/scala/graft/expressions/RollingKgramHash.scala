package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling hash of every k-gram of a string, as one native
  * codegen'd Expression returning `array<long>` (hash of the k bytes starting
  * at each position, in order; empty array when the text is shorter than k).
  *
  * Polynomial hash over UTF-8 bytes, base 257 modulo the Mersenne prime
  * 2^31 − 1: `h(j) = Σ byte(j+i) · 257^(k−1−i) mod M`. The rolling update
  * (`(h − b_out·257^(k−1)) · 257 + b_in mod M`) makes the whole column O(n)
  * per row instead of O(n·k) — the classic fingerprinting primitive
  * (Rabin 1981; Manber 1994 "finding similar files"). All intermediates fit
  * a 64-bit long (|h·257| < 2^39), and the direct per-position definition is
  * reproducible in plain SQL integer arithmetic, which is how the DuckDB
  * oracle twin computes it (the rolling and direct forms agree mod M).
  *
  * A Scala-UDF formulation would run the per-row loop through the lambda
  * interpreter and break WholeStageCodegen; this stays one tight JIT loop.
  */
case class RollingKgramHash(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_kgram_hash"

  override def nullSafeEval(text: Any, k: Any): Any =
    new GenericArrayData(RollingKgramHash.hashes(
      text.asInstanceOf[UTF8String].getBytes, k.asInstanceOf[Int]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, k) =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.expressions.RollingKgramHash.hashes($t.getBytes(), $k));""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object RollingKgramHash {
  val Mod: Long = (1L << 31) - 1 // Mersenne prime 2^31 − 1
  val Base: Long = 257L

  /** All k-gram hashes of `bytes` (unsigned byte values), rolling in O(n). */
  def hashes(bytes: Array[Byte], k: Int): Array[Long] = {
    require(k > 0, "k-gram length must be positive")
    val n = bytes.length
    if (n < k) return Array.emptyLongArray
    // 257^(k-1) mod M, for rolling the outgoing byte off
    var pow = 1L
    var i = 1
    while (i < k) { pow = pow * Base % Mod; i += 1 }
    val out = new Array[Long](n - k + 1)
    var h = 0L
    i = 0
    while (i < k) { h = (h * Base + (bytes(i) & 0xff)) % Mod; i += 1 }
    out(0) = h
    var j = 1
    while (j <= n - k) {
      h = java.lang.Math.floorMod(
        (h - (bytes(j - 1) & 0xff) * pow) * Base + (bytes(j + k - 1) & 0xff), Mod)
      out(j) = h
      j += 1
    }
    out
  }
}
