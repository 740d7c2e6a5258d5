package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) interleave of two non-negative 32-bit keys into one
  * 64-bit sort key — the multi-dimensional clustering primitive behind
  * data-skipping layouts: sorting files by `z(cell, hour)` keeps rows close
  * in BOTH dimensions close in the file order, so parquet min/max row-group
  * stats prune scans filtered on EITHER dimension (a single-column sort
  * only prunes its leading column). Bit `i` of `x` lands at bit `2i`, bit
  * `i` of `y` at bit `2i+1`.
  *
  * The expansion uses the standard parallel-prefix bit spreading (6 shift/
  * mask steps per key, branch-free) inside WholeStageCodegen — no lambda
  * interpreter, no UDF. Inputs are masked to their low 32 bits; bit 31 of
  * `y` lands on the long's sign bit, so keep keys below 2^31 (any sane
  * bucket/cell/hour domain) when the key must sort as a signed long.
  */
case class BitInterleave(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "bit_interleave"

  override def nullSafeEval(x: Any, y: Any): Any =
    BitInterleave.morton(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) =>
      s"${ev.value} = graft.expressions.BitInterleave.morton($x, $y);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object BitInterleave {
  /** Spread the low 32 bits of `v` to even bit positions. */
  def spread(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  def morton(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** Inverse of [[spread]]: gather the even bit positions back to the low
    * 32 bits (test/debug aid — proves the interleave is lossless).
    */
  def compact(v: Long): Long = {
    var x = v & 0x5555555555555555L
    x = (x | (x >> 1)) & 0x3333333333333333L
    x = (x | (x >> 2)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x >> 4)) & 0x00ff00ff00ff00ffL
    x = (x | (x >> 8)) & 0x0000ffff0000ffffL
    x = (x | (x >> 16)) & 0x00000000ffffffffL
    x
  }
}
