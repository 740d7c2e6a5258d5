package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Dot product of two double arrays as a native codegen'd Expression.
  *
  * The brute-force cosine top-k path evaluates n·k dots of embedding vectors;
  * a higher-order-function composition (`aggregate(zip_with(...))`) runs the
  * lambda interpreter per element, which is the hot-loop cost at 100 TB. This
  * expression is one tight JIT-able loop inside WholeStageCodegen.
  *
  * Summation is strict left-to-right (acc += a(i)*b(i)), matching a SQL
  * left-associative `a[1]*b[1] + a[2]*b[2] + …` chain bit-for-bit — which is
  * exactly how the DuckDB oracle SQL is generated (SparkEntry.dotSql).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.VecDot.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object VecDot {
  /** Strict in-order fold; length = min(|a|,|b|). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}
