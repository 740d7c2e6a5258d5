package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Distinct sliding-window minima of a long array — the winnowing
  * selection kernel (Schleimer et al. SIGMOD 2003) as a native O(n)
  * expression. The SQL-comprehension form (`transform` + `slice` +
  * `array_min`) is O(n·w) and allocates a w-slice per window, which made
  * fp_winnow the slowest query in the suite (6.8 s at sf0.1); the
  * classic monotonic-deque sliding minimum does one pass with zero
  * per-window allocation. Selection semantics are identical because the
  * selected SET is tie-rule-independent: equal minima share the hash
  * value, so WHICH minimal index wins never changes the output
  * (`TextFeaturesSpec` pins expression ≡ comprehension on random input).
  *
  * Conventions (the winnowing ≥1-fingerprint guarantee): fewer elements
  * than one window → the single global minimum; empty input → empty
  * output. Output order is first-occurrence of each distinct minimum —
  * deterministic, and consumers impose a total ORDER BY anyway.
  */
case class WinnowMin(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(LongType), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_min"

  override def nullSafeEval(arr: Any, w: Any): Any =
    WinnowMin.select(arr.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, w) =>
      s"graft.expressions.WinnowMin.select($a, $w)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

object WinnowMin {

  /** One-pass monotonic-deque sliding minimum, distinct first-occurrence. */
  def select(arr: ArrayData, w: Int): ArrayData = {
    require(w >= 1, "window must be at least 1")
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    if (n < w) {
      var m = arr.getLong(0)
      var i = 1
      while (i < n) { val v = arr.getLong(i); if (v < m) m = v; i += 1 }
      return new GenericArrayData(Array(m))
    }
    val deque = new Array[Int](n) // indices, values increasing front→back
    var head = 0; var tail = 0    // [head, tail)
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    while (i < n) {
      val v = arr.getLong(i)
      while (tail > head && arr.getLong(deque(tail - 1)) >= v) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) {
        val m = arr.getLong(deque(head))
        if (seen.add(m)) out.add(m)
      }
      i += 1
    }
    val res = new Array[Long](out.size)
    var j = 0
    while (j < res.length) { res(j) = out.get(j); j += 1 }
    new GenericArrayData(res)
  }
}
