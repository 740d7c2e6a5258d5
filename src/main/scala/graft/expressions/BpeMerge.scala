package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One BPE merge applied to a symbol sequence: every LEFTMOST,
  * NON-OVERLAPPING adjacent occurrence of (left, right) becomes the single
  * symbol `left || right` — the inner step of byte-pair-encoding tokenizer
  * training ([[graft.ops.Bpe]]).
  *
  * Semantics are the single left-to-right fold both engines reproduce
  * exactly (the DuckDB twin is a `list_reduce` with the same CASE): append
  * the next symbol unless the accumulator's last element equals `left` and
  * the next equals `right`, in which case replace the last element with the
  * concatenation. A freshly merged symbol is a single element, so it can
  * never donate its tail to a second overlapping merge — 'a a a' under
  * (a,a) is '[aa] a', not '[aa] [aa]'.
  *
  * Null elements cannot occur (symbols come from regexp_extract_all);
  * a null array stays null.
  */
case class BpeMerge(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType), StringType, StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "bpe_merge"

  override def nullSafeEval(syms: Any, l: Any, r: Any): Any =
    BpeMerge.merge(syms.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, l, r) =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)
         |  graft.expressions.BpeMerge.merge($s, $l, $r);""".stripMargin)

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object BpeMerge {
  def merge(syms: ArrayData, l: UTF8String, r: UTF8String): GenericArrayData = {
    val n = syms.numElements()
    val out = new Array[AnyRef](n)
    var m = 0
    var i = 0
    while (i < n) {
      val s = syms.getUTF8String(i)
      if (m > 0 && out(m - 1).asInstanceOf[UTF8String].equals(l) && s.equals(r)) {
        out(m - 1) = UTF8String.concat(l, r)
      } else {
        out(m) = s
        m += 1
      }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }
}
