package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Full BPE ENCODE of one word's symbol sequence against a learned merge
  * table — the tokenizer-application kernel ([[graft.ops.Bpe]] trains the
  * table; this applies it corpus-wide as a narrow codegen'd map).
  *
  * Semantics are REPLAY order: the result is bit-identical to applying
  * every merge rule once, in rank order, each as the leftmost
  * non-overlapping fold of [[BpeMerge]] — that unrolled replay is exactly
  * what the DuckDB oracle twin computes. The kernel does NOT loop over the
  * table (a production table is 30k+ rules; O(|table|) passes per word
  * would dwarf the scan): it repeatedly scans the CURRENT symbols for the
  * lowest-rank pair present with rank above the last applied, and folds
  * it. That is replay-exact because a fold at rank k can only create pairs
  * of rank > k (a pair's constituents must exist as symbols before the
  * pair can be learned, so every pair involving a rank-k output was
  * learned after step k), and ranks skipped between folds had no
  * occurrences at a state identical to the state replay would show them.
  * Cost is O(len²) map lookups per word — word length is tiny and the
  * merge-table size never enters.
  *
  * The merge table (lhs array, rhs array, index = rank) must be FOLDABLE —
  * it is driver-collected training output baked in as literals — so the
  * pair→rank hash builds once per task, not per row.
  */
case class BpeApply(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(StringType), ArrayType(StringType), ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "bpe_apply"

  override def checkInputDataTypes(): TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else if (!second.foldable || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        "bpe_apply merge tables (lhs, rhs arrays) must be foldable literals")
    else TypeCheckResult.TypeCheckSuccess
  }

  @transient private lazy val table: BpeApply.Table = BpeApply.buildTable(
    second.eval().asInstanceOf[ArrayData], third.eval().asInstanceOf[ArrayData])

  override def nullSafeEval(syms: Any, l: Any, r: Any): Any =
    BpeApply.encode(syms.asInstanceOf[ArrayData], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeApply.Table].getName)
    nullSafeCodeGen(ctx, ev, (s, _, _) =>
      s"""${ev.value} = (org.apache.spark.sql.catalyst.util.GenericArrayData)
         |  graft.expressions.BpeApply.encode($s, $ref);""".stripMargin)
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
                                                 t: Expression): Expression =
    copy(first = f, second = s, third = t)
}

object BpeApply {

  /** Rank-indexed merge table plus pair→rank lookup (key `l + ' ' + r`
    * —
    * unambiguous because symbols come from space-split words, so no
    * symbol can contain a space).
    */
  final class Table(val lhs: Array[String], val rhs: Array[String],
                    val rank: java.util.HashMap[String, Integer])
      extends Serializable

  def buildTable(lhsArr: ArrayData, rhsArr: ArrayData): Table = {
    val n = lhsArr.numElements()
    require(rhsArr.numElements() == n,
      s"merge lhs/rhs arrays differ in length: $n vs ${rhsArr.numElements()}")
    val lhs = Array.tabulate(n)(i => lhsArr.getUTF8String(i).toString)
    val rhs = Array.tabulate(n)(i => rhsArr.getUTF8String(i).toString)
    val rank = new java.util.HashMap[String, Integer](n * 2)
    var i = 0
    while (i < n) {
      val prev = rank.put(lhs(i) + " " + rhs(i), Integer.valueOf(i))
      require(prev == null,
        s"duplicate merge pair (${lhs(i)}, ${rhs(i)}) at ranks $prev and $i — " +
          "replay order would be ambiguous")
      i += 1
    }
    new Table(lhs, rhs, rank)
  }

  def encode(symsA: ArrayData, t: Table): GenericArrayData = {
    var len = symsA.numElements()
    val cur = new Array[String](len)
    var i = 0
    while (i < len) { cur(i) = symsA.getUTF8String(i).toString; i += 1 }
    var last = -1
    var continue = true
    while (continue && len >= 2) {
      var best = Int.MaxValue
      i = 0
      while (i < len - 1) {
        val r = t.rank.get(cur(i) + " " + cur(i + 1))
        if (r != null && r > last && r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) continue = false
      else {
        val l = t.lhs(best)
        val rr = t.rhs(best)
        var m = 0
        i = 0
        while (i < len) { // in-place fold: m <= i, reads stay ahead of writes
          if (m > 0 && cur(m - 1) == l && cur(i) == rr) cur(m - 1) = l + rr
          else { cur(m) = cur(i); m += 1 }
          i += 1
        }
        len = m
        last = best
      }
    }
    val out = new Array[AnyRef](len)
    i = 0
    while (i < len) { out(i) = UTF8String.fromString(cur(i)); i += 1 }
    new GenericArrayData(out)
  }
}
