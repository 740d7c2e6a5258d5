package graft.expressions

import java.util.zip.Deflater

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}

/** Deflate-compressed byte size of a string — the raw material of the
  * compression-ratio quality signal (CCNet/Gopher-style): heavily repetitive
  * or templated text compresses far below natural prose, random/encrypted
  * blobs barely compress at all. Runs as a native codegen'd expression so
  * the per-row Deflater call sits inside WholeStageCodegen rather than a
  * deserialize-per-row Scala UDF.
  *
  * Determinism: fixed level 6, no dictionary, `nowrap = false` — the same
  * input bytes produce the same size on every JVM shipping the bundled
  * zlib. No SQL twin exists (no DuckDB deflate), so consumers are
  * spec-gated, not oracle-gated — keep it out of hash-compared declared
  * queries.
  */
case class DeflateSize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "deflate_size"

  override def nullSafeEval(s: Any): Any =
    DeflateSize.size(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.DeflateSize.size($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DeflateSize {
  // one native Deflater (and scratch buffer) per task thread, reset between
  // rows — allocating a fresh native context per row would dominate the
  // scan; reset() reuses the allocation with identical output
  private val local = ThreadLocal.withInitial[(Deflater, Array[Byte])](() =>
    (new Deflater(6, false), new Array[Byte](8192)))

  def size(s: UTF8String): Int = {
    val (d, buf) = local.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}
