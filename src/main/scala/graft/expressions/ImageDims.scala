package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Image format + dimensions from RAW HEADER BYTES, no decoder library —
  * the first pass a 100 TB image-corpus intake actually runs: dimension /
  * aspect-ratio / format filters must execute at full scan width over the
  * opaque binary column BEFORE any pixel decode is worth scheduling (the
  * decode stage costs ~10⁴× more per row and usually runs on a fraction of
  * the corpus). Pure byte arithmetic on the container headers:
  *
  *   - PNG: 8-byte signature, IHDR chunk fixed at offset 8 — width/height
  *     big-endian at offsets 16/20 (PNG spec §5.2, §11.2.2).
  *   - GIF: "GIF87a"/"GIF89a", logical-screen width/height LITTLE-endian
  *     at offsets 6/8 (GIF89a spec §18).
  *   - JPEG: FF D8 then a marker walk — each segment FF xx + big-endian
  *     length; dimensions live in the first SOFn frame header (C0–CF
  *     except the non-frame C4/C8/CC): height@+5, width@+7 (JPEG ITU T.81
  *     §B.2.2). The walk is bounded by the payload length.
  *
  * Returns the canonical string `fmt w h` (e.g. `png 640 480`) so one
  * expression evaluation serves all three projections via `split`; null
  * for bytes that parse as none of the three — the router predicate for a
  * quarantine, mirroring the drop-unparsable ingest discipline. Codegen'd
  * static call, stays inside WholeStageCodegen.
  */
case class ImageDims(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "image_dims"

  override def nullSafeEval(b: Any): Any =
    ImageDims.dims(b.asInstanceOf[Array[Byte]])

  // nullSafeCodeGen with an EXPLICIT isNull-from-result assignment, NOT
  // defineCodeGen: the latter assumes the function never returns null, so
  // a quarantined (null) parse escapes with isNull=false and NPEs the
  // UnsafeWriter once codegen splitting separates the assignment from the
  // consumer (surfaced by the media_router multi-parser projection).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.ImageDims.dims($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override def nullable: Boolean = true

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object ImageDims {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  /** `fmt w h`, or null when the bytes are none of PNG/GIF/JPEG. */
  def dims(b: Array[Byte]): UTF8String = {
    if (b.length >= 24 &&
        u8(b, 0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        u8(b, 4) == 0x0d && u8(b, 5) == 0x0a && u8(b, 6) == 0x1a && u8(b, 7) == 0x0a &&
        b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      return UTF8String.fromString(s"png ${be32(b, 16)} ${be32(b, 20)}")
    if (b.length >= 10 &&
        b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      return UTF8String.fromString(s"gif ${le16(b, 6)} ${le16(b, 8)}")
    if (b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8) {
      // marker walk: FFD8, then FF xx [be16 length including itself].
      // T.81 §B.1.1.2 allows any number of 0xFF FILL bytes before a
      // marker byte, so the walk consumes the whole 0xFF run before
      // reading the marker — treating a fill byte as the marker would
      // misread the next 0xFF as a segment length. The walk TERMINATES at
      // SOS (entropy-coded data follows, where naive length-skips are
      // meaningless) and EOI: reaching either without an SOF means no
      // parseable frame header — null, the quarantine contract.
      var i = 2
      while (i < b.length && u8(b, i) == 0xff) {
        while (i < b.length && u8(b, i) == 0xff) i += 1 // fill bytes
        if (i >= b.length) return null
        val m = u8(b, i)
        if (m == 0xd9 || m == 0xda) return null // EOI / SOS before any SOF
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          if (i + 7 >= b.length) return null
          return UTF8String.fromString(
            s"jpeg ${be16(b, i + 6)} ${be16(b, i + 4)}")
        }
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 1 // bare markers
        else {
          if (i + 2 >= b.length) return null
          val len = be16(b, i + 1)
          if (len < 2) return null // corrupt length would stall the walk
          i += 1 + len
        }
      }
    }
    null
  }
}
