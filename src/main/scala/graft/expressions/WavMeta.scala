package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** PCM-WAV stream metadata from RAW RIFF BYTES, no audio library — the
  * audio-role sibling of [[ImageDims]]: an audio-corpus intake filters on
  * channel count / sample rate / duration at full scan width before any
  * sample decode or resample stage runs. Pure chunk-walk arithmetic
  * (RIFF/WAVE container, all little-endian):
  *
  *   - "RIFF" + size + "WAVE" preamble (offsets 0/8);
  *   - then a chunk walk (id + LE32 size, word-aligned) — chunks may
  *     appear in any order and extra chunks (LIST, fact, cue) are legal,
  *     so both "fmt " (channels@+10, rate@+12, bits@+22 relative to the
  *     chunk id) and "data" (payload size) are FOUND, not assumed at
  *     fixed offsets;
  *   - frames = dataSize / blockAlign (channels · bits/8).
  *
  * Returns `wav <channels> <rate> <bits> <frames>`; null when the bytes
  * are not a parseable PCM WAV — the quarantine predicate. Codegen'd
  * static call, stays inside WholeStageCodegen.
  */
case class WavMeta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "wav_meta"

  override def nullSafeEval(b: Any): Any =
    WavMeta.meta(b.asInstanceOf[Array[Byte]])

  // nullSafeCodeGen with an EXPLICIT isNull-from-result assignment, NOT
  // defineCodeGen: the latter assumes the function never returns null, so
  // a quarantined (null) parse escapes with isNull=false and NPEs the
  // UnsafeWriter once codegen splitting separates the assignment from the
  // consumer (surfaced by the media_router multi-parser projection).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.WavMeta.meta($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override def nullable: Boolean = true

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WavMeta {

  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    u8(b, i).toLong | (u8(b, i + 1).toLong << 8) |
      (u8(b, i + 2).toLong << 16) | (u8(b, i + 3).toLong << 24)
  private def tag(b: Array[Byte], i: Int, t: String): Boolean =
    b(i) == t.charAt(0).toByte && b(i + 1) == t.charAt(1).toByte &&
      b(i + 2) == t.charAt(2).toByte && b(i + 3) == t.charAt(3).toByte

  /** `wav ch rate bits frames`, or null for non-PCM-WAV bytes. */
  def meta(b: Array[Byte]): UTF8String = {
    if (b.length < 36 || !tag(b, 0, "RIFF") || !tag(b, 8, "WAVE")) return null
    // LONG cursor: a corrupt LE32 chunk size near 2^31 must walk the
    // cursor off the END (loop exits, null result), never wrap negative
    // into an out-of-bounds read — corrupt bytes are an expected input
    // class for an intake gate, and the contract is null, not a throw
    var i = 12L
    var ch = -1; var rate = -1L; var bits = -1; var dataSize = -1L
    while (i + 8 <= b.length && (ch < 0 || dataSize < 0)) {
      val ii = i.toInt
      val size = le32(b, ii + 4)
      if (tag(b, ii, "fmt ") && i + 8 + 16 <= b.length) {
        // PCM only: audioFormat (LE16 at +8) must be 1 and the fmt chunk
        // must carry the full 16-byte PCM layout. IEEE-float (3), ADPCM
        // (2), and WAVE_FORMAT_EXTENSIBLE (0xFFFE) streams would otherwise
        // parse "successfully" with frames = dataSize/blockAlign — wrong
        // for compressed formats — where the contract says null for
        // anything that is not a parseable PCM WAV.
        if (size < 16 || le16(b, ii + 8) != 1) return null
        ch = le16(b, ii + 10)
        rate = le32(b, ii + 12)
        bits = le16(b, ii + 22)
      } else if (tag(b, ii, "data")) {
        dataSize = size
      }
      // chunks are word-aligned: odd sizes carry a pad byte
      i += 8L + size + (size & 1L)
    }
    if (ch <= 0 || rate <= 0 || bits <= 0 || dataSize < 0) return null
    val blockAlign = ch.toLong * (bits / 8)
    if (blockAlign <= 0) return null
    UTF8String.fromString(s"wav $ch $rate $bits ${dataSize / blockAlign}")
  }
}
