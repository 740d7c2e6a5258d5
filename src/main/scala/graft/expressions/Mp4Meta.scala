package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MP4/ISO-BMFF container metadata from RAW BOX BYTES, no media library —
  * the video-role member of the [[ImageDims]]/[[WavMeta]] intake-gate trio:
  * a video-corpus intake filters on brand / dimensions / duration at full
  * scan width before any frame decode is worth scheduling. Pure box-walk
  * arithmetic (ISO/IEC 14496-12; all sizes big-endian):
  *
  *   - file = sequence of boxes `[be32 size][4cc type][payload]`; size 1
  *     switches to a be64 `largesize` after the type (header 16 bytes),
  *     size 0 means "to end of enclosing scope" — both legal and handled;
  *   - `ftyp`: major brand = the 4cc at payload+0 (§4.3);
  *   - `moov` (container, §8.2.1) → `mvhd` (§8.2.2): version byte picks
  *     the layout — v0 timescale/duration be32 at payload+12/+16, v1
  *     be32/be64 at payload+20/+24;
  *   - `moov` → `trak` (container) → `tkhd` (§8.3.2): width/height are
  *     16.16 fixed-point be32 after the 36-byte matrix — v0 at
  *     payload+76/+80, v1 at payload+88/+92 (creation, modification, and
  *     duration each widen to 64 bits: +12); the integer part is the
  *     pixel dimension. The first trak with nonzero extent wins (audio
  *     traks carry 0×0 by spec), so A/V files report the video track.
  *
  * Returns `mp4 <brand> <w> <h> <timescale> <duration>`; null when the
  * bytes are not a parseable ISO-BMFF container carrying ftyp + moov +
  * mvhd — the quarantine predicate. A file with no sized trak (audio-only)
  * parses with `0 0` extent rather than quarantining: it IS a valid
  * container, and the gate's dimension predicate drops it naturally.
  *
  * Hostile-size hardening (the [[WavMeta]] long-cursor lesson, §59-77
  * there): all cursors are Longs, a declared box size near 2³¹ (or a
  * be64 largesize with the top bit set) walks the cursor off the end —
  * loop exits, null result — and can never wrap negative into an
  * out-of-bounds read; sizes smaller than their own header are corrupt
  * and quarantine immediately. Codegen'd static call, stays inside
  * WholeStageCodegen.
  */
case class Mp4Meta(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = StringType
  override def prettyName: String = "mp4_meta"

  override def nullSafeEval(b: Any): Any =
    Mp4Meta.meta(b.asInstanceOf[Array[Byte]])

  // nullSafeCodeGen with an EXPLICIT isNull-from-result assignment, NOT
  // defineCodeGen: the latter assumes the function never returns null, so
  // a quarantined (null) parse escapes with isNull=false and NPEs the
  // UnsafeWriter once codegen splitting separates the assignment from the
  // consumer (surfaced by the media_router multi-parser projection).
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.expressions.Mp4Meta.meta($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override def nullable: Boolean = true

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Mp4Meta {

  private def u8(b: Array[Byte], i: Long): Int = b(i.toInt) & 0xff
  private def be16(b: Array[Byte], i: Long): Int =
    (u8(b, i) << 8) | u8(b, i + 1)
  private def be32(b: Array[Byte], i: Long): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) |
      (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def be64(b: Array[Byte], i: Long): Long =
    (be32(b, i) << 32) | be32(b, i + 4)
  /** Brand 4cc, SANITIZED for the space-delimited output contract: the
    * result string is `mp4 <brand> <w> ...`, so a brand carrying spaces or
    * non-printable bytes would silently SHIFT every downstream split
    * column. Real brands are printable (and QuickTime's `qt  ` carries
    * trailing spaces by spec), so printable-non-space bytes pass through
    * and everything else — including the space — becomes '_' : `qt__`,
    * still equi-joinable and filterable, never a column shift.
    */
  private def fourcc(b: Array[Byte], i: Long): String = {
    val cs = new Array[Char](4)
    var k = 0
    while (k < 4) {
      val c = b(i.toInt + k) & 0xff
      cs(k) = if (c > 0x20 && c < 0x7f) c.toChar else '_'
      k += 1
    }
    new String(cs)
  }
  private def isTag(b: Array[Byte], i: Long, t: String): Boolean =
    b(i.toInt) == t.charAt(0).toByte && b(i.toInt + 1) == t.charAt(1).toByte &&
      b(i.toInt + 2) == t.charAt(2).toByte && b(i.toInt + 3) == t.charAt(3).toByte

  /** Box header at `i` within [i, end): (payloadStart, boxEnd), or null on
    * a corrupt header (size smaller than its own header, or overflowing
    * bounds in a way that cannot be a truncation artifact). boxEnd may
    * exceed `end` for truncated input — callers treat that as walk-off.
    */
  private def header(b: Array[Byte], i: Long, end: Long): Array[Long] = {
    if (i + 8 > end) return null
    var size = be32(b, i)
    var hdr = 8L
    if (size == 1L) {
      if (i + 16 > end) return null
      size = be64(b, i + 8)
      hdr = 16L
    } else if (size == 0L) size = end - i // "to end of scope" (§4.2)
    if (size < hdr) return null // corrupt: box smaller than its own header
    Array(i + hdr, i + size)
  }

  /** `mp4 brand w h timescale duration`, or null for non-ISO-BMFF bytes. */
  def meta(b: Array[Byte]): UTF8String = {
    val n = b.length.toLong
    if (n < 16) return null
    var brand: String = null
    var moovS = -1L; var moovE = -1L
    var i = 0L
    while (i + 8 <= n && (brand == null || moovS < 0)) {
      val h = header(b, i, n)
      if (h == null) return null
      val s = h(0); val e = h(1)
      if (e > n) { i = n } // truncated final box: stop the walk
      else {
        if (isTag(b, i + 4, "ftyp") && s + 4 <= e) brand = fourcc(b, s)
        else if (isTag(b, i + 4, "moov")) { moovS = s; moovE = e }
        i = e
      }
    }
    if (brand == null || moovS < 0) return null
    // moov children: mvhd (required) and trak containers
    var timescale = -1L; var duration = -1L
    var w = 0L; var hgt = 0L
    var j = moovS
    while (j + 8 <= moovE) {
      val h = header(b, j, moovE)
      if (h == null) return null
      val s = h(0); val e = h(1)
      if (e > moovE) { j = moovE }
      else {
        if (isTag(b, j + 4, "mvhd") && s < e) {
          val v = u8(b, s)
          if (v == 1 && s + 32 <= e) {
            timescale = be32(b, s + 20); duration = be64(b, s + 24)
          } else if (v == 0 && s + 20 <= e) {
            timescale = be32(b, s + 12); duration = be32(b, s + 16)
          } else return null
        } else if (isTag(b, j + 4, "trak") && w == 0L && hgt == 0L) {
          // trak children: tkhd carries the 16.16 fixed-point extent
          var t = s
          while (t + 8 <= e) {
            val th = header(b, t, e)
            if (th == null) return null
            val ts = th(0); val te = th(1)
            if (te > e) { t = e }
            else {
              if (isTag(b, t + 4, "tkhd") && ts < te) {
                val v = u8(b, ts)
                val off = if (v == 1) 88L else 76L
                if (ts + off + 8 <= te) {
                  w = be32(b, ts + off) >> 16      // 16.16 → integer part
                  hgt = be32(b, ts + off + 4) >> 16
                }
              }
              t = te
            }
          }
        }
        j = e
      }
    }
    if (timescale <= 0 || duration < 0) return null
    UTF8String.fromString(s"mp4 $brand $w $hgt $timescale $duration")
  }
}
