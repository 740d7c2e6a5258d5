package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types.{DataType, StringType}

/** HTML character-reference decode — the entity step of
  * [[graft.ops.TextOps.htmlExtract]] as ONE left-to-right pass: the six
  * ubiquitous named entities (`&lt; &gt; &quot; &nbsp; &amp;` plus the
  * apostrophe) and numeric character references (`&#NNN;` decimal,
  * `&#xHH;` hex) for the printable subset.
  *
  * Why an expression and not the previous regexp_replace chain: ordered
  * passes cannot decode numeric references spec-correctly. With numeric
  * BEFORE the `&amp;` pass, `&#38;amp;` double-decodes (`&#38;`→`&`, then
  * `&amp;`→`&`); with numeric AFTER, `&amp;#65;` double-decodes
  * (`&amp;`→`&`, then `&#65;`→`A`). The HTML reading is one decode per
  * source reference — exactly what a single left-to-right scan gives:
  * every consumed reference's output is emitted, never re-examined. (The
  * prior chain was correct only because it stopped at named entities with
  * `&amp;` ordered last.)
  *
  * Printable subset: references resolving to C0/C1 controls (except the
  * textual `\t \n \r`, which the downstream whitespace collapse absorbs),
  * DEL, surrogate halves, or beyond U+10FFFF stay as LITERAL text — a
  * corpus document citing `&#0;` is describing a control character, not
  * containing one, and fabricating unassignable code points would poison
  * downstream UTF-8. Malformed references (`&#;`, `&#xZZ;`, unterminated,
  * over-long digit runs) also pass through untouched.
  *
  * Codegen'd scan, zero allocation beyond the output buffer; `decode`
  * never returns null (null input short-circuits via UnaryExpression), so
  * `defineCodeGen` is safe here — the binary parsers' nullSafeCodeGen
  * lesson applies only to kernels that can RETURN null.
  */
case class EntityDecode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "entity_decode"

  override def nullSafeEval(s: Any): Any =
    EntityDecode.decode(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.EntityDecode.decode($c)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object EntityDecode {

  private val Named: Array[(String, Char)] = Array(
    "&lt;" -> '<', "&gt;" -> '>', "&quot;" -> '"', "&apos;" -> '\'',
    "&nbsp;" -> ' ', "&amp;" -> '&')

  /** Textual whitespace or a printable assignable scalar value. */
  private def printable(cp: Int): Boolean =
    cp == 0x09 || cp == 0x0A || cp == 0x0D ||
      (cp >= 0x20 && cp <= 0x10FFFF && cp != 0x7F &&
        !(cp >= 0x80 && cp <= 0x9F) && !(cp >= 0xD800 && cp <= 0xDFFF))

  def decode(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    if (str.indexOf('&') < 0) return s // fast path: nothing to decode
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val ch = str.charAt(i)
      if (ch != '&') { sb.append(ch); i += 1 }
      else {
        val next = tryRef(str, i, sb)
        if (next > i) i = next
        else { sb.append('&'); i += 1 }
      }
    }
    UTF8String.fromString(sb.toString)
  }

  /** Attempt a reference at `str(i) == '&'`; on success append its decoded
    * text and return the index PAST the `;`, else return `i` (caller copies
    * the `&` literally and moves on one char).
    */
  private def tryRef(str: String, i: Int, sb: java.lang.StringBuilder): Int = {
    val n = str.length
    var k = 0
    while (k < Named.length) {
      val (e, v) = Named(k)
      if (str.regionMatches(i, e, 0, e.length)) { sb.append(v); return i + e.length }
      k += 1
    }
    if (i + 2 >= n || str.charAt(i + 1) != '#') return i
    var j = i + 2
    val hex = { val c = str.charAt(j); c == 'x' || c == 'X' }
    if (hex) j += 1
    val digits0 = j
    var cp = 0L
    val maxDigits = if (hex) 6 else 7
    while (j < n && j - digits0 < maxDigits + 1 && isDigit(str.charAt(j), hex)) {
      cp = cp * (if (hex) 16 else 10) + digitVal(str.charAt(j))
      j += 1
    }
    val nd = j - digits0
    if (nd < 1 || nd > maxDigits || j >= n || str.charAt(j) != ';') return i
    if (!printable(cp.toInt) || cp > 0x10FFFF) return i
    sb.appendCodePoint(cp.toInt)
    j + 1
  }

  private def isDigit(c: Char, hex: Boolean): Boolean =
    (c >= '0' && c <= '9') ||
      (hex && ((c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')))

  private def digitVal(c: Char): Int =
    if (c <= '9') c - '0'
    else if (c >= 'a') c - 'a' + 10
    else c - 'A' + 10
}
