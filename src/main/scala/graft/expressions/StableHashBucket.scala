package graft.expressions

import java.math.BigInteger
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bit-exact port of the reference's deterministic bucket hash
  * (`pipelines/ais_pipeline.py:532-535`):
  * `int(sha256(str(v).encode())[:16], 16) % num_buckets`
  * i.e. the first 16 hex chars of SHA-256 of the string value, parsed as an
  * unsigned 64-bit hex integer, modulo the bucket count. The contract is that
  * the same key lands in the same bucket across runs/engines
  * (`docs/data_contracts.md:44`), so repeatability matters more than speed —
  * but this is still codegen'd and allocation-light (thread-local digest).
  */
case class StableHashBucket(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  // return type inferred: AbstractDataType is private[sql], not nameable here
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = LongType
  override def prettyName: String = "stable_hash_bucket"

  override def nullSafeEval(value: Any, n: Any): Any =
    StableHashBucket.bucket(value.asInstanceOf[UTF8String].toString, n.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, n) =>
      s"${ev.value} = graft.expressions.StableHashBucket.bucket($v.toString(), $n);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object StableHashBucket {
  private val digest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("SHA-256")
  }
  private val HEX = "0123456789abcdef".toCharArray

  /** First 16 hex chars of sha256(s) as unsigned 64-bit int, mod n. */
  def bucket(s: String, n: Int): Long = {
    val md = digest.get()
    md.reset()
    val bytes = md.digest(s.getBytes(StandardCharsets.UTF_8))
    // first 16 hex chars == first 8 bytes, unsigned
    val hex = new Array[Char](16)
    var i = 0
    while (i < 8) {
      hex(2 * i) = HEX((bytes(i) >> 4) & 0xf)
      hex(2 * i + 1) = HEX(bytes(i) & 0xf)
      i += 1
    }
    // unsigned 64-bit value mod n via BigInteger only when the sign bit is set
    val raw = java.lang.Long.parseUnsignedLong(new String(hex), 16)
    if (raw >= 0) raw % n
    else new BigInteger(java.lang.Long.toUnsignedString(raw)).mod(BigInteger.valueOf(n)).longValueExact()
  }
}
