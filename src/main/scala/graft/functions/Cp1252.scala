package graft.functions

import java.nio.charset.Charset
import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Windows-1252 codec used by both interpreted eval and generated
  * code. Semantics mirror the reference's `toUtf8` decode half
  * (`hhek2sqlite.go:60-73`) EXACTLY: Go's `charmap.Windows1252` follows
  * the WHATWG windows-1252 index, where the five code points cp1252
  * leaves undefined (0x81/0x8D/0x8F/0x90/0x9D) decode to the C1 control
  * characters U+0081/U+008D/U+008F/U+0090/U+009D — NOT U+FFFD, which is
  * what java.nio's windows-1252 decoder substitutes. The decode table
  * below is java.nio's mapping with those five positions overridden to
  * the C1 controls, making the decode total AND bijective over all 256
  * bytes (TransformsSpec asserts both properties byte-by-byte).
  *
  * The encode half inverts the table (so the five C1 controls map back
  * to their bytes — full 256-byte round-trip) and substitutes '?' for
  * unmappable code points, one per code point. The reference has no
  * encode analog to diverge from: its reverse mode passes UTF-8 bytes
  * through unchanged (`hhek2sqlite.go:63-65`).
  *
  * Built-in alternative: `decode(col, 'windows-1252')` needs
  * `spark.sql.legacy.javaCharsets=true` on Spark ≥3.5 (SURVEY.md §2.7 F1),
  * and carries java.nio's U+FFFD policy; this expression avoids the
  * session-config dependency, matches the reference byte-for-byte, and
  * stays inside whole-stage codegen.
  */
object Cp1252Codec {
  private val cs: Charset = Charset.forName("windows-1252")

  /** byte (0..255) → char, WHATWG/Go-exact. */
  val decodeTable: Array[Char] = {
    val t = new Array[Char](256)
    var b = 0
    while (b < 256) {
      val cb = cs.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
        .decode(ByteBuffer.wrap(Array(b.toByte)))
      t(b) = cb.get(0)
      b += 1
    }
    // WHATWG / Go charmap.Windows1252: undefined positions are the C1
    // controls, not java.nio's U+FFFD
    Seq(0x81, 0x8D, 0x8F, 0x90, 0x9D).foreach(b => t(b) = b.toChar)
    t
  }

  /** char → cp1252 byte (-1 = unmappable); exact inverse of
    * [[decodeTable]]. */
  private val encodeTable: Array[Short] = {
    val t = Array.fill[Short](65536)(-1)
    var b = 0
    while (b < 256) { t(decodeTable(b)) = b.toShort; b += 1 }
    t
  }

  def decode(bytes: Array[Byte]): UTF8String = {
    val chars = new Array[Char](bytes.length)
    var i = 0
    while (i < bytes.length) {
      chars(i) = decodeTable(bytes(i) & 0xFF)
      i += 1
    }
    UTF8String.fromString(new String(chars))
  }

  def encode(s: UTF8String): Array[Byte] = {
    val str = s.toString
    val out = new Array[Byte](str.length) // ≤ one byte per char
    var i = 0
    var o = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val b = if (cp < 65536) encodeTable(cp) else -1
      out(o) = if (b >= 0) b.toByte else '?'.toByte // one '?' per code point
      o += 1
      i += Character.charCount(cp)
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }
}

/** `cp1252_decode(binary) -> string`: Windows-1252 bytes → UTF-8 string.
  * Codegen'd via a static call so it stays inside WholeStageCodegen.
  */
case class Cp1252Decode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "cp1252_decode"

  override def nullSafeEval(v: Any): Any =
    Cp1252Codec.decode(v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Cp1252Codec.decode($c)")

  override protected def withNewChildInternal(c: Expression): Cp1252Decode = copy(c)
}

/** `cp1252_encode(string) -> binary`: UTF-8 string → Windows-1252 bytes
  * (the reverse-conversion half; unmappable chars → '?', matching
  * java.nio/Go replacement behavior).
  */
case class Cp1252Encode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "cp1252_encode"

  override def nullSafeEval(v: Any): Any =
    Cp1252Codec.encode(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Cp1252Codec.encode($c)")

  override protected def withNewChildInternal(c: Expression): Cp1252Encode = copy(c)
}

object Cp1252 {
  // Input types pinned by explicit casts (ExpectsInputTypes is
  // private[sql] in Spark 4, so type coercion is done at the wrapper).
  def decodeCol(c: Column): Column =
    Bridge.column(Cp1252Decode(Bridge.expression(c.cast(BinaryType))))
  def encodeCol(c: Column): Column =
    Bridge.column(Cp1252Encode(Bridge.expression(c.cast(StringType))))
}
