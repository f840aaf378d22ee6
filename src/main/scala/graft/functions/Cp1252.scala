package graft.functions

import java.nio.charset.Charset
import java.nio.ByteBuffer
import java.nio.CharBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static Windows-1252 codec used by both interpreted eval and generated
  * code. Semantics mirror the reference's `toUtf8` decode half
  * (`hhek2sqlite.go:60-73`, which uses Go's `charmap.Windows1252` — the
  * same mapping as java.nio's windows-1252, incl. `€` = 0x80): every byte
  * decodes (cp1252's five unmapped code points fall back to U+FFFD like
  * Go's decoder), so the function is total and null-intolerant.
  *
  * Built-in alternative: `decode(col, 'windows-1252')` needs
  * `spark.sql.legacy.javaCharsets=true` on Spark ≥3.5 (SURVEY.md §2.7 F1);
  * this expression avoids the session-config dependency and stays inside
  * whole-stage codegen.
  */
object Cp1252Codec {
  private val cs: Charset = Charset.forName("windows-1252")

  def decode(bytes: Array[Byte]): UTF8String = {
    val cb = cs.newDecoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      .decode(ByteBuffer.wrap(bytes))
    UTF8String.fromString(cb.toString)
  }

  def encode(s: UTF8String): Array[Byte] = {
    val bb = cs.newEncoder()
      .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
      .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      .encode(CharBuffer.wrap(s.toString))
    val out = new Array[Byte](bb.remaining())
    bb.get(out)
    out
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
