package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, FloatType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Go `%g` float formatting (the reference's F5,
  * `fmt.Sprintf("%g", FastRanta)` at `hhek2sqlite.go:869-870`):
  * SHORTEST round-trip digits, positional form for decimal exponent in
  * [-4, 6), scientific `d.ddde±XX` otherwise — per Go strconv's ftoa
  * ('g', precision -1 ⇒ eprec 6). Neither Java's `%g` (pads to 6
  * significant digits) nor Spark's float→string cast (`100000.0`,
  * `1.0E7`) matches this layout.
  */
object GoFormat {

  def goFloatRepr(f: Float): UTF8String = UTF8String.fromString(format(f))

  private[functions] def format(f: Float): String = {
    if (java.lang.Float.isNaN(f)) return "NaN"
    if (java.lang.Float.isInfinite(f)) return if (f > 0) "+Inf" else "-Inf"
    if (f == 0.0f) return if (1 / f < 0) "-0" else "0"
    val neg = f < 0
    // Java Float.toString yields the shortest decimal that round-trips —
    // the same digit string Go uses; only the layout differs.
    val s = java.lang.Float.toString(math.abs(f))
    val (mantissa, javaExp) = s.indexOf('E') match {
      case -1 => (s, 0)
      case i => (s.substring(0, i), s.substring(i + 1).toInt)
    }
    val point = mantissa.indexOf('.')
    val rawDigits = mantissa.replace(".", "")
    val lead = rawDigits.indexWhere(_ != '0') // Float.toString: never all zeros here
    val digits = rawDigits.substring(lead).reverse.dropWhile(_ == '0').reverse match {
      case "" => "0"
      case d => d
    }
    val decExp = point - 1 - lead + javaExp // value = d.igits × 10^decExp
    val sign = if (neg) "-" else ""
    if (decExp < -4 || decExp >= 6) {
      val m = if (digits.length == 1) digits
        else digits.substring(0, 1) + "." + digits.substring(1)
      val es = if (decExp < 0) "-" else "+"
      sign + m + "e" + es + f"${math.abs(decExp)}%02d"
    } else if (decExp >= 0) {
      if (digits.length > decExp + 1)
        sign + digits.substring(0, decExp + 1) + "." + digits.substring(decExp + 1)
      else
        sign + digits + "0" * (decExp + 1 - digits.length)
    } else {
      sign + "0." + "0" * (-decExp - 1) + digits
    }
  }

  /** Column wrapper (input coerced to float). */
  def goFloatReprCol(c: Column): Column =
    Bridge.column(GoFloatRepr(Bridge.expression(c.cast(FloatType))))
}

/** `go_float_repr(float) -> string`. */
case class GoFloatRepr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "go_float_repr"

  override protected def nullSafeEval(input: Any): Any =
    GoFormat.goFloatRepr(input.asInstanceOf[Float])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GoFormat.goFloatRepr($c)")

  override protected def withNewChildInternal(newChild: Expression): GoFloatRepr =
    copy(child = newChild)
}
