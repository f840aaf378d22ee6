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

  /** Public for property tests; goFloatRepr is the engine entry. */
  def format(f: Float): String = {
    if (java.lang.Float.isNaN(f)) return "NaN"
    if (java.lang.Float.isInfinite(f)) return if (f > 0) "+Inf" else "-Inf"
    if (f == 0.0f) return if (1 / f < 0) "-0" else "0"
    val neg = f < 0
    val abs = math.abs(f)
    // Shortest round-trip digits, computed directly: JDK 17's
    // Float.toString is pre-Ryu and sometimes emits one digit too many
    // (e.g. 1.18846831E13f where 1.1884683E13 round-trips), which would
    // diverge from Go's shortest %g. Try 1..9 significant digits and
    // keep the first rounding that parses back to the same float.
    val bd = new java.math.BigDecimal(abs.toDouble)
    val shortest = (1 to 9).iterator.map { prec =>
      bd.round(new java.math.MathContext(prec, java.math.RoundingMode.HALF_EVEN))
    }.find(_.floatValue() == abs).getOrElse(bd)
    // canonical digit string + decimal exponent: value = d.igits × 10^decExp
    val digits0 = shortest.unscaledValue().abs().toString
    val digits = digits0.reverse.dropWhile(_ == '0').reverse match {
      case "" => "0"
      case d => d
    }
    val decExp = (digits0.length - shortest.scale()) - 1
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
