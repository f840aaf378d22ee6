package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType}

import graft.functions.Cp1252

/** The reference's per-row value transforms (SURVEY.md §2.7 F1–F10),
  * re-expressed as pure Spark column expressions — narrow, codegen'd,
  * shuffle-free. Each cites the `hhek2sqlite.go` site it reproduces.
  */
object Transforms {

  val Money: DecimalType = DecimalType(19, 4)

  /** F1 decode half: Windows-1252 bytes → UTF-8 string
    * (`hhek2sqlite.go:60-73`, forward direction). */
  def toUtf8(c: Column): Column = Cp1252.decodeCol(c)

  /** F1 reverse half: UTF-8 string → Windows-1252 bytes. */
  def fromUtf8(c: Column): Column = Cp1252.encodeCol(c)

  /** F1 escaping half: `' → ''` and `" → ""`. Only needed because the
    * reference assembles literal SQL by concatenation
    * (`hhek2sqlite.go:66-71,139-145`); under typed JDBC batch writes this
    * is obsolete — kept as an explicit compat transform. */
  def sqlEscapeCompat(c: Column): Column =
    regexp_replace(regexp_replace(c, "'", "''"), "\"", "\"\"")

  /** Inverse of [[sqlEscapeCompat]] (for round-trip property tests). */
  def sqlUnescapeCompat(c: Column): Column =
    regexp_replace(regexp_replace(c, "''", "'"), "\"\"", "\"")

  /** F2 forward: Swedish decimal comma text → exact DECIMAL(19,4)
    * (`hhek2sqlite.go:161-167`, call sites `:247,530-533,...`). */
  def comma2point(c: Column): Column =
    translate(c, ",", ".").cast(Money)

  /** F2 reverse: decimal → comma-localized text (Jet parses locale
    * decimals from quoted text, `hhek2sqlite.go:164-166`). */
  def point2comma(c: Column): Column =
    translate(c.cast(StringType), ".", ",")

  /** F6/P3: empty string (scanned empty bytes) → NULL
    * (`hhek2sqlite.go:639-643`, `:1118-1122`). */
  def emptyToNull(c: Column): Column =
    when(length(c) === 0, lit(null)).otherwise(c)

  /** F7: constant NULL injection for `Transaktioner.Saldo` on forward
    * conversion (`hhek2sqlite.go:260`) — the running balance is
    * recomputed analytically instead (Queries.runningSaldo). */
  def nullSaldo: Column = lit(null).cast(Money)

  /** F8: ISO date parse, `yyyy-MM-dd` only (`db_test.go:466-468`). */
  def parseIsoDate(c: Column): Column = to_date(c, "yyyy-MM-dd")

  /** F5: float → Go `%g` shortest-form string (`hhek2sqlite.go:869-870`).
    * Neither Java's `%g` (pads to 6 significant digits) nor Spark's cast
    * (`100000.0`, `1.0E7`) matches Go's layout (`100000`, `1e+07`) —
    * graft.functions.GoFormat implements it exactly. */
  def floatRepr(c: Column): Column = graft.functions.GoFormat.goFloatReprCol(c)
}
