package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import graft.schema.HogiaTable

/** Read-only pure-JVM parser for the Jet 2.0-era `.mdb` files the
  * reference actually converts (`hhek2sqlite.go:1253-1279` opens them via
  * ODBC; its own test fixture GOTEST1.MDB is this format — authored by
  * the mid-90s Hogia app, PRE-Jet3, so even mdbtools' documented formats
  * don't cover it). The layout here was recovered from the public
  * fixture itself and verified value-for-value against the golden
  * contents specified in db_test.go:142-149:
  *
  *  - 2048-byte pages; page type byte 0: 0x06 = data, 0x05 = TDEF.
  *  - Data page: owner TDEF page u32 @4, row count u16 @8, free-space
  *    start u16 @10, row-offset table u16[] @20 (0 = deleted slot;
  *    offsets carry flag bits in the high nibble, masked with 0x0FFF).
  *    Row i occupies [offset_i, previous live offset) growing down from
  *    the page end.
  *  - Row: [len u16][nFixed u8][nVar u8][fixed slots][var bytes]
  *    [var boundaries, 1 byte each, stored descending][nVar u8]
  *    [null mask, ceil(nFixed/8) bytes]. Mask bit i = fixed slot i is
  *    present; for BOOL columns the bit IS the value (Jet BITs are
  *    non-nullable and occupy zero row bytes).
  *  - System catalog: MSysObjects rows (data pages owned by TDEF 3)
  *    map object name → object id, and the object id IS the table's
  *    TDEF page number. MSysColumns rows (owned by TDEF 4) give each
  *    column's fixed-slot index / byte size / Jet type and, for
  *    variable columns, a 0xFF-descending slot that orders the var
  *    section.
  *  - Values: TEXT = Windows-1252 bytes (single-byte, pre-Unicode Jet);
  *    CURRENCY = int64 scaled by 10⁴ (decoded to exact DECIMAL(19,4) —
  *    never through a double); LONG/INT16/BYTE little-endian;
  *    REAL4/REAL8 IEEE.
  *
  * Scope: rows with 1-byte var boundaries (row length ≤ 255 — every
  * Hogia fixture row; longer rows fail loudly rather than misparse),
  * no MEMO/OLE payload decode (the only memo column, LÅN.Anteckningar,
  * is surfaced as NULL), read-only (reverse-mode .mdb creation requires
  * the Windows ADOX/COM surface per the reference, `hhek2sqlite.go:
  * 1177-1202` — no JVM analog exists).
  */
object JetFile {

  private final val PageSize = 2048

  private final case class JetCol(slot: Int, size: Int, jetType: Int, name: String)

  final class Db(bytes: Array[Byte]) {
    private val nPages = bytes.length / PageSize

    private def u16(off: Int): Int =
      (bytes(off) & 0xFF) | ((bytes(off + 1) & 0xFF) << 8)
    private def u32(off: Int): Long =
      (u16(off).toLong) | (u16(off + 2).toLong << 16)

    private def pageType(pg: Int): Int = bytes(pg * PageSize) & 0xFF
    private def owner(pg: Int): Long = u32(pg * PageSize + 4)

    /** Live row extents of one data page, page-relative. */
    private def rowExtents(pg: Int): Seq[(Int, Int)] = {
      val base = pg * PageSize
      val n = u16(base + 8)
      var prev = PageSize
      (0 until n).flatMap { i =>
        val raw = u16(base + 20 + 2 * i)
        if (raw == 0) None
        else {
          val off = raw & 0x0FFF
          val ext = (off, prev)
          prev = off
          Some(ext)
        }
      }
    }

    /** (fixedBytes, varValues, presenceMask) per live row of a table. */
    private def rawRows(tdefPage: Long): Seq[(Array[Byte], Seq[Array[Byte]], Seq[Boolean])] =
      (0 until nPages)
        .filter(pg => pageType(pg) == 6 && owner(pg) == tdefPage)
        .flatMap { pg =>
          val base = pg * PageSize
          rowExtents(pg).map { case (s, e) =>
            val row = java.util.Arrays.copyOfRange(bytes, base + s, base + e)
            parseRow(row)
          }
        }

    private def parseRow(row: Array[Byte]): (Array[Byte], Seq[Array[Byte]], Seq[Boolean]) = {
      require(row.length >= 4, s"short row (${row.length}B)")
      val nFixed = row(2) & 0xFF
      val nVar = row(3) & 0xFF
      val nMask = (nFixed + 7) / 8
      val mask = row.slice(row.length - nMask, row.length)
      val nVar2 = row(row.length - nMask - 1) & 0xFF
      require(nVar2 == nVar, s"row var-count mismatch ($nVar vs $nVar2): >255-byte rows unsupported")
      val offEnd = row.length - nMask - 1
      val bounds = (0 to nVar).map(i => row(offEnd - 1 - i) & 0xFF).toArray // ascending
      require(bounds.sliding(2).forall(p => p(0) <= p(1)) && bounds.last <= row.length,
        s"non-monotonic var bounds: >255-byte rows unsupported")
      val varVals = (0 until nVar).map(i =>
        java.util.Arrays.copyOfRange(row, bounds(i), bounds(i + 1)))
      val fixed = java.util.Arrays.copyOfRange(row, 4, if (nVar > 0) bounds(0) else offEnd - 1)
      val present = (0 until nFixed).map(i => ((mask(i / 8) >> (i % 8)) & 1) == 1)
      (fixed, varVals, present)
    }

    private def cp1252(b: Array[Byte]): String = new String(b, "windows-1252")

    /** Object name → TDEF page, from MSysObjects (TDEF 3). */
    lazy val catalog: Map[String, Long] =
      rawRows(3L).map { case (fixed, vars, _) =>
        cp1252(vars.head) -> u32le(fixed, 0)
      }.toMap

    /** Column metadata per object id, from MSysColumns (TDEF 4). */
    private lazy val columnsByObject: Map[Long, Seq[JetCol]] =
      rawRows(4L).map { case (fixed, vars, _) =>
        (u32le(fixed, 0),
          JetCol(fixed(6) & 0xFF, fixed(7) & 0xFF, fixed(8) & 0xFF, cp1252(vars.head)))
      }.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

    private def u32le(b: Array[Byte], off: Int): Long =
      (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
    private def i64le(b: Array[Byte], off: Int): Long =
      u32le(b, off) | (u32le(b, off + 4) << 32)

    /** Decode one table into (columnName → value) maps. */
    def readTable(name: String): Seq[Map[String, Any]] = {
      val tdef = catalog.getOrElse(name,
        throw new IllegalArgumentException(s"table $name not in MDB catalog"))
      val cols = columnsByObject.getOrElse(tdef, Seq.empty)
      // fixed slots ascend from 0; var slots descend from 0xFF in
      // definition order
      val fixedCols = cols.filter(_.slot < 128).sortBy(_.slot)
      val varCols = cols.filter(_.slot >= 128).sortBy(-_.slot)
      rawRows(tdef).map { case (fixed, vars, present) =>
        val out = Map.newBuilder[String, Any]
        var off = 0
        fixedCols.zipWithIndex.foreach { case (c, i) =>
          val p = i < present.size && present(i)
          val v: Any = c.jetType match {
            case 1 => p // BOOL: mask bit is the value
            case _ if !p => null
            case 2 => (fixed(off) & 0xFF).toShort // BYTE
            case 3 => ((fixed(off) & 0xFF) | (fixed(off + 1) << 8)).toShort // INT16
            case 4 => u32le(fixed, off).toInt.toLong // LONG (sign via toInt)
            case 5 => new java.math.BigDecimal( // CURRENCY: exact 10⁻⁴
              java.math.BigInteger.valueOf(i64le(fixed, off)), 4)
            case 6 => java.lang.Float.intBitsToFloat(u32le(fixed, off).toInt)
            case 7 => java.lang.Double.longBitsToDouble(i64le(fixed, off))
            case t => throw new IllegalArgumentException(
              s"unsupported fixed Jet type $t for ${c.name}")
          }
          if (c.jetType != 1) off += c.size
          out += c.name -> v
        }
        varCols.zipWithIndex.foreach { case (c, j) =>
          val v: Any =
            if (j >= vars.size) null
            else c.jetType match {
              case 10 => cp1252(vars(j)) // TEXT
              case 12 => null // MEMO payload decode unsupported (documented)
              case t => throw new IllegalArgumentException(
                s"unsupported var Jet type $t for ${c.name}")
            }
          out += c.name -> v
        }
        out.result()
      }
    }
  }

  def open(path: String): Db = {
    val bytes = Files.readAllBytes(Paths.get(path))
    require(bytes.length % PageSize == 0 && bytes.length >= 2 * PageSize &&
      (bytes(0) & 0xFF) == 0x01,
      s"$path is not a Jet database")
    new Db(bytes)
  }
}

/** Read-only TableIO over a real `.mdb` file — the forward-conversion
  * SOURCE the reference reads through ODBC, here parsed natively.
  * Values coerce to the HogiaSchema column types (money stays exact:
  * CURRENCY's scaled int64 → DECIMAL(19,4) directly). Writing requires
  * the Windows COM surface (reference reverse mode) and throws. */
final class JetTableIO(path: String) extends TableIO {

  private lazy val db = JetFile.open(path)

  override def read(spark: SparkSession, table: HogiaTable): DataFrame = {
    val rows = db.readTable(table.name).map { m =>
      Row.fromSeq(table.cols.map { c =>
        coerce(m.getOrElse(c.name, null), c.spark)
      })
    }
    spark.createDataFrame(
      new java.util.ArrayList[Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toList).asJava),
      table.schema)
  }

  private def coerce(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, LongType) => l
    case (l: Long, IntegerType) => l.toInt
    case (s: Short, ShortType) => s
    case (s: Short, IntegerType) => s.toInt
    case (b: Boolean, BooleanType) => b
    case (d: java.math.BigDecimal, dec: DecimalType) => d.setScale(dec.scale)
    case (f: Float, FloatType) => f
    case (d: Double, DoubleType) => d
    case (s: String, StringType) => s
    case (other, t) => throw new IllegalArgumentException(s"cannot coerce $other to $t")
  }

  override def truncateLoad(df: DataFrame, table: HogiaTable): Unit =
    throw new UnsupportedOperationException(
      "Jet .mdb creation requires the ADOX/COM surface (reference reverse mode, " +
        "hhek2sqlite.go:1177-1202) — no JVM analog exists; JetTableIO is read-only")

  override def exists(spark: SparkSession, table: HogiaTable): Boolean =
    Files.exists(Paths.get(path)) && db.catalog.contains(table.name)
}
