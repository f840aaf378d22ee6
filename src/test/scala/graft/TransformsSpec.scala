package graft

import java.math.BigDecimal

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.ops.Transforms

/** Property tests for the reference's per-row transforms (SURVEY.md §2.7)
  * — exactly the special-char fuzzing the reference left as TODO
  * (`db_test.go:548`). */
class TransformsSpec extends SparkSpecBase {

  import testImplicits._

  private def evalStr(in: Seq[String], f: org.apache.spark.sql.Column => org.apache.spark.sql.Column): Seq[String] =
    in.toDF("v").select(f(col("v")).cast("string").as("r")).collect().map {
      case Row(r: String) => r
      case Row(null) => null
    }.toSeq

  test("F2: comma2point(point2comma(x)) is identity on DECIMAL(19,4)") {
    val gen = for {
      units <- Gen.chooseNum(-999999999999L, 999999999999L)
      frac <- Gen.chooseNum(0, 9999)
    } yield new BigDecimal(s"$units.${"%04d".format(frac)}")
    val ds = samples(gen, 200)
    val rs = ds.toDF("v")
      .select(col("v").cast(Transforms.Money).as("v"))
      .select(Transforms.comma2point(Transforms.point2comma(col("v"))).as("r"))
      .collect().map(_.getDecimal(0))
    ds.zip(rs).foreach { case (d, r) => assert(r.compareTo(d) == 0, s"$d -> $r") }
  }

  test("F2 forward: Swedish comma decimals parse exactly") {
    val df = Seq("1,10", "0,10", "-12345,6789").toDF("v")
      .select(Transforms.comma2point(col("v")).as("r"))
    val got = df.collect().map(_.getDecimal(0).toPlainString).toSeq
    assert(got == Seq("1.1000", "0.1000", "-12345.6789"))
  }

  test("F1 escaping: sqlUnescapeCompat(sqlEscapeCompat(s)) is identity") {
    val strs = samples(Gen.asciiPrintableStr, 200)
    val got = evalStr(strs,
      c => Transforms.sqlUnescapeCompat(Transforms.sqlEscapeCompat(c)))
    strs.zip(got).foreach { case (s0, g) => assert(g == s0, s"'$s0' -> '$g'") }
  }

  test("F1 escaping matches the reference's doubling rule") {
    assert(evalStr(Seq("O'Brien \"quoted\""), Transforms.sqlEscapeCompat).head ==
      "O''Brien \"\"quoted\"\"")
  }

  test("F1 cp1252: decode(encode(s)) is identity on the cp1252 domain (incl € å ä ö)") {
    val cp1252Chars = "€åäöÅÄÖ réksmörgås RÄKSMÖRGÅS 'quote' \"dquote\""
    val got = evalStr(Seq(cp1252Chars),
      c => Transforms.toUtf8(Transforms.fromUtf8(c))).head
    assert(got == cp1252Chars)
  }

  test("F1 cp1252: € is byte 0x80, like Go charmap.Windows1252 (db_test.go:316)") {
    val bytes = Seq("€").toDF("v")
      .select(Transforms.fromUtf8(col("v")).as("b")).collect().head.getAs[Array[Byte]](0)
    assert(bytes.toSeq == Seq(0x80.toByte))
  }

  test("F1 cp1252: all 256 bytes decode per Go charmap.Windows1252 (WHATWG) and round-trip") {
    import graft.functions.Cp1252Codec
    // the 0x80–0x9F row of the WHATWG windows-1252 index — including the
    // five positions cp1252 leaves undefined, which Go decodes to the C1
    // controls (0x81→U+0081 …), NOT java.nio's U+FFFD (hhek2sqlite.go:65)
    val whatwgC1 = Array(
      0x20AC, 0x0081, 0x201A, 0x0192, 0x201E, 0x2026, 0x2020, 0x2021,
      0x02C6, 0x2030, 0x0160, 0x2039, 0x0152, 0x008D, 0x017D, 0x008F,
      0x0090, 0x2018, 0x2019, 0x201C, 0x201D, 0x2022, 0x2013, 0x2014,
      0x02DC, 0x2122, 0x0161, 0x203A, 0x0153, 0x009D, 0x017E, 0x0178)
    (0 until 256).foreach { b =>
      val expected =
        if (b < 0x80) b // ASCII identity
        else if (b < 0xA0) whatwgC1(b - 0x80)
        else b // Latin-1 identity
      assert(Cp1252Codec.decodeTable(b).toInt == expected,
        f"decode(0x$b%02X) = U+${Cp1252Codec.decodeTable(b).toInt}%04X, want U+$expected%04X")
      // bijectivity: encode(decode(b)) == b for every byte
      val rt = Cp1252Codec.encode(Cp1252Codec.decode(Array(b.toByte)))
      assert(rt.length == 1 && (rt(0) & 0xFF) == b,
        f"round-trip of 0x$b%02X gave ${rt.toSeq}")
    }
    // and through the Spark expression path (codegen), all bytes at once
    val all = (0 until 256).map(_.toByte).toArray
    val got = Seq(Tuple1(all)).toDF("b")
      .select(Transforms.fromUtf8(Transforms.toUtf8(col("b"))).as("r"))
      .collect().head.getAs[Array[Byte]](0)
    assert(got.toSeq == all.toSeq)
  }

  test("F1 cp1252 encode: one '?' per unmappable code point") {
    import graft.functions.Cp1252Codec
    import org.apache.spark.unsafe.types.UTF8String
    // Ω is BMP-unmappable; 𝄞 is a surrogate pair (one code point)
    val got = Cp1252Codec.encode(UTF8String.fromString("aΩb𝄞c"))
    assert(new String(got, "ISO-8859-1") == "a?b?c")
  }

  test("F6: emptyToNull nulls empty strings only") {
    assert(evalStr(Seq("", "x", " "), Transforms.emptyToNull) == Seq(null, "x", " "))
  }

  test("F8: parseIsoDate parses yyyy-MM-dd (db_test.go:466-468)") {
    assert(evalStr(Seq("2020-12-24"), Transforms.parseIsoDate) == Seq("2020-12-24"))
  }

  test("F5: floatRepr matches Go %g layout exactly (hhek2sqlite.go:869)") {
    // expectations are fmt.Sprintf("%g", float32(x)) outputs
    val cases = Seq(
      1.5f -> "1.5", 0.25f -> "0.25", 100000f -> "100000",
      1e7f -> "1e+07", 1e-5f -> "1e-05", 0.0001f -> "0.0001",
      -2.5f -> "-2.5", 1234567f -> "1.234567e+06", 0f -> "0",
      123456.78f -> "123456.78",
      // JDK 17 Float.toString emits a non-shortest "1.18846831E13" here;
      // Go's shortest %g is 8 digits — the formatter must not trust it.
      1.18846831e13f -> "1.1884683e+13")
    // shortest-digit property: the rendering must round-trip and no
    // shorter prefix rounding may (sampled)
    samples(org.scalacheck.Gen.chooseNum(Float.MinValue / 2, Float.MaxValue / 2), 200)
      .foreach { x =>
        val r = graft.functions.GoFormat.format(x)
        val parsed = r.replace("e", "E").toFloat
        assert(parsed == x, s"$x rendered '$r' fails round-trip")
      }
    val got = cases.map(_._1).toDF("v")
      .select(Transforms.floatRepr(col("v")).as("r")).collect().map(_.getString(0)).toSeq
    cases.map(_._2).zip(got).foreach { case (want, g) => assert(g == want, s"want $want got $g") }
  }
}
