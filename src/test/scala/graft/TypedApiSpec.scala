package graft

import java.math.BigDecimal
import java.nio.file.Files

import graft.ops.Convert
import graft.queries.TypedApi
import graft.schema.HogiaSchema
import graft.sources.ParquetTableIO

/** The reference's typed query API (`hämta*`, db_test.go:410-546) over
  * the golden fixture — field-for-field against the values `checkDB1`
  * pins (db_test.go:172-386), including the converted types: Född → Int,
  * Datum → java.sql.Date, money → exact BigDecimal. */
class TypedApiSpec extends SparkSpecBase {

  private lazy val io: ParquetTableIO = {
    val dir = Files.createTempDirectory("graft_typed").toString
    val out = new ParquetTableIO(dir)
    Convert.goldenFixture(spark).foreach { case (name, df) =>
      out.truncateLoad(df, HogiaSchema.byName(name))
    }
    out
  }

  test("hämtaPerson: golden persons 1-3, missing Löpnr → None") {
    assert(TypedApi.hämtaPerson(spark, io, 1L).contains(
      TypedApi.Person(1L, "Gemensamt", 0, "Gemensamt")))
    assert(TypedApi.hämtaPerson(spark, io, 2L).contains(
      TypedApi.Person(2L, "Person Ett", 1999, "Man")))
    assert(TypedApi.hämtaPerson(spark, io, 3L).contains(
      TypedApi.Person(3L, "Person Två", 2001, "Kvinna")))
    assert(TypedApi.hämtaPerson(spark, io, 99L).isEmpty)
  }

  test("hämtaPlats: Typ TEXT('0') decodes to false (db_test.go:455-459)") {
    val p = TypedApi.hämtaPlats(spark, io, 1L).get
    assert(p == TypedApi.Plats(1L, "Plats Ett", "", typ = false, ""))
  }

  test("hämtaTransaktion: exact decimal, ISO date, € text, fixture Saldo") {
    val t2 = TypedApi.hämtaTransaktion(spark, io, 2L).get
    assert(t2.fromAcc == "Plånboken" && t2.toAcc == "Plats Ett")
    assert(t2.amount.compareTo(new BigDecimal("0.10")) == 0)
    assert(t2.date == java.sql.Date.valueOf("2020-12-24"))
    assert(t2.who == "Person Ett" && t2.comment == "Tom € räksmörgås")
    assert(!t2.fixed)
    // fixture carries NULL running saldo (what a forward conversion
    // writes — F7): the Option surfaces it as None, not a sentinel
    assert(t2.saldo.isEmpty)
  }

  test("hämtaKonto: derived balance 0.9 survives as exact DECIMAL(19,4)") {
    val k = TypedApi.hämtaKonto(spark, io, 1L).get
    assert(k.benämning == "Plånboken")
    assert(k.saldo.compareTo(new BigDecimal("0.9")) == 0)
    assert(k.startSaldo.compareTo(BigDecimal.ZERO) == 0)
  }
}
