package graft

import graft.schema.HogiaSchema

/** Schema/DDL parity checks against the authoritative Jet export
  * (/root/reference/dbinfo.txt) and the reference's dialect literals. */
class SchemaSpec extends SparkSpecBase {

  test("all 10 tables are declared") {
    assert(HogiaSchema.copyOrder.map(_.name).toSet == Set(
      "DtbVer", "Platser", "Personer", "Konton", "BetalKonton",
      "Överföringar", "Betalningar", "LÅN", "Budget", "Transaktioner"))
  }

  test("BetalKonton Jet text lengths follow dbinfo.txt:6-9 (all Text(40))") {
    val ddl = HogiaSchema.byName("BetalKonton").jetDdl
    Seq("Konto", "Kontonummer", "Kundnummer", "Sigillnummer").foreach { c =>
      assert(ddl.contains(s"[$c] Text(40)"), s"$c in $ddl")
    }
  }

  test("Vem is Text(40) in Överföringar/LÅN but Text(50) in Betalningar/Transaktioner (dbinfo.txt:22,113,152,172)") {
    assert(HogiaSchema.byName("Överföringar").jetDdl.contains("[Vem] Text(40)"))
    assert(HogiaSchema.byName("LÅN").jetDdl.contains("[Vem] Text(40)"))
    assert(HogiaSchema.byName("Betalningar").jetDdl.contains("[Vem] Text(50)"))
    assert(HogiaSchema.byName("Transaktioner").jetDdl.contains("[Vem] Text(50)"))
  }

  test("Budget.HurOfta is SMALLINT (dbinfo.txt:43)") {
    assert(HogiaSchema.byName("Budget").jetDdl.contains("[HurOfta] SMALLINT"))
  }

  test("money columns are DECIMAL(19,4) in the SQLite dialect (hhek2sqlite.go:197)") {
    val ddl = HogiaSchema.byName("Transaktioner").sqliteDdl
    assert(ddl.contains("[Belopp] DECIMAL(19,4)"))
    assert(ddl.contains("[Saldo] DECIMAL(19,4)"))
  }

  test("PK is COUNTER in Jet, AUTOINCREMENT integer in SQLite (D1)") {
    val jet = HogiaSchema.byName("Personer").jetDdl
    val lite = HogiaSchema.byName("Personer").sqliteDdl
    assert(jet.contains("[Löpnr] COUNTER CONSTRAINT PrimaryKey PRIMARY KEY"))
    assert(lite.toLowerCase.contains("[löpnr] integer not null primary key autoincrement"))
  }

  test("secondary index metadata preserved for reverse-mode DDL (D2)") {
    val idx = HogiaSchema.byName("Betalningar").indexes.map(_.name).toSet
    assert(idx == Set("idxDatum", "idxFrånKonto", "idxLanLopnr", "idxTillPlats"))
  }
}
