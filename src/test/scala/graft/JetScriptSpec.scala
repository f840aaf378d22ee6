package graft

import java.nio.file.{Files, Paths}

import graft.ops.Convert
import graft.schema.HogiaSchema
import graft.sources.{JetScriptTableIO, ParquetTableIO}

/** Reverse-mode script emission: the statement stream a Windows/ODBC
  * deployment replays into the COM-created .mdb — golden-checked against
  * the reference's reverse-mode literal formatting. */
class JetScriptSpec extends SparkSpecBase {

  private lazy val script: String = {
    val dir = Files.createTempDirectory("graft_jetscript").toString
    val src = new ParquetTableIO(s"$dir/src")
    Convert.goldenFixture(spark).foreach { case (name, df) =>
      src.truncateLoad(df, HogiaSchema.byName(name))
    }
    val out = s"$dir/reverse.sql"
    // reverse direction: sqlite-side mirror → Jet script
    Convert.konvertera(spark, src, new JetScriptTableIO(out), reverse = true)
    new String(Files.readAllBytes(Paths.get(out)), "UTF-8")
  }

  test("script carries all DDL: 10 CREATE TABLE + 15 CREATE INDEX (D1+D2)") {
    assert(HogiaSchema.copyOrder.forall(t => script.contains(t.jetDdl + ";")))
    // the reference's reverse mode issues exactly 15 CREATE INDEX
    // statements (grep over hhek2sqlite.go; the earlier "17" count in
    // SURVEY was wrong — dbinfo.txt's 28 includes PK/system indexes the
    // Go code never recreates)
    val indexCount = HogiaSchema.copyOrder.map(_.indexes.size).sum
    assert(indexCount == 15)
    assert("CREATE (UNIQUE )?INDEX".r.findAllIn(script).size == 15)
  }

  test("INSERT literals use the reference's reverse formatting") {
    // identity as data (hhek2sqlite.go:142)
    assert(script.contains(
      "INSERT INTO [Personer] ([Löpnr],[Namn],[Född],[Kön]) VALUES (1,'Gemensamt','0','Gemensamt');"))
    // money: shortest form, point→comma, quoted (F2 reverse); NULL saldo
    // stays NULL; booleans bare; € and Swedish text verbatim
    val t1 = script.linesIterator.find(_.contains("'Studiestöd'")).get
    assert(t1.contains("'1,1'"), t1)
    assert(t1.contains("NULL"), t1)
    assert(t1.contains("false"), t1)
    val t2 = script.linesIterator.find(_.contains("räksmörgås")).get
    assert(t2.contains("'0,1'") && t2.contains("'Tom € räksmörgås'"), t2)
    // escaping half of F1: quotes double
    assert(!script.contains("''Gemensamt'")) // no accidental double-escape
  }

  test("statement order follows the reference pipeline (O2)") {
    val order = HogiaSchema.copyOrder.map(t => script.indexOf(t.jetDdl))
    assert(order.forall(_ >= 0) && order == order.sorted,
      "tables must be emitted in the konvertera copy order")
  }
}
