package graft

import java.math.BigDecimal
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.Convert
import graft.schema.HogiaSchema
import graft.sources.{ParquetTableIO, SqliteTableIO}

/** The pure-JVM SQLite file codec, verified two ways:
  *  1. in-engine round-trip (write → SqliteFile.readTable → golden
  *     values), and
  *  2. against the REAL SQLite engine — the container's python3 stdlib
  *     `sqlite3` opens the file, runs PRAGMA integrity_check, and reads
  *     the same golden values the reference's checkDB1 pins
  *     (db_test.go:150-387). This is the strongest available proof that
  *     the forward conversion's output artifact is a genuine SQLite
  *     database, not a lookalike.
  */
class SqliteFileSpec extends SparkSpecBase {

  private lazy val dbPath: String = {
    val dir = Files.createTempDirectory("graft_sqlite").toString
    val src = new ParquetTableIO(s"$dir/src")
    Convert.goldenFixture(spark).foreach { case (name, df) =>
      src.truncateLoad(df, HogiaSchema.byName(name))
    }
    val path = s"$dir/hogia.db"
    Convert.konvertera(spark, src, new SqliteTableIO(path))
    path
  }

  private def python(script: String): String = {
    val pb = new ProcessBuilder("python3", "-c", script)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8").trim
    assert(proc.waitFor() == 0, s"python3 failed:\n$out")
    out
  }

  private lazy val havePython: Boolean =
    try { new ProcessBuilder("python3", "--version").start().waitFor() == 0 }
    catch { case _: Exception => false }

  test("write → own reader round-trip preserves golden values") {
    val io = new SqliteTableIO(dbPath)
    val p2 = io.read(spark, HogiaSchema.byName("Personer"))
      .filter(col("Löpnr") === 2).collect().head
    assert(p2.getAs[String]("Namn") == "Person Ett")
    assert(p2.getAs[String]("Kön") == "Man")
    val t2 = io.read(spark, HogiaSchema.byName("Transaktioner"))
      .filter(col("Löpnr") === 2).collect().head
    assert(t2.getAs[BigDecimal]("Belopp").compareTo(new BigDecimal("0.10")) == 0)
    assert(t2.getAs[String]("Text") == "Tom € räksmörgås")
    assert(t2.isNullAt(t2.fieldIndex("Saldo"))) // F7 forward NULL
    val konto = io.read(spark, HogiaSchema.byName("Konton"))
      .filter(col("Benämning") === "Plånboken").collect().head
    assert(konto.getAs[BigDecimal]("Saldo").compareTo(new BigDecimal("0.9")) == 0)
  }

  test("real SQLite engine: PRAGMA integrity_check passes") {
    assume(havePython, "python3 unavailable")
    val out = python(
      s"""import sqlite3
         |c = sqlite3.connect('$dbPath')
         |print(c.execute('PRAGMA integrity_check').fetchone()[0])""".stripMargin)
    assert(out == "ok", s"integrity_check: $out")
  }

  test("real SQLite engine: schema and golden values readable") {
    assume(havePython, "python3 unavailable")
    val out = python(
      s"""import sqlite3
         |c = sqlite3.connect('$dbPath')
         |tables = sorted(r[0] for r in c.execute(
         |    "SELECT name FROM sqlite_master WHERE type='table'"))
         |print(';'.join(tables))
         |print(c.execute('SELECT count(*) FROM Personer').fetchone()[0])
         |print(c.execute(
         |    'SELECT Namn, Kön FROM Personer WHERE Löpnr=2').fetchone())
         |row = c.execute(
         |    'SELECT Belopp, Text, Saldo FROM Transaktioner WHERE Löpnr=2').fetchone()
         |print(row[0], row[1], row[2])
         |print(c.execute(
         |    "SELECT Saldo FROM Konton WHERE Benämning='Plånboken'").fetchone()[0])
         |print(c.execute(
         |    "SELECT seq FROM sqlite_sequence WHERE name='Transaktioner'").fetchone()[0])""".stripMargin)
    val lines = out.linesIterator.toSeq
    assert(lines(0).split(";").toSet ==
      HogiaSchema.copyOrder.map(_.name).toSet + "sqlite_sequence")
    assert(lines(1) == "3")
    assert(lines(2) == "('Person Ett', 'Man')")
    assert(lines(3) == "0.1 Tom € räksmörgås None")
    assert(lines(4) == "0.9")
    assert(lines(5) == "3")
  }

  test("reverse conversion FROM the real .db: identity survives (EP2)") {
    val dir = Files.createTempDirectory("graft_sqlite_rev").toString
    val back = new ParquetTableIO(s"$dir/mdb2")
    Convert.konvertera(spark, new SqliteTableIO(dbPath), back, reverse = true)
    val p = back.read(spark, HogiaSchema.byName("Personer"))
    assert(p.select("Löpnr").orderBy("Löpnr").collect().map(_.getLong(0)).toSeq
      == Seq(1L, 2L, 3L))
    val t2 = back.read(spark, HogiaSchema.byName("Transaktioner"))
      .filter(col("Löpnr") === 2).collect().head
    assert(t2.getAs[BigDecimal]("Belopp").compareTo(new BigDecimal("0.10")) == 0)
    assert(t2.getAs[String]("Text") == "Tom € räksmörgås")
  }

  test("multi-page btree (interior pages): 2000 rows, real engine verified") {
    val dir = Files.createTempDirectory("graft_sqlite_big").toString
    val path = s"$dir/big.db"
    val personer = HogiaSchema.byName("Personer")
    // ~2000 rows × ~60 B records ⇒ dozens of leaves under interior pages;
    // names carry non-ASCII + quotes to exercise UTF-8 text cells
    val rows = (1 to 2000).map { i =>
      org.apache.spark.sql.Row(i.toLong, s"Namn-Åäö'$i", (1900 + i % 100).toString,
        if (i % 2 == 0) "Man" else "Kvinna")
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toList).asJava),
      personer.schema)
    new SqliteTableIO(path).truncateLoad(df, personer)
    // own reader sees every row
    val back = graft.sources.SqliteFile.readTable(path, personer)
    assert(back.size == 2000)
    assert(back.map(_.getLong(0)).toSet == (1L to 2000L).toSet)
    if (havePython) {
      val out = python(
        s"""import sqlite3
           |c = sqlite3.connect('$path')
           |print(c.execute('PRAGMA integrity_check').fetchone()[0])
           |print(c.execute('SELECT count(*), min(Löpnr), max(Löpnr) FROM Personer').fetchone())
           |print(c.execute('SELECT Namn FROM Personer WHERE Löpnr=1500').fetchone()[0])""".stripMargin)
      val lines = out.linesIterator.toSeq
      assert(lines(0) == "ok", s"integrity: ${lines(0)}")
      assert(lines(1) == "(2000, 1, 2000)")
      assert(lines(2) == "Namn-Åäö'1500")
    }
  }

  test("real SQLite engine can INSERT into the written file (writable db)") {
    assume(havePython, "python3 unavailable")
    // a copy, so other tests see the original
    val cp = dbPath + ".w"
    Files.copy(Paths.get(dbPath), Paths.get(cp),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val out = python(
      s"""import sqlite3
         |c = sqlite3.connect('$cp')
         |c.execute("INSERT INTO Personer (Namn, Född, Kön) VALUES ('Ny', '2020', 'Man')")
         |c.commit()
         |print(c.execute('SELECT max(Löpnr), count(*) FROM Personer').fetchone())""".stripMargin)
    // AUTOINCREMENT continues from sqlite_sequence — identity discipline
    // survives a real engine writing after us
    assert(out == "(4, 4)", out)
  }
}
