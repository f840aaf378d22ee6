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

  test("over-precise stored TEXT decimal rounds HALF_UP on read (ADVICE r4)") {
    assume(havePython, "python3 unavailable")
    // SQLite is dynamically typed: a foreign tool whose schema declares
    // the money column with TEXT affinity can legally store MORE
    // decimals than DECIMAL(19,4) — the read must round like the REAL
    // path does, not throw ArithmeticException. (NUMERIC affinity
    // converts every numeric-looking string to REAL on store, so the
    // TEXT storage class only arises from TEXT-affinity columns.)
    val dir = Files.createTempDirectory("graft_sqlite_prec").toString
    val p = s"$dir/prec.db"
    val t = python(
      s"""import sqlite3
         |c = sqlite3.connect('$p')
         |c.execute('''CREATE TABLE Transaktioner ("Löpnr" INTEGER,
         |  "FrånKonto" TEXT, "TillKonto" TEXT, "Typ" TEXT, "Datum" TEXT,
         |  "Vad" TEXT, "Vem" TEXT, "Belopp" TEXT, "Saldo" TEXT,
         |  "Fastöverföring" INTEGER, "Text" TEXT)''')
         |c.execute("INSERT INTO Transaktioner VALUES (2,'A','B','Uttag',"
         |    "'2021-01-02','Vad','Vem','0.123456789',NULL,0,'txt')")
         |c.commit()
         |print(c.execute(
         |    "SELECT typeof(Belopp) FROM Transaktioner").fetchone()[0])""".stripMargin)
    assert(t == "text") // the string→decimal path is the one exercised
    val row = new SqliteTableIO(p)
      .read(spark, HogiaSchema.byName("Transaktioner"))
      .collect().head
    assert(row.getAs[BigDecimal]("Belopp")
      .compareTo(new BigDecimal("0.1235")) == 0)
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

  test("overflow pages: multi-KB records spill per the file format, real engine verified") {
    val dir = Files.createTempDirectory("graft_sqlite_ovfl").toString
    val path = s"$dir/ovfl.db"
    val lan = HogiaSchema.byName("LÅN")
    // three regimes in one table: inline (no spill), just-over-threshold
    // (1-page chain), and ~20 KB (a 5-page chain) — plus UTF-8 multibyte
    // content so byte counts ≠ char counts
    val notes = Seq(
      1L -> "kort anteckning",
      2L -> ("x" * 4100),
      3L -> ("Lång räksmörgås-€-anteckning. " * 700))
    val rows = notes.map { case (id, note) =>
      org.apache.spark.sql.Row(Seq[Any](
        id, "Banken", "Bolån", s"L-$id", new BigDecimal("250000.0000"),
        "2020-01-01", "2020-01-02", "2025-01-01", "2050-01-01",
        new BigDecimal("199999.5000"), new BigDecimal("0.0000"),
        new BigDecimal("199999.5000"), 1.625f, 3.875f, "12",
        new BigDecimal("645.8300"), new BigDecimal("1000.0000"),
        new BigDecimal("0.0000"), new BigDecimal("25.0000"), "J", "Vem",
        "Konto 1", "G", note, "r", "a", "o"): _*)
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toList).asJava),
      lan.schema)
    new SqliteTableIO(path).truncateLoad(df, lan)
    // own reader reassembles every chain byte-for-byte
    val back = graft.sources.SqliteFile.readTable(path, lan)
      .map(r => r.getLong(0) -> r.getString(lan.schema.fieldIndex("Anteckningar"))).toMap
    notes.foreach { case (id, note) => assert(back(id) == note, s"row $id") }
    if (havePython) {
      val out = python(
        s"""import sqlite3
           |c = sqlite3.connect('$path')
           |print(c.execute('PRAGMA integrity_check').fetchone()[0])
           |for i in (1, 2, 3):
           |    n = c.execute('SELECT Anteckningar FROM LÅN WHERE Löpnr=?', (i,)).fetchone()[0]
           |    print(len(n), n[:20].replace(chr(10), ' '))""".stripMargin)
      val lines = out.linesIterator.toSeq
      assert(lines(0) == "ok", s"integrity: ${lines(0)}")
      assert(lines(1) == "15 kort anteckning")
      assert(lines(2) == "4100 " + "x" * 20)
      assert(lines(3) == (30 * 700).toString + " " + ("Lång räksmörgås-€-anteckning. " * 700).take(20))
    }
  }

  test("overflow K/M-branch boundary sweep: every spill regime round-trips, engine-verified") {
    // the format's split: X=4061, M=489, K = M + (P-M) mod (U-4).
    // Payload sizes chosen to hit: inline (no spill), the M-branch
    // (K > X → inline only M bytes), the K-branch (K ≤ X → inline K),
    // the exact threshold, and a multi-page chain — each a distinct
    // code path in both writer and reader.
    val dir = Files.createTempDirectory("graft_sqlite_km").toString
    val path = s"$dir/km.db"
    val lan = HogiaSchema.byName("LÅN")
    val sizes = Seq(100, 4000, 4061, 4100, 4681, 9000, 20000)
    val rows = sizes.zipWithIndex.map { case (n, i) =>
      org.apache.spark.sql.Row(Seq[Any](
        (i + 1).toLong, "B", "E", s"L-$i", new BigDecimal("1.0000"),
        "2020-01-01", "2020-01-02", "2025-01-01", "2050-01-01",
        new BigDecimal("1.0000"), new BigDecimal("0.0000"),
        new BigDecimal("1.0000"), 1.5f, 2.5f, "12",
        new BigDecimal("1.0000"), new BigDecimal("1.0000"),
        new BigDecimal("0.0000"), new BigDecimal("1.0000"), "J", "V",
        "K", "G", "x" * n, "r", "a", "o"): _*)
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toList).asJava),
      lan.schema)
    new SqliteTableIO(path).truncateLoad(df, lan)
    val back = graft.sources.SqliteFile.readTable(path, lan)
      .map(r => r.getLong(0) -> r.getString(lan.schema.fieldIndex("Anteckningar"))).toMap
    sizes.zipWithIndex.foreach { case (n, i) =>
      assert(back(i + 1L) == "x" * n, s"payload of $n chars corrupted")
    }
    if (havePython) {
      val out = python(
        s"""import sqlite3
           |c = sqlite3.connect('$path')
           |print(c.execute('PRAGMA integrity_check').fetchone()[0])
           |print([r[0] for r in c.execute(
           |    'SELECT length(Anteckningar) FROM LÅN ORDER BY Löpnr')])""".stripMargin)
      val lines = out.linesIterator.toSeq
      assert(lines(0) == "ok", s"integrity: ${lines(0)}")
      assert(lines(1) == sizes.mkString("[", ", ", "]"))
    }
  }

  test("randomized round-trip: special chars, NULLs, negatives, both decimal storage classes") {
    val dir = Files.createTempDirectory("graft_sqlite_rand").toString
    val path = s"$dir/rand.db"
    val trans = HogiaSchema.byName("Transaktioner")
    val rng = new scala.util.Random(4711)
    val texts = Seq("", " ", "räksmörgås", "€uro", "it's", "a\"b", "tab\there",
      "new\nline", "åäö ÅÄÖ", "semi;colon", "back\\slash")
    def dec(): BigDecimal = // integral values exercise the INTEGER storage class
      if (rng.nextInt(4) == 0) new BigDecimal(rng.nextInt(2000000) - 1000000).setScale(4)
      else new BigDecimal(rng.nextLong() % 100000000L).movePointLeft(4).setScale(4)
    val rows = (1 to 300).map { i =>
      org.apache.spark.sql.Row(
        i.toLong, texts(rng.nextInt(texts.size)), texts(rng.nextInt(texts.size)),
        "Typ" + i, "2020-01-0" + (1 + i % 9), texts(rng.nextInt(texts.size)),
        "Vem" + i, dec(), if (rng.nextBoolean()) null else dec(),
        rng.nextBoolean(), texts(rng.nextInt(texts.size)))
    }
    val df = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows.toList).asJava),
      trans.schema)
    new SqliteTableIO(path).truncateLoad(df, trans)

    // own reader: field-for-field equality
    val back = graft.sources.SqliteFile.readTable(path, trans)
      .sortBy(_.getLong(0))
    rows.zip(back).foreach { case (exp, got) =>
      (0 until exp.size).foreach { i =>
        (exp.get(i), got.get(i)) match {
          case (a: BigDecimal, b: BigDecimal) =>
            assert(a.compareTo(b) == 0, s"row ${exp.get(0)} col $i: $a vs $b")
          case (a, b) => assert(a == b, s"row ${exp.get(0)} col $i: $a vs $b")
        }
      }
    }

    // real engine: canonical digest over (Löpnr, scaled Belopp, Text)
    if (havePython) {
      val expected = rows.map { r =>
        val scaled = r.get(7).asInstanceOf[BigDecimal].movePointRight(4).longValueExact
        s"${r.get(0)}\u001f$scaled\u001f${r.get(10)}"
      }.mkString("\u001e")
      val expMd5 = java.security.MessageDigest.getInstance("MD5")
        .digest(expected.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val out = python(
        s"""import sqlite3, hashlib
           |c = sqlite3.connect('$path')
           |rows = c.execute('SELECT Löpnr, Belopp, Text FROM Transaktioner ORDER BY Löpnr').fetchall()
           |s = chr(30).join(f'{r[0]}'+chr(31)+str(round(r[1]*10000))+chr(31)+r[2] for r in rows)
           |print(hashlib.md5(s.encode()).hexdigest())
           |print(c.execute('PRAGMA integrity_check').fetchone()[0])""".stripMargin)
      val lines = out.linesIterator.toSeq
      assert(lines(1) == "ok")
      assert(lines(0) == expMd5, "real-engine value digest mismatch")
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
