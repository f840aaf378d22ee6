package graft.schema

import org.apache.spark.sql.types._

/** Column-level dialect metadata for one Hogia table column.
  *
  * The reference engine hard-codes each table's DDL twice — once in Jet
  * dialect (reverse mode) and once in SQLite dialect (forward mode), e.g.
  * Personer at `hhek2sqlite.go:83-85` (Jet) vs `hhek2sqlite.go:105-108`
  * (SQLite). Here the mapping is data, not code: one declaration per
  * column, three renderings (Jet DDL, SQLite DDL, Spark StructField).
  */
final case class Col(
    name: String,
    spark: DataType,
    jetType: String,
    sqliteType: String,
    nullable: Boolean = true,
    isPk: Boolean = false
) {
  def field: StructField = StructField(name, spark, nullable)
}

/** Secondary-index metadata (reference creates these only on the Jet side,
  * reverse mode — 15 CREATE INDEX statements, e.g. `hhek2sqlite.go:91-93`).
  * Spark has no indexes; this metadata is preserved so a JDBC sink can
  * re-emit the DDL and so the reverse-conversion contract is documentable.
  */
final case class Index(name: String, columns: Seq[String], unique: Boolean)

/** One of the 9+1 Hogia tables: schema, dialect DDL, index set.
  *
  * Authoritative source: the Access SQL export `/root/reference/dbinfo.txt`
  * plus the dual DDL literals cited per table in SURVEY.md §1.2.
  */
final case class HogiaTable(name: String, cols: Seq[Col], indexes: Seq[Index] = Nil) {

  def schema: StructType = StructType(cols.map(_.field))

  def pk: Seq[String] = cols.filter(_.isPk).map(_.name)

  /** Jet-dialect CREATE TABLE (reverse mode; cf. `hhek2sqlite.go:83-85`). */
  def jetDdl: String = {
    val body = cols.map { c =>
      val pkClause =
        if (c.isPk && c.jetType == "COUNTER")
          s" CONSTRAINT PrimaryKey PRIMARY KEY"
        else if (c.isPk) " PRIMARY KEY"
        else ""
      val nn = if (!c.nullable && !c.isPk) " NOT NULL" else ""
      s"[${c.name}] ${c.jetType}$nn$pkClause"
    }.mkString(", ")
    s"CREATE TABLE [$name] ($body)"
  }

  /** SQLite-dialect CREATE TABLE (forward mode; cf. `hhek2sqlite.go:105-108`). */
  def sqliteDdl: String = {
    val body = cols.map { c =>
      val pkClause =
        if (c.isPk && c.jetType == "COUNTER") " not null primary key AUTOINCREMENT"
        else if (c.isPk) " PRIMARY KEY"
        else ""
      val nn = if (!c.nullable && !c.isPk) " NOT NULL" else ""
      s"[${c.name}] ${c.sqliteType}$nn$pkClause"
    }.mkString(", ")
    s"CREATE TABLE [$name] ($body)"
  }

  /** Jet-side CREATE INDEX statements (cf. `hhek2sqlite.go:427-458`). */
  def indexDdl: Seq[String] = indexes.map { ix =>
    val uq = if (ix.unique) "UNIQUE " else ""
    val cs = ix.columns.map(c => s"[$c]").mkString(", ")
    s"CREATE ${uq}INDEX ${ix.name} ON [$name] ($cs)"
  }

  /** JDBC writer hint: `option("createTableColumnTypes", ...)` payload for
    * the SQLite dialect, so `df.write.jdbc` reproduces the reference types.
    */
  def createTableColumnTypes: String =
    cols.map(c => s"`${c.name}` ${c.sqliteType}").mkString(", ")
}

/** The complete Hogia Hemekonomi schema — 9 user tables + DtbVer — mirrored
  * from `/root/reference/dbinfo.txt` (UTF-16 Access export) and the DDL
  * literals in `hhek2sqlite.go` (per-table citations below). Money is
  * always `DECIMAL(19,4)` (exact — SURVEY.md §1.3 invariant 1); dates are
  * TEXT(10) ISO strings carried as strings (invariant: the engine must
  * preserve the string, not eagerly cast — `dbinfo.txt:20`); `Löpnr`
  * COUNTER PKs are copied as data, never regenerated (`hhek2sqlite.go:142`).
  */
object HogiaSchema {

  private val Money = DecimalType(19, 4)

  private def text(n: String, jetLen: Int, pk: Boolean = false) =
    Col(n, StringType, s"Text($jetLen)", "TEXT", nullable = !pk, isPk = pk)
  private def counter(n: String) =
    Col(n, LongType, "COUNTER", "integer", nullable = false, isPk = true)
  // Jet type name `Currency` per the reference's DDL literals
  // (`hhek2sqlite.go:175`); the Access export spells it `MONEY`
  // (`dbinfo.txt:23`) — exact synonyms in Access SQL. Audited column-by-
  // column against dbinfo.txt (round 2): this synonym is the only
  // lexical difference remaining.
  private def money(n: String) = Col(n, Money, "Currency", "DECIMAL(19,4)")
  private def int(n: String) = Col(n, IntegerType, "Integer", "INTEGER")
  private def date10(n: String) = Col(n, StringType, "Text(10)", "TEXT")

  /** DtbVer — db version + password (`dbinfo.txt:69-75`; single shared
    * dialect, `hhek2sqlite.go:281-283`). */
  val dtbVer: HogiaTable = HogiaTable(
    "DtbVer",
    Seq(
      text("VerNum", 4, pk = true),
      text("Benämning", 80),
      text("Losenord", 8)
    )
  )

  /** Platser — payees/places (`dbinfo.txt:134-141`; `hhek2sqlite.go:924-927`). */
  val platser: HogiaTable = HogiaTable(
    "Platser",
    Seq(
      counter("Löpnr"),
      text("Namn", 40),
      text("Gironummer", 20),
      text("Typ", 2),
      text("RefKonto", 40)
    ),
    Seq(Index("idxNamn", Seq("Namn"), unique = true))
  )

  /** Personer — household members (`dbinfo.txt:125-130`; `hhek2sqlite.go:105-108`). */
  val personer: HogiaTable = HogiaTable(
    "Personer",
    Seq(
      counter("Löpnr"),
      text("Namn", 50),
      text("Född", 4),
      text("Kön", 10)
    ),
    Seq(Index("idxNamn", Seq("Namn"), unique = true))
  )

  /** Konton — accounts + balances (`dbinfo.txt:77-87`; `hhek2sqlite.go:688-691`). */
  val konton: HogiaTable = HogiaTable(
    "Konton",
    Seq(
      counter("Löpnr"),
      text("KontoNummer", 20),
      text("Benämning", 40),
      money("Saldo"),
      money("StartSaldo"),
      text("StartManad", 10),
      money("SaldoArsskifte"),
      text("ArsskifteManad", 10)
    ),
    Seq(Index("idxBenämning", Seq("Benämning"), unique = true))
  )

  /** BetalKonton — payment accounts (`dbinfo.txt:5-11`; `hhek2sqlite.go:360-363`). */
  val betalKonton: HogiaTable = HogiaTable(
    "BetalKonton",
    Seq(
      counter("Löpnr"),
      text("Konto", 40),
      text("Kontonummer", 40),
      text("Kundnummer", 40),
      text("Sigillnummer", 40)
    ),
    Seq(Index("idxKonto", Seq("Konto"), unique = true))
  )

  /** Överföringar — recurring transfers (`dbinfo.txt:164-183`;
    * `hhek2sqlite.go:577-580`). `Kontrollnr` is nullable with the
    * empty-bytes→NULL rule (`hhek2sqlite.go:639-643`). */
  val overforingar: HogiaTable = HogiaTable(
    "Överföringar",
    Seq(
      counter("Löpnr"),
      text("FrånKonto", 40),
      text("TillKonto", 40),
      money("Belopp"),
      date10("Datum"),
      text("HurOfta", 15),
      text("Vad", 40),
      text("Vem", 40),
      int("Kontrollnr"),
      date10("TillDatum"),
      text("Rakning", 1)
    ),
    Seq(Index("idxFrånTillKonto", Seq("FrånKonto", "TillKonto"), unique = false))
  )

  /** Betalningar — scheduled payments (`dbinfo.txt:15-37`; `hhek2sqlite.go:465-468`). */
  val betalningar: HogiaTable = HogiaTable(
    "Betalningar",
    Seq(
      counter("Löpnr"),
      text("FrånKonto", 40),
      text("TillPlats", 40),
      text("Typ", 40),
      date10("Datum"),
      text("Vad", 40),
      text("Vem", 50),
      money("Belopp"),
      text("Text", 60),
      money("Ranta"),
      money("FastAmort"),
      money("RorligAmort"),
      money("OvrUtg"),
      Col("LanLopnr", IntegerType, "Integer", "INTEGER"),
      text("Grey", 2)
    ),
    Seq(
      Index("idxDatum", Seq("Datum"), unique = false),
      Index("idxFrånKonto", Seq("FrånKonto"), unique = false),
      Index("idxLanLopnr", Seq("LanLopnr"), unique = false),
      Index("idxTillPlats", Seq("TillPlats"), unique = false)
    )
  )

  /** LÅN — loans (`dbinfo.txt:91-122`; `hhek2sqlite.go:787-790`).
    * `FastRanta`/`RorligRanta` are Jet Single → FloatType
    * (`hhek2sqlite.go:869-870`); `Anteckningar` is Memo → string. */
  val lan: HogiaTable = HogiaTable(
    "LÅN",
    Seq(
      counter("Löpnr"),
      text("Langivare", 40),
      text("EgenBeskrivn", 40),
      text("LanNummer", 25),
      money("TotLanebelopp"),
      date10("StartDatum"),
      date10("RegDatum"),
      date10("RantJustDatum"),
      date10("SlutBetDatum"),
      money("AktLaneskuld"),
      money("RorligDel"),
      money("FastDel"),
      Col("FastRanta", FloatType, "Single", "REAL"),
      Col("RorligRanta", FloatType, "Single", "REAL"),
      text("HurOfta", 2),
      money("Ranta"),
      money("FastAmort"),
      money("RorligAmort"),
      money("OvrUtg"),
      text("Rakning", 1),
      text("Vem", 40),
      text("FrånKonto", 40),
      text("Grey", 2),
      Col("Anteckningar", StringType, "Memo", "TEXT"),
      text("BudgetRanta", 40),
      text("BudgetAmort", 40),
      text("BudgetOvriga", 40)
    ),
    Seq(Index("idxLangivare", Seq("Langivare"), unique = false))
  )

  /** Budget — monthly budget matrix Jan..Dec (`dbinfo.txt:39-67`;
    * `hhek2sqlite.go:1040-1043`). `HurOfta` is SMALLINT in the
    * authoritative export (`dbinfo.txt:43`) → short; the Go code's Jet
    * dialect calls it `Byte` (`hhek2sqlite.go:995`) — we follow the
    * export. */
  val budget: HogiaTable = HogiaTable(
    "Budget",
    Seq(
      counter("Löpnr"),
      text("Typ", 40),
      text("Inkomst", 1),
      Col("HurOfta", ShortType, "SMALLINT", "INTEGER"),
      text("StartMånad", 10)
    ) ++ Seq("Jan", "Feb", "Mar", "Apr", "Maj", "Jun",
             "Jul", "Aug", "Sep", "Okt", "Nov", "Dec").map(money) ++ Seq(
      int("Kontrollnr")
    ),
    Seq(
      Index("idxTyp", Seq("Typ"), unique = true),
      Index("idxInkomst", Seq("Inkomst"), unique = false),
      Index("idxInkomstTyp", Seq("Inkomst", "Typ"), unique = false),
      Index("idxKontrollnr", Seq("Kontrollnr"), unique = false)
    )
  )

  /** Transaktioner — the ledger fact table (`dbinfo.txt:145-158`;
    * `hhek2sqlite.go:196-199`). `Saldo` is the per-row running balance the
    * converter deliberately NULLs on forward conversion
    * (`hhek2sqlite.go:260`) — reconstructed analytically by the
    * `running_saldo` query (SURVEY.md §2.5). `Fastöverföring` is the only
    * NOT NULL BIT (`dbinfo.txt:156`). */
  val transaktioner: HogiaTable = HogiaTable(
    "Transaktioner",
    Seq(
      counter("Löpnr"),
      text("FrånKonto", 40),
      text("TillKonto", 40),
      text("Typ", 40),
      date10("Datum"),
      text("Vad", 40),
      text("Vem", 50),
      money("Belopp"),
      money("Saldo"),
      Col("Fastöverföring", BooleanType, "Bit", "BOOLEAN", nullable = false),
      text("Text", 60)
    ),
    Seq(Index("idxFrånTillKonto", Seq("FrånKonto", "TillKonto"), unique = false))
  )

  /** The fixed copy order of the reference pipeline
    * (`hhek2sqlite.go:1287-1296`) — preserved for log/behavior parity;
    * no FK enforcement exists so order is UX only (SURVEY.md §2.9 O2). */
  val copyOrder: Seq[HogiaTable] = Seq(
    dtbVer, platser, personer, konton, betalKonton,
    overforingar, betalningar, lan, budget, transaktioner
  )

  val byName: Map[String, HogiaTable] = copyOrder.map(t => t.name -> t).toMap
}
