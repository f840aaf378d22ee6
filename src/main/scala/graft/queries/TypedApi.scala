package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

import graft.schema.HogiaSchema
import graft.sources.TableIO

/** Typed point-lookup API — the Spark `Dataset[T]` re-expression of the
  * reference's only parameterized query surface (`hämtaPerson` /
  * `hämtaPlats` / `hämtaTransaktion` / `hämtaKonto`,
  * db_test.go:410-546): a `WHERE (Löpnr=?)` lookup decoded into a typed
  * record. The case classes mirror the Go structs (db_test.go:19-53)
  * with their CONVERTED field types — `Född` string → Int (F9),
  * `Datum` ISO string → java.sql.Date (F8), money → java.math.BigDecimal
  * exact DECIMAL(19,4) (F10) — so a caller gets what the reference's
  * test layer builds, not raw storage strings.
  *
  * Execution shape: `filter(Löpnr === n)` pushes the equality to the
  * scan (PlanSpec proves EqualTo pushdown); the decode is a narrow
  * projection; `headOption` ships at most one row to the driver. The
  * reference's per-lookup cursor/Scan loop has no analog — the Encoder
  * generates the deserializer once.
  */
object TypedApi {

  /** db_test.go:19-23 (`person`): Namn, Född→int, Kön. */
  case class Person(löpnr: Long, namn: String, birth: Int, sex: String)

  /** db_test.go:25-30 (`Plats`): Typ is TEXT(2) storage decoded to the
    * boolean the reference's `toUtf8(Typ) == "true"` yields. */
  case class Plats(löpnr: Long, namn: String, gironummer: String,
      typ: Boolean, refKonto: String)

  /** db_test.go:32-43 (`transaction`). `saldo` is None after a forward
    * conversion (F7 NULL injection) — an Option, not a sentinel. */
  case class Transaktion(löpnr: Long, fromAcc: String, toAcc: String,
      tType: String, date: java.sql.Date, what: String, who: String,
      amount: java.math.BigDecimal, saldo: Option[java.math.BigDecimal],
      fixed: Boolean, comment: String)

  /** db_test.go:45-53 (`konto`). */
  case class Konto(löpnr: Long, kontoNummer: String, benämning: String,
      saldo: java.math.BigDecimal, startSaldo: java.math.BigDecimal,
      startManad: String, saldoArsskifte: java.math.BigDecimal,
      arsskifteManad: String)

  private def table(spark: SparkSession, io: TableIO, name: String): DataFrame =
    io.read(spark, HogiaSchema.byName(name))

  /** `SELECT Namn,Född,Kön FROM Personer WHERE (Löpnr=?)` (db_test.go:414-415). */
  def hämtaPerson(spark: SparkSession, io: TableIO, löpnr: Long): Option[Person] = {
    import spark.implicits._
    table(spark, io, "Personer")
      .filter(col("Löpnr") === löpnr)
      .select(col("Löpnr").as("löpnr"), col("Namn").as("namn"),
        col("Född").cast(IntegerType).as("birth"), col("Kön").as("sex"))
      .as[Person].limit(1).collect().headOption
  }

  /** db_test.go:439-440. */
  def hämtaPlats(spark: SparkSession, io: TableIO, löpnr: Long): Option[Plats] = {
    import spark.implicits._
    table(spark, io, "Platser")
      .filter(col("Löpnr") === löpnr)
      .select(col("Löpnr").as("löpnr"), col("Namn").as("namn"),
        col("Gironummer").as("gironummer"),
        (col("Typ") === "true").as("typ"), col("RefKonto").as("refKonto"))
      .as[Plats].limit(1).collect().headOption
  }

  /** db_test.go:476-478. */
  def hämtaTransaktion(spark: SparkSession, io: TableIO, löpnr: Long): Option[Transaktion] = {
    import spark.implicits._
    table(spark, io, "Transaktioner")
      .filter(col("Löpnr") === löpnr)
      .select(col("Löpnr").as("löpnr"), col("FrånKonto").as("fromAcc"),
        col("TillKonto").as("toAcc"), col("Typ").as("tType"),
        to_date(col("Datum"), "yyyy-MM-dd").as("date"),
        col("Vad").as("what"), col("Vem").as("who"),
        col("Belopp").as("amount"), col("Saldo").as("saldo"),
        col("Fastöverföring").as("fixed"), col("Text").as("comment"))
      .as[Transaktion].limit(1).collect().headOption
  }

  /** db_test.go:519-520. */
  def hämtaKonto(spark: SparkSession, io: TableIO, löpnr: Long): Option[Konto] = {
    import spark.implicits._
    table(spark, io, "Konton")
      .filter(col("Löpnr") === löpnr)
      .select(col("Löpnr").as("löpnr"), col("KontoNummer").as("kontoNummer"),
        col("Benämning").as("benämning"), col("Saldo").as("saldo"),
        col("StartSaldo").as("startSaldo"), col("StartManad").as("startManad"),
        col("SaldoArsskifte").as("saldoArsskifte"),
        col("ArsskifteManad").as("arsskifteManad"))
      .as[Konto].limit(1).collect().headOption
  }
}
