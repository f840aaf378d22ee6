package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver testdata (TESTDATA.md). One parquet per table;
  * Catalyst handles column pruning + filter pushdown from the declarative
  * plans built on top (verified via `.explain` — see BenchNotes).
  */
object Tables {
  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, dir: String): DataFrame = t(s, dir, "lineitem")
  def orders(s: SparkSession, dir: String): DataFrame = t(s, dir, "orders")
  def customer(s: SparkSession, dir: String): DataFrame = t(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame = t(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame = t(s, dir, "part")
  def nation(s: SparkSession, dir: String): DataFrame = t(s, dir, "nation")
  def region(s: SparkSession, dir: String): DataFrame = t(s, dir, "region")
  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects at
    * schema inference ([PARQUET_TYPE_ILLEGAL]). Supplying the schema
    * explicitly (ts as plain LONG nanos) sidesteps inference with NO
    * session-global flag (the earlier nanosAsLong approach leaked a
    * legacy flag that silently changed unrelated reads — ADVICE r2);
    * then convert losslessly to a microsecond timestamp with integer DIV
    * (a double division would lose precision above 2^53 ns). */
  val eventsRawSchema: org.apache.spark.sql.types.StructType = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType)))
  }
  def events(s: SparkSession, dir: String): DataFrame =
    s.read.schema(eventsRawSchema).parquet(s"$dir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}
