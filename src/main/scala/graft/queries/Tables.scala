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
    * read ([PARQUET_TYPE_ILLEGAL]); read it as a nanos long (legacy flag)
    * and convert losslessly to a microsecond timestamp with integer DIV
    * (a double division would lose precision above 2^53 ns).
    *
    * SIDE EFFECT: the legacy flag is session-global and stays set — any
    * later nanos-timestamp parquet read in the same session will come
    * back as bigint instead of failing. It cannot be unset around the
    * read because the flag is consulted again at execution time. */
  def events(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, dir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, dir: String): DataFrame = t(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = t(s, dir, "embeddings")
}
