package graft

import org.apache.spark.sql.functions._

import graft.operators.Formats

/** Landing-format matrix: cross-format agreement and the fingerprint's
  * corruption sensitivity (the property that makes the roundtrip gate
  * meaningful — an fp blind to text damage would pass a broken writer). */
class FormatsSpec extends SparkSpecBase {

  import testImplicits._

  test("jsonl and orc roundtrips agree with each other on every field") {
    val out = Formats.formatRoundtrip(spark, TestSpark.Sf0001).collect()
    assert(out.map(_.getString(0)).toSeq == Seq("jsonl", "orc"))
    assert(out.map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
      .distinct.length == 1, s"formats disagree: ${out.mkString(", ")}")
  }

  test("row fingerprint flips on single-character text corruption") {
    val base = Seq(("sv", "web", "hello world"), ("en", "web", "second doc"))
      .toDF("lang", "source", "text")
    val fpOf = (df: org.apache.spark.sql.DataFrame) =>
      df.agg(sum(Formats.rowFp(col("lang"), col("source"), col("text"))))
        .head().getLong(0)
    val clean = fpOf(base)
    val corrupt = fpOf(base.withColumn("text",
      when(col("lang") === "sv", lit("hello w0rld")).otherwise(col("text"))))
    val fieldBleed = fpOf(base.withColumn("lang",
      when(col("lang") === "sv", lit("svw")).otherwise(col("lang")))
      .withColumn("source",
        when(col("source") === "web" && col("lang") === "svw", lit("eb"))
          .otherwise(col("source"))))
    assert(clean != corrupt, "text corruption must change the fingerprint")
    assert(clean != fieldBleed,
      "field-boundary bleed (svw|eb vs sv|web) must change the fingerprint")
  }
}
