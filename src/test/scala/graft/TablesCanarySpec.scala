package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.Tables

/** The events-reader r6 lesson generalized (VERDICT r7 #7): every
  * high-traffic table reader asserts one absolute cross-column fact, so
  * a silently regenerated/drifted testdata file fails LOUDLY at the
  * reader — these specs regenerate each fixture WITH the drift and
  * assert the trip, plus the cache-invalidation path (ADVICE r7: the
  * fingerprint must re-probe a file regenerated in place within one
  * JVM session). */
class TablesCanarySpec extends SparkSpecBase {

  private def tmp(name: String) = Files.createTempDirectory(name).toString

  test("documents canary trips on n_chars drift; in-place regeneration re-probes") {
    val dir = tmp("graft_canary_docs")
    val good = Tables.documents(spark, TestSpark.Sf0001)
    good.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(Tables.documents(spark, dir).count() > 0) // good generation passes
    // regenerate IN PLACE with drifted metadata: the (path, mtime, len)
    // fingerprint must re-probe and fail loudly, not serve the stale
    // sanity verdict from the first generation
    good.withColumn("n_chars", col("n_chars") + lit(1L))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val e = intercept[IllegalArgumentException](Tables.documents(spark, dir))
    assert(e.getMessage.contains("n_chars"), e.getMessage)
  }

  test("embeddings canary trips on dimension drift") {
    val dir = tmp("graft_canary_emb")
    Tables.embeddings(spark, TestSpark.Sf0001)
      .withColumn("embedding", slice(col("embedding"), 1, 1))
      .write.parquet(s"$dir/embeddings.parquet")
    val e = intercept[IllegalArgumentException](Tables.embeddings(spark, dir))
    assert(e.getMessage.contains("sane range"), e.getMessage)
  }

  test("lineitem canary trips on timestamp-unit drift") {
    val dir = tmp("graft_canary_li")
    Tables.lineitem(spark, TestSpark.Sf0001)
      .withColumn("l_shipdate", expr("l_shipdate + INTERVAL 1000 YEAR"))
      .write.parquet(s"$dir/lineitem.parquet")
    val e = intercept[IllegalArgumentException](Tables.lineitem(spark, dir))
    assert(e.getMessage.contains("year"), e.getMessage)
  }

  test("the real testdata generations pass every canary at all three SFs") {
    Seq(TestSpark.Sf0001, TestSpark.Sf001).foreach { sf =>
      assert(Tables.documents(spark, sf).count() > 0)
      assert(Tables.embeddings(spark, sf).count() > 0)
      assert(Tables.lineitem(spark, sf).count() > 0)
    }
  }
}
