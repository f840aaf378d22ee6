package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Bucketing: the co-located-join pattern for repeated big⋈big joins at
  * 100 TB — both sides pre-hashed into the same bucket layout, so the
  * join runs with NO shuffle exchange (only per-bucket sorts). */
class BucketingSpec extends SparkSpecBase {

  test("bucketed big⋈big join has no shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val li = Tables.lineitem(spark, TestSpark.Sf0001)
        .select("l_orderkey", "l_quantity")
      val ord = Tables.orders(spark, TestSpark.Sf0001)
        .select("o_orderkey", "o_totalprice")

      li.write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("b_lineitem")
      ord.write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("b_orders")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle:\n$plan")

      // and it still computes the right thing
      val expect = li.join(ord, col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
