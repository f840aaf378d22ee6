package graft

import org.apache.spark.sql.functions._

import graft.operators.ScalePatterns
import graft.queries.Tables

/** Salted-join equivalence: the skew pattern must be invisible in the
  * result set. */
class ScalePatternsSpec extends SparkSpecBase {

  test("saltedJoin == plain join, row for row") {
    val li = Tables.lineitem(spark, TestSpark.Sf0001)
      .select("l_orderkey", "l_linenumber", "l_suppkey")
    val sup = Tables.supplier(spark, TestSpark.Sf0001)
      .select("s_suppkey", "s_nationkey")
    val plain = li.join(sup, col("l_suppkey") === col("s_suppkey"))
      .orderBy("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSeq
    val salted = ScalePatterns.saltedJoin(li, sup,
        col("l_suppkey"), col("s_suppkey"), nSalts = 5)
      .orderBy("l_orderkey", "l_linenumber").collect().map(_.toSeq).toSeq
    assert(salted == plain)
  }

  test("saltedJoin spreads a hot key over multiple salts") {
    import testImplicits._
    // one key carries 1000 rows — the classic power-law hot key
    val fact = (1 to 1000).map(i => (1L, i)).toDF("k", "v")
    val dim = Seq((1L, "hot")).toDF("dk", "name")
    val salts = fact.withColumn("__salt",
        pmod(xxhash64(struct(col("k"), col("v"))), lit(8)))
      .select(countDistinct("__salt")).collect().head.getLong(0)
    assert(salts > 4, s"hot key only spread over $salts salts")
    val joined = ScalePatterns.saltedJoin(fact, dim, col("k"), col("dk"), 8)
    assert(joined.count() == 1000)
  }
}
