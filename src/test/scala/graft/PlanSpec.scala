package graft

import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Physical-plan quality gates — the ".explain and iterate" discipline
  * encoded as assertions, so a regression that silently de-optimizes a
  * plan (lost pushdown, lost broadcast, global sort for a top-k) fails
  * the build, not the 100 TB run. */
class PlanSpec extends SparkSpecBase {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("projection reaches the parquet scan (ReadSchema pruned)") {
    val p = plan(SparkEntry.queries("q_scan_project")(spark, TestSpark.Sf0001))
    // (plan toString truncates long schemas — match the pruned column list)
    assert(p.contains("FileScan parquet [l_orderkey#") &&
      p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double"),
      s"scan must read exactly the projected columns:\n$p")
    assert(!p.contains("l_comment"), "unprojected columns must not be read")
  }

  test("equality predicate pushes down to the parquet scan") {
    val p = plan(Tables.orders(spark, TestSpark.Sf0001).filter(col("o_orderkey") === 42))
    assert(p.contains("PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]"), p)
  }

  test("fact⋈dim joins broadcast the dimension (no fact shuffle)") {
    val p = plan(SparkEntry.queries("q_fk_join_segment")(spark, TestSpark.Sf0001))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("top-k plans as TakeOrderedAndProject, never a global sort") {
    val p = plan(SparkEntry.queries("q_topk_orders")(spark, TestSpark.Sf0001))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("sketch computation stays in the scan stage (no shuffle below the LSH join)") {
    val p = plan(graft.operators.Dedup.minhashFeatures(
      Tables.documents(spark, TestSpark.Sf0001)))
    assert(!p.contains("Exchange"), s"features must be narrow:\n$p")
  }

  test("aggregations are two-phase (partial before the exchange)") {
    val p = plan(SparkEntry.queries("q_saldo_per_konto")(spark, TestSpark.Sf0001))
    assert(p.contains("partial_sum"), s"map-side combine missing:\n$p")
  }
}
