package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.Transforms
import graft.queries.Tables._

/** Scale patterns the 100 TB deployment leans on, expressed as reusable
  * operators with oracle-checked semantic equivalence (SURVEY.md §7.7
  * item 6): key-salting for skewed joins and partition-aligned writes.
  *
  * AQE's skew-join handling covers most cases at runtime; explicit
  * salting remains the tool when a single key is hot enough to overflow
  * one task even after AQE splits (the classic power-law fact key), and
  * it is the pattern the oracle can verify: a salted join must produce
  * EXACTLY the rows of the plain join.
  */
object ScalePatterns {

  /** Skew-safe equi-join: the (potentially skewed) left side gets a
    * deterministic per-row salt derived from its whole row hash; the
    * (small) right side is exploded `nSalts`× so every (key, salt)
    * combination finds its match. Result set is identical to
    * `left.join(right, leftKey === rightKey)` — verified by the oracle.
    *
    * At 100 TB: nSalts spreads one hot key over nSalts reducers; the
    * right-side explosion costs |right|×nSalts rows, which is why the
    * pattern pairs with a broadcast-unfriendly but still bounded dim. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: Column,
      rightKey: Column,
      nSalts: Int): DataFrame = {
    require(!left.columns.contains("__salt") && !right.columns.contains("__salt"),
      "saltedJoin: inputs must not already have a __salt column")
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col).toSeq: _*)), lit(nSalts)))
    val exploded = right.withColumn("__salt",
      explode(array((0 until nSalts).map(lit): _*)))
    salted.join(exploded,
        leftKey === rightKey && salted("__salt") === exploded("__salt"))
      .drop("__salt")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // salted fact⋈dim aggregation — the oracle is the PLAIN join, so a
    // hash match proves the salting is semantics-preserving.
    "q_salted_join" -> ((s, dir) =>
      saltedJoin(
        lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"),
          col("l_quantity").cast(Transforms.Money).as("qty")),
        supplier(s, dir).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey"), col("s_suppkey"), nSalts = 8)
        .groupBy("s_nationkey")
        .agg(count(lit(1)).as("n_items"),
          sum("qty").cast(Transforms.Money).cast(DoubleType).as("sum_qty"))
        .orderBy("s_nationkey"))
  )

  val oracles: Map[String, String] = Map(
    "q_salted_join" ->
      """SELECT s_nationkey, count(*) AS n_items,
        |       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(19,4))) AS DECIMAL(19,4)) AS DOUBLE) AS sum_qty
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1 ORDER BY s_nationkey""".stripMargin
  )
}
