package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Tables.events

/** AS-OF join — "for each left row, the latest right row at or before
  * its timestamp, per key". Spark has no native operator (SPARK-22947);
  * the brief's preference order says compose from existing ops when
  * semantics allow, and they do:
  *
  *   union(tagged left, tagged right)
  *     → window last(value, ignoreNulls) over (key ORDER BY ts, tag, id
  *                                             ROWS UNBOUNDED PRECEDING)
  *     → keep left rows
  *
  * One shuffle on the key, linear state, no range-condition join (a
  * naive `l.ts >= r.ts` join is a per-key cross product — quadratic on
  * active keys; the MERGE-sorted window is how kdb/Flink implement it).
  * Right rows sort BEFORE left rows at equal timestamps (tag 0 < 1), so
  * the match is inclusive, same as DuckDB's `ASOF JOIN ... >=` — which
  * is the oracle validating these semantics cross-engine.
  *
  * At 100 TB: the shuffle carries (key, ts, tag, value) — value columns
  * only from the right side; skewed keys are ordinary window skew (AQE /
  * pre-salt with per-salt windows then re-merge).
  */
object AsOf {

  /** Left rows of `left` + `asof_<valueCol>`: the latest `valueCol` from
    * `right` with `right.ts <= left.ts` within the same `key` (null when
    * no prior right row exists). `id` breaks timestamp ties
    * deterministically. */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      ts: String,
      id: String,
      valueCol: String): DataFrame = {
    val reserved = Seq("__tag", "__asof_row", s"asof_$valueCol")
    require(!reserved.exists(left.columns.contains),
      s"asofJoin: left input must not already have columns ${reserved.mkString(", ")}")
    // The carried value is wrapped in a struct so that a right row whose
    // value IS NULL still registers as "a match" — last(..., ignoreNulls)
    // must skip left rows (no right row there) but not null-valued right
    // rows, exactly like ASOF JOIN matches the latest ROW, not the
    // latest non-null value.
    val l = left.withColumn("__tag", lit(1))
    val r = right
      .select(col(key), col(ts), col(id),
        struct(col(valueCol).as("v")).as("__asof_row"))
      .withColumn("__tag", lit(0))
    val w = Window.partitionBy(key)
      .orderBy(col(ts), col("__tag"), col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn(s"asof_$valueCol",
        last(col("__asof_row"), ignoreNulls = true).over(w).getField("v"))
      .filter(col("__tag") === 1)
      .drop("__tag", "__asof_row")
  }

  // --- query surface ---------------------------------------------------

  /** This module's share of the driver-visible gate surface —
    * bump WITH any gate added here (RegistrySpec sums the
    * module-local declarations; no global count exists). */
  val declaredGates: Int = 1

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // for every click, the value of the user's most recent error at or
    // before it — validated against DuckDB's native ASOF JOIN. The right
    // side is pre-deduped to ONE row per (user_id, ts) — keep the max
    // event_id's value — because DuckDB's ASOF JOIN leaves the row choice
    // UNSPECIFIED on tied right timestamps, while asofJoin breaks ties
    // deterministically; canonicalizing the input makes both engines
    // compare the same thing (ADVICE r2).
    "q_asof_join" -> ((s, dir) => {
      val ev = events(s, dir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"), col("value"))
      val clicks = ev.filter(col("event_type") === "click")
        .select("user_id", "event_id", "tus")
      val errors = ev.filter(col("event_type") === "error")
        .groupBy("user_id", "tus")
        .agg(max("event_id").as("event_id"),
          max_by(col("value"), col("event_id")).as("value"))
      asofJoin(clicks, errors, key = "user_id", ts = "tus", id = "event_id",
        valueCol = "value")
        .select(col("user_id"), col("event_id"), col("asof_value"))
        .orderBy("user_id", "event_id")
    })
  )

  val oracles: Map[String, String] = Map(
    // epoch_us on both sides: Spark timestamps are µs while the source
    // parquet is ns — comparing at the same precision keeps the >=
    // boundary identical. Right side deduped to one row per (user_id, ts)
    // (max event_id's value) to mirror the Spark query's canonicalization.
    "q_asof_join" ->
      """SELECT c.user_id, c.event_id, e.value AS asof_value
        |FROM (SELECT user_id, event_id, epoch_us(ts) AS tus FROM events
        |      WHERE event_type = 'click') c
        |ASOF LEFT JOIN
        |     (SELECT user_id, epoch_us(ts) AS tus, arg_max(value, event_id) AS value
        |      FROM events WHERE event_type = 'error' GROUP BY 1, 2) e
        |ON c.user_id = e.user_id AND c.tus >= e.tus
        |ORDER BY c.user_id, c.event_id""".stripMargin
  )
}
