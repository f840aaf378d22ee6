package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOf

/** As-of join semantics: inclusive boundary, per-key isolation, null
  * when no prior right row, latest-wins. */
class AsOfSpec extends SparkSpecBase {

  import testImplicits._

  test("asofJoin picks the latest right row at or before each left ts, per key") {
    val left = Seq(
      (1L, 100L, 10L), // after err@90  -> 9.0
      (1L, 90L, 11L),  // exactly at err@90 (inclusive) -> 9.0
      (1L, 50L, 12L),  // between err@40 and err@90 -> 4.0
      (1L, 10L, 13L),  // before any error -> null
      (2L, 100L, 14L)  // other key: only err@95 -> 95.0
    ).toDF("user_id", "tus", "event_id")
    val right = Seq(
      (1L, 40L, 1L, 4.0),
      (1L, 90L, 2L, 9.0),
      (2L, 95L, 3L, 95.0),
      (3L, 10L, 4L, 3.0) // key with no left rows: ignored
    ).toDF("user_id", "tus", "event_id", "value")

    val got = AsOf.asofJoin(left, right, "user_id", "tus", "event_id", "value")
      .select("event_id", "asof_value")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(got == Map(
      10L -> Some(9.0), 11L -> Some(9.0), 12L -> Some(4.0),
      13L -> None, 14L -> Some(95.0)))
  }

  test("asofJoin matches the latest right ROW even when its value is NULL") {
    val left = Seq((1L, 30L, 10L)).toDF("user_id", "tus", "event_id")
    val right = Seq(
      (1L, 10L, 1L, Some(5.0)),
      (1L, 20L, 2L, Option.empty[Double]) // latest row carries NULL
    ).toDF("user_id", "tus", "event_id", "value")
    val got = AsOf.asofJoin(left, right, "user_id", "tus", "event_id", "value")
      .select("asof_value").collect().head
    // DuckDB ASOF JOIN matches the ts=20 row → NULL, not the older 5.0
    assert(got.isNullAt(0), s"expected NULL from the latest row, got $got")
  }

  test("asofJoin breaks equal-timestamp right ties by id (latest id wins)") {
    val left = Seq((1L, 100L, 10L)).toDF("user_id", "tus", "event_id")
    val right = Seq((1L, 100L, 1L, 1.0), (1L, 100L, 2L, 2.0))
      .toDF("user_id", "tus", "event_id", "value")
    val got = AsOf.asofJoin(left, right, "user_id", "tus", "event_id", "value")
      .select("asof_value").collect().head.getDouble(0)
    assert(got == 2.0)
  }
}
