package graft

import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Events
import graft.streaming.EventStream

/** Streaming/batch equivalence: the Structured Streaming pipelines must
  * produce exactly the batch twins' results when replayed with
  * Trigger.AvailableNow (same windows, same session rule). */
class EventStreamSpec extends SparkSpecBase {

  test("windowedAgg (streaming, AvailableNow) == q_events_window (batch)") {
    val stream = EventStream.windowedAgg(
      EventStream.readEvents(spark, TestSpark.Sf0001))
    val q = EventStream.runToMemory(stream, "win_test", OutputMode.Complete)
    q.awaitTermination()
    val streamed = spark.table("win_test")
      .orderBy("h", "event_type").collect().map(_.toSeq).toSeq
    val batch = Events.queries("q_events_window")(spark, TestSpark.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }

  test("sessionCounts (flatMapGroupsWithState) == q_sessionize (batch)") {
    val stream = EventStream.sessionCounts(
      EventStream.readEvents(spark, TestSpark.Sf0001))
    val q = EventStream.runToMemory(stream.toDF(), "sess_test", OutputMode.Update)
    q.awaitTermination()
    // Update mode upserts one row per user per micro-batch; the last
    // row per user is the final state.
    val streamed = spark.table("sess_test")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.last("n_events").as("n_events"),
        org.apache.spark.sql.functions.last("n_sessions").as("n_sessions"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val batch = Events.queries("q_sessionize")(spark, TestSpark.Sf0001)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch)
  }
}
