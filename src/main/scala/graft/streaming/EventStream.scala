package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._

import graft.ops.Transforms

/** Structured Streaming ingestion over the `events` data (SURVEY.md
  * §2.10 — the reference is batch-only; this is the engine's streaming
  * extension, with batch twins in graft.operators.Events whose DuckDB
  * oracle pins the semantics).
  *
  *  - `windowedAgg`: 1-hour tumbling windows with a 1-hour watermark —
  *    the streaming twin of q_events_window (equivalence asserted in
  *    EventStreamSpec via Trigger.AvailableNow replay).
  *  - `sessionCounts`: per-user session counting with
  *    flatMapGroupsWithState + event-time timeout — the incremental twin
  *    of q_sessionize's 30-minute-gap rule.
  *
  * 100 TB design notes: the source is file-listing based here (parquet
  * dir) but the transforms are source-agnostic (Kafka swap-in is a
  * one-line change); state per key is O(1) (session accumulator), and
  * the watermark bounds state retention; Trigger.AvailableNow gives
  * batch-sized reprocessing with streaming semantics.
  */
object EventStream {

  /** Explicit source schema (streaming reads cannot infer). `ts` arrives
    * as parquet TIMESTAMP(NANOS) → read as a nanos long via the explicit
    * schema (no legacy flag needed) and converted with integer DIV,
    * exactly like the batch reader (Tables.events). */
  val eventSchema: StructType = graft.queries.Tables.eventsRawSchema

  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(eventSchema)
      // the testdata ships one parquet FILE per table; FileStreamSource
      // force-sets basePath to a NON-glob path (which must be a
      // directory), so address the file through a glob — production
      // streams point at directories and don't need this.
      .parquet(s"$dir/[e]vents.parquet")
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))

  /** Watermarked 1-hour tumbling aggregation (streaming twin of
    * q_events_window). */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(Transforms.Money)).cast(Transforms.Money)
          .cast(DoubleType).as("total_value"))
      .select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("h"),
        col("event_type"), col("n"), col("total_value"))

  case class SessionInput(user_id: Long, ts_sec: Long)
  case class SessionState(lastSec: Long, sessions: Long, events: Long)
  case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  /** Per-user session counting with explicit state — 30-minute gap rule,
    * same constant as the batch twin (Events.SessionGapSeconds). Emits
    * one final row per user when the state times out (or on stream end
    * in AvailableNow replay via OutputMode.Update upserts).
    *
    * ORDERING PRECONDITION: events must arrive in per-key event-time
    * order ACROSS micro-batches (rows within one batch are sorted here).
    * A source that replays files out of time order can regress
    * `lastSec` and under-count sessions vs the batch twin; full
    * out-of-order support requires watermark-bounded event buffering in
    * state (not implemented — use ordered sources, e.g. per-key Kafka
    * partitions or time-ordered file batches). */
  def sessionCounts(events: DataFrame): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gap = graft.operators.Events.SessionGapSeconds
    events
      .select(col("user_id"), unix_timestamp(col("ts")).as("ts_sec"))
      .as[SessionInput]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        case (uid, rows, state: GroupState[SessionState]) =>
          // rows within a micro-batch are not ordered: sort by ts_sec
          // (bounded by micro-batch size; at 100 TB the AvailableNow
          // replay bounds each batch by maxFilesPerTrigger).
          val sorted = rows.toSeq.sortBy(_.ts_sec)
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { r =>
            val newSession = st.lastSec == Long.MinValue || r.ts_sec - st.lastSec >= gap
            st = SessionState(r.ts_sec,
              st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator(UserSessions(uid, st.events, st.sessions))
      }
  }

  /** Streaming exact dedup: drop duplicate event_ids within the
    * watermark horizon — the streaming twin of the exact-dedup batch
    * operator (state per key is bounded by the watermark, so this runs
    * indefinitely at 100 TB ingest rates). */
  def dedupedEvents(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Run a streaming query to a memory sink with AvailableNow (processes
    * all existing files then stops) and return the result table name. */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(name)
      .outputMode(mode)
      .trigger(Trigger.AvailableNow())
      .start()
}
