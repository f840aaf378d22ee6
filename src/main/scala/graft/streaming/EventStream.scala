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

  /** Explicit source schema (streaming reads cannot infer), derived from
    * the SAME footer probe as the batch reader (Tables.eventsTsEncoding)
    * so the two can never decode `ts` differently — the r6 testdata
    * regeneration (nanos→micros) corrupted both sides identically
    * precisely because each had its own hardcoded assumption. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    import graft.queries.Tables
    val enc = Tables.eventsTsEncoding(spark, s"$dir/events.parquet")
    val raw = spark.readStream
      .schema(Tables.eventsReadSchema(enc))
      // the testdata ships one parquet FILE per table; FileStreamSource
      // force-sets basePath to a NON-glob path (which must be a
      // directory), so address the file through a glob — production
      // streams point at directories and don't need this.
      .parquet(s"$dir/[e]vents.parquet")
    Tables.decodeTs(raw, enc)
  }

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

  /** Streaming NATIVE session windows (twin of the batch
    * q_session_window): Spark's built-in session_window state merging
    * under a watermark — sessions finalize (Append mode) once the
    * watermark passes session end + gap, which also bounds state. This
    * is the built-in counterpart of the hand-rolled [[sessionCounts]]:
    * use it when per-session rows are the product; keep the
    * flatMapGroupsWithState version when custom per-key state (running
    * counters, provisional upserts) is needed. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "1 hour")
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"))

  /** Keeps the raw `ts` column (not a derived epoch) because the
    * event-time-timeout checker requires the watermarked attribute to be
    * present in the stateful operator's input schema. */
  case class SessionInput(user_id: Long, ts: java.sql.Timestamp)

  /** Per-key state: finalized gap-rule fold (`lastSec`/`sessions`/
    * `events` cover everything at or below the watermark, which can
    * never be contradicted by a future arrival) plus the
    * watermark-bounded buffer of still-reorderable event times. */
  case class SessionBuffer(pending: Seq[Long], lastSec: Long,
      sessions: Long, events: Long)
  case class UserSessions(user_id: Long, n_events: Long, n_sessions: Long)

  /** Per-user session counting with explicit state — 30-minute gap rule,
    * same constant as the batch twin (Events.SessionGapSeconds).
    *
    * OUT-OF-ORDER SAFE up to the 1-hour watermark: arrivals are buffered
    * in state and only the prefix at or below the current watermark is
    * folded into the finalized counts (nothing older can still arrive),
    * so cross-micro-batch reordering within the horizon cannot regress
    * the gap rule (the r2 version required per-key event-time order
    * across batches and under-counted otherwise — EventStreamSpec now
    * replays a shuffled delivery to prove the fix). Events later than
    * the watermark at arrival are dropped, mirroring windowedAgg's
    * late-data policy. Each emission (Update mode) is the finalized fold
    * extended provisionally over the buffer, so the last upsert per user
    * equals the batch twin exactly.
    *
    * State is O(events inside the watermark horizon) per key — the
    * honest price of reorder tolerance; the watermark bounds it, and a
    * narrower horizon trades memory for lateness tolerance. */
  def sessionCounts(events: DataFrame): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gap = graft.operators.Events.SessionGapSeconds
    events
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"))
      .as[SessionInput]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuffer, UserSessions](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        case (uid, rows, state: GroupState[SessionBuffer]) =>
          // previous batch's watermark (0 before any batch completes)
          val wmSec = state.getCurrentWatermarkMs() / 1000
          val st = state.getOption.getOrElse(
            SessionBuffer(Vector.empty, Long.MinValue, 0L, 0L))
          val arrivals =
            rows.map(_.ts.getTime / 1000).filter(_ >= wmSec).toVector
          val (ripe, pending) =
            (st.pending ++ arrivals).sorted.partition(_ < wmSec)
          def fold(last0: Long, sess0: Long, ev0: Long, ts: Seq[Long]) =
            ts.foldLeft((last0, sess0, ev0)) { case ((last, sess, ev), s) =>
              val newSession = last == Long.MinValue || s - last >= gap
              (s, sess + (if (newSession) 1 else 0), ev + 1)
            }
          val (fLast, fSess, fEv) = fold(st.lastSec, st.sessions, st.events, ripe)
          state.update(SessionBuffer(pending, fLast, fSess, fEv))
          val (_, pSess, pEv) = fold(fLast, fSess, fEv, pending)
          Iterator(UserSessions(uid, pEv, pSess))
      }
  }

  /** Watermarked STREAM-STREAM inner join — funnel attribution: every
    * (click, purchase) pair by the same user with the purchase inside
    * [click, click + 1 h). Batch twin: q_funnel_attrib (DuckDB-oracled);
    * equivalence asserted in EventStreamSpec.
    *
    * The time-range condition plus the watermark on BOTH inputs is what
    * makes this run forever: Spark derives per-side state-eviction
    * bounds from them (a click can stop waiting for purchases once the
    * purchase watermark passes click_ts + 1 h; a purchase can never
    * match a click older than 1 h), so join state is bounded by the
    * event rate × (watermark + range span) per side, independent of
    * stream length. Append mode: a pair is emitted exactly once, when
    * it can no longer be contradicted. */
  def funnelJoin(events: DataFrame): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    val buys = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("b_user"), col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", "1 hour")
    clicks.join(buys,
        col("user_id") === col("b_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") < col("click_ts") + expr("INTERVAL 1 HOUR"))
      .select(col("user_id"), col("click_ts"), col("purchase_ts"))
  }

  /** Stream-static dimension enrichment: the event stream left-joins a
    * STATIC customer dim on user_id — stateless (no watermark, no state
    * store; the static side is re-broadcast per micro-batch, picking up
    * dim updates between batches). The production lookup-join shape:
    * at 100 TB/day ingest the fact stream never shuffles; only the
    * bounded dim moves. Batch twin: q_enrich_events (DuckDB-oracled
    * aggregate over the identical join). */
  def enriched(events: DataFrame, dim: DataFrame): DataFrame =
    events.join(
        org.apache.spark.sql.functions.broadcast(
          dim.select(col("c_custkey"), col("c_mktsegment"))),
        col("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("user_id"),
        coalesce(col("c_mktsegment"), lit("UNKNOWN")).as("segment"),
        col("value"))

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
