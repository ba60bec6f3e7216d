package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming twins of the batch event operators in
  * [[graft.SparkEntry]] (q_events_window / q_sessionize): the same
  * aggregations expressed over an unbounded stream with watermarks,
  * plus a custom-state operator via mapGroupsWithState.
  *
  * At scale these run with the same partitioning story as batch: the
  * groupBy keys shuffle once into the state store; watermarks bound
  * state size. Tested with MemoryStream in EventStreamsSpec.
  */
object EventStreams {

  /** Event row shape used by the typed state operator. */
  case class Event(
      event_id: Long,
      ts: java.sql.Timestamp,
      user_id: Long,
      event_type: String,
      value: Double)

  case class UserRunningCount(user_id: Long, n_events: Long, total_value: Double)

  /** Tumbling-window counts per event type with a watermark —
    * streaming twin of q_events_window.
    */
  def windowedCounts(
      events: DataFrame,
      watermark: String = "10 minutes",
      windowLength: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        // DECIMAL-summed then widened: float addition is
        // order-sensitive and micro-batch partial aggregation orders
        // differ run to run — same convention as the batch queries
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"),
        col("n_events"),
        col("sum_value"))

  /** Session windows per user (gap-based) — streaming twin of
    * q_sessionize, using Spark's native session_window instead of the
    * batch lag/cumsum formulation.
    */
  def sessionWindows(
      events: DataFrame,
      watermark: String = "10 minutes",
      gap: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,4)")).cast("double").as("sum_value"))
      .select(
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"),
        col("n_events"),
        col("sum_value"))

  /** Streaming exact dedup — the training-pipeline ingest shape: drop
    * replayed/duplicate events by id while the watermark bounds the
    * dedup state (without it, state grows with the whole stream).
    */
  def dedupStream(
      events: DataFrame,
      watermark: String = "10 minutes",
      keyCols: Seq[String] = Seq("event_id")): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Custom keyed state: per-user running event count + value total,
    * emitted on every update. State expires on an EVENT-TIME timeout:
    * a user idle for `stateExpiry` past the watermark has their final
    * state re-emitted once (idempotent for any final-state consumer —
    * it equals the last update) and removed, so state size tracks
    * ACTIVE users, not all users ever seen. Without this the state
    * store grows with the whole key universe — the unbounded-state
    * trap in any 100 TB keyed-state pipeline.
    */
  def runningUserCounts(
      events: Dataset[Event],
      watermark: String = "10 minutes",
      stateExpiryMs: Long = 60L * 60 * 1000): Dataset[UserRunningCount] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunningCount, UserRunningCount](
        GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[UserRunningCount]) =>
          if (state.hasTimedOut) {
            // final emission, then drop the state — a group only times
            // out in a batch where it has no data, so `state` is set
            val last = state.get
            state.remove()
            last
          } else {
            val prev = state.getOption.getOrElse(UserRunningCount(userId, 0L, 0.0))
            var maxEventMs = Long.MinValue
            val (n, v) = rows.foldLeft((prev.n_events, prev.total_value)) {
              case ((cn, cv), e) =>
                maxEventMs = math.max(maxEventMs, e.ts.getTime)
                (cn + 1, cv + e.value)
            }
            val next = UserRunningCount(userId, n, v)
            state.update(next)
            // expiry is event-time anchored to this group's newest
            // event; clamp above the current watermark — Spark rejects
            // a timeout already in the past
            state.setTimeoutTimestamp(
              math.max(maxEventMs + stateExpiryMs, state.getCurrentWatermarkMs + 1))
            next
          }
      }
  }

  /** Output mode that matches [[runningUserCounts]]. */
  val runningUserCountsOutputMode: OutputMode = OutputMode.Update()

  /** Streaming twin of the table diff's missing-row detection
    * (`_row_status = 5`): events seen on the `expected` stream that
    * never arrived on the `actual` stream within the join window —
    * a stream-stream left-outer join with watermarks on both sides,
    * emitting the unmatched rows once the watermark passes
    * (the standard "detect lost events between two pipelines" shape).
    *
    * State is bounded by the watermark + time-range condition; the
    * join shuffles both streams once on the key, exactly like the
    * batch diff's single join.
    */
  def missingInActual(
      expected: DataFrame,
      actual: DataFrame,
      watermark: String = "10 minutes",
      joinWindow: String = "15 minutes"): DataFrame = {
    import org.apache.spark.sql.functions._
    val e = expected.withWatermark("ts", watermark)
      .select(
        col("event_id").as("e_id"), col("ts").as("e_ts"),
        col("user_id"), col("event_type"), col("value"))
    val a = actual.withWatermark("ts", watermark)
      .select(col("event_id").as("a_id"), col("ts").as("a_ts"))
    e.join(
      a,
      expr(
        s"""e_id = a_id AND
           |a_ts >= e_ts - INTERVAL $joinWindow AND
           |a_ts <= e_ts + INTERVAL $joinWindow""".stripMargin),
      "left_outer")
      .filter(col("a_id").isNull)
      .select(
        col("e_id").as("event_id"), col("e_ts").as("ts"),
        col("user_id"), col("event_type"), col("value"))
  }
}
